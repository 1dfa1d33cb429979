"""Bit-packed device flood fill: 32 X-cells per uint32 lane word.

The raster fill (ops/floodfill.py) resolves each directional sweep with one
int16-event ``cummax`` — correct, but the event field is 2 B/cell and the
log-doubling passes stream ~2.3 GB per 512^3 sweep.  Here the mask is packed
along X into uint32 words (1 bit/cell, 32x less traffic) and each sweep
becomes pure integer bit-ops:

* X sweeps: Kogge-Stone occluded fill inside each word (5 shift/and/or
  steps resolve all 32 bits), then a carry-lookahead (propagate, generate)
  scan across the X/32 word planes, then a carry-run fill — the classic
  hardware-adder decomposition of a 1-D flood.
* Y/Z sweeps: the (open, reached) linear recurrence
  ``s[y] = open[y] & (reach[y] | s[y-1])`` runs as a log-doubling scan on
  word-parallel transfers ``s' = (a & s) | b`` with composition
  ``(a2,b2)∘(a1,b1) = (a2&a1, a2&b1 | b2)`` — 32 lines resolve per lane op.

This is the int32-packed formulation of the round-3 segment-any design
(BASELINE.md levers): the Mosaic blockers (i1 rotate/store) vanish because
everything is uint32 arithmetic that XLA lowers natively; no Pallas needed.
A fixed-point round performs the six directional sweeps back-to-back and the
loop stops when the reach mask stops changing — same synchronous-fill
semantics as the reference (``TortuosityHypre.cpp:297-389``), same fixed
point as BFS reachability.

Reachability semantics, seeding and the inlet∩outlet composition mirror
``ops/floodfill.py`` (which remains the fallback for unpacked paths).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_FULL = jnp.uint32(0xFFFFFFFF)


def pack_x(mask) -> jax.Array:
    """bool (X,Y,Z) -> uint32 (ceil(X/32), Y, Z); bit b of word w is cell
    x = 32*w + b.  X is padded with closed cells (zero bits)."""
    X, Y, Z = mask.shape
    xw = -(-X // 32)
    m = mask.astype(jnp.uint32)
    if xw * 32 != X:
        m = jnp.pad(m, ((0, xw * 32 - X), (0, 0), (0, 0)))
    m = m.reshape(xw, 32, Y, Z)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)).reshape(
        1, 32, 1, 1)
    return jnp.sum(m * weights, axis=1, dtype=jnp.uint32)


def unpack_x(words, X: int) -> jax.Array:
    """uint32 (Xw,Y,Z) -> bool (X,Y,Z) (crops the padded X cells)."""
    xw, Y, Z = words.shape
    bits = jnp.arange(32, dtype=jnp.uint32).reshape(1, 32, 1, 1)
    cells = (words[:, None] >> bits) & jnp.uint32(1)
    return cells.reshape(xw * 32, Y, Z)[:X].astype(bool)


def _shift(x, k: int, axis: int, reverse: bool):
    """Zero-filled shift: element i takes the value from i-k (forward) or
    i+k (``reverse``)."""
    pad = [(0, 0)] * x.ndim
    sl = [slice(None)] * x.ndim
    if not reverse:
        pad[axis] = (k, 0)
        sl[axis] = slice(0, x.shape[axis])
    else:
        pad[axis] = (0, k)
        sl[axis] = slice(k, None)
    return jnp.pad(x, pad)[tuple(sl)]


def _scan_semiring(o, r, axis: int, reverse: bool):
    """Inclusive scan of ``s[i] = o[i] & (r[i] | s[i-1])`` along ``axis``
    by operator doubling: b holds the resolved reach, a the open-path
    indicator for the current span length."""
    a, b = o, r
    n = o.shape[axis]
    k = 1
    while k < n:
        b = b | (a & _shift(b, k, axis, reverse))
        a = a & _shift(a, k, axis, reverse)
        k *= 2
    return b


def _ks_fill_up(o, g):
    """Kogge-Stone occluded fill toward the MSB: every open bit with a seed
    below it in the same word through contiguous open bits."""
    g = g | (o & (g << 1))
    p = o & (o << 1)
    g = g | (p & (g << 2))
    p = p & (p << 2)
    g = g | (p & (g << 4))
    p = p & (p << 4)
    g = g | (p & (g << 8))
    p = p & (p << 8)
    g = g | (p & (g << 16))
    return g


def _ks_fill_down(o, g):
    g = g | (o & (g >> 1))
    p = o & (o >> 1)
    g = g | (p & (g >> 2))
    p = p & (p >> 2)
    g = g | (p & (g >> 4))
    p = p & (p >> 4)
    g = g | (p & (g >> 8))
    p = p & (p >> 8)
    g = g | (p & (g >> 16))
    return g


def _low_run(o):
    """Bits of the contiguous open run starting at bit 0 (empty if bit 0 is
    closed); the cells a carry-in at the word's low edge floods."""
    return o & ~(o + jnp.uint32(1))


def _high_run(o):
    """Bits of the contiguous open run ending at bit 31 — the down-smear of
    the top bit through open cells."""
    return _ks_fill_down(o, o & jnp.uint32(0x80000000))


def _sweep_x(o, r, reverse: bool, carry_scan=_scan_semiring):
    """One directional X sweep on the packed words: intra-word Kogge-Stone
    fill, carry-lookahead across word planes, carry-run fill.
    ``carry_scan`` resolves the word-level (propagate, generate) recurrence
    along axis 0 (overridden by the sharded driver to cross shards)."""
    if not reverse:
        g = _ks_fill_up(o, r)
        gen = (g >> 31).astype(bool)  # fill reached the word's top bit
    else:
        g = _ks_fill_down(o, r)
        gen = (g & jnp.uint32(1)).astype(bool)
    prop = o == _FULL  # a carry crosses the whole word iff fully open
    c_out = carry_scan(prop, gen, 0, reverse)
    c_in = _shift(c_out, 1, 0, reverse)
    run = _low_run(o) if not reverse else _high_run(o)
    return g | jnp.where(c_in, run, jnp.uint32(0))


def fill_round(o, r, carry_scan=_scan_semiring):
    """Six directional sweeps (±X, ±Y, ±Z), state carried through — one
    round subsumes a 6-neighbour dilation step, so the fixed point equals
    BFS reachability while porous media converge in ~the number of
    direction changes of the hardest path."""
    r = _sweep_x(o, r, False, carry_scan)
    r = _sweep_x(o, r, True, carry_scan)
    for axis in (1, 2):
        for reverse in (False, True):
            r = _scan_semiring(o, r, axis, reverse)
    return r


def packed_fill(o, r, max_rounds: int | None = None, carry_scan=_scan_semiring):
    """Iterate fill rounds to the fixed point (reach stops changing)."""
    if max_rounds is None:
        max_rounds = int(o.shape[0] * 32 + o.shape[1] + o.shape[2]) + 2

    def cond(state):
        _, changed, it = state
        return changed & (it < max_rounds)

    def body(state):
        cur, _, it = state
        new = fill_round(o, cur, carry_scan)
        return new, jnp.any(new != cur), it + 1

    r1 = fill_round(o, r, carry_scan)
    state = (r1, jnp.any(r1 != r), jnp.asarray(1, jnp.int32))
    r, _, iters = jax.lax.while_loop(cond, body, state)
    return r, iters


def _face_seeds_packed(o, X: int, direction: int, lo: bool):
    """Packed seed mask: the open cells of the inlet/outlet face."""
    xw = o.shape[0]
    z = jnp.zeros_like(o)
    if direction == 0:
        if lo:
            return o & jnp.uint32(1) & jnp.where(
                jnp.arange(xw).reshape(-1, 1, 1) == 0, _FULL, jnp.uint32(0))
        bit = jnp.uint32(1) << jnp.uint32((X - 1) % 32)
        return o & bit & jnp.where(
            jnp.arange(xw).reshape(-1, 1, 1) == (X - 1) // 32,
            _FULL, jnp.uint32(0))
    idx = 0 if lo else o.shape[direction] - 1
    sl = [slice(None)] * 3
    sl[direction] = idx
    return z.at[tuple(sl)].set(o[tuple(sl)])


@partial(jax.jit, static_argnames=("direction",))
def percolation_oneshot_packed(phase_ok, direction: int):
    """Inlet fill -> outlet fill restricted to the inlet-reachable set ->
    active mask + per-word-plane counts, all in ONE program on the packed
    representation (the fused-dispatch contract of
    ``floodfill._percolation_device_oneshot``; restriction argument there).
    Returns ``(active: bool (X,Y,Z), counts: int32 (X/32,))`` whose host sum
    is the active-cell count."""
    X = phase_ok.shape[0]
    o = pack_x(phase_ok)
    seeds_lo = _face_seeds_packed(o, X, direction, True)
    reach_in, _ = packed_fill(o, seeds_lo)
    seeds_hi = _face_seeds_packed(reach_in, X, direction, False)
    active, _ = packed_fill(reach_in, seeds_hi)
    counts = jnp.sum(jax.lax.population_count(active).astype(jnp.int32),
                     axis=(1, 2), dtype=jnp.int32)
    return unpack_x(active, X), counts
