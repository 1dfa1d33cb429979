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


def _default_carry_in(prop, gen, reverse: bool):
    """Exclusive carry per word plane: the word-level (propagate, generate)
    recurrence ``c_out = gen | (prop & c_in)`` resolved along axis 0."""
    c_out = _scan_semiring(prop, gen, 0, reverse)
    return _shift(c_out, 1, 0, reverse)


def _sweep_x(o, r, reverse: bool, carry_in_fn=_default_carry_in):
    """One directional X sweep on the packed words: intra-word Kogge-Stone
    fill, carry-lookahead across word planes, carry-run fill.
    ``carry_in_fn`` resolves the word-level carry recurrence (overridden by
    the sharded driver to carry across device shards)."""
    if not reverse:
        g = _ks_fill_up(o, r)
        gen = (g >> 31).astype(bool)  # fill reached the word's top bit
    else:
        g = _ks_fill_down(o, r)
        gen = (g & jnp.uint32(1)).astype(bool)
    prop = o == _FULL  # a carry crosses the whole word iff fully open
    c_in = carry_in_fn(prop, gen, reverse)
    run = _low_run(o) if not reverse else _high_run(o)
    return g | jnp.where(c_in, run, jnp.uint32(0))


def fill_round(o, r, carry_in_fn=_default_carry_in):
    """Six directional sweeps (±X, ±Y, ±Z), state carried through — one
    round subsumes a 6-neighbour dilation step, so the fixed point equals
    BFS reachability while porous media converge in ~the number of
    direction changes of the hardest path."""
    r = _sweep_x(o, r, False, carry_in_fn)
    r = _sweep_x(o, r, True, carry_in_fn)
    for axis in (1, 2):
        for reverse in (False, True):
            r = _scan_semiring(o, r, axis, reverse)
    return r


def packed_fill(o, r, max_rounds: int | None = None,
                carry_in_fn=_default_carry_in, changed_fn=jnp.any):
    """Iterate fill rounds to the fixed point (reach stops changing).
    ``changed_fn`` reduces the per-element change mask to the loop predicate
    (the sharded driver makes it a global psum so every shard iterates in
    lockstep).

    The first round runs INSIDE the while_loop (initial predicate forced
    true): inlining it separately doubled the serialized executable —
    program-load time over the tunnelled runtime scales with executable
    size, and the fill program sits on the one-shot critical path."""
    if max_rounds is None:
        max_rounds = int(o.shape[0] * 32 + o.shape[1] + o.shape[2]) + 2

    def cond(state):
        _, changed, it = state
        return changed & (it < max_rounds)

    def body(state):
        cur, _, it = state
        new = fill_round(o, cur, carry_in_fn)
        return new, changed_fn(new != cur), it + 1

    state = (r, jnp.asarray(True), jnp.asarray(0, jnp.int32))
    r, _, iters = jax.lax.while_loop(cond, body, state)
    return r, iters


def _double_fill(o, seeds_lo, outlet_seeds_fn, max_rounds: int,
                 carry_in_fn=_default_carry_in, changed_fn=jnp.any):
    """Inlet fill -> (at its fixed point) re-seed from the outlet face ->
    outlet fill restricted to the inlet-reachable set, all as ONE
    while_loop whose body contains ``fill_round`` exactly once.

    Running the two fills as separate loops put four copies of the round
    body in the HLO (each loop also inlined its first round); at 512^3 the
    serialized executable was 4.3 MB and its load over the tunnelled
    runtime (~1 MB/s effective) dominated the percolation wall.  The staged
    loop keeps one copy: when stage 0 stops changing, the open set becomes
    the inlet-reachable mask and the reach state re-seeds from the outlet
    plane (the restriction trick of ``floodfill._percolation_device_oneshot``).
    The per-round cost of the transition plumbing is two word-volume
    selects + the seed expression — noise next to a round's ~40 sweeps.

    ``outlet_seeds_fn(reach_in)`` must return the packed outlet-plane seeds
    restricted to ``reach_in``.  Returns ``(active, rounds_total)``.
    """

    def cond(state):
        _, _, stage, changed, it = state
        return (changed | (stage == 0)) & (it < 2 * max_rounds + 2)

    def body(state):
        o_cur, r, stage, _, it = state
        new = fill_round(o_cur, r, carry_in_fn)
        ch = changed_fn(new != r)
        done0 = (stage == 0) & (~ch)
        o_next = jnp.where(done0, new, o_cur)
        r_next = jnp.where(done0, outlet_seeds_fn(new), new)
        return (o_next, r_next, stage + done0.astype(stage.dtype),
                ch | done0, it + 1)

    state = (o, seeds_lo, jnp.asarray(0, jnp.int32), jnp.asarray(True),
             jnp.asarray(0, jnp.int32))
    _, active, _, _, iters = jax.lax.while_loop(cond, body, state)
    return active, iters


def _face_seeds_packed(o, face: int, direction: int, word_offset=0):
    """Packed seed mask: the open cells of the global plane
    ``{x,y,z}[direction] == face``.  ``word_offset`` is the global index of
    this block's first word (nonzero inside a shard_map shard)."""
    if direction == 0:
        w, b = face // 32, face % 32
        gw = word_offset + jnp.arange(o.shape[0]).reshape(-1, 1, 1)
        return o & (jnp.uint32(1) << jnp.uint32(b)) & jnp.where(
            gw == w, _FULL, jnp.uint32(0))
    sl = [slice(None)] * 3
    sl[direction] = face
    return jnp.zeros_like(o).at[tuple(sl)].set(o[tuple(sl)])


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
    seeds_lo = _face_seeds_packed(o, 0, direction)
    outlet = X - 1 if direction == 0 else phase_ok.shape[direction] - 1
    max_rounds = int(o.shape[0] * 32 + o.shape[1] + o.shape[2]) + 2
    active, _ = _double_fill(
        o, seeds_lo,
        lambda reach_in: _face_seeds_packed(reach_in, outlet, direction),
        max_rounds)
    counts = jnp.sum(jax.lax.population_count(active).astype(jnp.int32),
                     axis=(1, 2), dtype=jnp.int32)
    return unpack_x(active, X), counts


# ---------------------------------------------------------------------------
# sharded driver (shard_map over the 1-D X mesh)
# ---------------------------------------------------------------------------

def _shift_ones(x, k: int, reverse: bool):
    """One-filled shift along axis 0 (out-of-range counts as 'open path')."""
    pad = [(0, 0)] * x.ndim
    sl = [slice(None)] * x.ndim
    if not reverse:
        pad[0] = (k, 0)
        sl[0] = slice(0, x.shape[0])
    else:
        pad[0] = (0, k)
        sl[0] = slice(k, None)
    return jnp.pad(x, pad, constant_values=True)[tuple(sl)]


def _prefix_and_exclusive(prop, reverse: bool):
    """pa[w] = AND of ``prop`` over local words strictly before w in sweep
    order (True at the first word)."""
    a = prop
    n = prop.shape[0]
    k = 1
    while k < n:
        a = a & _shift_ones(a, k, reverse)
        k *= 2
    return _shift_ones(a, 1, reverse)


def _make_sharded_carry_in(axis_name: str):
    """Cross-shard word-level carry: local carry-lookahead, then the shard
    summaries — (A, B) = (carry propagates through the whole shard, carry
    generated by the shard) — compose over the mesh via one all_gather of
    two (Y, Z) boolean planes per sweep.  The X sweeps are the ONLY place
    the fill touches the sharded axis, so this is the fill's entire
    communication; the Y/Z semiring sweeps stay shard-local."""

    def carry_in(prop, gen, reverse: bool):
        b_loc = _scan_semiring(prop, gen, 0, reverse)  # zero-entry local scan
        c_in_loc = _shift(b_loc, 1, 0, reverse)
        pa = _prefix_and_exclusive(prop, reverse)
        last = 0 if reverse else prop.shape[0] - 1
        a_tot = pa[last] & prop[last]  # AND of every local prop
        b_tot = b_loc[last]  # local carry-out with zero carry-in
        a_all = jax.lax.all_gather(a_tot, axis_name)  # (D, Y, Z)
        b_all = jax.lax.all_gather(b_tot, axis_name)
        n_dev = a_all.shape[0]
        idx = jax.lax.axis_index(axis_name)
        order = range(n_dev) if not reverse else range(n_dev - 1, -1, -1)
        c = jnp.zeros_like(b_tot)
        c_mine = jnp.zeros_like(b_tot)
        for s in order:  # exclusive compose in sweep order (D is static)
            c_mine = jnp.where(idx == s, c, c_mine)
            c = b_all[s] | (a_all[s] & c)
        return c_in_loc | (pa & c_mine)

    return carry_in


def percolation_oneshot_packed_sharded(phase_ok, direction: int,
                                       outlet: int | None = None):
    """Distributed packed fill for an X-SHARDED boolean volume: the same
    inlet fill -> restricted outlet fill -> count program under
    ``shard_map``, with the word-level carries crossing shards via one
    all_gather of two (Y, Z) planes per X sweep and a psum'd fixed-point
    predicate.  Replaces both the O(sum dims) synchronous-dilation GSPMD
    fallback and the host-bound per-shard BFS for device-resident volumes
    (reference counterpart: parallelFloodFill's local-fill +
    boundary-exchange structure, ``TortuosityHypre.cpp:297-389``).

    ``outlet``: global index of the outlet plane along ``direction``
    (defaults to the last plane; pass the original extent - 1 when the
    volume carries ingest padding along X).  Returns ``(active, counts)``
    with ``active`` bool sharded like ``phase_ok`` and ``counts`` an int32
    per-word-plane vector (host-summable), or None when the sharding is
    unsupported (not a 1-D X mesh, or X not divisible by 32 * n_devices).
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = getattr(phase_ok, "sharding", None)
    if not isinstance(sharding, NamedSharding):
        return None
    mesh = sharding.mesh
    if len(mesh.axis_names) != 1:
        return None
    axis = mesh.axis_names[0]
    if tuple(sharding.spec) not in ((axis,), (axis, None, None)):
        return None
    n_dev = mesh.devices.size
    X = phase_ok.shape[0]
    if X % (32 * n_dev) != 0:
        return None
    out_face = (phase_ok.shape[direction] - 1 if outlet is None
                else int(outlet))
    xwl = X // 32 // n_dev  # words per shard
    carry_in_fn = _make_sharded_carry_in(axis)

    def changed_fn(diff):
        return jax.lax.psum(jnp.any(diff).astype(jnp.int32), axis) > 0

    # the round cap mirrors the reference's GLOBAL sum(dims) + 2
    # (TortuosityHypre.cpp:328) — local shapes would undershoot it
    max_rounds = X + phase_ok.shape[1] + phase_ok.shape[2] + 2

    def body(local_ok):
        o = pack_x(local_ok)
        offset = jax.lax.axis_index(axis) * xwl
        seeds_lo = _face_seeds_packed(o, 0, direction, word_offset=offset)
        active, _ = _double_fill(
            o, seeds_lo,
            lambda reach_in: _face_seeds_packed(reach_in, out_face, direction,
                                                word_offset=offset),
            max_rounds, carry_in_fn=carry_in_fn, changed_fn=changed_fn)
        counts = jnp.sum(jax.lax.population_count(active).astype(jnp.int32),
                         axis=(1, 2), dtype=jnp.int32)
        return unpack_x(active, X // n_dev), counts

    spec = P(axis, None, None)
    key = (mesh, direction, out_face, phase_ok.shape)
    f = _SHARDED_CACHE.get(key)
    if f is None:
        f = jax.jit(shard_map(body, mesh=mesh, in_specs=(spec,),
                              out_specs=(spec, P(axis))))
        _SHARDED_CACHE[key] = f
    return f(phase_ok)


_SHARDED_CACHE: dict = {}
