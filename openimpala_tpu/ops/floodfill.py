"""Percolation masking: which cells of a phase connect inlet to outlet.

The reference does a double synchronous-Jacobi flood fill (6-neighbour
dilation iterated with halo exchange until globally unchanged,
``TortuosityHypre.cpp:297-389``), seeds gathered from the inlet/outlet domain
faces (``:406-495``), then ANDs the two reachability masks (``:526-538``).

Two implementations with identical results:

* ``flood_fill_host`` — connected-component labelling (scipy.ndimage.label,
  6-connectivity) on the host: O(N) one pass, the fast path for large
  volumes.  Reachability-from-face = membership in a label present on that
  face.
* ``flood_fill_device`` — the TPU-native synchronous dilation as a
  ``lax.while_loop`` over a fused 6-neighbour max-stencil.  O(path length)
  passes; used for moderate volumes, for the sharded demo, and to
  cross-validate the host path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.halo import pad_halo


def _face_slices(direction: int, lo: bool):
    sl = [slice(None)] * 3
    sl[direction] = 0 if lo else -1
    return tuple(sl)


def flood_fill_device(phase_ok, seeds, max_iter: int | None = None):
    """Synchronous-Jacobi flood fill on device.

    ``phase_ok``: bool (X,Y,Z) — cells of the target phase.
    ``seeds``: bool (X,Y,Z) — initially-reached cells (already ANDed with
    ``phase_ok`` by the caller, mirroring ``TortuosityHypre.cpp:317-324``).

    Iterates ``mask |= phase_ok & dilate6(mask)`` until no change, cap
    ``sum(dims)+2`` like the reference (``TortuosityHypre.cpp:328``).
    """
    phase_ok = phase_ok.astype(bool)
    mask0 = (seeds & phase_ok).astype(jnp.int8)
    pok = phase_ok.astype(jnp.int8)
    if max_iter is None:
        max_iter = int(sum(phase_ok.shape)) + 2

    def dilate(m):
        mp = pad_halo(m, (False, False, False))
        nbr = (
            mp[:-2, 1:-1, 1:-1] | mp[2:, 1:-1, 1:-1]
            | mp[1:-1, :-2, 1:-1] | mp[1:-1, 2:, 1:-1]
            | mp[1:-1, 1:-1, :-2] | mp[1:-1, 1:-1, 2:]
        )
        return (m | nbr) & pok

    def cond(state):
        m, changed, it = state
        return changed & (it < max_iter)

    def body(state):
        m, _, it = state
        m2 = dilate(m)
        return m2, jnp.any(m2 != m), it + 1

    mask, _, iters = jax.lax.while_loop(cond, body, (mask0, jnp.array(True), 0))
    return mask.astype(bool), iters


def _sweep_axis(reach, open_, axis: int, reverse: bool):
    """One directional raster sweep: propagate reachability along ``axis``
    (forward, or backward when ``reverse``) through open cells.

    reach'[i] = open[i] & (reach[i] | reach'[i-1]) — the whole line resolves
    in ONE pass: a cell is newly reached iff the LATEST event at or before
    it in the line is a "reached" event (some reached cell with no blocked
    cell after it).  Events are packed into one integer per cell —
    ``2*(pos+1)+1`` reached, ``2*(pos+1)`` blocked, ``0`` none — so a single
    running maximum resolves the line and its parity is the answer.  (The
    two-cummax formulation ``last_reached > last_blocked`` cost 2x the scan
    traffic; int16 positions halve it again — the O(log n) scan-doubling
    passes over the event field dominate the sweep.)
    """
    n = reach.shape[axis]
    dt = jnp.int16 if 2 * n + 1 < 32768 else jnp.int32
    idx = jax.lax.broadcasted_iota(dt, reach.shape, axis)
    if reverse:
        idx = jnp.asarray(n - 1, dt) - idx
    two = jnp.asarray(2, dt)
    ev = jnp.where(reach, two * idx + jnp.asarray(3, dt),
                   jnp.where(open_, jnp.asarray(0, dt),
                             two * idx + two))
    last = jax.lax.cummax(ev, axis=axis, reverse=reverse)
    return open_ & ((last & jnp.asarray(1, dt)) == 1)


def flood_fill_device_raster(phase_ok, seeds, max_rounds: int | None = None):
    """Raster-scan flood fill on device: alternating ±X/±Y/±Z segmented-scan
    sweeps until a fixed point.

    Each round performs 6 directional sweeps (each one fused cummax pass, so
    ~O(1) volume passes per round); a round subsumes at least one 6-neighbour
    dilation step, so the fixed point equals BFS reachability, but porous
    media converge in ~the number of direction changes of the hardest path
    (typically 10-40 rounds at 512^3) instead of O(sum dims) ~ 1500 dilation
    passes.  TPU-native replacement for the host BFS in one-shot solves:
    the volume never round-trips to the host.  Reference counterpart:
    synchronous-Jacobi parallelFloodFill, ``TortuosityHypre.cpp:297-389``.
    """
    open_ = phase_ok.astype(bool)
    reach0 = seeds.astype(bool) & open_
    if max_rounds is None:
        max_rounds = int(sum(open_.shape)) + 2

    def one_round(reach):
        for axis in (0, 1, 2):
            for reverse in (False, True):
                reach = _sweep_axis(reach, open_, axis, reverse)
        return reach

    def cond(state):
        _, n_prev, n_cur, it = state
        return (n_cur != n_prev) & (it < max_rounds)

    def body(state):
        reach, _, n_cur, it = state
        reach = one_round(reach)
        # reachability only grows, so count equality <=> fixed point
        return reach, n_cur, jnp.sum(reach, dtype=jnp.int32), it + 1

    reach = one_round(reach0)
    state = (reach, jnp.asarray(-1, jnp.int32),
             jnp.sum(reach, dtype=jnp.int32), jnp.asarray(1, jnp.int32))
    reach, _, _, iters = jax.lax.while_loop(cond, body, state)
    return reach, iters


def _percolation_device_oneshot(phase_ok, direction: int):
    """Inlet fill -> outlet fill restricted to the inlet-reachable set ->
    active count, fused into one program (one dispatch, one tiny fetch).

    The restriction is exact: any open path from a reach_in cell to the
    outlet face lies entirely in the same connected component, hence
    entirely in reach_in — so the second fill computes reach_in & reach_out
    while sweeping a smaller, simpler domain (same trick as the native
    BFS's hi pass, native/impala_native.cpp).

    Production path: the uint32-packed bit fill (ops/packfill.py) — 32x
    less sweep traffic than the int16-event raster fill, which remains as
    ``flood_fill_device_raster`` for the sharded fallback and
    cross-validation.  Returns ``(active, per-word-plane int32 counts)``;
    the host sums the counts in Python ints (no device int64 — overflow-
    safe above ~2.1e9 active cells regardless of the x64 flag)."""
    from .packfill import percolation_oneshot_packed

    return percolation_oneshot_packed(phase_ok, direction)


def flood_fill_host(phase_ok: np.ndarray, direction: int):
    """Host connected-components percolation: returns (reach_inlet,
    reach_outlet) boolean volumes, equivalent to the two device flood fills."""
    from scipy import ndimage

    structure = ndimage.generate_binary_structure(3, 1)  # 6-connectivity
    labels, _ = ndimage.label(np.asarray(phase_ok, dtype=bool), structure=structure)
    lo_labels = np.unique(labels[_face_slices(direction, True)])
    hi_labels = np.unique(labels[_face_slices(direction, False)])
    lo_labels = lo_labels[lo_labels > 0]
    hi_labels = hi_labels[hi_labels > 0]
    reach_in = np.isin(labels, lo_labels)
    reach_out = np.isin(labels, hi_labels)
    return reach_in, reach_out


def auto_uses_device_fill(shape) -> bool:
    """Does ``percolation_mask(method="auto")`` run the fill ON DEVICE for a
    host-resident volume of this shape?  The single source of truth for the
    policy — also consulted by ``props/tortuosity.py`` to decide whether the
    solver warm-up thread may start during percolation (the device fill
    leaves the host core free; the host BFS does not)."""
    return (jax.default_backend() == "tpu" and jax.device_count() == 1
            and int(np.prod(shape)) >= 192 ** 3 and shape[-1] % 8 == 0)


def percolation_mask(phase, phase_id: int, direction: int, method: str = "auto"):
    """Active mask = cells of ``phase_id`` reachable from BOTH the inlet and
    outlet faces of ``direction`` (``TortuosityHypre.cpp:394-558``).

    Returns ``(active: bool ndarray-like, active_vf: float)`` where
    ``active_vf = n_active / n_total`` over the whole domain
    (``TortuosityHypre.cpp:549-553``).  If either face carries no seed cells
    of the phase, the mask is empty and active_vf = 0
    (``TortuosityHypre.cpp:508-514``).
    """
    total = int(np.prod(phase.shape))
    if method == "auto":
        if isinstance(phase, np.ndarray):
            from ..io import native

            if auto_uses_device_fill(phase.shape):
                # raster fill on device beats the host BFS at one-shot scale
                # (measured 512^3: 4.7 s vs 5.5-13.6 s end to end incl.
                # transfers, scripts/perc512.py) and ships the mask
                # bit-packed; multi-device hosts keep the native BFS (their
                # mask feeds host-side padding before sharding).
                method = "device"
            else:
                method = "native" if native.available() else "host"
        else:
            method = "device"

    if method == "native":
        # C++ BFS (native/impala_native.cpp): visits each voxel once instead
        # of once per wavefront step; fastest host path for big volumes.
        from ..io import native

        res = native.percolation_mask_phase(np.asarray(phase), phase_id,
                                            direction)
        if res is None:  # dtype outside the fused fast path
            res = native.percolation_mask(
                np.ascontiguousarray(np.asarray(phase) == phase_id, np.int8),
                direction,
            )
        if res is None:  # toolchain unavailable -> host fallback
            method = "host"
        else:
            active, n_active = res
            return active, n_active / total

    if method == "host":
        phase_np = np.asarray(phase)
        phase_ok = phase_np == phase_id
        if not phase_ok[_face_slices(direction, True)].any() or not phase_ok[
            _face_slices(direction, False)
        ].any():
            return np.zeros(phase.shape, bool), 0.0
        reach_in, reach_out = flood_fill_host(phase_ok, direction)
        active = reach_in & reach_out
        return active, float(active.sum()) / total

    from ..utils.common import any_true, count_true

    if isinstance(phase, np.ndarray):
        # host input to the device fill: compare + bit-pack in one native
        # pass and ship packed (8x less tunnel traffic than the int8 phase)
        from .masks import upload_phase_mask

        phase_ok = upload_phase_mask(phase, phase_id)
    else:
        phase_ok = jnp.asarray(phase) == phase_id
    sharded = len(getattr(phase_ok.sharding, "device_set", ())) > 1
    if not sharded:
        # both fills + the count as ONE program, ONE scalar fetch: each
        # separate dispatch (seed checks, inter-fill hop, count) costs a
        # tunnel round-trip that together rivaled the fills themselves.
        # Empty seed faces need no early-out — they yield an empty mask and
        # active_vf = 0.0 through the same program.
        active, plane_counts = _percolation_device_oneshot(phase_ok, direction)
        n_active = int(np.asarray(plane_counts).sum(dtype=np.int64))
        return active, n_active / total
    # sharded: the packed fill runs device-resident under shard_map with
    # explicit cross-shard carries (packfill.py) — the scans never cross
    # the sharded axis implicitly, so the "segmented scans lower poorly
    # under GSPMD" limitation of the raster fill does not apply
    from .packfill import percolation_oneshot_packed_sharded

    res = percolation_oneshot_packed_sharded(phase_ok, direction)
    if res is not None:
        active, counts = res
        return active, int(np.asarray(counts).sum(dtype=np.int64)) / total
    seeds_lo = jnp.zeros(phase.shape, bool).at[_face_slices(direction, True)].set(True)
    seeds_hi = jnp.zeros(phase.shape, bool).at[_face_slices(direction, False)].set(True)
    if not any_true(phase_ok & seeds_lo) or not any_true(phase_ok & seeds_hi):
        return jnp.zeros(phase.shape, bool), 0.0
    # unsupported sharding layouts keep the synchronous-dilation fallback
    reach_in, _ = flood_fill_device(phase_ok, seeds_lo)
    reach_out, _ = flood_fill_device(phase_ok, seeds_hi)
    active = reach_in & reach_out
    return active, count_true(active) / total


def percolation_mask_sharded(phase, phase_id: int, direction: int,
                             original_shape=None):
    """Distributed percolation for an X-SHARDED volume: per-shard native
    BFS + boundary-plane exchange rounds.

    Replaces the synchronous-dilation device fill for pre-sharded volumes
    (VERDICT r2 item 6): the dilation needs O(sum dims) stencil passes
    (~3100 at 1024^3) while this runs one linear-time BFS per shard and
    exchanges only the 2-D boundary reachability planes between X
    neighbours, repeating until no shard learns anything new —
    O(#boundary crossings of the pore network) rounds, typically 2-4.
    The same local-fill + boundary-exchange structure as the reference's
    parallelFloodFill (``TortuosityHypre.cpp:297-389``), but each local
    step is a full BFS, not one dilation.

    Single-host only (every shard must be addressable; multi-host callers
    keep the GSPMD dilation path).  Returns ``(active, active_vf)`` with
    ``active`` sharded like ``phase``, or None when unavailable (no native
    library, multi-host, or non-X sharding).
    """
    from ..io import native

    if not isinstance(phase, jax.Array) or not hasattr(phase, "sharding"):
        return None
    if jax.process_count() > 1:
        return None
    if native.get_lib() is None or not hasattr(native.get_lib(),
                                               "impala_bfs_seeded"):
        return None
    shards = sorted(phase.addressable_shards, key=lambda s: s.index[0].start)
    if len(shards) != len(phase.sharding.device_set):
        return None  # not fully addressable
    # contiguous X-slab decomposition only
    pos = 0
    for s in shards:
        if (s.index[0].start != pos or s.index[1] != slice(None, None, None)
                and s.index[1] != slice(0, phase.shape[1], None)):
            return None
        pos = s.index[0].stop
    if pos != phase.shape[0]:
        return None

    shape = tuple(original_shape) if original_shape else tuple(phase.shape)
    n_sh = len(shards)
    pid = int(phase_id)
    phase_np = [np.asarray(s.data) for s in shards]
    phase_ok = [(p == pid).astype(np.int8) for p in phase_np]
    x_starts = [s.index[0].start for s in shards]
    x_stops = [s.index[0].stop for s in shards]

    def run_pass(seed_hi: bool):
        masks = [np.zeros_like(p, dtype=np.int8) for p in phase_ok]
        seeds = [np.zeros_like(p, dtype=np.int8) for p in phase_ok]
        face = shape[direction] - 1 if seed_hi else 0
        pending = set()
        for i in range(n_sh):
            if direction == 0:
                if x_starts[i] <= face < x_stops[i]:
                    seeds[i][face - x_starts[i], :, :] = 1
                    pending.add(i)
            else:
                sl = [slice(None)] * 3
                sl[direction] = face
                seeds[i][tuple(sl)] = 1
                pending.add(i)
        while pending:
            nxt_pending = set()
            for i in sorted(pending):
                res = native.bfs_seeded(phase_ok[i], masks[i], seeds[i])
                mask_new, n_new = res
                seeds[i][:] = 0
                if n_new == 0:
                    masks[i] = mask_new.astype(np.int8)
                    continue
                masks[i] = mask_new.astype(np.int8)
                # export boundary reachability planes to X neighbours
                if i + 1 < n_sh:
                    plane = masks[i][-1]
                    tgt = (plane.astype(bool) & phase_ok[i + 1][0].astype(bool)
                           & ~masks[i + 1][0].astype(bool))
                    if tgt.any():
                        seeds[i + 1][0] |= tgt
                        nxt_pending.add(i + 1)
                if i > 0:
                    plane = masks[i][0]
                    tgt = (plane.astype(bool) & phase_ok[i - 1][-1].astype(bool)
                           & ~masks[i - 1][-1].astype(bool))
                    if tgt.any():
                        seeds[i - 1][-1] |= tgt
                        nxt_pending.add(i - 1)
            pending = nxt_pending
        return masks

    lo_masks = run_pass(False)
    hi_masks = run_pass(True)
    active_np = [(lo & hi).astype(bool)
                 for lo, hi in zip(lo_masks, hi_masks)]
    n_active = sum(int(a.sum()) for a in active_np)

    devices = [s.device for s in shards]
    parts = [jax.device_put(a, d) for a, d in zip(active_np, devices)]
    active = jax.make_array_from_single_device_arrays(
        phase.shape, phase.sharding, parts)
    return active, n_active / float(np.prod(shape))
