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

    phase_ok = jnp.asarray(phase) == phase_id
    seeds_lo = jnp.zeros(phase.shape, bool).at[_face_slices(direction, True)].set(True)
    seeds_hi = jnp.zeros(phase.shape, bool).at[_face_slices(direction, False)].set(True)
    if not any_true(phase_ok & seeds_lo) or not any_true(phase_ok & seeds_hi):
        return jnp.zeros(phase.shape, bool), 0.0
    reach_in, _ = flood_fill_device(phase_ok, seeds_lo)
    reach_out, _ = flood_fill_device(phase_ok, seeds_hi)
    active = reach_in & reach_out
    return active, count_true(active) / total
