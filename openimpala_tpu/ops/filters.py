"""Phase-field pre-filters."""

from __future__ import annotations

import jax.numpy as jnp


def remspot(phase, n_passes: int = 1):
    """Isolated-voxel removal filter (``tortuosity_remspot``,
    ``Tortuosity_filcc.F90:88-177``; driver ``TortuosityHypre.cpp:248-292``,
    default 0 passes).

    A voxel none of whose 6 neighbours shares its phase is flipped
    (0 <-> 1).  Out-of-domain neighbours never match (the reference uses a
    sentinel ``neighbor_outside``).  The reference applies the filter
    in-place over tile loops, so its result depends on tiling/rank layout;
    we implement the deterministic Jacobi (simultaneous) update, which is
    identical whenever isolated voxels are not adjacent to each other —
    and an isolated voxel by definition has no same-phase neighbour, so
    simultaneous and sequential updates agree on the first pass except for
    second-order cascades the reference itself does not define portably.
    """
    p = jnp.asarray(phase)
    for _ in range(int(n_passes)):
        pp = jnp.pad(p, 1, constant_values=-1)
        connected = (
            (pp[:-2, 1:-1, 1:-1] == p) | (pp[2:, 1:-1, 1:-1] == p)
            | (pp[1:-1, :-2, 1:-1] == p) | (pp[1:-1, 2:, 1:-1] == p)
            | (pp[1:-1, 1:-1, :-2] == p) | (pp[1:-1, 1:-1, 2:] == p)
        )
        flipped = jnp.where(p == 0, jnp.ones_like(p), jnp.zeros_like(p))
        p = jnp.where(connected, p, flipped)
    return p
