"""Halo exchange primitives.

TPU-native replacement for AMReX ``FillBoundary`` (reference
``src/props/TortuosityHypre.cpp:584-585``, ``EffectiveDiffusivityHypre.cpp:462``):
width-1 ghost layers around each shard, periodic or clamped.

``pad_halo`` is the single-device / GSPMD form (a plain jnp.pad the SPMD
partitioner converts into neighbour collectives when the array is sharded).
``halo_exchange_x`` is the explicit form for use *inside* ``shard_map``:
each shard sends its first/last X-plane to its neighbours with
``jax.lax.ppermute`` over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .mesh import AXIS


def pad_halo(x, periodic: tuple[bool, bool, bool]):
    """Pad a (X, Y, Z) array to (X+2, Y+2, Z+2) ghost layout.

    Periodic axes wrap; non-periodic axes are zero-filled, which encodes the
    reference's "outside the domain = inactive / no-flux" convention (the
    Fortran fill reads ghost cells of the *mask*, and a zero mask ghost is
    exactly an absent link — reference ``TortuosityHypreFill.F90:126-166``).
    """
    for axis, per in enumerate(periodic):
        width = [(0, 0)] * x.ndim
        width[axis] = (1, 1)
        x = jnp.pad(x, width, mode="wrap" if per else "constant")
    return x


def halo_exchange_x(x_local, periodic_x: bool, axis_name: str = AXIS):
    """Explicit width-1 halo exchange along the sharded X axis.

    For use inside shard_map: returns ``(X_local+2, Y, Z)`` where plane 0 is
    the previous shard's last plane and plane -1 the next shard's first
    plane.  Boundary shards receive the wrapped plane (periodic) or zeros
    (clamped).  Communication is two ``ppermute`` ring shifts over ICI.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    lo_plane = x_local[:1]  # our first plane -> previous shard's hi ghost
    hi_plane = x_local[-1:]  # our last plane  -> next shard's lo ghost

    if n == 1:
        if periodic_x:
            ghost_lo, ghost_hi = hi_plane, lo_plane
        else:
            ghost_lo = jnp.zeros_like(lo_plane)
            ghost_hi = jnp.zeros_like(hi_plane)
        return jnp.concatenate([ghost_lo, x_local, ghost_hi], axis=0)

    # receive from the left: shard i gets shard (i-1)'s last plane
    ghost_lo = jax.lax.ppermute(
        hi_plane, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    # receive from the right: shard i gets shard (i+1)'s first plane
    ghost_hi = jax.lax.ppermute(
        lo_plane, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    if not periodic_x:
        zero_lo = jnp.zeros_like(ghost_lo)
        ghost_lo = jnp.where(idx == 0, zero_lo, ghost_lo)
        ghost_hi = jnp.where(idx == n - 1, jnp.zeros_like(ghost_hi), ghost_hi)
    return jnp.concatenate([ghost_lo, x_local, ghost_hi], axis=0)


def shard_map_stencil_apply(apply_padded, mesh, periodic, n_field_args=1):
    """Wrap a local padded-block stencil function into a sharded global op.

    ``apply_padded(*padded_fields)`` must take (X_local+2, Y+2, Z+2) blocks
    and return the (X_local, Y, Z) interior result.  The returned callable
    takes global (X, Y, Z) arrays sharded along X and performs the halo
    exchange explicitly with ppermute.  Used by the Pallas path and by
    parity tests against the GSPMD path.
    """
    from jax import shard_map

    spec = P(AXIS, None, None)

    def local_fn(*fields):
        padded = []
        for f in fields:
            fx = halo_exchange_x(f, periodic[0])
            for axis in (1, 2):
                width = [(0, 0)] * fx.ndim
                width[axis] = (1, 1)
                fx = jnp.pad(fx, width, mode="wrap" if periodic[axis] else "constant")
            padded.append(fx)
        return apply_padded(*padded)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple([spec] * n_field_args),
        out_specs=spec,
    )
