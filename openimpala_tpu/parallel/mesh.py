"""Device mesh construction + volume sharding.

Replaces the reference's ``BoxArray.maxSize(box_size)`` +
``DistributionMapping`` box-to-rank assignment (reference
``src/props/Diffusion.cpp:266-268``) with a 1-D ``jax.sharding.Mesh`` over
the X (leading) axis of the voxel volume.  A 1-D decomposition is the right
call on TPU: each halo exchange is then a single ``ppermute`` of one Y-Z
plane per neighbour over ICI, and the (Y, Z) trailing axes stay contiguous
for the (sublane, lane) = (8, 128) vector tiling.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "x"  # name of the spatial mesh axis


def make_mesh(devices=None, n_devices: int | None = None) -> Mesh:
    """Build a 1-D device mesh over the X axis of the volume.

    ``devices`` defaults to all local devices; ``n_devices`` takes the first
    N of them (useful for tests on a virtual CPU mesh).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def volume_pspec() -> P:
    """PartitionSpec for a (X, Y, Z) volume sharded along X."""
    return P(AXIS, None, None)


# Auto-sharding engages only above this volume size: tiny problems are
# faster single-device (collective latency dominates) and the unit-test
# volumes stay byte-identical to their single-device goldens.
AUTO_SHARD_MIN_CELLS = 96 ** 3


def resolve_mesh(mesh, shape, min_cells: int = AUTO_SHARD_MIN_CELLS) -> Mesh | None:
    """Resolve a driver's ``mesh`` argument.

    ``mesh`` may be ``None`` (single device), a ``jax.sharding.Mesh`` (used
    as given), or ``"auto"``: build a 1-D mesh over all local devices when
    there is more than one and the volume is large enough to amortise the
    collectives.  This is the TPU-native counterpart of the reference running
    the same binary on any MPI rank count (``Diffusion.cpp:174``).
    """
    if mesh is None:
        return None
    if isinstance(mesh, Mesh):
        return mesh if mesh.devices.size > 1 else None
    if mesh == "auto":
        devices = jax.devices()
        if len(devices) <= 1:
            return None
        if int(np.prod(shape)) < min_cells:
            return None
        return make_mesh(devices)
    raise ValueError(f"mesh must be None, 'auto', or a Mesh; got {mesh!r}")


def shard_volume(x, mesh: Mesh | None):
    """Place a (X, Y, Z) array on ``mesh`` sharded along the X axis.

    The X extent must be divisible by the mesh size (pad the volume with
    inactive cells first if not — inactive cells are identity rows and do
    not change any result; see ops/stencil.py).
    """
    if mesh is None:
        return jax.device_put(x)
    n = mesh.devices.size
    if x.shape[0] % n != 0:
        raise ValueError(
            f"volume X extent {x.shape[0]} not divisible by mesh size {n}; "
            "pad with inactive cells first (ops.masks.pad_volume_to)"
        )
    return jax.device_put(x, NamedSharding(mesh, volume_pspec()))
