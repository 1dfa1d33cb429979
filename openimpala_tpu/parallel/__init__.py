"""Device-mesh + halo-exchange layer.

TPU-native replacement for the reference's AMReX domain decomposition
(``BoxArray.maxSize`` + ``DistributionMapping``, ``FillBoundary`` ghost
exchange, ``ParallelDescriptor`` reductions — see reference
``src/props/TortuosityHypre.cpp:584-585`` and SURVEY.md §2.3).

Two modes of operation:

1. **GSPMD (default)** — ops are written as global-array jnp programs; arrays
   carry a ``NamedSharding`` over a 1-D ``Mesh`` along the X (leading) axis
   and XLA's SPMD partitioner inserts the halo collectives for the shifted
   slices automatically.  This is the idiomatic-JAX path and is what the
   solvers use.
2. **Explicit shard_map** — ``halo.halo_exchange_x`` implements the width-1
   halo exchange with ``jax.lax.ppermute`` over ICI for use inside
   ``shard_map`` regions (Pallas kernels, tests that pin down the comm
   pattern, and the multi-chip dry-run).
"""

from .mesh import make_mesh, shard_volume, volume_pspec
from .halo import halo_exchange_x, pad_halo, shard_map_stencil_apply
from . import multihost

__all__ = [
    "multihost",
    "make_mesh",
    "shard_volume",
    "volume_pspec",
    "halo_exchange_x",
    "pad_halo",
    "shard_map_stencil_apply",
]
