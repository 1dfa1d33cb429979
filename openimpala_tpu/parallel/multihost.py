"""Multi-host execution: the same sharded program over DCN-connected hosts.

The reference scales by launching one binary on N MPI ranks
(``mpirun Diffusion inputs``, any rank count — ``Diffusion.cpp:174``); the
TPU-native counterpart is JAX multi-process execution: every host runs THIS
same program, ``jax.distributed.initialize`` wires the processes together,
``jax.devices()`` becomes the global device list, and the existing 1-D X
``Mesh`` (parallel/mesh.py) simply spans hosts — GSPMD then routes halo
exchanges over ICI within a slice and DCN between slices.  Nothing in the
solver stack changes: the drivers' ``mesh`` argument accepts the global
mesh as-is.

Host-side responsibilities under multi-host:

* **Ingest** — each process materialises shards only for its OWN
  (addressable) devices; ``io.ingest.threshold_sharded`` already skips
  non-addressable devices, mirroring the reference's per-rank
  strip/hyperslab reads (``TiffReader.cpp:289-444``).  X-slab readers
  (HDF5/RAW) read only the local X range; Z-page streams (TIFF) partition
  the pages across processes — each host decodes ~file_size/n_hosts and a
  single jitted int8 reshard (GSPMD all-to-all) converts the Z-sharded
  ingest layout to the solver's X sharding (``io/ingest.py
  _threshold_z_partitioned``).
* **Percolation mask** — computed host-side on the int8 phase (replicated
  per host: ~1 GiB at 1024^3, host RAM, never HBM); every host computes the
  same mask deterministically, as with the reference's collective flood
  fill result.
* **Result reduction** — driver outputs (tau, fluxes, D_eff) are scalars
  computed from global reductions inside jit, identical on every process;
  only ``process_index == 0`` should write results files.

Verified end-to-end by ``tests/test_multihost.py``, which launches real
multi-process JAX (2 processes x 4 virtual CPU devices over a localhost
coordinator) and checks the sharded production solve against the
single-process result.
"""

from __future__ import annotations

import os


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Wire this process into a multi-host run (idempotent).

    On TPU pods all arguments auto-detect from the environment (call with
    no arguments, exactly like ``amrex::Initialize`` after ``mpirun``).  For
    CPU rigs / tests, pass an explicit localhost coordinator and the
    process count.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # idempotence: a second call is a no-op
        if "already" not in str(e).lower():
            raise


def is_coordinator() -> bool:
    """True on the process that should write result files (rank 0)."""
    import jax

    return jax.process_index() == 0


def global_mesh():
    """1-D X mesh over ALL devices of ALL processes (the multi-host
    counterpart of ``parallel.mesh.make_mesh``)."""
    from .mesh import make_mesh

    return make_mesh()  # jax.devices() is global after initialize()


def local_x_ranges(mesh, X: int):
    """The [x0, x1) slabs of the padded X axis owned by THIS process's
    devices — what a per-host reader should actually read."""
    import jax

    devices = list(mesh.devices.ravel())
    n = len(devices)
    xloc = (X + ((-X) % n)) // n
    return [
        (d * xloc, min((d + 1) * xloc, X))
        for d, dev in enumerate(devices)
        if dev.process_index == jax.process_index()
    ]
