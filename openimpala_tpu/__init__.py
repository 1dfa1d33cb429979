"""openimpala_tpu — TPU-native image-based transport homogenisation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
kramergroup/openImpala (reference: /root/reference): ingest segmented 3-D
tomography volumes (TIFF / HDF5 / DAT / RAW), solve steady-state diffusion /
conduction on the voxel grid with masked 7-point finite-difference stencils,
and report homogenised transport properties: volume fraction, flow-through
tortuosity, and the effective-diffusivity tensor D_eff.

Architecture (TPU-first, not a port):

- ``parallel/``  device mesh, sharded volume placement, and halo exchange
  (``shard_map`` + ``ppermute``) replacing AMReX ``BoxArray``/
  ``DistributionMapping``/``MultiFab``/``FillBoundary``.
- ``ops/``       masked stencil operators (pure-XLA and Pallas TPU kernels)
  replacing the Fortran fill kernels + Hypre StructMatrix — the solve is
  matrix-free; isotropic AND anisotropic voxel spacing run the same fused
  kernels via a packed bf16 operator geometry (``ops/stencil.py``).
- ``solve/``     Krylov (CG / FlexGMRES; the BiCGSTAB solver *name* is
  accepted and maps to CG — the eliminated systems are SPD, see
  ``config.SOLVER_MAP``) + geometric multigrid preconditioning +
  mixed-precision iterative refinement, replacing Hypre FlexGMRES(SMG/PFMG).
- ``props/``     physics drivers: volume fraction, percolation masking,
  tortuosity, effective diffusivity, REV study, explicit baseline solver.
- ``io/``        host-side readers/writers (TIFF/HDF5/DAT/RAW in; results.txt,
  REV CSV, HDF5+XDMF volumes, cathode parameter exporters out), with an
  optional native C++ decode path.

Precision policy: double precision is required for the reference's 1e-9
relative-residual and 1e-6 flux-conservation acceptance gates.  We enable
jax x64 support on import (opt out with ``OPENIMPALA_NO_X64=1``); the hot
solver path still runs float32 on TPU with float64 iterative refinement on
top (see ``solve/refine.py``), so enabling x64 does not slow the kernels.
"""

import os as _os

# Some TPU runtime plugins override the JAX_PLATFORMS env var; the config
# call below is honoured regardless, so OPENIMPALA_PLATFORM=cpu gives a
# reliable platform override (e.g. CPU smoke runs on a TPU host).
if _os.environ.get("OPENIMPALA_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["OPENIMPALA_PLATFORM"])

if _os.environ.get("OPENIMPALA_NO_X64", "0") != "1":
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA compiles of the 3-D stencil programs can
# take minutes on tunnelled/remote TPU runtimes; cache them across runs.
# Opt out with OPENIMPALA_NO_COMPILE_CACHE=1; JAX_COMPILATION_CACHE_DIR (or
# an explicit jax.config call before import) takes precedence.
if (_os.environ.get("OPENIMPALA_NO_COMPILE_CACHE", "0") != "1"
        and "JAX_COMPILATION_CACHE_DIR" not in _os.environ):
    import jax as _jax

    if not _jax.config.jax_compilation_cache_dir:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.join(_os.path.expanduser("~"), ".cache", "openimpala_jax"),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

__version__ = "0.1.0"

from . import ops, parallel, props, solve  # noqa: E402,F401
from .props.volume_fraction import volume_fraction  # noqa: E402,F401
from .props.tortuosity import tortuosity  # noqa: E402,F401
from .props.effective_diffusivity import (  # noqa: E402,F401
    effective_diffusivity,
    deff_tensor,
)
