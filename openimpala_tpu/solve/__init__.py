"""Matrix-free linear solvers.

Replaces Hypre Struct FlexGMRES + SMG/PFMG (reference
``TortuosityHypre.cpp:664-692``, ``EffectiveDiffusivityHypre.cpp:580-620``)
with jit-compiled Krylov methods over the fused stencil matvec:

* ``cg``          — preconditioned conjugate gradients (the default: the
  eliminated systems are SPD, see ops/stencil.py), fixed-shape
  ``lax.while_loop``.
* ``fgmres``      — restarted flexible GMRES, for parity with the
  reference's solver surface and for non-SPD experiments.
* ``multigrid``   — geometric multigrid V-cycle preconditioner with masked
  (rediscretised) coarse operators, standing in for SMG/PFMG.
* ``refine``      — float64 iterative refinement over a float32 inner solve:
  the TPU-fast path to the 1e-9 relative-residual acceptance gate.

All solvers return values (solution, iterations, relative residual,
converged flag) instead of raising — numerical failure propagates as
NaN/flags exactly like the reference (``TortuosityHypre.cpp:687-708``).
"""

from .cg import cg, ResidualHistory, SolveResult, jacobi_preconditioner
from .refine import solve_system
from .fgmres import fgmres
from .preconditioners import make_multigrid_preconditioner

__all__ = [
    "cg",
    "fgmres",
    "ResidualHistory",
    "SolveResult",
    "jacobi_preconditioner",
    "solve_system",
    "make_multigrid_preconditioner",
]
