"""Geometric multigrid V-cycle preconditioner for the masked stencil systems.

Stands in for Hypre SMG/PFMG (reference ``TortuosityHypre.cpp:671-678``,
``EffectiveDiffusivityHypre.cpp:580-620``).  Design:

* coarsening by 2 in all axes (stop when a dim goes odd or < 8);
* coarse masks are *rediscretised*: a coarse cell is free if any of its
  2x2x2 fine children is free — "any" pooling preserves the connectivity of
  thin pore channels, which "all" pooling would sever (SURVEY.md §7 hard
  part #1);
* piecewise-constant prolongation, full-weighting (averaging) restriction;
* damped-Jacobi smoothing (omega=0.8), symmetric pre/post counts so the
  V-cycle is a symmetric operator and PCG stays valid;
* fixed sweep count at the coarsest level (still linear + symmetric).

The preconditioner is a pytree dataclass (solve/preconditioners.py) so the
hierarchy flows into the jitted Krylov loop as arguments, keeping the HLO
constant-free.
"""

from __future__ import annotations

from .preconditioners import MultigridPreconditioner


def make_multigrid_preconditioner(system, nu1: int = 2, nu2: int = 2,
                                  omega: float = 0.8, coarse_sweeps: int = 30):
    """Return the V-cycle preconditioner M: r -> approximate A^{-1} r."""
    return MultigridPreconditioner.from_system(
        system, nu1=nu1, nu2=nu2, omega=omega, coarse_sweeps=coarse_sweeps
    )
