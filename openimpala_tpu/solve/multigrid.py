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

Everything is a pure function of the residual, so the whole preconditioner
jits into the CG loop.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.stencil import apply_restricted, weighted_degree


@dataclasses.dataclass(frozen=True)
class _Level:
    diag: jax.Array
    free: jax.Array
    w: tuple
    periodic: tuple

    def apply(self, x):
        return apply_restricted(x, self.diag, self.free, self.w, self.periodic)


def _can_coarsen(shape):
    return all(s % 2 == 0 and s >= 8 for s in shape)


def _restrict(x):
    X, Y, Z = x.shape
    return x.reshape(X // 2, 2, Y // 2, 2, Z // 2, 2).mean(axis=(1, 3, 5))


def _prolong(xc):
    x = jnp.repeat(xc, 2, axis=0)
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def _coarsen_free(free):
    X, Y, Z = free.shape
    return free.reshape(X // 2, 2, Y // 2, 2, Z // 2, 2).any(axis=(1, 3, 5))


def build_hierarchy(system, max_levels: int = 10) -> Sequence[_Level]:
    dtype = system.r0_b.dtype
    diag_is_scalar = jnp.ndim(system.diag) == 0
    levels = [
        _Level(diag=system.diag, free=system.free, w=system.w, periodic=system.periodic)
    ]
    free = system.free
    w = system.w
    while len(levels) < max_levels and _can_coarsen(free.shape):
        free = _coarsen_free(free)
        w = tuple(wi / 4.0 for wi in w)  # dx doubles
        if diag_is_scalar:
            diag = jnp.asarray(2.0 * sum(w), dtype)
        else:
            diag = weighted_degree(free, w, system.periodic, dtype)
        levels.append(_Level(diag=diag, free=free, w=w, periodic=system.periodic))
    return levels


def _smooth(level: _Level, x, r, n: int, omega: float):
    diag = jnp.broadcast_to(level.diag, r.shape)
    inv_d = jnp.where(level.free & (diag > 0), omega / jnp.where(diag > 0, diag, 1.0), 0.0)

    def body(i, x):
        return x + inv_d * (r - level.apply(x))

    return jax.lax.fori_loop(0, n, body, x)


def make_multigrid_preconditioner(
    system, nu1: int = 2, nu2: int = 2, omega: float = 0.8, coarse_sweeps: int = 30
):
    """Return M: r -> approximate A^{-1} r (one V-cycle)."""
    levels = build_hierarchy(system)
    n_levels = len(levels)

    def vcycle(level_idx: int, r):
        level = levels[level_idx]
        x = jnp.zeros_like(r)
        if level_idx == n_levels - 1:
            return _smooth(level, x, r, coarse_sweeps, omega)
        x = _smooth(level, x, r, nu1, omega)
        resid = jnp.where(level.free, r - level.apply(x), jnp.zeros((), r.dtype))
        rc = _restrict(resid)
        coarse = levels[level_idx + 1]
        rc = jnp.where(coarse.free, rc, jnp.zeros((), rc.dtype))
        ec = vcycle(level_idx + 1, rc)
        x = x + jnp.where(level.free, _prolong(ec), jnp.zeros((), r.dtype))
        return _smooth(level, x, r, nu2, omega)

    def M(r):
        # build the hierarchy from a system already cast to the Krylov dtype
        # (solve_system does this); the result dtype follows r.
        return vcycle(0, r)

    return M
