"""Mixed-precision iterative refinement — the TPU path to 1e-9 residuals.

Hypre runs the reference solves in float64; TPU float64 is software-emulated
and slow, while float32 is the fast VPU path but cannot reach a 1e-9
*relative* residual on its own.  Classic fix: iterate

    r = b - A x            (float64: one matvec + masked subtract)
    solve A d = r          (float32 Krylov to ~1e-6 relative)
    x = x + d              (float64)

Each round multiplies the true residual by ~the inner tolerance, so 2 rounds
reach 1e-12.  The float64 work per round is one stencil apply + a norm —
negligible next to the float32 Krylov iterations.

``solve_system`` also provides the pure-float64 path (``inner_dtype=None``)
used on CPU for golden-value generation and available on TPU for
verification runs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .cg import cg, SolveResult, jacobi_preconditioner
from .fgmres import fgmres


def _krylov(method: str, system, r0, denom, eps, maxiter, precond):
    if method in ("cg", "pcg"):
        return cg(system, r0, denom, eps, maxiter, precond=precond)
    if method in ("flexgmres", "gmres", "fgmres"):
        return fgmres(system, r0, denom, eps, maxiter, precond=precond)
    raise ValueError(f"unknown Krylov method: {method}")


def solve_system(
    system,
    x0_free,
    eps: float,
    maxiter: int,
    method: str = "cg",
    precond="none",
    inner_dtype=jnp.float32,
    inner_eps: float = 1e-6,
    max_refine_rounds: int = 6,
):
    """Solve the StencilSystem to ``||b - A x|| / ||b_full|| <= eps``.

    Returns ``(x_full, info: SolveResult)`` where ``x_full`` is the
    full-domain solution (forced rows included) in the system dtype and
    ``info.rel_res`` is the *true* full-system relative residual measured in
    the system (outer) dtype.

    ``precond``: "none" | "jacobi" | "mg" | a callable r -> z.
    ``inner_dtype=None`` disables refinement and runs the Krylov method
    directly in the system dtype.
    """
    outer_dtype = system.r0_b.dtype

    def make_precond(sys_):
        if precond is None or precond == "none":
            return None
        if precond == "jacobi":
            return jacobi_preconditioner(sys_)
        if precond == "mg":
            from .multigrid import make_multigrid_preconditioner

            return make_multigrid_preconditioner(sys_)
        return precond

    if inner_dtype is None or jnp.dtype(inner_dtype) == jnp.dtype(outer_dtype):
        r0 = system.initial_residual(x0_free)
        res = _krylov(method, system, r0, system.b_norm, eps, maxiter, make_precond(system))
        x_full = system.assemble_solution(x0_free + res.z)
        return x_full, res

    sys_lo = system.astype(inner_dtype)
    M_lo = make_precond(sys_lo)
    denom = jnp.where(system.b_norm > 0, system.b_norm, 1.0)

    z_total = jnp.zeros_like(x0_free)
    total_iters = jnp.array(0, jnp.int32)
    rel = jnp.inf
    prev_rel = jnp.inf
    budget = int(maxiter)

    for _ in range(int(max_refine_rounds)):
        r64 = system.initial_residual(x0_free + z_total)
        scale = jnp.sqrt(jnp.sum(r64 * r64))
        rel = scale / denom
        if bool(rel <= eps):
            break
        if bool(rel >= prev_rel * 0.5) and bool(jnp.isfinite(prev_rel)):
            break  # stagnation: float32 inner solve can't improve further
        if budget <= 0:
            break
        prev_rel = rel
        r_lo = (r64 / jnp.where(scale > 0, scale, 1.0)).astype(inner_dtype)
        inner = _krylov(method, sys_lo, r_lo, jnp.asarray(1.0, inner_dtype),
                        inner_eps, budget, M_lo)
        z_total = z_total + scale * inner.z.astype(outer_dtype)
        total_iters = total_iters + inner.iterations
        budget -= int(inner.iterations)

    r64 = system.initial_residual(x0_free + z_total)
    rel = jnp.sqrt(jnp.sum(r64 * r64)) / denom
    x_full = system.assemble_solution(x0_free + z_total)
    info = SolveResult(
        z=z_total,
        iterations=total_iters,
        rel_res=rel,
        converged=rel <= eps,
    )
    return x_full, info
