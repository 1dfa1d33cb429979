"""Batched (vmapped) solves for the REV study.

The REV sweep solves many independent same-size periodic cell problems —
embarrassingly parallel, so the whole batch runs as ONE device program:
``jax.vmap`` over the system pytree turns the fused CG loop into a batched
CG with lockstep iterations (the while_loop runs until every sample meets
the tolerance — per-sample "converged" masks come for free because each
sample's alpha/beta/residual are its own lanes).  SURVEY.md §7 hard part #7.

Refinement (float64 outer / float32 Krylov) is vectorised the same way: the
outer residual and rescaling are per-sample, and rounds continue until all
samples converge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stencil import make_cell_problem_system
from ..ops.flux import deff_integrand_sum
from .cg import _cg_loop
from .preconditioners import JacobiPreconditioner


def _vmap_cg(systems, r0, denom, eps, maxiter):
    diag = systems.diag
    if diag.ndim == 1:  # scalar diag per sample (cell problem)
        diag = diag[:, None, None, None]
    precond = JacobiPreconditioner(diag=jnp.broadcast_to(diag, r0.shape),
                                   free=systems.free)
    return jax.vmap(
        lambda s, rr, dd, m: _cg_loop(s, rr, dd, eps, maxiter, m)
    )(systems, r0, denom, precond)


def batched_cell_problems(masks, direction_k: int, eps: float, maxiter: int,
                          dx=(1.0, 1.0, 1.0), inner_dtype=jnp.float32,
                          outer_dtype=jnp.float64, max_refine_rounds: int = 6,
                          inner_round_cap: int = 5000):
    """Solve chi_k for a (B, X, Y, Z) stack of active masks.

    Returns ``(chi (B,X,Y,Z) outer_dtype, rel_res (B,), converged (B,))``.
    """
    masks = jnp.asarray(masks, bool)
    build = jax.vmap(
        lambda a: make_cell_problem_system(a, direction_k, dx, dtype=inner_dtype)
    )
    systems = build(masks)

    denom_lo = jnp.where(systems.b_norm > 0, systems.b_norm, 1.0)
    denom_hi = denom_lo.astype(outer_dtype)

    B = masks.shape[0]
    z_total = jnp.zeros(masks.shape, outer_dtype)

    def outer_residual(z):
        sys_hi = systems.astype(outer_dtype)
        r = jax.vmap(lambda s, zz: s.initial_residual(zz))(sys_hi, z)
        scale = jnp.sqrt(jnp.sum(r * r, axis=(1, 2, 3)))
        return r, scale

    budget = int(maxiter)
    rel = jnp.full((B,), jnp.inf)
    for _ in range(int(max_refine_rounds)):
        r_hi, scale = outer_residual(z_total)
        rel = scale / denom_hi
        if bool(jnp.all(rel <= eps)) or budget <= 0:
            break
        safe = jnp.where(scale > 0, scale, 1.0)
        r_lo = (r_hi / safe[:, None, None, None]).astype(inner_dtype)
        res = _vmap_cg(systems, r_lo, jnp.ones((B,), inner_dtype), 1e-5,
                       min(budget, int(inner_round_cap)))
        z_total = z_total + safe[:, None, None, None] * res.z.astype(outer_dtype)
        budget -= int(jnp.max(res.iterations))

    r_hi, scale = outer_residual(z_total)
    rel = scale / denom_hi
    chi = jax.vmap(lambda s, zz: s.assemble_solution(zz))(
        systems.astype(outer_dtype), z_total
    )
    return chi, rel, rel <= eps


def batched_deff(crops, phase_id: int, eps: float = 1e-9, maxiter: int = 20000,
                 dx=(1.0, 1.0, 1.0), **kw):
    """D_eff tensors for a (B, n, n, n) stack of phase crops.

    Returns ``(deff (B, 3, 3) float64 ndarray, converged (B,) bool)``.
    """
    crops = jnp.asarray(np.asarray(crops))
    masks = crops == phase_id
    chis = []
    convs = jnp.ones((crops.shape[0],), bool)
    for k in range(3):
        chi_k, rel, conv = batched_cell_problems(masks, k, eps, maxiter, dx, **kw)
        chis.append(chi_k)
        convs = convs & conv
    n_total = int(np.prod(crops.shape[1:]))
    sums = jax.vmap(
        lambda cx, cy, cz, a: deff_integrand_sum(cx, cy, cz, a, dx)
    )(chis[0], chis[1], chis[2], masks)
    return np.asarray(sums) / n_total, np.asarray(convs)
