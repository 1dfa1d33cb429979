"""Preconditioned conjugate gradients on the free-set stencil system.

The eliminated operators are SPD (ops/stencil.py), so CG replaces the
reference's FlexGMRES for the same systems at ~1/3 the memory and with short
recurrences.  The loop is a fixed-shape ``lax.while_loop`` — one fused
matvec + a handful of AXPYs and two reductions per iteration; everything
jits into a single XLA program per (shape, dtype, preconditioner).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SolveResult:
    z: jax.Array  # correction on the free set (add to x_forced + x0)
    iterations: jax.Array
    rel_res: jax.Array  # final ||r|| / denom
    converged: jax.Array


def jacobi_preconditioner(system):
    """Diagonal scaling; forced rows are zeroed because residuals live on
    the free set."""
    diag = system.diag
    free = system.free

    def M(r):
        safe = jnp.where(jnp.broadcast_to(diag, r.shape) > 0, diag, 1.0).astype(r.dtype)
        return jnp.where(free, r / safe, jnp.zeros((), r.dtype))

    return M


def _dot(a, b):
    return jnp.sum(a * b)


@partial(jax.jit, static_argnames=("maxiter", "precond"))
def _cg_loop(system, r0, denom, eps, maxiter: int, precond):
    dtype = r0.dtype
    eps = jnp.asarray(eps, dtype)
    denom = jnp.asarray(denom, dtype)
    M = precond if precond is not None else (lambda r: r)

    z = jnp.zeros_like(r0)
    r = r0
    y = M(r)
    p = y
    rz = _dot(r, y)
    rel0 = jnp.sqrt(_dot(r, r)) / denom

    def cond(state):
        _, _, _, _, it, _, done = state
        return (~done) & (it < maxiter)

    def body(state):
        z, r, p, rz, it, rel, done = state
        ap = system.apply(p)
        pap = _dot(p, ap)
        # breakdown guard: non-positive curvature means the system left SPD
        # territory (should not happen) — stop rather than diverge.
        ok = pap > 0
        alpha = jnp.where(ok, rz / jnp.where(ok, pap, 1.0), 0.0)
        z = z + alpha * p
        r = r - alpha * ap
        rel = jnp.sqrt(_dot(r, r)) / denom
        conv = rel <= eps
        y = M(r)
        rz_new = _dot(r, y)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = y + beta * p
        return z, r, p, rz_new, it + 1, rel, conv | (~ok)

    state = (z, r, p, rz, jnp.array(0, jnp.int32), rel0, rel0 <= eps)
    z, r, p, rz, it, rel, done = jax.lax.while_loop(cond, body, state)
    return SolveResult(z=z, iterations=it, rel_res=rel, converged=rel <= eps)


def cg(system, r0, denom, eps, maxiter: int, precond=None) -> SolveResult:
    """Solve ``A z = r0`` on the free set with z0 = 0.

    ``denom`` is the relative-residual denominator — pass ``system.b_norm``
    to reproduce Hypre's ``||r||/||b|| <= eps`` criterion
    (``TortuosityHypre.cpp:686-688``).  A zero denominator falls back to
    ``||r0||`` (and to 1 when r0 is zero too).
    """
    denom = jnp.where(denom > 0, denom, jnp.sqrt(_dot(r0, r0)))
    denom = jnp.where(denom > 0, denom, 1.0)
    return _cg_loop(system, r0, denom, eps, int(maxiter), precond)
