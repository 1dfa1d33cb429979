"""Batched (vmapped) solves for the REV study.

The REV sweep solves many independent same-size periodic cell problems —
embarrassingly parallel, so a whole batch runs as ONE device program:
``jax.vmap`` over the system pytree turns the CG iteration into a batched
CG with lockstep lanes (per-sample alpha/beta/residual).  SURVEY.md §7 hard
part #7.  Three scale ingredients (VERDICT r1 item 5):

* **Chebyshev preconditioning** — the batched counterpart of the Galerkin
  V-cycle: a fixed SPD polynomial in the Jacobi-scaled operator, stateless
  (vmaps trivially), fori_loop-formulated, and it amortises CG's two sync
  points over ``degree`` stencil passes.  At 256^3 it cuts iterations ~an
  order of magnitude vs plain Jacobi.
* **Chunked dispatches** — the fused while(batched-CG) program at 64x256^3
  would exceed what the remote TPU runtime survives; like solve/cg.py, the
  batch advances ``chunk`` fused iterations per dispatch with host-side
  convergence checks.
* **HBM-sized batch groups** — ``batched_deff`` splits the crop stack into
  groups sized from the refinement state's bytes-per-crop so the target
  config (64 x 256^3 crops x 3 directions) streams through a 16 GiB chip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stencil import make_cell_problem_system
from ..ops.flux import deff_integrand_sum
from .preconditioners import ChebyshevPreconditioner, JacobiPreconditioner


def _make_precond(systems, r0, precond: str, degree: int):
    diag = systems.diag
    if diag.ndim == 1:  # scalar diag per sample (cell problem)
        diag = diag[:, None, None, None]
    diag = jnp.broadcast_to(diag, r0.shape).astype(r0.dtype)
    if precond == "cheby":
        return jax.vmap(
            lambda d, f: ChebyshevPreconditioner(
                diag=d, free=f, w=systems.w, periodic=systems.periodic,
                degree=degree)
        )(diag, systems.free)
    return JacobiPreconditioner(diag=diag, free=systems.free)


@partial(jax.jit, static_argnames=("chunk",))
def _batched_cg_chunk(systems, precond, state, eps, chunk: int):
    """``chunk`` lockstep PCG iterations over the batch as one dispatch.
    Converged lanes pass their state through unchanged."""
    def one_sample(s, M, st, denom):
        dtype = st[1].dtype

        def body(_, st):
            z, r, p, rz, it, rel, done = st
            # apply_xla: the Pallas matvec cannot be vmapped (memory space
            # ANY blocks don't re-block over the batch dim); in the regime
            # where batching pays (crops <= ~96^3) the kernel's layout
            # contract (Z % 128) doesn't hold anyway
            ap = s.apply_xla(p)
            pap = jnp.sum(p * ap)
            ok = pap > 0
            alpha = jnp.where(ok, rz / jnp.where(ok, pap, 1.0), 0.0)
            z2 = z + alpha * p
            r2 = r - alpha * ap
            rel2 = jnp.sqrt(jnp.sum(r2 * r2)) / denom
            y = M(r2)
            rz2 = jnp.sum(r2 * y)
            beta = jnp.where(rz > 0, rz2 / jnp.where(rz > 0, rz, 1.0), 0.0)
            p2 = y + beta * p
            done2 = done | (rel2 <= jnp.asarray(eps, dtype)) | (~ok)
            sel = lambda new, old: jnp.where(done, old, new)
            return (sel(z2, z), sel(r2, r), sel(p2, p), sel(rz2, rz),
                    sel(it + 1, it), sel(rel2, rel), done2)

        return jax.lax.fori_loop(0, chunk, body, st)

    denoms = state[-1]
    out = jax.vmap(one_sample)(systems, precond, state[:-1], denoms) + (denoms,)
    # packed convergence probe — ONE fetch per chunk (see solve/cg.py)
    probe = jnp.stack([jnp.max(out[4]).astype(jnp.float64),
                       jnp.all(out[6]).astype(jnp.float64)])
    return out, probe


def _batched_cg(systems, r0, denom, eps, maxiter: int, precond,
                chunk: int = 25):
    """Host-chunked batched PCG: z with z0=0 per lane."""
    dtype = r0.dtype
    B = r0.shape[0]
    y = jax.vmap(lambda M, r: M(r))(precond, r0)
    rz = jnp.sum(r0 * y, axis=(1, 2, 3))
    rel0 = jnp.sqrt(jnp.sum(r0 * r0, axis=(1, 2, 3))) / denom
    state = (jnp.zeros_like(r0), r0, y, rz, jnp.zeros((B,), jnp.int32),
             rel0, rel0 <= jnp.asarray(eps, dtype), denom)
    while True:
        state, probe = _batched_cg_chunk(systems, precond, state, float(eps),
                                         chunk)
        it_max, all_done = np.asarray(probe)  # ONE fetch per chunk
        if all_done > 0 or int(it_max) >= maxiter:
            break
    z, r, p, rz, it, rel, done, _ = state
    return z, it, rel


def batched_cell_problems(masks, direction_k: int, eps: float, maxiter: int,
                          dx=(1.0, 1.0, 1.0), inner_dtype=jnp.float32,
                          outer_dtype=jnp.float64, max_refine_rounds: int = 6,
                          inner_round_cap: int = 5000, precond: str = "cheby",
                          cheby_degree: int = 12):
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

    @jax.jit
    def outer_residual(systems, z):
        sys_hi = systems.astype(outer_dtype)
        r = jax.vmap(lambda s, zz: s.initial_residual(zz))(sys_hi, z)
        scale = jnp.sqrt(jnp.sum(r * r, axis=(1, 2, 3)))
        return r, scale

    budget = int(maxiter)
    rel = jnp.full((B,), jnp.inf)
    for _ in range(int(max_refine_rounds)):
        r_hi, scale = outer_residual(systems, z_total)
        rel = scale / denom_hi
        if bool(jnp.all(rel <= eps)) or budget <= 0:
            break
        safe = jnp.where(scale > 0, scale, 1.0)
        r_lo = (r_hi / safe[:, None, None, None]).astype(inner_dtype)
        M = _make_precond(systems, r_lo, precond, cheby_degree)
        # adaptive round tolerance (see solve/refine.py): only the remaining
        # reduction factor is requested, with a 0.3 safety margin
        worst = float(jnp.max(rel))
        need = float(eps / worst) * 0.3 if worst > 0 else 1e-5
        round_eps = min(max(1e-5, need), 0.099)
        z, iters, _ = _batched_cg(systems, r_lo, jnp.ones((B,), inner_dtype),
                                  round_eps, min(budget, int(inner_round_cap)),
                                  M)
        z_total = z_total + safe[:, None, None, None] * z.astype(outer_dtype)
        budget -= int(jnp.max(iters))

    r_hi, scale = outer_residual(systems, z_total)
    rel = scale / denom_hi
    chi = jax.vmap(lambda s, zz: s.assemble_solution(zz))(
        systems.astype(outer_dtype), z_total
    )
    return chi, rel, rel <= eps


# peak f32-field equivalents live per crop through one refinement round:
# system (code bf16 + r0_b + x_forced) ~2.5, f64 accumulator 2, f64 outer
# residual + its apply transients ~6, r_lo 1, Chebyshev diag+free ~1.25,
# CG state (z, r, p) + matvec/precond temps ~5 -> ~16.  The original
# 10-field model OOM'd a 16 GiB v5e at 16 x 256^3 (measured r4).
FIELDS_PER_CROP = 16


def _auto_group_size(crop_shape, requested=None, budget_bytes=None):
    """Crops per device group: size groups to ~10 GiB at FIELDS_PER_CROP
    f32-field equivalents per crop so 64 x 256^3 streams through one chip.
    ``budget_bytes`` overrides the HBM budget (tests exercise the grouping
    at CI-sized crops with a shrunken budget)."""
    if requested is not None:
        return max(1, int(requested))
    crop_bytes = int(np.prod(crop_shape)) * 4
    budget = 10 * 1024 ** 3 if budget_bytes is None else int(budget_bytes)
    return max(1, budget // (FIELDS_PER_CROP * crop_bytes))


def batched_deff(crops, phase_id: int, eps: float = 1e-9, maxiter: int = 20000,
                 dx=(1.0, 1.0, 1.0), group_size=None, verbose: int = 0,
                 budget_bytes=None, **kw):
    """D_eff tensors for a (B, n, n, n) stack of phase crops, streamed in
    HBM-sized groups.

    Returns ``(deff (B, 3, 3) float64 ndarray, converged (B,) bool)``.
    """
    crops = np.asarray(crops)
    B = crops.shape[0]
    G = _auto_group_size(crops.shape[1:], group_size, budget_bytes)
    deffs = np.zeros((B, 3, 3))
    convs = np.zeros((B,), bool)
    n_total = int(np.prod(crops.shape[1:]))
    for g0 in range(0, B, G):
        g1 = min(B, g0 + G)
        masks = jnp.asarray(crops[g0:g1] == phase_id)
        chis, conv = [], jnp.ones((g1 - g0,), bool)
        for k in range(3):
            chi_k, rel, ck = batched_cell_problems(masks, k, eps, maxiter,
                                                   dx, **kw)
            chis.append(chi_k)
            conv = conv & ck
        sums = jax.vmap(
            lambda cx, cy, cz, a: deff_integrand_sum(cx, cy, cz, a, dx)
        )(chis[0], chis[1], chis[2], masks)
        deffs[g0:g1] = np.asarray(sums) / n_total
        convs[g0:g1] = np.asarray(conv)
        if verbose:
            print(f"  REV batch group {g0}-{g1 - 1}: "
                  f"converged={int(convs[g0:g1].sum())}/{g1 - g0}")
    return deffs, convs
