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

Memory layout: the system is STORED in the Krylov dtype (float32 on TPU —
the coefficients are exact there: the diagonal is a small integer multiple
of the stencil weights and the rhs entries are small multiples of 1/dx).
The float64 upcast happens inside the jitted outer-residual computation, so
no float64 system arrays are ever materialised — at 512^3 that saves ~3 GiB
of HBM versus storing the system in double.

``solve_system`` also provides the pure-float64 path (``inner_dtype=None``
with a float64-stored system), used on CPU for golden-value generation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .cg import cg, SolveResult, jacobi_preconditioner
from .fgmres import fgmres
from ..utils.profiling import phase_timer


def _krylov(method: str, system, r0, denom, eps, maxiter, precond,
            refined: bool = True, verbose: int = 0, history=None):
    if method in ("cg", "pcg"):
        return cg(system, r0, denom, eps, maxiter, precond=precond,
                  verbose=verbose, history=history)
    if method in ("flexgmres", "gmres", "fgmres"):
        # the FGMRES plateau break is only safe when an iterative-refinement
        # outer loop exists to re-scale the residual and continue (``refined``)
        return fgmres(system, r0, denom, eps, maxiter, precond=precond,
                      stall_break=refined, verbose=verbose, history=history)
    raise ValueError(f"unknown Krylov method: {method}")


@partial(jax.jit, static_argnames=("outer_dtype",))
def _outer_residual(system, x_outer, outer_dtype):
    """free * (b - A x) with the system upcast to ``outer_dtype`` on the fly
    (fused into the stencil pass; no persistent high-precision arrays)."""
    sys_hi = system.astype(outer_dtype)
    r = sys_hi.initial_residual(x_outer)
    return r, jnp.sqrt(jnp.sum(r * r))


# The refinement loop's glue steps are module-level jitted programs rather
# than eager op chains: each eager jnp op compiles (and, over the tunnelled
# TPU runtime, LOADS) its own micro-executable, and those loads — not the
# arithmetic — dominated the first solve of a process (measured 512^3:
# ~1.3 s of unprimed programs in solve_k0 after all the big programs were
# warm, scripts/deffprof.py).  As named jit functions they are AOT-primable
# from ShapeDtypeStructs in solve/warmup.py and fuse into one dispatch each.

@jax.jit
def _round0_estimate(system, z_total):
    """Round-0 residual in the Krylov (storage) dtype + its f64 norm, one
    program.  The first residual is O(1e-1) relative — far above the f32
    noise floor — so the f64 stencil pass is skipped (VERDICT r3 item 3);
    the caller re-measures in f64 if the estimate lands near the floor."""
    r_hi = system.initial_residual(z_total.astype(system.r0_b.dtype))
    scale = jnp.sqrt(jnp.sum(
        r_hi.astype(jnp.float32) ** 2).astype(jnp.float64))
    return r_hi, scale


@partial(jax.jit, static_argnames=("inner_name",))
def _scale_inner_rhs(r_hi, scale, inner_name):
    """Normalized inner-round RHS: (r / ||r||) cast to the Krylov dtype."""
    return (r_hi / jnp.where(scale > 0, scale, 1.0)
            .astype(r_hi.dtype)).astype(inner_name)


@jax.jit
def _accumulate(z_total, scale, z):
    """High-precision accumulation z_total += scale * z (one program)."""
    return z_total + scale * z.astype(z_total.dtype)


@partial(jax.jit, static_argnames=("outer_name",))
def _assemble_hi(system, z_total, outer_name):
    """x_forced + free-masked z with the upcast fused (never materialises a
    high-precision x_forced volume)."""
    return system.astype(outer_name).assemble_solution(z_total)


def make_precond(sys_, precond, opts=None, method: str = "cg"):
    opts = opts or {}
    if precond == "auto":
        # Galerkin multigrid wins everywhere it can run: 145 vs 7909
        # iterations at 512^3.  Both Krylov drivers chunk their dispatches
        # on TPU (solve/cg.py chunked loop; solve/fgmres.py per-cycle host
        # loop), so the V-cycle preconditioner is safe at any size.
        precond = "gmg"
    if precond is None or precond == "none":
        return None
    if precond == "jacobi":
        return jacobi_preconditioner(sys_)
    if precond in ("cheby", "chebyshev"):
        from .preconditioners import ChebyshevPreconditioner

        return ChebyshevPreconditioner.from_system(sys_, **opts)
    if precond == "mg":
        from .preconditioners import MultigridPreconditioner

        return MultigridPreconditioner.from_system(sys_, **opts)
    if precond == "gmg":
        from .preconditioners import GalerkinMGPreconditioner

        return GalerkinMGPreconditioner.from_system(sys_, **opts)
    if precond in ("sa", "samg"):
        from .sa import SAMGPreconditioner

        return SAMGPreconditioner.from_system(sys_, **opts)
    return precond


def solve_system(
    system,
    x0_free,
    eps: float,
    maxiter: int,
    method: str = "cg",
    precond="none",
    inner_dtype=jnp.float32,
    inner_eps: float = 1e-5,
    max_refine_rounds: int = 8,
    inner_round_cap: int = 5000,
    outer_dtype=jnp.float64,
    precond_opts=None,
    verbose: int = 0,
    history=None,
):
    """Solve the StencilSystem to ``||b - A x|| / ||b_full|| <= eps``.

    ``history``: opt-in ``ResidualHistory`` — per-round outer residuals and
    the host-observed inner (per-chunk / per-cycle) trace, cumulative
    iteration counts across refinement rounds (SURVEY §5).

    The system should be STORED in ``inner_dtype`` (or the final dtype when
    ``inner_dtype is None``).  Returns ``(x_full, info)`` with ``x_full`` in
    ``outer_dtype`` and ``info.rel_res`` the true full-system relative
    residual measured in ``outer_dtype``.

    ``precond``: "none" | "jacobi" | "mg" | a callable r -> z.
    ``inner_dtype=None`` disables refinement: the Krylov method runs directly
    in the system's storage dtype.

    MIRROR: ``solve/lanes.py::solve_system_lanes`` runs this exact
    refinement policy lane-wise (low-precision round-0 residual + f32-floor
    guard, adaptive round_eps, iteration budget, stall break, stale final
    re-measure).  Any policy change here must be mirrored there; the
    lanes-vs-sequential D_eff parity test pins the equivalence.
    """
    storage_dtype = system.r0_b.dtype

    # refinement engages whenever the Krylov dtype is lower precision than
    # the requested outer (result/residual) dtype
    if inner_dtype is None or jnp.dtype(inner_dtype) == jnp.dtype(outer_dtype):
        r0 = system.initial_residual(x0_free.astype(storage_dtype))
        res = _krylov(method, system, r0, system.b_norm, eps, maxiter,
                      make_precond(system, precond, precond_opts, method),
                      refined=False, verbose=verbose, history=history)
        x_full = system.assemble_solution(x0_free + res.z)
        return x_full, res

    if jnp.dtype(storage_dtype) != jnp.dtype(inner_dtype):
        system = system.astype(inner_dtype)
    with phase_timer("solve/hierarchy_build"):
        M_lo = make_precond(system, precond, precond_opts, method)
    # host float: the denominator's only consumers are host-side rel
    # computations — a device max/where pair would be two more tiny
    # programs plus a fetch
    bn = float(system.b_norm)
    denom = bn if bn > 0 else 1.0

    # fold the initial guess into the accumulator: one persistent f64 volume
    # instead of two (1 GiB saved at 512^3)
    z_total = x0_free.astype(outer_dtype)
    del x0_free
    total_iters = jnp.array(0, jnp.int32)
    rel = jnp.inf
    prev_rel = jnp.inf
    budget = int(maxiter)

    stale = True  # does rel reflect the current z_total?
    for round_i in range(int(max_refine_rounds)):
        with phase_timer("solve/outer_residual"):
            # the FIRST residual is O(1e-1) relative — orders of magnitude
            # above the f32 noise floor — and its only consumers are the
            # f32 inner RHS and a coarse rel estimate, so measure it in the
            # Krylov dtype: the f64 stencil apply is software-emulated on
            # TPU and this saves one of the three f64 passes per solve
            # (VERDICT r3 item 3).  Guard: if it lands anywhere near the
            # f32 floor, re-measure in f64.
            lo_first = round_i == 0
            if lo_first:
                r_hi, scale = _round0_estimate(system, z_total)
                rel = float(scale) / denom
                if rel < 1e-3:  # too close to the f32 floor to trust
                    lo_first = False
            if not lo_first:
                r_hi, scale = _outer_residual(system, z_total,
                                              jnp.dtype(outer_dtype).name)
                rel = float(scale) / denom
        stale = False
        if verbose >= 2:
            print(f"  refine round: outer rel_res={float(rel):.6e}")
        if history is not None:
            history.record_outer(round_i, rel)
        if bool(rel <= eps):
            break
        if bool(rel >= prev_rel * 0.5) and bool(jnp.isfinite(prev_rel)):
            break  # stagnation: the float32 inner solve can't improve further
        if budget <= 0:
            break
        prev_rel = rel
        r_lo = _scale_inner_rhs(r_hi, scale, jnp.dtype(inner_dtype).name)
        # cap each round: float32 Krylov can stall just above inner_eps and
        # must not eat the whole budget — the refinement loop compounds the
        # per-round reduction regardless.  The round's tolerance is also
        # ADAPTIVE: once rel is within a few decades of eps, only the
        # remaining reduction factor (with a 0.3 safety margin) is requested —
        # solving every round to inner_eps overshoots the final residual by
        # orders of magnitude and wastes ~25% of the Krylov iterations.
        need = float(eps / rel) * 0.3 if rel > 0 else inner_eps
        round_eps = min(max(inner_eps, need), 0.099)
        with phase_timer("solve/inner_round"):
            if history is not None:
                history._base = int(total_iters)
            inner = _krylov(method, system, r_lo,
                            jnp.asarray(1.0, inner_dtype),
                            round_eps, min(budget, int(inner_round_cap)),
                            M_lo, refined=True, verbose=verbose,
                            history=history)
            z_total = _accumulate(z_total, scale, inner.z)
            total_iters = total_iters + inner.iterations
            budget -= int(inner.iterations)
        stale = True

    if stale:
        # only when the round cap exhausted AFTER an update — every break
        # path measured the residual of the final z_total already (VERDICT
        # r3 item 3: the unconditional re-measure wasted an f64 stencil
        # apply + norm + fetch per solve)
        r_hi, scale = _outer_residual(system, z_total, jnp.dtype(outer_dtype).name)
        rel = float(scale) / denom
        if history is not None:
            history.record_outer(-1, rel)  # final (budget-exhausted) point
    x_full = _assemble_hi(system, z_total, jnp.dtype(outer_dtype).name)
    info = SolveResult(
        z=z_total,
        iterations=total_iters,
        rel_res=rel,
        converged=rel <= eps,
    )
    return x_full, info
