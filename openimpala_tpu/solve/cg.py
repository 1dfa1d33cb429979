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
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SolveResult:
    z: jax.Array  # correction on the free set (add to x_forced + x0)
    iterations: jax.Array
    rel_res: jax.Array  # final ||r|| / denom
    converged: jax.Array


@dataclasses.dataclass
class ResidualHistory:
    """Opt-in convergence trace (SURVEY §5 "residual-history return values"
    — the structured replacement for scraping the ``verbose >= 2`` output,
    which mirrors Hypre's iteration log ``TortuosityHypre.cpp:700-704``).

    Plain host-side lists — deliberately NOT a pytree field of SolveResult
    (whose leaves cross jit boundaries):

    * ``inner``: ``(cumulative_krylov_iteration, rel_res)`` at every point
      the host observes the residual — per 16-iteration chunk for the
      chunked MG-PCG loop, per restart cycle for FGMRES, per check for the
      host loop; a fully fused ``lax.while_loop`` solve contributes only
      its final point (nothing inside one dispatch is host-observable).
      Iteration counts continue across refinement rounds.
    * ``outer``: ``(refine_round, rel_res)`` per mixed-precision refinement
      round in the outer dtype (solve/refine.py), including the final
      residual of the returned solution.
    """

    inner: list = dataclasses.field(default_factory=list)
    outer: list = dataclasses.field(default_factory=list)
    # running Krylov-iteration offset: solve/refine.py sets it to the
    # accumulated iteration count before each refinement round so ``inner``
    # stays cumulative across rounds
    _base: int = 0

    @staticmethod
    def _val(rel):
        rel = np.asarray(rel)
        # lane solves observe a residual VECTOR per point (solve/lanes.py)
        return (float(rel) if rel.ndim == 0
                else tuple(float(v) for v in rel.ravel()))

    def record_inner(self, it: int, rel):
        self.inner.append((self._base + int(it), self._val(rel)))

    def record_outer(self, round_i: int, rel):
        self.outer.append((int(round_i), self._val(rel)))


def jacobi_preconditioner(system):
    """Diagonal scaling as a pytree (see solve/preconditioners.py — closure
    preconditioners embed their arrays as HLO constants)."""
    from .preconditioners import JacobiPreconditioner

    return JacobiPreconditioner.from_system(system)


def _dot(a, b):
    return jnp.sum(a * b)


@partial(jax.jit, static_argnames=("maxiter",))
def _cg_loop(system, r0, denom, eps, maxiter: int, precond):
    # ``precond`` is a pytree dataclass (arrays as leaves) — NOT a closure —
    # so its state enters as arguments and the HLO stays constant-free.
    dtype = r0.dtype
    eps = jnp.asarray(eps, dtype)
    denom = jnp.asarray(denom, dtype)
    M = precond

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


@partial(jax.jit, static_argnames=("chunk",))
def _cg_chunk(system, precond, state, denom, eps, chunk: int):
    """``chunk`` guarded PCG iterations as ONE dispatch.

    The tunnelled TPU runtime kills the worker when a single fused program
    executes hundreds of multigrid-preconditioned iterations (empirically:
    10 V(2,2)-preconditioned iterations at 512^3 run fine, ~hundreds crash;
    plain Jacobi bodies run for thousands).  Chunking bounds the per-dispatch
    work while keeping dispatch overhead 1/chunk of the per-step host loop.
    Iterations past convergence pass state through unchanged.

    The loop body is the TOP-form PCG recurrence (preconditioner applied at
    the start of the body, ``beta`` from the previous <r,y>): mathematically
    the same iterate sequence as the classic bottom form, but it needs NO
    ``y0 = M(r0)`` prologue — which otherwise runs a full V-cycle as dozens
    of eager dispatches (or one extra compiled program) before the first
    chunk.  On the tunnelled TPU that prologue alone cost 5-9 s per solve.
    """
    dtype = state[1].dtype
    eps = jnp.asarray(eps, dtype)
    denom = jnp.asarray(denom, dtype)
    M = precond

    def body(_, st):
        z, r, p, rz_prev, it, rel, done = st
        y = M(r)
        rz = _dot(r, y)
        # first iteration: rz_prev = 0 sentinel -> beta = 0, p = y (p0 = 0).
        # past convergence / breakdown, alpha pins to 0 and z/r are fixed
        # points (p drifts but never feeds back) — so no per-field
        # done-masking is needed, saving three full-volume select passes
        # per iteration.  Only the iteration counter is gated.
        beta = jnp.where((rz_prev > 0) & (~done),
                         rz / jnp.where(rz_prev > 0, rz_prev, 1.0), 0.0)
        p = y + beta * p
        ap, pap = system.apply_with_dot(p)
        ok = (pap > 0) & (~done)
        alpha = jnp.where(ok, rz / jnp.where(pap > 0, pap, 1.0), 0.0)
        z = z + alpha * p
        r = r - alpha * ap
        rel2 = jnp.sqrt(_dot(r, r)) / denom
        done2 = done | (rel2 <= eps) | (pap <= 0)
        return (z, r, p, rz, jnp.where(done, it, it + 1),
                jnp.where(done, rel, rel2), done2)

    state = jax.lax.fori_loop(0, chunk, body, state)
    # packed convergence probe: the host loop reads (it, done, rel) after
    # every chunk, and each separate scalar fetch is a full tunnel
    # round-trip — one stacked vector makes it ONE fetch per chunk
    probe = jnp.stack([state[4].astype(jnp.float64),
                       state[6].astype(jnp.float64),
                       state[5].astype(jnp.float64)])
    return state, probe


@jax.jit
def _rel0(r0, denom, eps):
    rel0 = jnp.sqrt(_dot(r0, r0)) / denom
    return rel0, rel0 <= eps


def _cg_chunked_loop(system, r0, denom, eps, maxiter: int, precond,
                     chunk: int = 16, verbose: int = 0, history=None):
    """Host-driven PCG advancing ``chunk`` fused iterations per dispatch
    (see _cg_chunk); convergence checked on the host between chunks.
    The prologue is a single tiny reduction — all preconditioner work
    happens inside the chunk program.  ``verbose >= 2`` prints the
    per-chunk residual trace (Hypre's per-iteration logging analogue,
    ``TortuosityHypre.cpp:700-704``); ``history`` records the same points
    structurally (ResidualHistory)."""
    dtype = r0.dtype
    denom = jnp.asarray(denom, dtype)
    rel0, done0 = _rel0(r0, denom, jnp.asarray(eps, dtype))
    state = (jnp.zeros_like(r0), r0, jnp.zeros_like(r0),
             jnp.zeros((), dtype), jnp.array(0, jnp.int32), rel0, done0)
    while True:
        state, probe = _cg_chunk(system, precond, state, denom, eps, chunk)
        it_v, done_v, rel_v = np.asarray(probe)  # ONE fetch per chunk
        it = int(it_v)
        if verbose >= 2:
            print(f"    cg it={it:5d}  rel_res={rel_v:.6e}")
        if history is not None:
            history.record_inner(it, rel_v)
        if done_v > 0 or it >= maxiter:  # may overshoot by < chunk
            break
    z, r, p, rz, it, rel, done = state
    return SolveResult(z=z, iterations=it, rel_res=rel, converged=rel <= eps)


@jax.jit
def _cg_step(system, precond, z, r, p, rz):
    """One PCG iteration as a standalone jitted program (host-loop mode)."""
    ap = system.apply(p)
    pap = _dot(p, ap)
    ok = pap > 0
    alpha = jnp.where(ok, rz / jnp.where(ok, pap, 1.0), 0.0)
    z = z + alpha * p
    r = r - alpha * ap
    rr = _dot(r, r)
    y = precond(r)
    rz_new = _dot(r, y)
    beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
    p = y + beta * p
    return z, r, p, rz_new, rr, ok


def _cg_host_loop(system, r0, denom, eps, maxiter: int, precond,
                  check_every: int = 10, history=None):
    """PCG with the iteration driven from the host.

    Functionally identical to ``_cg_loop`` but each iteration is its own
    jitted dispatch and convergence is checked host-side every
    ``check_every`` steps.  Used for large volumes with the multigrid
    preconditioner: the single fused while(CG(V-cycle)) program crashes the
    TPU runtime above ~256^3, while the per-iteration program is robust —
    and at ~50-100 preconditioned iterations the dispatch overhead is noise.
    """
    dtype = r0.dtype
    eps_v = float(eps)
    denom_v = float(denom)
    z = jnp.zeros_like(r0)
    r = r0
    y = precond(r)
    p = y
    rz = _dot(r, y)
    it = 0
    rel = float(jnp.sqrt(_dot(r, r))) / denom_v
    while rel > eps_v and it < maxiter:
        steps = min(check_every, maxiter - it)
        for _ in range(steps):
            z, r, p, rz, rr, ok = _cg_step(system, precond, z, r, p, rz)
        it += steps
        rel = float(jnp.sqrt(rr)) / denom_v
        if history is not None:
            history.record_inner(it, rel)
        if not bool(ok) or not (rel == rel):  # breakdown or NaN
            break
    return SolveResult(
        z=z, iterations=jnp.asarray(it, jnp.int32),
        rel_res=jnp.asarray(rel, dtype), converged=jnp.asarray(rel <= eps_v),
    )


# fused while-loop programs above this many cells crash the tunnelled TPU
# runtime when a multigrid V-cycle is inlined in the loop body; the host
# loop is the robust path there (see _cg_host_loop)
HOST_LOOP_THRESHOLD_CELLS = 192 ** 3


def cg(system, r0, denom, eps, maxiter: int, precond=None,
       host_loop: bool | None = None, verbose: int = 0,
       history: ResidualHistory | None = None) -> SolveResult:
    """Solve ``A z = r0`` on the free set with z0 = 0.

    ``denom`` is the relative-residual denominator — pass ``system.b_norm``
    to reproduce Hypre's ``||r||/||b|| <= eps`` criterion
    (``TortuosityHypre.cpp:686-688``).  A zero denominator falls back to
    ``||r0||`` (and to 1 when r0 is zero too).  ``history``: opt-in
    ResidualHistory filled with the host-observed residual trace.
    """
    from .preconditioners import (
        GalerkinMGPreconditioner, IdentityPreconditioner, MultigridPreconditioner,
    )

    if precond is None:
        precond = IdentityPreconditioner()
    denom = jnp.where(denom > 0, denom, jnp.sqrt(_dot(r0, r0)))
    denom = jnp.where(denom > 0, denom, 1.0)
    from .sa import SAMGPreconditioner

    on_tpu = jax.default_backend() == "tpu"
    big_tpu = r0.size >= HOST_LOOP_THRESHOLD_CELLS and on_tpu
    if on_tpu and isinstance(precond, (GalerkinMGPreconditioner,
                                       SAMGPreconditioner)):
        # always chunk MG-preconditioned CG on TPU: each dispatch stays short
        # (the remote runtime dies on very long fused MG programs) and the
        # fine-level Pallas kernels are never nested inside a while_loop
        return _cg_chunked_loop(system, r0, denom, eps, int(maxiter), precond,
                                verbose=verbose, history=history)
    if host_loop is None:
        host_loop = isinstance(precond, MultigridPreconditioner) and big_tpu
    if host_loop:
        return _cg_host_loop(system, r0, denom, eps, int(maxiter), precond,
                             history=history)
    res = _cg_loop(system, r0, denom, eps, int(maxiter), precond)
    if history is not None:
        # fully fused dispatch: only the final point is host-observable
        history.record_inner(int(res.iterations), float(res.rel_res))
    return res
