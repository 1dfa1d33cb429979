"""Lockstep multi-RHS PCG for same-operator stencil systems.

The homogenization path solves THREE periodic cell problems on ONE
operator — only the RHS carries the direction
(``ops/stencil.py::make_cell_problem_system``; reference
``EffDiffFillMtx.F90:42-264`` builds one matrix and three right-hand
sides).  Solving them sequentially pays every per-dispatch cost three
times: the tunnelled TPU runtime charges a round-trip per chunk dispatch,
per outer-residual measurement and per host-side convergence check, and
those fixed costs — not the matvec FLOPs — dominate the measured 512^3
D_eff wall (BASELINE.md round 3: 13.1 s for 3 x 16 iterations whose
arithmetic is ~2 s).

Here the three solves advance in LOCKSTEP as lanes of one program:

* state is ``(L, X, Y, Z)``; alpha/beta/convergence are per-lane vectors
  (lane-wise PCG, not block CG — the lanes never couple numerically, so
  each lane reproduces the sequential iterate sequence exactly);
* the fused Pallas matvec cannot be ``vmap``-ed (its x buffer lives in
  memory space ANY — see ``StencilSystem.apply_xla``), so lane applies
  UNROLL as L sequential kernel calls inside the same program;
* the chunk size shrinks to ``16 // L`` so the per-dispatch V-cycle count
  matches the mono path's measured-safe envelope (solve/cg.py::_cg_chunk:
  long fused MG programs crash the remote runtime);
* iterative refinement (solve/refine.py semantics) runs all lanes through
  one f64 outer-residual program per round.

Memory gate: lane state is L x the mono solve (``use_lanes``, ~118 B/cell
for 3 f32 lanes + f64 accumulators).  A FORCED 512^3 three-lane run OOMs
the 16 GiB v5e (measured RESOURCE_EXHAUSTED in the first inner round,
``bench_logs/r4/deff512_lanes_forced_oom.log``), so the gate correctly
rejects it — on a v5e lanes engage up to ~2^26.5 cells (≲ 407^3); the
realized win is the REV sweep's 256^3 crops (BASELINE.md round 4:
147.0 -> 103.1 s).  Bigger volumes or unknown backends fall back to the
sequential loop.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .cg import SolveResult
from ..utils.profiling import phase_timer


def _stack_lanes(xs):
    """Stack per-lane volumes to (L, X, Y, Z), keeping a GSPMD mesh
    sharding explicit: the lane axis is replicated and the volume axes keep
    their spec (an eager ``jnp.stack`` of committed sharded operands would
    otherwise be free to gather/relayout).  Plain arrays, tracers and
    abstract avals (the warm-up's eval_shape) take the ordinary stack."""
    x0 = xs[0]
    try:
        sh = x0.sharding
    except Exception:
        sh = None
    if (isinstance(x0, jax.Array) and not isinstance(x0, jax.core.Tracer)
            and isinstance(sh, jax.sharding.NamedSharding)
            and sh.mesh.devices.size > 1):
        out = jax.sharding.NamedSharding(
            sh.mesh, jax.sharding.PartitionSpec(None, *sh.spec))
        return jax.jit(lambda *a: jnp.stack(a), out_shardings=out)(*xs)
    return jnp.stack(xs)


def _lane_dot(a, b):
    return jnp.sum(a * b, axis=tuple(range(1, a.ndim)))


def _bcast(v, ndim):
    return v.reshape(v.shape + (1,) * (ndim - 1))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LaneSystem:
    """L restricted systems sharing one operator (code/w/periodic/x_forced);
    the per-lane data is the stacked RHS and its norms.  Mirrors
    ``ops.stencil.StencilSystem`` lane-wise."""

    code: jax.Array  # shared bf16 signed-count geometry
    x_forced: jax.Array  # shared forced values (zeros for cell problems)
    r0_b: jax.Array  # (L, X, Y, Z) per-lane restricted RHS
    b_norm: jax.Array  # (L,)
    w: tuple = dataclasses.field(metadata=dict(static=True))
    periodic: tuple = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def from_systems(cls, systems):
        """Stack same-operator systems (the operator identity — equal
        code/w/periodic/x_forced — is the caller's contract).  Mesh-sharded
        systems stack with an explicit (replicated-lane, X-sharded) spec —
        see ``_stack_lanes``."""
        base = systems[0]
        return cls(
            code=base.code, x_forced=base.x_forced,
            r0_b=_stack_lanes([s.r0_b for s in systems]),
            b_norm=jnp.stack([s.b_norm for s in systems]),
            w=base.w, periodic=base.periodic,
        )

    @property
    def lanes(self) -> int:
        return self.r0_b.shape[0]

    def base(self):
        """Mono StencilSystem view (lane 0) — for preconditioner builds and
        the shared-operator apply."""
        from ..ops.stencil import StencilSystem

        return StencilSystem(
            code=self.code, x_forced=self.x_forced, r0_b=self.r0_b[0],
            b_norm=self.b_norm[0], w=self.w, periodic=self.periodic,
        )

    def apply_with_dot(self, x):
        """(A x_i, <x_i, A x_i>) for every lane — L unrolled kernel calls
        in one program (the Pallas kernel cannot be vmapped)."""
        mono = self.base()
        aps, paps = [], []
        for i in range(self.lanes):
            ap, pap = mono.apply_with_dot(x[i])
            aps.append(ap)
            paps.append(pap)
        return jnp.stack(aps), jnp.stack(paps)

    def initial_residual(self, x0):
        """Per-lane ``free * (b_i - A (x_forced + x0_i))``; ``x0`` is
        (L, X, Y, Z) on the free set."""
        mono = self.base()
        free = mono.free
        rs = []
        for i in range(self.lanes):
            x_start = self.x_forced + x0[i]
            rs.append(jnp.where(free, self.r0_b[i] - mono.apply(x_start),
                                jnp.zeros((), x0.dtype)))
        return jnp.stack(rs)

    def assemble_solution(self, z):
        mono = self.base()
        free = mono.free
        return jnp.stack([
            self.x_forced + jnp.where(free, z[i], jnp.zeros((), z.dtype))
            for i in range(self.lanes)
        ])

    def astype(self, dtype) -> "LaneSystem":
        return dataclasses.replace(
            self,
            x_forced=self.x_forced.astype(dtype),
            r0_b=self.r0_b.astype(dtype),
            b_norm=self.b_norm.astype(dtype),
        )


@partial(jax.jit, static_argnames=("chunk",))
def _cg_chunk_lanes(lsys, precond, state, denom, eps, chunk: int):
    """``chunk`` lockstep PCG iterations over all lanes as ONE dispatch —
    the lane-wise top-form recurrence of ``solve/cg.py::_cg_chunk`` (same
    done-masking rationale: converged lanes pin alpha to 0 and become
    fixed points; only their counters are gated)."""
    dtype = state[1].dtype
    eps = jnp.asarray(eps, dtype)
    denom = jnp.asarray(denom, dtype)
    M = precond
    L = state[1].shape[0]
    ndim = state[1].ndim

    def body(_, st):
        z, r, p, rz_prev, it, rel, done = st
        y = jnp.stack([M(r[i]) for i in range(L)])
        rz = _lane_dot(r, y)
        beta = jnp.where((rz_prev > 0) & (~done),
                         rz / jnp.where(rz_prev > 0, rz_prev, 1.0), 0.0)
        p = y + _bcast(beta, ndim) * p
        ap, pap = lsys.apply_with_dot(p)
        ok = (pap > 0) & (~done)
        alpha = jnp.where(ok, rz / jnp.where(pap > 0, pap, 1.0), 0.0)
        z = z + _bcast(alpha, ndim) * p
        r = r - _bcast(alpha, ndim) * ap
        rel2 = jnp.sqrt(_lane_dot(r, r)) / denom
        done2 = done | (rel2 <= eps) | (pap <= 0)
        return (z, r, p, rz, jnp.where(done, it, it + 1),
                jnp.where(done, rel, rel2), done2)

    state = jax.lax.fori_loop(0, chunk, body, state)
    # packed convergence probe — ONE fetch per chunk (see solve/cg.py)
    probe = jnp.stack([state[4].astype(jnp.float64),
                       state[6].astype(jnp.float64),
                       state[5].astype(jnp.float64)])
    return state, probe


@jax.jit
def _rel0_lanes(r0, denom, eps):
    rel0 = jnp.sqrt(_lane_dot(r0, r0)) / denom
    return rel0, rel0 <= eps


def cg_lanes(lsys: LaneSystem, r0, denom, eps, maxiter: int, precond,
             chunk: int | None = None, verbose: int = 0,
             history=None) -> SolveResult:
    """Lockstep PCG on ``(L, ...)`` state; host-driven chunked dispatches
    (works on every backend; on TPU it is also the only safe shape for MG
    preconditioners — see ``cg()``'s dispatch rationale).  Returns a
    ``SolveResult`` whose iterations/rel_res/converged are (L,) vectors."""
    L = r0.shape[0]
    if chunk is None:
        # keep the per-dispatch preconditioner work at the mono chunk's
        # measured-safe level: L lanes x (16 // L) iterations ~ 16 V-cycles
        chunk = max(2, 16 // L)
    dtype = r0.dtype
    denom = jnp.asarray(denom, dtype)
    denom = jnp.where(denom > 0, denom, jnp.sqrt(_lane_dot(r0, r0)))
    denom = jnp.where(denom > 0, denom, 1.0)
    rel0, done0 = _rel0_lanes(r0, denom, jnp.asarray(eps, dtype))
    state = (jnp.zeros_like(r0), r0, jnp.zeros_like(r0),
             jnp.zeros((L,), dtype), jnp.zeros((L,), jnp.int32), rel0, done0)
    while True:
        state, probe = _cg_chunk_lanes(lsys, precond, state, denom, eps, chunk)
        probe = np.asarray(probe)  # ONE fetch per chunk: (3, L)
        its, dones, rels_v = probe[0], probe[1], probe[2]
        if verbose >= 2:
            rels = ", ".join(f"{float(v):.3e}" for v in rels_v)
            print(f"    cg-lanes it={int(its.max()):5d}  rel_res=[{rels}]")
        if history is not None:
            history.record_inner(int(its.max()), rels_v)
        if bool(dones.all()) or int(its.max()) >= maxiter:
            break
    z, r, p, rz, it, rel, done = state
    return SolveResult(z=z, iterations=it, rel_res=rel, converged=rel <= eps)


def _lanes_stalled(rel, prev_rel, eps) -> bool:
    """Refinement stall: only UNCONVERGED lanes count as progress — a lane
    that already sits at rel <= eps must not keep the loop alive while the
    rest plateau at the f32 noise floor (mono analogue: refine.py's
    ``rel >= prev_rel * 0.5`` break).  Never stalls on the first round
    (prev_rel = inf)."""
    improved = (rel < prev_rel * 0.5) & ~(rel <= eps)
    return bool(np.isfinite(prev_rel).all() and not improved.any())


def solve_system_lanes(
    lsys: LaneSystem,
    eps: float,
    maxiter: int,
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
    """Solve all lanes to ``||b_i - A x_i|| / ||b_i|| <= eps`` with the
    mixed-precision refinement of ``solve/refine.py::solve_system`` run in
    lockstep (one outer-residual program and one inner Krylov per round for
    ALL lanes).  MIRROR: the refinement policy (round-0 low-precision
    residual + f32-floor guard, adaptive round_eps, budget, stall break,
    stale re-measure) is a lane-wise copy of solve_system — keep the two in
    sync; the lanes-vs-sequential D_eff parity test pins the equivalence.  x0 = 0 for every lane (the cell problems' initial iterate,
    ``EffDiffFillMtx.F90:126``).  Returns ``(x_full (L, ...), info)`` with
    per-lane (L,)-vector iterations/rel_res/converged."""
    from .refine import make_precond

    L = lsys.lanes
    storage_dtype = lsys.r0_b.dtype

    if (inner_dtype is None
            or jnp.dtype(inner_dtype) == jnp.dtype(outer_dtype)):
        r0 = lsys.initial_residual(
            jnp.zeros(lsys.r0_b.shape, storage_dtype))
        res = cg_lanes(lsys, r0, lsys.b_norm, eps, maxiter,
                       make_precond(lsys.base(), precond, precond_opts),
                       verbose=verbose, history=history)
        return lsys.assemble_solution(res.z), res

    if jnp.dtype(storage_dtype) != jnp.dtype(inner_dtype):
        lsys = lsys.astype(inner_dtype)
    with phase_timer("solve/hierarchy_build"):
        M_lo = make_precond(lsys.base(), precond, precond_opts)
    # host vector: the denominators' only consumers are host-side rel
    # computations (refine.py does the same with its scalar)
    denom = np.maximum(np.asarray(lsys.b_norm, np.float64), 0.0)
    denom = np.where(denom > 0, denom, 1.0)

    z_total = jnp.zeros((L,) + lsys.r0_b.shape[1:], outer_dtype)
    total_iters = jnp.zeros((L,), jnp.int32)
    rel = np.full((L,), np.inf)
    prev_rel = np.full((L,), np.inf)
    budget = int(maxiter)

    stale = True
    for round_i in range(int(max_refine_rounds)):
        with phase_timer("solve/outer_residual"):
            # round-0 residual in the Krylov dtype (same rationale and
            # f32-floor guard as the mono path, solve/refine.py)
            lo_first = round_i == 0
            if lo_first:
                r_hi, scale = _round0_estimate_lanes(lsys, z_total)
                rel = np.asarray(scale) / denom
                if (rel < 1e-3).any():
                    lo_first = False
            if not lo_first:
                r_hi, scale = _outer_residual_lanes(
                    lsys, z_total, jnp.dtype(outer_dtype).name)
                rel = np.asarray(scale) / denom
        stale = False
        if verbose >= 2:
            rels = ", ".join(f"{v:.3e}" for v in rel)
            print(f"  refine round (lanes): outer rel_res=[{rels}]")
        if history is not None:
            history.record_outer(round_i, rel)
        if bool((rel <= eps).all()):
            break
        if _lanes_stalled(rel, prev_rel, eps):
            break  # no unconverged lane halved its residual this round
        if budget <= 0:
            break
        prev_rel = rel
        # converged lanes ride along as zero systems (alpha pins to 0)
        r_lo = _scale_inner_rhs_lanes(r_hi, scale,
                                      np.asarray(~(rel <= eps)),
                                      jnp.dtype(inner_dtype).name)
        worst = float(rel.max())
        need = float(eps / worst) * 0.3 if worst > 0 else inner_eps
        round_eps = min(max(inner_eps, need), 0.099)
        with phase_timer("solve/inner_round"):
            if history is not None:
                history._base = int(np.asarray(total_iters).max())
            inner = cg_lanes(lsys, r_lo, jnp.ones((L,), inner_dtype),
                             round_eps, min(budget, int(inner_round_cap)),
                             M_lo, verbose=verbose, history=history)
            z_total = _accumulate_lanes(z_total, scale, inner.z)
            total_iters = total_iters + inner.iterations
            budget -= int(np.asarray(inner.iterations).max())
        stale = True

    if stale:
        r_hi, scale = _outer_residual_lanes(lsys, z_total,
                                            jnp.dtype(outer_dtype).name)
        rel = np.asarray(scale) / denom
        if history is not None:
            history.record_outer(-1, rel)
    x_full = _assemble_hi_lanes(lsys, z_total, jnp.dtype(outer_dtype).name)
    rel_v = jnp.asarray(rel, outer_dtype)
    info = SolveResult(z=z_total, iterations=total_iters, rel_res=rel_v,
                       converged=rel_v <= eps)
    return x_full, info


@partial(jax.jit, static_argnames=("outer_dtype",))
def _outer_residual_lanes(lsys, x_outer, outer_dtype):
    """Per-lane free * (b - A x) with the on-the-fly upcast of
    ``refine._outer_residual`` (no persistent high-precision system)."""
    sys_hi = lsys.astype(outer_dtype)
    rs = sys_hi.initial_residual(x_outer)
    return rs, jnp.sqrt(_lane_dot(rs, rs))


# Jitted glue steps, lane-wise mirrors of refine.py's `_round0_estimate` /
# `_scale_inner_rhs` / `_accumulate` / `_assemble_hi` — same rationale: each
# eager op chain is its own tunnel-loaded micro-program; as named jits they
# are AOT-primable (solve/warmup.py) and one dispatch each.

@jax.jit
def _round0_estimate_lanes(lsys, z_total):
    r_hi = lsys.initial_residual(z_total.astype(lsys.r0_b.dtype))
    r32 = r_hi.astype(jnp.float32)
    scale = jnp.sqrt(_lane_dot(r32, r32).astype(jnp.float64))
    return r_hi, scale


@partial(jax.jit, static_argnames=("inner_name",))
def _scale_inner_rhs_lanes(r_hi, scale, live, inner_name):
    """Per-lane normalized inner RHS; converged lanes are zeroed so they
    ride along as zero systems (alpha pins to 0)."""
    r_lo = (r_hi / _bcast(jnp.where(scale > 0, scale, 1.0), r_hi.ndim)
            .astype(r_hi.dtype)).astype(inner_name)
    return r_lo * _bcast(live.astype(r_lo.dtype), r_lo.ndim)


@jax.jit
def _accumulate_lanes(z_total, scale, z):
    return z_total + _bcast(scale, z_total.ndim) * z.astype(z_total.dtype)


@partial(jax.jit, static_argnames=("outer_name",))
def _assemble_hi_lanes(lsys, z_total, outer_name):
    return lsys.astype(outer_name).assemble_solution(z_total)


def use_lanes(cells: int, lanes: int, method: str = "cg",
              inner_bytes: int = 4, outer_bytes: int = 8,
              n_devices: int = 1) -> bool:
    """Memory gate for the lockstep path: lane state is ``lanes`` x the
    mono solve.  Budget model (per cell): lanes x (3 persistent Krylov
    fields + ~2 transient) in the inner dtype, lanes x (accumulator +
    outer residual) in the outer dtype, plus ~10 B of shared operator and
    MG-hierarchy state.  Enabled when that fits in 85 % of the known HBM
    (device-kind table for tunnelled chips); unknown backends get the
    measured-safe 6 GiB fallback of ``fgmres._device_hbm_budget``.

    ``n_devices``: mesh-sharded systems divide every volume field (lane
    state included — the lane axis is replicated, X is sharded) across the
    mesh, so the per-device need is 1/n_devices of the global model and
    lanes engage on aggregate-HBM grounds (VERDICT r4 #3: a 1024^3
    homogenization on a v5p-8 trivially holds three lanes)."""
    if method not in ("cg", "pcg"):
        return False
    from .fgmres import device_hbm_limit

    limit = device_hbm_limit()
    if limit <= 0:
        limit = 6 * 1024 ** 3 / 0.85  # align with the fgmres fallback
    need = cells * (lanes * (5 * inner_bytes + 2 * outer_bytes) + 10)
    return need / max(1, int(n_devices)) < 0.85 * limit
