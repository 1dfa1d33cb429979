"""Preconditioners as pytree dataclasses.

Preconditioner state (diagonals, multigrid hierarchies) must flow into the
jitted Krylov loops as ARGUMENTS, not as Python closures: a closure's arrays
become constants embedded in the HLO, which bloats compile time, defeats the
persistent compilation cache, and at 512^3 produces compile payloads in the
hundreds of MB.  Each class here is a registered dataclass (arrays = leaves,
hyperparameters = static) whose ``__call__`` applies M^{-1} r.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.stencil import (
    apply_code,
    apply_restricted,
    apply_restricted_xla,
    decode_code,
    residual_restrict,
    residual_restricted,
    smooth_sweep,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IdentityPreconditioner:
    def __call__(self, r):
        return r


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class JacobiPreconditioner:
    """Diagonal scaling restricted to the free set."""

    diag: jax.Array
    free: jax.Array

    @classmethod
    def from_system(cls, system):
        return cls(diag=system.diag, free=system.free)

    def __call__(self, r):
        diag = jnp.broadcast_to(self.diag, r.shape).astype(r.dtype)
        safe = jnp.where(diag > 0, diag, jnp.ones((), r.dtype))
        return jnp.where(self.free, r / safe, jnp.zeros((), r.dtype))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ChebyshevPreconditioner:
    """Fixed-degree Chebyshev polynomial preconditioner on the
    Jacobi-scaled operator D^{-1}A (PETSc/hypre-style recurrence).

    M^{-1} = p_d(D^{-1}A) D^{-1} is a fixed SPD polynomial operator, so CG
    remains valid.  Why it pays on TPU: a plain Jacobi-CG iteration moves
    ~5x the matvec's HBM bytes in vector updates and dot products, while a
    Chebyshev step is matvec + three fused AXPYs and NO reductions — the
    polynomial replaces ~degree outer CG iterations with near-matvec-cost
    steps, so the per-matvec overhead (and the while_loop's two sync points
    per iteration) is amortised ``degree``-fold.

    Spectrum interval: lambda_max(D^{-1}A) <= 2 by Gershgorin for both
    masked operators (row sums of |off-diagonals| <= diagonal); ``hi`` is a
    slight over-estimate of that bound, ``lo = hi/ratio`` with the usual
    smoothing ratio ~16-30: modes below ``lo`` are left for the outer CG.
    """

    diag: jax.Array
    free: jax.Array
    w: tuple = dataclasses.field(metadata=dict(static=True))
    periodic: tuple = dataclasses.field(metadata=dict(static=True))
    degree: int = dataclasses.field(default=8, metadata=dict(static=True))
    hi: float = dataclasses.field(default=2.0, metadata=dict(static=True))
    ratio: float = dataclasses.field(default=24.0, metadata=dict(static=True))
    # pin the XLA operator form: required under vmap (the manual-DMA Pallas
    # kernels have no batching rule) — solve/batched.py sets this
    use_xla: bool = dataclasses.field(default=False, metadata=dict(static=True))

    @classmethod
    def from_system(cls, system, degree: int = 8, hi: float = 2.0,
                    ratio: float = 24.0):
        return cls(diag=jnp.broadcast_to(system.diag, system.free.shape)
                   .astype(system.r0_b.dtype),
                   free=system.free, w=system.w, periodic=system.periodic,
                   degree=int(degree), hi=float(hi), ratio=float(ratio))

    def _minv(self, v):
        ok = self.free & (self.diag > 0)
        safe = jnp.where(self.diag > 0, self.diag, jnp.ones((), v.dtype))
        return jnp.where(ok, v / safe.astype(v.dtype), jnp.zeros((), v.dtype))

    def _apply_A(self, v):
        fn = apply_restricted_xla if self.use_xla else apply_restricted
        return fn(v, self.diag, self.free, self.w, self.periodic)

    def __call__(self, r):
        # fori_loop formulation: the unrolled recurrence exploded XLA compile
        # time (>3.5 min at 96^3 in round 1); the loop body compiles once.
        # The scalar rho becomes loop-carried state.
        lo = self.hi / self.ratio
        theta = 0.5 * (self.hi + lo)
        delta = 0.5 * (self.hi - lo)
        sigma = theta / delta
        dtype = r.dtype
        d = self._minv(r) * jnp.asarray(1.0 / theta, dtype)
        two_sigma = jnp.asarray(2.0 * sigma, dtype)
        two_over_delta = jnp.asarray(2.0 / delta, dtype)

        def body(_, st):
            res, d, z, rho = st
            res = res - self._apply_A(d)
            rho_new = 1.0 / (two_sigma - rho)
            d = (rho_new * rho) * d + (rho_new * two_over_delta) * self._minv(res)
            return res, d, z + d, rho_new

        state = (r, d, d, jnp.asarray(1.0 / sigma, dtype))
        _, _, z, _ = jax.lax.fori_loop(1, self.degree, body, state)
        return z


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MGLevel:
    # signed-count bf16 geometry (ops/stencil.py pack_code, or the
    # per-axis pack_code_axes under anisotropic spacing — decode_code and
    # the fused kernels dispatch on the static weight tuple)
    code: jax.Array
    w: tuple = dataclasses.field(metadata=dict(static=True))
    periodic: tuple = dataclasses.field(metadata=dict(static=True))

    def decode(self, dtype):
        return decode_code(self.code, self.w, dtype)

    @property
    def free(self):
        return self.code > 0

    def apply(self, x):
        return apply_code(x, self.code, self.w, self.periodic)

    def apply_xla(self, x):
        # Pallas-free form: the TPU runtime crashes when the Pallas stencil
        # kernel is dispatched from nested control flow (smoother fori_loop
        # inside the Krylov while_loop at 512^3) — smoothing pins XLA.
        diag, free = self.decode(x.dtype)
        return apply_restricted_xla(x, diag, free, self.w, self.periodic)

    def sweep(self, x, r, omega: float):
        """One damped-Jacobi sweep, kernel-fused on the packed path."""
        return smooth_sweep(x, r, self.code, self.w, self.periodic, omega)

    def resid(self, x, r):
        """free ? r - A x : 0 (one fused pass on the packed path)."""
        return residual_restricted(x, r, self.code, self.w, self.periodic)

    def resid_restrict(self, x, r):
        """blocksum_2x2x2(free ? r - A x : 0) (fused on the packed path)."""
        return residual_restrict(x, r, self.code, self.w, self.periodic)


def _can_coarsen(shape):
    return all(s % 2 == 0 and s >= 8 for s in shape)


# ---------------------------------------------------------------------------
# Galerkin multigrid: face-conductance coarse operators
# ---------------------------------------------------------------------------
#
# The fine operator has implicit unit face conductances c_ij = w_f on
# free-free faces.  With piecewise-constant prolongation P (2x2x2 repeat) and
# restriction R = P^T (block sum), the Galerkin coarse operator R A P is
# EXACTLY another 7-point face-conductance operator:
#
#   c_H(coarse face) = sum of the 4 fine conductances crossing it
#   diag_H           = blocksum(diag_h - sum_f c_f)  +  sum of adjacent c_H
#
# (the blocksum term is the "surplus" from links to eliminated cells —
# Dirichlet planes and masked neighbours).  Unlike rediscretising an
# OR-pooled mask (which turns one-voxel pore necks into full-width coarse
# channels and walls into leaks, degrading the V-cycle to ~0.95
# contraction on labyrinth masks), the summed conductances keep the coarse
# problem's connectivity faithful to the fine one.


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ConductanceLevel:
    """Variable-coefficient 7-point level: A x = diag*x - sum_f c_f x_nbr.

    ``cx[i,j,k]`` is the conductance between cells i and i+1 (mod X) along
    axis 0 (likewise cy/cz); on clamped axes the wrap entry [-1] is zero.
    """

    diag: jax.Array
    cx: jax.Array
    cy: jax.Array
    cz: jax.Array
    # static opt-out of the fused Pallas kernels for this level: every
    # (shape, mode) pair instantiates a separate Mosaic binary in the
    # serialized executable, and on the tunnelled TPU the one-time program
    # deserialize+upload is a top-3 cost of a one-shot solve — small coarse
    # levels contribute <1% of the V-cycle FLOPs, so GalerkinMGPreconditioner
    # pins them to XLA (``pallas_min_cells``) to shrink the program.
    use_xla: bool = dataclasses.field(default=False, metadata=dict(static=True))

    @property
    def free(self):
        return self.diag > 0

    def apply(self, x):
        from ..ops import stencil as _st
        from ..ops import stencil_pallas as _sp

        if (not self.use_xla and _st._PALLAS_MODE != "0"
                and x.dtype == self.diag.dtype
                and _sp.supports_cond(x.shape, x.dtype, has_r=False)):
            return _sp.fused_conductance_pallas(
                "matvec", x, None, self.cx, self.cy, self.cz, self.diag)
        c = (self.cx, self.cy, self.cz)
        out = self.diag * x
        for ax in range(3):
            out = out - c[ax] * jnp.roll(x, -1, axis=ax)
            out = out - jnp.roll(c[ax] * x, 1, axis=ax)
        return jnp.where(self.free, out, jnp.zeros((), x.dtype))

    def sweep(self, x, r, omega: float):
        """One damped-Jacobi sweep, fused on TPU (ops/stencil_pallas.py
        conductance kernel); the XLA form otherwise."""
        from ..ops import stencil as _st
        from ..ops import stencil_pallas as _sp

        if (not self.use_xla and _st._PALLAS_MODE != "0"
                and x.dtype == self.diag.dtype
                and _sp.supports_cond(x.shape, x.dtype, has_r=True)):
            return _sp.fused_conductance_pallas(
                "sweep", x, r, self.cx, self.cy, self.cz, self.diag,
                omega=omega)
        inv_d = jnp.where(
            self.free,
            jnp.asarray(omega, r.dtype)
            / jnp.where(self.free, self.diag, jnp.ones((), r.dtype)),
            jnp.zeros((), r.dtype),
        )
        return x + inv_d * (r - self.apply(x))


def _blocksum(x):
    return _pairsum(_pairsum(_pairsum(x, 2), 1), 0)


def _blocksum_axes(x, axes):
    for ax in sorted(axes, reverse=True):
        x = _pairsum(x, ax)
    return x


def _prolong_pc_axes(xc, axes):
    for ax in axes:
        xc = jnp.repeat(xc, 2, axis=ax)
    return xc


def _face_sum(c, axis):
    """Coarse face conductances: sum the 4 fine faces crossing each coarse
    plane.  Crossing faces along ``axis`` sit at odd fine indices; the other
    two axes are block-summed (done first — the odd-index selection then
    touches 4x less data)."""
    o1, o2 = [a for a in range(3) if a != axis]
    c = _pairsum(_pairsum(c, max(o1, o2)), min(o1, o2))
    return _pairsel(c, axis, 1)


def fine_conductances(system) -> "ConductanceLevel":
    """Express the fine-level StencilSystem as a ConductanceLevel (used only
    to seed Galerkin coarsening; level-0 smoothing keeps the fused
    (diag, free) operator and its Pallas kernel)."""
    free = system.free
    dtype = system.r0_b.dtype
    f = free.astype(dtype)
    cs = []
    for ax in range(3):
        c = f * jnp.roll(f, -1, axis=ax) * jnp.asarray(system.w[ax], dtype)
        if not system.periodic[ax]:
            idx = [slice(None)] * 3
            idx[ax] = -1
            c = c.at[tuple(idx)].set(0.0)
        cs.append(c)
    diag = jnp.broadcast_to(system.diag, free.shape).astype(dtype)
    diag = jnp.where(free, diag, jnp.zeros((), dtype))
    return ConductanceLevel(diag=diag, cx=cs[0], cy=cs[1], cz=cs[2])


def galerkin_coarsen(level: ConductanceLevel,
                     axes: tuple = (0, 1, 2)) -> "ConductanceLevel":
    """Galerkin coarsening by 2 along ``axes`` (semi-coarsening when a
    strict subset — the Hypre-PFMG/SMG robustness move for anisotropic
    spacing, reference TortuosityHypre.cpp:671-678: coarsen only the
    strongly-coupled directions so point smoothing stays effective).

    With piecewise-constant transfers over the coarsened axes the Galerkin
    operator R A P is exactly another 7-point conductance operator:

    * coarsened axis a: c_H = the fine faces crossing each coarse plane
      (odd fine index along a), pooled over the OTHER coarsened axes;
    * un-coarsened axis b: c_H = block-sum over the coarsened axes of the
      fine faces along b (each fine cell of block I links to its twin in
      the neighbouring block);
    * diag_H = blocksum(surplus) + sum of adjacent c_H, as before.
    """
    c = (level.cx, level.cy, level.cz)
    surplus = level.diag - sum(
        ci + jnp.roll(ci, 1, axis=ax) for ax, ci in enumerate(c)
    )
    # numerical dust: surplus is a sum/difference of exact small floats on
    # the fine level but accumulates roundoff through repeated coarsening
    surplus_H = _blocksum_axes(
        jnp.where(level.free, surplus, jnp.zeros((), level.diag.dtype)), axes)
    cH = []
    for ax, ci in enumerate(c):
        if ax in axes:
            pooled = ci
            for a in sorted((a for a in axes if a != ax), reverse=True):
                pooled = _pairsum(pooled, a)
            cH.append(_pairsel(pooled, ax, 1))
        else:
            cH.append(_blocksum_axes(ci, axes))
    diag_H = surplus_H + sum(
        ci + jnp.roll(ci, 1, axis=ax) for ax, ci in enumerate(cH)
    )
    diag_H = jnp.where(diag_H > 0, diag_H, jnp.zeros((), diag_H.dtype))
    return ConductanceLevel(diag=diag_H, cx=cH[0], cy=cH[1], cz=cH[2])


def _prolong_pc(xc):
    x = jnp.repeat(xc, 2, axis=0)
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


# --- trilinear (cell-centred) transfers -------------------------------------
#
# Piecewise-constant transfers cap the V-cycle's quality: measured at 256^3,
# even the FULLY ACTIVE Poisson problem needs ~52 PCG(V(2,2)) iterations for
# 8 decades (PC interpolation carries no linear variation, so kappa(M^-1 A)
# saturates at a large constant).  Cell-centred trilinear interpolation
# (per-axis weights 3/4, 1/4) with its exact transpose as restriction
# restores textbook behaviour.  The Galerkin conductance coarse operators
# are kept as-is (built from face sums, i.e. the PC-Galerkin operator) —
# with R = P^T and a symmetric smoother the cycle remains a symmetric PSD
# preconditioner even though A_c is no longer exactly P^T A P; convergence
# is what the measurement below justifies.
#
# All forms are pair-reshape/roll based — no strided gathers (see the NB
# above on lowering).


def _prolong_tri_axis(e, axis, periodic: bool):
    """One axis of cell-centred trilinear prolongation (nc -> 2nc):
    even fine = 3/4 e_i + 1/4 e_{i-1}; odd fine = 3/4 e_i + 1/4 e_{i+1};
    clamped axes fold the out-of-domain weight onto the edge cell (so the
    edge fine cells copy the edge coarse cell)."""
    a = jnp.asarray(0.75, e.dtype)
    b = jnp.asarray(0.25, e.dtype)
    lo = jnp.roll(e, 1, axis=axis)   # e_{i-1}
    hi = jnp.roll(e, -1, axis=axis)  # e_{i+1}
    if not periodic:
        sl = [slice(None)] * e.ndim
        sl[axis] = slice(0, 1)
        lo = lo.at[tuple(sl)].set(e[tuple(sl)])
        sl[axis] = slice(-1, None)
        hi = hi.at[tuple(sl)].set(e[tuple(sl)])
    st = jnp.stack([a * e + b * lo, a * e + b * hi], axis=axis + 1)
    shape = list(e.shape)
    shape[axis] *= 2
    return st.reshape(shape)


def _restrict_tri_axis(f, axis, periodic: bool):
    """Exact transpose of ``_prolong_tri_axis`` (2nc -> nc).  Weight sum per
    coarse cell is 2 (matching the PC block-sum scaling the Galerkin
    conductance operators are built for)."""
    a = jnp.asarray(0.75, f.dtype)
    b = jnp.asarray(0.25, f.dtype)
    ev = _pairsel(f, axis, 0)
    od = _pairsel(f, axis, 1)
    od_m1 = jnp.roll(od, 1, axis=axis)   # od_{i-1}
    ev_p1 = jnp.roll(ev, -1, axis=axis)  # ev_{i+1}
    if not periodic:
        # transpose of the clamped fold-in: zero the wrapped plane, then
        # credit the folded weight to the edge coarse cells
        sl = [slice(None)] * f.ndim
        sl[axis] = slice(0, 1)
        od_m1 = od_m1.at[tuple(sl)].set(0.0)
        out_lo_fix = b * ev[tuple(sl)]
        sl[axis] = slice(-1, None)
        ev_p1 = ev_p1.at[tuple(sl)].set(0.0)
        out_hi_fix = b * od[tuple(sl)]
    out = a * (ev + od) + b * (od_m1 + ev_p1)
    if not periodic:
        sl = [slice(None)] * f.ndim
        sl[axis] = slice(0, 1)
        out = out.at[tuple(sl)].add(out_lo_fix)
        sl[axis] = slice(-1, None)
        out = out.at[tuple(sl)].add(out_hi_fix)
    return out


def _prolong_tri(xc, periodic):
    for ax in range(3):
        xc = _prolong_tri_axis(xc, ax, periodic[ax])
    return xc


def _restrict_tri(xf, periodic):
    for ax in range(3):
        xf = _restrict_tri_axis(xf, ax, periodic[ax])
    return xf


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("schedule",))
def _build_hierarchy(system, schedule: tuple):
    """All Galerkin conductance levels in one compiled program.

    ``schedule[k]`` is the tuple of axes coarsened between level k and
    level k+1 (level 0 = fine); ``((0,1,2),)*n`` is full coarsening."""
    cur = fine_conductances(system)
    levels = []
    for axes in schedule:
        cur = galerkin_coarsen(cur, axes)
        levels.append(cur)
    return tuple(levels)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GalerkinMGPreconditioner:
    """V-cycle on the Galerkin (face-conductance) hierarchy.

    Level 0 smooths with the fused (diag, free) stencil operator — the
    Pallas kernel on TPU — and deeper levels with ConductanceLevel.apply.
    Damped-Jacobi smoothing with symmetric pre/post sweeps keeps the cycle
    a fixed symmetric operator, so it is a valid CG preconditioner.
    """

    fine: MGLevel
    levels: Tuple[ConductanceLevel, ...]
    nu1: int = dataclasses.field(default=2, metadata=dict(static=True))
    nu2: int = dataclasses.field(default=2, metadata=dict(static=True))
    omega: float = dataclasses.field(default=0.9, metadata=dict(static=True))
    coarse_sweeps: int = dataclasses.field(default=100, metadata=dict(static=True))
    smoother: str = dataclasses.field(default="jacobi", metadata=dict(static=True))
    # "pc" | "tri".  Measured at 256^3 (random RHS, 1e-8): trilinear
    # transfers over the PC-Galerkin conductance operators do NOT beat PC
    # (52->54 iters fully-active, 87->108 porous) — the cycle is limited by
    # the PC approximation property of the COARSE OPERATOR, not by the
    # interpolation order, so "pc" stays the default.
    transfer: str = dataclasses.field(default="pc", metadata=dict(static=True))
    # "v" | "w": W-cycle recurses twice per coarse level down to
    # ``w_depth`` (then V below, bounding compile size at 2^w_depth
    # coarsest visits).  Holds the 2-level contraction (~0.6) where the
    # V-cycle compounds to ~0.87 at depth: measured porous 40% blobs to
    # 1e-8, 256^3: 87 -> 52 iters (0.76 -> 0.56 s); 512^3: 130 -> 82-84
    # iters (6.6 -> 4.3 s warm, ~1.5x).  The W program is ~2x bigger, and
    # on this tunnelled single-core host its one-time deserialize+upload
    # costs +4.9 s (11.4 vs 6.5 s at 512^3) — more than the iteration
    # saving for a one-shot solve — so "v" stays the default; pass
    # precond_opts={"cycle": "w"} for persistent processes (REV sweeps,
    # servers) where the load amortises.
    cycle: str = dataclasses.field(default="v", metadata=dict(static=True))
    w_depth: int = dataclasses.field(default=2, metadata=dict(static=True))
    # coarsest-level treatment: "jacobi" = coarse_sweeps damped-Jacobi
    # iterations (needs a tiny coarsest grid, i.e. a deep hierarchy);
    # "cheby" = one degree-``coarse_sweeps`` Chebyshev solve over
    # [2.2/coarse_ratio, 2.2] — strong enough at ratio ~ the level's
    # condition number to stop the hierarchy several levels early, which
    # shrinks the serialized one-shot executable (each level contributes
    # full code size regardless of its cell count).
    coarse_solver: str = dataclasses.field(default="cheby",
                                           metadata=dict(static=True))
    coarse_ratio: float = dataclasses.field(default=4000.0,
                                            metadata=dict(static=True))
    # per-level coarsening axes (schedule[k] coarsens level k -> k+1);
    # () means full coarsening at every level (the pre-semi-coarsening
    # layout).  Derived by ``_schedule_for`` in from_system: a strict
    # subset of axes at a level is PFMG-style semi-coarsening, engaged
    # when the spacing anisotropy exceeds ``SEMI_THRESHOLD``.
    schedule: tuple = dataclasses.field(default=(), metadata=dict(static=True))

    # Default shape of the cycle (measured, 512^3 porous blobs at 1e-9 on
    # the v5e — scripts/itersweep.py):
    #
    #   levels  coarsest treatment       iters  chunk exe  warm solve
    #   7       50 Jacobi sweeps @4^3     146    19.8 MiB    7.6 s
    #   4       cheby d80  r1e3 @64^3      86    10.4 MiB    4.7 s
    #   3       cheby d150 r4e3 @128^3     47     6.8 MiB    3.9 s
    #   3       cheby d100 r4e3 @128^3     46     6.8 MiB    3.6 s  <- default
    #
    # FINE-smoother variants on the default 3-level cycle (same harness,
    # r4 — bench_logs/r4/itersweep_smoothers.log): Chebyshev pre/post
    # smoothing buys almost nothing on iterations and pays 1.5-2x per
    # iteration (cheby 2+2: 48 iters @101 ms; cheby 3+3: 47 @129; Jacobi
    # 3+3: 46 @81 — vs the default Jacobi 2+2: 49 @65 ms, 3.2 s warm
    # solve).  The cycle is coarse-approximation-limited, not
    # smoothing-limited; nu1=nu2=2 damped Jacobi stays the default.
    #
    # A SHALLOW hierarchy with a strong Chebyshev coarse solve beats the
    # deep one on every axis at once: the coarsest operator stays close to
    # the fine one (better approximation property -> fewer outer
    # iterations), the executable halves twice (program upload over the
    # tunnel is a top fixed cost), and the Chebyshev solve is cheap at 1/64
    # of the fine cell count.  This also retires the round-2 "145-iteration
    # floor": 47 iterations matches Hypre FlexGMRES(SMG)'s "tens"
    # (reference TortuosityHypre.cpp:671-678) and beats the measured
    # smoothed-aggregation alternative (62, solve/sa.py) without SA's
    # probe-build programs.
    # spacing-anisotropy gate for semi-coarsening, as a ratio of per-axis
    # h^2 = 1/w: axes more than SEMI_THRESHOLD x more weakly coupled than
    # the strongest axis are left un-coarsened at that level.  Measured
    # (scripts/anisoprobe.py + bench_logs/r5/semi3level.log, 160^3 porous
    # blobs, flow-through 1e-9, isotropic = 50 iters): at dx=(1,1,4) the
    # 3-level semi schedule ((0,1),(0,1,2)) takes 46 iters vs full
    # coarsening's 67; the pure-threshold ((0,1),(0,1)) takes 41 but its
    # 40x40x160 coarsest makes the auto-scaled Chebyshev solve ~4x dearer
    # per cycle, so the final step coarsens every eligible axis.  CAUTION
    # (measured dead end, bench_logs/r5/anisoprobe160*.log): letting the
    # anisotropic schedule run EXTRA levels (max_levels+1) inverts the win
    # — 90 iters at dx=(1,1,4), 142 at (1,1,8) — because each additional
    # PC-Galerkin level re-adds the porous-mask contraction (the same
    # 3-level invariant BASELINE.md records for isotropic hierarchies).
    SEMI_THRESHOLD = 2.0

    @staticmethod
    def _schedule_for(shape, w, max_levels: int):
        """Per-level coarsening axes (PFMG-style semi-coarsening).

        Exactly ``max_levels - 1`` coarsening steps (the measured 3-level
        invariant holds for anisotropic hierarchies too — see
        SEMI_THRESHOLD note).  Isotropic, fully-coarsenable shapes
        reproduce the historical full coarsenings exactly (same programs,
        same compile-cache keys).  Under anisotropic spacing only axes
        within SEMI_THRESHOLD of the strongest coupling (smallest
        h^2 = 1/w) coarsen, except the LAST step, which coarsens every
        eligible axis so the coarsest grid stays small enough for the
        auto-scaled Chebyshev coarse solve to keep its isotropic-default
        cost.  A side benefit: volumes with one odd/short axis still
        coarsen the remaining axes instead of dropping to a single-level
        cycle.
        """
        tau = GalerkinMGPreconditioner.SEMI_THRESHOLD
        h2 = [1.0 / float(wi) for wi in w]
        lo = min(h2)
        h2 = [x / lo for x in h2]
        shape = list(shape)
        cap = max_levels - 1
        schedule = []
        while len(schedule) < cap:
            elig = [a for a in range(3) if shape[a] % 2 == 0 and shape[a] >= 8]
            if not elig:
                break
            if len(schedule) == cap - 1:
                axes = tuple(elig)  # final step: resolve all axes
            else:
                m = min(h2[a] for a in elig)
                axes = tuple(a for a in elig if h2[a] <= m * tau)
            schedule.append(axes)
            for a in axes:
                shape[a] //= 2
                h2[a] *= 4.0
        return tuple(schedule)

    @classmethod
    def from_system(cls, system, max_levels: int = 3,
                    pallas_min_cells: int = 64 ** 3, **kw):
        fine = MGLevel(code=system.code, w=system.w, periodic=system.periodic)
        # the whole hierarchy builds as ONE jitted program (shapes are
        # static, so the level loop unrolls at trace time): built eagerly
        # the op-by-op dispatches took ~85 s through the tunnelled TPU
        # runtime at 512^3, and per-level jitted steps still paid ~8
        # dispatch round-trips
        schedule = kw.pop("schedule", None)
        if schedule is None:
            schedule = cls._schedule_for(system.code.shape, system.w,
                                         max_levels)
        schedule = tuple(tuple(a) for a in schedule)
        shape = list(system.code.shape)
        for axes in schedule:
            for a in axes:
                shape[a] //= 2
        shape = tuple(shape)
        if not schedule:
            levels = ()
        elif isinstance(system.code, jax.Array):
            # concrete arrays (and tracers, which subclass jax.Array —
            # from_system then inlines into the surrounding trace)
            levels = _build_hierarchy(system, schedule)
        else:
            # ABSTRACT system (ShapeDtypeStruct leaves, solve/warmup.py):
            # AOT-prime the hierarchy-build program without executing it,
            # and derive the level structure by shape inference only — the
            # warm-up thread never touches the device this way
            _build_hierarchy.lower(system, schedule).compile()
            levels = jax.eval_shape(
                _partial(_build_hierarchy, schedule=schedule), system)
        kw["schedule"] = schedule
        if kw.get("transfer") == "tri" and any(
                a != (0, 1, 2) for a in schedule):
            raise ValueError(
                "transfer='tri' requires full coarsening at every level; "
                f"the derived schedule {schedule} semi-coarsens (anisotropic "
                "spacing) — use the default 'pc' transfers")
        # conductance levels below ``pallas_min_cells`` pin XLA: each Pallas
        # (shape, mode) pair embeds another Mosaic binary in the serialized
        # executable whose one-time deserialize+upload over the tunnel costs
        # more than the sub-1%-of-FLOPs level ever saves at runtime
        levels = tuple(
            dataclasses.replace(lvl, use_xla=True)
            if lvl.diag.size < pallas_min_cells else lvl
            for lvl in levels)
        if kw.get("coarse_solver", "cheby") == "cheby":
            # auto-scale the Chebyshev coarse solve to the coarsest level's
            # condition number (kappa(D^-1 A) ~ 0.25 * N^2 for the masked
            # Laplacian; the 512^3 measurement above sits exactly at this
            # rule) and pick the degree for a ~0.04 error factor
            # (exp(-2 d / sqrt(ratio))).
            coarsest = levels[-1].diag.shape if levels else shape
            kw.setdefault("coarse_ratio",
                          max(64.0, 0.25 * max(coarsest) ** 2))
            kw.setdefault("coarse_sweeps",
                          max(30, round(1.6 * kw["coarse_ratio"] ** 0.5)))
        return cls(fine=fine, levels=tuple(levels), **kw)

    # -- smoothing ---------------------------------------------------------
    def _smooth(self, apply_fn, diag, free, x, r, n: int):
        if self.smoother == "cheby":
            return self._smooth_cheby(apply_fn, diag, free, x, r, n)
        inv_d = jnp.where(
            free, jnp.asarray(self.omega, r.dtype)
            / jnp.where(diag > 0, diag, jnp.ones((), r.dtype)),
            jnp.zeros((), r.dtype),
        )

        def body(i, x):
            return x + inv_d * (r - apply_fn(x))

        return jax.lax.fori_loop(0, n, body, x)

    def _smooth_cheby(self, apply_fn, diag, free, x, r, degree: int,
                      ratio: float = 6.0):
        """Degree-``degree`` Chebyshev smoothing on the spectrum interval
        [hi/ratio, hi] of D^{-1}A (hi >= Gershgorin bound 2).  A fixed
        polynomial, identical pre/post, so the V-cycle stays a symmetric
        operator.  One operator apply per degree — same cost as a Jacobi
        sweep with markedly better high-frequency damping.  With ``ratio``
        of order the level's condition number it acts as a coarse SOLVER
        (error factor ~ exp(-2 degree / sqrt(ratio))), which lets the
        hierarchy stop several levels early (see ``coarse_solver``).
        fori_loop-formulated (the round-1 unrolled recurrence inlined at
        every level exploded XLA compile time: >3.5 min at 96^3)."""
        hi = 2.2
        lo = hi / ratio
        theta = 0.5 * (hi + lo)
        delta = 0.5 * (hi - lo)
        sigma = theta / delta
        dtype = r.dtype
        inv_d = jnp.where(
            free & (diag > 0),
            1.0 / jnp.where(diag > 0, diag, jnp.ones((), dtype)),
            jnp.zeros((), dtype),
        )
        res = r - apply_fn(x)
        d = inv_d * res * jnp.asarray(1.0 / theta, dtype)
        x = x + d
        two_sigma = jnp.asarray(2.0 * sigma, dtype)
        two_over_delta = jnp.asarray(2.0 / delta, dtype)

        def body(_, st):
            res, d, x, rho = st
            res = res - apply_fn(d)
            rho_new = 1.0 / (two_sigma - rho)
            d = (rho_new * rho) * d + (rho_new * two_over_delta) * (inv_d * res)
            return res, d, x + d, rho_new

        state = (res, d, x, jnp.asarray(1.0 / sigma, dtype))
        _, _, x, _ = jax.lax.fori_loop(1, degree, body, state)
        return x

    # -- fine level: fused Pallas sweep/resid kernels, unrolled -------------
    def _fine_smooth(self, x, r, n: int):
        """``n`` damped-Jacobi sweeps on the fine level.  ``x=None`` starts
        from zero: the first sweep collapses to the elementwise
        ``(omega/diag) * r`` (no stencil apply needed).  Sweeps are unrolled
        Python calls, so each lowers to ONE fused rolling-window kernel on
        TPU (ops/stencil_pallas.py v3) — never a fori_loop around a Pallas
        dispatch (the nested-control-flow configuration that crashed the
        remote TPU runtime in round 1)."""
        fine = self.fine
        if self.smoother == "cheby":
            diag, free = fine.decode(r.dtype)
            x0 = jnp.zeros_like(r) if x is None else x
            return self._smooth_cheby(fine.apply, diag, free, x0, r, n)
        if x is None:
            diag, free = fine.decode(r.dtype)
            inv_d = jnp.where(
                free & (diag > 0),
                jnp.asarray(self.omega, r.dtype)
                / jnp.where(diag > 0, diag, jnp.ones((), r.dtype)),
                jnp.zeros((), r.dtype),
            )
            x = inv_d * r
            n -= 1
        for _ in range(n):
            x = fine.sweep(x, r, self.omega)
        return x

    def _vcycle(self, idx: int, r):
        # idx 0 = fine (MGLevel); idx >= 1 = self.levels[idx-1]
        if idx == 0:
            if not self.levels:  # volume too small to coarsen at all
                diag, free = self.fine.decode(r.dtype)
                if self.coarse_solver == "cheby":
                    # the auto-scaled (degree, ratio) pair was calibrated
                    # for a Chebyshev SOLVE; running that degree as plain
                    # Jacobi sweeps (the _smooth default path) would cost
                    # ~8x for no quality gain on uncoarsenable volumes
                    return self._smooth_cheby(self.fine.apply_xla, diag,
                                              free, jnp.zeros_like(r), r,
                                              self.coarse_sweeps,
                                              ratio=self.coarse_ratio)
                return self._smooth(self.fine.apply_xla, diag, free,
                                    jnp.zeros_like(r), r, self.coarse_sweeps)
            x = self._fine_smooth(None, r, self.nu1)
            if self.transfer == "tri":
                resid = self.fine.resid(x, r)
                rc = _restrict_tri(resid, self.fine.periodic)
            elif self._axes(0) != (0, 1, 2):
                # semi-coarsened first level: fused resid, then block-sum
                # over the coarsened axes only
                rc = _blocksum_axes(self.fine.resid(x, r), self._axes(0))
            else:
                # rc = blocksum(free ? r - A x : 0), one fused pass (R=P^T).
                # No coarse-free masking needed: resid vanishes on non-free
                # fine cells and non-free coarse cells have inv_d = 0.
                rc = self.fine.resid_restrict(x, r)
            ec = self._vcycle(1, rc)
            x = x + jnp.where(self.fine.free, self._prolong(ec, 0),
                              jnp.zeros((), r.dtype))
            return self._fine_smooth(x, r, self.nu2)

        lvl = self.levels[idx - 1]
        lvl_apply = lvl.apply
        diag, free = lvl.diag.astype(r.dtype), lvl.free

        x = jnp.zeros_like(r)
        if idx == len(self.levels):  # coarsest: fori_loop + XLA
            if self.coarse_solver == "cheby":
                return self._smooth_cheby(lvl_apply, diag, free, x, r,
                                          self.coarse_sweeps,
                                          ratio=self.coarse_ratio)
            return self._smooth(lvl_apply, diag, free, x, r, self.coarse_sweeps)

        x = self._cond_smooth(lvl, diag, free, None, r, self.nu1)
        n_corr = 2 if (self.cycle == "w" and idx <= self.w_depth) else 1
        for _ in range(n_corr):
            resid = jnp.where(free, r - lvl_apply(x), jnp.zeros((), r.dtype))
            if self.transfer == "tri":
                rc = _restrict_tri(resid, self.fine.periodic)
            else:
                rc = _blocksum_axes(resid, self._axes(idx))  # R = P^T (sum)
            coarse_free = self.levels[idx].free
            rc = jnp.where(coarse_free, rc, jnp.zeros((), r.dtype))
            ec = self._vcycle(idx + 1, rc)
            x = x + jnp.where(free, self._prolong(ec, idx),
                              jnp.zeros((), r.dtype))
        return self._cond_smooth(lvl, diag, free, x, r, self.nu2)

    def _axes(self, idx: int) -> tuple:
        """Axes coarsened between level ``idx`` and ``idx + 1``."""
        return self.schedule[idx] if idx < len(self.schedule) else (0, 1, 2)

    def _prolong(self, ec, idx: int):
        if self.transfer == "tri":
            return _prolong_tri(ec, self.fine.periodic)
        return _prolong_pc_axes(ec, self._axes(idx))

    def _cond_smooth(self, lvl, diag, free, x, r, n: int):
        """Coarse-level smoothing: unrolled fused conductance sweeps (never
        a fori_loop around a Pallas dispatch); ``x=None`` starts from zero
        with the elementwise first sweep.  Chebyshev smoothing keeps the
        shared recurrence path."""
        if self.smoother == "cheby":
            x0 = jnp.zeros_like(r) if x is None else x
            return self._smooth_cheby(lvl.apply, diag, free, x0, r, n)
        if x is None:
            inv_d = jnp.where(
                free,
                jnp.asarray(self.omega, r.dtype)
                / jnp.where(free, diag, jnp.ones((), r.dtype)),
                jnp.zeros((), r.dtype),
            )
            x = inv_d * r
            n -= 1
        for _ in range(n):
            x = lvl.sweep(x, r, self.omega)
        return x

    def __call__(self, r):
        return self._vcycle(0, r)


# NB on lowering: the 6-D reshape+reduce forms of these transfers crash the
# TPU compiler outright at >= 384^3, and stride-2 slicing (x[i::2,...]) runs
# ~95x slower than the stencil itself at 512^3 (3.4 s vs 36 ms measured —
# lane-interleaved gathers force relayouts).  The fast forms below reshape
# ONE axis at a time into (n/2, 2) and reduce/select over the pair — all
# contiguous, 4-D, and ~speed-of-light.


def _pairsum(x, axis):
    shape = list(x.shape)
    shape[axis : axis + 1] = [shape[axis] // 2, 2]
    return x.reshape(shape).sum(axis=axis + 1)


def _pairsel(x, axis, parity: int):
    """x[..., parity::2, ...] along ``axis`` without a strided gather:
    pair-reshape then mask-and-sum (zero is the additive identity)."""
    shape = list(x.shape)
    shape[axis : axis + 1] = [shape[axis] // 2, 2]
    sel = jnp.zeros((2,), x.dtype).at[parity].set(1)
    sel = sel.reshape((1,) * (axis + 1) + (2,) + (1,) * (x.ndim - 1 - axis))
    return (x.reshape(shape) * sel).sum(axis=axis + 1)


def _pairany(m, axis):
    shape = list(m.shape)
    shape[axis : axis + 1] = [shape[axis] // 2, 2]
    return m.reshape(shape).any(axis=axis + 1)


def _restrict(x):
    x = _pairsum(_pairsum(_pairsum(x, 2), 1), 0)
    return x * jnp.asarray(0.125, x.dtype)


def _prolong(xc):
    x = jnp.repeat(xc, 2, axis=0)
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def _coarsen_free(free):
    return _pairany(_pairany(_pairany(free, 2), 1), 0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MultigridPreconditioner:
    """Geometric multigrid V-cycle (rediscretised masks; see below).

    ``levels`` is a tuple of MGLevel from fine to coarse; smoothing is
    damped Jacobi with symmetric pre/post counts so the V-cycle is a fixed
    symmetric operator and PCG stays valid.
    """

    levels: Tuple[MGLevel, ...]
    nu1: int = dataclasses.field(default=2, metadata=dict(static=True))
    nu2: int = dataclasses.field(default=2, metadata=dict(static=True))
    omega: float = dataclasses.field(default=0.8, metadata=dict(static=True))
    coarse_sweeps: int = dataclasses.field(default=30, metadata=dict(static=True))

    @classmethod
    def from_system(cls, system, max_levels: int = 10, **kw):
        from ..ops.stencil import pack_code_for, uniform_w

        periodic_cell = bool(system.periodic[0])  # cell problem: all-periodic
        levels = [MGLevel(code=system.code, w=system.w,
                          periodic=system.periodic)]
        free = system.free
        w = system.w
        while len(levels) < max_levels and _can_coarsen(free.shape):
            free = _coarsen_free(free)
            w = tuple(wi / 4.0 for wi in w)  # dx doubles (aniso preserved)
            if periodic_cell:
                code_free = 6 if uniform_w(w) else 2 * 16 + 2 * 4 + 2
                code = jnp.where(free, jnp.asarray(code_free, jnp.bfloat16),
                                 jnp.asarray(-1, jnp.bfloat16))
            else:
                # rediscretise: count free neighbours on the coarse mask
                code = pack_code_for(w, free, free, system.periodic)
            levels.append(MGLevel(code=code, w=w, periodic=system.periodic))
        return cls(levels=tuple(levels), **kw)

    def _smooth(self, level: MGLevel, x, r, n: int):
        diag, free = level.decode(r.dtype)
        inv_d = jnp.where(
            free & (diag > 0),
            jnp.asarray(self.omega, r.dtype) / jnp.where(diag > 0, diag, 1.0),
            jnp.zeros((), r.dtype),
        )

        def body(i, x):
            return x + inv_d * (r - level.apply(x))

        return jax.lax.fori_loop(0, n, body, x)

    def _vcycle(self, idx: int, r):
        level = self.levels[idx]
        x = jnp.zeros_like(r)
        if idx == len(self.levels) - 1:
            return self._smooth(level, x, r, self.coarse_sweeps)
        x = self._smooth(level, x, r, self.nu1)
        resid = jnp.where(level.free, r - level.apply(x), jnp.zeros((), r.dtype))
        rc = _restrict(resid)
        coarse = self.levels[idx + 1]
        rc = jnp.where(coarse.free, rc.astype(r.dtype), jnp.zeros((), r.dtype))
        ec = self._vcycle(idx + 1, rc)
        x = x + jnp.where(level.free, _prolong(ec), jnp.zeros((), r.dtype))
        return self._smooth(level, x, r, self.nu2)

    def __call__(self, r):
        return self._vcycle(0, r)


# ---------------------------------------------------------------------------
# Rediscretised-mask geometric multigrid (the "mg" preconditioner).
#
# Stands in for Hypre SMG/PFMG (reference TortuosityHypre.cpp:671-678,
# EffectiveDiffusivityHypre.cpp:580-620).  Design: coarsening by 2 in all
# axes (stop when a dim goes odd or < 8); coarse masks are REDISCRETISED —
# a coarse cell is free if ANY of its 2x2x2 fine children is free ("any"
# pooling preserves the connectivity of thin pore channels, which "all"
# pooling would sever); piecewise-constant prolongation, full-weighting
# restriction; damped-Jacobi smoothing with symmetric pre/post counts so
# the V-cycle is a symmetric operator and PCG stays valid.  Superseded as
# the default by the Galerkin conductance hierarchy above (which keeps the
# coarse problem's connectivity faithful instead of leaking through walls)
# but kept as the reference "mg" surface.
# ---------------------------------------------------------------------------


def make_multigrid_preconditioner(system, nu1: int = 2, nu2: int = 2,
                                  omega: float = 0.8, coarse_sweeps: int = 30):
    """Return the rediscretised-mask V-cycle preconditioner."""
    return MultigridPreconditioner.from_system(
        system, nu1=nu1, nu2=nu2, omega=omega, coarse_sweeps=coarse_sweeps
    )
