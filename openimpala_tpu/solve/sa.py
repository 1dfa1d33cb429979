"""Smoothed-aggregation multigrid (SA-MG) — the round-3 coarse-space fix.

Replaces the piecewise-constant (PC) coarse space whose two-level
contraction saturates at rho ~ 0.79-0.81 on labyrinth porous masks
(BASELINE.md "known levers"; reference bar: FlexGMRES(SMG) in tens of
iterations, ``TortuosityHypre.cpp:671-678``).  Design measured in
scripts/agg2level.py + scripts/sa_ml.py (scipy, exact coarse solves):

* aggregates stay the geometric 2x2x2 blocks (component-splitting measured
  NO better: rho 0.796 vs 0.793);
* the tentative prolongator P (block injection on the free set) is smoothed
  once: ``Ps = (I - om_sa D^{-1} A) P`` — rho drops 0.79 -> 0.42;
* the coarse operator must be the TRUE Galerkin product ``Ps^T A Ps``
  (PC-Galerkin under SA transfers: rho 0.79; filtering its +-2 taps away:
  rho >= 0.87).  Its support is {|o|_inf <= 1} u {axial +-2} = 33 taps;
* below level 1 the same construction repeats once more (sa_depth=2) with
  the prolongator smoothed by the FILTERED operator (nearest-neighbour
  taps only — measured identical quality, 19 = 19 PCG iters at 48^3, and
  it bounds the next level's support), then plain PC-Galerkin.
  Multilevel PCG(1e-9) at 48^3: PC-everywhere 46 iters -> sa_depth=2 19.

TPU mapping
-----------
Coarse operators are variable-coefficient offset stencils on the coarse
grid — a static tuple of integer offsets plus one coefficient array per
offset (``OffsetLevel``); apply = sum of rolled multiplies, all dense and
GSPMD-shardable.  They are BUILT BY PROBING: for a probe vector that is 1
on a sparse lattice (spacing > stencil diameter) and 0 elsewhere,
``y = R A P x`` reads off one Galerkin matrix column per lattice cell
with no overlap, so ``spacing^3`` matrix-free applications of the
transfer-wrapped operator recover every coefficient exactly.  Probing
avoids materialising the fine-level triple-product stencils (63 offsets x
512^3 would be ~33 GiB); each probe is 3 fused fine applies (the Pallas
matvec on level 0).

Fine-level transfers are matrix-free: prolong = S0 (PC-prolong e), one
extra fused matvec; restrict = blocksum(S0^T r), one more.  The V-cycle
with symmetric damped-Jacobi smoothing and R = P^T per level remains a
fixed SPD operator, so CG stays valid.

HBM budget (measured): at 512^3 on a 16 GiB v5e the SA V-cycle fits for
the flow-through (tortuosity) operator but the SA W-cycle and the SA-
preconditioned PERIODIC cell problem both exhaust HBM (the cell problem
carries wrap-coupled 33-tap coarse levels on top of the CG state).  ``precond="auto"`` therefore keeps GMG on TPU;
request SA explicitly only where iterations dominate wall time
(CPU/virtual-mesh runs) or at <= 256^3.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .preconditioners import MGLevel, _blocksum, _can_coarsen, _prolong_pc

OM_SA = 2.0 / 3.0  # classic prolongator-smoothing weight ~ 4/(3 lam_max)


# ---------------------------------------------------------------------------
# static offset-support arithmetic (Python ints; runs at build/trace time)
# ---------------------------------------------------------------------------


def _l1_ball(r):
    return tuple(
        (i, j, k)
        for i in range(-r, r + 1)
        for j in range(-r, r + 1)
        for k in range(-r, r + 1)
        if abs(i) + abs(j) + abs(k) <= r
    )


def _minkowski(a, b):
    return tuple(sorted({(p[0] + q[0], p[1] + q[1], p[2] + q[2])
                         for p in a for q in b}))


def _coarsen_support(sup):
    """Coarse offsets reachable by P^T B P for fine support ``sup``:
    fine row 2I+a couples fine col 2I+a+f = 2J+b -> oc = (a+f-b)/2 with
    b = (a+f) mod 2 elementwise."""
    out = set()
    for f in sup:
        for a0 in (0, 1):
            for a1 in (0, 1):
                for a2 in (0, 1):
                    t = (f[0] + a0, f[1] + a1, f[2] + a2)
                    out.add(tuple((ti - (ti % 2)) // 2 for ti in t))
    return tuple(sorted(out))


def _nn_filter(sup):
    """Nearest-neighbour (27-point) subset — the filtered smoother support."""
    return tuple(o for o in sup if max(abs(c) for c in o) <= 1)


def _spacing(sup, shape, periodic):
    """Per-axis probe-lattice spacing: > stencil diameter so every lattice
    cell's Galerkin column is recovered without overlap; on periodic axes
    it must also divide the axis length (the lattice must be consistent
    across the wrap)."""
    sp = []
    for ax in range(3):
        r = max(abs(o[ax]) for o in sup)
        s = 2 * r + 1
        if periodic[ax]:
            while shape[ax] % s != 0:
                s += 1
                if s > shape[ax]:
                    s = shape[ax]
                    break
        sp.append(s)
    return tuple(sp)


# ---------------------------------------------------------------------------
# offset-stencil level
# ---------------------------------------------------------------------------


def _shift(x, o):
    """x(i + o) via roll (coefficients vanish where i+o is out of domain on
    clamped axes — guaranteed by probing the true operator — so the wrap
    reads are always multiplied by zero)."""
    return jnp.roll(x, (-o[0], -o[1], -o[2]), axis=(0, 1, 2))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OffsetLevel:
    """Variable-coefficient stencil  (A x)(i) = sum_o c_o(i) x(i+o).

    Coefficients live PACKED as one (X, T, Y, Z) array in the canonical
    ``ops.offset_pallas.order_offsets`` order ((0,0,0) at t=0, then the
    rest of the l_inf<=1 ball — the filtered-smoother prefix — then wider
    taps).  On TPU, apply/resid/sweep dispatch to the packed-stream Pallas
    kernel (ops/offset_pallas.py); the XLA roll path covers every other
    case and is the parity reference.
    """

    packed: jax.Array
    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    nn: int = dataclasses.field(default=0, metadata=dict(static=True))

    @classmethod
    def from_coeffs(cls, coeffs, offsets):
        from ..ops.offset_pallas import order_offsets

        ordered, nn = order_offsets(offsets)
        by_offset = dict(zip(offsets, coeffs))
        packed = jnp.stack([by_offset[o] for o in ordered], axis=1)
        return cls(packed=packed, offsets=ordered, nn=nn)

    @property
    def coeffs(self):
        return tuple(self.packed[:, t] for t in range(len(self.offsets)))

    @property
    def diag(self):
        return self.packed[:, self.offsets.index((0, 0, 0))]

    @property
    def free(self):
        return self.diag > 0

    def _pallas_ok(self, x, n_taps):
        from ..ops import stencil as _st
        from ..ops import offset_pallas as _op

        used = self.offsets[:n_taps]
        R = max(abs(o[0]) for o in used)
        return (_st._PALLAS_MODE != "0"
                and _op.supports(x.shape, n_taps, R, x.dtype,
                                 self.packed.dtype))

    def _dispatch(self, x, mode, r=None, omega=0.9, n_taps=None):
        from ..ops import offset_pallas as _op

        n = len(self.offsets) if n_taps is None else n_taps
        if self._pallas_ok(x, n):
            return _op.offset_stencil_pallas(x, self.packed, self.offsets,
                                             n_taps=n, mode=mode, r=r,
                                             omega=omega)
        return None

    def apply(self, x):
        out = self._dispatch(x, "apply")
        if out is not None:
            return out
        return self.apply_xla(x)

    def apply_xla(self, x):
        """The pure-XLA roll form — always available; probe programs pin it
        when building THROUGH an operator inside fori_loop control flow."""
        out = jnp.zeros_like(x)
        for o, t in zip(self.offsets, range(len(self.offsets))):
            out = out + self.packed[:, t].astype(x.dtype) * _shift(x, o)
        return out

    def apply_sub(self, x, keep):
        """Apply only the offsets in ``keep`` (the filtered smoother).

        When ``keep`` is exactly the NN prefix (the only production caller),
        the kernel fetches just the leading block of the packed stream."""
        if set(keep) == set(self.offsets[: self.nn]):
            out = self._dispatch(x, "apply", n_taps=self.nn)
            if out is not None:
                return out
        out = jnp.zeros_like(x)
        for o, t in zip(self.offsets, range(len(self.offsets))):
            if o in keep:
                out = out + self.packed[:, t].astype(x.dtype) * _shift(x, o)
        return out

    def resid(self, x, r):
        """free-masked residual: where(free, r - A x, 0)."""
        out = self._dispatch(x, "resid", r=r)
        if out is not None:
            return out
        return jnp.where(self.free, r - self.apply_xla(x),
                         jnp.zeros((), x.dtype))

    def sweep(self, x, r, omega: float):
        out = self._dispatch(x, "sweep", r=r, omega=omega)
        if out is not None:
            return out
        d = self.diag.astype(r.dtype)
        inv_d = jnp.where(d > 0, jnp.asarray(omega, r.dtype)
                          / jnp.where(d > 0, d, 1.0), jnp.zeros((), r.dtype))
        return x + inv_d * (r - self.apply_xla(x))


# ---------------------------------------------------------------------------
# probing: recover the Galerkin coarse stencil from matrix-free applies
# ---------------------------------------------------------------------------


# Phases per device dispatch: each probe phase chains ~3 operator applies
# (Pallas kernels on the fine level), and the TPU worker dies when a single
# dispatch chains hundreds of kernel invocations (measured: the periodic
# cell problem's 512-phase lattice at 512^3 crashed the worker; the
# 125-phase clamped case survived).  64 keeps every dispatch well under the
# threshold; the host loop between chunks costs microseconds.
_PROBE_CHUNK = 64


def _probe_chunk(apply_cc, shape_c, offsets, spacing, dtype, p0, n, coeffs):
    """Accumulate probe phases [p0, p0+n) into ``coeffs`` (one fori_loop).

    For each lattice phase phi, y = A x_phi sums exactly one in-support
    column per cell, so c_o(I) = y_{(I+o) mod s}(I)."""
    sx, sy, sz = spacing
    ii, jj, kk = jnp.meshgrid(
        jnp.arange(shape_c[0]), jnp.arange(shape_c[1]),
        jnp.arange(shape_c[2]), indexing="ij")

    offs = tuple(offsets)

    def body(p, coeffs):
        px = p // (sy * sz)
        py = (p // sz) % sy
        pz = p % sz
        probe = (((ii - px) % sx == 0) & ((jj - py) % sy == 0)
                 & ((kk - pz) % sz == 0)).astype(dtype)
        y = apply_cc(probe)
        new = []
        for o, c in zip(offs, coeffs):
            m = ((((ii + o[0]) % sx) == px) & (((jj + o[1]) % sy) == py)
                 & (((kk + o[2]) % sz) == pz))
            new.append(c + jnp.where(m, y, jnp.zeros((), dtype)))
        return tuple(new)

    return jax.lax.fori_loop(p0, p0 + n, body, tuple(coeffs))


# ---------------------------------------------------------------------------
# the preconditioner
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SAMGPreconditioner:
    """V-cycle on the smoothed-aggregation hierarchy.

    Level 0 is the packed-geometry fine operator (fused Pallas sweeps on
    TPU, exactly as the Galerkin-PC preconditioner); levels >= 1 are probed
    OffsetLevels.  ``sa_depth`` levels of transfers are SA-smoothed
    (matrix-free S applies around the PC transfers); deeper transfers are
    plain PC.  ``cycle='w'`` recurses twice per level below level 1 —
    the sub-levels hold <= 1/8 of the cells, so the W costs little and
    approximates the exact-level-1 solve the two-level analysis assumes.
    """

    fine: MGLevel
    dinv0: jax.Array  # 1/diag on the fine free set (0 elsewhere)
    levels: Tuple[OffsetLevel, ...]
    nu1: int = dataclasses.field(default=2, metadata=dict(static=True))
    nu2: int = dataclasses.field(default=2, metadata=dict(static=True))
    omega: float = dataclasses.field(default=0.9, metadata=dict(static=True))
    coarse_sweeps: int = dataclasses.field(default=50,
                                           metadata=dict(static=True))
    sa_depth: int = dataclasses.field(default=2, metadata=dict(static=True))
    om_sa: float = dataclasses.field(default=OM_SA,
                                     metadata=dict(static=True))
    cycle: str = dataclasses.field(default="v", metadata=dict(static=True))
    w_depth: int = dataclasses.field(default=3, metadata=dict(static=True))

    # -- construction ------------------------------------------------------

    @classmethod
    def from_system(cls, system, max_levels: int = 16, sa_depth: int = 2,
                    omega: float = 0.9, coeff_dtype="auto", **kw):
        """``coeff_dtype``: storage dtype for the probed coarse coefficient
        arrays.  "auto" = bfloat16 on TPU (the 33-offset level-1 stencil at
        512^3 costs 2.2 GiB in f32 and OOMed a 16 GiB v5e together with the
        solver state; bf16 halves it, and a slightly quantised — but fixed,
        hence still SPD — V-cycle costs ~no iterations), full precision
        elsewhere."""
        fine = MGLevel(code=system.code, w=system.w,
                       periodic=system.periodic)
        dtype = system.r0_b.dtype
        dinv0, free0 = _fine_dinv(fine, jnp.zeros((), dtype))
        shape = system.code.shape
        periodic = system.periodic
        om = float(kw.pop("om_sa", OM_SA))
        if coeff_dtype == "auto":
            coeff_dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                           else None)

        levels = []
        # --- level 0 -> 1: SA around the fused fine operator -------------
        sup0 = _l1_ball(1)
        cur_sup = _coarsen_support(_minkowski(_minkowski(sup0, sup0), sup0))
        if _can_coarsen(shape):
            spacing = _spacing(cur_sup, shape, periodic)
            coeffs = _probe_chunked(
                _probe_l0_jit, tuple(s // 2 for s in shape), cur_sup,
                spacing, dtype, fine, dinv0, free0, cur_sup, spacing, om)
            lvl, cur_sup = _prune(coeffs, cur_sup)
            levels.append(lvl)
            shape = tuple(s // 2 for s in shape)

        # --- deeper levels ------------------------------------------------
        while len(levels) < max_levels - 1 and _can_coarsen(shape):
            top = levels[-1]
            if len(levels) < sa_depth:
                # SA with the FILTERED (27-pt) smoother: measured identical
                # quality and keeps the next support r_inf <= 2
                smo_sup = _nn_filter(cur_sup)
                nxt_sup = _coarsen_support(
                    _minkowski(_minkowski(smo_sup, cur_sup), smo_sup))
            else:
                smo_sup = None
                nxt_sup = _coarsen_support(cur_sup)
            spacing = _spacing(nxt_sup, shape, periodic)
            coeffs = _probe_chunked(
                _probe_deep_jit, tuple(s // 2 for s in shape), nxt_sup,
                spacing, top.diag.dtype, top, nxt_sup, spacing, om, smo_sup)
            lvl, nxt_sup = _prune(coeffs, nxt_sup)
            levels.append(lvl)
            cur_sup = nxt_sup
            shape = tuple(s // 2 for s in shape)

        if coeff_dtype is not None:
            # downcast AFTER the whole hierarchy is built: probing deeper
            # levels through an already-quantised parent would compound the
            # rounding; one final cast only quantises the stored operator
            cast = jnp.dtype(coeff_dtype)
            levels = [dataclasses.replace(l, packed=l.packed.astype(cast))
                      for l in levels]

        return cls(fine=fine, dinv0=dinv0, levels=tuple(levels),
                   sa_depth=int(sa_depth), omega=float(omega), om_sa=om,
                   **kw)

    # -- fine level smoothing (mirrors GalerkinMGPreconditioner) -----------

    def _fine_smooth(self, x, r, n: int):
        if x is None:
            x = (jnp.asarray(self.omega, r.dtype) * self.dinv0.astype(r.dtype)
                 ) * r
            n -= 1
        for _ in range(n):
            x = self.fine.sweep(x, r, self.omega)
        return x

    def _lvl_smooth(self, lvl, x, r, n: int):
        """OffsetLevel damped-Jacobi sweeps.

        Few sweeps (nu1/nu2) unroll so each dispatches the fused Pallas
        sweep kernel; many sweeps (the coarsest level, always below the
        kernel's layout contract) run as a fori_loop over the pure-XLA
        apply, which keeps the compile size at one apply per level instead
        of ``n * len(offsets)`` unrolled rolls (50 coarsest sweeps x 125
        offsets froze the XLA optimizer when unrolled)."""
        if x is None:
            d = lvl.diag.astype(r.dtype)
            inv_d0 = jnp.where(d > 0, jnp.asarray(self.omega, r.dtype)
                               / jnp.where(d > 0, d, 1.0),
                               jnp.zeros((), r.dtype))
            x = inv_d0 * r
            n -= 1
        if n <= 0:
            return x
        if n <= 4:
            for _ in range(n):
                x = lvl.sweep(x, r, self.omega)
            return x
        d = lvl.diag.astype(r.dtype)
        inv_d = jnp.where(d > 0, jnp.asarray(self.omega, r.dtype)
                          / jnp.where(d > 0, d, 1.0),
                          jnp.zeros((), r.dtype))
        return jax.lax.fori_loop(
            0, n, lambda i, v: v + inv_d * (r - lvl.apply_xla(v)), x)

    # -- SA transfers ------------------------------------------------------

    def _restrict0(self, r):
        om = jnp.asarray(self.om_sa, r.dtype)
        dinv = self.dinv0.astype(r.dtype)
        str_ = r - om * self.fine.apply(dinv * r)
        return _blocksum(str_)

    def _prolong0(self, ec, free0, dtype):
        p = _prolong_pc(ec)
        p = jnp.where(free0, p, jnp.zeros((), dtype))
        om = jnp.asarray(self.om_sa, p.dtype)
        return p - om * self.dinv0.astype(p.dtype) * self.fine.apply(p)

    def _restrict_l(self, idx, r):
        lvl = self.levels[idx - 1]
        if idx < self.sa_depth:
            smo = _nn_filter(lvl.offsets)
            d = lvl.diag.astype(r.dtype)
            dinv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0),
                             jnp.zeros((), r.dtype))
            om = jnp.asarray(self.om_sa, r.dtype)
            r = r - om * lvl.apply_sub(dinv * r, smo)
        return _blocksum(r)

    def _prolong_l(self, idx, ec, dtype):
        lvl = self.levels[idx - 1]
        p = _prolong_pc(ec)
        p = jnp.where(lvl.free, p, jnp.zeros((), dtype))
        if idx < self.sa_depth:
            smo = _nn_filter(lvl.offsets)
            d = lvl.diag.astype(dtype)
            dinv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0),
                             jnp.zeros((), dtype))
            om = jnp.asarray(self.om_sa, dtype)
            p = p - om * dinv * lvl.apply_sub(p, smo)
        return p

    # -- the cycle ---------------------------------------------------------

    def _vcycle(self, idx: int, r):
        dtype = r.dtype
        if idx == 0:
            if not self.levels:
                diag, free = self.fine.decode(dtype)
                x = jnp.zeros_like(r)
                for _ in range(self.coarse_sweeps):
                    x = x + jnp.where(
                        free & (diag > 0),
                        jnp.asarray(self.omega, dtype)
                        / jnp.where(diag > 0, diag, 1.0), 0.0
                    ) * (r - self.fine.apply_xla(x))
                return x
            x = self._fine_smooth(None, r, self.nu1)
            resid = jnp.where(self.fine.free, r - self.fine.apply(x),
                              jnp.zeros((), dtype))
            rc = self._restrict0(resid)
            rc = jnp.where(self.levels[0].free, rc, jnp.zeros((), dtype))
            ec = self._vcycle(1, rc)
            x = x + self._prolong0(ec, self.fine.free, dtype)
            return self._fine_smooth(x, r, self.nu2)

        lvl = self.levels[idx - 1]
        if idx == len(self.levels):
            return self._lvl_smooth(lvl, None, r, self.coarse_sweeps)

        x = self._lvl_smooth(lvl, None, r, self.nu1)
        n_corr = 2 if (self.cycle == "w" and 1 <= idx <= self.w_depth) else 1
        for _ in range(n_corr):
            resid = lvl.resid(x, r)
            rc = self._restrict_l(idx, resid)
            rc = jnp.where(self.levels[idx].free, rc, jnp.zeros((), dtype))
            ec = self._vcycle(idx + 1, rc)
            x = x + self._prolong_l(idx, ec, dtype)
        return self._lvl_smooth(lvl, x, r, self.nu2)

    def __call__(self, r):
        return self._vcycle(0, r)


# ---------------------------------------------------------------------------
# build helpers
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("dtype_name",))
def _fine_dinv_jit(fine, dtype_name):
    dtype = jnp.dtype(dtype_name)
    diag, free = fine.decode(dtype)
    dinv = jnp.where(free & (diag > 0),
                     1.0 / jnp.where(diag > 0, diag, 1.0),
                     jnp.zeros((), dtype))
    return dinv, free


def _fine_dinv(fine, proto):
    return _fine_dinv_jit(fine, jnp.dtype(proto.dtype).name)


# All probe programs take their arrays as ARGUMENTS (pytrees), never as
# closures: closed-over arrays embed as HLO constants, which blows the
# remote-compile payload limit at 512^3 (CLAUDE.md design invariant).


@partial(jax.jit, static_argnames=("sup", "spacing", "om", "n"))
def _probe_l0_jit(fine, dinv0, free0, sup, spacing, om, p0, n, coeffs):
    dtype = dinv0.dtype
    shape_c = tuple(s // 2 for s in dinv0.shape)

    def apply_cc(xc):
        p = _prolong_pc(xc)
        p = jnp.where(free0, p, jnp.zeros((), dtype))
        sp_ = p - om * dinv0 * fine.apply(p)
        q = fine.apply(sp_)
        stq = q - om * fine.apply(dinv0 * q)
        return _blocksum(stq)

    return _probe_chunk(apply_cc, shape_c, sup, spacing, dtype, p0, n,
                        coeffs)


@partial(jax.jit, static_argnames=("sup", "spacing", "om", "smo", "n"))
def _probe_deep_jit(top, sup, spacing, om, smo, p0, n, coeffs):
    dtype = top.diag.dtype
    shape_c = tuple(s // 2 for s in top.diag.shape)
    if smo is not None:
        dl = top.diag
        dinv = jnp.where(dl > 0, 1.0 / jnp.where(dl > 0, dl, 1.0),
                         jnp.zeros((), dtype))

        def apply_cc(xc):
            p = _prolong_pc(xc)
            p = jnp.where(top.free, p, jnp.zeros((), dtype))
            sp_ = p - om * dinv * top.apply_sub(p, smo)
            q = top.apply(sp_)
            stq = q - om * top.apply_sub(dinv * q, smo)
            return _blocksum(stq)
    else:

        def apply_cc(xc):
            p = _prolong_pc(xc)
            p = jnp.where(top.free, p, jnp.zeros((), dtype))
            return _blocksum(top.apply(p))

    return _probe_chunk(apply_cc, shape_c, sup, spacing, dtype, p0, n,
                        coeffs)


def _probe_chunked(jit_fn, shape_c, sup, spacing, dtype, *args):
    """Host loop over _PROBE_CHUNK-phase dispatches (see _PROBE_CHUNK).
    At most two distinct programs compile: the full chunk and the
    remainder."""
    n_phases = spacing[0] * spacing[1] * spacing[2]
    coeffs = tuple(jnp.zeros(shape_c, dtype) for _ in sup)
    for p0 in range(0, n_phases, _PROBE_CHUNK):
        n = min(_PROBE_CHUNK, n_phases - p0)
        coeffs = jit_fn(*args, p0=jnp.int32(p0), n=n, coeffs=coeffs)
    return coeffs


def _prune(coeffs, sup):
    """Drop offsets whose coefficient array is identically zero (the
    symbolic support over-covers the masked geometry).  One host fetch of
    per-offset max|c|."""
    import numpy as np

    mx = jax.jit(lambda cs: jnp.stack([jnp.max(jnp.abs(c)) for c in cs]))(
        tuple(coeffs))
    mx = np.asarray(mx)
    keep = [i for i, o in enumerate(sup) if mx[i] > 0 or o == (0, 0, 0)]
    new_sup = tuple(sup[i] for i in keep)
    new_coeffs = tuple(coeffs[i] for i in keep)
    lvl = OffsetLevel.from_coeffs(new_coeffs, new_sup)
    return lvl, lvl.offsets
