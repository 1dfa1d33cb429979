"""Masked 7-point stencil systems, matrix-free.

Reproduces the reference's two operators exactly (same linear systems, same
solutions), but as fused mask logic instead of assembled matrices:

**Flow-through (tortuosity) operator** — reference
``src/props/TortuosityHypreFill.F90:44-262``:

* inactive cells (wrong phase or not percolating): identity row, rhs 0;
* active cells: ``a_c = sum_f w_f m_f``, off-diagonal ``-w_f`` to each
  *active* neighbour ``f`` (``w_f = 1/dx_f^2``); homogeneous Neumann at
  blocked faces by omission; rhs 0;
* active cells on the inlet/outlet plane of ``dir``: Dirichlet overwrite,
  identity row with rhs vlo/vhi (``TortuosityHypreFill.F90:188-228``).

**Periodic cell problem (homogenisation) operator** — reference
``src/props/EffDiffFillMtx.F90:42-264``:

* solid cells: identity row;
* active cells: diagonal ``sum over ALL 6 faces of w_f`` (interface faces
  contribute to the diagonal but have no off-diagonal — the internal-Neumann
  ghost elimination), off-diagonal ``-w_f`` to active neighbours, periodic
  wrap;
* rhs = ``-(D_{+k}-D_{-k})/(2 dx_k)`` plus interface flux terms ``±1/dx_k``
  on faces normal to ``k`` (``EffDiffFillMtx.F90:156-232``).

Both are solved in *eliminated* form: forced rows (inactive + Dirichlet) are
removed by construction and the Krylov iteration runs on the free set, where
the operator is symmetric positive (semi-)definite — so CG applies, unlike
the reference's identity-row formulation which is non-symmetric and needs
(Flex)GMRES.  The full-system solution and Hypre's relative-residual
convergence criterion are reproduced exactly (see ``StencilSystem``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..parallel.halo import pad_halo

Axis = int  # 0=X, 1=Y, 2=Z (matches reference Direction enum)


def neighbor_sum(x, w, periodic):
    """sum_f w_f * x(neighbour_f) for the 6 face neighbours.

    Out-of-domain neighbours contribute 0 on clamped axes and wrap on
    periodic axes.  ``x`` must be zero on inactive cells (library invariant),
    which makes the mask multiplication implicit — see module docstring.
    """
    xp = pad_halo(x, periodic)
    return (
        w[0] * (xp[:-2, 1:-1, 1:-1] + xp[2:, 1:-1, 1:-1])
        + w[1] * (xp[1:-1, :-2, 1:-1] + xp[1:-1, 2:, 1:-1])
        + w[2] * (xp[1:-1, 1:-1, :-2] + xp[1:-1, 1:-1, 2:])
    )


def weighted_degree(active, w, periodic, dtype):
    """Diagonal of the tortuosity operator: sum_f w_f * active(neighbour_f).

    (The reference accumulates ``coeff`` into the diagonal once per *active*
    neighbour, ``TortuosityHypreFill.F90:126-166``.)
    """
    return neighbor_sum(active.astype(dtype), w, periodic)


# ---------------------------------------------------------------------------
# Packed operator geometry.  For ISOTROPIC spacing (w0 == w1 == w2 — the
# reference's sample and bench volumes are unit cells), a free cell's
# diagonal is w * (total active-neighbour count 1..6), so ONE signed value
# per cell carries the whole operator geometry:
#
#     code =  n_active_neighbours   on free rows (> 0 always: free rows are
#                                   connected by construction)
#     code = -1                     on every other row
#
# decode: free = code > 0; diag = max(code, 0) * w.  The stream is BF16
# (2 B): small integer counts are exact there and the in-kernel decode is
# one native bf16->f32 extend + max + multiply.  This replaces the f32
# diagonal (4 B) + int8 free mask (1 B) streams: the fused matvec drops
# from 13 to 10 B/cell of compulsory HBM traffic, the Jacobi sweep from 17
# to 14.  (Two rejected variants, both measured: int8 bit-packed per-axis
# counts destroy the Mosaic lowering — 335 s compiles, 127 GB/s at 256^3 —
# and int8 signed counts fail to lower at all: vector cmpi on i8.  The
# failures are the INT8 dtype in Mosaic, not the packing idea.)
#
# ANISOTROPIC spacing (per-axis voxel size — imaging stacks where the Z
# spacing differs from XY; the reference takes per-axis cell sizes from
# its RealBox geometry) packs the PER-AXIS active-neighbour counts
# (each 0..2) in the same bf16 stream:
#
#     code =  cx*16 + cy*4 + cz     on free rows (1..42; a free row has at
#                                   least one neighbour, so always > 0)
#     code = -1                     on every other row
#
# decode: free = code > 0; unpack with base-4/16 arithmetic (exact in
# f32: the scales 1/16 and 1/4 are powers of two, the packed values are
# small integers, and bf16 holds integers <= 256 exactly); then
# diag = w0*cx + w1*cy + w2*cz — the SAME expression, in the same
# evaluation order, as ``weighted_degree``, so the decode is bit-exact
# against the explicit diagonal in every float dtype.  The decode is all
# f32 VPU arithmetic after the bf16 extend, so it lowers in Mosaic where
# the int8 variants did not; anisotropic systems run the same fused
# kernels as isotropic ones (was: explicit f32 diagonal + XLA path,
# ~5x the fine-level wall time).  ``decode_code`` dispatches on the
# STATIC weight tuple, so every call site handles both packings.
# ---------------------------------------------------------------------------


def neighbor_count_axes(active, periodic):
    """Per-axis active-neighbour counts ((cx, cy, cz), each 0..2, int8)."""
    ap = pad_halo(active.astype(jnp.int8), periodic)
    sl = [slice(1, -1)] * 3
    counts = []
    for ax in range(3):
        lo, hi = list(sl), list(sl)
        lo[ax] = slice(0, -2)
        hi[ax] = slice(2, None)
        counts.append(ap[tuple(lo)] + ap[tuple(hi)])
    return tuple(counts)


def neighbor_count(active, periodic):
    """Total active-neighbour count (0..6) per cell, int8."""
    cx, cy, cz = neighbor_count_axes(active, periodic)
    return cx + cy + cz


def pack_code(nsum, free):
    """Isotropic signed-count packing: free ? nsum : -1 (module comment)."""
    return jnp.where(free, nsum.astype(jnp.bfloat16),
                     jnp.asarray(-1, jnp.bfloat16))


def pack_code_axes(counts, free):
    """Anisotropic per-axis packing: free ? cx*16 + cy*4 + cz : -1 (module
    comment).  ``counts`` are the ``neighbor_count_axes`` triple."""
    cx, cy, cz = (c.astype(jnp.int32) for c in counts)
    return jnp.where(free, (cx * 16 + cy * 4 + cz).astype(jnp.bfloat16),
                     jnp.asarray(-1, jnp.bfloat16))


def pack_code_for(w, active, free, periodic):
    """The packed geometry for weights ``w``: isotropic count or per-axis
    packing (module comment) — chosen by the static weight tuple, exactly
    mirroring ``decode_code``."""
    if uniform_w(w):
        return pack_code(neighbor_count(active, periodic), free)
    return pack_code_axes(neighbor_count_axes(active, periodic), free)


def unpack_code_axes(code, dtype):
    """(cx, cy, cz) per-axis counts from the anisotropic packing, in
    ``dtype``.  Exact: 1/16 and 1/4 are powers of two and the packed
    values are small integers (module comment)."""
    dtype = jnp.dtype(dtype).type
    c = jnp.maximum(code, 0).astype(dtype)
    cx = jnp.floor(c * dtype(0.0625))
    rem = c - cx * dtype(16)
    cy = jnp.floor(rem * dtype(0.25))
    cz = rem - cy * dtype(4)
    return cx, cy, cz


def decode_code(code, w, dtype):
    """(diag, free) from the packed geometry; fuses into consuming XLA ops
    (2 B/cell read instead of 5).  Dispatches on the static weight tuple:
    isotropic count decode or per-axis unpack (module comment)."""
    dtype = jnp.dtype(dtype).type
    free = code > 0
    if uniform_w(w):
        diag = jnp.maximum(code, 0).astype(dtype) * dtype(w[0])
        return diag, free
    cx, cy, cz = unpack_code_axes(code, dtype)
    # same expression and evaluation order as weighted_degree's
    # neighbor_sum: w0*(a+b) + w1*(c+d) + w2*(e+f)
    diag = dtype(w[0]) * cx + dtype(w[1]) * cy + dtype(w[2]) * cz
    return diag, free


def uniform_w(w) -> bool:
    return w[0] == w[1] == w[2]


import os as _os

_PALLAS_MODE = _os.environ.get("OPENIMPALA_PALLAS", "auto")  # auto|1|0


def set_pallas_mode(mode: str):
    """'auto' (TPU + layout contract), '1' (force), '0' (XLA path only)."""
    global _PALLAS_MODE
    _PALLAS_MODE = mode


def apply_restricted_xla(x, diag, free, w, periodic):
    """The pure-XLA form of the free-set operator, always available.

    Needed explicitly (not just as apply_restricted's fallback) because the
    Pallas kernel crashes the TPU runtime when invoked from *nested* control
    flow (fori_loop-in-while_loop, as in multigrid smoothing at >=512^3);
    callers in that position pin the XLA path regardless of _PALLAS_MODE.
    """
    return jnp.where(free, diag * x - neighbor_sum(x, w, periodic),
                     jnp.zeros((), x.dtype))


def apply_restricted(x, diag, free, w, periodic):
    """Action of the free-set operator with EXPLICIT (diag, free) arrays —
    the legacy/probe form, always XLA.  Production paths carry the packed
    geometry instead: see ``apply_code`` (kernel-dispatched)."""
    return apply_restricted_xla(x, diag, free, w, periodic)


def apply_code(x, code, w, periodic):
    """Action of the free-set operator from the packed geometry.

    Dispatches to the fused Pallas TPU kernel (ops/stencil_pallas.py) when
    the layout contract holds; the decode+XLA expression covers every other
    case (CPU tests, float64 outer residuals, odd shapes).
    """
    if _PALLAS_MODE != "0":
        from . import stencil_pallas

        if stencil_pallas.supports_v3(x.shape, x.dtype, has_r=False):
            # v3 rolling-window engine: in-kernel X halo (no pad copy)
            return stencil_pallas.fused_stencil_pallas(
                "matvec", x, None, code, w, periodic
            )
    diag, free = decode_code(code, w, x.dtype)
    return apply_restricted_xla(x, diag, free, w, periodic)


def apply_code_with_dot(x, code, w, periodic):
    """``(A x, <x, A x>)`` with the reduction fused into the stencil pass.

    On TPU the v3 kernel accumulates the dot in-kernel (saves re-reading
    x and Ax from HBM for CG's p.Ap — 8 of the 17 B/cell of that step).
    """
    if _PALLAS_MODE != "0":
        from . import stencil_pallas

        if stencil_pallas.supports_v3(x.shape, x.dtype, has_r=False):
            out, dot = stencil_pallas.fused_stencil_pallas(
                "matvec", x, None, code, w, periodic, with_dot=True,
            )
            return out, dot.astype(x.dtype)
    ax = apply_code(x, code, w, periodic)
    return ax, jnp.sum(x * ax)


def smooth_sweep(x, r, code, w, periodic, omega: float):
    """One damped-Jacobi sweep ``x + (omega/diag)*(r - A x)`` (free & diag>0;
    else x), fused into a single rolling-window pass on TPU."""
    if _PALLAS_MODE != "0":
        from . import stencil_pallas

        if stencil_pallas.supports_v3(x.shape, x.dtype, has_r=True):
            return stencil_pallas.fused_stencil_pallas(
                "sweep", x, r, code, w, periodic, omega=omega,
            )
    diag, free = decode_code(code, w, x.dtype)
    inv_d = jnp.where(
        free & (diag > 0),
        jnp.asarray(omega, x.dtype) / jnp.where(diag > 0, diag, 1.0),
        jnp.zeros((), x.dtype),
    )
    return x + inv_d * (r - apply_restricted_xla(x, diag, free, w, periodic))


def residual_restricted(x, r, code, w, periodic):
    """``free ? r - A x : 0`` fused into one pass (the V-cycle restriction
    input)."""
    if _PALLAS_MODE != "0":
        from . import stencil_pallas

        if stencil_pallas.supports_v3(x.shape, x.dtype, has_r=True):
            return stencil_pallas.fused_stencil_pallas(
                "resid", x, r, code, w, periodic
            )
    diag, free = decode_code(code, w, x.dtype)
    return jnp.where(free, r - apply_restricted_xla(x, diag, free, w, periodic),
                     jnp.zeros((), x.dtype))


def residual_restrict(x, r, code, w, periodic):
    """The V-cycle's restriction input in ONE fused pass:

        rc = blocksum_2x2x2( free ? r - A x : 0 )

    returning the (X/2, Y/2, Z/2) coarse residual directly — the fine
    residual volume is never written to HBM (saves ~11 B/cell of traffic vs
    resid + separate block-sum)."""
    if _PALLAS_MODE != "0" and all(s % 2 == 0 for s in x.shape):
        from . import stencil_pallas

        if stencil_pallas.supports_v3(x.shape, x.dtype, has_r=True,
                                      restrict_=True):
            return stencil_pallas.fused_stencil_pallas(
                "restrict", x, r, code, w, periodic
            )
    diag, free = decode_code(code, w, x.dtype)
    resid = jnp.where(free, r - apply_restricted_xla(x, diag, free, w, periodic),
                      jnp.zeros((), x.dtype))
    for axis in (2, 1, 0):
        shape = list(resid.shape)
        shape[axis:axis + 1] = [shape[axis] // 2, 2]
        resid = resid.reshape(shape).sum(axis=axis + 1)
    return resid


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StencilSystem:
    """A masked-Laplacian linear system in eliminated (free-set) form.

    The full system is ``A_full x_full = b_full`` where forced rows
    (inactive cells, Dirichlet planes) are identity rows.  We solve the
    equivalent restricted problem ``A z = r0`` with ``z`` supported on
    ``free``, ``x_full = x_forced + z``, and

        r0 = free * (b_full - A_full @ x_forced)

    Because the forced rows of ``x_forced`` are exact, the *full-system*
    residual of ``x_forced + z`` equals the restricted residual, so Hypre's
    convergence criterion ``||b - A x||_2 / ||b_full||_2 <= eps``
    (``TortuosityHypre.cpp:686-688``) is reproduced with ``b_norm``.
    """

    code: jax.Array  # bf16 signed-count geometry (free ? nsum : -1)
    x_forced: jax.Array  # forced values (Dirichlet / zeros); 0 on free cells
    r0_b: jax.Array  # b_full restricted to free rows (before x_forced fold-in)
    b_norm: jax.Array  # ||b_full||_2 (Hypre-compatible denominator)
    w: tuple = dataclasses.field(metadata=dict(static=True))
    periodic: tuple = dataclasses.field(metadata=dict(static=True))

    @property
    def free(self):
        """bool rows-being-solved mask, decoded from the packed geometry
        (fuses into consuming ops; never stored)."""
        return self.code > 0

    @property
    def diag(self):
        """Diagonal in the system's storage dtype.  Meaningful only under
        ``free`` (as in the kernels)."""
        return decode_code(self.code, self.w, self.r0_b.dtype)[0]

    def apply(self, x):
        return apply_code(x, self.code, self.w, self.periodic)

    def apply_xla(self, x):
        """apply() pinned to the XLA expression.  Needed under ``jax.vmap``
        (solve/batched.py): the fused Pallas kernel keeps x in memory space
        ANY, which Mosaic cannot re-block with vmap's added batch dim; the
        per-sample shape still passes ``supports_v3``, so the dispatch in
        ``apply_code`` cannot detect the batching itself."""
        diag, free = decode_code(self.code, self.w, x.dtype)
        return apply_restricted_xla(x, diag, free, self.w, self.periodic)

    def apply_with_dot(self, x):
        """(A x, <x, A x>) — the CG matvec with its curvature reduction
        fused into the same kernel pass on TPU."""
        return apply_code_with_dot(x, self.code, self.w, self.periodic)

    def initial_residual(self, x0_free):
        """r0 for the Krylov solve starting at z = x0_free (on free set)."""
        x_start = self.x_forced + x0_free
        return jnp.where(
            self.free, self.r0_b - self.apply_full(x_start), jnp.zeros((), x0_free.dtype)
        )

    def apply_full(self, x):
        """Like apply() but without zeroing non-free rows' neighbour reads:
        identical expression — apply() already reads neighbours from the full
        array; kept for clarity at call sites."""
        return self.apply(x)

    def assemble_solution(self, z):
        return self.x_forced + jnp.where(self.free, z, jnp.zeros((), z.dtype))

    def astype(self, dtype) -> "StencilSystem":
        """Cast the float fields (for the float32 inner solve of iterative
        refinement); the packed bf16 geometry is dtype-free.  The decoded
        diagonal is a small integer multiple of the stencil weights, exactly
        representable in float32 for unit spacing."""
        return dataclasses.replace(
            self,
            x_forced=self.x_forced.astype(dtype),
            r0_b=self.r0_b.astype(dtype),
            b_norm=self.b_norm.astype(dtype),
        )


def _weights(dx):
    return tuple(1.0 / (float(d) * float(d)) for d in dx)


def make_tortuosity_system(
    active,
    direction: Axis,
    vlo: float,
    vhi: float,
    dx=(1.0, 1.0, 1.0),
    dtype=jnp.float64,
    hi_plane: int | None = None,
) -> StencilSystem:
    """Build the flow-through system for a percolation mask ``active``.

    ``active`` is the double-flood-fill percolation mask (cells of the target
    phase reachable from BOTH inlet and outlet faces,
    ``TortuosityHypre.cpp:526-538``).  Boundary conditions are Dirichlet
    vlo/vhi on the inlet/outlet planes of ``direction`` and no-flux
    elsewhere; the geometry is non-periodic (``Diffusion.cpp:671-677``).

    The initial iterate is the reference's linear ramp restricted to active
    cells (``TortuosityHypreFill.F90:233-262``) — pass
    ``linear_ramp(...)`` based x0 via ``initial_residual``.

    ``hi_plane`` overrides the outlet Dirichlet plane index (default: the
    last plane).  Used when the volume is padded along ``direction`` with
    inactive cells for mesh divisibility: the outlet stays at the original
    domain face, and the padding (all-inactive, hence identity rows never
    referenced by any free row) changes no result.
    """
    periodic = (False, False, False)
    w = _weights(dx)
    active = active.astype(bool)
    shape = active.shape
    n = shape[direction]
    hi = n - 1 if hi_plane is None else int(hi_plane)

    axes = neighbor_count_axes(active, periodic)
    nsum = axes[0] + axes[1] + axes[2]
    # Safety decouple: an active cell with NO active neighbours becomes an
    # identity row with rhs 0 — and this happens BEFORE the Dirichlet
    # overwrite (TortuosityHypreFill.F90:172-181 `cycle`s), so an isolated
    # cell on the inlet plane is decoupled, not forced to vlo.  Such cells
    # are also never referenced by any other row (isolation is mutual), so
    # treating them as inactive is exact.
    connected = active & (nsum > 0)

    idx = jnp.arange(n)
    idx = idx.reshape([-1 if a == direction else 1 for a in range(3)])
    on_lo = (idx == 0) & connected
    on_hi = (idx == hi) & connected
    dirichlet = on_lo | on_hi
    free = connected & ~dirichlet
    code = (pack_code(nsum, free) if uniform_w(w)
            else pack_code_axes(axes, free))

    x_forced = jnp.where(on_lo, dtype(vlo), jnp.zeros(shape, dtype))
    x_forced = jnp.where(on_hi, dtype(vhi), x_forced)

    # rhs of free rows is identically 0 — a 0-d scalar (broadcast in
    # initial_residual) instead of a full volume: at 512^3 the f32 array plus
    # its f64 upcast in the refinement's outer residual cost ~1.6 GiB of HBM
    r0_b = jnp.zeros((), dtype)
    # ||b_full||^2 = vlo^2 * #active(lo plane) + vhi^2 * #active(hi plane)
    n_lo = jnp.sum(on_lo, dtype=dtype)
    n_hi = jnp.sum(on_hi, dtype=dtype)
    b_norm = jnp.sqrt(vlo * vlo * n_lo + vhi * vhi * n_hi)

    return StencilSystem(
        code=code, x_forced=x_forced, r0_b=r0_b, b_norm=b_norm,
        w=w, periodic=periodic,
    )


def make_cell_problem_system(
    active,
    direction_k: Axis,
    dx=(1.0, 1.0, 1.0),
    dtype=jnp.float64,
) -> StencilSystem:
    """Build the periodic homogenisation cell problem for chi_k.

    ``active`` is the plain phase mask (no percolation filter — reference
    ``EffectiveDiffusivityHypre.cpp:213-323``); all axes periodic
    (``HYPRE_StructGridSetPeriodic``, ``EffectiveDiffusivityHypre.cpp:326-399``).
    """
    periodic = (True, True, True)
    w = _weights(dx)
    active = active.astype(bool)
    shape = active.shape

    # diagonal: every face contributes w_f whether or not the neighbour is
    # active (interface faces add to the diagonal only) —
    # EffDiffFillMtx.F90:156-221.  Packed form: total count 6 everywhere
    # (anisotropic: per-axis count 2 each = packed 42); the decoded
    # diagonal is only read under ``free``.
    code_free = 6 if uniform_w(w) else 2 * 16 + 2 * 4 + 2
    code = jnp.where(active, jnp.asarray(code_free, jnp.bfloat16),
                     jnp.asarray(-1, jnp.bfloat16))

    m = active.astype(dtype)
    mp = pad_halo(m, periodic)
    sl = [slice(1, -1)] * 3
    lo_sl, hi_sl = list(sl), list(sl)
    lo_sl[direction_k] = slice(0, -2)
    hi_sl[direction_k] = slice(2, None)
    m_minus = mp[tuple(lo_sl)]
    m_plus = mp[tuple(hi_sl)]

    inv_2d = 1.0 / (2.0 * float(dx[direction_k]))
    inv_d = 1.0 / float(dx[direction_k])
    # rhs = -(D+ - D-)/(2 dx)                     (EffDiffFillMtx.F90:225-232)
    #     + (1 - m_-) / dx  - (1 - m_+) / dx      (interface flux, :156-221)
    rhs = -(m_plus - m_minus) * inv_2d + (1.0 - m_minus) * inv_d - (1.0 - m_plus) * inv_d
    rhs = jnp.where(active, rhs, jnp.zeros((), dtype))

    b_norm = jnp.sqrt(jnp.sum(rhs * rhs))
    return StencilSystem(
        code=code, x_forced=jnp.zeros((), dtype), r0_b=rhs,
        b_norm=b_norm, w=w, periodic=periodic,
    )


def check_operator_properties(system: StencilSystem, active, direction=None) -> dict:
    """Structural verification of the operator, the port of
    ``TortuosityHypre::checkMatrixProperties`` (``TortuosityHypre.cpp:896-982``).

    Checks, on the *full* system reconstructed from the matrix-free form:
    finite coefficients; inactive rows are identity with rhs 0; Dirichlet
    rows identity with rhs vlo/vhi (validated by the caller against
    ``x_forced``); active interior rows have positive diagonal, zero rhs and
    (for the tortuosity operator) zero row sum.  Returns a dict of bools.
    """
    active = active.astype(bool)
    w = system.w
    dtype = system.diag.dtype if hasattr(system.diag, "dtype") else jnp.float64
    degree = weighted_degree(active, w, system.periodic, dtype)
    diag = jnp.broadcast_to(system.diag, active.shape)
    offdiag_sum = -degree  # sum of off-diagonals on active rows
    row_sum = jnp.where(active, diag + offdiag_sum, jnp.zeros((), dtype))

    interior = system.free
    out = {
        "finite": bool(
            jnp.all(jnp.isfinite(diag))
            & jnp.all(jnp.isfinite(system.r0_b))
            & jnp.all(jnp.isfinite(system.x_forced))
        ),
        "diag_positive_on_free": bool(jnp.all(jnp.where(interior, diag > 0, True))),
        "rhs_zero_on_free": True,
        "row_sum": row_sum,
    }
    if not system.periodic[0]:
        # tortuosity operator: zero row sum on active interior rows
        out["rhs_zero_on_free"] = bool(jnp.all(jnp.where(interior, system.r0_b == 0, True)))
        out["row_sum_zero_on_free"] = bool(
            jnp.all(jnp.where(interior, jnp.abs(row_sum) < 1e-12, True))
        )
    return out
