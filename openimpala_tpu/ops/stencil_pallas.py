"""Pallas TPU kernel for the masked 7-point stencil matvec.

The Krylov hot loop is bandwidth-bound; this kernel streams the volume
plane-by-plane through VMEM so each cell's compulsory traffic is
x + diag + mask + out, with the X-neighbour planes supplied as extra
pipelined views (the Pallas grid pipelines the DMAs automatically).  The
in-plane (Y, Z) neighbour shifts run on the VPU via ``pltpu.roll`` with
boundary-column masking (zero for clamped axes, wrap for periodic).

Layout contract: the volume is (X, Y, Z) with Y a multiple of 8 (sublanes)
and Z a multiple of 128 (lanes), float32.  ``apply_restricted`` in
ops/stencil.py dispatches here automatically on TPU when the contract holds;
the XLA path is the reference implementation and serves every other case.

The kernel optionally fuses the ``<p, Ap>`` reduction of the CG iteration
into the same pass (``stencil_matvec_pallas(..., with_dot=True)``) — the
accumulator lives in SMEM and exploits the sequential TPU grid.
"""

from __future__ import annotations

import functools
import sys

import jax

# deep trace stacks (jit -> pallas_call -> run_scoped -> fori -> cond) can
# exceed CPython's default recursion limit while tracing the v2 kernel
sys.setrecursionlimit(max(sys.getrecursionlimit(), 10000))
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

# index-map constants must be int32: bare 0 literals trace to i64 under x64
# mode and Mosaic rejects the index function signature.
_I0 = np.int32(0)


def _shift_plane(x, axis: int, shift: int, periodic: bool):
    """Value of the neighbour at ``-shift`` along ``axis`` (plane coords):
    out[i] = x[i + shift] with zero (clamped) or wrapped boundary."""
    n_ax = x.shape[axis]
    # shift operand must be int32 (x64 mode would make a bare int an i64)
    amount = jnp.asarray((-shift) % n_ax, jnp.int32)
    rolled = pltpu.roll(x, amount, axis=axis)  # out[i] = x[i+shift]
    if periodic:
        return rolled
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if shift > 0:  # out[i] = x[i+1]: last index has no neighbour
        valid = idx < n - shift
    else:  # out[i] = x[i-1]: first index has no neighbour
        valid = idx >= -shift
    return jnp.where(valid, rolled, jnp.zeros((), x.dtype))


def _matvec_kernel(xlo_ref, xmid_ref, xhi_ref, diag_ref, free_ref, out_ref,
                   acc_ref, *, w, periodic_yz, with_dot, diag_scalar):
    xm = xmid_ref[0]
    nbr = w[0] * (xlo_ref[0] + xhi_ref[0])
    nbr += w[1] * (_shift_plane(xm, 0, -1, periodic_yz[0])
                   + _shift_plane(xm, 0, 1, periodic_yz[0]))
    nbr += w[2] * (_shift_plane(xm, 1, -1, periodic_yz[1])
                   + _shift_plane(xm, 1, 1, periodic_yz[1]))
    free = free_ref[0] != 0
    diag = diag_ref[0, 0] if diag_scalar else diag_ref[0]
    plane = jnp.where(free, diag * xm - nbr, jnp.zeros((), xm.dtype))
    out_ref[0] = plane
    if with_dot:
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[0, 0] = jnp.zeros((), jnp.float32)

        acc_ref[0, 0] += jnp.sum(plane * xm)


def supports(shape, dtype, periodic) -> bool:
    """Layout contract for the TPU kernel."""
    if jax.default_backend() != "tpu":
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    X, Y, Z = shape
    return Y % 8 == 0 and Z % 128 == 0 and X >= 2


@functools.partial(jax.jit, static_argnames=("w", "periodic", "with_dot", "interpret"))
def stencil_matvec_pallas(x, diag, free, w, periodic, with_dot=False,
                          interpret=False):
    """free ? diag*x - sum_f w_f x_nbr : 0, with optional fused <x, Ax>.

    ``diag`` must be broadcastable to ``x`` (full array or scalar);
    ``free`` is any integer/bool mask.  Returns ``out`` or ``(out, dot)``.
    """
    X, Y, Z = x.shape
    dtype = x.dtype
    # X-axis halo: two extra planes, zero (clamped) or wrapped (periodic)
    xp = jnp.pad(x, ((1, 1), (0, 0), (0, 0)),
                 mode="wrap" if periodic[0] else "constant")
    diag_scalar = jnp.ndim(diag) == 0
    if diag_scalar:
        diag_in = jnp.reshape(diag, (1, 1)).astype(dtype)
        diag_spec = pl.BlockSpec((1, 1), lambda i: (_I0, _I0),
                                 memory_space=pltpu.SMEM)
    else:
        diag_in = diag.astype(dtype)
        diag_spec = pl.BlockSpec((1, Y, Z), lambda i: (i, _I0, _I0),
                                 memory_space=pltpu.VMEM)
    free8 = free.astype(jnp.int8)

    plane = (1, Y, Z)
    kernel = functools.partial(
        _matvec_kernel, w=tuple(float(v) for v in w),
        periodic_yz=(periodic[1], periodic[2]), with_dot=with_dot,
        diag_scalar=diag_scalar,
    )
    out_shapes = [jax.ShapeDtypeStruct((X, Y, Z), dtype),
                  jax.ShapeDtypeStruct((1, 1), jnp.float32)]
    out_specs = [
        pl.BlockSpec(plane, lambda i: (i, _I0, _I0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (_I0, _I0), memory_space=pltpu.SMEM),
    ]
    out, dot = pl.pallas_call(
        kernel,
        grid=(X,),
        in_specs=[
            pl.BlockSpec(plane, lambda i: (i, _I0, _I0), memory_space=pltpu.VMEM),
            pl.BlockSpec(plane, lambda i: (i + _I0 + 1, _I0, _I0), memory_space=pltpu.VMEM),
            pl.BlockSpec(plane, lambda i: (i + _I0 + 2, _I0, _I0), memory_space=pltpu.VMEM),
            diag_spec,
            pl.BlockSpec(plane, lambda i: (i, _I0, _I0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shapes,
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=10 * X * Y * Z,
            bytes_accessed=(3 * 4 + 4 + 1 + 4) * X * Y * Z,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, xp, xp, diag_in, free8)
    if with_dot:
        return out, dot[0, 0]
    return out


# ---------------------------------------------------------------------------
# v2: rolling-window kernel with manual double-buffered DMA.  The v1 kernel
# above fetches three x-planes per grid step (the lo/mid/hi views), so x is
# read ~3x from HBM.  Here a single kernel invocation streams the volume
# once: a 4-slot VMEM ring holds the x window, 2-slot rings stage diag/free
# in and out planes, and DMAs are double-buffered against compute, bringing
# traffic down to the compulsory 13 B/cell.
# ---------------------------------------------------------------------------


def _matvec_kernel_v2(xp_ref, diag_ref, free_ref, out_ref, *, w, periodic_yz,
                      n_planes, xr, dr):
    def body(xbuf, dbuf, fbuf, obuf, xsem, dsem, fsem, osem):
        def i32(v):
            # all ref indices must be int32 under x64 mode (Mosaic constraint)
            if isinstance(v, int):
                return np.int32(v)
            return v

        def fetch_x(k, slot):
            return pltpu.make_async_copy(xp_ref.at[i32(k)], xbuf.at[i32(slot)],
                                         xsem.at[i32(slot)])

        def fetch_d(k, slot):
            return pltpu.make_async_copy(diag_ref.at[i32(k)], dbuf.at[i32(slot)],
                                         dsem.at[i32(slot)])

        def fetch_f(k, slot):
            return pltpu.make_async_copy(free_ref.at[i32(k)], fbuf.at[i32(slot)],
                                         fsem.at[i32(slot)])

        def put_out(k, slot):
            return pltpu.make_async_copy(obuf.at[i32(slot)], out_ref.at[i32(k)],
                                         osem.at[i32(slot)])

        # prologue: fill the x ring (window + prefetch depth) and the first
        # few diag/free planes
        for kk in range(min(xr - 1, n_planes + 2)):
            fetch_x(kk, kk).start()
        for kk in range(min(dr - 1, n_planes)):
            fetch_d(kk, kk).start()
            fetch_f(kk, kk).start()
        fetch_x(0, 0).wait()
        fetch_x(1, 1).wait()

        # NB: all index arithmetic via lax with np.int32 constants — jnp
        # operator dispatch on tracers inside the pallas/run_scoped/fori
        # trace stack hits a dtype-promotion recursion bug under x64 mode.
        lax = jax.lax
        c = np.int32

        def loop(k, carry):
            kp1 = lax.add(k, c(1))
            kp2 = lax.add(k, c(2))
            kpxr = lax.add(k, c(xr - 1))
            kpdr = lax.add(k, c(dr - 1))
            s_kx = lax.rem(k, c(xr))
            s_k1_x = lax.rem(kp1, c(xr))
            s_k2_x = lax.rem(kp2, c(xr))
            s_kxr = lax.rem(kpxr, c(xr))
            s_kd = lax.rem(k, c(dr))
            s_kdr = lax.rem(kpdr, c(dr))

            # prefetch xr-3 planes ahead of the window tail (ring xr, window
            # 3), dr-1 ahead for d/f — strictly inside the ring so no in-use
            # slot is overwritten
            @pl.when(lax.lt(kpxr, c(n_planes + 2)))
            def _():
                fetch_x(kpxr, s_kxr).start()

            @pl.when(lax.lt(kpdr, c(n_planes)))
            def _():
                fetch_d(kpdr, s_kdr).start()
                fetch_f(kpdr, s_kdr).start()

            # wait for the newest window plane + this step's diag/free
            fetch_x(kp2, s_k2_x).wait()
            fetch_d(k, s_kd).wait()
            fetch_f(k, s_kd).wait()
            # the out slot we are about to overwrite must have drained
            @pl.when(lax.ge(k, c(dr)))
            def _():
                put_out(lax.sub(k, c(dr)), s_kd).wait()

            xlo = xbuf[s_kx]
            xm = xbuf[s_k1_x]
            xhi = xbuf[s_k2_x]
            nbr = w[0] * (xlo + xhi)
            nbr += w[1] * (_shift_plane(xm, 0, -1, periodic_yz[0])
                           + _shift_plane(xm, 0, 1, periodic_yz[0]))
            nbr += w[2] * (_shift_plane(xm, 1, -1, periodic_yz[1])
                           + _shift_plane(xm, 1, 1, periodic_yz[1]))
            free = fbuf[s_kd] != 0
            obuf[s_kd] = jnp.where(free, dbuf[s_kd] * xm - nbr,
                                   jnp.zeros((), xm.dtype))
            put_out(k, s_kd).start()
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_planes), loop,
                          jnp.int32(0), unroll=False)
        # epilogue: drain the last output DMAs still in flight
        for back in range(1, min(dr, n_planes) + 1):
            kk = n_planes - back
            put_out(kk, kk % dr).wait()

    Y, Z = xp_ref.shape[1], xp_ref.shape[2]
    dtype = xp_ref.dtype
    pl.run_scoped(
        body,
        xbuf=pltpu.VMEM((xr, Y, Z), dtype),
        dbuf=pltpu.VMEM((dr, Y, Z), dtype),
        fbuf=pltpu.VMEM((dr, Y, Z), jnp.int8),
        obuf=pltpu.VMEM((dr, Y, Z), dtype),
        xsem=pltpu.SemaphoreType.DMA((xr,)),
        dsem=pltpu.SemaphoreType.DMA((dr,)),
        fsem=pltpu.SemaphoreType.DMA((dr,)),
        osem=pltpu.SemaphoreType.DMA((dr,)),
    )


def _rings_for(plane_bytes: int):
    """(x_ring, df/out_ring) slot counts: deep prefetch for small planes
    (latency-bound), shallow for large planes (VMEM-bound)."""
    for xr, dr in ((8, 4), (6, 3), (5, 2), (4, 2)):
        vmem = (xr + 2 * dr) * plane_bytes + dr * (plane_bytes // 4)
        if vmem < 11 * 1024 * 1024:
            return xr, dr
    return None


def supports_v2(shape, dtype) -> bool:
    X, Y, Z = shape
    rings = _rings_for(Y * Z * 4)
    return rings is not None and X >= rings[0]


@functools.partial(jax.jit, static_argnames=("w", "periodic", "interpret"))
def stencil_matvec_pallas_v2(x, diag, free, w, periodic, interpret=False):
    X, Y, Z = x.shape
    dtype = x.dtype
    xp = jnp.pad(x, ((1, 1), (0, 0), (0, 0)),
                 mode="wrap" if periodic[0] else "constant")
    diag_full = jnp.broadcast_to(jnp.asarray(diag, dtype), x.shape)
    free8 = free.astype(jnp.int8)
    xr, dr = _rings_for(Y * Z * 4)
    kernel = functools.partial(
        _matvec_kernel_v2, w=tuple(float(v) for v in w),
        periodic_yz=(periodic[1], periodic[2]), n_planes=X, xr=xr, dr=dr,
    )
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=jax.ShapeDtypeStruct((X, Y, Z), dtype),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=10 * X * Y * Z,
            bytes_accessed=13 * X * Y * Z,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, diag_full, free8)


# ---------------------------------------------------------------------------
# v3: one rolling-window engine, three fused ops.  The MG-PCG iteration's HBM
# traffic is dominated not by the CG matvec but by the V-cycle's fine-level
# smoothing + residual (BASELINE.md), which round 1 left on the ~120 GB/s XLA
# path.  This engine streams the volume once per op with manual
# double-buffered DMA (same scheme as v2) and fuses, per mode:
#
#   matvec : out = free ? diag*x - sum_f w_f x_nbr : 0      [+ optional <x,Ax>
#            accumulated in-kernel -> fuses CG's p.Ap reduction into the pass]
#   resid  : out = free ? r - (diag*x - sum w x_nbr) : 0    [V-cycle residual]
#   sweep  : out = x + omega/diag * (r - (diag*x - sum w x_nbr)) on
#            free & diag>0, else x                          [damped Jacobi]
#
# Streamed inputs: x (4-slot window ring), and for resid/sweep an r ring,
# plus diag/free rings; outputs double-buffered.  Compulsory traffic:
# 13 B/cell (matvec) / 17 B/cell (resid, sweep).
# ---------------------------------------------------------------------------


def _yz_neighbor_sum(xm, w, periodic_yz):
    return (w[1] * (_shift_plane(xm, 0, -1, periodic_yz[0])
                    + _shift_plane(xm, 0, 1, periodic_yz[0]))
            + w[2] * (_shift_plane(xm, 1, -1, periodic_yz[1])
                      + _shift_plane(xm, 1, 1, periodic_yz[1])))


def _fused_kernel_v3(*refs, w, periodic_x, periodic_yz, n_planes, xr, dr,
                     mode, omega, with_dot, aniso):
    # x_ref holds the UNPADDED volume: the X halo is handled in-kernel
    # (wrap-indexed fetches on periodic X, zero-filled window slots on
    # clamped X) — the jnp.pad copy this replaces cost ~8 B/cell per call.
    #
    # code_ref packs the operator's static geometry per cell in one bf16
    # signed count (free ? n_active_neighbours : -1; anisotropic spacing
    # packs the per-axis counts as cx*16+cy*4+cz — ops/stencil.py).  The
    # diagonal is decoded in-kernel (w * count, or the per-axis unpack) —
    # the f32 diag + int8 free streams this replaces cost 5 B/cell of HBM
    # traffic; the packed code costs 2.
    sz_ref = None
    if mode == "matvec":
        (x_ref, code_ref), out_refs = refs[:2], refs[2:]
        r_ref = None
    elif mode == "restrict":
        # resid + full 2x2x2 block-sum restriction in one pass: the output
        # is the COARSE residual (X/2, Y/2, Z/2).  Y pairs via sublane
        # reshape-sum, Z (lane) pairs via a small MXU matmul with the
        # (Z, Z/2) pair-selection matrix, X pairs by accumulating plane
        # pairs in the output ring.
        (x_ref, r_ref, code_ref, sz_ref), out_refs = refs[:4], refs[4:]
    else:
        (x_ref, r_ref, code_ref), out_refs = refs[:3], refs[3:]
    out_ref = out_refs[0]
    acc_ref = out_refs[1] if with_dot else None

    def body(xbuf, rbuf, cbuf, obuf, xsem, rsem, csem, osem):
        def i32(v):
            return np.int32(v) if isinstance(v, int) else v

        def fetch(src, dst, sem, k, slot):
            return pltpu.make_async_copy(src.at[i32(k)], dst.at[i32(slot)],
                                         sem.at[i32(slot)])

        def put_out(k, slot):
            return pltpu.make_async_copy(obuf.at[i32(slot)], out_ref.at[i32(k)],
                                         osem.at[i32(slot)])

        lax = jax.lax
        c = np.int32
        n = n_planes

        # window plane j in [-1, n]: slot (j+1) % xr
        def xslot(j):
            return lax.rem(lax.add(j, c(1)), c(xr)) if not isinstance(j, int) \
                else np.int32((j + 1) % xr)

        def start_x(j, slot):
            """Begin making window plane j available in ``slot``."""
            if isinstance(j, int):  # prologue: static index
                if periodic_x:
                    fetch(x_ref, xbuf, xsem, (j + n) % n, slot).start()
                elif 0 <= j < n:
                    fetch(x_ref, xbuf, xsem, j, slot).start()
                else:
                    xbuf[i32(slot)] = jnp.zeros(xbuf.shape[1:], xbuf.dtype)
                return
            if periodic_x:
                src = lax.rem(lax.add(j, c(n)), c(n))
                fetch(x_ref, xbuf, xsem, src, slot).start()
            else:
                in_r = lax.lt(j, c(n))  # in-loop j is always >= 1

                @pl.when(in_r)
                def _():
                    fetch(x_ref, xbuf, xsem, j, slot).start()

                @pl.when(jnp.logical_not(in_r))
                def _():
                    xbuf[slot] = jnp.zeros(xbuf.shape[1:], xbuf.dtype)

        def wait_x(j, slot):
            if isinstance(j, int):
                if periodic_x or 0 <= j < n:
                    fetch(x_ref, xbuf, xsem, 0, slot).wait()
                return
            if periodic_x:
                fetch(x_ref, xbuf, xsem, 0, slot).wait()
            else:
                @pl.when(lax.lt(j, c(n)))
                def _():
                    fetch(x_ref, xbuf, xsem, 0, slot).wait()

        has_r = r_ref is not None
        # prologue: window planes -1 .. xr-3, streamed planes 0 .. dr-2
        for jj in range(-1, min(xr - 2, n + 1)):
            start_x(jj, (jj + 1) % xr)
        for kk in range(min(dr - 1, n)):
            fetch(code_ref, cbuf, csem, kk, kk).start()
            if has_r:
                fetch(r_ref, rbuf, rsem, kk, kk).start()
        wait_x(-1, 0)
        wait_x(0, 1)

        def loop(k, acc):
            kp1 = lax.add(k, c(1))
            jpre = lax.add(k, c(xr - 2))  # window prefetch index
            kpdr = lax.add(k, c(dr - 1))
            s_lo = xslot(lax.sub(k, c(1)))
            s_mid = xslot(k)
            s_hi = xslot(kp1)
            s_pre = xslot(jpre)
            s_kd = lax.rem(k, c(dr))
            s_kdr = lax.rem(kpdr, c(dr))

            @pl.when(lax.le(jpre, c(n)))
            def _():
                start_x(jpre, s_pre)

            @pl.when(lax.lt(kpdr, c(n)))
            def _():
                fetch(code_ref, cbuf, csem, kpdr, s_kdr).start()
                if has_r:
                    fetch(r_ref, rbuf, rsem, kpdr, s_kdr).start()

            wait_x(kp1, s_hi)
            fetch(code_ref, cbuf, csem, k, s_kd).wait()
            if has_r:
                fetch(r_ref, rbuf, rsem, k, s_kd).wait()

            if mode != "restrict":
                @pl.when(lax.ge(k, c(dr)))
                def _():
                    put_out(lax.sub(k, c(dr)), s_kd).wait()

            xlo = xbuf[s_lo]
            xm = xbuf[s_mid]
            xhi = xbuf[s_hi]
            # signed-count decode (ops/stencil.py pack_code): code > 0 on
            # free rows carrying the neighbour count, -1 elsewhere.  The
            # bf16 stream extends to f32 natively; everything after is
            # plain f32 VPU work (int8 variants do not lower — see
            # ops/stencil.py module comment).
            cf = cbuf[s_kd].astype(xm.dtype)
            free = cf > 0
            ft = xm.dtype.type
            if aniso:
                # per-axis unpack (pack_code_axes): cx*16 + cy*4 + cz with
                # counts 0..2 — exact f32 arithmetic (power-of-two scales,
                # small integers); diag = w0*cx + w1*cy + w2*cz
                cc = jnp.maximum(cf, 0)
                cx = jnp.floor(cc * ft(0.0625))
                rem = cc - cx * ft(16)
                cy = jnp.floor(rem * ft(0.25))
                cz = rem - cy * ft(4)
                d = ft(w[0]) * cx + ft(w[1]) * cy + ft(w[2]) * cz
            else:
                d = jnp.maximum(cf, 0) * ft(w[0])
            ax = d * xm - (w[0] * (xlo + xhi)
                           + _yz_neighbor_sum(xm, w, periodic_yz))
            zero = jnp.zeros((), xm.dtype)
            if mode == "matvec":
                plane = jnp.where(free, ax, zero)
            elif mode in ("resid", "restrict"):
                plane = jnp.where(free, rbuf[s_kd] - ax, zero)
            else:  # sweep
                inv_d = jnp.where(free & (d > 0),
                                  omega / jnp.where(d > 0, d, 1.0), zero)
                plane = xm + inv_d * (rbuf[s_kd] - ax)

            if mode == "restrict":
                Y = plane.shape[0]
                py = plane.reshape(Y // 2, 2, -1).sum(axis=1)  # Y pairs
                pyz = jax.lax.dot(py, sz_ref[...],  # Z pairs on the MXU
                                  preferred_element_type=jnp.float32)
                kh = lax.div(k, c(2))
                s_out = lax.rem(kh, c(dr))
                even = lax.rem(k, c(2)) == 0

                @pl.when(even & lax.ge(kh, c(dr)))
                def _():  # slot about to be re-initialised: drain its put
                    put_out(lax.sub(kh, c(dr)), s_out).wait()

                @pl.when(even)
                def _():
                    obuf[s_out] = pyz

                @pl.when(jnp.logical_not(even))
                def _():
                    obuf[s_out] = obuf[s_out] + pyz
                    put_out(kh, s_out).start()
            else:
                obuf[s_kd] = plane
                put_out(k, s_kd).start()
                if with_dot:
                    acc = acc + jnp.sum(plane * xm, dtype=jnp.float32)
            return acc

        acc = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), loop,
                                jnp.zeros((), jnp.float32), unroll=False)
        if with_dot:
            acc_ref[0, 0] = acc
        n_out = n // 2 if mode == "restrict" else n
        for back in range(1, min(dr, n_out) + 1):
            kk = n_out - back
            put_out(kk, kk % dr).wait()

    Y, Z = x_ref.shape[1], x_ref.shape[2]
    dtype = x_ref.dtype
    r_slots = dr if r_ref is not None else 1  # dummy min ring when unused
    oshape = (dr, Y // 2, Z // 2) if mode == "restrict" else (dr, Y, Z)
    pl.run_scoped(
        body,
        xbuf=pltpu.VMEM((xr, Y, Z), dtype),
        rbuf=pltpu.VMEM((r_slots, Y, Z), dtype),
        cbuf=pltpu.VMEM((dr, Y, Z), jnp.bfloat16),
        obuf=pltpu.VMEM(oshape, dtype),
        xsem=pltpu.SemaphoreType.DMA((xr,)),
        rsem=pltpu.SemaphoreType.DMA((r_slots,)),
        csem=pltpu.SemaphoreType.DMA((dr,)),
        osem=pltpu.SemaphoreType.DMA((dr,)),
    )


def _rings_for_v3(plane_bytes: int, has_r: bool):
    """Ring sizes fitting the v3 VMEM budget (one extra ring when r streams)."""
    for xr, dr in ((8, 4), (6, 3), (5, 2), (4, 2)):
        n_f32_rings = 1 + (1 if has_r else 0)  # out (+ r), each dr slots
        # + the packed bf16 code ring (plane_bytes/2 per slot)
        vmem = (xr + n_f32_rings * dr) * plane_bytes + dr * (plane_bytes // 2)
        # NB a v5e core has 128 MB of VMEM, but raising this budget to 24 MB
        # (deeper rings for the r-streaming modes) was measured NOT to help:
        # matvec 2.95 -> 3.07 ms, sweep 3.6 -> 3.7 ms at 512^3 — the ring
        # depth is not what separates the r-modes from the matvec.  Keep 11.
        if vmem < 11 * 1024 * 1024:
            return xr, dr
    return None


def supports_v3(shape, dtype, has_r: bool, restrict_: bool = False) -> bool:
    if jax.default_backend() != "tpu" or jnp.dtype(dtype) != jnp.float32:
        return False
    X, Y, Z = shape
    if Y % 8 != 0 or Z % 128 != 0:
        return False
    if restrict_ and (X % 2 or Y % 16 or Z % 256):
        return False  # coarse output plane must itself be (8, 128)-tileable
    rings = _rings_for_v3(Y * Z * 4, has_r)
    return rings is not None and X >= rings[0]


# ---------------------------------------------------------------------------
# Conductance-level kernel: the coarse Galerkin operators are variable-
# coefficient 7-point stencils  A x = diag*x - sum_f c_f x_nbr  with per-face
# conductances (cx, cy, cz) — see solve/preconditioners.py ConductanceLevel.
# Same rolling-window scheme as v3; every X fetch is wrap-indexed because
# clamped axes carry ZERO wrap conductances by construction (the wrapped x
# value is multiplied by 0), so no boundary zero-fill is needed at all.
# ---------------------------------------------------------------------------


def _cond_kernel(x_ref, cx_ref, cy_ref, cz_ref, d_ref, *rest, n_planes, xr,
                 dr, mode, omega):
    if mode == "sweep":
        r_ref, out_ref = rest
    else:
        (out_ref,) = rest
        r_ref = None

    def body(xbuf, cxbuf, cybuf, czbuf, dbuf, rbuf, obuf,
             xsem, cxsem, cysem, czsem, dsem, rsem, osem):
        def i32(v):
            return np.int32(v) if isinstance(v, int) else v

        def fetch(src, dst, sem, k, slot):
            return pltpu.make_async_copy(src.at[i32(k)], dst.at[i32(slot)],
                                         sem.at[i32(slot)])

        def put_out(k, slot):
            return pltpu.make_async_copy(obuf.at[i32(slot)], out_ref.at[i32(k)],
                                         osem.at[i32(slot)])

        lax = jax.lax
        c = np.int32
        n = n_planes
        has_r = r_ref is not None

        def wrap(j):
            if isinstance(j, int):
                return (j + n) % n
            return lax.rem(lax.add(j, c(n)), c(n))

        def wslot(j):
            if isinstance(j, int):
                return (j + 1) % xr
            return lax.rem(lax.add(j, c(1)), c(xr))

        # prologue: x and cx window planes -1 .. xr-3; streams 0 .. dr-2
        for jj in range(-1, min(xr - 2, n + 1)):
            fetch(x_ref, xbuf, xsem, wrap(jj), (jj + 1) % xr).start()
            fetch(cx_ref, cxbuf, cxsem, wrap(jj), (jj + 1) % xr).start()
        for kk in range(min(dr - 1, n)):
            fetch(cy_ref, cybuf, cysem, kk, kk).start()
            fetch(cz_ref, czbuf, czsem, kk, kk).start()
            fetch(d_ref, dbuf, dsem, kk, kk).start()
            if has_r:
                fetch(r_ref, rbuf, rsem, kk, kk).start()
        fetch(x_ref, xbuf, xsem, 0, 0).wait()
        fetch(cx_ref, cxbuf, cxsem, 0, 0).wait()
        fetch(x_ref, xbuf, xsem, 0, 1).wait()
        fetch(cx_ref, cxbuf, cxsem, 0, 1).wait()

        def loop(k, carry):
            kp1 = lax.add(k, c(1))
            jpre = lax.add(k, c(xr - 2))
            kpdr = lax.add(k, c(dr - 1))
            s_lo, s_mid, s_hi = wslot(lax.sub(k, c(1))), wslot(k), wslot(kp1)
            s_pre = wslot(jpre)
            s_kd = lax.rem(k, c(dr))
            s_kdr = lax.rem(kpdr, c(dr))

            @pl.when(lax.le(jpre, c(n)))
            def _():
                fetch(x_ref, xbuf, xsem, wrap(jpre), s_pre).start()
                fetch(cx_ref, cxbuf, cxsem, wrap(jpre), s_pre).start()

            @pl.when(lax.lt(kpdr, c(n)))
            def _():
                fetch(cy_ref, cybuf, cysem, kpdr, s_kdr).start()
                fetch(cz_ref, czbuf, czsem, kpdr, s_kdr).start()
                fetch(d_ref, dbuf, dsem, kpdr, s_kdr).start()
                if has_r:
                    fetch(r_ref, rbuf, rsem, kpdr, s_kdr).start()

            fetch(x_ref, xbuf, xsem, 0, s_hi).wait()
            fetch(cx_ref, cxbuf, cxsem, 0, s_hi).wait()
            fetch(cy_ref, cybuf, cysem, 0, s_kd).wait()
            fetch(cz_ref, czbuf, czsem, 0, s_kd).wait()
            fetch(d_ref, dbuf, dsem, 0, s_kd).wait()
            if has_r:
                fetch(r_ref, rbuf, rsem, 0, s_kd).wait()

            @pl.when(lax.ge(k, c(dr)))
            def _():
                put_out(lax.sub(k, c(dr)), s_kd).wait()

            xm = xbuf[s_mid]
            d = dbuf[s_kd]
            cy = cybuf[s_kd]
            cz = czbuf[s_kd]
            nbr = cxbuf[s_mid] * xbuf[s_hi] + cxbuf[s_lo] * xbuf[s_lo]
            nbr += cy * _shift_plane(xm, 0, 1, True)
            nbr += _shift_plane(cy * xm, 0, -1, True)
            nbr += cz * _shift_plane(xm, 1, 1, True)
            nbr += _shift_plane(cz * xm, 1, -1, True)
            free = d > 0
            zero = jnp.zeros((), xm.dtype)
            ax = d * xm - nbr
            if mode == "matvec":
                plane = jnp.where(free, ax, zero)
            else:  # sweep
                inv_d = jnp.where(free, omega / jnp.where(free, d, 1.0), zero)
                plane = xm + inv_d * (rbuf[s_kd] - ax)
            obuf[s_kd] = plane
            put_out(k, s_kd).start()
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), loop, jnp.int32(0),
                          unroll=False)
        for back in range(1, min(dr, n) + 1):
            kk = n - back
            put_out(kk, kk % dr).wait()

    Y, Z = x_ref.shape[1], x_ref.shape[2]
    dtype = x_ref.dtype
    r_slots = dr if mode == "sweep" else 1
    pl.run_scoped(
        body,
        xbuf=pltpu.VMEM((xr, Y, Z), dtype),
        cxbuf=pltpu.VMEM((xr, Y, Z), dtype),
        cybuf=pltpu.VMEM((dr, Y, Z), dtype),
        czbuf=pltpu.VMEM((dr, Y, Z), dtype),
        dbuf=pltpu.VMEM((dr, Y, Z), dtype),
        rbuf=pltpu.VMEM((r_slots, Y, Z), dtype),
        obuf=pltpu.VMEM((dr, Y, Z), dtype),
        xsem=pltpu.SemaphoreType.DMA((xr,)),
        cxsem=pltpu.SemaphoreType.DMA((xr,)),
        cysem=pltpu.SemaphoreType.DMA((dr,)),
        czsem=pltpu.SemaphoreType.DMA((dr,)),
        dsem=pltpu.SemaphoreType.DMA((dr,)),
        rsem=pltpu.SemaphoreType.DMA((r_slots,)),
        osem=pltpu.SemaphoreType.DMA((dr,)),
    )


def _cond_rings(plane_bytes: int, has_r: bool):
    for xr, dr in ((6, 3), (5, 2), (4, 2)):
        n_dr = 4 + (1 if has_r else 0)  # cy, cz, d, out (+ r)
        if (2 * xr + n_dr * dr) * plane_bytes < 11 * 1024 * 1024:
            return xr, dr
    return None


def supports_cond(shape, dtype, has_r: bool) -> bool:
    if jax.default_backend() != "tpu" or jnp.dtype(dtype) != jnp.float32:
        return False
    X, Y, Z = shape
    if Y % 8 != 0 or Z % 128 != 0:
        return False
    rings = _cond_rings(Y * Z * 4, has_r)
    return rings is not None and X >= rings[0]


@functools.partial(jax.jit, static_argnames=("mode", "omega", "interpret"))
def fused_conductance_pallas(mode, x, r, cx, cy, cz, diag, omega: float = 0.9,
                             interpret: bool = False):
    """Conductance-operator kernel: mode in {"matvec", "sweep"}."""
    X, Y, Z = x.shape
    has_r = mode == "sweep"
    xr, dr = _cond_rings(Y * Z * 4, has_r)
    kernel = functools.partial(_cond_kernel, n_planes=X, xr=xr, dr=dr,
                               mode=mode, omega=float(omega))
    inputs = [x, cx, cy, cz, diag] + ([r] if has_r else [])
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(inputs),
        out_shape=jax.ShapeDtypeStruct((X, Y, Z), x.dtype),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=16 * X * Y * Z,
            bytes_accessed=(24 + (4 if has_r else 0)) * X * Y * Z,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)


@functools.partial(jax.jit, static_argnames=("mode", "w", "periodic", "omega",
                                             "with_dot", "interpret"))
def fused_stencil_pallas(mode, x, r, code, w, periodic,
                         omega: float = 0.9, with_dot: bool = False,
                         interpret: bool = False):
    """Run the v3 engine: mode in {"matvec", "resid", "sweep", "restrict"}.

    ``x`` is the windowed field (p for matvec, the iterate for sweep/resid);
    ``r`` the streamed right-hand side (ignored for matvec, pass None);
    ``code`` the packed bf16 geometry (ops/stencil.py pack_code /
    pack_code_axes, selected by the static weight tuple) — the kernel
    decodes the diagonal in-register (w * count, or the per-axis unpack
    for anisotropic spacing), so no f32 diagonal or separate free mask
    ever crosses HBM.  Returns out, or (out, dot) when ``with_dot``
    (matvec).
    """
    X, Y, Z = x.shape
    dtype = x.dtype
    code16 = code.astype(jnp.bfloat16)
    has_r = mode != "matvec"
    xr, dr = _rings_for_v3(Y * Z * 4, has_r)
    kernel = functools.partial(
        _fused_kernel_v3, w=tuple(float(v) for v in w),
        periodic_x=bool(periodic[0]),
        periodic_yz=(periodic[1], periodic[2]), n_planes=X, xr=xr, dr=dr,
        mode=mode, omega=float(omega), with_dot=with_dot,
        aniso=not (w[0] == w[1] == w[2]),
    )
    out_dims = (X // 2, Y // 2, Z // 2) if mode == "restrict" else (X, Y, Z)
    out_shape = [jax.ShapeDtypeStruct(out_dims, dtype)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if with_dot:
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    bytes_cell = 10 + (4 if has_r else 0)
    inputs = [x, r, code16] if has_r else [x, code16]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * len(inputs)
    if mode == "restrict":
        # (Z, Z/2) lane-pair selection matrix for the in-kernel Z block-sum
        sz = jnp.zeros((Z, Z // 2), dtype).at[
            jnp.arange(Z), jnp.arange(Z) // 2].set(1.0)
        inputs.append(sz)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=(10 + (2 if has_r else 0)) * X * Y * Z,
            bytes_accessed=bytes_cell * X * Y * Z,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
    if with_dot:
        return out[0], out[1][0, 0]
    return out[0]
