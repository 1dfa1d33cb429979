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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
        diag_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)
    else:
        diag_in = diag.astype(dtype)
        diag_spec = pl.BlockSpec((1, Y, Z), lambda i: (i, 0, 0),
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
        pl.BlockSpec(plane, lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    out, dot = pl.pallas_call(
        kernel,
        grid=(X,),
        in_specs=[
            pl.BlockSpec(plane, lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(plane, lambda i: (i + 1, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(plane, lambda i: (i + 2, 0, 0), memory_space=pltpu.VMEM),
            diag_spec,
            pl.BlockSpec(plane, lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
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
