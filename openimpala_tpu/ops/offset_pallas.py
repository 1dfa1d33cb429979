"""Pallas TPU kernel for variable-coefficient offset stencils.

The SA-MG coarse operators (``solve/sa.py OffsetLevel``) are probed Galerkin
stencils  (A x)(i) = sum_t c_t(i) x(i + o_t)  with 27-125 offsets.  The XLA
roll path materialises one full-plane temporary per offset, so a level-1
apply at 256^3 streams ~200+ B/cell; measured, that makes the SA V-cycle
161 ms at 512^3 — 4x the Galerkin-PC cycle, wiping out SA's 2.3x iteration
win.  This kernel makes the coarse apply compulsory-traffic bound:

* coefficients are PACKED as one (X, T, Y, Z) array (bf16 on TPU) and
  streamed tile-by-tile: T*2 B/cell, read exactly once;
* x is read as 2R+1 pipelined plane views of the wrap-padded volume
  ((2R+1)*4 B/cell — the coefficient stream dominates, so the v1-style
  multi-view read costs little and keeps the kernel simple);
* the Y/Z offset shifts are in-register lane/sublane rotations
  (``pltpu.roll``), never HBM traffic.

ALL reads wrap.  Probing the true operator guarantees a zero coefficient
wherever an offset crosses a clamped boundary, so wrapped values are always
multiplied by zero — the same argument the XLA ``jnp.roll`` path relies on
(sa.py ``_shift``).

Offsets are ordered NEAREST-NEIGHBOUR PREFIX FIRST ((0,0,0) at t=0, then
the rest of the l_inf<=1 ball, then the wider taps): the filtered smoother
(``apply_sub`` with the 27-point subset) then reads a contiguous leading
block of the packed array, which the BlockSpec fetches without copying the
unused taps.

Modes (one kernel body, mirroring ops/stencil_pallas.py's fused modes):
  apply : out = A x
  resid : out = r - A x
  sweep : out = x + omega/diag * (r - A x)   on diag > 0, else x

Reference counterpart: the coarse-grid operators Hypre assembles inside
BoomerAMG/SMG (used via ``TortuosityHypre.cpp:671-678``); the packed-stream
kernel design is original to this framework.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil_pallas import _I0, _shift_plane

# VMEM budget for the double-buffered coefficient block + x planes + out.
# The Mosaic scoped-vmem default is 16 MB — too small for a double-buffered
# 33-tap f32 coefficient block at 256^2 planes (17.8 MB, measured OOM); the
# pallas_call raises the limit to _VMEM_LIMIT (a v5e core has 128 MB).
_VMEM_BUDGET = 56 * 1024 * 1024
_VMEM_LIMIT = 64 * 1024 * 1024


def order_offsets(offsets):
    """Canonical packing order: (0,0,0) first, then the rest of the
    l_inf<=1 ball, then wider taps.  Returns (ordered_offsets, nn_count)."""
    offsets = list(offsets)
    centre = [(0, 0, 0)] if (0, 0, 0) in offsets else []
    nn = sorted(o for o in offsets
                if max(abs(c) for c in o) <= 1 and o != (0, 0, 0))
    far = sorted(o for o in offsets if max(abs(c) for c in o) > 1)
    ordered = tuple(centre + nn + far)
    return ordered, len(centre) + len(nn)


def _vmem_bytes(n_taps, R, Y, Z, cbytes):
    plane = Y * Z
    # double-buffered coeff block + (2R+3) x planes (window + pipeline) +
    # 2 out (+2 r) planes, all f32 except the coeff stream
    return (2 * n_taps * plane * cbytes + (2 * R + 3) * plane * 4
            + 4 * plane * 4)


def supports(shape, n_taps, R, dtype, cdtype) -> bool:
    """Layout contract (same spirit as stencil_pallas.supports)."""
    if jax.default_backend() != "tpu":
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    X, Y, Z = shape
    if Y % 8 != 0 or Z % 128 != 0:
        return False
    if X < 2 * R + 1:
        return False  # wrap window would alias planes
    cbytes = jnp.dtype(cdtype).itemsize
    return _vmem_bytes(n_taps, R, Y, Z, cbytes) <= _VMEM_BUDGET


def _offset_kernel(*refs, offsets, R, mode, omega):
    nwin = 2 * R + 1
    xwin = refs[:nwin]
    c_ref = refs[nwin]
    if mode in ("resid", "sweep"):
        r_ref, out_ref = refs[nwin + 1], refs[nwin + 2]
    else:
        r_ref, out_ref = None, refs[nwin + 1]

    xm = xwin[R][0]
    dtype = xm.dtype
    acc = jnp.zeros_like(xm)
    for t, (dx, dy, dz) in enumerate(offsets):
        plane = xwin[dx + R][0]
        if dy:
            plane = _shift_plane(plane, 0, dy, True)
        if dz:
            plane = _shift_plane(plane, 1, dz, True)
        acc = acc + c_ref[0, t].astype(dtype) * plane

    if mode == "apply":
        out_ref[0] = acc
        return
    d = c_ref[0, offsets.index((0, 0, 0))].astype(dtype)
    if mode == "resid":
        # free-set-masked residual, free == diag > 0 (sa.py OffsetLevel)
        out_ref[0] = jnp.where(d > 0, r_ref[0] - acc, jnp.zeros((), dtype))
    else:  # sweep
        inv_d = jnp.where(d > 0,
                          jnp.asarray(omega, dtype)
                          / jnp.where(d > 0, d, jnp.ones((), dtype)),
                          jnp.zeros((), dtype))
        out_ref[0] = xm + inv_d * (r_ref[0] - acc)


@functools.partial(jax.jit,
                   static_argnames=("offsets", "n_taps", "mode", "omega",
                                    "interpret"))
def offset_stencil_pallas(x, packed, offsets, n_taps=None, mode="apply",
                          r=None, omega=0.9, interpret=False):
    """``packed``: (X, T, Y, Z) coefficients in ``order_offsets`` order.

    ``offsets``: the FULL ordered offset tuple matching ``packed``;
    ``n_taps``: use only the first n taps (the NN-prefix subset for the
    filtered smoother) — the coefficient BlockSpec then fetches only the
    leading (n_taps, Y, Z) block of each plane.
    """
    X, Y, Z = x.shape
    dtype = x.dtype
    T = packed.shape[1]
    if n_taps is None:
        n_taps = T
    used = tuple(offsets[:n_taps])
    R = max(abs(o[0]) for o in used)

    xp = jnp.pad(x, ((R, R), (0, 0), (0, 0)), mode="wrap") if R else x
    plane = (1, Y, Z)

    def xspec(dx):
        return pl.BlockSpec(plane,
                            lambda i, dx=np.int32(dx + R): (i + dx, _I0, _I0),
                            memory_space=pltpu.VMEM)

    in_specs = [xspec(dx) for dx in range(-R, R + 1)]
    in_specs.append(pl.BlockSpec((1, n_taps, Y, Z),
                                 lambda i: (i, _I0, _I0, _I0),
                                 memory_space=pltpu.VMEM))
    operands = [xp] * (2 * R + 1) + [packed]
    if mode in ("resid", "sweep"):
        in_specs.append(pl.BlockSpec(plane, lambda i: (i, _I0, _I0),
                                     memory_space=pltpu.VMEM))
        operands.append(r)

    kernel = functools.partial(_offset_kernel, offsets=used, R=R, mode=mode,
                               omega=float(omega))
    cbytes = jnp.dtype(packed.dtype).itemsize
    return pl.pallas_call(
        kernel,
        grid=(X,),
        in_specs=in_specs,
        out_shape=jax.ShapeDtypeStruct((X, Y, Z), dtype),
        out_specs=pl.BlockSpec(plane, lambda i: (i, _I0, _I0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_taps * X * Y * Z,
            bytes_accessed=(n_taps * cbytes + (2 * R + 1) * 4 + 4
                            + (4 if mode != "apply" else 0)) * X * Y * Z,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)
