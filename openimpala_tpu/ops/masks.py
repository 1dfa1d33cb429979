"""Mask and field construction helpers."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def phase_mask(phase, phase_id: int):
    """Boolean mask of cells belonging to ``phase_id``.

    Mirrors the reference's simple active-mask generation for the cell
    problem (``EffectiveDiffusivityHypre.cpp:213-323``) and the D_eff
    integration mask (``Diffusion.cpp:520-530``).
    """
    return phase == phase_id


def pad_volume_to(vol, multiple_x: int, fill=0):
    """Pad the X (leading) axis with inactive cells so it divides the mesh.

    Inactive cells are identity rows in both operators, so appending them
    changes no physics — but note: for the *flow-through* problem the padded
    region must not touch the Dirichlet planes of the solve direction, so
    pad only the X axis and only when X is not the flow direction, or pad
    before mask generation (padding cells are not in any phase id >= 0 when
    ``fill=-1``).
    """
    x = vol.shape[0]
    rem = (-x) % multiple_x
    if rem == 0:
        return vol
    return np.pad(np.asarray(vol), ((0, rem), (0, 0), (0, 0)), constant_values=fill)


def _unpack_bits_impl(p):
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (p[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(p.shape[:-1] + (8 * p.shape[-1],)).astype(bool)


_unpack_bits = None  # jitted lazily (jax import cost at module import)


def upload_mask(mask, mesh=None):
    """Transfer a host boolean volume to device with 8x less traffic: host
    ``np.packbits`` along Z, device-side unpack (one tiny fused program).

    Through the tunnelled TPU runtime a 512^3 bool costs ~134 MB on the
    wire (~2-3 s); the packed form is 16.8 MB.  ``mesh``: optional 1-D
    X-axis mesh — the packed array is placed sharded and the unpack runs
    under GSPMD, so the full-size mask never exists unsharded.  Falls back
    to a plain transfer when Z % 8 != 0 or the input is already on device.
    """
    import jax

    from ..parallel.mesh import shard_volume

    if isinstance(mask, jax.Array):
        return shard_volume(mask, mesh) if mesh is not None else mask
    mask = np.asarray(mask, bool)
    if mask.shape[-1] % 8 != 0:
        arr = jnp.asarray(mask)
        return shard_volume(arr, mesh) if mesh is not None else arr
    packed = np.packbits(mask, axis=-1)
    packed_j = shard_volume(jnp.asarray(packed), mesh) if mesh is not None \
        else jnp.asarray(packed)
    return _unpack(packed_j)


def _unpack_jit():
    """The lazily-jitted unpack program (also AOT-primed by the solver
    warm-up thread, solve/warmup.py)."""
    import jax

    global _unpack_bits
    if _unpack_bits is None:
        _unpack_bits = jax.jit(_unpack_bits_impl)
    return _unpack_bits


def _unpack(packed_j):
    """Device-side MSB-first bit unpack, shared by both upload entry
    points (lazily jitted once per process)."""
    return _unpack_jit()(packed_j)


def upload_phase_mask(phase: np.ndarray, phase_id: int):
    """``phase == phase_id`` on device, bit-packed on the wire: the compare
    and the MSB-first packing run fused in one native C pass when available
    (io/native.py pack_eq), else numpy compare + ``upload_mask``."""
    from ..io import native

    packed = native.pack_eq(np.asarray(phase), phase_id)
    if packed is None:
        return upload_mask(np.asarray(phase) == phase_id)
    return _unpack(jnp.asarray(packed))


def linear_ramp(shape, direction: int, vlo: float, vhi: float, dtype=jnp.float64):
    """The reference's initial guess: linear ramp vlo -> vhi along
    ``direction`` over indices 0..N-1 (``TortuosityHypreFill.F90:233-262``,
    domain_extent = N-1)."""
    n = shape[direction]
    if n > 1:
        ramp = vlo + (vhi - vlo) * jnp.arange(n, dtype=dtype) / (n - 1)
    else:
        ramp = jnp.full((1,), 0.5 * (vlo + vhi), dtype)
    return jnp.broadcast_to(
        ramp.reshape([-1 if a == direction else 1 for a in range(3)]), shape
    ).astype(dtype)
