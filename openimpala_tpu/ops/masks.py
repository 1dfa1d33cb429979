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
