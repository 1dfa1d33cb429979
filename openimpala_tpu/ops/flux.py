"""Boundary-flux integration and D_eff tensor integrand.

Replaces ``TortuosityHypre::global_fluxes`` (``TortuosityHypre.cpp:1000-1134``)
and ``calculate_Deff_tensor_homogenization`` (``Diffusion.cpp:60-167``) with
device-side reductions.

All public entry points here are jitted module-level programs: the drivers
call them on MESH-SHARDED arrays, and an eager (op-by-op) reduction over a
sharded array dispatches a tiny all-reduce program per op — measured to
deadlock XLA:CPU's in-process rendezvous on a 1-core host (round-3
dryrun_multichip debugging) and to waste dispatches on TPU.  One jitted
program per physics quantity is both the robust and the fast shape.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..parallel.halo import pad_halo


def _plane(x, axis, index):
    sl = [slice(None)] * x.ndim
    sl[axis] = index
    return x[tuple(sl)]


@partial(jax.jit, static_argnames=("direction", "dx"))
def _boundary_fluxes(phi, active, direction: int, dx):
    a = active.astype(bool)
    d = float(dx[direction])

    phi_lo, phi_lo_in = _plane(phi, direction, 0), _plane(phi, direction, 1)
    m_lo = _plane(a, direction, 0) & _plane(a, direction, 1)
    flux_in = jnp.sum(jnp.where(m_lo, -(phi_lo_in - phi_lo) / d, 0.0))

    phi_hi, phi_hi_in = _plane(phi, direction, -1), _plane(phi, direction, -2)
    m_hi = _plane(a, direction, -1) & _plane(a, direction, -2)
    flux_out = jnp.sum(jnp.where(m_hi, -(phi_hi - phi_hi_in) / d, 0.0))

    others = [ax for ax in range(3) if ax != direction]
    face_area_element = float(dx[others[0]]) * float(dx[others[1]])
    return flux_in * face_area_element, flux_out * face_area_element


def boundary_fluxes(phi, active, direction: int, dx=(1.0, 1.0, 1.0)):
    """(flux_in, flux_out) at the lo/hi domain faces of ``direction``.

    Reference semantics (``TortuosityHypre.cpp:1066-1104``): at the lo face,
    for each *active* boundary cell whose inward neighbour is also active,
    flux = -(phi_inner - phi_boundary)/dx, summed; mirrored at the hi face
    (flux = -(phi_boundary - phi_inner)/dx); each scaled by the face-area
    element dy*dz (``:1123-1133``).  Sums are taken in the dtype of ``phi``
    (use float64 for the 1e-6 conservation gate).
    """
    return _boundary_fluxes(phi, active, int(direction),
                            tuple(float(d) for d in dx))


@partial(jax.jit, static_argnames=("direction",))
def _face_counts(active, direction: int):
    a = active.astype(bool)
    return (jnp.sum(_plane(a, direction, 0), dtype=jnp.int32),
            jnp.sum(_plane(a, direction, -1), dtype=jnp.int32))


def active_boundary_counts(active, direction: int):
    """Number of active cells on the lo/hi faces (``TortuosityHypre.cpp:1039-1040``)."""
    lo, hi = _face_counts(active, int(direction))
    return int(lo), int(hi)


def _central_grad(chi_p, axis, inv_2d):
    """Central difference of a periodic-padded field along ``axis``."""
    sl_lo = [slice(1, -1)] * 3
    sl_hi = [slice(1, -1)] * 3
    sl_lo[axis] = slice(0, -2)
    sl_hi[axis] = slice(2, None)
    return (chi_p[tuple(sl_hi)] - chi_p[tuple(sl_lo)]) * inv_2d


@partial(jax.jit, static_argnames=("dx",))
def _deff_integrand_sum(chi_x, chi_y, chi_z, active, dx):
    a = active.astype(bool)
    periodic = (True, True, True)
    inv2 = [1.0 / (2.0 * float(d)) for d in dx]
    chis = [pad_halo(c, periodic) for c in (chi_x, chi_y, chi_z)]

    n_active = jnp.sum(a, dtype=chi_x.dtype)
    rows = []
    for axis_a in range(3):
        row = []
        for b in range(3):
            grad = _central_grad(chis[b], axis_a, inv2[axis_a])
            s = jnp.sum(jnp.where(a, -grad, 0.0))
            if axis_a == b:
                s = s + n_active
            row.append(s)
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def deff_integrand_sum(chi_x, chi_y, chi_z, active, dx=(1.0, 1.0, 1.0)):
    """Raw 3x3 sums of the homogenisation integrand over active cells:

        S_ab = sum_{active} (delta_ab - d(chi_b)/d(xi_a))

    with central differences on periodically ghost-filled chi fields
    (``Diffusion.cpp:98-142``; chi MultiFabs carry 1 periodic ghost).
    Returns a (3, 3) array in the dtype of the chi fields.  Divide by the
    TOTAL number of domain cells (not active cells) for D_eff
    (``Diffusion.cpp:152-158``).
    """
    return _deff_integrand_sum(chi_x, chi_y, chi_z, active,
                               tuple(float(d) for d in dx))
