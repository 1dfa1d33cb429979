"""Explicit baseline tortuosity solver (FTCS pseudo-time relaxation).

Faithful re-design of ``OpenImpala::TortuosityDirect``
(``src/props/TortuosityDirect.{H,cpp}`` + ``Tortuosity_poisson_3d.F90`` +
``Tortuosity_filcc.F90``) — the reference keeps it as a baseline, not wired
into the app (``TortuosityDirect.H:30-33``).  One jitted ``while_loop``:

* cell types: free = (phase == id) (``tortuosity_filct``)
* IC: linear ramp on free cells, 0 elsewhere (``tortuosity_filic``)
* ghost fill: ``ext_dir`` vlo/vhi on the flow-direction faces,
  ``reflect_even`` on side walls (``TortuosityDirect.cpp:397-408``).  Note
  the reference fills ALL components with vlo/vhi at ext_dir faces —
  including the cell-type component (``tortuosity_filbc`` loops n=1..ncomp),
  so the inlet ghost cell type is ``nint(vlo)`` — we replicate this quirk.
* face fluxes: zero if either adjacent cell type is blocked
  (``tortuosity_poisson_flux``)
* forward-Euler update phi += dt*div(F), dt = 0.5*min(dx^2)/(2*SPACEDIM)
  (``TortuosityDirect.cpp:160-164``)
* stop when L1 |phi_new - phi_old| over free cells < eps, checked every
  ``plot_interval`` steps (``TortuosityDirect.cpp:172-200, 367-392``)
* tau = vf / rel_diff with the reference's PLACEHOLDER vf = 1.0
  (``TortuosityDirect.cpp:129``), rel_diff = -avg_flux_density * L / dV —
  replicated verbatim so results match the reference baseline.

Known reference quirks replicated deliberately (this solver is a baseline):
the ghost cell-type at the ext_dir faces is ``nint(vlo)``/``nint(vhi)``, so
``vlo = 0`` BLOCKS the inlet (cell_type_blocked == 0); and the face flux is
``+d(phi)/dx`` (no minus), so with vlo < vhi the returned tau is NEGATIVE
(the reference warns "Calculated negative tortuosity" and returns it,
``TortuosityDirect.cpp:143-146``).  Full-pore discrete value: -(N+1)/N
(Dirichlet values live in the ghost cells, giving N+1 gradient spacings).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.common import parse_direction

CT_BLOCKED = 0  # Tortuosity_filcc.F90:15-16
CT_FREE = 1


@dataclasses.dataclass
class TortuosityDirectResult:
    value: float
    flux_in: float
    flux_out: float
    iterations: int
    residual: float
    converged: bool
    phi: object = None


def _ghost_pad(phi, ct, direction, vlo, vhi):
    """Pad with the reference BC ghost values: ext_dir vlo/vhi along
    ``direction`` (phi AND ct — the filbc quirk), reflect_even elsewhere."""
    dtype = phi.dtype
    for ax in range(3):
        width = [(0, 0)] * 3
        width[ax] = (1, 1)
        if ax == direction:
            phi = jnp.pad(phi, width, mode="constant")
            ct = jnp.pad(ct, width, mode="constant")
            sl_lo = [slice(None)] * 3
            sl_lo[ax] = 0
            sl_hi = [slice(None)] * 3
            sl_hi[ax] = -1
            phi = phi.at[tuple(sl_lo)].set(jnp.asarray(vlo, dtype))
            phi = phi.at[tuple(sl_hi)].set(jnp.asarray(vhi, dtype))
            ct = ct.at[tuple(sl_lo)].set(int(round(vlo)))
            ct = ct.at[tuple(sl_hi)].set(int(round(vhi)))
        else:
            phi = jnp.pad(phi, width, mode="edge")  # reflect_even
            ct = jnp.pad(ct, width, mode="edge")
    return phi, ct


def _face_fluxes(phi_p, ct_p, dxinv):
    """Face-centred fluxes fx/fy/fz (N+1 faces per axis), zeroed where either
    adjacent cell is blocked (``tortuosity_poisson_flux``)."""
    fluxes = []
    for ax in range(3):
        hi_sl = [slice(1, -1)] * 3
        lo_sl = [slice(1, -1)] * 3
        hi_sl[ax] = slice(1, None)
        lo_sl[ax] = slice(0, -1)
        d = dxinv[ax] * (phi_p[tuple(hi_sl)] - phi_p[tuple(lo_sl)])
        blocked = (ct_p[tuple(hi_sl)] == CT_BLOCKED) | (ct_p[tuple(lo_sl)] == CT_BLOCKED)
        fluxes.append(jnp.where(blocked, jnp.zeros((), d.dtype), d))
    return fluxes


def _divergence(fluxes, dxinv, dt):
    out = 0.0
    for ax, f in enumerate(fluxes):
        hi_sl = [slice(None)] * 3
        lo_sl = [slice(None)] * 3
        hi_sl[ax] = slice(1, None)
        lo_sl[ax] = slice(0, -1)
        out = out + dt * dxinv[ax] * (f[tuple(hi_sl)] - f[tuple(lo_sl)])
    return out


@partial(jax.jit, static_argnames=("direction", "n_steps", "plot_interval",
                                   "vlo", "vhi"))
def _solve_loop(free, phi0, direction, vlo, vhi, dxinv, dt, eps, n_steps, plot_interval):
    ct = jnp.where(free, CT_FREE, CT_BLOCKED).astype(jnp.int8)

    def step(phi):
        phi_p, ct_p = _ghost_pad(phi, ct, direction, vlo, vhi)
        fluxes = _face_fluxes(phi_p, ct_p, dxinv)
        return phi + _divergence(fluxes, dxinv, dt), fluxes

    interval = max(1, plot_interval)

    def cond(state):
        phi, it, res, done = state
        return (~done) & (it < n_steps)

    def body(state):
        phi, it, res, done = state

        def inner(i, p):
            return step(p)[0]

        phi_new = jax.lax.fori_loop(0, interval, inner, phi)
        # residual compares the last two iterates (L1 over free cells)
        phi_prev = step(phi_new)[0]  # one more step to measure delta
        res = jnp.sum(jnp.where(free, jnp.abs(phi_prev - phi_new), 0.0))
        return phi_prev, it + interval + 1, res, res < eps

    state = (phi0, jnp.array(0, jnp.int32), jnp.asarray(jnp.inf, phi0.dtype), jnp.array(False))
    phi, it, res, done = jax.lax.while_loop(cond, body, state)

    # final fluxes + boundary flux sums (tortuosity_poisson_fio: sum the
    # lo/hi face fluxes of the flow direction over the domain face)
    phi_p, ct_p = _ghost_pad(phi, ct, direction, vlo, vhi)
    fluxes = _face_fluxes(phi_p, ct_p, dxinv)
    f = fluxes[direction]
    sl_lo = [slice(None)] * 3
    sl_lo[direction] = 0
    sl_hi = [slice(None)] * 3
    sl_hi[direction] = -1
    flux_in = jnp.sum(f[tuple(sl_lo)])
    flux_out = jnp.sum(f[tuple(sl_hi)])
    return phi, it, res, done, flux_in, flux_out


def tortuosity_direct(
    phase,
    phase_id: int,
    direction,
    vlo: float = -1.0,
    vhi: float = 1.0,
    eps: float = 1e-6,
    n_steps: int = 100000,
    plot_interval: int = 100,
    dx=(1.0, 1.0, 1.0),
    dtype=jnp.float64,
    return_fields: bool = False,
) -> TortuosityDirectResult:
    direction = parse_direction(direction)
    phase_j = jnp.asarray(np.asarray(phase))
    free = phase_j == phase_id
    shape = phase_j.shape

    n = shape[direction]
    extent = n - 1
    coord = jnp.arange(n, dtype=dtype)
    factor = 0.0 if extent == 0 else 1.0 / extent
    ramp = vlo + coord * factor * (vhi - vlo)
    ramp = ramp.reshape([-1 if a == direction else 1 for a in range(3)])
    phi0 = jnp.where(free, jnp.broadcast_to(ramp, shape).astype(dtype), 0.0)

    dxinv = jnp.asarray([1.0 / d for d in dx], dtype)
    min_dx_sq = min(float(d) * float(d) for d in dx)
    dt = 0.5 * min_dx_sq / (2.0 * 3)  # TortuosityDirect.cpp:164

    phi, it, res, done, flux_in, flux_out = _solve_loop(
        free, phi0, direction, float(vlo), float(vhi), dxinv,
        jnp.asarray(dt, dtype), jnp.asarray(eps, dtype), int(n_steps),
        int(plot_interval),
    )

    if not bool(done):
        return TortuosityDirectResult(
            value=math.nan, flux_in=float(flux_in), flux_out=float(flux_out),
            iterations=int(it), residual=float(res), converged=False,
            phi=phi if return_fields else None,
        )

    fx = 0.5 * (float(flux_in) + float(flux_out))
    others = [a for a in range(3) if a != direction]
    area = shape[others[0]] * shape[others[1]]  # cell counts (TortuosityDirect.cpp:108-113)
    avg_flux_density = fx / area
    tol = 1e-15
    if abs(avg_flux_density) < tol:
        value = math.inf
    else:
        vf = 1.0  # reference placeholder, TortuosityDirect.cpp:129
        length = shape[direction] * float(dx[direction])
        dv = vhi - vlo
        if abs(dv) < tol or length <= 0:
            value = math.nan
        else:
            rel_diff = -avg_flux_density * length / dv
            value = math.inf if abs(rel_diff) < tol else vf / rel_diff

    return TortuosityDirectResult(
        value=value, flux_in=float(flux_in), flux_out=float(flux_out),
        iterations=int(it), residual=float(res), converged=True,
        phi=phi if return_fields else None,
    )
