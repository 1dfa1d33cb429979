"""Homogenised effective-diffusivity tensor driver.

TPU-native re-design of ``OpenImpala::EffectiveDiffusivityHypre``
(``src/props/EffectiveDiffusivityHypre.{H,cpp}``) plus the tensor
integration in the app driver (``Diffusion.cpp:60-167``):

solve the periodic corrector (cell) problems

    div( D grad chi_k ) = -div( D e_k ),   D = 1 in the target phase else 0

for k in {X, Y, Z} with periodic BCs and internal Neumann at pore-solid
interfaces (exact reference discretisation — see
ops/stencil.py::make_cell_problem_system), then volume-average

    D_eff[a][b] = (1/N_total) * sum_active ( delta_ab - d chi_b / d xi_a ).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.flux import deff_integrand_sum
from ..ops.masks import phase_mask
from ..ops.stencil import make_cell_problem_system
from ..parallel.mesh import resolve_mesh
from ..solve.refine import make_precond, solve_system
from ..utils.common import parse_direction


@partial(jax.jit, static_argnames=("k", "dx", "storage"))
def _build_cell_system(active, k, dx, storage):
    """Cell-problem system + zero initial iterate (EffDiffFillMtx.F90:126),
    jitted at module level so GSPMD propagates the X sharding of ``active``
    and the trace/compile is cached across directions and driver calls."""
    storage = np.dtype(storage).type
    return (make_cell_problem_system(active, k, dx, dtype=storage),
            jnp.zeros(active.shape, storage))


def prime_cell_solver(shape, *, dx=(1.0, 1.0, 1.0), method: str = "cg",
                      precond: str = "auto", precond_opts: dict = None,
                      inner_dtype=jnp.float32, dtype=jnp.float64,
                      eps: float = 1e-9, mesh="auto"):
    """Start the background solver warm-up for a homogenization solve of
    ``shape`` BEFORE the voxel data exists — the CLI calls this at reader-
    metadata time so the cell-problem programs (hierarchy, chunked CG or
    lanes, f64 outer residual) compile/load while the file is read
    (solve/warmup.py).  Returns a handle for
    ``effective_diffusivity(..., warm=handle)`` or None.

    MIRROR: the mesh/storage resolution must match effective_diffusivity's
    inline logic (periodic domain: no padding, single-device fallback when
    X does not divide the mesh)."""
    from ..solve import warmup

    shape = tuple(int(v) for v in shape)
    mesh = resolve_mesh(mesh, shape)
    if mesh is not None and shape[0] % mesh.devices.size != 0:
        mesh = None
    storage = dtype if inner_dtype is None else inner_dtype
    return warmup.maybe_start(
        shape, 0, -1.0, 1.0, tuple(dx), jnp.dtype(storage).name, None,
        mesh, precond, precond_opts, method, inner_dtype, dtype,
        float(eps), problem="cell")


@dataclasses.dataclass
class EffectiveDiffusivityResult:
    deff: np.ndarray  # (3,3) tensor, NaN if any solve failed
    converged: bool
    iterations: tuple
    rel_res: tuple
    volume_fraction: float  # active-phase VF (D=1 fraction)
    chi: tuple = None  # (chi_x, chi_y, chi_z) fields if return_fields
    # if return_history: tuple of solve.ResidualHistory — one per direction
    # on the sequential path, a 1-tuple with lane-VECTOR residual entries
    # when the three chi solves ran as lockstep lanes (solve/lanes.py)
    history: tuple = None


def effective_diffusivity(
    phase,
    phase_id: int,
    eps: float = 1e-9,
    maxiter: int = 20000,
    method: str = "cg",
    precond: str = "auto",
    precond_opts: dict = None,
    dx=(1.0, 1.0, 1.0),
    inner_dtype=jnp.float32,
    dtype=jnp.float64,
    return_fields: bool = False,
    return_history: bool = False,
    verbose: int = 0,
    mesh="auto",
    lanes: bool | str = "auto",
    warm=None,
) -> EffectiveDiffusivityResult:
    """``mesh``: None | Mesh | "auto" — domain decomposition along X (see
    ``props.tortuosity``).  The periodic cell problem cannot be padded (a
    padding slab would change the wrap coupling), so sharding requires the
    X extent to divide the mesh; otherwise it falls back to single-device.

    ``phase`` may be a host array or an already-sharded device array (e.g.
    from ``io.threshold_sharded``) — the latter is used as-is, never pulled
    to the host (the distributed-ingest path, SURVEY.md §7.5)."""
    n_total = int(np.prod(phase.shape))
    pre_sharded = (isinstance(phase, jax.Array)
                   and len(getattr(phase.sharding, "device_set", ())) > 1)
    if pre_sharded:
        from ..utils.common import count_true

        active = phase == phase_id
        n_active = count_true(active)
    else:
        active_np = np.asarray(phase) == phase_id
        n_active = int(active_np.sum())
        mesh = resolve_mesh(mesh, phase.shape)
        if mesh is not None and phase.shape[0] % mesh.devices.size != 0:
            # always announce the fallback: a large-volume multi-device user
            # whose X extent doesn't divide the mesh would otherwise get a
            # single-device OOM with no hint (VERDICT r2)
            import sys

            print(
                f"  WARNING: X={phase.shape[0]} not divisible by "
                f"{mesh.devices.size} devices; periodic cell problem cannot "
                "be padded - falling back to single-device (crop X to a "
                "multiple of the device count to shard)", file=sys.stderr)
            mesh = None  # periodic domain: no padding possible
        from ..ops.masks import upload_mask

        if mesh is not None:
            # packed-bit transfer: 8x less tunnel traffic than a bool volume
            active = upload_mask(active_np, mesh)
            if verbose > 0:
                print(f"  Mesh: {mesh.devices.size} devices (X sharding)")
        else:
            active = upload_mask(active_np)
    vf = n_active / n_total

    if n_active == 0:
        # zero-active shortcut: chi = 0, converged
        # (EffectiveDiffusivityHypre.cpp:558-570)
        zeros = jnp.zeros(phase.shape, dtype)
        chis = (zeros, zeros, zeros)
        deff = np.zeros((3, 3))
        return EffectiveDiffusivityResult(
            deff=deff, converged=True, iterations=(0, 0, 0), rel_res=(0.0, 0.0, 0.0),
            volume_fraction=0.0, chi=chis if return_fields else None,
        )

    storage = dtype if inner_dtype is None else inner_dtype

    if warm is not None:
        warm.join()  # never compile the same program from two threads

    # lockstep lanes: the operator is k-independent, so the three chi
    # solves can advance as lanes of ONE program — every chunk dispatch,
    # outer-residual measurement and host round-trip is paid once instead
    # of three times (solve/lanes.py).  Gated by the per-device HBM model:
    # on a mesh the (L, X, Y, Z) lane state is X-sharded (lane axis
    # replicated), so the need divides by the device count and a sharded
    # 1024^3 homogenization rides one lockstep solve instead of three
    # sequential sharded ones (VERDICT r4 #3); everything else keeps the
    # sequential loop below.
    from ..solve.lanes import use_lanes

    n_dev = max(1, len(getattr(active.sharding, "device_set", (1,))))
    want_lanes = (lanes is True) or (lanes == "auto" and use_lanes(
        n_total, 3, method,
        inner_bytes=jnp.dtype(inner_dtype or dtype).itemsize,
        outer_bytes=jnp.dtype(dtype).itemsize,
        n_devices=n_dev))
    if (method in ("cg", "pcg") and inner_dtype is not None and want_lanes):
        from ..solve.lanes import LaneSystem, solve_system_lanes

        if verbose > 0:
            print("  lockstep lanes: 3 cell problems as one program")
        systems = [_build_cell_system(active, k, tuple(dx),
                                      jnp.dtype(storage).name)[0]
                   for k in range(3)]
        lsys = LaneSystem.from_systems(systems)
        lane_hist = None
        if return_history:
            from ..solve.cg import ResidualHistory

            lane_hist = ResidualHistory()
        x_full, info = solve_system_lanes(
            lsys, eps=eps, maxiter=maxiter, precond=precond,
            inner_dtype=inner_dtype, outer_dtype=dtype,
            precond_opts=precond_opts, verbose=verbose, history=lane_hist)
        iters = tuple(int(v) for v in np.asarray(info.iterations))
        rels = tuple(float(v) for v in np.asarray(info.rel_res))
        convs = tuple(bool(v) for v in np.asarray(info.converged))
        chis = [x_full[k] for k in range(3)]
        if verbose > 0:
            for k in range(3):
                print(f"  chi_{'xyz'[k]}: iters={iters[k]} "
                      f"rel_res={rels[k]:.3e} converged={convs[k]}")
        converged = all(convs)
        if converged:
            deff = np.asarray(deff_tensor(chis[0], chis[1], chis[2], active,
                                          dx, n_total=n_total))
        else:
            deff = np.full((3, 3), math.nan)
        return EffectiveDiffusivityResult(
            deff=deff, converged=converged, iterations=iters,
            rel_res=rels, volume_fraction=vf,
            chi=tuple(chis) if return_fields else None,
            history=(lane_hist,) if return_history else None,
        )

    chis, iters, rels, convs, hists = [], [], [], [], []
    M = None
    for k in range(3):
        system, x0 = _build_cell_system(active, k, tuple(dx),
                                        jnp.dtype(storage).name)
        if M is None:
            # the cell-problem OPERATOR is k-independent — only the RHS
            # carries the direction (ops/stencil.py make_cell_problem_system)
            # — so the preconditioner hierarchy builds once and is shared by
            # all three chi solves
            M = make_precond(system, precond, precond_opts, method)
        hist_k = None
        if return_history:
            from ..solve.cg import ResidualHistory

            hist_k = ResidualHistory()
        hists.append(hist_k)
        chi_k, info = solve_system(
            system, x0, eps=eps, maxiter=maxiter, method=method, precond=M,
            inner_dtype=inner_dtype, outer_dtype=dtype, precond_opts=precond_opts,
            verbose=verbose, history=hist_k,
        )
        chis.append(chi_k)
        iters.append(int(info.iterations))
        rels.append(float(info.rel_res))
        convs.append(bool(info.converged))
        if verbose > 0:
            print(f"  chi_{'xyz'[k]}: iters={iters[-1]} rel_res={rels[-1]:.3e} "
                  f"converged={convs[-1]}")

    converged = all(convs)
    if converged:
        deff = np.asarray(
            deff_tensor(chis[0], chis[1], chis[2], active, dx, n_total=n_total)
        )
    else:
        deff = np.full((3, 3), math.nan)

    return EffectiveDiffusivityResult(
        deff=deff, converged=converged, iterations=tuple(iters),
        rel_res=tuple(rels), volume_fraction=vf,
        chi=tuple(chis) if return_fields else None,
        history=tuple(hists) if return_history else None,
    )


def deff_tensor(chi_x, chi_y, chi_z, active, dx=(1.0, 1.0, 1.0), n_total=None):
    """D_eff from solved corrector fields — ``Diffusion.cpp:60-167``.

    The sum is over active cells; the divisor is the TOTAL domain cell count
    (``Diffusion.cpp:152-158``), not the active count.
    """
    if n_total is None:
        n_total = int(np.prod(active.shape))
    s = deff_integrand_sum(chi_x, chi_y, chi_z, active, dx)
    return s / n_total
