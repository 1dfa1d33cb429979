"""Flow-through tortuosity driver.

TPU-native re-design of ``OpenImpala::TortuosityHypre``
(``src/props/TortuosityHypre.{H,cpp}``):

1. optional remspot filter (``TortuosityHypre.cpp:248-292``, default 0 passes)
2. percolation mask: double flood fill from inlet/outlet faces, AND
   (``:394-558``); active VF = n_active / n_total
3. masked-Laplacian Dirichlet solve, matrix-free (CG + multigrid by default;
   float32 Krylov + float64 iterative refinement on TPU)
4. boundary-flux integration + conservation gate rel_diff <= 1e-6
   (``:794-823``)
5. tau = active_vf / Deff with Deff = (avg|flux|/A)/|grad phi|
   (``:831-877``), NaN/Inf edge-case policy identical to the reference.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.filters import remspot
from ..ops.floodfill import percolation_mask
from ..ops.flux import boundary_fluxes
from ..ops.masks import linear_ramp
from ..ops.stencil import make_tortuosity_system
from ..parallel.mesh import resolve_mesh
from ..solve import warmup
from ..solve.refine import solve_system
from ..utils.common import parse_direction
from ..utils.profiling import phase_timer

TINY_FLUX = 1e-15  # reference tiny_flux_threshold, TortuosityHypre.cpp:64
FLUX_TOL = 1e-6  # reference flux conservation gate, TortuosityHypre.cpp:794


@partial(jax.jit, static_argnames=("direction", "vlo", "vhi", "dx",
                                   "storage", "hi_plane"))
def _build_system(active, direction, vlo, vhi, dx, storage, hi_plane):
    """System + initial guess, jitted so GSPMD propagates the X sharding of
    ``active`` into every derived solver field.  Module-level (not a per-call
    closure) so the trace is cached across driver calls and the warm-up
    thread primes exactly this program."""
    storage = np.dtype(storage).type  # static string key -> callable scalar type
    sys_ = make_tortuosity_system(active, direction, vlo, vhi, dx,
                                  dtype=storage, hi_plane=hi_plane)
    ramp = linear_ramp(active.shape, direction, vlo, vhi, dtype=storage)
    x0 = jnp.where(sys_.free, ramp, jnp.zeros((), storage))
    return sys_, x0


@dataclasses.dataclass
class TortuosityResult:
    value: float  # tau (NaN / Inf per reference edge cases)
    deff: float
    active_vf: float
    flux_in: float
    flux_out: float
    flux_rel_diff: float
    flux_conserved: bool
    iterations: int
    rel_res: float
    converged: bool
    direction: int
    phi: object = None  # potential field (if return_fields)
    active: object = None  # percolation mask (if return_fields)
    # solve.ResidualHistory (if return_history): outer per-round + inner
    # per-chunk residual trace — the structured replacement for scraping
    # verbose output (SURVEY §5)
    history: object = None


def prime_solver(shape, direction, *, vlo: float = -1.0, vhi: float = 1.0,
                 dx=(1.0, 1.0, 1.0), method: str = "cg",
                 precond: str = "auto", precond_opts: dict = None,
                 inner_dtype=jnp.float32, dtype=jnp.float64,
                 eps: float = 1e-9, mesh="auto",
                 percolation_method: str = "auto", extra_dirs=()):
    """Start the background solver warm-up for a flow-through solve of
    ``shape`` along ``direction`` BEFORE the voxel data exists — the CLI
    calls this at reader-METADATA time so solver program compile/load
    overlaps the file read + threshold (the programs depend only on shapes,
    dtypes and static options; solve/warmup.py).  Returns a handle to pass
    as ``tortuosity(..., warm=handle)``, or None when warming cannot pay
    (non-TPU backend, small volume, 1-core host with a host-side fill).

    ``extra_dirs``: further directions the caller will solve after the
    first (CLI ``direction = All``).  Their direction-static executables
    (packed fill + system build) are primed AFTER everything the first
    solve needs, overlapping their tunnel load with the first direction's
    iterations; pass the SAME handle to every ``tortuosity`` call.

    The reference has no counterpart: Hypre setup runs inline after the
    flood fill (``TortuosityHypre.cpp:208-649``).

    MIRROR: the shape/mesh/storage resolution below must match the inline
    block in ``tortuosity()`` — same resolve_mesh padding, same hi_plane
    rule, same device-fill predicate — or the primed programs miss."""
    direction = parse_direction(direction)
    shape = tuple(int(v) for v in shape)
    mesh = resolve_mesh(mesh, shape)
    pad = 0
    hi_plane = None
    if mesh is not None:
        pad = (-shape[0]) % mesh.devices.size
        if pad and direction == 0:
            hi_plane = shape[0] - 1
    solve_shape = (shape[0] + pad,) + tuple(shape[1:])
    storage = dtype if inner_dtype is None else inner_dtype
    from ..ops.floodfill import auto_uses_device_fill

    device_perc = percolation_method == "device" or (
        percolation_method == "auto" and mesh is None
        and auto_uses_device_fill(shape))
    return warmup.maybe_start(
        solve_shape, direction, float(vlo), float(vhi), tuple(dx),
        jnp.dtype(storage).name, hi_plane, mesh, precond, precond_opts,
        method, inner_dtype, dtype, float(eps),
        device_percolation=device_perc,
        # (direction, hi_plane) pairs — on a padded mesh only direction 0
        # pins the outlet plane (same rule as the primary above)
        extra_dirs=tuple(
            (d, shape[0] - 1 if pad and d == 0 else None)
            for d in (parse_direction(e) for e in extra_dirs)),
    )


def tortuosity(
    phase,
    phase_id: int,
    direction,
    vlo: float = -1.0,
    vhi: float = 1.0,
    eps: float = 1e-9,
    maxiter: int = 20000,
    method: str = "cg",
    precond: str = "auto",
    precond_opts: dict = None,
    dx=(1.0, 1.0, 1.0),
    remspot_passes: int = 0,
    percolation_method: str = "auto",
    inner_dtype=jnp.float32,
    dtype=jnp.float64,
    return_fields: bool = False,
    return_history: bool = False,
    verbose: int = 0,
    mesh="auto",
    original_shape=None,
    warm=None,
) -> TortuosityResult:
    """``mesh``: None (single device), a ``jax.sharding.Mesh``, or "auto"
    (shard large volumes along X over all local devices).  The sharded path
    is the TPU-native counterpart of the reference's MPI box decomposition
    (``Diffusion.cpp:266-268`` + ``TortuosityHypre.cpp:584-585``): the solver
    state lives partitioned in HBM and GSPMD inserts the ICI halo exchanges
    and reductions.

    ``phase`` may also be an already-SHARDED ``jax.Array`` (from
    ``io.threshold_sharded`` — the distributed-ingest path): then the
    percolation runs on device (synchronous-dilation flood fill under
    GSPMD) and the volume never touches the host.  Pass the reader's
    ``original_shape`` so the outlet Dirichlet plane and flood-fill seeds
    sit at the original domain face, not the ingest padding.
    """
    direction = parse_direction(direction)
    pre_sharded = (isinstance(phase, jax.Array)
                   and len(getattr(phase.sharding, "device_set", ())) > 1)
    padded_shape = tuple(phase.shape)
    shape = tuple(original_shape) if original_shape else padded_shape

    if remspot_passes > 0:
        if pre_sharded:
            raise NotImplementedError(
                "remspot filtering of a pre-sharded volume is not supported; "
                "apply ops.filters.remspot before ingest"
            )
        with phase_timer("tortuosity/remspot"):
            phase = np.asarray(remspot(jnp.asarray(phase), remspot_passes))

    if pre_sharded:
        # device-resident percolation on the sharded volume: the ingest
        # padding (PAD_FILL cells) is outside every phase, so seeds at the
        # ORIGINAL faces and 6-neighbour dilation leave it inactive.
        from ..ops.floodfill import flood_fill_device, percolation_mask_sharded

        mesh = phase.sharding.mesh
        outlet = shape[direction] - 1  # original domain face
        solve_shape = padded_shape
        storage = dtype if inner_dtype is None else inner_dtype
        with phase_timer("tortuosity/percolation_mask"):
            # fastest path: device-resident packed fill under shard_map —
            # the volume never leaves device memory and the only
            # communication is two (Y, Z) carry planes per X sweep
            from ..ops.packfill import percolation_oneshot_packed_sharded

            res = percolation_oneshot_packed_sharded(
                phase == phase_id, direction, outlet=outlet)
            if res is not None:
                active_j, counts = res
                active_vf = (int(np.asarray(counts).sum(dtype=np.int64))
                             / int(np.prod(shape)))
            # next: per-shard native BFS + boundary-plane exchange on the
            # host (linear work; the dilation below needs O(sum dims)
            # passes)
            elif (res := percolation_mask_sharded(
                    phase, phase_id, direction,
                    original_shape=shape)) is not None:
                active_j, active_vf = res
            else:
                phase_ok = phase == phase_id
                lo_sl = [slice(None)] * 3
                lo_sl[direction] = 0
                hi_sl = [slice(None)] * 3
                hi_sl[direction] = outlet
                seeds_lo = (jnp.zeros(padded_shape, bool)
                            .at[tuple(lo_sl)].set(True))
                seeds_hi = (jnp.zeros(padded_shape, bool)
                            .at[tuple(hi_sl)].set(True))
                reach_in, _ = flood_fill_device(phase_ok, seeds_lo)
                reach_out, _ = flood_fill_device(phase_ok, seeds_hi)
                active_j = reach_in & reach_out
                from ..utils.common import count_true

                active_vf = count_true(active_j) / int(np.prod(shape))
        active = active_j
        # a caller-provided prime_solver handle still gets joined below;
        # the pre-sharded path starts no warm-up of its own
        # X padding only: for direction X the outlet Dirichlet plane must
        # override to the original face; other directions are unpadded
        hi_plane = (outlet if direction == 0 and padded_shape != shape
                    else None)
    else:
        # domain-decomposition geometry depends only on the shape — resolve
        # it up front so the warm-up thread can prime the production solver
        # programs (hierarchy, chunked-CG, outer residual) while the
        # percolation fill runs on the host (solve/warmup.py)
        mesh = resolve_mesh(mesh, shape)
        pad = 0
        hi_plane = None
        if mesh is not None:
            pad = (-shape[0]) % mesh.devices.size
            if pad and direction == 0:
                hi_plane = shape[0] - 1  # outlet stays at the original face
        solve_shape = (shape[0] + pad,) + tuple(shape[1:])
        storage = dtype if inner_dtype is None else inner_dtype
        # percolation_mask's "auto" resolution (single source of truth in
        # ops/floodfill.py): on a single TPU at one-shot scale the fill runs
        # ON DEVICE, so the host core is free (wire waits) and the warm-up
        # pays even on 1-core hosts
        from ..ops.floodfill import auto_uses_device_fill

        device_perc = percolation_method == "device" or (
            percolation_method == "auto" and mesh is None
            and (not isinstance(phase, np.ndarray)  # device arrays: device fill
                 or auto_uses_device_fill(shape)))
        if warm is None:
            # no early handle from prime_solver: start the warm-up now so it
            # overlaps the percolation fill (MIRROR of prime_solver above)
            warm = warmup.maybe_start(
                solve_shape, direction, vlo, vhi, dx,
                jnp.dtype(storage).name, hi_plane, mesh, precond,
                precond_opts, method, inner_dtype, dtype, eps,
                device_percolation=device_perc,
            )

        if warm is not None and device_perc:
            # the warm-up thread primes the fill program first (and sets
            # its event even on failure) — never compile the same program
            # from two threads; over the tunnel a duplicate compile costs
            # seconds of wire time (solve/warmup.py)
            warm.wait_fill(direction)
        with phase_timer("tortuosity/percolation_mask"):
            active, active_vf = percolation_mask(
                phase, phase_id, direction, method=percolation_method
            )

    nanres = TortuosityResult(
        value=math.nan, deff=math.nan, active_vf=active_vf,
        flux_in=0.0, flux_out=0.0, flux_rel_diff=math.nan, flux_conserved=False,
        iterations=0, rel_res=math.nan, converged=False, direction=direction,
    )
    if active_vf <= np.finfo(np.float64).eps:
        # zero percolation: NaN, matching TortuosityHypre.cpp:170-178,764-777
        return nanres

    if not pre_sharded:
        # domain decomposition: pad X with inactive cells to mesh
        # divisibility (identity rows, never referenced — exact), shard
        # every solver field along X.
        from ..ops.masks import upload_mask

        if mesh is not None:
            active_np = np.asarray(active)
            if pad:
                active_np = np.pad(active_np, ((0, pad), (0, 0), (0, 0)))
            # packed-bit transfer: 8x less tunnel traffic than a bool volume
            active_j = upload_mask(active_np, mesh)
            if verbose > 0:
                print(f"  Mesh: {mesh.devices.size} devices, X {shape[0]}->"
                      f"{active_np.shape[0]} (pad {pad})")
        else:
            # no host round-trip when the percolation already ran on device
            # (percolation_method="device" raster fill)
            with phase_timer("tortuosity/mask_upload"):
                active_j = upload_mask(active)

    if warm is not None:
        with phase_timer("tortuosity/warm_join"):
            warm.join()  # never compile the same program from two threads
            # a LATER direction's system-build prime may still be compiling
            # after main_ready (shared direction=All handle) — wait on its
            # dedicated build event here (after percolation, so the fill
            # was never delayed by a build compile it didn't need)
            warm.wait_build(direction)
    with phase_timer("tortuosity/system_setup"):
        system, x0_free = _build_system(
            active_j, direction, float(vlo), float(vhi), tuple(dx),
            jnp.dtype(storage).name, hi_plane,
        )

    hist = None
    if return_history:
        from ..solve.cg import ResidualHistory

        hist = ResidualHistory()
    with phase_timer("tortuosity/solve"):
        x_full, info = solve_system(
            system, x0_free, eps=eps, maxiter=maxiter, method=method, precond=precond,
            inner_dtype=inner_dtype, outer_dtype=dtype, precond_opts=precond_opts,
            verbose=verbose, history=hist,
        )
    if solve_shape != shape:
        # crop the padding back off; all downstream quantities (fluxes,
        # geometry, VF) are defined on the original domain.  ``active`` is
        # what callers see via return_fields — keep it in lockstep with the
        # cropped solution (the pre-sharded path binds it to the padded
        # array above).
        x_full = x_full[: shape[0]]
        active_j = active_j[: shape[0]]
        if pre_sharded:
            active = active_j
    iterations = int(info.iterations)
    rel_res = float(info.rel_res)
    converged = bool(info.converged)
    if verbose > 0:
        print(f"  Solver iterations: {iterations}  rel_res: {rel_res:.3e}  "
              f"converged: {converged}")
    if not converged:
        return dataclasses.replace(
            nanres, iterations=iterations, rel_res=rel_res,
            phi=x_full if return_fields else None,
            active=active if return_fields else None,
            history=hist,
        )

    with phase_timer("tortuosity/flux"):
        flux_in, flux_out = boundary_fluxes(x_full, active_j, direction, dx)
        flux_in, flux_out = float(flux_in), float(flux_out)
    mag_in, mag_out = abs(flux_in), abs(flux_out)
    mag_avg = 0.5 * (mag_in + mag_out)
    if mag_avg > TINY_FLUX:
        rel_diff = abs(mag_in - mag_out) / mag_avg
        flux_conserved = rel_diff <= FLUX_TOL
    else:
        rel_diff, flux_conserved = 0.0, True
    if verbose > 0:
        print(f"  Flux in/out: {flux_in:.8f} / {flux_out:.8f}  "
              f"rel_diff: {rel_diff:.3e}  conserved: {flux_conserved}")

    # geometry: RealBox is [0, N_d * dx_d] per axis (Diffusion.cpp:302-305)
    L = shape[direction] * float(dx[direction])
    others = [a for a in range(3) if a != direction]
    A = (shape[others[0]] * float(dx[others[0]])) * (
        shape[others[1]] * float(dx[others[1]])
    )
    grad_phi = (vhi - vlo) / L

    # tau computation + edge cases (TortuosityHypre.cpp:843-877)
    if not flux_conserved:
        value, deff = math.nan, math.nan
    elif mag_avg < TINY_FLUX:
        value, deff = math.inf, 0.0
    elif abs(grad_phi) < TINY_FLUX:
        value, deff = math.inf, 0.0
    else:
        deff = (mag_avg / A) / abs(grad_phi)
        value = math.inf if abs(deff) < TINY_FLUX else active_vf / deff

    return TortuosityResult(
        value=value, deff=deff, active_vf=active_vf,
        flux_in=flux_in, flux_out=flux_out, flux_rel_diff=rel_diff,
        flux_conserved=flux_conserved, iterations=iterations, rel_res=rel_res,
        converged=converged, direction=direction,
        phi=x_full if return_fields else None,
        active=active if return_fields else None,
        history=hist,
    )
