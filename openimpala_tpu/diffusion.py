"""Diffusion app driver — the CLI surface of the framework.

Usage:  ``python -m openimpala_tpu.diffusion <inputs-file> [key=value ...]``

Mirrors the reference executable (``src/props/Diffusion.cpp:171-752``):
reader dispatch by extension -> threshold to a binary phase volume ->
optional REV study -> full-domain calculation:

* ``calculation_method = homogenization`` (default): chi_x/y/z periodic cell
  problems -> D_eff tensor printed (``Diffusion.cpp:511-590``);
* ``calculation_method = flow_through``: volume fraction + TortuosityHypre
  per requested direction -> results.txt (``Diffusion.cpp:591-733``).

Console surface matches the reference's: volume fraction, per-direction
tau, D_eff tensor rows, and the total runtime line
(``Diffusion.cpp:737-740``).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

from .config import DiffusionConfig, ParmParse, resolve_solver, solver_notice
from .io.writers import read_any, write_results_txt, write_volume_hdf5_xdmf
from .props.effective_diffusivity import effective_diffusivity
from .props.rev import rev_study
from .props.tortuosity import tortuosity
from .props.volume_fraction import volume_fraction
from .utils.common import DIRECTIONS


def _reader(cfg: DiffusionConfig):
    path = os.path.join(cfg.data_path, cfg.filename)
    raw_dims = None
    if cfg.raw_width and cfg.raw_height and cfg.raw_depth:
        raw_dims = (cfg.raw_width, cfg.raw_height, cfg.raw_depth)
    return read_any(path, hdf5_dataset=cfg.hdf5_dataset, raw_dims=raw_dims,
                    raw_dtype=cfg.raw_datatype)


def load_phase(cfg: DiffusionConfig) -> np.ndarray:
    # like the app driver: threshold maps > thr -> 1, else 0; phase_id then
    # selects which binary value to analyse (Diffusion.cpp:255-261)
    return _reader(cfg).threshold(cfg.threshold_val, 1, 0)


def load_phase_sharded(cfg: DiffusionConfig, allow_pad: bool = False):
    """Distributed ingest: per-device reader slabs placed directly into
    sharded device memory (io/ingest.py).  Returns ``(arr, orig_shape)``,
    or None when ingest does not apply (single device, or — for the
    periodic cell problem, which cannot be padded — X not mesh-divisible;
    the flow-through path passes ``allow_pad=True``)."""
    import jax

    from .io.ingest import threshold_sharded
    from .parallel.mesh import make_mesh

    if len(jax.devices()) <= 1:
        return None
    reader = _reader(cfg)
    mesh = make_mesh()
    if not allow_pad and reader.shape[0] % mesh.devices.size != 0:
        return None
    # box_size is the reference's decomposition-granularity knob
    # (Diffusion.cpp:209,266-268 — max_grid_size of the BoxArray); our
    # decomposition is device-count driven, so it maps to the analogous
    # granularity we do control: the Z-slab streaming chunk of the
    # distributed ingest (io/ingest.py threshold_sharded).
    return threshold_sharded(reader, cfg.threshold_val, mesh,
                             chunk=max(8, cfg.box_size))


def parse_directions(s: str):
    s = s.upper()
    if "ALL" in s:
        return [0, 1, 2]
    return [DIRECTIONS[t] for t in s.split() if t in DIRECTIONS]


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("usage: python -m openimpala_tpu.diffusion <inputs-file> [key=value ...]",
              file=sys.stderr)
        return 2
    t_start = time.perf_counter()

    pp = ParmParse.from_file(argv[0], overrides=argv[1:])
    cfg = DiffusionConfig.from_parmparse(pp)
    os.makedirs(cfg.results_path, exist_ok=True)
    method = resolve_solver(cfg.solver_type)
    inner_dtype = None if cfg.inner_precision == "float64" else np.float32
    if cfg.verbose >= 1:
        notice = solver_notice(cfg.solver_type)
        if notice:
            print(f"  {notice}")
    # per-component verbosity (TortuosityHypre.cpp:150-157): an explicit
    # tortuosity.verbose overrides the global level for the tortuosity solves
    tort_verbose = (cfg.tortuosity_verbose if cfg.tortuosity_verbose >= 0
                    else cfg.verbose)

    if cfg.verbose >= 1:
        print(f"Reading full domain data from: "
              f"{os.path.join(cfg.data_path, cfg.filename)}")
    # flow-through: the solver programs depend only on dims + config, and
    # the readers are metadata-first — start the background warm-up NOW so
    # program compile/load overlaps the voxel read + threshold
    # (props.tortuosity.prime_solver; best-effort, None off-TPU)
    warm0 = None
    meta_reader = None  # reused by the fallback load below (readers are
    # metadata-first; constructing one twice would re-enumerate/stat a
    # whole TIFF slice sequence)
    if (not cfg.rev_do_study
            and os.environ.get("OPENIMPALA_NO_EARLY_WARM") != "1"):
        try:
            meta_reader = _reader(cfg)
            meta = meta_reader
            dims = (meta.width, meta.height, meta.depth)
            if min(dims) > 0 and cfg.calculation_method == "flow_through":
                from .props.tortuosity import prime_solver

                dirs = parse_directions(cfg.direction)
                # later directions' direction-static executables (fill +
                # system build) are primed after the first solve's program
                # set, overlapping their load with its iterations
                warm0 = prime_solver(
                    dims, dirs[0], vlo=cfg.tortuosity_vlo,
                    vhi=cfg.tortuosity_vhi, method=method,
                    precond=cfg.precond, inner_dtype=inner_dtype,
                    eps=cfg.eps, dx=cfg.voxel_size, extra_dirs=dirs[1:])
            elif min(dims) > 0 and cfg.calculation_method == "homogenization":
                from .props.effective_diffusivity import prime_cell_solver

                warm0 = prime_cell_solver(
                    dims, method=method, precond=cfg.precond,
                    inner_dtype=inner_dtype, eps=cfg.eps,
                    dx=cfg.voxel_size)
        except Exception:
            warm0 = None
    # homogenization without a REV study never needs the host copy: ingest
    # straight into sharded device memory when a multi-device mesh exists
    phase = None
    orig_shape = None
    if not cfg.rev_do_study and (
        cfg.calculation_method == "homogenization"
        or (cfg.calculation_method == "flow_through"
            and cfg.tortuosity_remspot_passes == 0)
    ):
        loaded = load_phase_sharded(
            cfg, allow_pad=cfg.calculation_method == "flow_through")
        if loaded is not None:
            phase, orig_shape = loaded
            if cfg.verbose >= 1:
                import jax

                print(f"  Distributed ingest over {len(jax.devices())} "
                      f"devices")
    if phase is None:
        phase = (meta_reader.threshold(cfg.threshold_val, 1, 0)
                 if meta_reader is not None else load_phase(cfg))
        orig_shape = phase.shape
    if cfg.verbose >= 1:
        print(f"  Domain: {orig_shape[0]} x {orig_shape[1]} x "
              f"{orig_shape[2]}")

    if cfg.rev_do_study:
        csv_path = os.path.join(cfg.results_path, cfg.rev_results_file)
        print(f"\n--- Starting REV Study (Homogenization Method) for Phase ID "
              f"{cfg.phase_id} ---")
        rev_study(
            phase, cfg.phase_id, cfg.rev_sizes, num_samples=cfg.rev_num_samples,
            eps=cfg.eps, maxiter=cfg.krylov_maxiter,
            method=resolve_solver(cfg.rev_solver_type), precond=cfg.precond,
            csv_path=csv_path, verbose=cfg.rev_verbose, inner_dtype=inner_dtype,
            dx=cfg.voxel_size,
            batch=(cfg.rev_batch if cfg.rev_batch == "auto"
                   else cfg.rev_batch in ("true", "1", "yes", "on")),
            plotfile_dir=(os.path.join(cfg.results_path, "rev_plotfiles")
                          if cfg.rev_write_plotfiles else None),
        )
        print(f"REV study CSV written to: {csv_path}")

    if cfg.calculation_method == "homogenization":
        print(f"\n--- Effective Diffusivity via Homogenization (Full Domain) ---")
        res = effective_diffusivity(
            phase, cfg.phase_id, eps=cfg.eps, maxiter=cfg.krylov_maxiter,
            method=method, precond=cfg.precond, inner_dtype=inner_dtype,
            verbose=cfg.verbose, return_fields=cfg.write_plotfile,
            dx=cfg.voxel_size, warm=warm0,
        )
        if res.converged:
            print("Full Domain Effective Diffusivity Tensor D_eff / D_material:")
            for r in range(3):
                row = ", ".join(f"{res.deff[r][c]:.8e}" for c in range(3))
                print(f"  [{row}]")
        else:
            print("Full domain D_eff calculation skipped due to chi_k "
                  "non-convergence.")
        if cfg.write_plotfile and res.chi is not None:
            base = os.path.join(cfg.results_path, "effdiff_chi")
            phase_np = np.asarray(phase)
            write_volume_hdf5_xdmf(base, {
                "chi_x": np.asarray(res.chi[0]),
                "chi_y": np.asarray(res.chi[1]),
                "chi_z": np.asarray(res.chi[2]),
                "phase": phase_np.astype(np.float64),
                # the solver's active mask (D=1 cells), matching the
                # reference plotfile contents
                # (EffectiveDiffusivityHypre.cpp:648-680)
                "active_mask": (phase_np == cfg.phase_id).astype(np.float64),
            })
            print(f"Field snapshot written to {base}.h5/.xmf")

    elif cfg.calculation_method == "flow_through":
        print("\n--- Full Domain Calculation: Tortuosity via Flow-Through ---")
        from .props.volume_fraction import volume_fraction_counts

        pc, _ = volume_fraction_counts(phase, cfg.phase_id)
        vf = pc / (orig_shape[0] * orig_shape[1] * orig_shape[2])
        print(f"  Volume Fraction = {vf:.8f}")
        results = {}
        for d in parse_directions(cfg.direction):
            name = "XYZ"[d]
            print(f"\n--- Solving for Tortuosity in Direction: {name} ---")
            r = tortuosity(
                phase, cfg.phase_id, d, vlo=cfg.tortuosity_vlo,
                vhi=cfg.tortuosity_vhi, eps=cfg.eps, maxiter=cfg.krylov_maxiter,
                method=method, precond=cfg.precond,
                remspot_passes=cfg.tortuosity_remspot_passes,
                dx=cfg.voxel_size,
                inner_dtype=inner_dtype, verbose=tort_verbose,
                return_fields=cfg.write_plotfile or cfg.debug_write_active_mask,
                original_shape=orig_shape,
                # ONE shared handle: warm0 registered every direction via
                # extra_dirs, so later directions reuse it (wait_fill(d) +
                # join are per-direction/idempotent) instead of spinning a
                # fresh warm-up thread whose primes serialize with the solve
                warm=warm0,
            )
            results[f"Tortuosity_{name}"] = r.value
            print(f"  >>> Calculated Tortuosity ({name}): {r.value:.8f} <<<")
            if (cfg.write_plotfile and r.phi is not None) or (
                    cfg.debug_write_active_mask and r.active is not None):
                # distributed ingest may have padded phase along X; every
                # dataset in a plotfile must carry the ORIGINAL domain
                # shape.  Gathered only when a write actually happens — at
                # 1024^3 this float64 host copy is ~8.6 GiB per direction.
                phase_np = np.asarray(phase)[: orig_shape[0]].astype(np.float64)
            if cfg.write_plotfile and r.phi is not None:
                base = os.path.join(cfg.results_path, f"tortuosity_solution_{d}")
                write_volume_hdf5_xdmf(base, {
                    "solution_potential": np.asarray(r.phi),
                    "phase_id": phase_np,
                    "active_mask": np.asarray(r.active, np.float64),
                })
            elif cfg.debug_write_active_mask and r.active is not None:
                # debug.write_active_mask (TortuosityHypre.cpp:543-556):
                # dump just the percolation mask for inspection
                base = os.path.join(cfg.results_path, f"active_mask_{name}")
                write_volume_hdf5_xdmf(base, {
                    "active_mask": np.asarray(r.active, np.float64),
                    "phase_id": phase_np,
                })
        out = os.path.join(cfg.results_path, cfg.output_filename)
        print(f"\nWriting final results to: {out}")
        write_results_txt(out, cfg.filename, cfg.phase_id, vf, results)
    else:
        print(f"Unknown calculation_method: {cfg.calculation_method}",
              file=sys.stderr)
        return 2

    if os.environ.get("OPENIMPALA_PROFILE", "0") == "1":
        from .utils import profiling

        print("\nPer-phase wall-clock (OPENIMPALA_PROFILE=1):")
        profiling.report(file=sys.stdout)

    print(f"\nTotal run time (seconds) = {time.perf_counter() - t_start:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
