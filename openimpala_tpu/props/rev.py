"""REV (representative elementary volume) study driver.

Re-design of the REV loop in ``src/props/Diffusion.cpp:317-504``: for each of
``num_samples`` random sub-volume origins x each target size, crop the phase
volume, solve the three periodic cell problems on the crop, integrate the
D_eff tensor, and append a CSV row

    SampleNo,SeedX,SeedY,SeedZ,REV_Size_Target,ActualSizeX,ActualSizeY,
    ActualSizeZ,D_xx,D_yy,D_zz,D_xy,D_xz,D_yz

(``Diffusion.cpp:338,485-499``).  Crops whose clipped box has longest side
< 8 are skipped (``Diffusion.cpp:361``).  RNG: the reference seeds
``std::mt19937(rank + 12345 + num_samples)``; we use
``numpy.random.default_rng(12345 + num_samples)`` — the streams differ (the
study is statistical), the seeding *rule* is preserved.

Same-size crops are embarrassingly parallel; ``batch=True`` stacks them and
runs the three direction solves per crop under one fixed-iteration batched
CG (vmap), converging on the max residual across the batch.  The default
``batch="auto"`` decides PER SAME-SHAPE GROUP: lockstep vmap lanes pay when
individual crops underfill the chip; once a single crop saturates HBM
bandwidth the sequential Galerkin-MG driver wins (measured at the BASELINE
target 64 x 256^3 x 3 on a v5e — see BASELINE.md "REV batching" row).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from .effective_diffusivity import effective_diffusivity


@dataclasses.dataclass
class RevSample:
    sample_no: int
    seed: tuple
    size_target: int
    actual_size: tuple
    deff: np.ndarray  # (3,3)
    converged: bool


CSV_HEADER = (
    "SampleNo,SeedX,SeedY,SeedZ,REV_Size_Target,ActualSizeX,ActualSizeY,"
    "ActualSizeZ,D_xx,D_yy,D_zz,D_xy,D_xz,D_yz"
)


def csv_row(s: RevSample) -> str:
    d = s.deff
    vals = [d[0, 0], d[1, 1], d[2, 2], d[0, 1], d[0, 2], d[1, 2]]
    return (
        f"{s.sample_no},{s.seed[0]},{s.seed[1]},{s.seed[2]},{s.size_target},"
        f"{s.actual_size[0]},{s.actual_size[1]},{s.actual_size[2]},"
        + ",".join(f"{v:.8f}" for v in vals)
    )


def _draw_samples(phase, sizes, num_samples, rng, verbose):
    """Random crop boxes: origin per axis uniform in [0, N-size]
    (Diffusion.cpp:344-357), clipped, longside >= 8 (Diffusion.cpp:361)."""
    shape = phase.shape
    boxes = []
    for s_idx in range(int(num_samples)):
        for size in sizes:
            size = int(size)
            seed = []
            for d in range(3):
                hi = shape[d] - size
                seed.append(0 if hi < 0 else int(rng.integers(0, hi + 1)))
            lo = np.array(seed)
            hi = np.minimum(lo + size, np.array(shape))
            actual = tuple(int(h - l) for l, h in zip(lo, hi))
            if min(1 if a == 0 else a for a in actual) == 0 or max(actual) < 8:
                if verbose:
                    print(f"  REV sample {s_idx+1} size {size}: skipped (small box)")
                continue
            boxes.append((s_idx + 1, size, tuple(int(v) for v in lo), actual))
    return boxes


# auto-batch threshold: vmap lockstep lanes win while a single crop
# underfills the chip's compute/bandwidth; the crossover sits between the
# measured 64^3 win and the 256^3 loss (BASELINE.md "REV batching"), and
# scripts/rev_bench.py places it at ~96^3 on a v5e
AUTO_BATCH_MAX_CELLS = 96 ** 3


def _resolve_batch(batch, actual, n_group: int,
                   solve_kwargs=None, method: str = "cg",
                   precond: str = "auto") -> bool:
    """Per-group policy for ``batch="auto"``: vmap only when there is more
    than one same-shape crop and each crop underfills the chip.  Callers
    requesting the exact float64 path (``inner_dtype=None``), a non-CG
    Krylov method, or an explicit preconditioner stay on the sequential
    driver — the batched solver hard-codes CG + stateless Chebyshev, so
    "auto" must not silently override validated user configuration."""
    if isinstance(batch, str) and batch != "auto":
        # library callers may pass the config string through unconverted;
        # bool("false") is True, so parse the same tokens config.py accepts
        batch = batch.strip().lower() in ("true", "1", "yes", "on")
    if batch == "auto":
        if solve_kwargs and solve_kwargs.get("inner_dtype", "f32") is None:
            return False
        if str(method).lower() not in ("cg", "pcg") or precond != "auto":
            return False
        return n_group > 1 and math.prod(actual) <= AUTO_BATCH_MAX_CELLS
    return bool(batch)


def rev_study(
    phase: np.ndarray,
    phase_id: int,
    sizes,
    num_samples: int = 3,
    eps: float = 1e-9,
    maxiter: int = 20000,
    method: str = "cg",
    precond: str = "auto",
    rng=None,
    csv_path: str | None = None,
    verbose: int = 0,
    batch: bool | str = "auto",
    plotfile_dir: str | None = None,
    **solve_kwargs,
):
    """Run the study; returns a list of RevSample and optionally streams a
    CSV (flushed row by row like the reference, ``Diffusion.cpp:498``, so
    partial studies survive a crash).

    ``batch``: ``True`` groups same-shape crops and solves each group's
    three cell problems as ONE vmapped device program (solve/batched.py) —
    the TPU-native form of the sweep (all samples' Krylov iterations run in
    lockstep lanes).  ``False`` runs the sequential Galerkin-MG driver per
    crop.  ``"auto"`` (default) decides per same-shape group by crop size
    (``AUTO_BATCH_MAX_CELLS``); plotfiles force the sequential path (the
    batched solver does not return the chi fields).
    """
    phase = np.asarray(phase)
    if rng is None:
        rng = np.random.default_rng(12345 + int(num_samples))
    boxes = _draw_samples(phase, sizes, num_samples, rng, verbose)

    groups: dict[tuple, list] = {}
    for idx, (s_no, size, lo, actual) in enumerate(boxes):
        groups.setdefault(actual, []).append(idx)

    results = {}
    for actual, idxs in groups.items():
        use_batch = (plotfile_dir is None
                     and _resolve_batch(batch, actual, len(idxs),
                                        solve_kwargs, method=method,
                                        precond=precond))
        if use_batch:
            from ..solve.batched import batched_deff

            crops = np.stack([
                phase[boxes[i][2][0]:boxes[i][2][0] + actual[0],
                      boxes[i][2][1]:boxes[i][2][1] + actual[1],
                      boxes[i][2][2]:boxes[i][2][2] + actual[2]]
                for i in idxs
            ])
            # the batched solver has its own preconditioner (stateless
            # Chebyshev — vmaps; the Galerkin hierarchy does not), so only
            # the kwargs it understands are forwarded
            bkw = {k: v for k, v in solve_kwargs.items() if k in (
                "dx", "group_size", "budget_bytes", "inner_dtype",
                "outer_dtype", "max_refine_rounds", "inner_round_cap",
                "cheby_degree")}
            if bkw.get("inner_dtype", "f32") is None:
                # explicit batch=True + pure-f64 request: the batched solver
                # always refines, so run its Krylov in f64 directly
                bkw["inner_dtype"] = np.float64
            deffs, convs = batched_deff(crops, phase_id, eps=eps,
                                        maxiter=maxiter, **bkw)
            for j, i in enumerate(idxs):
                d = deffs[j] if convs[j] else np.full((3, 3), math.nan)
                results[i] = (d, bool(convs[j]))
            continue
        # sequential same-shape crops amortise the compiled-program load
        # across many solves.  Round 2 injected cycle="w" here (1.5x fewer
        # iterations than the then-default Jacobi-coarse V-cycle); with the
        # Chebyshev-coarse default the advantage is gone — measured at the
        # BASELINE REV config (64 x 256^3 x 3, v5e): V 157.6 s vs W 159.2 s,
        # both 64/64 converged — so the plain default (smaller program) stays.
        for i in idxs:
            s_no, size, lo, _actual = boxes[i]
            crop = phase[lo[0]:lo[0] + actual[0], lo[1]:lo[1] + actual[1],
                         lo[2]:lo[2] + actual[2]]
            res = effective_diffusivity(
                crop, phase_id, eps=eps, maxiter=maxiter, method=method,
                precond=precond, verbose=max(0, verbose - 1),
                return_fields=plotfile_dir is not None, **solve_kwargs,
            )
            d = res.deff if res.converged else np.full((3, 3), math.nan)
            results[i] = (np.asarray(d), res.converged)
            if plotfile_dir is not None and res.chi is not None:
                # rev.write_plotfiles: per-sample chi-field snapshots
                # (Diffusion.cpp:442-447)
                import os

                from ..io.writers import write_volume_hdf5_xdmf

                os.makedirs(plotfile_dir, exist_ok=True)
                base = os.path.join(plotfile_dir,
                                    f"rev_chi_s{s_no}_sz{size}")
                write_volume_hdf5_xdmf(base, {
                    "chi_x": np.asarray(res.chi[0]),
                    "chi_y": np.asarray(res.chi[1]),
                    "chi_z": np.asarray(res.chi[2]),
                    "phase": crop.astype(np.float64),
                })

    out = []
    fh = open(csv_path, "w") if csv_path else None
    if fh:
        fh.write(CSV_HEADER + "\n")
        fh.flush()
    try:
        for i, (s_no, size, lo, actual) in enumerate(boxes):
            deff, conv = results[i]
            sample = RevSample(sample_no=s_no, seed=lo, size_target=size,
                               actual_size=actual, deff=np.asarray(deff),
                               converged=conv)
            out.append(sample)
            if verbose:
                print(f"  REV sample {s_no} size {size}: D_xx={deff[0,0]:.6f} "
                      f"converged={conv}")
            if fh:
                fh.write(csv_row(sample) + "\n")
                fh.flush()
    finally:
        if fh:
            fh.close()
    return out
