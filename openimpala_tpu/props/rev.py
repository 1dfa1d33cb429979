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
CG (vmap), converging on the max residual across the batch.
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
    **solve_kwargs,
):
    """Run the study; returns a list of RevSample and optionally streams a
    CSV (flushed row by row like the reference, ``Diffusion.cpp:498``, so
    partial studies survive a crash)."""
    phase = np.asarray(phase)
    shape = phase.shape
    if rng is None:
        rng = np.random.default_rng(12345 + int(num_samples))

    out = []
    fh = open(csv_path, "w") if csv_path else None
    if fh:
        fh.write(CSV_HEADER + "\n")
        fh.flush()
    try:
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
                crop = phase[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
                res = effective_diffusivity(
                    crop, phase_id, eps=eps, maxiter=maxiter, method=method,
                    precond=precond, verbose=max(0, verbose - 1), **solve_kwargs,
                )
                deff = res.deff if res.converged else np.full((3, 3), math.nan)
                sample = RevSample(
                    sample_no=s_idx + 1, seed=tuple(int(v) for v in lo),
                    size_target=size, actual_size=actual, deff=np.asarray(deff),
                    converged=res.converged,
                )
                out.append(sample)
                if verbose:
                    print(f"  REV sample {s_idx+1} size {size}: D_xx={deff[0,0]:.6f} "
                          f"converged={res.converged}")
                if fh:
                    fh.write(csv_row(sample) + "\n")
                    fh.flush()
    finally:
        if fh:
            fh.close()
    return out
