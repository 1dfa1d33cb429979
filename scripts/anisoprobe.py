"""Semi-coarsening threshold + payoff measurement (VERDICT r4 #2).

For spacing anisotropies dx = (1, 1, s) — the imaging-stack case where the
Z slice spacing differs from the in-plane pixel size — solve the
flow-through system on a porous blob volume twice:

* ``full``: the pre-r5 hierarchy (full coarsening at every level, forced
  via the ``schedule`` override), point-Jacobi smoothing;
* ``auto``: the derived schedule (``GalerkinMGPreconditioner._schedule_for``)
  which semi-coarsens the strongly-coupled axes when the per-axis h^2
  ratio exceeds SEMI_THRESHOLD.

Prints iterations + wall time per (s, variant).  This is the measurement
behind the SEMI_THRESHOLD=2 gate and the BASELINE.md anisotropy rows
(reference parity target: Hypre SMG/PFMG, TortuosityHypre.cpp:671-678,
is anisotropy-robust by construction).

Run on CPU (any size <= 160^3 is minutes) or the real TPU.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("PROBE_CPU", "1") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from openimpala_tpu.ops.stencil import make_tortuosity_system  # noqa: E402
from openimpala_tpu.ops.masks import linear_ramp  # noqa: E402
from openimpala_tpu.solve.refine import solve_system  # noqa: E402
from openimpala_tpu.solve.preconditioners import (  # noqa: E402
    GalerkinMGPreconditioner,
)


def blob_mask(n: int, seed: int = 0, porosity_q: float = 0.4):
    import jax.image

    rng = np.random.default_rng(seed)
    coarse = rng.standard_normal((max(2, n // 8),) * 3).astype(np.float32)
    field = jax.image.resize(jnp.asarray(coarse), (n,) * 3, method="trilinear")
    thr = jnp.quantile(field.reshape(-1), porosity_q)
    return np.asarray(field < thr)


def run(n: int, s: float, schedule):
    from openimpala_tpu.ops.floodfill import percolation_mask

    phase = blob_mask(n)
    active, _ = percolation_mask(phase.astype(np.int32), 1, 0)
    active = np.asarray(active)
    dx = (1.0, 1.0, float(s))
    system = make_tortuosity_system(jnp.asarray(active), 0, -1.0, 1.0,
                                    dx=dx, dtype=jnp.float32)
    ramp = linear_ramp((n,) * 3, 0, -1.0, 1.0)
    x0 = jnp.where(system.free, ramp, 0.0).astype(jnp.float32)
    opts = {} if schedule is None else {"schedule": schedule}
    t0 = time.time()
    x, info = solve_system(system, x0, eps=1e-9, maxiter=4000,
                           precond="gmg", precond_opts=opts,
                           inner_dtype=jnp.float32)
    jax.block_until_ready(x)
    return info.iterations, time.time() - t0, float(info.rel_res)


def main():
    n = int(os.environ.get("N", "160"))
    spacings = [float(x) for x in
                os.environ.get("SPACINGS", "1,1.4142,2,4,8").split(",")]
    max_levels = 3
    for s in spacings:
        w = (1.0, 1.0, 1.0 / s**2)
        auto = GalerkinMGPreconditioner._schedule_for((n,) * 3, w, max_levels)
        full_n = 0
        shape = [n] * 3
        while full_n + 1 < max_levels and all(
                d % 2 == 0 and d >= 8 for d in shape):
            shape = [d // 2 for d in shape]
            full_n += 1
        full = ((0, 1, 2),) * full_n
        it_f, t_f, r_f = run(n, s, full)
        if auto == full:
            it_a, t_a, r_a = it_f, t_f, r_f
        else:
            it_a, t_a, r_a = run(n, s, auto)
        print(f"s={s:<7g} h2_ratio={s**2:<6g} full: {it_f:4d} it {t_f:6.1f}s "
              f"rel={r_f:.1e} | auto({auto}): {it_a:4d} it {t_a:6.1f}s "
              f"rel={r_a:.1e}", flush=True)


if __name__ == "__main__":
    main()
