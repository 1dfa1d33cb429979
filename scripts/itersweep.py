"""GMG variant sweep at 512^3 on TPU: iterations, per-iteration cost, and
serialized chunk-program size per preconditioner option set.

Run: nohup python scripts/itersweep.py > /tmp/itersweep.log 2>&1 &
Env: N (512), VARIANTS (comma-separated names below)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

import openimpala_tpu  # noqa: F401
from openimpala_tpu.ops.floodfill import percolation_mask
from openimpala_tpu.ops.stencil import make_tortuosity_system
from openimpala_tpu.ops.masks import linear_ramp
from openimpala_tpu.solve.refine import solve_system

VARIANTS = {
    "default": {},
    "cheby22": {"smoother": "cheby"},
    "levels5": {"max_levels": 5},
    "cheby33": {"smoother": "cheby", "nu1": 3, "nu2": 3},
    "jac33": {"nu1": 3, "nu2": 3},
    # shallow hierarchy + Chebyshev coarse SOLVER (error ~ exp(-2d/sqrt(r)))
    "l5cheb300": {"max_levels": 5, "coarse_solver": "cheby",
                  "coarse_ratio": 300.0},
    "l4cheb1k": {"max_levels": 4, "coarse_solver": "cheby",
                 "coarse_sweeps": 80, "coarse_ratio": 1000.0},
    "l6cheb100": {"max_levels": 6, "coarse_solver": "cheby",
                  "coarse_ratio": 100.0},
    "l3cheb4k": {"max_levels": 3, "coarse_solver": "cheby",
                 "coarse_sweeps": 150, "coarse_ratio": 4000.0},
    "l4cheb600d60": {"max_levels": 4, "coarse_solver": "cheby",
                     "coarse_sweeps": 60, "coarse_ratio": 600.0},
    "l4cheb2kd100": {"max_levels": 4, "coarse_solver": "cheby",
                     "coarse_sweeps": 100, "coarse_ratio": 2000.0},
    "l5cheb1k": {"max_levels": 5, "coarse_solver": "cheby",
                 "coarse_sweeps": 80, "coarse_ratio": 1000.0},
    "l3cheb2kd100": {"max_levels": 3, "coarse_solver": "cheby",
                     "coarse_sweeps": 100, "coarse_ratio": 2000.0},
    "l3cheb8kd200": {"max_levels": 3, "coarse_solver": "cheby",
                     "coarse_sweeps": 200, "coarse_ratio": 8000.0},
    "l3cheb4kd100": {"max_levels": 3, "coarse_solver": "cheby",
                     "coarse_sweeps": 100, "coarse_ratio": 4000.0},
}


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


N = int(os.environ.get("N", "512"))
names = os.environ.get("VARIANTS", "default,cheby22,levels5").split(",")
log("device:", jax.devices()[0], "N:", N, "variants:", names)

rng = np.random.default_rng(0)
coarse = rng.standard_normal((N // 8,) * 3).astype(np.float32)
import jax.image

field = jax.image.resize(jnp.asarray(coarse), (N,) * 3, method="trilinear")
thr = jnp.quantile(field.reshape(-1)[:: max(1, N ** 3 // 2_000_000)], 0.4)
phase = np.asarray((field < thr).astype(np.int8))
del field

t0 = time.time()
active, vf = percolation_mask(phase, 1, 0, method="native")
log(f"BFS {time.time()-t0:.1f}s vf={vf:.4f}")
system = make_tortuosity_system(jnp.asarray(active), 0, -1.0, 1.0,
                                dtype=jnp.float32)
x0 = jnp.where(system.free, linear_ramp(active.shape, 0, -1.0, 1.0,
                                        jnp.float32), 0.0)

from openimpala_tpu.solve import ResidualHistory

for name in names:
    opts = VARIANTS[name]
    hist = ResidualHistory()  # structured convergence trace (no verbose
    # scraping): hist.inner = per-chunk (iteration, rel), hist.outer =
    # per-refinement-round residuals
    t0 = time.time()
    x_full, info = solve_system(system, x0, eps=1e-9, maxiter=20000,
                                method="cg", precond="gmg",
                                inner_dtype=jnp.float32,
                                outer_dtype=jnp.float64, precond_opts=opts,
                                history=hist)
    t_first = time.time() - t0
    it1 = int(info.iterations)
    # warm second solve: pure iterate time
    t0 = time.time()
    x_full, info = solve_system(system, x0, eps=1e-9, maxiter=20000,
                                method="cg", precond="gmg",
                                inner_dtype=jnp.float32,
                                outer_dtype=jnp.float64, precond_opts=opts)
    t_warm = time.time() - t0
    size = -1
    if os.environ.get("SIZES", "1") == "1":
        from jax.experimental import serialize_executable as se
        from openimpala_tpu.solve.cg import _cg_chunk, _rel0
        from openimpala_tpu.solve.refine import make_precond

        M = make_precond(system, "gmg", opts, "cg")
        r0 = system.initial_residual(x0)
        denom = jnp.asarray(system.b_norm, jnp.float32)
        epsj = jnp.asarray(1e-5, jnp.float32)
        rel0, done0 = _rel0(r0, denom, epsj)
        state = (jnp.zeros_like(r0), r0, jnp.zeros_like(r0),
                 jnp.zeros((), jnp.float32), jnp.array(0, jnp.int32),
                 rel0, done0)
        try:
            payload, _, _ = se.serialize(
                _cg_chunk.lower(system, M, state, denom, epsj,
                                chunk=16).compile())
            size = round(len(payload) / 2 ** 20, 2)
        except Exception as e:
            log("size probe failed:", e)
    log(json.dumps({
        "variant": name, "iters": int(info.iterations),
        "rel": float(info.rel_res), "conv": bool(info.converged),
        "t_first_s": round(t_first, 2), "t_warm_s": round(t_warm, 2),
        "ms_per_iter_warm": round(t_warm / max(int(info.iterations), 1) * 1e3, 1),
        "chunk_exe_mib": size,
        "outer_residuals": [[r, f"{v:.3e}"] for r, v in hist.outer],
        "inner_trace": [[it, f"{v:.3e}"] for it, v in hist.inner],
    }))
log("DONE")
