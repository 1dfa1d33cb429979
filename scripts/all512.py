"""512^3 flow-through "All" run on TPU: program reuse across directions.

The solver executables (_cg_chunk, hierarchy, outer residual) depend only on
shapes/dtypes/static opts — not on the flow direction — so directions Y and Z
reuse every program direction X loaded: each extra direction costs only its
percolation + system build + iterations (VERDICT r2 #4).

Run: nohup python scripts/all512.py > /tmp/all512.log 2>&1 &
Env: N (512), PERC (native|device)
"""
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
from openimpala_tpu.props.tortuosity import prime_solver, tortuosity


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


N = int(os.environ.get("N", "512"))
PERC = os.environ.get("PERC", "native")
log("device:", jax.devices()[0], "N:", N, "perc:", PERC)

rng = np.random.default_rng(0)
coarse = rng.standard_normal((N // 8,) * 3).astype(np.float32)
import jax.image

field = jax.image.resize(jnp.asarray(coarse), (N,) * 3, method="trilinear")
thr = jnp.quantile(field.reshape(-1)[:: max(1, N ** 3 // 2_000_000)], 0.4)
phase = np.asarray((field < thr).astype(np.int8))
del field

t_all = time.time()
# ONE shared warm handle for all three directions (mirrors the CLI,
# diffusion.py): later directions' fill/build executables load during the
# first direction's iterations
warm = prime_solver((N,) * 3, 0, eps=1e-9, precond="auto",
                    inner_dtype=jnp.float32, percolation_method=PERC,
                    extra_dirs=(1, 2))
for d in range(3):
    t0 = time.time()
    r = tortuosity(phase, 1, d, eps=1e-9, precond="auto",
                   inner_dtype=jnp.float32, percolation_method=PERC,
                   warm=warm)
    log(f"dir {'XYZ'[d]}: {time.time()-t0:.2f}s  tau={r.value:.6f}  "
        f"iters={r.iterations}  conv={r.converged}  "
        f"flux_ok={r.flux_conserved}")
    if os.environ.get("OPENIMPALA_PROFILE") == "1":
        from openimpala_tpu.utils import profiling

        log("\n" + profiling.report())
        profiling.reset()
log(f"All (3 directions): {time.time()-t_all:.1f}s")
