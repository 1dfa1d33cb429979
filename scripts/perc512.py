"""512^3 percolation on TPU: raster device fill vs native host BFS.

Measures wall time of both methods end to end (including transfers) and
asserts mask equality.  Run:
    nohup python scripts/perc512.py > /tmp/perc512.log 2>&1 &
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
from openimpala_tpu.ops.floodfill import percolation_mask


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


N = int(os.environ.get("N", "512"))
log("device:", jax.devices()[0], "N:", N)

rng = np.random.default_rng(0)
coarse = rng.standard_normal((N // 8,) * 3).astype(np.float32)
import jax.image

field = jax.image.resize(jnp.asarray(coarse), (N,) * 3, method="trilinear")
thr = jnp.quantile(field.reshape(-1)[:: max(1, N ** 3 // 2_000_000)], 0.4)
phase = np.asarray((field < thr).astype(np.int8))
del field

for trial in range(3):
    t0 = time.time()
    a_nat, vf_nat = percolation_mask(phase, 1, 0, method="native")
    t_nat = time.time() - t0
    t0 = time.time()
    a_dev, vf_dev = percolation_mask(phase, 1, 0, method="device")
    n_dev = int(jnp.sum(a_dev))  # host fetch barrier
    t_dev = time.time() - t0
    log(f"trial {trial}: native {t_nat:.2f}s (vf={vf_nat:.6f})  "
        f"device {t_dev:.2f}s (vf={vf_dev:.6f})")
    if trial == 0:
        # equality: XOR count on device against the uploaded native mask
        from openimpala_tpu.ops.masks import upload_mask

        nat_j = upload_mask(np.asarray(a_nat))
        diff = int(jnp.sum(nat_j != a_dev))
        log(f"mask disagreement: {diff} cells")
        assert diff == 0 and abs(vf_nat - vf_dev) < 1e-12
log("DONE")
