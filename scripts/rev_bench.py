"""REV study at the BASELINE target scale: 64 x 256^3 crops x 3 directions.

Strategy note: lockstep vmap-batching pays when individual crops underfill
the chip (<= ~96^3).  At 256^3 a single Galerkin-MG cell-problem solve
already saturates HBM bandwidth with the fused Pallas kernels, so the sweep
runs the production sequential driver per crop; the batched Chebyshev path
(solve/batched.py) covers the small-crop regime.
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
from openimpala_tpu.props.rev import rev_study


def log(*a):
    print(*a, flush=True)


n_parent = int(os.environ.get("N_PARENT", "512"))
crop = int(os.environ.get("CROP", "256"))
n_samples = int(os.environ.get("SAMPLES", "64"))

rng = np.random.default_rng(0)
coarse = rng.standard_normal((n_parent // 8,) * 3).astype(np.float32)
field = jax.image.resize(jnp.asarray(coarse), (n_parent,) * 3, "trilinear")
thr = jnp.quantile(field.reshape(-1)[:: max(1, n_parent ** 3 // 2_000_000)], 0.45)
phase = np.asarray((field < thr).astype(np.int8))
del field
log(f"parent {n_parent}^3, {n_samples} x {crop}^3 crops x 3 directions")

cycle = os.environ.get("CYCLE", "")  # "" = rev_study's default (plain V —
# the W advantage was retired by the Chebyshev coarse, props/rev.py)
extra = {"precond_opts": {"cycle": cycle}} if cycle else {}
# BATCH: "auto" (default) | "true" (force the vmapped lockstep path) |
# "false" (force the sequential GMG driver) — the VERDICT r3 item 5 A/B
batch = os.environ.get("BATCH", "auto")
if batch != "auto":
    batch = batch.strip().lower() in ("1", "true", "yes", "on")
t0 = time.time()
samples = rev_study(phase, 1, sizes=(crop,), num_samples=n_samples,
                    eps=1e-9, precond="gmg", verbose=1, batch=batch,
                    csv_path="/tmp/rev_bench.csv", **extra)
dt = time.time() - t0
ok = sum(s.converged for s in samples)
log(f"REV {n_samples} x {crop}^3 x 3: {dt:.1f}s total "
    f"({dt / max(1, len(samples)):.2f}s/sample incl. 3 solves), "
    f"{ok}/{len(samples)} converged")
