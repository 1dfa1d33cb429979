"""512^3 one-shot overhead breakdown on the real TPU (VERDICT r2 #4).

Measures, for the production GMG-PCG chunk program:
  - host BFS (percolation) time
  - hierarchy-build program time
  - serialized executable SIZE per pallas_min_cells variant (the
    deserialize+upload lever: the one-time program load over the tunnel
    was ~4-6 s of the 15 s one-shot at 512^3 in round 2)
  - compile (cold) vs persistent-cache-hit (deserialize+upload) time
  - first dispatch and steady-state per-iteration time
  - f64 outer-residual cost

Run:  nohup python scripts/overhead512.py > /tmp/overhead512.log 2>&1 &
Env:  N (default 512), VARIANTS (default "262144,2097153,16777217")
      [pallas_min_cells values: 64^3 default, >128^3, >256^3]
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

import openimpala_tpu  # noqa: F401 (x64)
from openimpala_tpu.ops.floodfill import percolation_mask
from openimpala_tpu.ops.stencil import make_tortuosity_system
from openimpala_tpu.ops.masks import linear_ramp
from openimpala_tpu.solve.cg import _cg_chunk, _rel0
from openimpala_tpu.solve.preconditioners import GalerkinMGPreconditioner
from openimpala_tpu.solve.refine import _outer_residual


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


N = int(os.environ.get("N", "512"))
VARIANTS = [int(v) for v in os.environ.get(
    "VARIANTS", "262144,2097153,16777217").split(",")]

log("device:", jax.devices()[0], "N:", N)

rng = np.random.default_rng(0)
coarse = rng.standard_normal((N // 8,) * 3).astype(np.float32)
import jax.image

field = jax.image.resize(jnp.asarray(coarse), (N,) * 3, method="trilinear")
thr = jnp.quantile(field.reshape(-1)[:: max(1, N ** 3 // 2_000_000)], 0.4)
phase = np.asarray((field < thr).astype(np.int8))
del field, coarse

t0 = time.time()
active, vf = percolation_mask(phase, 1, 0, method="native")
t_bfs = time.time() - t0
log(f"BFS: {t_bfs:.2f}s  vf={vf:.4f}")

t0 = time.time()
system = make_tortuosity_system(jnp.asarray(active), 0, -1.0, 1.0,
                                dtype=jnp.float32)
ramp = linear_ramp(active.shape, 0, -1.0, 1.0, dtype=jnp.float32)
x0 = jnp.where(system.free, ramp, jnp.zeros((), jnp.float32))
r0 = system.initial_residual(x0)
float(jnp.sum(r0))  # host fetch = real barrier over the tunnel
log(f"system build: {time.time()-t0:.2f}s")

denom = jnp.asarray(system.b_norm, jnp.float32)
eps = jnp.asarray(1e-5, jnp.float32)
rel0, done0 = _rel0(r0, denom, eps)
state = (jnp.zeros_like(r0), r0, jnp.zeros_like(r0),
         jnp.zeros((), jnp.float32), jnp.array(0, jnp.int32), rel0, done0)

from jax.experimental import serialize_executable as se

for pmc in VARIANTS:
    t0 = time.time()
    M = GalerkinMGPreconditioner.from_system(system, pallas_min_cells=pmc)
    jax.block_until_ready(M.levels[0].diag)
    float(jnp.sum(M.levels[-1].diag))  # force host fetch
    t_hier = time.time() - t0
    log(f"--- pallas_min_cells={pmc}: hierarchy {t_hier:.2f}s")

    t0 = time.time()
    lowered = _cg_chunk.lower(system, M, state, denom, eps, chunk=16)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        size = len(payload)
    except Exception as e:  # API drift guard
        payload, size = None, -1
        log("serialize failed:", e)
    log(f"    lower {t_lower:.1f}s  compile {t_compile:.1f}s  "
        f"serialized {size/2**20:.1f} MiB")

    # cache-hit path: recompile the same lowering (persistent cache)
    t0 = time.time()
    compiled2 = lowered.compile()
    log(f"    cache-hit compile (deserialize+load): {time.time()-t0:.2f}s")

    # first + steady dispatches
    t0 = time.time()
    st = compiled(system, M, state, denom, eps)
    float(st[5])  # host fetch
    t_first = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        st = compiled(system, M, st, denom, eps)
        float(st[5])
        times.append(time.time() - t0)
    log(f"    first dispatch {t_first:.2f}s  steady {min(times):.2f}s "
        f"({min(times)/16*1e3:.1f} ms/iter)  rel={float(st[5]):.3e}")
    del M, compiled, compiled2, lowered, st

# f64 outer residual
z64 = x0.astype(jnp.float64)
t0 = time.time()
r_hi, scale = _outer_residual(system, z64, "float64")
float(scale)
log(f"f64 outer residual compile+first: {time.time()-t0:.2f}s")
t0 = time.time()
r_hi, scale = _outer_residual(system, z64, "float64")
float(scale)
log(f"f64 outer residual steady: {time.time()-t0:.2f}s")
log("DONE")
