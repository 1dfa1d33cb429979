"""MG-PCG convergence-quality probe with per-check progress prints."""
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

import openimpala_tpu  # noqa: F401
from openimpala_tpu.ops.stencil import make_tortuosity_system
from openimpala_tpu.ops.masks import linear_ramp
from openimpala_tpu.ops.floodfill import percolation_mask
from openimpala_tpu.solve.preconditioners import MultigridPreconditioner
from openimpala_tpu.solve.cg import _cg_step, _dot


def log(*a):
    print(*a, flush=True)


n = int(os.environ.get("N", "512"))
rng = np.random.default_rng(0)
coarse = rng.standard_normal((n // 8,) * 3).astype(np.float32)
field = jax.image.resize(jnp.asarray(coarse), (n,) * 3, method="trilinear")
thr = jnp.quantile(field.reshape(-1)[:: max(1, n**3 // 2_000_000)], 0.4)
phase = np.asarray((field < thr).astype(np.int8))
del field
active, vf = percolation_mask(phase, 1, 0)
log(f"vf={vf:.4f}")
system = make_tortuosity_system(jnp.asarray(active), 0, -1.0, 1.0,
                                dtype=jnp.float32)
M = MultigridPreconditioner.from_system(system)
log("levels:", [tuple(l.free.shape) for l in M.levels])
x0 = jnp.where(system.free, linear_ramp(phase.shape, 0, -1.0, 1.0, jnp.float32), 0.0)
r0 = system.initial_residual(x0)
denom = float(system.b_norm)
z = jnp.zeros_like(r0)
r = r0
t0 = time.time()
y = M(r)
p = y
rz = _dot(r, y)
log(f"first vcycle dispatched t={time.time()-t0:.1f}s")
it = 0
while it < 400:
    for _ in range(10):
        z, r, p, rz, rr, ok = _cg_step(system, M, z, r, p, rz)
    it += 10
    rel = float(jnp.sqrt(rr)) / denom
    log(f"it={it} rel={rel:.3e} t={time.time()-t0:.1f}s")
    if rel < 1e-7:
        break
