"""Where do the seconds go in the 512^3 SA-preconditioned solve? (TPU)

Times each stage explicitly: geometry, system build, SA hierarchy build
(probing), preconditioner-apply compile+run, chunked-CG solve.  Env: N.
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

from bench import synth_phase


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


n = int(os.environ.get("N", "512"))
t0 = time.time()
phase = synth_phase(n)
log(f"synth {n}^3: {time.time()-t0:.1f}s")

from openimpala_tpu.ops.floodfill import percolation_mask
from openimpala_tpu.ops.masks import linear_ramp
from openimpala_tpu.ops.stencil import make_tortuosity_system

t0 = time.time()
active, vf = percolation_mask(phase, 1, 0, method="auto")
log(f"percolation: {time.time()-t0:.1f}s vf={vf:.4f}")

t0 = time.time()
active_j = jnp.asarray(active)
system = make_tortuosity_system(active_j, 0, -1.0, 1.0, dtype=jnp.float32)
ramp = linear_ramp(phase.shape, 0, -1.0, 1.0, jnp.float32)
x0 = jnp.where(system.free, ramp, 0.0)
r0 = system.initial_residual(x0)
float(jnp.sum(r0))  # force
log(f"system build: {time.time()-t0:.1f}s")

from openimpala_tpu.solve.sa import SAMGPreconditioner

t0 = time.time()
M = SAMGPreconditioner.from_system(system)
jax.block_until_ready(M.levels[-1].packed)
log(f"SA hierarchy build (probing): {time.time()-t0:.1f}s  "
    f"levels={len(M.levels)} "
    f"taps={[len(l.offsets) for l in M.levels]} "
    f"shapes={[tuple(l.diag.shape) for l in M.levels]}")

t0 = time.time()
vj = jax.jit(lambda m, r: m(r))
y = vj(M, r0)
float(jnp.sum(y))
log(f"V-cycle compile+first run: {time.time()-t0:.1f}s")
t0 = time.time()
reps = 5
for _ in range(reps):
    y = vj(M, y)
float(jnp.sum(y))
log(f"V-cycle steady: {(time.time()-t0)/reps*1e3:.0f} ms/cycle")

from openimpala_tpu.solve.cg import cg

t0 = time.time()
res = cg(system, r0, system.b_norm.astype(jnp.float32), 1e-6, 2000, precond=M)
jax.block_until_ready(res.z)
log(f"CG(1e-6) solve: {time.time()-t0:.1f}s iters={int(res.iterations)}")
t0 = time.time()
res = cg(system, r0, system.b_norm.astype(jnp.float32), 1e-6, 2000, precond=M)
jax.block_until_ready(res.z)
log(f"CG(1e-6) warm re-solve: {time.time()-t0:.1f}s iters={int(res.iterations)}")
