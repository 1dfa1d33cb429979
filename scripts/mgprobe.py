import os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
import openimpala_tpu
from openimpala_tpu.ops.stencil import make_tortuosity_system
from openimpala_tpu.solve.preconditioners import MultigridPreconditioner
from openimpala_tpu.solve.cg import cg

def log(*a): print(*a, flush=True)
n = int(os.environ.get("N", "512"))
lv = int(os.environ.get("MG_LEVELS", "4"))
rng = np.random.default_rng(0)
active = rng.random((n,n,n)) < 0.6
active[:, 0, 0] = True
system = make_tortuosity_system(jnp.asarray(active), 0, -1.0, 1.0, dtype=jnp.float32)
M = MultigridPreconditioner.from_system(system, max_levels=lv)
r = jnp.where(system.free, jnp.ones((n,n,n), jnp.float32), 0.0)
t0=time.time()
y = jax.jit(lambda m, v: m(v))(M, r)
print("vcycle value:", float(jnp.sum(y)))
log(f"standalone vcycle ok: {time.time()-t0:.1f}s")
t0=time.time()
res = cg(system, r, jnp.asarray(1.0, jnp.float32), 1e-5, 50, precond=M)
print("cg+mg:", float(res.rel_res), int(res.iterations))
log(f"cg+mg ok: {time.time()-t0:.1f}s")
