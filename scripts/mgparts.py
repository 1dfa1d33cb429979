import os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
import openimpala_tpu
from openimpala_tpu.solve.preconditioners import _restrict, _prolong, MGLevel
from openimpala_tpu.ops.stencil import make_tortuosity_system

def log(*a): print(*a, flush=True)
n = int(os.environ.get("N", "512"))
x = jnp.ones((n,n,n), jnp.float32)
xc = jnp.ones((n//2,)*3, jnp.float32)

t0=time.time(); y = jax.jit(_restrict)(x); print(float(y[0,0,0])); log(f"restrict ok {time.time()-t0:.1f}s")
t0=time.time(); y = jax.jit(_prolong)(xc); print(float(y[0,0,0])); log(f"prolong ok {time.time()-t0:.1f}s")

rng = np.random.default_rng(0)
active = rng.random((n,n,n)) < 0.6
system = make_tortuosity_system(jnp.asarray(active), 0, -1.0, 1.0, dtype=jnp.float32)
level = MGLevel(code=system.code, w=system.w, periodic=system.periodic)
r = jnp.where(system.free, jnp.ones((n,n,n), jnp.float32), 0.0)

def smooth(level, r):
    diag, free = level.decode(r.dtype)
    inv_d = jnp.where(free & (diag > 0), 0.8 / jnp.where(diag > 0, diag, 1.0), 0.0)
    def body(i, x):
        return x + inv_d * (r - level.apply(x))
    return jax.lax.fori_loop(0, 2, body, jnp.zeros_like(r))

t0=time.time(); y = jax.jit(smooth)(level, r); print(float(jnp.sum(y))); log(f"smooth ok {time.time()-t0:.1f}s")

xc2 = _restrict(x)
t0=time.time(); y = jax.jit(lambda a: _prolong(_restrict(a)))(x); print(float(jnp.sum(y))); log(f"restrict+prolong ok {time.time()-t0:.1f}s")
