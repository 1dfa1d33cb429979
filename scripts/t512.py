"""512^3 tortuosity probe: which preconditioner compiles/runs + timing."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
import openimpala_tpu
from openimpala_tpu.props.tortuosity import tortuosity

def log(*a): print(*a, flush=True)

n = int(os.environ.get("N", "512"))
precond = os.environ.get("PRECOND", "jacobi")
perc = os.environ.get("PERC", "native")
mg_levels = int(os.environ.get("MG_LEVELS", "10"))

rng = np.random.default_rng(0)
coarse = rng.standard_normal((n//8,)*3).astype(np.float32)
import jax.image
field = jax.image.resize(jnp.asarray(coarse), (n,)*3, method="trilinear")
thr = jnp.quantile(field.reshape(-1)[::max(1, n**3//2_000_000)], 0.4)
phase = np.asarray((field < thr).astype(np.int8))
del field

t0=time.time()
r = tortuosity(phase, 1, 0, eps=1e-9, precond=precond,
               precond_opts={"max_levels": mg_levels} if precond == "mg" else None,
               inner_dtype=jnp.float32, percolation_method=perc, verbose=1)
log(f"precond={precond} n={n}: t={time.time()-t0:.1f}s tau={r.value:.6f} "
    f"iters={r.iterations} rel={r.rel_res:.2e} conv={r.converged}")
if os.environ.get("OPENIMPALA_PROFILE") == "1":
    from openimpala_tpu.utils import profiling

    log(profiling.report())
