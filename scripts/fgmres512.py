"""512^3 FlexGMRES(GMG) surface measurement (solver_type = GMRES).

VERDICT r2 weak #5: FGMRES was 7x slower than CG (103 s / 390 iters).  With
the Chebyshev-coarse GMG cycle + plateau detection (solve/fgmres.py) the
stalled f32 cycles return to iterative refinement instead of spinning.
Run: nohup python scripts/fgmres512.py > /tmp/mq/fgmres512.log 2>&1 &
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
from openimpala_tpu.props.tortuosity import tortuosity

n = 512
rng = np.random.default_rng(0)
coarse = rng.standard_normal((n//8,)*3).astype(np.float32)
field = jax.image.resize(jnp.asarray(coarse), (n,)*3, method="trilinear")
thr = jnp.quantile(field.reshape(-1)[::max(1, n**3//2_000_000)], 0.4)
phase = np.asarray((field < thr).astype(np.int8))
del field

t0=time.time()
r = tortuosity(phase, 1, 0, eps=1e-9, precond="auto", method="gmres",
               maxiter=2000, inner_dtype=jnp.float32, percolation_method="auto")
print(f"fgmres(gmg-cheby) n={n}: t={time.time()-t0:.1f}s tau={r.value:.6f} "
      f"iters={r.iterations} rel={r.rel_res:.2e} conv={r.converged}", flush=True)
