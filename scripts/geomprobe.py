"""Is the 1024^3 iteration count (105 vs 46 at 512^3) geometry or scale?
Solve a 512^3 volume built with run1024's recipe (sigma=4 gaussian blobs,
porosity 0.45, percolation column) and compare iterations."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter
from openimpala_tpu.props.tortuosity import tortuosity

N = int(os.environ.get("N", "512"))
rng = np.random.default_rng(0)
chunk = 64
vol = np.empty((N, N, N), np.int8)
for z0 in range(0, N, chunk):
    field = gaussian_filter(rng.standard_normal((N, N, chunk)), (4, 4, 4),
                            mode="nearest")
    thr = np.quantile(field[::8, ::8, :], 0.45)
    sl = (field < thr).astype(np.int8)
    sl[:, N // 2, :] = 1
    vol[:, :, z0:z0 + chunk] = sl
print(f"phase ready {N}^3 (run1024 recipe)", flush=True)
for lv in (3, 4):
    t0 = time.time()
    r = tortuosity(vol, 1, 0, eps=1e-9, precond="gmg",
                   precond_opts={"max_levels": lv},
                   inner_dtype=jnp.float32, percolation_method="auto")
    print(f"levels={lv}: tau={r.value:.6f} iters={r.iterations} "
          f"rel={r.rel_res:.2e} conv={r.converged} vf={r.active_vf:.4f} "
          f"wall={time.time()-t0:.1f}s", flush=True)
