"""512^3 D_eff tensor on TPU: SA vs Galerkin-PC preconditioning.

The homogenization path solves THREE periodic cell problems on one
geometry, so a better coarse space amortises its build 3x.
Env: N, ONLY, LANES (1 forces the lockstep multi-RHS path, 0 forces the
sequential loop, unset = the use_lanes auto gate), DX (comma triple for
anisotropic voxel spacing, e.g. "1.0,1.0,0.5").
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
from openimpala_tpu.props.effective_diffusivity import effective_diffusivity


def log(*a):
    print(*a, flush=True)


n = int(os.environ.get("N", "512"))
phase = synth_phase(n)
log(f"phase ready {n}^3")

configs = ["gmg", "sa"]
sel = os.environ.get("ONLY")
if sel:
    configs = sel.split(",")
lanes_env = os.environ.get("LANES")
lanes = "auto" if lanes_env is None else lanes_env == "1"
dx = tuple(float(v) for v in os.environ.get("DX", "1,1,1").split(","))
for pc in configs:
    t0 = time.time()
    r = effective_diffusivity(phase, 1, eps=1e-9, precond=pc, dx=dx,
                              inner_dtype=jnp.float32, lanes=lanes,
                              verbose=1)
    D = np.asarray(r.deff)
    log(f"{pc}: Dxx={D[0,0]:.6f} Dyy={D[1,1]:.6f} Dzz={D[2,2]:.6f} "
        f"iters={r.iterations} conv={r.converged} "
        f"wall={time.time()-t0:.1f}s")
    if os.environ.get("OPENIMPALA_PROFILE") == "1":
        from openimpala_tpu.utils.profiling import report, reset

        log(report())
        reset()
