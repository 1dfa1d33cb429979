"""Stage-blocking wall-clock attribution of the 512^3 D_eff tensor path.

Replicates props/effective_diffusivity.py's sequential GMG loop with an
explicit ``block_until_ready`` fence after every stage, so async dispatch
cannot smear costs into the next stage's timer (utils/profiling.py scopes
don't fence).  Env: N (default 512), WARM=1 to start the prime_cell_solver
warm-up first (the CLI path).
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from bench import synth_phase
from openimpala_tpu.ops.masks import upload_mask
from openimpala_tpu.props.effective_diffusivity import (
    _build_cell_system, deff_tensor, prime_cell_solver)
from openimpala_tpu.solve.refine import make_precond, solve_system

STAGES = []


def stage(name, t0):
    dt = time.perf_counter() - t0
    STAGES.append((name, dt))
    print(f"  [{name:<28}] {dt:7.3f} s", flush=True)
    return time.perf_counter()


n = int(os.environ.get("N", "512"))
phase = synth_phase(n)
active_np = np.asarray(phase) == 1
print(f"phase ready {n}^3", flush=True)

warm = None
if os.environ.get("WARM") == "1":
    warm = prime_cell_solver((n, n, n))
    print("warm-up started", flush=True)

t_all = time.perf_counter()
t = time.perf_counter()

active = upload_mask(active_np)
jax.block_until_ready(active)
t = stage("upload_mask", t)

if warm is not None:
    warm.join()
    t = stage("warm_join", t)

chis, M = [], None
for k in range(3):
    system, x0 = _build_cell_system(active, k, (1.0, 1.0, 1.0), "float32")
    jax.block_until_ready((system.code, system.r0_b, system.b_norm, x0))
    t = stage(f"build_system_k{k}", t)
    if M is None:
        M = make_precond(system, "gmg", None, "cg")
        jax.block_until_ready(jax.tree.leaves(M))
        t = stage("hierarchy_build", t)
    chi_k, info = solve_system(system, x0, eps=1e-9, maxiter=20000,
                               method="cg", precond=M,
                               inner_dtype=jnp.float32,
                               outer_dtype=jnp.float64)
    jax.block_until_ready(chi_k)
    t = stage(f"solve_k{k} ({int(info.iterations)} it)", t)
    chis.append(chi_k)

D = np.asarray(deff_tensor(chis[0], chis[1], chis[2], active, (1.0, 1.0, 1.0)))
t = stage("deff_tensor+fetch", t)

total = time.perf_counter() - t_all
print(f"TOTAL {total:.3f} s   Dxx={D[0,0]:.6f} Dyy={D[1,1]:.6f} "
      f"Dzz={D[2,2]:.6f}", flush=True)
acct = sum(dt for _, dt in STAGES)
print(f"accounted {acct:.3f} s ({100*acct/total:.0f}%)", flush=True)
