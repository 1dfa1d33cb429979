"""512^3 TPU measurement: SA vs Galerkin-PC preconditioning (round-3)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
import openimpala_tpu  # noqa
from openimpala_tpu.props.tortuosity import tortuosity

def log(*a): print(*a, flush=True)

n = int(os.environ.get("N", "512"))
# the bench volume (deterministic seed 0)
sys.path.insert(0, "/root/repo")
from bench import synth_phase
phase = synth_phase(n)
log(f"phase ready {n}^3")

# NOTE (measured, r3): SA W-cycle at 512^3 OOMs the 16 GiB v5e inside the
# chunked fused CG program (two corrections/level -> deeper live temporaries);
# the V-cycle already lands 62 iters, so W stays a small-volume option.
configs = {"gmg": ("gmg", None), "gmgw": ("gmg", {"cycle": "w"}),
           "sa": ("sa", None), "saw": ("sa", {"cycle": "w"}),
           "sa1": ("sa", {"nu1": 1, "nu2": 1})}
sel = os.environ.get("ONLY")
configs = ([configs[k] for k in sel.split(",")] if sel
           else [configs["gmg"], configs["sa"]])
for pc, opts in configs:
    t0 = time.time()
    r = tortuosity(phase, 1, 0, eps=1e-9, precond=pc, precond_opts=opts,
                   inner_dtype=jnp.float32, percolation_method="auto")
    log(f"{pc}{opts or ''}: tau={r.value:.6f} iters={r.iterations} "
        f"rel={r.rel_res:.2e} conv={r.converged} wall={time.time()-t0:.1f}s")
