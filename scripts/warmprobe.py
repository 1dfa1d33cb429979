"""Time the solver warm-up's stages (solve/warmup.py _warm) and test whether
the two independent AOT compiles (chunked-CG program + f64 outer residual)
overlap when issued from concurrent threads — the remaining 512^3 one-shot
cost is the warm-up thread's program-load tail (BASELINE.md warm_join).

Run: nohup python scripts/warmprobe.py > /tmp/warmprobe.log 2>&1 &
Env: N (512), MODE (seq|par|both)
"""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

import openimpala_tpu  # noqa: F401
from openimpala_tpu.props.tortuosity import _build_system
from openimpala_tpu.solve.refine import make_precond, _outer_residual
from openimpala_tpu.solve.cg import _cg_chunk, _rel0


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


N = int(os.environ.get("N", "512"))
MODE = os.environ.get("MODE", "both")
log("device:", jax.devices()[0], "N:", N)

shape = (N, N, N)


def run(tag, concurrent: bool):
    t0 = time.time()
    ones = jnp.ones(shape, jnp.int8)
    system, x0 = _build_system(ones, 0, -1.0, 1.0, (1.0, 1.0, 1.0),
                               "float32", None)
    t_sys = time.time() - t0

    t0 = time.time()
    M = make_precond(system, "gmg", {}, "cg")
    t_pre = time.time() - t0

    r0 = system.initial_residual(x0)
    dtype = r0.dtype
    denom = jnp.asarray(system.b_norm, dtype)
    eps = 1e-9
    rel0, done0 = _rel0(r0, denom, jnp.asarray(eps, dtype))
    state = (jnp.zeros_like(r0), r0, jnp.zeros_like(r0),
             jnp.zeros((), dtype), jnp.array(0, jnp.int32), rel0, done0)

    def compile_chunk():
        _cg_chunk.lower(system, M, state, denom, eps, chunk=16).compile()

    def compile_outer():
        _outer_residual.lower(system, x0.astype(jnp.float64),
                              "float64").compile()

    t0 = time.time()
    if concurrent:
        th = threading.Thread(target=compile_outer)
        th.start()
        compile_chunk()
        th.join()
        t_chunk = t_outer = time.time() - t0
    else:
        compile_chunk()
        t_chunk = time.time() - t0
        t1 = time.time()
        compile_outer()
        t_outer = time.time() - t1
    total = t_sys + t_pre + (time.time() - t0)
    log(f"{tag}: system={t_sys:.2f}s hierarchy={t_pre:.2f}s "
        f"chunk_compile={t_chunk:.2f}s outer_compile={t_outer:.2f}s "
        f"TOTAL={total:.2f}s")
    return total


# warm the persistent cache first so we measure load, not compile
if MODE in ("both", "seq"):
    run("seq-cold-or-warm", False)
    run("seq", False)
if MODE in ("both", "par"):
    run("par", True)
    run("par", True)
log("DONE")
