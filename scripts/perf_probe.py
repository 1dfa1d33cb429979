"""TPU perf probe: XLA vs Pallas stencil matvec (arrays passed as jit args,
never closed over — closure constants embed the volume into the HLO and
wreck compile time + the persistent cache)."""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


n = int(os.environ.get("N", "256"))
which = os.environ.get("WHICH", "xla,v1,v2").split(",")
log("device:", jax.devices()[0], "n:", n, "which:", which)

import openimpala_tpu  # noqa: F401  (enables x64)
from openimpala_tpu.ops.stencil import (
    apply_restricted,
    make_tortuosity_system,
    set_pallas_mode,
)
from openimpala_tpu.ops import stencil_pallas as sp
from openimpala_tpu.ops.floodfill import percolation_mask

rng = np.random.default_rng(0)
phase = (rng.random((n, n, n)) < 0.65).astype(np.int8)
active, vf = percolation_mask(phase, 1, 0)
log(f"percolation: vf={vf:.4f}")

set_pallas_mode("0")
system = make_tortuosity_system(
    jnp.asarray(active), 0, -1.0, 1.0, dtype=jnp.float64
).astype(jnp.float32)
x0 = jnp.where(system.free, jnp.ones(phase.shape, jnp.float32), 0.0)

W, PER = system.w, system.periodic
args = (system.diag, system.free)  # decoded views (probe compares XLA forms)


SUM = jax.jit(jnp.sum)


def timeit(f, label, iters=30):
    t0 = time.time()
    y = f(x0, *args)
    _ = float(SUM(y))  # host fetch: block_until_ready on the tunnelled
    log(f"{label} compile+first: {time.time()-t0:.2f}s")  # backend is lazy
    # warm the SUM kernel + measure fetch overhead alone
    t0 = time.time()
    base = float(SUM(x0))
    fetch_overhead = time.time() - t0
    v = x0
    t0 = time.time()
    for _ in range(iters):
        v = f(v, *args)
    _ = float(SUM(v))
    dt = (time.time() - t0 - fetch_overhead) / iters
    log(f"{label}: {dt*1e3:.3f} ms  {n**3*13/dt/1e9:.1f} GB/s(13B model) "
        f"[fetch_overhead {fetch_overhead*1e3:.1f} ms]")
    return v, dt


results = {}
if "xla" in which:
    f = jax.jit(lambda v, d, fr: apply_restricted(v, d, fr, W, PER))
    results["xla"] = timeit(f, "XLA matvec")
if "v1" in which:
    f = jax.jit(lambda v, d, fr: sp.stencil_matvec_pallas(v, d, fr, W, PER))
    results["v1"] = timeit(f, "Pallas v1")
if "v2" in which:
    f = jax.jit(lambda v, d, fr: sp.stencil_matvec_pallas_v2(v, d, fr, W, PER))
    results["v2"] = timeit(f, "Pallas v2")

ks = list(results)
for i, a in enumerate(ks):
    for b in ks[i + 1:]:
        da, db = np.asarray(results[a][0]), np.asarray(results[b][0])
        log(f"chained-result diff {a} vs {b}:", float(np.abs(da - db).max()))
log("DONE")
