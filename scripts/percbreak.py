"""Where do the device raster fill's seconds go at 512^3?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
from bench import synth_phase
from openimpala_tpu.ops.floodfill import flood_fill_device_raster, _sweep_axis

N = int(os.environ.get("N", "512"))
phase = synth_phase(N)
pok = jnp.asarray(phase == 1)
seeds = jnp.zeros((N,)*3, bool).at[0].set(True)

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

ff = jax.jit(flood_fill_device_raster)
t0 = time.time(); r, it = ff(pok, seeds); n = int(jnp.sum(r)); log(f"fill cold: {time.time()-t0:.2f}s rounds={int(it)} n={n}")
for k in range(3):
    t0 = time.time(); r, it = ff(pok, seeds); n = int(jnp.sum(r)); log(f"fill warm{k}: {time.time()-t0:.2f}s rounds={int(it)}")

# single fused round (6 sweeps) steady-state
def one_round(reach, open_):
    for axis in (0,1,2):
        for rev in (False, True):
            reach = _sweep_axis(reach, open_, axis, rev)
    return reach
orj = jax.jit(one_round)
r0 = seeds & pok
r1 = orj(r0, pok); int(jnp.sum(r1))
t0 = time.time()
for _ in range(10):
    r1 = orj(r1, pok)
int(jnp.sum(r1))
log(f"one 6-sweep round steady: {(time.time()-t0)/10*1e3:.1f} ms")

# single sweep
swj = jax.jit(lambda r, o: _sweep_axis(r, o, 0, False))
r2 = swj(r1, pok); int(jnp.sum(r2))
t0 = time.time()
for _ in range(20):
    r2 = swj(r2, pok)
int(jnp.sum(r2))
log(f"one X-sweep steady: {(time.time()-t0)/20*1e3:.1f} ms")
for ax in (1, 2):
    swj2 = jax.jit(lambda r, o, ax=ax: _sweep_axis(r, o, ax, False))
    r3 = swj2(r1, pok); int(jnp.sum(r3))
    t0 = time.time()
    for _ in range(20):
        r3 = swj2(r3, pok)
    int(jnp.sum(r3))
    log(f"one axis-{ax} sweep steady: {(time.time()-t0)/20*1e3:.1f} ms")
