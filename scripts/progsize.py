"""What's inside the serialized 512^3 chunk executable? (load-time lever)

Dumps per-computation and custom-call payload sizes of the optimized HLO,
using the warm persistent cache (no recompiles).
Run: nohup python scripts/progsize.py > /tmp/progsize.log 2>&1 &
Env: N (512), MAX_LEVELS (16), CHUNK (16)
"""
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

import openimpala_tpu  # noqa: F401
from openimpala_tpu.ops.stencil import make_tortuosity_system
from openimpala_tpu.ops.masks import linear_ramp
from openimpala_tpu.solve.cg import _cg_chunk, _rel0
from openimpala_tpu.solve.preconditioners import GalerkinMGPreconditioner


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


N = int(os.environ.get("N", "512"))
MAX_LEVELS = int(os.environ.get("MAX_LEVELS", "16"))
CHUNK = int(os.environ.get("CHUNK", "16"))
log("device:", jax.devices()[0], "N:", N, "levels:", MAX_LEVELS)

# all-active mask: identical program keys to the real solve (warmup.py)
active = jnp.ones((N, N, N), bool)
system = make_tortuosity_system(active, 0, -1.0, 1.0, dtype=jnp.float32)
ramp = linear_ramp((N, N, N), 0, -1.0, 1.0, dtype=jnp.float32)
x0 = jnp.where(system.free, ramp, jnp.zeros((), jnp.float32))
r0 = system.initial_residual(x0)
denom = jnp.asarray(system.b_norm, jnp.float32)
eps = jnp.asarray(1e-5, jnp.float32)
rel0, done0 = _rel0(r0, denom, eps)
state = (jnp.zeros_like(r0), r0, jnp.zeros_like(r0),
         jnp.zeros((), jnp.float32), jnp.array(0, jnp.int32), rel0, done0)
M = GalerkinMGPreconditioner.from_system(system, max_levels=MAX_LEVELS)
log("hierarchy:", [tuple(l.diag.shape) for l in M.levels])

t0 = time.time()
lowered = _cg_chunk.lower(system, M, state, denom, eps, chunk=CHUNK)
log(f"lower: {time.time()-t0:.1f}s  stablehlo bytes: "
    f"{len(lowered.as_text())}")
t0 = time.time()
compiled = lowered.compile()
log(f"compile: {time.time()-t0:.1f}s")

from jax.experimental import serialize_executable as se

payload, in_tree, out_tree = se.serialize(compiled)
log(f"serialized executable: {len(payload)/2**20:.2f} MiB")

# Scan the serialized payload for embedded Mosaic MLIR bytecode blobs
# (magic "ML\xefR") — a crude but API-stable breakdown of what fraction
# of the load-time bytes are kernel payloads vs compiled TPU code.
import re

blobs = [mm.start() for mm in re.finditer(b"ML\xefR", payload)]
log(f"Mosaic MLIR bytecode blobs in payload: {len(blobs)}")
sizes = []
for i, s in enumerate(blobs):
    e = blobs[i + 1] if i + 1 < len(blobs) else len(payload)
    sizes.append(e - s)
log("approx blob extents (KiB):",
    [round(sz / 1024) for sz in sorted(sizes, reverse=True)[:20]])
log(f"total approx Mosaic bytes: {sum(sizes)/2**20:.2f} MiB "
    f"(upper bound — extents run to the next blob)")

# deserialize_and_load time = the actual per-process load cost we pay
t0 = time.time()
reloaded = se.deserialize_and_load(payload, in_tree, out_tree)
log(f"deserialize_and_load: {time.time()-t0:.1f}s")
log("DONE")
