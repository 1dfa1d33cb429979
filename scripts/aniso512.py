"""Anisotropic-dx flow-through A/B at N^3 (default 512) on the TPU.

Anisotropic voxel spacing is a production case (imaging stacks where the
Z spacing differs from XY; the reference takes per-axis cell sizes from
its RealBox geometry, Diffusion.cpp:302-305).  Before round 4 the packed
signed-count geometry was isotropic-only, so anisotropic systems carried
an explicit f32 diagonal and ran every fine-level op on the XLA path;
the per-axis packed code (ops/stencil.py pack_code_axes) moves them onto
the fused Pallas kernels.

Env: N (default 512), DX (comma triple, default "1.0,1.0,0.5"),
PALLAS ("auto" to use the kernels, "0" to pin XLA — the A/B lever).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("N", "512"))
DX = tuple(float(v) for v in os.environ.get("DX", "1.0,1.0,0.5").split(","))
PALLAS = os.environ.get("PALLAS", "auto")
os.environ["OPENIMPALA_PALLAS"] = PALLAS

import jax
import jax.numpy as jnp
import numpy as np

import openimpala_tpu  # noqa: F401
from openimpala_tpu.props.tortuosity import tortuosity


def log(*a):
    print(*a, file=sys.stderr, flush=True)


log(f"N={N} dx={DX} PALLAS={PALLAS} device={jax.devices()[0].device_kind}")

coarse = N // 8
key = jax.random.PRNGKey(0)
noise = jax.random.normal(key, (coarse,) * 3, jnp.float32)
field = jax.image.resize(noise, (N,) * 3, method="trilinear")
thr = jnp.quantile(field.reshape(-1)[:: max(1, N**3 // 2_000_000)], 0.4)
phase = np.asarray((field < thr).astype(np.int8))
del field

for attempt in range(2):  # first run includes compiles; second is warm
    t0 = time.time()
    r = tortuosity(phase, 1, 0, eps=1e-9, dx=DX, precond="auto",
                   inner_dtype=jnp.float32, percolation_method="auto")
    log(f"run {attempt}: {time.time()-t0:.2f}s  tau={r.value:.8f}  "
        f"iters={r.iterations}  rel={r.rel_res:.2e}  conv={r.converged}  "
        f"flux_ok={r.flux_conserved}")
