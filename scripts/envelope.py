"""Single-chip envelope probe ABOVE 512^3 (VERDICT r4 #1).

Runs the production one-shot flow-through tortuosity (precond=auto,
percolation=auto, warm-up on) at N^3 for N in $SIZES (default 576,640,704)
on the real TPU, one fresh process per size, and reports per size:
t_tau, iterations, rel_res, and the HBM peak watermark when the runtime
exposes it.  Purpose: replace the v5p-8 1024^3 projection's per-chip
512^3 anchor with a measured point above 512^3 and validate the
~118 B/cell memory model (solve/lanes.py) at the single-chip limit.

Geometry: the same sigma=4-ish blob recipe as scripts/t512.py /
geomprobe.py (coarse normal noise x8 trilinear upsample, 40th-percentile
threshold) so iteration counts are comparable with the 512^3 history.
"""
import os, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(%(repo)r, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
import jax.image
from openimpala_tpu.props.tortuosity import tortuosity

dims = tuple(int(v) for v in os.environ["N"].split("x"))
if len(dims) == 1:
    dims = dims * 3
n = dims[0]
rng = np.random.default_rng(0)
coarse = rng.standard_normal([max(2, d // 8) for d in dims]).astype(np.float32)
field = jax.image.resize(jnp.asarray(coarse), dims, method="trilinear")
ncells = int(np.prod(dims))
thr = jnp.quantile(field.reshape(-1)[:: max(1, ncells // 2_000_000)], 0.4)
phase = np.asarray((field < thr).astype(np.int8))
del field, coarse

dev = jax.devices()[0]
t0 = time.time()
try:
    r = tortuosity(phase, 1, 0, eps=1e-9, verbose=1)
    t = time.time() - t0
    stats = {}
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        pass
    peak = stats.get("peak_bytes_in_use")
    peak_s = f"{peak/2**30:.2f} GiB" if peak else "n/a"
    bpc = f"{peak/ncells:.1f}" if peak else "n/a"
    print(f"ENVELOPE n={os.environ["N"]}: t_tau={t:.2f}s tau={r.value:.8f} "
          f"iters={r.iterations} rel={r.rel_res:.2e} conv={r.converged} "
          f"hbm_peak={peak_s} bytes_per_cell={bpc}", flush=True)
except Exception as e:
    t = time.time() - t0
    print(f"ENVELOPE n={os.environ["N"]}: FAILED after {t:.1f}s: {type(e).__name__}: "
          f"{str(e)[:500]}", flush=True)
    sys.exit(1)
"""


def main():
    sizes = os.environ.get("SIZES", "576,640,704").split(",")
    for n in sizes:
        print(f"=== envelope N={n} ===", flush=True)
        env = dict(os.environ, N=str(n))
        rc = subprocess.call([sys.executable, "-c", CHILD % {"repo": REPO}],
                             env=env)
        print(f"=== N={n} rc={rc} ===", flush=True)


if __name__ == "__main__":
    main()
