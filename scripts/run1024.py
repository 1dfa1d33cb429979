"""1024^3 end-to-end flow-through on the 8-device VIRTUAL mesh (CPU).

The dress rehearsal for the v5p-8 north-star run (BASELINE.md): distributed
ingest -> sharded percolation (per-shard native BFS + boundary exchange) ->
domain-decomposed MG-PCG to 1e-9 -> tau + flux conservation.  The reference
ships a legacy 1000^3 raw config (/root/reference/build/tests/rawinputs) but
never reports numbers for it; 499^3 is its largest demonstrated volume
(README.md:293-297).

Heavy: ~30-40 GiB RAM, tens of minutes on this 1-core host.  Usage:

    nohup python scripts/run1024.py > /tmp/run1024.log 2>&1 &

Env: N (default 1024), PRECOND (default gmg — the Chebyshev-coarse
cycle), LEVELS (default 3, the production default: measured 52 iterations
/ 7 338 s solve at 1024^3 vs 105 / 9 979 s with LEVELS=4 — every extra
PC-Galerkin level re-adds the porous-mask contraction, scripts/geomprobe.py),
EPS (default 1e-9).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ.pop("JAX_PLATFORMS", None)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=900"
    + " --xla_cpu_collective_timeout_seconds=900").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

N = int(os.environ.get("N", "1024"))
PRECOND = os.environ.get("PRECOND", "gmg")
LEVELS = int(os.environ.get("LEVELS", "3"))
EPS = float(os.environ.get("EPS", "1e-9"))
path = f"/tmp/ingest_demo_{N}.raw"


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    t_all = time.time()
    if not os.path.exists(path) or os.path.getsize(path) != N ** 3:
        log(f"writing {N}^3 uint8 blob volume ({N**3/2**30:.1f} GiB)...")
        from scipy.ndimage import gaussian_filter

        rng = np.random.default_rng(0)
        with open(path, "wb") as f:
            # per-slab correlated blobs: porosity ~0.45, percolating column
            chunk = 64
            for z0 in range(0, N, chunk):
                field = gaussian_filter(
                    rng.standard_normal((N, N, chunk)), (4, 4, 4),
                    mode="nearest")
                thr = np.quantile(field[:: 8, :: 8, :], 0.45)
                sl = (field < thr).astype(np.uint8) * 255
                sl[:, N // 2, :] = 255  # guaranteed X percolation
                # file layout (Z, Y, X): write transposed slabs
                f.write(np.ascontiguousarray(sl.transpose(2, 1, 0)).tobytes())
        log("volume written")

    from openimpala_tpu.io import RawReader, threshold_sharded
    from openimpala_tpu.parallel.mesh import make_mesh
    from openimpala_tpu.props.tortuosity import tortuosity

    mesh = make_mesh()
    log(f"mesh: {mesh.devices.size} devices")

    t0 = time.time()
    reader = RawReader(path, N, N, N, "UINT8")
    arr, orig_shape = threshold_sharded(reader, 127.0, mesh)
    jax.block_until_ready(arr)
    log(f"distributed ingest: {time.time()-t0:.1f}s  shape={arr.shape} "
        f"sharding={len(arr.sharding.device_set)} devices")

    t0 = time.time()
    popts = {"max_levels": LEVELS} if PRECOND in ("gmg", "mg", "sa") else None
    r = tortuosity(arr, 1, 0, eps=EPS, precond=PRECOND, precond_opts=popts,
                   original_shape=orig_shape, verbose=1)
    log(f"solve: {time.time()-t0:.1f}s")
    log(f"tau = {r.value:.8f}  active_vf = {r.active_vf:.6f}")
    log(f"iters = {r.iterations}  rel_res = {r.rel_res:.3e}  "
        f"converged = {r.converged}")
    log(f"flux in/out = {r.flux_in:.6f}/{r.flux_out:.6f}  "
        f"rel_diff = {r.flux_rel_diff:.3e}  conserved = {r.flux_conserved}")
    log(f"TOTAL (incl. ingest + synth): {time.time()-t_all:.1f}s")
    assert r.converged and r.flux_conserved, "1024^3 run FAILED"


if __name__ == "__main__":
    main()
