"""Benchmark driver — prints ONE JSON line on stdout.

Headline metric (BASELINE.json): masked 7-point stencil matvec bandwidth at
512^3 (GB/s), measured on the flow-through tortuosity operator in float32 —
the kernel at the heart of every Krylov iteration.  Secondary numbers
(time-to-tortuosity end to end at the bench size, iteration counts) go to
stderr.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
ratio is reported against the memory-bandwidth speed-of-light of the chip we
run on, under the CLASSICAL traffic accounting for this operator (x read +
f32 diag read + mask read + out write = 13 B/cell) — i.e. matvecs/second
normalised by the uncompressed operator's compulsory bytes.  The kernel
actually streams a compressed operator (bf16 signed-count geometry,
10 B/cell — ops/stencil.py), so values above 1.0 are possible in principle
(up to 1.3): they would mean the matvec runs faster than an uncompressed
stream could.  Higher is better.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synth_phase(n, porosity=0.4, seed=0):
    """Synthetic blob volume: coarse Gaussian noise, trilinear upsample,
    threshold at the requested porosity (same spirit as the reference's
    porespy sample, data/create_sample_structure.py)."""
    import jax
    import jax.numpy as jnp

    coarse = n // 8
    key = jax.random.PRNGKey(seed)
    noise = jax.random.normal(key, (coarse, coarse, coarse), jnp.float32)
    field = jax.image.resize(noise, (n, n, n), method="trilinear")
    thr = jnp.quantile(field.reshape(-1)[:: max(1, n**3 // 2_000_000)], porosity)
    phase = (field < thr).astype(jnp.int8)  # 1 = pore, ~porosity fraction
    return np.asarray(phase)


HBM_PEAK_GBPS = {
    # per-chip HBM bandwidth speed-of-light, GB/s
    "v5 lite": 819.0,  # v5e
    "v5e": 819.0,
    "v5p": 2765.0,
    "v4": 1228.0,
    "v6": 1640.0,
    "cpu": 100.0,  # nominal, for CI runs on host
}


def peak_bw(device) -> float:
    kind = getattr(device, "device_kind", "cpu").lower()
    for k, v in HBM_PEAK_GBPS.items():
        if k in kind:
            return v
    return 819.0


def main():
    t_all = time.time()
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    n = int(os.environ.get("BENCH_N", "512" if on_tpu else "128"))
    log(f"device: {dev.device_kind} ({dev.platform}); volume {n}^3")

    from openimpala_tpu.ops.floodfill import percolation_mask
    from openimpala_tpu.ops.stencil import make_tortuosity_system
    from openimpala_tpu.ops.masks import linear_ramp

    phase = synth_phase(n)
    t0 = time.time()
    active, active_vf = percolation_mask(phase, 1, 0, method="auto")
    log(f"percolation mask: {time.time()-t0:.2f}s  active_vf={active_vf:.4f}")

    active_j = jnp.asarray(active)
    # build directly in float32 — the coefficients are exact there and a
    # float64 copy would cost 3 GiB at 512^3
    system = make_tortuosity_system(active_j, 0, -1.0, 1.0, dtype=jnp.float32)

    # --- headline: masked stencil matvec bandwidth (float32) ---
    x = jnp.where(system.free, linear_ramp(phase.shape, 0, -1.0, 1.0,
                                           jnp.float32), 0.0)
    apply_jit = jax.jit(lambda s, v: s.apply(v))
    sum_jit = jax.jit(jnp.sum)
    float(sum_jit(apply_jit(system, x)))  # compile + warm (forced fetch)
    iters = 50 if on_tpu else 5
    t0 = time.time()
    float(sum_jit(x))
    fetch_overhead = time.time() - t0  # tunnelled backends are lazy: a
    t0 = time.time()  # host fetch is the only reliable execution barrier
    for _ in range(iters):
        x = apply_jit(system, x)
    float(sum_jit(x))
    dt = (time.time() - t0 - fetch_overhead) / iters
    # compulsory traffic: x(4) + diag(4) + free(1) + out(4) bytes per cell
    bytes_per_cell = 13
    gbps = n**3 * bytes_per_cell / dt / 1e9
    log(f"matvec: {dt*1e3:.2f} ms -> {gbps:.1f} GB/s (13 B/cell model)")

    # --- secondary: time-to-tortuosity end to end ---
    del system, x, active_j  # free HBM before the end-to-end run
    from openimpala_tpu.props.tortuosity import tortuosity

    t0 = time.time()
    r = tortuosity(phase, 1, 0, eps=1e-9, precond="auto",
                   inner_dtype=jnp.float32, percolation_method="auto")
    t_tau = time.time() - t0
    log(f"time-to-tortuosity ({n}^3, 1e-9): {t_tau:.2f}s  tau={r.value:.6f} "
        f"iters={r.iterations} rel_res={r.rel_res:.2e} conv={r.converged}")
    log(f"total bench time: {time.time()-t_all:.1f}s")

    print(json.dumps({
        "metric": f"masked_stencil_matvec_bandwidth_{n}cubed",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / peak_bw(dev), 4),
    }))


if __name__ == "__main__":
    main()
