"""1024^3 sharded percolation A/B on the virtual 8-device CPU mesh:
device-resident packed fill (ops/packfill.py, shard_map + cross-shard word
carries) vs the host per-shard native BFS (ops/floodfill.py
percolation_mask_sharded).  VERDICT r3 item 2 done-criterion.

Run with:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           OPENIMPALA_PLATFORM=cpu python scripts/perc1024_sharded.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["OPENIMPALA_PLATFORM"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

import openimpala_tpu  # noqa: F401  (platform config)
from openimpala_tpu.parallel.mesh import make_mesh, shard_volume

N = int(os.environ.get("N", "1024"))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def synth(n):
    """Blob phase at ~0.45 porosity with a guaranteed percolation channel —
    built slab-wise to bound host memory (same recipe as run1024.py)."""
    rng = np.random.default_rng(0)
    coarse = rng.standard_normal((n // 8,) * 3).astype(np.float32)
    out = np.empty((n, n, n), np.int8)
    import jax.image

    field = jax.image.resize(jnp.asarray(coarse), (n, n, n), "trilinear")
    flat = np.asarray(field.reshape(-1)[:: max(1, n ** 3 // 2_000_000)])
    thr = np.quantile(flat, 0.45)
    out[:] = np.asarray(field < thr, np.int8)
    del field
    out[:, n // 2, :] = 1  # guaranteed X channel
    return out


def main():
    log(f"devices: {jax.device_count()}  backend: {jax.default_backend()}")
    t0 = time.time()
    phase = synth(N)
    log(f"synth {N}^3: {time.time()-t0:.1f}s")

    mesh = make_mesh()
    t0 = time.time()
    sharded = shard_volume(jnp.asarray(phase == 1), mesh)
    jax.block_until_ready(sharded)
    log(f"shard: {time.time()-t0:.1f}s  devices="
        f"{len(sharded.sharding.device_set)}")

    from openimpala_tpu.ops.packfill import percolation_oneshot_packed_sharded

    t0 = time.time()
    res = percolation_oneshot_packed_sharded(sharded, 0)
    assert res is not None, "packed sharded fill unavailable for this layout"
    active, counts = res
    n_packed = int(np.asarray(counts).sum(dtype=np.int64))
    t_packed = time.time() - t0
    log(f"packed sharded fill: {t_packed:.1f}s  n_active={n_packed} "
        f"(vf={n_packed / N**3:.6f})")

    modes = os.environ.get("MODES", "bfs").split(",")

    if "bfs" in modes:
        from openimpala_tpu.ops.floodfill import percolation_mask_sharded

        arr = shard_volume(jnp.asarray(phase), mesh)
        t0 = time.time()
        res2 = percolation_mask_sharded(arr, 1, 0)
        t_bfs = time.time() - t0
        if res2 is None:
            log("per-shard BFS unavailable (no native lib?)")
        else:
            active2, vf2 = res2
            n_bfs = int(round(vf2 * N ** 3))
            log(f"per-shard native BFS: {t_bfs:.1f}s  n_active={n_bfs} "
                f"(vf={vf2:.6f})")
            assert n_packed == n_bfs, \
                f"mask count mismatch {n_packed} != {n_bfs}"
            log("counts agree")

    if "dilation" in modes:
        # the O(sum dims) synchronous-dilation fallback the packed fill
        # replaced for multi-host/GSPMD volumes (floodfill.py, pre-r4)
        from openimpala_tpu.ops.floodfill import flood_fill_device
        from openimpala_tpu.utils.common import count_true

        seeds_lo = jnp.zeros((N,) * 3, bool).at[0].set(True)
        seeds_hi = jnp.zeros((N,) * 3, bool).at[N - 1].set(True)
        t0 = time.time()
        reach_in, _ = flood_fill_device(sharded, seeds_lo)
        reach_out, _ = flood_fill_device(sharded, seeds_hi)
        n_dil = int(count_true(reach_in & reach_out))
        t_dil = time.time() - t0
        log(f"synchronous dilation: {t_dil:.1f}s  n_active={n_dil}")
        assert n_dil == n_packed, f"mask count mismatch {n_dil} != {n_packed}"
        log("counts agree (dilation)")
    log("DONE")


if __name__ == "__main__":
    main()
