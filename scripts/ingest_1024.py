"""Distributed-ingest demonstration: a 1024^3 synthetic volume thresholded
into a sharded int8 device array on the 8-device virtual CPU mesh, without
ever materialising an unsharded device copy (VERDICT r1 item 4; reference
counterpart: per-rank hyperslab reads, HDF5Reader.cpp:280-311).

Writes a 1 GiB uint8 raw file to /tmp, ingests via the RawReader hyperslab
path, checks the sharding layout and spot-checks values.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=900"
    + " --xla_cpu_collective_timeout_seconds=900"
).strip()
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from openimpala_tpu.io import RawReader, threshold_sharded
from openimpala_tpu.parallel.mesh import make_mesh

N = int(os.environ.get("N", "1024"))
path = f"/tmp/ingest_demo_{N}.raw"

if not os.path.exists(path) or os.path.getsize(path) != N ** 3:
    print(f"writing {N}^3 uint8 volume ({N**3/2**30:.1f} GiB) ...", flush=True)
    rng = np.random.default_rng(0)
    with open(path, "wb") as f:
        for _ in range(N):  # one (Y, X) plane at a time
            f.write(rng.integers(0, 256, (N, N), np.uint8).tobytes())

reader = RawReader(path, N, N, N, "UINT8")
mesh = make_mesh(n_devices=8)
t0 = time.time()
arr, shape = threshold_sharded(reader, 127.0, mesh)
dt = time.time() - t0
assert arr.dtype == np.int8 and arr.shape == (N, N, N)
assert len(arr.sharding.device_set) == 8
for shard in arr.addressable_shards:
    assert shard.data.shape == (N // 8, N, N)
# spot-check a few voxels against the reader
rngc = np.random.default_rng(1)
for _ in range(20):
    i, j, k = (int(v) for v in rngc.integers(0, N, 3))
    want = np.int8(1 if reader.read(i, i + 1)[0, j, k] > 127.0 else 0)
    assert np.asarray(arr[i, j, k]) == want, (i, j, k)
print(f"ingested {N}^3 -> int8 sharded over {len(arr.sharding.device_set)} "
      f"devices in {dt:.1f}s ({N**3/dt/1e9:.2f} GB/s); spot checks OK")
