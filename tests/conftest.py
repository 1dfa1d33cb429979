"""Test configuration: force CPU with 8 virtual devices (the multi-chip
stand-in — SURVEY.md §4) and float64 before jax initialises."""

import os

# The sandbox pre-sets JAX_PLATFORMS=axon (the tunnelled TPU) and the plugin
# overrides the env var, so force the platform through jax.config instead.
# Tests run on the virtual 8-device CPU mesh unless OPENIMPALA_TEST_TPU=1
# opts in to the real chip (slower: every compile crosses the tunnel).
if os.environ.get("OPENIMPALA_TEST_TPU", "0") != "1":
    import sys

    # Keep the tunnelled-TPU plugin entirely out of CPU test processes: it
    # is injected via PYTHONPATH and, even when jax_platforms=cpu deselects
    # it, its client threads occasionally SIGABRT mid-suite (observed as
    # intermittent "Fatal Python error: Aborted" with no Python-level
    # cause).  Stripping its sys.path entry before the first jax import
    # prevents plugin discovery altogether.
    sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
    os.environ.pop("JAX_PLATFORMS", None)

    _flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in _flags:
        _flags += " --xla_force_host_platform_device_count=8"
    # Raise XLA:CPU's 40 s collective-rendezvous SIGABRT deadline: 8 device
    # threads share one physical core here, and under host load a straggler
    # past 40 s is a scheduling artifact, not a hang (verified with a forced
    # 50 s straggler — warns, completes).
    for _tf in ("--xla_cpu_collective_call_terminate_timeout_seconds=900",
                "--xla_cpu_collective_timeout_seconds=900"):
        if _tf.split("=")[0] not in _flags:
            _flags += " " + _tf
    os.environ["XLA_FLAGS"] = _flags.strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/data"
REFERENCE_TIF = "/root/reference/SampleData_2Phase_stack_3d_1bit.tif"


@pytest.fixture(scope="session")
def sample_tif_path():
    if not os.path.exists(REFERENCE_TIF):
        pytest.skip("bundled reference sample volume not available")
    return REFERENCE_TIF


@pytest.fixture(scope="session")
def sample_hdf5_path():
    p = os.path.join(REFERENCE_DATA, "SampleData_2Phase_3d.hdf5")
    if not os.path.exists(p):
        pytest.skip("bundled reference HDF5 sample not available")
    return p


@pytest.fixture(scope="session")
def sample_raw_path():
    p = os.path.join(REFERENCE_DATA, "SampleData_2Phase_stack_3d_uint8.raw")
    if not os.path.exists(p):
        pytest.skip("bundled reference RAW sample not available")
    return p


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def blob_phase():
    """A small percolating random two-phase volume used across tests."""
    r = np.random.default_rng(7)
    return (r.random((20, 18, 16)) < 0.65).astype(np.int32)
