"""Native C++ runtime (native/impala_native.cpp) vs pure-Python parity."""

import numpy as np
import pytest

from openimpala_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain)"
)


def test_threshold_decode_all_dtypes(rng):
    for dt in ["|u1", "|i1", "<i2", ">i2", "<u2", ">u2", "<i4", ">i4",
               "<u4", ">u4", "<f4", ">f4", "<f8", ">f8"]:
        vals = (rng.random((9, 7, 5)) * 100).astype(np.dtype(dt))
        got = native.threshold_decode(vals, 50.0, 1, 0)
        want = (vals.astype(np.float64) > 50.0).astype(np.int8)
        np.testing.assert_array_equal(got, want, err_msg=dt)


def test_unpack_bits_fill_orders():
    packed = np.array([0b10110001, 0b01000000], np.uint8)
    msb = native.unpack_bits(packed, 10, fill_order=1)
    np.testing.assert_array_equal(msb, [1, 0, 1, 1, 0, 0, 0, 1, 0, 1])
    lsb = native.unpack_bits(packed, 10, fill_order=2)
    np.testing.assert_array_equal(lsb, [1, 0, 0, 0, 1, 1, 0, 1, 0, 0])


def test_percolation_matches_host(blob_phase):
    from openimpala_tpu.ops.floodfill import percolation_mask

    for d in (0, 1, 2):
        host, vf_h = percolation_mask(blob_phase, 1, d, method="host")
        nat, vf_n = percolation_mask(blob_phase, 1, d, method="native")
        np.testing.assert_array_equal(np.asarray(nat), np.asarray(host))
        assert vf_n == pytest.approx(vf_h)


def test_percolation_no_path():
    phase = np.zeros((8, 8, 8), np.int8)
    phase[:4] = 1
    mask, n = native.percolation_mask(np.ascontiguousarray(phase == 1, np.int8), 0)
    assert n == 0 and not mask.any()


def test_remspot_matches_python(rng):
    import jax.numpy as jnp

    from openimpala_tpu.ops.filters import remspot as remspot_py

    phase = (rng.random((12, 10, 8)) < 0.5).astype(np.int32)
    got, flips = native.remspot(phase)
    want = np.asarray(remspot_py(jnp.asarray(np.int64(phase)), 1))
    np.testing.assert_array_equal(got, want.astype(np.int32))
    assert flips == int((got != phase).sum())
