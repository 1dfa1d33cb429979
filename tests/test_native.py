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


def test_pack_eq_matches_numpy(rng):
    """Fused compare+packbits == numpy compare then np.packbits (MSB-first),
    across the supported dtypes; out-of-range ids and odd Z refused (fall
    back to the numpy route instead of int8-wrapping false matches)."""
    if not native.available() or not hasattr(native.get_lib(), "impala_pack_eq"):
        pytest.skip("native library without pack_eq")
    for dt, pid in [(np.int8, 1), (np.uint8, 3), (np.int32, -7)]:
        lo = -5 if np.dtype(dt).kind == "i" else 0
        ph = rng.integers(lo, 6, (24, 16, 16)).astype(dt)
        got = native.pack_eq(ph, pid)
        want = np.packbits(ph == pid, axis=-1)
        np.testing.assert_array_equal(got, want)
    # uint8 ids in [128, 255] ride the exact int8 reinterpretation (both the
    # volume bytes and the id pass through the same cast — a bijection)
    ph = rng.integers(0, 256, (8, 8, 16)).astype(np.uint8)
    got = native.pack_eq(ph, 200)
    np.testing.assert_array_equal(got, np.packbits(ph == 200, axis=-1))
    assert native.pack_eq(np.zeros((8, 8, 8), np.uint8), 300) is None
    assert native.pack_eq(np.zeros((8, 8, 8), np.int8), 300) is None
    assert native.pack_eq(np.zeros((8, 8, 9), np.int8), 1) is None


def test_percolation_mask_phase_uint8_high_id(rng):
    """percolation_mask_phase on a uint8 volume with a phase id >= 128 must
    agree with the host connected-components route (io/native.py
    _reinterpret_phase_id)."""
    from openimpala_tpu.ops.floodfill import percolation_mask

    ph = np.where(rng.random((16, 12, 8)) < 0.6, 200, 3).astype(np.uint8)
    res = native.percolation_mask_phase(ph, 200, 0)
    assert res is not None, "uint8 high-id fast path should be available"
    nat_mask, nat_n = res
    host_mask, vf_h = percolation_mask(ph, 200, 0, method="host")
    np.testing.assert_array_equal(nat_mask, np.asarray(host_mask))
    assert nat_n == int(np.asarray(host_mask).sum())
