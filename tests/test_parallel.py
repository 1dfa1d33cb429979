"""Multi-device tests on the 8-way virtual CPU mesh (the stand-in for a TPU
pod slice — conftest sets --xla_force_host_platform_device_count=8)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openimpala_tpu.ops.masks import linear_ramp
from openimpala_tpu.ops.stencil import make_tortuosity_system, neighbor_sum
from openimpala_tpu.parallel.halo import pad_halo, shard_map_stencil_apply
from openimpala_tpu.parallel.mesh import make_mesh, shard_volume
from openimpala_tpu.solve.cg import cg

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

SHAPE = (32, 12, 10)


def _global_neighbor_sum(x, periodic):
    return neighbor_sum(x, (1.0, 1.0, 1.0), periodic)


@pytest.mark.parametrize("periodic_x", [False, True])
def test_shard_map_halo_matches_global(rng, periodic_x):
    periodic = (periodic_x, False, False)
    x = rng.standard_normal(SHAPE)
    mesh = make_mesh(n_devices=8)

    def apply_padded(xp):
        return (
            xp[:-2, 1:-1, 1:-1] + xp[2:, 1:-1, 1:-1]
            + xp[1:-1, :-2, 1:-1] + xp[1:-1, 2:, 1:-1]
            + xp[1:-1, 1:-1, :-2] + xp[1:-1, 1:-1, 2:]
        )

    sharded_op = shard_map_stencil_apply(apply_padded, mesh, periodic)
    xs = shard_volume(jnp.asarray(x), mesh)
    got = np.asarray(jax.jit(sharded_op)(xs))
    want = np.asarray(_global_neighbor_sum(jnp.asarray(x), periodic))
    np.testing.assert_allclose(got, want, atol=1e-13)


def test_gspmd_matvec_matches_single_device(rng):
    """The global-jnp operator under jit with sharded inputs must equal the
    single-device result — XLA inserts the halo collectives (GSPMD path)."""
    active = rng.random(SHAPE) < 0.7
    system = make_tortuosity_system(jnp.asarray(active), 0, -1.0, 1.0)
    x = jnp.where(system.free, jnp.asarray(rng.standard_normal(SHAPE)), 0.0)

    want = np.asarray(system.apply(x))

    mesh = make_mesh(n_devices=8)
    xs = shard_volume(x, mesh)
    sys_sharded = jax.tree.map(
        lambda a: shard_volume(a, mesh) if getattr(a, "ndim", 0) == 3 else a, system
    )
    got = np.asarray(jax.jit(lambda s, v: s.apply(v))(sys_sharded, xs))
    np.testing.assert_allclose(got, want, atol=1e-13)


def test_sharded_cg_solve_matches(rng):
    active = rng.random(SHAPE) < 0.75
    active[:, 5, 5] = True
    system = make_tortuosity_system(jnp.asarray(active), 0, -1.0, 1.0)
    ramp = linear_ramp(SHAPE, 0, -1.0, 1.0)
    x0 = jnp.where(system.free, ramp, 0.0)
    r0 = system.initial_residual(x0)

    res_single = cg(system, r0, system.b_norm, 1e-10, 3000)

    mesh = make_mesh(n_devices=8)
    shard3 = lambda a: shard_volume(a, mesh) if getattr(a, "ndim", 0) == 3 else a
    sys_sharded = jax.tree.map(shard3, system)
    res_sharded = cg(sys_sharded, shard3(r0), system.b_norm, 1e-10, 3000)

    assert bool(res_sharded.converged)
    np.testing.assert_allclose(
        np.asarray(res_sharded.z), np.asarray(res_single.z), atol=1e-8
    )


def test_shard_volume_divisibility_check():
    mesh = make_mesh(n_devices=8)
    with pytest.raises(ValueError):
        shard_volume(jnp.zeros((30, 4, 4)), mesh)  # 30 % 8 != 0


def test_tortuosity_driver_sharded_matches_single(rng):
    """The PRODUCTION driver with an explicit mesh must reproduce the
    single-device result exactly (same tau to the solver tolerance),
    including the X-padding path: X=36 is not divisible by 8, so the driver
    pads to 40 with inactive cells and keeps the outlet Dirichlet plane at
    x=35 (hi_plane).  Reference counterpart: rank-count-independent results
    (Diffusion.cpp:174, TortuosityHypre.cpp:584-585)."""
    from openimpala_tpu.props.tortuosity import tortuosity

    phase = (rng.random((36, 16, 16)) < 0.75).astype(np.int32)
    phase[:, 8, 8] = 1  # guarantee percolation along X

    r_single = tortuosity(phase, 1, 0, eps=1e-10, mesh=None,
                          percolation_method="host")
    mesh = make_mesh(n_devices=8)
    r_sharded = tortuosity(phase, 1, 0, eps=1e-10, mesh=mesh,
                           percolation_method="host")

    assert r_sharded.converged and r_sharded.flux_conserved
    assert abs(r_sharded.value - r_single.value) < 1e-7
    assert abs(r_sharded.deff - r_single.deff) < 1e-9
    assert r_sharded.active_vf == r_single.active_vf


@pytest.mark.skipif(os.environ.get("OPENIMPALA_HEAVY_TESTS") != "1",
                    reason="heavy: 192^3 MG-PCG to 1e-9 on the CPU mesh")
def test_tortuosity_sharded_192cubed_heavy(rng):
    """Production-scale sharded parity: a 192^3 blob volume solved with the
    Galerkin-MG-preconditioned CG to the full 1e-9 tolerance on the
    8-device mesh must match the single-device solve (tau, D_eff, fluxes) —
    the configuration a 1024^3 volume runs on a v5p-8."""
    from openimpala_tpu.props.tortuosity import tortuosity

    n = 192
    coarse = rng.standard_normal((n // 8,) * 3)
    phase = (np.kron(coarse, np.ones((8, 8, 8))) <
             np.quantile(coarse, 0.55)).astype(np.int8)
    phase[:, n // 2, n // 2] = 1

    r_single = tortuosity(phase, 1, 0, eps=1e-9, mesh=None,
                          percolation_method="host")
    mesh = make_mesh(n_devices=8)
    r_sharded = tortuosity(phase, 1, 0, eps=1e-9, mesh=mesh,
                           percolation_method="host")
    assert r_sharded.converged and r_sharded.flux_conserved
    assert r_sharded.value == pytest.approx(r_single.value, rel=1e-8)
    assert r_sharded.flux_in == pytest.approx(r_single.flux_in, rel=1e-7)
    assert r_sharded.active_vf == r_single.active_vf


def test_deff_driver_sharded_matches_single(rng):
    """effective_diffusivity with an explicit mesh (X divisible) matches the
    single-device tensor."""
    from openimpala_tpu.props.effective_diffusivity import effective_diffusivity

    phase = (rng.random((32, 12, 12)) < 0.7).astype(np.int32)

    r_single = effective_diffusivity(phase, 1, eps=1e-9, mesh=None)
    mesh = make_mesh(n_devices=8)
    r_sharded = effective_diffusivity(phase, 1, eps=1e-9, mesh=mesh)

    assert r_sharded.converged
    np.testing.assert_allclose(r_sharded.deff, r_single.deff,
                               rtol=1e-7, atol=1e-9)


def test_deff_sharded_lanes_match_sequential(rng):
    """Mesh-sharded lockstep lanes (VERDICT r4 #3): the (L, X, Y, Z) lane
    state rides the GSPMD mesh (lane axis replicated, X sharded) and must
    reproduce the sequential sharded tensor to 1e-9 — and the single-device
    tensor, through the full f32+refinement production path."""
    from openimpala_tpu.props.effective_diffusivity import effective_diffusivity

    phase = (rng.random((32, 12, 12)) < 0.7).astype(np.int32)
    mesh = make_mesh(n_devices=8)

    r_lanes = effective_diffusivity(phase, 1, eps=1e-9, mesh=mesh, lanes=True)
    r_seq = effective_diffusivity(phase, 1, eps=1e-9, mesh=mesh, lanes=False)
    r_single = effective_diffusivity(phase, 1, eps=1e-9, mesh=None,
                                     lanes=False)

    assert r_lanes.converged and r_seq.converged
    np.testing.assert_allclose(r_lanes.deff, r_seq.deff, rtol=0, atol=1e-9)
    np.testing.assert_allclose(r_lanes.deff, r_single.deff, rtol=0, atol=1e-9)


@pytest.mark.parametrize("direction", [0, 1])
def test_tortuosity_from_pre_sharded_volume(tmp_path, rng, direction):
    """The fully device-resident flow-through path: distributed ingest ->
    device flood-fill percolation (GSPMD) -> sharded solve, with the outlet
    Dirichlet plane and flood seeds at the ORIGINAL face despite the ingest
    padding.  Must match the host-percolation driver path."""
    from openimpala_tpu.io import RawReader, threshold_sharded
    from openimpala_tpu.props.tortuosity import tortuosity

    vol = (rng.random((36, 16, 16)) * 255).astype(np.uint8)
    vol[:, 8, 8] = 255  # guarantee X percolation
    vol[18, :, 8] = 255  # and Y percolation
    path = tmp_path / "v.raw"
    vol.transpose(2, 1, 0).tofile(path)
    reader = RawReader(str(path), 36, 16, 16, "UINT8")

    mesh = make_mesh(n_devices=8)
    arr, orig_shape = threshold_sharded(reader, 127.0, mesh)
    r_dev = tortuosity(arr, 1, direction, eps=1e-10,
                       original_shape=orig_shape)
    phase = reader.threshold(127.0)
    r_host = tortuosity(phase, 1, direction, eps=1e-10, mesh=None,
                        percolation_method="host")
    assert r_dev.converged and r_host.converged
    assert r_dev.active_vf == pytest.approx(r_host.active_vf, abs=1e-12)
    assert r_dev.value == pytest.approx(r_host.value, rel=1e-8)
    assert r_dev.flux_in == pytest.approx(r_host.flux_in, rel=1e-7)


def test_threshold_sharded_raw_hyperslab(tmp_path, rng):
    """Distributed ingest (io/ingest.py): per-device hyperslab reads ->
    make_array_from_single_device_arrays, X padded with PAD_FILL.  Must
    equal the single-host threshold on the physical domain."""
    from openimpala_tpu.io import RawReader, threshold_sharded
    from openimpala_tpu.io.ingest import PAD_FILL

    vol = (rng.random((36, 16, 16)) * 255).astype(np.uint8)
    path = tmp_path / "v.raw"
    vol.transpose(2, 1, 0).tofile(path)  # file layout (Z, Y, X)
    reader = RawReader(str(path), 36, 16, 16, "UINT8")

    mesh = make_mesh(n_devices=8)
    arr, shape = threshold_sharded(reader, 127.0, mesh)
    assert shape == (36, 16, 16)
    assert arr.shape == (40, 16, 16)  # padded to the mesh
    assert len(arr.sharding.device_set) == 8
    got = np.asarray(arr)
    np.testing.assert_array_equal(got[:36], reader.threshold(127.0))
    assert (got[36:] == PAD_FILL).all()


def test_threshold_sharded_tiff_stream(tmp_path, rng):
    """The z-streaming ingest path (TIFF pages) matches the reader."""
    from PIL import Image

    from openimpala_tpu.io import TiffReader, threshold_sharded

    vol = (rng.random((32, 16, 12)) * 255).astype(np.uint8)  # (X, Y, Z)
    pages = [Image.fromarray(vol[:, :, z].T) for z in range(vol.shape[2])]
    path = tmp_path / "v.tif"
    pages[0].save(path, save_all=True, append_images=pages[1:])
    reader = TiffReader(str(path))

    mesh = make_mesh(n_devices=8)
    arr, shape = threshold_sharded(reader, 127.0, mesh, chunk=5)
    assert shape == (32, 16, 12)
    np.testing.assert_array_equal(np.asarray(arr), reader.threshold(127.0))


def test_threshold_sharded_tiff_z_partition(tmp_path, rng):
    """The multi-host Z-page-partitioned ingest (VERDICT r4 #4): forced on
    a single process, the Z-sharded decode + jitted all-to-all reshard must
    produce exactly the same X-sharded array as the streaming path —
    including the X padding and a Z extent not divisible by the mesh."""
    from PIL import Image

    from openimpala_tpu.io import TiffReader, threshold_sharded
    from openimpala_tpu.io.ingest import PAD_FILL

    vol = (rng.random((36, 16, 13)) * 255).astype(np.uint8)  # X pad + Z pad
    pages = [Image.fromarray(vol[:, :, z].T) for z in range(vol.shape[2])]
    path = tmp_path / "v.tif"
    pages[0].save(path, save_all=True, append_images=pages[1:])
    reader = TiffReader(str(path))

    mesh = make_mesh(n_devices=8)
    arr, shape = threshold_sharded(reader, 127.0, mesh, chunk=3,
                                   z_partition=True)
    ref, _ = threshold_sharded(reader, 127.0, mesh, z_partition=False)
    assert shape == (36, 16, 13)
    assert arr.shape == ref.shape == (40, 16, 13)
    assert arr.sharding.is_equivalent_to(ref.sharding, 3)
    got = np.asarray(arr)
    np.testing.assert_array_equal(got, np.asarray(ref))
    np.testing.assert_array_equal(got[:36], reader.threshold(127.0))
    assert (got[36:] == PAD_FILL).all()


def test_sharded_galerkin_mg_matches_single_device(rng):
    """The Galerkin V-cycle under GSPMD sharding (volume sharded along X
    over the 8-device mesh) must produce the same preconditioned residual
    as the single-device evaluation — the blocksum/face-sum strided slices
    and rolls all lower to collectives transparently."""
    from openimpala_tpu.solve.preconditioners import GalerkinMGPreconditioner

    shape = (32, 16, 8)
    active = rng.random(shape) < 0.7
    active[:, 7, 3] = True
    system = make_tortuosity_system(jnp.asarray(active), 0, -1.0, 1.0)
    M = GalerkinMGPreconditioner.from_system(system)
    r = jnp.where(system.free, jnp.asarray(rng.standard_normal(shape)), 0.0)

    z_single = jax.jit(lambda M_, r_: M_(r_))(M, r)

    mesh = make_mesh(n_devices=8)
    shard3 = lambda a: (shard_volume(a, mesh)
                        if getattr(a, "ndim", 0) == 3 else a)
    M_s = jax.tree.map(shard3, M)
    r_s = shard3(r)
    z_sharded = jax.jit(lambda M_, r_: M_(r_))(M_s, r_s)

    np.testing.assert_allclose(np.asarray(z_sharded), np.asarray(z_single),
                               rtol=1e-12, atol=1e-12)


def test_hdf5_slab_axis_selection(tmp_path, rng):
    """Chunk-aware IO strategy (VERDICT r2 item 8): a C-order (Z,Y,X) file
    only reads proportionally for X hyperslabs when chunks tile X finely;
    contiguous and z-plane-chunked files must stream Z slabs instead
    (reference per-box hyperslabs: HDF5Reader.cpp:287-306)."""
    import h5py

    from openimpala_tpu.io.hdf5 import HDF5Reader

    vol_zyx = (rng.random((12, 16, 32)) * 255).astype(np.uint8)

    p = tmp_path / "contig.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("image", data=vol_zyx)  # contiguous
    r = HDF5Reader(str(p), "image")
    assert r.slab_axis == 2  # strided X reads would touch the whole file

    p = tmp_path / "zplane.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("image", data=vol_zyx, chunks=(1, 16, 32))
    r = HDF5Reader(str(p), "image")
    assert r.slab_axis == 2 and r.slab_chunk == 1

    p = tmp_path / "xtiled.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("image", data=vol_zyx, chunks=(12, 16, 4))
    r = HDF5Reader(str(p), "image")
    assert r.slab_axis == 0 and r.slab_chunk == 4
    # x-slab reads and z-slab reads agree with the full volume
    want = np.ascontiguousarray(vol_zyx.transpose(2, 1, 0))
    np.testing.assert_array_equal(r.read(4, 9), want[4:9])
    np.testing.assert_array_equal(r.read_z(3, 7), want[:, :, 3:7])


def test_hdf5_ingest_reads_each_slab_once(tmp_path, rng):
    """On a z-chunked file the ingest must request every Z range exactly
    once per host (scattering to all 8 device buffers) — NOT once per
    device — so per-host IO ≈ file size (VERDICT r2 'done' criterion)."""
    import h5py

    from openimpala_tpu.io import threshold_sharded
    from openimpala_tpu.io.hdf5 import HDF5Reader

    vol_zyx = (rng.random((24, 16, 32)) * 255).astype(np.uint8)
    p = tmp_path / "v.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("image", data=vol_zyx, chunks=(4, 16, 32))
    reader = HDF5Reader(str(p), "image")
    assert reader.slab_axis == 2 and reader.slab_chunk == 4

    calls = []
    orig = reader.read_slab
    reader.read_slab = lambda lo, hi: (calls.append((lo, hi)), orig(lo, hi))[1]

    mesh = make_mesh(n_devices=8)
    arr, shape = threshold_sharded(reader, 127.0, mesh, chunk=6)
    ingest_calls = list(calls)
    assert shape == (32, 16, 24)
    np.testing.assert_array_equal(np.asarray(arr), reader.threshold(127.0))

    # each Z offset requested exactly once, on chunk-aligned boundaries
    # (chunk=6 rounds up to 8, a multiple of the file's z-chunk extent 4)
    assert ingest_calls == [(0, 8), (8, 16), (16, 24)]


def test_percolation_mask_sharded_matches_host(rng):
    """Per-shard native BFS + boundary-plane exchange (VERDICT r2 item 6)
    must reproduce the host connected-components mask, including a snake
    geometry whose pore path crosses shard boundaries repeatedly (multiple
    exchange rounds)."""
    from openimpala_tpu.io import native
    from openimpala_tpu.ops.floodfill import (percolation_mask,
                                              percolation_mask_sharded)
    from openimpala_tpu.parallel.mesh import shard_volume

    if native.get_lib() is None:
        pytest.skip("native library unavailable")

    # snake: a 1-voxel channel zig-zagging along X through all shards
    n = 32
    phase = np.zeros((n, 16, 12), np.int8)
    y = 2
    for x in range(n):
        phase[x, y, 5] = 1
        if x % 4 == 3:  # jog sideways at shard-boundary-ish pitch
            y = (y + 3) % 14
            phase[x, min(y, 2 + (x * 3) % 12):max(y, 2 + (x * 3) % 12) + 1,
                  5] = 1
    # plus random blobs
    phase |= (rng.random(phase.shape) < 0.3).astype(np.int8)
    phase[:, 8, 8] = 1  # guaranteed percolation

    mesh = make_mesh(n_devices=8)
    phase_sh = shard_volume(jnp.asarray(phase), mesh)
    res = percolation_mask_sharded(phase_sh, 1, 0)
    assert res is not None, "sharded BFS path unavailable"
    active_sh, vf_sh = res
    assert active_sh.sharding == phase_sh.sharding

    active_host, vf_host = percolation_mask(phase, 1, 0, method="host")
    np.testing.assert_array_equal(np.asarray(active_sh), active_host)
    assert vf_sh == pytest.approx(vf_host, abs=1e-12)

    # Y direction too (face seeds live in every shard)
    res_y = percolation_mask_sharded(phase_sh, 1, 1)
    a_y, vf_y = res_y
    ah_y, vfh_y = percolation_mask(phase, 1, 1, method="host")
    np.testing.assert_array_equal(np.asarray(a_y), ah_y)
    assert vf_y == pytest.approx(vfh_y, abs=1e-12)


def test_tortuosity_driver_sharded_sa_matches_single(rng):
    """The PRODUCTION driver with precond="sa" (smoothed-aggregation MG,
    packed OffsetLevel coarse operators) over the mesh must reproduce the
    single-device SA result — certifies the sharded build (probing under
    GSPMD) and V-cycle of the round-3 coarse space end to end.  Reference
    counterpart: rank-count-independent results (Diffusion.cpp:174)."""
    from openimpala_tpu.props.tortuosity import tortuosity

    phase = (rng.random((32, 16, 16)) < 0.75).astype(np.int32)
    phase[:, 8, 8] = 1  # guarantee percolation along X

    r_single = tortuosity(phase, 1, 0, eps=1e-9, mesh=None, precond="sa",
                          percolation_method="host")
    mesh = make_mesh(n_devices=8)
    r_sharded = tortuosity(phase, 1, 0, eps=1e-9, mesh=mesh, precond="sa",
                           percolation_method="host")

    assert r_single.converged and r_sharded.converged
    assert r_sharded.flux_conserved
    assert abs(r_sharded.value - r_single.value) < 1e-7
    assert r_sharded.iterations == r_single.iterations


class TestShardedPackedFill:
    """ops/packfill.py percolation_oneshot_packed_sharded — the
    device-resident distributed percolation (shard_map, cross-shard word
    carries)."""

    @pytest.mark.parametrize("direction", [0, 1, 2])
    def test_parity_vs_host(self, rng, direction):
        from openimpala_tpu.ops.floodfill import _face_slices, flood_fill_host
        from openimpala_tpu.ops.packfill import (
            percolation_oneshot_packed_sharded)

        mesh = make_mesh(n_devices=8)
        phase_ok = rng.random((512, 24, 20)) < 0.4
        sharded = shard_volume(jnp.asarray(phase_ok), mesh)
        res = percolation_oneshot_packed_sharded(sharded, direction)
        assert res is not None
        active, counts = res
        if (phase_ok[_face_slices(direction, True)].any()
                and phase_ok[_face_slices(direction, False)].any()):
            ri, ro = flood_fill_host(phase_ok, direction)
            want = ri & ro
        else:
            want = np.zeros(phase_ok.shape, bool)
        np.testing.assert_array_equal(np.asarray(active), want)
        assert int(np.asarray(counts).sum()) == int(want.sum())
        # the result stays sharded like the input
        assert len(active.sharding.device_set) == 8

    def test_outlet_override_padded_volume(self, rng):
        """Ingest-padded volumes percolate to the ORIGINAL outlet face; the
        padded cells stay inactive (the tortuosity pre-sharded path)."""
        from openimpala_tpu.ops.floodfill import flood_fill_host
        from openimpala_tpu.ops.packfill import (
            percolation_oneshot_packed_sharded)

        mesh = make_mesh(n_devices=8)
        phase_ok = rng.random((256, 16, 16)) < 0.5
        padded = np.pad(phase_ok, ((0, 256), (0, 0), (0, 0)))
        sharded = shard_volume(jnp.asarray(padded), mesh)
        active, counts = percolation_oneshot_packed_sharded(
            sharded, 0, outlet=255)
        ri, ro = flood_fill_host(phase_ok, 0)
        want = np.pad(ri & ro, ((0, 256), (0, 0), (0, 0)))
        np.testing.assert_array_equal(np.asarray(active), want)
        assert int(np.asarray(counts).sum()) == int(want.sum())

    def test_unsupported_layouts_return_none(self, rng):
        from openimpala_tpu.ops.packfill import (
            percolation_oneshot_packed_sharded)

        mesh = make_mesh(n_devices=8)
        # X = 128 not divisible by 32 * 8
        bad = shard_volume(jnp.asarray(rng.random((128, 16, 16)) < 0.5), mesh)
        assert percolation_oneshot_packed_sharded(bad, 0) is None

    @pytest.mark.skipif(os.environ.get("OPENIMPALA_HEAVY_TESTS") != "1",
                        reason="heavy: 192^3 packed sharded fill parity")
    def test_packed_sharded_fill_192cubed_heavy(self, rng):
        """VERDICT r3 item 2 done-criterion: 192^3 blob volume, packed
        shard_map fill vs the host connected-components oracle, exact.
        6 devices: the packed layout needs X % (32 * n_dev) == 0 and
        192 = 32 * 6 (an 8-device mesh would need X >= 256)."""
        from openimpala_tpu.ops.floodfill import flood_fill_host
        from openimpala_tpu.ops.packfill import (
            percolation_oneshot_packed_sharded)

        n = 192
        coarse = rng.standard_normal((n // 8,) * 3)
        phase_ok = np.kron(coarse, np.ones((8, 8, 8))) < np.quantile(
            coarse, 0.55)
        phase_ok[:, n // 2, n // 2] = True
        mesh = make_mesh(n_devices=6)
        sharded = shard_volume(jnp.asarray(phase_ok), mesh)
        active, counts = percolation_oneshot_packed_sharded(sharded, 0)
        ri, ro = flood_fill_host(phase_ok, 0)
        want = ri & ro
        np.testing.assert_array_equal(np.asarray(active), want)
        assert int(np.asarray(counts).sum()) == int(want.sum())
        assert len(active.sharding.device_set) == 6

    def test_percolation_mask_sharded_input_uses_packed_fill(self, rng):
        """percolation_mask on a pre-sharded volume routes to the packed
        shard_map fill (not the O(sum dims) dilation) and matches host."""
        from openimpala_tpu.ops.floodfill import (
            flood_fill_host, percolation_mask)

        mesh = make_mesh(n_devices=8)
        phase = (rng.random((256, 16, 16)) < 0.45).astype(np.int32)
        sharded = shard_volume(jnp.asarray(phase), mesh)
        active, vf = percolation_mask(sharded, 1, 0)
        ri, ro = flood_fill_host(phase == 1, 0)
        want = ri & ro
        np.testing.assert_array_equal(np.asarray(active), want)
        assert vf == pytest.approx(want.sum() / phase.size)


def test_tortuosity_driver_sharded_matches_single_anisotropic(rng):
    """Sharded parity under ANISOTROPIC spacing: the per-axis packed
    geometry (ops/stencil.py pack_code_axes) must decode identically under
    GSPMD — same tau as the single-device solve of the same volume."""
    from openimpala_tpu.props.tortuosity import tortuosity

    phase = (rng.random((32, 16, 16)) < 0.75).astype(np.int32)
    phase[:, 8, 8] = 1  # guarantee percolation along X
    dx = (1.0, 0.5, 2.0)

    r_single = tortuosity(phase, 1, 0, eps=1e-10, dx=dx, mesh=None,
                          percolation_method="host")
    mesh = make_mesh(n_devices=8)
    r_sharded = tortuosity(phase, 1, 0, eps=1e-10, dx=dx, mesh=mesh,
                           percolation_method="host")

    assert r_sharded.converged and r_sharded.flux_conserved
    assert abs(r_sharded.value - r_single.value) < 1e-7
    assert r_sharded.active_vf == r_single.active_vf
