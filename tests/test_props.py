"""Physics-driver tests: analytic invariants the reference's test suite
checks (SURVEY.md §4) plus golden cross-checks between methods."""

import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

from openimpala_tpu.props.effective_diffusivity import effective_diffusivity
from openimpala_tpu.props.rev import rev_study, CSV_HEADER
from openimpala_tpu.props.tortuosity import tortuosity
from openimpala_tpu.props.tortuosity_direct import tortuosity_direct
from openimpala_tpu.props.volume_fraction import volume_fraction, volume_fraction_counts


class TestVolumeFraction:
    def test_sums_to_one(self, blob_phase):
        vf0 = volume_fraction(blob_phase, 0)
        vf1 = volume_fraction(blob_phase, 1)
        assert vf0 + vf1 == pytest.approx(1.0, abs=1e-12)  # tVolumeFraction.cpp:398-413

    def test_counts_match_direct_sum(self, blob_phase):
        pc, tc = volume_fraction_counts(blob_phase, 1)
        assert pc == int((blob_phase == 1).sum())
        assert tc == blob_phase.size

    def test_local_counts_per_shard(self, blob_phase):
        """local=True on a sharded volume: per-shard counts (the reference's
        skip-the-reduction mode, VolumeFraction.cpp:22-66) that sum to the
        global counts."""
        import jax
        import jax.numpy as jnp

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device mesh")
        from openimpala_tpu.parallel.mesh import make_mesh, shard_volume

        b = np.asarray(blob_phase)
        vol = np.concatenate([b, b[:4]], axis=0)  # X=24, mesh-divisible
        mesh = make_mesh(n_devices=8)
        arr = shard_volume(jnp.asarray(np.ascontiguousarray(vol)), mesh)
        counts, totals = volume_fraction_counts(arr, 1, local=True)
        assert len(counts) == 8 and len(totals) == 8
        assert sum(counts) == int((vol == 1).sum())
        assert sum(totals) == vol.size


class TestTortuosity:
    def test_full_pore_tau_is_discrete_one(self):
        # exact discrete result is (N-1)/N: the Dirichlet planes sit on cell
        # centres so the ramp spans N-1 spacings but L = N (reference
        # discretisation, TortuosityHypreFill.F90:188-262)
        n = 12
        phase = np.ones((n, 10, 8), np.int32)
        r = tortuosity(phase, 1, "X", precond="jacobi", inner_dtype=None)
        assert r.converged and r.flux_conserved
        assert r.value == pytest.approx((n - 1) / n, rel=1e-9)

    def test_straight_channels(self):
        phase = np.zeros((10, 6, 6), np.int32)
        phase[:, 1, 1] = 1
        phase[:, 4, 3] = 1
        r = tortuosity(phase, 1, "X", precond="jacobi", inner_dtype=None)
        assert r.converged
        # two straight channels: same discrete tau as full pore
        assert r.value == pytest.approx(9 / 10, rel=1e-9)
        assert r.active_vf == pytest.approx(20 / phase.size)

    def test_blocked_domain_returns_nan(self):
        phase = np.zeros((8, 8, 8), np.int32)
        phase[:3, :, :] = 1  # slab does not reach the far X face
        r = tortuosity(phase, 1, "X")
        assert math.isnan(r.value)
        assert r.active_vf == 0.0

    def test_anisotropic_dx_matches_dense_oracle(self, blob_phase):
        """Anisotropic spacing packs per-axis counts (ops/stencil.py
        pack_code_axes) and runs the same solver stack; the solved
        potential must match the independent dense assembly."""
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from reference_oracle import assemble_tortuosity_dense

        dx = (1.0, 0.5, 2.0)
        phase = np.asarray(blob_phase)
        r = tortuosity(phase, 1, 0, eps=1e-12, dx=dx, inner_dtype=None,
                       return_fields=True, mesh=None)
        assert r.converged
        from openimpala_tpu.ops.floodfill import percolation_mask

        active, _ = percolation_mask(phase, 1, 0)
        A, b, _ = assemble_tortuosity_dense(np.asarray(active), 0, -1.0, 1.0,
                                            dx=dx)
        x_direct = np.linalg.solve(A, b).reshape(phase.shape)
        np.testing.assert_allclose(np.asarray(r.phi), x_direct, atol=1e-8)

    def test_tau_invariant_under_uniform_dx(self, blob_phase):
        """Tortuosity is dimensionless: scaling the (isotropic) voxel size
        rescales fluxes and geometry consistently, leaving tau unchanged."""
        phase = np.asarray(blob_phase)
        a = tortuosity(phase, 1, 0, eps=1e-11, mesh=None)
        b = tortuosity(phase, 1, 0, eps=1e-11, dx=(2.5, 2.5, 2.5), mesh=None)
        assert a.value == pytest.approx(b.value, rel=1e-6)

    def test_flux_conservation_gate(self, blob_phase):
        r = tortuosity(blob_phase, 1, "X", precond="jacobi", inner_dtype=None)
        assert r.converged
        assert r.flux_conserved
        assert r.flux_rel_diff <= 1e-6  # TortuosityHypre.cpp:794
        # in/out fluxes have the same sign convention and magnitude
        assert abs(abs(r.flux_in) - abs(r.flux_out)) / abs(r.flux_in) < 1e-6

    def test_directions_differ_but_finite(self, blob_phase):
        taus = [tortuosity(blob_phase, 1, d, precond="jacobi", inner_dtype=None).value
                for d in (0, 1, 2)]
        assert all(math.isfinite(t) and t >= 0.9 for t in taus)

    def test_solver_paths_agree(self, blob_phase):
        a = tortuosity(blob_phase, 1, "Y", precond="jacobi", inner_dtype=None)
        b = tortuosity(blob_phase, 1, "Y", precond="mg", inner_dtype=jnp.float32)
        c = tortuosity(blob_phase, 1, "Y", method="flexgmres", precond="jacobi",
                       inner_dtype=jnp.float32)
        # convergence at eps=1e-9 bounds derived-quantity agreement at ~1e-6
        # (condition-number amplification) — the BASELINE.md acceptance bar
        assert a.value == pytest.approx(b.value, rel=1e-6)
        assert a.value == pytest.approx(c.value, rel=1e-6)

    def test_return_history(self, blob_phase):
        """Opt-in residual history on the tortuosity driver (SURVEY §5):
        outer refinement-round residuals end at the converged point."""
        r = tortuosity(blob_phase, 1, "X", precond="jacobi",
                       inner_dtype=jnp.float32, return_history=True)
        assert r.converged and r.history is not None
        assert r.history.inner and r.history.outer
        assert r.history.outer[-1][1] == pytest.approx(r.rel_res)
        assert r.history.outer[-1][1] <= 1e-9
        # default stays off
        off = tortuosity(blob_phase, 1, "X", precond="jacobi",
                         inner_dtype=None)
        assert off.history is None

    def test_phase_zero_analysis(self, blob_phase):
        r = tortuosity(blob_phase, 0, "X", precond="jacobi", inner_dtype=None)
        # phase 0 is the minority phase here; may or may not percolate, but
        # the call must return a well-defined result either way
        assert r.active_vf >= 0.0
        if r.active_vf > 0:
            assert r.converged


class TestEffectiveDiffusivity:
    def test_full_pore_identity(self):
        phase = np.ones((8, 8, 8), np.int32)
        res = effective_diffusivity(phase, 1, precond="jacobi", inner_dtype=None)
        assert res.converged
        np.testing.assert_allclose(res.deff, np.eye(3), atol=1e-12)

    def test_straight_channel_dxx_equals_vf(self):
        phase = np.zeros((8, 6, 6), np.int32)
        phase[:, 2, 2] = 1
        res = effective_diffusivity(phase, 1, precond="jacobi", inner_dtype=None)
        vf = volume_fraction(phase, 1)
        assert res.converged
        assert res.deff[0, 0] == pytest.approx(vf, rel=1e-9)
        # For a single-cell-wide channel the transverse cell problems have
        # identically zero rhs (interface terms cancel against the central
        # D-difference, EffDiffFillMtx.F90:156-232), so chi_y = chi_z = 0 and
        # the reference's discrete tensor gives D_yy = D_zz = VF as well —
        # the 1-voxel feature is below the scheme's resolution.
        assert res.deff[1, 1] == pytest.approx(vf, rel=1e-9)
        assert res.deff[2, 2] == pytest.approx(vf, rel=1e-9)

    def test_symmetry_and_bounds(self, blob_phase):
        res = effective_diffusivity(blob_phase, 1, precond="jacobi", inner_dtype=None)
        assert res.converged
        d = res.deff
        # D symmetry (tEffectiveDiffusivity.cpp:424-436)
        np.testing.assert_allclose(d, d.T, atol=1e-8)
        # 0 <= D_ii, and D_ii < 1 for this fixture (the reference only
        # *warns* above 1, tEffectiveDiffusivity.cpp:439-449; the discrete
        # scheme is not variational so D_ii can slightly exceed VF)
        for i in range(3):
            assert 0.0 <= d[i, i] <= 1.0

    def test_no_active_cells_shortcut(self):
        phase = np.zeros((6, 6, 6), np.int32)
        res = effective_diffusivity(phase, 1)
        assert res.converged
        assert res.iterations == (0, 0, 0)
        np.testing.assert_allclose(res.deff, 0.0)

    def test_precision_paths_agree(self, blob_phase):
        a = effective_diffusivity(blob_phase, 1, precond="jacobi", inner_dtype=None)
        b = effective_diffusivity(blob_phase, 1, precond="mg",
                                  inner_dtype=jnp.float32)
        np.testing.assert_allclose(a.deff, b.deff, atol=1e-8)

    def test_return_history(self, blob_phase):
        """Opt-in residual history (SURVEY §5): one trace per direction on
        the sequential path, a single lane-vector trace when the three chi
        solves ran as lockstep lanes."""
        res = effective_diffusivity(blob_phase, 1, precond="jacobi",
                                    inner_dtype=jnp.float32,
                                    return_history=True)
        assert res.converged and res.history is not None
        if len(res.history) == 1:  # lanes path
            h = res.history[0]
            assert h.inner and all(isinstance(rel, tuple) and len(rel) == 3
                                   for _, rel in h.inner)
        else:
            assert len(res.history) == 3
            for h in res.history:
                assert h.inner and h.outer
        # default stays off
        off = effective_diffusivity(blob_phase, 1, precond="jacobi",
                                    inner_dtype=None)
        assert off.history is None


class TestTortuosityDirect:
    def test_full_pore(self):
        n = 10
        phase = np.ones((n, 6, 6), np.int32)
        r = tortuosity_direct(phase, 1, "X", eps=1e-10, plot_interval=50)
        assert r.converged
        # Dirichlet values live in the ghost cells (N+1 gradient spacings)
        # and the reference's sign convention makes tau negative: -(N+1)/N
        assert r.value == pytest.approx(-(n + 1) / n, rel=1e-3)

    def test_vlo_zero_blocks_inlet_quirk(self):
        # ghost cell-type nint(vlo)=0 == cell_type_blocked: the inlet face
        # carries no flux and the relaxed state is degenerate (reference
        # quirk, Tortuosity_filcc.F90 filbc fills ALL components)
        phase = np.ones((8, 4, 4), np.int32)
        r = tortuosity_direct(phase, 1, "X", vlo=0.0, vhi=1.0, eps=1e-8,
                              plot_interval=50)
        assert abs(r.flux_in) < 1e-12

    def test_agrees_loosely_with_hypre_analogue(self, blob_phase):
        rd = tortuosity_direct(blob_phase, 1, "X", eps=1e-9,
                               plot_interval=200, n_steps=200000)
        rh = tortuosity(blob_phase, 1, "X", precond="jacobi", inner_dtype=None)
        assert rd.converged
        # different BC discretisation (ghost vs cell-centre Dirichlet) and
        # the vf placeholder 1.0: compare conductance magnitudes loosely
        assert abs(rd.value) == pytest.approx(rh.value / rh.active_vf, rel=0.2)


class TestRevStudy:
    def test_csv_schema_and_rows(self, blob_phase, tmp_path):
        csv = tmp_path / "rev.csv"
        samples = rev_study(blob_phase, 1, sizes=(8, 12), num_samples=2,
                            precond="jacobi", inner_dtype=None,
                            csv_path=str(csv))
        lines = csv.read_text().strip().splitlines()
        assert lines[0] == CSV_HEADER
        assert len(lines) == 1 + len(samples)
        assert len(samples) == 4
        for s in samples:
            assert s.converged
            assert np.isfinite(s.deff).all()
            assert s.deff[0, 0] >= -1e-12

    def test_small_boxes_skipped(self, blob_phase):
        samples = rev_study(blob_phase, 1, sizes=(4,), num_samples=2,
                            precond="jacobi", inner_dtype=None)
        assert samples == []  # longside < 8 -> skipped (Diffusion.cpp:361)

    def test_auto_batch_policy(self):
        """VERDICT r3 item 5: batch="auto" picks the winner by crop size —
        vmap lanes for underfilling crops, sequential GMG once one crop
        saturates the chip (BASELINE.md "REV batching" measurements)."""
        from openimpala_tpu.props.rev import _resolve_batch

        assert _resolve_batch("auto", (64, 64, 64), 3)
        assert not _resolve_batch("auto", (64, 64, 64), 1)  # lone crop
        assert not _resolve_batch("auto", (256, 256, 256), 8)  # saturates
        # exact-f64 callers (golden config) stay sequential
        assert not _resolve_batch("auto", (64, 64, 64), 3,
                                  {"inner_dtype": None})
        assert _resolve_batch(True, (256, 256, 256), 1)
        assert not _resolve_batch(False, (8, 8, 8), 4)
        # the batched solver hard-codes CG + stateless Chebyshev: "auto"
        # must not silently override a validated solver/preconditioner
        # request (code-review r4)
        assert not _resolve_batch("auto", (64, 64, 64), 3, method="gmres")
        assert not _resolve_batch("auto", (64, 64, 64), 3, precond="jacobi")
        assert _resolve_batch("auto", (64, 64, 64), 3, method="CG")
        # config-string tokens parse as booleans (bool("false") is True!)
        assert not _resolve_batch("false", (64, 64, 64), 3)
        assert not _resolve_batch("0", (64, 64, 64), 3)
        assert _resolve_batch("true", (256, 256, 256), 1)

    def test_auto_equals_batched_for_small_crops(self, blob_phase):
        auto = rev_study(blob_phase, 1, sizes=(10,), num_samples=3)
        bat = rev_study(blob_phase, 1, sizes=(10,), num_samples=3,
                        batch=True)
        assert len(auto) == len(bat) == 3
        for a, b in zip(auto, bat):
            np.testing.assert_array_equal(a.deff, b.deff)  # identical path

    def test_batched_matches_sequential(self, blob_phase):
        seq = rev_study(blob_phase, 1, sizes=(10,), num_samples=3,
                        precond="jacobi", inner_dtype=None)
        bat = rev_study(blob_phase, 1, sizes=(10,), num_samples=3, batch=True)
        assert len(seq) == len(bat) == 3
        for a, b in zip(seq, bat):
            assert a.seed == b.seed and a.actual_size == b.actual_size
            np.testing.assert_allclose(a.deff, b.deff, atol=1e-7)

    @pytest.mark.skipif(os.environ.get("OPENIMPALA_HEAVY_TESTS") != "1",
                        reason="~5 min on CPU; enabled in scripts/ci.sh")
    def test_batched_matches_sequential_64cubed(self):
        """Production-scale parity (VERDICT r1 item 5): two 64^3 crops
        through the Chebyshev-preconditioned, chunk-dispatched, HBM-grouped
        batched path vs the sequential GMG driver, both to 1e-9."""
        from openimpala_tpu.props.effective_diffusivity import effective_diffusivity
        from openimpala_tpu.solve.batched import batched_deff

        rng = np.random.default_rng(3)
        coarse = rng.standard_normal((10, 10, 10)).astype(np.float32)
        field = np.kron(coarse, np.ones((8, 8, 8), np.float32))
        phase = (field < np.quantile(field, 0.55)).astype(np.int8)
        crops = np.stack([phase[:64, :64, :64], phase[16:80, 8:72, 4:68]])

        deffs, convs = batched_deff(crops, 1, eps=1e-9)
        assert convs.all()
        for crop, d in zip(crops, deffs):
            want = effective_diffusivity(crop, 1, eps=1e-9, mesh=None).deff
            np.testing.assert_allclose(d, want, atol=1e-9)

    @pytest.mark.skipif(os.environ.get("OPENIMPALA_HEAVY_TESTS") != "1",
                        reason="96^3 batched parity (heavy tier)")
    def test_batched_96cubed_grouping_engages(self):
        """VERDICT r2 item 10: the batched path at >= 96^3 crops with the
        AUTO memory-grouping logic actually splitting the batch (shrunken
        HBM budget -> 2 crops per group, 3 crops -> 2 groups), checked
        against the sequential GMG driver to 1e-9."""
        from openimpala_tpu.props.effective_diffusivity import (
            effective_diffusivity,
        )
        from openimpala_tpu.solve.batched import _auto_group_size, batched_deff

        n = 96
        rng = np.random.default_rng(5)
        coarse = rng.standard_normal((n // 8,) * 3).astype(np.float32)
        field = np.kron(coarse, np.ones((8, 8, 8), np.float32))
        phase = (field < np.quantile(field, 0.5)).astype(np.int8)
        crops = np.stack([phase, np.roll(phase, 17, axis=0),
                          np.roll(phase, 31, axis=2)])

        from openimpala_tpu.solve.batched import FIELDS_PER_CROP

        budget = FIELDS_PER_CROP * 2 * n ** 3 * 4  # exactly two crops/group
        assert _auto_group_size((n, n, n), budget_bytes=budget) == 2

        deffs, convs = batched_deff(crops, 1, eps=1e-9, budget_bytes=budget)
        assert convs.all()
        for crop, d in zip(crops, deffs):
            want = effective_diffusivity(crop, 1, eps=1e-9, mesh=None).deff
            np.testing.assert_allclose(d, want, atol=1e-8)
