"""Golden-value regression tests on the bundled 100^3 sample volume.

The reference ships no golden numbers (its tests check convergence and
invariants only — SURVEY.md §4), so these values were computed ONCE by this
framework's float64 path at eps=1e-10 (scripts/golden_gen.py) and pin every
future solver/kernel change to 1e-6 — the BASELINE.md agreement bar.  The
float32+refinement TPU path must land on the same numbers.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__),
                                     "golden_sample_values.json")))


@pytest.fixture(scope="module")
def sample_phase(sample_tif_path):
    from openimpala_tpu.io.tiff import TiffReader

    return TiffReader(sample_tif_path).threshold(0.5)


def test_volume_fractions(sample_phase):
    from openimpala_tpu.props.volume_fraction import volume_fraction

    assert volume_fraction(sample_phase, 0) == pytest.approx(GOLDEN["vf_phase0"], abs=1e-12)
    assert volume_fraction(sample_phase, 1) == pytest.approx(GOLDEN["vf_phase1"], abs=1e-12)


@pytest.mark.parametrize("pid,d", [(0, "X"), (1, "X"), (1, "Y")])
def test_tortuosity_golden_f64(sample_phase, pid, d):
    from openimpala_tpu.props.tortuosity import tortuosity

    res = tortuosity(sample_phase, pid, d, eps=1e-10, precond="mg",
                     inner_dtype=None)
    assert res.converged and res.flux_conserved
    assert res.active_vf == pytest.approx(GOLDEN[f"active_vf_p{pid}_{d}"], abs=1e-12)
    assert res.value == pytest.approx(GOLDEN[f"tau_p{pid}_{d}"], rel=1e-6)


def test_tortuosity_golden_mixed_precision(sample_phase):
    """The float32 Krylov + float64 refinement path (the TPU hot path) must
    reproduce the float64 golden value to 1e-6."""
    from openimpala_tpu.props.tortuosity import tortuosity

    res = tortuosity(sample_phase, 1, "X", eps=1e-9, precond="mg",
                     inner_dtype=jnp.float32)
    assert res.converged and res.flux_conserved
    assert res.value == pytest.approx(GOLDEN["tau_p1_X"], rel=1e-6)


def test_deff_golden(sample_phase):
    from openimpala_tpu.props.effective_diffusivity import effective_diffusivity

    res = effective_diffusivity(sample_phase, 1, eps=1e-10, precond="mg",
                                inner_dtype=None)
    assert res.converged
    np.testing.assert_allclose(res.deff, np.asarray(GOLDEN["deff_p1"]),
                               rtol=1e-6, atol=1e-9)
    # symmetry to solver tolerance (tEffectiveDiffusivity.cpp:424-436)
    np.testing.assert_allclose(res.deff, np.asarray(res.deff).T, atol=1e-7)
