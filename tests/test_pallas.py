"""Pallas TPU kernel equivalence tests (interpreter mode on CPU; the same
kernel runs compiled on TPU — bench.py exercises that path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from openimpala_tpu.ops.stencil import (
    make_cell_problem_system,
    make_tortuosity_system,
)
from openimpala_tpu.ops.stencil_pallas import stencil_matvec_pallas

SHAPE = (10, 16, 128)  # meets the (Y%8, Z%128) layout contract


@pytest.fixture(scope="module")
def mask():
    rng = np.random.default_rng(11)
    return rng.random(SHAPE) < 0.7


def test_tortuosity_kernel_matches_xla(mask, rng):
    system = make_tortuosity_system(jnp.asarray(mask), 0, -1.0, 1.0,
                                    dtype=jnp.float32)
    x = jnp.where(system.free,
                  jnp.asarray(rng.standard_normal(SHAPE), jnp.float32), 0.0)
    want = np.asarray(system.apply(x))  # XLA reference path (CPU)
    got = np.asarray(stencil_matvec_pallas(
        x, system.diag, system.free, system.w, system.periodic,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_cell_problem_kernel_matches_xla_periodic(mask, rng):
    system = make_cell_problem_system(jnp.asarray(mask), 1, dtype=jnp.float32)
    x = jnp.where(system.free,
                  jnp.asarray(rng.standard_normal(SHAPE), jnp.float32), 0.0)
    want = np.asarray(system.apply(x))
    got = np.asarray(stencil_matvec_pallas(
        x, jnp.asarray(system.diag), system.free, system.w, system.periodic,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_fused_dot(mask, rng):
    system = make_tortuosity_system(jnp.asarray(mask), 0, -1.0, 1.0,
                                    dtype=jnp.float32)
    x = jnp.where(system.free,
                  jnp.asarray(rng.standard_normal(SHAPE), jnp.float32), 0.0)
    out, dot = stencil_matvec_pallas(
        x, system.diag, system.free, system.w, system.periodic,
        with_dot=True, interpret=True)
    want = float(jnp.sum(out * x))
    assert float(dot) == pytest.approx(want, rel=1e-5)
