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


@pytest.mark.parametrize("shape", [(10, 16, 128), (9, 16, 128), (32, 24, 256)])
def test_v2_rolling_window_matches_xla(shape, rng):
    from openimpala_tpu.ops.stencil_pallas import (
        stencil_matvec_pallas_v2,
        supports_v2,
        _rings_for,
    )

    mask = rng.random(shape) < 0.7
    system = make_tortuosity_system(jnp.asarray(mask), 0, -1.0, 1.0,
                                    dtype=jnp.float32)
    x = jnp.where(system.free,
                  jnp.asarray(rng.standard_normal(shape), jnp.float32), 0.0)
    want = np.asarray(system.apply(x))
    got = np.asarray(stencil_matvec_pallas_v2(
        x, system.diag, system.free, system.w, system.periodic,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_v2_ring_selection():
    from openimpala_tpu.ops.stencil_pallas import _rings_for

    assert _rings_for(256 * 256 * 4) == (8, 4)   # 256^3: deep prefetch
    assert _rings_for(512 * 512 * 4) is not None  # 512^3 must be supported
    assert _rings_for(2048 * 2048 * 4) is None    # plane too big for VMEM


@pytest.mark.parametrize("shape", [(10, 16, 128), (32, 24, 256)])
@pytest.mark.parametrize("periodic_x", [False, True])
def test_v3_modes_match_xla(shape, periodic_x, rng):
    """The v3 fused engine (matvec+dot / resid / sweep) against the XLA
    reference expressions, both BC regimes."""
    from openimpala_tpu.ops.stencil import apply_restricted_xla
    from openimpala_tpu.ops.stencil_pallas import fused_stencil_pallas

    mask = rng.random(shape) < 0.7
    if periodic_x:
        system = make_cell_problem_system(jnp.asarray(mask), 0,
                                          dtype=jnp.float32)
    else:
        system = make_tortuosity_system(jnp.asarray(mask), 0, -1.0, 1.0,
                                        dtype=jnp.float32)
    x = jnp.where(system.free,
                  jnp.asarray(rng.standard_normal(shape), jnp.float32), 0.0)
    r = jnp.where(system.free,
                  jnp.asarray(rng.standard_normal(shape), jnp.float32), 0.0)
    diag = jnp.broadcast_to(jnp.asarray(system.diag, jnp.float32), shape)
    W, PER = system.w, system.periodic

    ax = apply_restricted_xla(x, diag, system.free, W, PER)

    out, dot = fused_stencil_pallas("matvec", x, None, system.code,
                                    W, PER, with_dot=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ax),
                               rtol=1e-5, atol=1e-5)
    assert float(dot) == pytest.approx(float(jnp.sum(ax * x)), rel=1e-4)

    got = fused_stencil_pallas("resid", x, r, system.code, W, PER,
                               interpret=True)
    want = jnp.where(system.free, r - ax, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    got = fused_stencil_pallas("sweep", x, r, system.code, W, PER,
                               omega=0.9, interpret=True)
    inv_d = jnp.where(system.free & (diag > 0),
                      0.9 / jnp.where(diag > 0, diag, 1.0), 0.0)
    want = x + inv_d * (r - ax)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("periodic_x", [False, True])
def test_conductance_kernel_matches_xla(periodic_x, rng):
    """The coarse-level conductance kernel (matvec + sweep) against the
    ConductanceLevel roll expressions, both BC regimes."""
    from openimpala_tpu.ops.stencil_pallas import fused_conductance_pallas
    from openimpala_tpu.solve.preconditioners import fine_conductances

    shape = (16, 32, 256)
    mask = rng.random(shape) < 0.7
    if periodic_x:
        system = make_cell_problem_system(jnp.asarray(mask), 0,
                                          dtype=jnp.float32)
    else:
        system = make_tortuosity_system(jnp.asarray(mask), 0, -1.0, 1.0,
                                        dtype=jnp.float32)
    # fine-grid conductances keep the plane size kernel-compatible; the
    # coarse levels are the same operator with different coefficients
    lvl = fine_conductances(system)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    r = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    want = np.asarray(lvl.apply(x))
    got = np.asarray(fused_conductance_pallas(
        "matvec", x, None, lvl.cx, lvl.cy, lvl.cz, lvl.diag, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    inv_d = jnp.where(lvl.free, 0.9 / jnp.where(lvl.free, lvl.diag, 1.0), 0.0)
    want = np.asarray(x + inv_d * (r - lvl.apply(x)))
    got = np.asarray(fused_conductance_pallas(
        "sweep", x, r, lvl.cx, lvl.cy, lvl.cz, lvl.diag, omega=0.9,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(10, 16, 256), (32, 32, 256)])
def test_restrict_mode_matches_blocksum(shape, rng):
    """Fused resid+restriction: equals blocksum(free ? r - Ax : 0)."""
    from openimpala_tpu.ops.stencil import apply_restricted_xla
    from openimpala_tpu.ops.stencil_pallas import fused_stencil_pallas

    mask = rng.random(shape) < 0.7
    system = make_tortuosity_system(jnp.asarray(mask), 0, -1.0, 1.0,
                                    dtype=jnp.float32)
    x = jnp.where(system.free,
                  jnp.asarray(rng.standard_normal(shape), jnp.float32), 0.0)
    r = jnp.where(system.free,
                  jnp.asarray(rng.standard_normal(shape), jnp.float32), 0.0)
    diag = jnp.broadcast_to(jnp.asarray(system.diag, jnp.float32), shape)

    resid = jnp.where(system.free,
                      r - apply_restricted_xla(x, diag, system.free,
                                               system.w, system.periodic), 0.0)
    want = np.asarray(resid).reshape(
        shape[0] // 2, 2, shape[1] // 2, 2, shape[2] // 2, 2
    ).sum(axis=(1, 3, 5))
    got = fused_stencil_pallas("restrict", x, r, system.code,
                               system.w, system.periodic, interpret=True)
    assert got.shape == (shape[0] // 2, shape[1] // 2, shape[2] // 2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
