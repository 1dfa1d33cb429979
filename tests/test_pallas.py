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


@pytest.mark.parametrize("shape", [(10, 16, 128), (32, 24, 256)])
@pytest.mark.parametrize("periodic_x", [False, True])
def test_v3_modes_match_xla_anisotropic(shape, periodic_x, rng):
    """The v3 engine under ANISOTROPIC spacing: the per-axis packed code
    (ops/stencil.py pack_code_axes) decodes in-kernel to the exact
    weighted-degree diagonal — matvec+dot / resid / sweep vs the XLA
    reference expressions."""
    from openimpala_tpu.ops.stencil import apply_restricted_xla
    from openimpala_tpu.ops.stencil_pallas import fused_stencil_pallas

    mask = rng.random(shape) < 0.7
    dx = (1.0, 0.5, 2.0)
    if periodic_x:
        system = make_cell_problem_system(jnp.asarray(mask), 0, dx=dx,
                                          dtype=jnp.float32)
    else:
        system = make_tortuosity_system(jnp.asarray(mask), 0, -1.0, 1.0,
                                        dx=dx, dtype=jnp.float32)
    assert system.w[0] != system.w[1]  # actually anisotropic
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


# ---------------------------------------------------------------------------
# offset-stencil kernel (SA-MG coarse levels, ops/offset_pallas.py)
# ---------------------------------------------------------------------------


def _random_offset_level(rng, shape, taps=33):
    """Synthetic packed offset stencil with the SA level-1 support shape:
    l_inf<=1 ball + axial +-2 taps, random coefficients (some non-positive
    diagonals, to exercise the resid/sweep masking)."""
    from openimpala_tpu.solve.sa import OffsetLevel

    sup = sorted(set(
        [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
         for k in (-1, 0, 1)]
        + [(2, 0, 0), (-2, 0, 0), (0, 2, 0), (0, -2, 0), (0, 0, 2),
           (0, 0, -2)]))[:taps]
    coeffs = []
    for o in sup:
        c = rng.standard_normal(shape)
        if o == (0, 0, 0):
            # diag bounded away from (0, 0.3): tiny positive diagonals turn
            # omega/d into a huge factor that amplifies f32 rounding beyond
            # any sensible parity tolerance; keep exact zeros (mask coverage)
            c = np.where(np.abs(c) < 0.3, 0.0, 3.0 * c)
        coeffs.append(jnp.asarray(c, jnp.float32))
    return OffsetLevel.from_coeffs(tuple(coeffs), tuple(sup))


@pytest.mark.parametrize("mode", ["apply", "resid", "sweep"])
def test_offset_kernel_matches_xla(mode, rng):
    from openimpala_tpu.ops.offset_pallas import offset_stencil_pallas

    shape = (8, 16, 128)
    lvl = _random_offset_level(rng, shape)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    r = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    if mode == "apply":
        want = np.asarray(lvl.apply_xla(x))
    elif mode == "resid":
        want = np.asarray(jnp.where(lvl.free, r - lvl.apply_xla(x), 0.0))
    else:
        d = lvl.diag
        inv_d = jnp.where(d > 0, 0.9 / jnp.where(d > 0, d, 1.0), 0.0)
        want = np.asarray(x + inv_d * (r - lvl.apply_xla(x)))
    got = np.asarray(offset_stencil_pallas(
        x, lvl.packed, lvl.offsets, mode=mode,
        r=None if mode == "apply" else r, omega=0.9, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_offset_kernel_nn_prefix_subset(rng):
    """n_taps=nn must equal apply_sub with the NN filter (the filtered
    smoother's contract: the packed order puts the l_inf<=1 ball first)."""
    from openimpala_tpu.ops.offset_pallas import offset_stencil_pallas

    shape = (8, 16, 128)
    lvl = _random_offset_level(rng, shape)
    nn_set = tuple(o for o in lvl.offsets if max(abs(c) for c in o) <= 1)
    assert set(lvl.offsets[: lvl.nn]) == set(nn_set)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    want = jnp.zeros_like(x)
    for t, o in enumerate(lvl.offsets):
        if o in nn_set:
            want = want + lvl.packed[:, t] * jnp.roll(
                x, (-o[0], -o[1], -o[2]), axis=(0, 1, 2))
    got = np.asarray(offset_stencil_pallas(
        x, lvl.packed, lvl.offsets, n_taps=lvl.nn, mode="apply",
        interpret=True))
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-5, atol=2e-5)


def test_offset_level_bf16_packed_dispatch_consistency(rng):
    """The packed refactor must leave the XLA path's semantics intact:
    coeffs property round-trips and apply == sum of rolled multiplies."""
    shape = (8, 16, 128)
    lvl = _random_offset_level(rng, shape)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    want = jnp.zeros_like(x)
    for o, c in zip(lvl.offsets, lvl.coeffs):
        want = want + c * jnp.roll(x, (-o[0], -o[1], -o[2]), axis=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(lvl.apply(x)), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
