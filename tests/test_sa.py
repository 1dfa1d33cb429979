"""Smoothed-aggregation preconditioner (solve/sa.py) — correctness tests.

Measured motivation (scripts/agg2level.py, scripts/sa_ml.py): the PC coarse
space floors at rho ~0.79 on labyrinth masks; SA transfers with the true
probed Galerkin coarse operator reach 0.42 and cut golden-sample PCG
iterations 67 -> 22 (V) / 17 (W) at identical tau.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openimpala_tpu.ops.floodfill import flood_fill_host
from openimpala_tpu.ops.masks import linear_ramp
from openimpala_tpu.ops.stencil import make_tortuosity_system
from openimpala_tpu.solve.refine import solve_system
from openimpala_tpu.solve.sa import SAMGPreconditioner


def _labyrinth(n=24, seed=3, porosity=0.45):
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    field = gaussian_filter(rng.standard_normal((n,) * 3), 1.5, mode="wrap")
    phase = field < np.quantile(field, porosity)
    phase[:, n // 2, n // 2] = True
    rin, rout = flood_fill_host(phase, 0)
    return rin & rout


@pytest.fixture(scope="module")
def lab_system():
    active = _labyrinth()
    sys_ = make_tortuosity_system(jnp.asarray(active), 0, -1.0, 1.0,
                                  dtype=jnp.float64)
    ramp = linear_ramp(active.shape, 0, -1.0, 1.0, jnp.float64)
    x0 = jnp.where(sys_.free, ramp, 0.0)
    return sys_, x0


def test_probed_operator_matches_explicit_galerkin(lab_system):
    """The probed level-1 stencil must equal the explicit Galerkin triple
    product Ps^T A Ps evaluated matrix-free on random coarse vectors."""
    sys_, _ = lab_system
    M = SAMGPreconditioner.from_system(sys_, sa_depth=1)
    lvl = M.levels[0]
    rng = np.random.default_rng(0)
    xc = jnp.asarray(rng.standard_normal(lvl.diag.shape))

    # matrix-free R A P with the same transfer ops the builder probed
    dtype = sys_.r0_b.dtype
    p = M._prolong0(xc.astype(dtype), M.fine.free, dtype)
    q = M.fine.apply(p)
    om = jnp.asarray(M.om_sa, dtype)
    stq = q - om * M.fine.apply(M.dinv0.astype(dtype) * q)
    from openimpala_tpu.solve.preconditioners import _blocksum

    want = _blocksum(stq)
    got = lvl.apply(xc.astype(dtype))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-10, atol=1e-10)


def test_vcycle_is_symmetric(lab_system):
    """<u, M v> == <M u, v>: the V-cycle must be a symmetric operator for
    PCG validity (symmetric smoothing, R = P^T per level)."""
    sys_, _ = lab_system
    M = SAMGPreconditioner.from_system(sys_)
    rng = np.random.default_rng(1)
    shape = sys_.free.shape
    u = jnp.where(sys_.free, jnp.asarray(rng.standard_normal(shape)), 0.0)
    v = jnp.where(sys_.free, jnp.asarray(rng.standard_normal(shape)), 0.0)
    Mv = M(v)
    Mu = M(u)
    a = float(jnp.sum(u * Mv))
    b = float(jnp.sum(Mu * v))
    assert a == pytest.approx(b, rel=1e-10)


def test_sa_solution_matches_gmg(lab_system):
    """Same solution as the Galerkin-PC path, in fewer iterations."""
    sys_, x0 = lab_system
    x_g, info_g = solve_system(sys_, x0, eps=1e-10, maxiter=500,
                               precond="gmg", inner_dtype=None,
                               outer_dtype=jnp.float64)
    x_s, info_s = solve_system(sys_, x0, eps=1e-10, maxiter=500,
                               precond="sa", inner_dtype=None,
                               outer_dtype=jnp.float64)
    assert bool(info_s.converged)
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_g),
                               rtol=0, atol=1e-8)
    assert int(info_s.iterations) < int(info_g.iterations)


def test_sa_wcycle_converges_faster_or_equal(lab_system):
    sys_, x0 = lab_system
    _, info_v = solve_system(sys_, x0, eps=1e-9, maxiter=500, precond="sa",
                             inner_dtype=None, outer_dtype=jnp.float64)
    _, info_w = solve_system(sys_, x0, eps=1e-9, maxiter=500, precond="sa",
                             precond_opts={"cycle": "w"}, inner_dtype=None,
                             outer_dtype=jnp.float64)
    assert bool(info_w.converged)
    assert int(info_w.iterations) <= int(info_v.iterations)


def test_sa_periodic_cell_problem():
    """SA on the all-periodic homogenisation operator (probe lattice must
    stay consistent across the wrap: spacing divides the axis length)."""
    from openimpala_tpu.ops.stencil import make_cell_problem_system

    active = _labyrinth(20)  # 20 % 5 == 0: natural spacing divides
    sys_ = make_cell_problem_system(jnp.asarray(active), 0,
                                    dtype=jnp.float64)
    r0 = sys_.r0_b
    from openimpala_tpu.solve.cg import cg

    M = SAMGPreconditioner.from_system(sys_)
    res = cg(sys_, r0, sys_.b_norm, 1e-9, 300, precond=M)
    assert bool(res.converged)

    from openimpala_tpu.solve.preconditioners import GalerkinMGPreconditioner

    Mg = GalerkinMGPreconditioner.from_system(sys_)
    res_g = cg(sys_, r0, sys_.b_norm, 1e-9, 300, precond=Mg)
    np.testing.assert_allclose(np.asarray(res.z), np.asarray(res_g.z),
                               rtol=0, atol=1e-7)


def test_sa_sharded_matches_single_device(lab_system):
    """The SA build (probing) and V-cycle under GSPMD sharding must equal
    the single-device result — rolls, pair-reshapes, and masked reductions
    all lower to collectives transparently."""
    from openimpala_tpu.parallel.mesh import make_mesh, shard_volume

    sys_, x0 = lab_system
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(n_devices=8)
    shard3 = lambda a: (shard_volume(a, mesh)
                        if getattr(a, "ndim", 0) == 3 else a)
    sys_s = jax.tree.map(shard3, sys_)

    M = SAMGPreconditioner.from_system(sys_)
    M_s = SAMGPreconditioner.from_system(sys_s)
    assert M.levels[0].offsets == M_s.levels[0].offsets
    r = jnp.where(sys_.free, jnp.ones(sys_.free.shape, jnp.float64), 0.0)
    y = M(r)
    y_s = M_s(shard3(r))
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y),
                               rtol=1e-12, atol=1e-12)
