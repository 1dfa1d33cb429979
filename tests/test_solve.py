"""Solver tests: CG / FGMRES / multigrid / iterative refinement all reach
the reference's tolerances and agree with a dense direct solve."""

import jax.numpy as jnp
import numpy as np
import pytest

from openimpala_tpu.ops.masks import linear_ramp
from openimpala_tpu.ops.stencil import make_cell_problem_system, make_tortuosity_system
from openimpala_tpu.solve.cg import cg, jacobi_preconditioner
from openimpala_tpu.solve.fgmres import fgmres
from openimpala_tpu.solve.preconditioners import make_multigrid_preconditioner
from openimpala_tpu.solve.refine import solve_system
from reference_oracle import assemble_tortuosity_dense

SHAPE = (12, 10, 8)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(3)
    active = rng.random(SHAPE) < 0.75
    # ensure percolation along X so the system is well-posed
    active[:, 4, 4] = True
    system = make_tortuosity_system(jnp.asarray(active), 0, -1.0, 1.0)
    ramp = linear_ramp(SHAPE, 0, -1.0, 1.0)
    x0 = jnp.where(system.free, ramp, 0.0)
    A, b, xinit = assemble_tortuosity_dense(active, 0, -1.0, 1.0)
    x_direct = np.linalg.solve(A, b).reshape(SHAPE)
    return system, x0, x_direct


def test_cg_matches_direct(problem):
    system, x0, x_direct = problem
    r0 = system.initial_residual(x0)
    res = cg(system, r0, system.b_norm, 1e-12, 5000)
    assert bool(res.converged)
    x = np.asarray(system.assemble_solution(x0 + res.z))
    np.testing.assert_allclose(x, x_direct, atol=1e-9)


def test_fgmres_matches_direct(problem):
    system, x0, x_direct = problem
    r0 = system.initial_residual(x0)
    res = fgmres(system, r0, system.b_norm, 1e-12, 3000, restart=30)
    assert bool(res.converged)
    x = np.asarray(system.assemble_solution(x0 + res.z))
    np.testing.assert_allclose(x, x_direct, atol=1e-8)


def test_jacobi_preconditioner_converges_faster(problem):
    system, x0, _ = problem
    r0 = system.initial_residual(x0)
    plain = cg(system, r0, system.b_norm, 1e-10, 5000)
    pre = cg(system, r0, system.b_norm, 1e-10, 5000,
             precond=jacobi_preconditioner(system))
    assert bool(pre.converged) and bool(plain.converged)
    # same solution either way
    np.testing.assert_allclose(np.asarray(plain.z), np.asarray(pre.z), atol=1e-8)


def test_multigrid_reduces_iterations(problem):
    system, x0, x_direct = problem
    r0 = system.initial_residual(x0)
    plain = cg(system, r0, system.b_norm, 1e-10, 5000)
    mg = cg(system, r0, system.b_norm, 1e-10, 5000,
            precond=make_multigrid_preconditioner(system))
    assert bool(mg.converged)
    assert int(mg.iterations) < int(plain.iterations)
    x = np.asarray(system.assemble_solution(x0 + mg.z))
    np.testing.assert_allclose(x, x_direct, atol=1e-7)


def test_refinement_f32_reaches_1e9(problem):
    system, x0, x_direct = problem
    x, info = solve_system(system, x0, eps=1e-9, maxiter=20000,
                           method="cg", precond="jacobi",
                           inner_dtype=jnp.float32)
    assert bool(info.converged)
    assert float(info.rel_res) <= 1e-9
    np.testing.assert_allclose(np.asarray(x), x_direct, atol=1e-6)


def test_zero_rhs_cell_problem_converges_trivially():
    # all-active periodic cell problem: no interfaces, rhs = 0, chi = 0
    active = jnp.ones((8, 8, 8), bool)
    system = make_cell_problem_system(active, 0)
    assert float(system.b_norm) == 0.0
    x, info = solve_system(system, jnp.zeros((8, 8, 8)), eps=1e-9, maxiter=100,
                           inner_dtype=None)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), 0.0, atol=1e-14)


def test_nonconvergence_reports_flag(problem):
    system, x0, _ = problem
    r0 = system.initial_residual(x0)
    res = cg(system, r0, system.b_norm, 1e-12, 3)  # not enough iterations
    assert not bool(res.converged)
    assert float(res.rel_res) > 1e-12


def test_galerkin_coarse_operator_identity():
    """The face-conductance coarse operator must equal P^T A P exactly
    (piecewise-constant prolongation P, block-sum restriction): for random
    coarse vectors e_c, A_H e_c == blocksum(A(prolong(e_c)))."""
    from openimpala_tpu.solve.preconditioners import (
        _blocksum, _prolong_pc, fine_conductances, galerkin_coarsen,
    )

    rng = np.random.default_rng(11)
    shape = (16, 12, 8)
    active = rng.random(shape) < 0.7
    active[:, 5, 3] = True
    system = make_tortuosity_system(jnp.asarray(active), 0, -1.0, 1.0)

    fine = fine_conductances(system)
    coarse = galerkin_coarsen(fine)

    for seed in range(3):
        r = np.random.default_rng(seed)
        ec = jnp.asarray(r.standard_normal([s // 2 for s in shape]))
        ec = jnp.where(coarse.free, ec, 0.0)
        lhs = coarse.apply(ec)
        ef = jnp.where(system.free, _prolong_pc(ec), 0.0)
        rhs = _blocksum(system.apply(ef))
        rhs = jnp.where(coarse.free, rhs, 0.0)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   rtol=0, atol=1e-11)


def test_galerkin_mg_reduces_iterations(problem):
    system, x0, _ = problem
    from openimpala_tpu.solve.preconditioners import GalerkinMGPreconditioner

    r0 = system.initial_residual(x0)
    plain = cg(system, r0, system.b_norm, 1e-9, 5000)
    M = GalerkinMGPreconditioner.from_system(system)
    pre = cg(system, r0, system.b_norm, 1e-9, 5000, precond=M)
    assert bool(pre.converged)
    assert int(pre.iterations) < int(plain.iterations)


def test_galerkin_wcycle_cuts_iterations(problem):
    """cycle="w" (precond_opts): holds the 2-level contraction where the
    deep V compounds — must converge to the same tolerance in no more
    iterations than the V-cycle (measured 256^3: 87 -> 52)."""
    system, x0, _ = problem
    from openimpala_tpu.solve.preconditioners import GalerkinMGPreconditioner

    r0 = system.initial_residual(x0)
    v = cg(system, r0, system.b_norm, 1e-9, 5000,
           precond=GalerkinMGPreconditioner.from_system(system))
    w = cg(system, r0, system.b_norm, 1e-9, 5000,
           precond=GalerkinMGPreconditioner.from_system(system, cycle="w"))
    assert bool(w.converged)
    assert int(w.iterations) <= int(v.iterations)


def test_chebyshev_coarse_solver_matches_direct(problem):
    """coarse_solver="cheby" truncates the hierarchy early and replaces the
    coarsest Jacobi sweeps with a full-spectrum Chebyshev solve; the cycle
    stays a fixed symmetric operator, so PCG must converge to the same
    solution (one-shot executable-size lever, see GalerkinMGPreconditioner)."""
    system, x0, x_direct = problem
    from openimpala_tpu.solve.preconditioners import GalerkinMGPreconditioner

    r0 = system.initial_residual(x0)
    M = GalerkinMGPreconditioner.from_system(
        system, max_levels=2, coarse_solver="cheby", coarse_ratio=100.0)
    res = cg(system, r0, system.b_norm, 1e-10, 5000, precond=M)
    assert bool(res.converged)
    x = np.asarray(system.assemble_solution(x0 + res.z))
    np.testing.assert_allclose(x, x_direct, atol=1e-7)


def test_trilinear_transfers_adjoint_and_converge(problem):
    """transfer="tri": restriction must be the exact transpose of the
    prolongation (<P e_c, f> == <e_c, R f>, clamped and periodic), and the
    preconditioned solve must still converge."""
    import itertools

    from openimpala_tpu.solve.preconditioners import (
        GalerkinMGPreconditioner, _prolong_tri, _restrict_tri,
    )

    rng = np.random.default_rng(5)
    for periodic in [(False, False, False), (True, False, True)]:
        shapec = (8, 6, 4)
        ec = jnp.asarray(rng.standard_normal(shapec))
        f = jnp.asarray(rng.standard_normal([2 * s for s in shapec]))
        lhs = float(jnp.sum(_prolong_tri(ec, periodic) * f))
        rhs = float(jnp.sum(ec * _restrict_tri(f, periodic)))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-12)

    system, x0, _ = problem
    r0 = system.initial_residual(x0)
    res = cg(system, r0, system.b_norm, 1e-9, 5000,
             precond=GalerkinMGPreconditioner.from_system(system,
                                                          transfer="tri"))
    assert bool(res.converged)


def test_chunked_cg_matches_fused(problem):
    """The chunked host-driven CG (used on TPU where long fused MG dispatches
    kill the worker) must agree with the single fused while_loop."""
    system, x0, _ = problem
    from openimpala_tpu.solve.cg import _cg_chunked_loop
    from openimpala_tpu.solve.preconditioners import GalerkinMGPreconditioner

    M = GalerkinMGPreconditioner.from_system(system)
    r0 = system.initial_residual(x0)
    fused = cg(system, r0, system.b_norm, 1e-10, 500, precond=M)
    chunked = _cg_chunked_loop(system, r0, system.b_norm, 1e-10, 500, M,
                               chunk=7)
    assert bool(chunked.converged)
    np.testing.assert_allclose(np.asarray(chunked.z), np.asarray(fused.z),
                               rtol=1e-8, atol=1e-10)
    # chunk boundary may overshoot by < chunk iterations
    assert abs(int(chunked.iterations) - int(fused.iterations)) < 7


def test_chebyshev_preconditioner_converges_faster(problem):
    """Opt-in precond="cheby": fixed SPD polynomial in the Jacobi-scaled
    operator — must cut outer iterations vs plain CG and reach the same
    solution."""
    system, x0, x_direct = problem
    from openimpala_tpu.solve.preconditioners import ChebyshevPreconditioner

    r0 = system.initial_residual(x0)
    plain = cg(system, r0, system.b_norm, 1e-10, 5000)
    M = ChebyshevPreconditioner.from_system(system, degree=4)
    pre = cg(system, r0, system.b_norm, 1e-10, 5000, precond=M)
    assert bool(pre.converged)
    assert int(pre.iterations) < int(plain.iterations)
    x_full = system.assemble_solution(x0 + pre.z)
    np.testing.assert_allclose(np.asarray(x_full), x_direct, atol=1e-8)


def test_warmup_internals_run_on_cpu():
    """solve/warmup.py is gated to TPU+multi-core in production, but its
    body must stay importable/runnable (it shares the driver's build and
    precond paths) — exercise _warm directly on CPU shapes."""
    from openimpala_tpu.solve import warmup

    # "auto" resolves to gmg -> the ABSTRACT path (ShapeDtypeStruct priming,
    # no dummy device data); "jacobi" takes the eager dummy-volume fallback
    warmup._warm((16, 8, 8), 0, -1.0, 1.0, (1.0, 1.0, 1.0), "float32",
                 None, None, "auto", None, "cg", jnp.float32, jnp.float64,
                 1e-9)
    warmup._warm((16, 8, 8), 0, -1.0, 1.0, (1.0, 1.0, 1.0), "float32",
                 None, None, "jacobi", None, "cg", jnp.float32, jnp.float64,
                 1e-9)
    # the public gate declines on this host (CPU backend)
    assert warmup.maybe_start((256, 256, 256), 0, -1.0, 1.0, (1.0, 1.0, 1.0),
                              "float32", None, None, "auto", None, "cg",
                              jnp.float32, jnp.float64, 1e-9) is None


def test_warmup_extra_dirs_event_protocol():
    """direction=All warm-up: the thread primes the first direction's fill
    first, releases main_ready after the solver programs, then primes the
    later directions' direction-static executables — every per-direction
    event and main_ready must end set (they gate the CLI's fill dispatch
    and system build, props/tortuosity.py)."""
    import threading

    from openimpala_tpu.solve import warmup

    fe = {d: threading.Event() for d in (0, 1, 2)}
    be = {d: threading.Event() for d in (0, 1, 2)}
    mr = threading.Event()
    warmup._warm((16, 8, 8), 0, -1.0, 1.0, (1.0, 1.0, 1.0), "float32",
                 None, None, "auto", None, "cg", jnp.float32, jnp.float64,
                 1e-9, "flow", True, (1, 2), fill_events=fe, build_events=be,
                 main_ready=mr)
    assert mr.is_set()
    assert all(ev.is_set() for ev in fe.values())
    assert all(ev.is_set() for ev in be.values())

    # the threaded wrapper: same protocol end to end, plus wait_fill /
    # wait_build on an unregistered direction returning immediately
    w = warmup.SolverWarmup(
        ((16, 8, 8), 0, -1.0, 1.0, (1.0, 1.0, 1.0),
         "float32", None, None, "auto", None, "cg",
         jnp.float32, jnp.float64, 1e-9, "flow", True, (1, 2)),
        primary_direction=0, extra_dirs=(1, 2))
    w.wait_fill(2)
    w.wait_fill()          # primary
    w.wait_fill(direction=99)  # unregistered: no event, returns at once
    w.wait_build(2)
    w.wait_build()
    w.wait_build(direction=99)
    w.join()
    assert w.main_ready.is_set()
    assert all(ev.is_set() for ev in w.fill_events.values())
    assert all(ev.is_set() for ev in w.build_events.values())


def test_warmup_primes_real_mask_avals(monkeypatch):
    """An AOT-primed executable is shared only when its avals match the
    real call EXACTLY — the warm-up must prime _build_system with the same
    mask dtype the drivers pass (bool, from ops/masks.upload_mask and the
    packed device fill).  Pins the contract for both the abstract
    (ShapeDtypeStruct) and eager (dummy-volume) warm paths, primary and
    extra directions."""
    import importlib

    from openimpala_tpu.ops.masks import upload_mask
    from openimpala_tpu.solve import warmup

    # the package re-exports the tortuosity FUNCTION at props.tortuosity;
    # importlib resolves the module itself
    T = importlib.import_module("openimpala_tpu.props.tortuosity")

    real_dtype = upload_mask(np.ones((16, 8, 8), bool)).dtype

    class Recorder:
        def __init__(self, fn):
            self.fn = fn
            self.dtypes = []

        def lower(self, ones, *a, **k):
            self.dtypes.append(jnp.dtype(ones.dtype))
            return self.fn.lower(ones, *a, **k)

        def __call__(self, ones, *a, **k):
            self.dtypes.append(jnp.dtype(ones.dtype))
            return self.fn(ones, *a, **k)

    rec = Recorder(T._build_system)
    monkeypatch.setattr(T, "_build_system", rec)
    # abstract path (gmg) incl. an extra-direction build prime
    warmup._warm((16, 8, 8), 0, -1.0, 1.0, (1.0, 1.0, 1.0), "float32",
                 None, None, "auto", None, "cg", jnp.float32, jnp.float64,
                 1e-9, extra_dirs=(1,))
    # eager fallback path (jacobi)
    warmup._warm((16, 8, 8), 0, -1.0, 1.0, (1.0, 1.0, 1.0), "float32",
                 None, None, "jacobi", None, "cg", jnp.float32, jnp.float64,
                 1e-9)
    assert rec.dtypes and all(d == real_dtype for d in rec.dtypes)


def test_fgmres_f32_plateau_breaks(problem):
    """An f32 FGMRES asked for an unreachable tolerance must end at the
    Gram-Schmidt noise floor (two no-progress cycles), not spin to maxiter
    (solve/fgmres.py stall break; VERDICT r2 weak #5: 390 spun iterations
    at 512^3)."""
    from openimpala_tpu.solve.refine import make_precond

    system, x0, _ = problem
    sys32 = system.astype(jnp.float32)
    r0 = sys32.initial_residual(x0.astype(jnp.float32))
    M = make_precond(sys32, "gmg")
    res = fgmres(sys32, r0, sys32.b_norm, 1e-14, 4000, precond=M, restart=10)
    assert not bool(res.converged)
    assert float(res.rel_res) < 1e-4  # real progress before the floor
    assert int(res.iterations) <= 200  # stopped within a few cycles


def test_fgmres_host_loop_plateau_breaks(problem):
    """The per-cycle host-dispatch driver (the TPU >=192^3 path) applies
    the same stall break."""
    from openimpala_tpu.solve.fgmres import _fgmres_host_loop
    from openimpala_tpu.solve.refine import make_precond

    system, x0, _ = problem
    sys32 = system.astype(jnp.float32)
    r0 = sys32.initial_residual(x0.astype(jnp.float32))
    M = make_precond(sys32, "gmg")
    res = _fgmres_host_loop(sys32, r0, float(sys32.b_norm), 1e-14, 4000,
                            M, 10)
    assert not bool(res.converged)
    assert float(res.rel_res) < 1e-4
    assert int(res.iterations) <= 200


def test_fgmres_stall_break_disarmed_uses_budget(problem):
    """Without a refinement outer loop (``stall_break=False``, the unrefined
    path) FGMRES must keep using its maxiter budget instead of returning
    early at two slow cycles (ADVICE r3: a slowly-but-steadily converging
    unrefined solve was cut off)."""
    from openimpala_tpu.solve.refine import make_precond

    system, x0, _ = problem
    sys32 = system.astype(jnp.float32)
    r0 = sys32.initial_residual(x0.astype(jnp.float32))
    M = make_precond(sys32, "gmg")
    armed = fgmres(sys32, r0, sys32.b_norm, 1e-14, 300, precond=M,
                   restart=10, stall_break=True)
    disarmed = fgmres(sys32, r0, sys32.b_norm, 1e-14, 300, precond=M,
                      restart=10, stall_break=False)
    assert int(armed.iterations) < 300  # plateau break fired
    assert int(disarmed.iterations) >= 300  # full budget used


def test_solve_system_gmres_refinement_reaches_1e9(problem):
    """solver_type = GMRES production path: f32 FGMRES cycles under f64
    iterative refinement reach 1e-9 even though every inner solve plateaus
    at the f32 noise floor (each refinement round re-scales the residual
    into a fresh Krylov space)."""
    system, x0, x_direct = problem
    x_full, info = solve_system(system, x0, eps=1e-9, maxiter=20000,
                                method="gmres", precond="gmg",
                                inner_dtype=jnp.float32)
    assert bool(info.converged) and float(info.rel_res) <= 1e-9
    np.testing.assert_allclose(np.asarray(x_full), x_direct, atol=1e-7)


def test_gmg_on_uncoarsenable_volume():
    """Odd/small extents defeat _can_coarsen, leaving an empty hierarchy:
    the preconditioner must fall back to a fine-level CHEBYSHEV solve at
    the auto-scaled (degree, ratio) — not run that degree as plain Jacobi
    sweeps — and still reach 1e-9 under refinement."""
    from openimpala_tpu.solve.preconditioners import GalerkinMGPreconditioner
    from reference_oracle import assemble_tortuosity_dense

    shape = (9, 11, 7)  # all odd: no axis is coarsenable (10 would now
    # semi-coarsen axis 1 — single-axis schedules are allowed since r5)
    rng = np.random.default_rng(7)
    active = rng.random(shape) < 0.75
    active[:, 5, 3] = True  # percolation along X
    system = make_tortuosity_system(jnp.asarray(active), 0, -1.0, 1.0)
    M = GalerkinMGPreconditioner.from_system(system)
    assert not M.levels  # the premise: nothing coarsenable
    ramp = linear_ramp(shape, 0, -1.0, 1.0)
    x0 = jnp.where(system.free, ramp, 0.0)
    x_full, info = solve_system(system, x0, eps=1e-9, maxiter=5000,
                                precond="gmg", inner_dtype=jnp.float32)
    assert bool(info.converged)
    A, b, _ = assemble_tortuosity_dense(active, 0, -1.0, 1.0)
    x_direct = np.linalg.solve(A, b).reshape(shape)
    np.testing.assert_allclose(np.asarray(x_full), x_direct, atol=1e-7)


def test_fgmres_cycle_early_exit_iterations(problem):
    """A restart cycle exits at the rotated-residual estimate instead of
    burning the remaining V-cycles: with an MG preconditioner and a deep
    restart, the reported iteration count is the COMPLETED Arnoldi steps,
    well below ceil(iters/m)*m."""
    from openimpala_tpu.solve.refine import make_precond

    system, x0, x_direct = problem
    r0 = system.initial_residual(x0)
    M = make_precond(system, "gmg")
    res = fgmres(system, r0, system.b_norm, 1e-10, 3000, precond=M,
                 restart=30)
    assert bool(res.converged)
    # MG-preconditioned convergence on this 12x10x8 problem takes far
    # fewer than 30 steps; without the early exit iterations would be 30
    assert 0 < int(res.iterations) < 30
    x = np.asarray(system.assemble_solution(x0 + res.z))
    np.testing.assert_allclose(x, x_direct, atol=1e-8)


def test_auto_restart_memory_budget(monkeypatch):
    """_auto_restart derives its HBM budget from device memory_stats when
    available and falls back to the measured-safe 6 GiB otherwise; the cap
    scales with per-device field bytes AND with the device's HBM."""
    import importlib

    fg = importlib.import_module("openimpala_tpu.solve.fgmres")

    # CPU backends expose no bytes_limit -> 6 GiB fallback
    monkeypatch.setattr(fg, "device_hbm_limit", lambda: 0)
    assert fg._device_hbm_budget(512**3 * 4) == 6 * 1024**3

    # a 16 GiB v5e: 0.9*16 GiB - 13 fields of 512 MiB = ~7.9 GiB budget
    # -> restart depth (budget/field - 1) // 2 = 6
    monkeypatch.setattr(fg, "device_hbm_limit", lambda: 16 * 1024**3)
    field = 512**3 * 4
    budget = fg._device_hbm_budget(field)
    assert budget == max(6 * 1024**3, 0.9 * 16 * 1024**3 - 13 * field)

    class _FakeField:
        size = 512**3
        dtype = np.dtype(np.float32)
        sharding = None

    m_v5e = fg._auto_restart(_FakeField(), 30)
    assert m_v5e == int((budget / field - 1) // 2)

    # a 95 GiB v5p must deepen the basis, not inherit the v5e cap
    monkeypatch.setattr(fg, "device_hbm_limit", lambda: 95 * 1024**3)
    m_v5p = fg._auto_restart(_FakeField(), 200)
    assert m_v5p > 2 * m_v5e

    # small fields are never budget-capped
    monkeypatch.setattr(fg, "device_hbm_limit", lambda: 0)
    small = jnp.zeros((32, 32, 32), jnp.float32)
    assert fg._auto_restart(small, 20) == 20
    # the floor is 4 even for absurdly large fields
    class _Fake:
        size = 10 * 1024**3
        dtype = np.dtype(np.float32)
        sharding = None
    assert fg._auto_restart(_Fake(), 20) == 4


class TestLanes:
    """solve/lanes.py — lockstep multi-RHS PCG for the cell problems."""

    def test_lanes_match_sequential_deff(self, blob_phase, monkeypatch):
        """The lockstep path must reproduce the sequential path's D_eff
        (same operator, same refinement semantics, per-lane recurrences)."""
        from openimpala_tpu.props import effective_diffusivity as ed_mod
        from openimpala_tpu.props.effective_diffusivity import (
            effective_diffusivity,
        )
        from openimpala_tpu.solve import lanes as lanes_mod

        calls = []
        orig = lanes_mod.solve_system_lanes

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(lanes_mod, "solve_system_lanes", spy)
        a = effective_diffusivity(blob_phase, 1, precond="gmg",
                                  inner_dtype=jnp.float32)
        assert calls, "lanes path not engaged on a small single-device volume"
        monkeypatch.setattr(ed_mod, "use_lanes",
                            lambda *a, **k: False, raising=False)
        # use_lanes is imported inside the function from solve.lanes
        monkeypatch.setattr(lanes_mod, "use_lanes", lambda *a, **k: False)
        b = effective_diffusivity(blob_phase, 1, precond="gmg",
                                  inner_dtype=jnp.float32)
        assert a.converged and b.converged
        np.testing.assert_allclose(a.deff, b.deff, atol=1e-9)
        # per-lane bookkeeping has the sequential shape
        assert len(a.iterations) == 3 and len(a.rel_res) == 3

    def test_cg_lanes_matches_mono_cg(self, rng):
        """Each lane of cg_lanes reproduces the mono cg iterate sequence
        (lane-wise recurrences never couple)."""
        from openimpala_tpu.ops.stencil import make_cell_problem_system
        from openimpala_tpu.solve.cg import cg
        from openimpala_tpu.solve.lanes import LaneSystem, cg_lanes
        from openimpala_tpu.solve.refine import make_precond

        active = jnp.asarray(rng.random((12, 10, 8)) < 0.7)
        systems = [make_cell_problem_system(active, k, (1.0, 1.0, 1.0),
                                            dtype=np.float64)
                   for k in range(3)]
        lsys = LaneSystem.from_systems(systems)
        M = make_precond(systems[0], "jacobi")
        r0 = lsys.initial_residual(jnp.zeros(lsys.r0_b.shape, jnp.float64))
        res = cg_lanes(lsys, r0, lsys.b_norm, 1e-10, 500, M)
        assert bool(np.asarray(res.converged).all())
        for k in range(3):
            mono = cg(systems[k], systems[k].r0_b, systems[k].b_norm,
                      1e-10, 500, precond=M)
            np.testing.assert_allclose(
                np.asarray(res.z[k]), np.asarray(mono.z), atol=1e-9)

    def test_use_lanes_gate(self):
        from openimpala_tpu.solve.lanes import use_lanes

        assert use_lanes(64 ** 3, 3)            # small volume: on
        assert not use_lanes(2048 ** 3, 3)      # absurd volume: off
        assert not use_lanes(64 ** 3, 3, method="gmres")
        # 512^3 x 3 f32 lanes OOMs a 16 GiB v5e when forced (measured
        # RESOURCE_EXHAUSTED, bench_logs/r4/deff512_lanes_forced_oom.log) —
        # the gate must reject it there.  The known-HBM table only engages
        # on TPU backends; on CPU the 6 GiB fallback rejects it too.
        assert not use_lanes(512 ** 3, 3)

    def test_lanes_stall_break_ignores_converged_lanes(self):
        """A lane already at rel <= eps must not keep the refinement loop
        alive while the others plateau (code-review r4): 'improved' counts
        only unconverged lanes that halved their residual."""
        from openimpala_tpu.solve.lanes import _lanes_stalled

        eps = 1e-9
        inf = np.inf
        # first round (prev = inf): never a stall
        assert not _lanes_stalled(np.array([1e-3, 1e-2, 5e-3]),
                                  np.full(3, inf), eps)
        # lane 0 converged, lanes 1-2 plateaued -> STALL (the old
        # `| (rel <= eps)` form would have spun to maxiter here)
        assert _lanes_stalled(np.array([5e-10, 8e-6, 8e-6]),
                              np.array([5e-10, 9e-6, 9e-6]), eps)
        # lane 1 still halving -> keep refining
        assert not _lanes_stalled(np.array([5e-10, 4e-6, 8e-6]),
                                  np.array([5e-10, 9e-6, 9e-6]), eps)


class TestResidualHistory:
    """solve.ResidualHistory — the structured convergence trace (SURVEY §5
    "residual-history return values", the replacement for scraping the
    ``verbose >= 2`` output that mirrors ``TortuosityHypre.cpp:700-704``)."""

    def test_solve_system_records_rounds_and_cumulative_iters(self, problem):
        from openimpala_tpu.solve import ResidualHistory

        system, x0, _ = problem
        hist = ResidualHistory()
        x, info = solve_system(system, x0, eps=1e-9, maxiter=20000,
                               method="cg", precond="jacobi",
                               inner_dtype=jnp.float32, history=hist)
        assert bool(info.converged)
        # one outer point per refinement round, monotone round index,
        # converged point last and equal to the returned rel_res
        rounds = [r for r, _ in hist.outer]
        assert rounds == sorted(rounds)
        assert len(hist.outer) >= 2  # f32 inner can't hit 1e-9 in round 0
        assert hist.outer[-1][1] <= 1e-9
        assert hist.outer[-1][1] == pytest.approx(float(info.rel_res))
        # inner trace: cumulative across rounds, final count == iterations
        its = [it for it, _ in hist.inner]
        assert its == sorted(its)
        assert its[-1] == int(info.iterations)

    def test_chunked_loop_records_per_chunk(self, problem):
        from openimpala_tpu.solve.cg import ResidualHistory, _cg_chunked_loop

        system, x0, _ = problem
        r0 = system.initial_residual(x0)
        hist = ResidualHistory()
        res = _cg_chunked_loop(system, r0, system.b_norm, 1e-10, 5000,
                               jacobi_preconditioner(system), history=hist)
        assert bool(res.converged)
        # one host-observed point per 16-iteration chunk
        assert len(hist.inner) >= 2
        its = [it for it, _ in hist.inner]
        assert its == sorted(its)
        assert its[-1] == int(res.iterations)
        assert hist.inner[-1][1] == pytest.approx(float(res.rel_res))

    def test_fused_path_records_final_point_only(self, problem):
        from openimpala_tpu.solve import ResidualHistory

        system, x0, _ = problem
        r0 = system.initial_residual(x0)
        hist = ResidualHistory()
        res = cg(system, r0, system.b_norm, 1e-10, 5000, history=hist)
        assert hist.inner == [(int(res.iterations), float(res.rel_res))]

    def test_lanes_history_records_vectors(self, rng):
        """Lane solves observe a residual VECTOR per host point."""
        from openimpala_tpu.ops.stencil import make_cell_problem_system
        from openimpala_tpu.solve.cg import ResidualHistory
        from openimpala_tpu.solve.lanes import LaneSystem, solve_system_lanes

        active = jnp.asarray(rng.random((12, 10, 8)) < 0.7)
        systems = [make_cell_problem_system(active, k, (1.0, 1.0, 1.0),
                                            dtype=np.float32)
                   for k in range(3)]
        lsys = LaneSystem.from_systems(systems)
        hist = ResidualHistory()
        x, info = solve_system_lanes(lsys, eps=1e-9, maxiter=5000,
                                     precond="jacobi",
                                     inner_dtype=jnp.float32,
                                     outer_dtype=jnp.float64, history=hist)
        assert bool(np.asarray(info.converged).all())
        assert hist.outer and hist.inner
        for _, rel in hist.outer + hist.inner:
            assert isinstance(rel, tuple) and len(rel) == 3
        final = np.asarray(hist.outer[-1][1])
        assert (final <= 1e-9).all()


class TestSemiCoarsening:
    """PFMG-style semi-coarsening for anisotropic spacing (VERDICT r4 #2;
    reference parity target: Hypre SMG/PFMG, TortuosityHypre.cpp:671-678)."""

    def test_schedule_isotropic_reproduces_full_coarsening(self):
        from openimpala_tpu.solve.preconditioners import GalerkinMGPreconditioner as G

        # the historical max_levels-1 full coarsenings, program-identical
        assert G._schedule_for((64,) * 3, (1.0, 1.0, 1.0), 3) == \
            ((0, 1, 2), (0, 1, 2))
        assert G._schedule_for((100,) * 3, (2.0, 2.0, 2.0), 3) == \
            ((0, 1, 2), (0, 1, 2))
        # odd extent stops the axis exactly where _can_coarsen did
        assert G._schedule_for((64, 64, 25), (1.0,) * 3, 3) == \
            ((0, 1), (0, 1))  # z never coarsenable; cap = max_levels-1

    def test_schedule_semicoarsens_strong_axis_first(self):
        from openimpala_tpu.solve.preconditioners import GalerkinMGPreconditioner as G

        # dx=(1,1,0.5): z twice as strongly coupled -> coarsen z alone first;
        # the final step always coarsens all eligible axes and the level
        # count NEVER exceeds the isotropic max_levels (the measured
        # 3-level invariant — extra anisotropic levels invert the win)
        assert G._schedule_for((64,) * 3, (1.0, 1.0, 4.0), 3) == \
            ((2,), (0, 1, 2))
        # dx=(1,1,4): z weakly coupled -> coarsen the xy plane first
        assert G._schedule_for((64,) * 3, (1.0, 1.0, 1.0 / 16.0), 3) == \
            ((0, 1), (0, 1, 2))
        # mild ratio (h2 ratio exactly SEMI_THRESHOLD) stays full coarsening
        assert G._schedule_for((64,) * 3, (1.0, 1.0, 0.5), 3) == \
            ((0, 1, 2), (0, 1, 2))

    def test_semicoarsened_vcycle_is_symmetric(self):
        """R = P^T with symmetric smoothing keeps the semi-coarsened V-cycle
        a symmetric operator, so CG stays valid: <M r1, r2> == <r1, M r2>."""
        from openimpala_tpu.solve.preconditioners import GalerkinMGPreconditioner

        rng = np.random.default_rng(3)
        shape = (24, 20, 16)
        active = rng.random(shape) < 0.7
        active[:, 3, 3] = True
        system = make_tortuosity_system(jnp.asarray(active), 0, -1.0, 1.0,
                                        dx=(1.0, 1.0, 4.0), dtype=jnp.float64)
        M = GalerkinMGPreconditioner.from_system(system)
        assert any(axes != (0, 1, 2) for axes in M.schedule)  # premise
        free = np.asarray(system.free)
        r1 = jnp.asarray(np.where(free, rng.standard_normal(shape), 0.0))
        r2 = jnp.asarray(np.where(free, rng.standard_normal(shape), 0.0))
        import jax

        Mf = jax.jit(M.__call__)
        a = float(jnp.vdot(Mf(r1), r2))
        b = float(jnp.vdot(r1, Mf(r2)))
        assert a == pytest.approx(b, rel=1e-12)

    def test_semicoarsened_gmg_matches_oracle(self):
        """dx=(1,1,4) flow-through at 1e-9 through the production path
        (auto schedule -> semi-coarsened hierarchy) matches the dense
        oracle; the derived schedule actually semi-coarsens."""
        from openimpala_tpu.solve.preconditioners import GalerkinMGPreconditioner
        from openimpala_tpu.solve.refine import make_precond

        from openimpala_tpu.ops.floodfill import percolation_mask

        rng = np.random.default_rng(11)
        shape = (32, 24, 16)
        phase = (rng.random(shape) < 0.72).astype(np.int32)
        phase[:, 5, 5] = 1
        active, _ = percolation_mask(phase, 1, 0)
        active = np.asarray(active)
        dx = (1.0, 1.0, 4.0)
        system = make_tortuosity_system(jnp.asarray(active), 0, -1.0, 1.0,
                                        dx=dx, dtype=jnp.float32)
        M = make_precond(system, "gmg")
        assert isinstance(M, GalerkinMGPreconditioner)
        assert M.schedule and M.schedule[0] != (0, 1, 2)
        ramp = linear_ramp(shape, 0, -1.0, 1.0)
        x0 = jnp.where(system.free, ramp, 0.0).astype(jnp.float32)
        x_full, info = solve_system(system, x0, eps=1e-9, maxiter=4000,
                                    precond="gmg", inner_dtype=jnp.float32)
        assert bool(info.converged)
        A, b, _ = assemble_tortuosity_dense(active, 0, -1.0, 1.0, dx=dx)
        x_direct = np.linalg.solve(A, b).reshape(shape)
        np.testing.assert_allclose(np.asarray(x_full), x_direct, atol=1e-6)

    def test_semicoarsened_gmg_periodic_cell_problem(self):
        """The homogenisation operator (periodic wrap) under anisotropic dx
        with the semi-coarsened hierarchy: solution matches the sparse
        oracle's solve of the same SPD system."""
        from reference_oracle import assemble_cell_problem_dense

        rng = np.random.default_rng(5)
        shape = (16, 16, 16)
        active = rng.random(shape) < 0.75
        dx = (1.0, 1.0, 4.0)
        system = make_cell_problem_system(jnp.asarray(active), 2, dx,
                                          dtype=jnp.float32)
        x_full, info = solve_system(
            system, jnp.zeros(shape, jnp.float32), eps=1e-9, maxiter=4000,
            precond="gmg", inner_dtype=jnp.float32)
        assert bool(info.converged)
        A, b = assemble_cell_problem_dense(active, 2, dx=dx)
        x_direct = np.linalg.lstsq(A, b, rcond=None)[0].reshape(shape)
        # both are defined up to the constant nullspace on the free set
        free = np.asarray(system.free)
        ours = np.asarray(x_full)[free]
        ref = x_direct[free]
        np.testing.assert_allclose(ours - ours.mean(), ref - ref.mean(),
                                   atol=1e-5)
