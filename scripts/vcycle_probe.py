"""TPU probe: per-component cost of the MG-PCG iteration at N^3.

Times (f32, volume passed as jit args):
  - v2 Pallas matvec            (the CG matvec)
  - XLA matvec                  (what fine-level smoothing uses today)
  - XLA fused Jacobi sweep      x + inv_d*(r - A x)
  - XLA AXPY                    z + alpha*p (pure elementwise ceiling)
  - XLA dot                     <r, r> (reduction ceiling)
  - full GalerkinMG V-cycle     (the preconditioner application)
  - one chunked-CG iteration    (_cg_chunk with chunk=1)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

import openimpala_tpu  # noqa: F401
from openimpala_tpu.ops.stencil import (
    apply_restricted_xla, make_tortuosity_system, set_pallas_mode,
)
from openimpala_tpu.ops import stencil_pallas as sp
from openimpala_tpu.ops.floodfill import percolation_mask
from openimpala_tpu.solve.preconditioners import GalerkinMGPreconditioner


def log(*a):
    print(*a, flush=True)


n = int(os.environ.get("N", "512"))
log("device:", jax.devices()[0], "n:", n)

rng = np.random.default_rng(0)
phase = (rng.random((n, n, n)) < 0.6).astype(np.int8)
active, vf = percolation_mask(phase, 1, 0)
log(f"percolation vf={vf:.4f}")

# pallas mode stays "auto": composite timings (V-cycle, CG iteration)
# must exercise the production kernel path
system = make_tortuosity_system(jnp.asarray(active), 0, -1.0, 1.0,
                                dtype=jnp.float32)
del active, phase
x = jnp.where(system.free, jnp.ones((n, n, n), jnp.float32), 0.0)
r = x * 0.5
W, PER = system.w, system.periodic

SUM = jax.jit(jnp.sum)


def _fetch(out):
    """Host fetch = the only reliable execution barrier over the tunnel."""
    leaf = jax.tree.leaves(out)[1 if isinstance(out, tuple) else 0]
    return float(SUM(leaf)) if getattr(leaf, "ndim", 0) else float(leaf)


def timeit(name, fn, out0, iters=30, bytes_per_cell=None):
    """fn must CHAIN: out -> out (data dependence serialises the iterations);
    one host fetch at the end is the barrier, fetch overhead subtracted."""
    out = fn(out0)
    _fetch(out)
    t0 = time.time()
    _fetch(out)
    fetch_overhead = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(out)
    _fetch(out)
    dt = (time.time() - t0 - fetch_overhead) / iters
    bw = ""
    if bytes_per_cell:
        bw = f"  -> {n**3 * bytes_per_cell / dt / 1e9:.0f} GB/s ({bytes_per_cell} B/cell model)"
    log(f"{name:28s} {dt*1e3:8.2f} ms{bw}")
    return dt


D, F, C = system.diag, system.free, system.code

# NB: the big arrays must enter as jit ARGUMENTS — closed-over constants
# embed the volume in the HLO and blow the remote-compile payload limit.

# 1b. v3 matvec with fused dot (bf16 signed-count operator stream)
f_v3d = jax.jit(
    lambda xx, cc: sp.fused_stencil_pallas("matvec", xx, None, cc, W, PER,
                                           with_dot=True)[0])
timeit("pallas v3 matvec+dot", lambda xx: f_v3d(xx, C), x, bytes_per_cell=10)

# 1c. v3 fused sweep / resid kernels
f_v3s = jax.jit(lambda xx, rr, cc: sp.fused_stencil_pallas(
    "sweep", xx, rr, cc, W, PER, omega=0.9))
timeit("pallas v3 sweep", lambda xx: f_v3s(xx, r, C), x, bytes_per_cell=14)
f_v3r = jax.jit(lambda xx, rr, cc: sp.fused_stencil_pallas(
    "resid", xx, rr, cc, W, PER))
timeit("pallas v3 resid", lambda xx: f_v3r(xx, r, C), x, bytes_per_cell=14)

# numerics: compiled kernels vs XLA on this device (catches miscompiles the
# CPU interpreter cannot)
got = np.asarray(f_v3s(x, r, C))
inv_d = jnp.where(F & (D > 0), 0.9 / jnp.where(D > 0, D, 1.0), 0.0)
want = np.asarray(x + inv_d * (r - apply_restricted_xla(x, D, F, W, PER)))
err = np.abs(got - want).max()
log(f"sweep kernel max|err| vs xla: {err:.3e}")
assert err < 1e-5

# composition: 3 chained sweeps in ONE program (vs 3x the standalone time)
f_s3 = jax.jit(lambda xx, rr, cc: sp.fused_stencil_pallas(
    "sweep", sp.fused_stencil_pallas(
        "sweep", sp.fused_stencil_pallas("sweep", xx, rr, cc, W, PER,
                                         omega=0.9),
        rr, cc, W, PER, omega=0.9), rr, cc, W, PER, omega=0.9))
timeit("3 sweeps fused program", lambda xx: f_s3(xx, r, C), x,
       bytes_per_cell=42)

# 2. XLA matvec
f_xla = jax.jit(lambda xx, d, f: apply_restricted_xla(xx, d, f, W, PER))
timeit("xla matvec", lambda xx: f_xla(xx, D, F), x, bytes_per_cell=13)

# 3. XLA fused Jacobi sweep
def sweep(xx, rr, d, f):
    inv_d = jnp.where(f, 0.9 / jnp.where(d > 0, d, 1.0), 0.0)
    return xx + inv_d * (rr - apply_restricted_xla(xx, d, f, W, PER))

f_sweep = jax.jit(sweep)
timeit("xla jacobi sweep", lambda xx: f_sweep(xx, r, D, F), x,
       bytes_per_cell=21)

# 4. XLA AXPY
f_axpy = jax.jit(lambda a, b: b + 0.37 * a)
timeit("xla axpy", lambda xx: f_axpy(xx, r), x, bytes_per_cell=12)

# 5. XLA dot (chained via scalar accumulate)
f_dot = jax.jit(lambda a: a * (1.0 + 1e-12 * jnp.sum(a * a)))
timeit("xla dot+scale <r,r>", f_dot, x, bytes_per_cell=12)

# 6. full V-cycle
M = GalerkinMGPreconditioner.from_system(system)
M_apply = jax.jit(lambda M_, rr: M_(rr))
timeit("gmg v-cycle", lambda rr: M_apply(M, rr), r, iters=10)

# 6b. V-cycle component costs: coarse-level conductance apply + transfers
from openimpala_tpu.solve.preconditioners import (
    ConductanceLevel, _blocksum, _prolong_pc,
)

L1 = M.levels[0]  # n/2 level
r1 = _blocksum(r)
f_cond = jax.jit(lambda lvl, xx: lvl.apply(xx))
timeit("cond apply (n/2 level)", lambda xx: f_cond(L1, xx), r1,
       bytes_per_cell=3)  # 24 B/cell at (n/2)^3 = 3 B per fine cell
f_bs = jax.jit(lambda xx: _prolong_pc(_blocksum(xx)) * 0.125)
timeit("blocksum+prolong (fine)", f_bs, x, bytes_per_cell=9)
smooth1 = jax.jit(lambda lvl, xx, rr: xx + jnp.where(
    lvl.free, 0.9 / jnp.where(lvl.diag > 0, lvl.diag, 1.0), 0.0)
    * (rr - lvl.apply(xx)))
timeit("cond sweep (n/2 level)", lambda xx: smooth1(L1, xx, r1), r1,
       bytes_per_cell=4)

# 6c. subtree decomposition: coarse subtree (levels 1..L) vs fine stage
f_sub = jax.jit(lambda M_, rc: M_._vcycle(1, rc))
timeit("coarse subtree (1..L)", lambda rc: f_sub(M, rc), r1, iters=10)


def fine_stage(M_, rr):
    x = M_._fine_smooth(None, rr, M_.nu1)
    from openimpala_tpu.ops.stencil import residual_restricted as rres

    resid = rres(x, rr, M_.fine.code, M_.fine.w, M_.fine.periodic)
    rc = _blocksum(resid)
    rc = jnp.where(M_.levels[0].free, rc, 0.0)
    x = x + jnp.where(M_.fine.free, _prolong_pc(rc), 0.0)
    return M_._fine_smooth(x, rr, M_.nu2)


f_fine = jax.jit(fine_stage)
timeit("fine stage (no subtree)", lambda rr: f_fine(M, rr), r, iters=10)

# 7. one chunked-CG iteration
from openimpala_tpu.solve.cg import _cg_chunk

state = (x * 0, r, r, jnp.sum(r * r), jnp.array(0, jnp.int32),
         jnp.asarray(1.0, jnp.float32), jnp.array(False))
# _cg_chunk is itself jitted with system/M as pytree ARGS (no closures)
timeit("cg iteration (1x chunk)",
       lambda st: _cg_chunk(system, M, st, 1.0, 1e-12, 1)[0], state, iters=10)
log("done")
