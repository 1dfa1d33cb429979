"""Restarted flexible GMRES.

Parity with the reference's solver surface (Hypre ``StructFlexGMRES``,
``TortuosityHypre.cpp:664-692``).  On our *eliminated* SPD systems CG is the
better method, so FGMRES exists for (a) the config surface
(``solver = FlexGMRES``), (b) variable preconditioners (each restart cycle
stores the preconditioned vectors Z, hence "flexible"), and (c) any future
non-symmetric operator.

Two drivers around one jitted Arnoldi restart cycle:

* ``_fgmres_loop`` — fully fused ``lax.while_loop`` over cycles (CPU / small
  volumes): one XLA program.
* ``_fgmres_host_loop`` — one dispatch per restart cycle with host-side
  convergence checks, the FGMRES counterpart of CG's chunked driver
  (solve/cg.py): the remote TPU runtime dies on very long fused
  MG-preconditioned programs, and a single cycle (``restart`` V-cycles) is
  comfortably inside the safe envelope.  This is what lets
  ``solver_type = GMRES`` at 512^3 use the Galerkin multigrid preconditioner
  instead of round 1's silent Jacobi fallback.

Memory note: a restart cycle holds ``restart+1`` basis fields plus
``restart`` Z fields; ``_auto_restart`` caps the depth so the Krylov space
fits next to the solver state in HBM (the effective Krylov depth with an
MG preconditioner is tens of iterations anyway).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .cg import SolveResult, _dot


@partial(jax.jit, static_argnames=("restart",))
def _arnoldi_cycle(system, precond, z, r, r0, eps_abs, restart: int):
    """One FGMRES(m) restart cycle: returns (z_new, r_new, ||r_new||).

    The Arnoldi loop exits early once the ROTATED residual estimate
    ``|g[j+1]|`` (exact in exact arithmetic) drops below ``eps_abs`` — with
    deep restarts the tail of a converged cycle would otherwise burn up to
    m-1 full V-cycle preconditioner applications for nothing.  The returned
    norm is computed in the same program so the host driver needs one fetch
    per cycle, not an extra dispatch (the tunnel round-trip rivals a
    matvec)."""
    dtype = r.dtype
    shape = r.shape
    m = restart
    M = precond
    tiny = jnp.asarray(1e-30, dtype)

    beta = jnp.sqrt(_dot(r, r))
    safe_beta = jnp.where(beta > 0, beta, 1.0)
    V = jnp.zeros((m + 1,) + shape, dtype).at[0].set(r / safe_beta)
    Z = jnp.zeros((m,) + shape, dtype)
    H = jnp.zeros((m + 1, m), dtype)
    cs = jnp.zeros((m,), dtype)
    sn = jnp.zeros((m,), dtype)
    g = jnp.zeros((m + 1,), dtype).at[0].set(beta)

    def body(carry):
        j, V, Z, H, cs, sn, g = carry
        zj = M(V[j])
        wv = system.apply(zj)

        # modified Gram-Schmidt
        def mgs(i, wh):
            w, h = wh
            hij = _dot(w, V[i])
            mask = i <= j
            hij = jnp.where(mask, hij, 0.0)
            w = w - hij * V[i]
            return w, h.at[i].set(hij)

        w, hcol = jax.lax.fori_loop(0, m + 1, mgs,
                                    (wv, jnp.zeros((m + 1,), dtype)))
        hj1 = jnp.sqrt(_dot(w, w))
        hcol = hcol.at[j + 1].set(hj1)
        V = V.at[j + 1].set(w / jnp.where(hj1 > tiny, hj1, 1.0))
        Z = Z.at[j].set(zj)

        # apply previous Givens rotations to the new column
        def rot(i, col):
            mask = i < j
            t = cs[i] * col[i] + sn[i] * col[i + 1]
            b = -sn[i] * col[i] + cs[i] * col[i + 1]
            col = col.at[i].set(jnp.where(mask, t, col[i]))
            col = col.at[i + 1].set(jnp.where(mask, b, col[i + 1]))
            return col

        hcol = jax.lax.fori_loop(0, m, rot, hcol)
        # new rotation annihilating hcol[j+1]
        rho = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
        rho_safe = jnp.where(rho > tiny, rho, 1.0)
        c, s = hcol[j] / rho_safe, hcol[j + 1] / rho_safe
        cs = cs.at[j].set(c)
        sn = sn.at[j].set(s)
        hcol = hcol.at[j].set(rho).at[j + 1].set(0.0)
        gj = g[j]
        g = g.at[j].set(c * gj).at[j + 1].set(-s * gj)
        H = H.at[:, j].set(hcol)
        return j + 1, V, Z, H, cs, sn, g

    def cond(carry):
        j, _, _, _, _, _, g = carry
        return (j < m) & ((j == 0) | (jnp.abs(g[j]) > eps_abs))

    init = (jnp.asarray(0, jnp.int32), V, Z, H, cs, sn, g)
    k, V, Z, H, cs, sn, g = jax.lax.while_loop(cond, body, init)
    # back-substitution on the k completed columns: pad H[:m,:m] with an
    # identity tail and zero the tail of g so the triangular solve yields
    # y[i >= k] = 0 with a static shape
    cols = jnp.arange(m)
    live = cols < k
    Hm = jnp.where(live[None, :] & live[:, None], H[:m, :m],
                   jnp.eye(m, dtype=dtype))
    Hm = Hm + jnp.where(jnp.abs(jnp.diagonal(Hm)) > tiny, 0.0, tiny
                        ) * jnp.eye(m, dtype=dtype)
    y = jax.scipy.linalg.solve_triangular(
        Hm, jnp.where(live, g[:m], 0.0), lower=False)
    z_new = z + jnp.tensordot(y, Z, axes=1)
    # explicit end-of-cycle residual: it doubles as the next cycle's Krylov
    # seed, and rebuilding r from the Arnoldi relation V_{m+1} Q^T e_{m+1}
    # g[k] instead would read m+1 basis fields (~(m+1)/2 matvecs of HBM
    # traffic) AND drift from the true residual in f32 — measured worse,
    # do not "optimise" this away
    r_new = r0 - system.apply(z_new)
    return z_new, r_new, jnp.sqrt(_dot(r_new, r_new)), k


@partial(jax.jit, static_argnames=("maxiter", "restart", "stall_break"))
def _fgmres_loop(system, r0, denom, eps, maxiter: int, precond, restart: int,
                 stall_break: bool = True):
    # ``precond`` is a pytree dataclass — see solve/preconditioners.py
    dtype = r0.dtype
    m = restart
    eps = jnp.asarray(eps, dtype)
    denom = jnp.asarray(denom, dtype)

    z0 = jnp.zeros_like(r0)
    rel0 = jnp.sqrt(_dot(r0, r0)) / denom
    stall_cap = 2 if stall_break else maxiter + 1

    def cond(state):
        _, _, it, rel, done, stall, iters = state
        # stall >= 2: two consecutive cycles without meaningful progress —
        # the dtype's noise floor (f32 Gram-Schmidt plateaus near 1e-5
        # relative); return to the caller (iterative refinement re-scales
        # the residual and continues) instead of burning the budget.
        # Only armed when a refinement outer loop exists to continue the
        # solve (``stall_break``) — an unrefined f64 run that converges
        # slowly but steadily must use its whole maxiter budget.
        # ``iters`` counts COMPLETED Arnoldi steps (cycles may early-exit
        # below m once the rotated estimate clears eps), so the budget is
        # true matvecs, not cycles.
        return (~done) & (iters < maxiter) & (stall < stall_cap)

    eps_abs = eps * denom

    def body(state):
        z, r, it, rel, done, stall, iters = state
        z, r, rnorm, k = _arnoldi_cycle(system, precond, z, r, r0, eps_abs, m)
        rel_new = rnorm / denom
        stall = jnp.where(rel_new > rel * 0.999, stall + 1, 0)
        return (z, r, it + 1, rel_new, rel_new <= eps, stall, iters + k)

    state = (z0, r0, jnp.array(0, jnp.int32), rel0, rel0 <= eps,
             jnp.array(0, jnp.int32), jnp.array(0, jnp.int32))
    z, r, it, rel, done, _, iters = jax.lax.while_loop(cond, body, state)
    return SolveResult(z=z, iterations=iters, rel_res=rel, converged=rel <= eps)


def _fgmres_host_loop(system, r0, denom, eps, maxiter: int, precond,
                      restart: int, stall_break: bool = True,
                      verbose: int = 0, history=None):
    """Restart cycles dispatched one at a time, convergence on the host.

    Measured dead ends (r4, 512^3) — don't re-derive:
    * LGMRES-style augmentation (replace the last direction of each cycle
      with the previous cycle's correction delta): 74 iters / 14.8 s vs
      plain restart's 71 / 13.9 s — with a strong GMG preconditioner a
      fresh preconditioned direction beats the recycled one.
    * Speculative cycle pipelining (enqueue cycle i+1 before fetching
      cycle i's norm, to hide the tunnel round-trip): the runtime holds
      BOTH cycles' Krylov workspaces -> 2*(2m+1) basis fields ->
      RESOURCE_EXHAUSTED at m=7; paying for it with m=3 loses more to
      restart truncation than the round-trips cost."""
    dtype = r0.dtype
    eps_v, denom_v = float(eps), float(denom)
    eps_abs = jnp.asarray(eps_v * denom_v, dtype)
    z = jnp.zeros_like(r0)
    r = r0
    it = 0
    stall = 0
    rel = float(jnp.sqrt(_dot(r, r))) / denom_v
    while rel > eps_v and it < maxiter:
        z, r, rnorm, k = _arnoldi_cycle(system, precond, z, r, r0, eps_abs,
                                        restart)
        it += int(k)
        rel_new = float(rnorm) / denom_v
        if verbose >= 2:
            print(f"    fgmres it={it:5d}  rel_res={rel_new:.6e}")
        if history is not None:
            history.record_inner(it, rel_new)  # one point per restart cycle
        if not (rel_new == rel_new):  # NaN breakdown
            rel = rel_new
            break
        # plateau at the dtype's noise floor (measured: f32 Gram-Schmidt
        # stalls near 8e-6 at 512^3): two consecutive no-progress cycles
        # end the solve — under iterative refinement the outer loop
        # re-scales the residual and continues in a fresh Krylov space.
        # Only armed under refinement (``stall_break``); an unrefined
        # solve keeps its full maxiter budget.
        stall = stall + 1 if rel_new > rel * 0.999 else 0
        rel = rel_new
        if stall_break and stall >= 2:
            break
    return SolveResult(
        z=z, iterations=jnp.asarray(it, jnp.int32),
        rel_res=jnp.asarray(rel, dtype), converged=jnp.asarray(rel <= eps_v),
    )


def device_hbm_limit() -> int:
    """Best-known per-device HBM capacity in bytes (0 if unknown): the
    backend's ``memory_stats`` when exposed, else a device-kind table for
    tunnelled runtimes (axon hides memory_stats)."""
    try:
        dev = jax.local_devices()[0]
        stats = dev.memory_stats()
        limit = stats.get("bytes_limit", 0) if stats else 0
        if limit <= 0 and dev.platform == "tpu":
            kind = dev.device_kind.lower()
            for tag, gib in (("v5 lite", 16), ("v5e", 16), ("v5p", 95),
                             ("v5", 95), ("v6e", 32), ("v6", 32),
                             ("v4", 32), ("v3", 32), ("v2", 16)):
                if tag in kind:
                    limit = gib * 1024 ** 3
                    break
        return int(limit)
    except Exception:
        return 0


def _device_hbm_budget(field_bytes: float) -> float:
    """Per-device byte budget for the Krylov basis: 90 % of the device's
    HBM limit minus an estimate of what is LIVE next to the basis during
    the inner solve — the system code field + MG hierarchy (~3 fields'
    worth, 1.5 GB measured at 512^3 f32) and, under iterative refinement,
    the f64 accumulator + outer residual (~10 fields' worth, ~5 GB at
    512^3).  Falls back to the measured-safe 6 GiB v5e constant when the
    backend exposes no memory stats (CPU) — a 10 GB basis budget OOMed
    512^3 on the 16 GB v5e, so the live estimate must stay conservative."""
    fallback = 6 * 1024 ** 3
    limit = device_hbm_limit()
    if limit <= 0:
        return fallback
    live = 13 * field_bytes
    return max(fallback, 0.9 * limit - live)


def _auto_restart(r0, restart: int) -> int:
    """Cap the Krylov depth so (2m+1) basis fields fit in HBM next to the
    solver state (per-device bytes; the X sharding divides the field).
    The budget scales with the actual device HBM (``memory_stats``) so a
    95 GB v5p is not capped to the 16 GB v5e's depth."""
    n_dev = max(1, len(getattr(r0.sharding, "device_set", [None])))
    field_bytes = r0.size * r0.dtype.itemsize / n_dev
    budget = _device_hbm_budget(field_bytes)
    m = int((budget / max(field_bytes, 1) - 1) // 2)
    return max(4, min(int(restart), m))


def fgmres(system, r0, denom, eps, maxiter: int, precond=None,
           restart: int = 20, stall_break: bool = True, verbose: int = 0,
           history=None):
    """Solve ``A z = r0`` (free set, z0=0) with restarted flexible GMRES.

    ``stall_break``: arm the two-cycle plateau break (pass True only when an
    iterative-refinement outer loop exists to re-scale and continue).
    ``history``: opt-in ResidualHistory (one inner point per restart cycle
    on the host-loop path; final point only on the fused path)."""
    from .preconditioners import IdentityPreconditioner

    if precond is None:
        precond = IdentityPreconditioner()
    denom = jnp.where(denom > 0, denom, jnp.sqrt(_dot(r0, r0)))
    denom = jnp.where(denom > 0, denom, 1.0)
    restart = _auto_restart(r0, restart)
    if jax.default_backend() == "tpu" and r0.size >= 192 ** 3:
        return _fgmres_host_loop(system, r0, denom, eps, int(maxiter),
                                 precond, restart, stall_break=stall_break,
                                 verbose=verbose, history=history)
    res = _fgmres_loop(system, r0, denom, eps, int(maxiter), precond,
                       int(restart), stall_break=stall_break)
    if history is not None:
        history.record_inner(int(res.iterations), float(res.rel_res))
    return res
