"""Multilevel smoothed-aggregation prototype (scipy) — the round-3 design
study for replacing the PC coarse space (measured 2-level floor rho=0.79 on
labyrinth masks; scripts/agg2level.py).

Findings that motivate this script (agg2level.py, 32^3 sigma=1.5 mask):
  PC blocks, exact Ac:                rho = 0.79   (the round-2 floor)
  component-split blocks:             rho = 0.80   (VERDICT hypothesis: NO)
  SA (deg-1) transfers, TRUE Ac:      rho = 0.42   (the cure)
  SA transfers, PC-Galerkin Ac:       rho = 0.79   (coarse op must be true)
  SA Ac filtered to 27pt (any lump):  rho >= 0.87  (the +-2 taps matter)
  4x4x4 aggregates + SA:              rho >= 0.87  (too-small coarse space)

The true SA coarse operator has fine L1-radius 3, hence coarse support
{|o|_inf<=1} u {axial +-2} = 33 taps — budgetable on TPU.  This script
measures the MULTILEVEL quality of the exact TPU plan:

  level 0 -> 1: SA transfers (Ps = (I - 2/3 D^-1 A) P), true Galerkin Ac
  level l -> l+1 (l>=1): PC block transfers, Galerkin (stays 27-pt)

vs "sa-all" (SA transfers at every level) and the PC-everywhere baseline,
reporting V-cycle contraction AND PCG iteration counts to 1e-9.

Usage: N=48 SIGMA=1.5 python scripts/sa_ml.py
"""
import os
import sys

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from agg2level import assemble, porous_mask  # noqa: E402

N = int(os.environ.get("N", "32"))
POROSITY = float(os.environ.get("POROSITY", "0.45"))
NU = int(os.environ.get("NU", "2"))
OMEGA = float(os.environ.get("OMEGA", "0.9"))
SEED = int(os.environ.get("SEED", "3"))
OM_SA = 2.0 / 3.0


def block_P(coords, nagg_shape):
    """PC aggregation over 2x2x2 blocks of the level's index space."""
    b = coords // 2
    nb = [(s + 1) // 2 for s in nagg_shape]
    agg = (b[:, 0] * nb[1] + b[:, 1]) * nb[2] + b[:, 2]
    uniq, agg = np.unique(agg, return_inverse=True)
    P = sp.csr_matrix((np.ones(len(agg)), (np.arange(len(agg)), agg)),
                      shape=(len(agg), len(uniq)))
    bc = np.zeros((len(uniq), 3), np.int64)
    bc[agg] = b
    return P, bc, [(s + 1) // 2 for s in nagg_shape]


def build_hierarchy(A, coords, shape, sa_levels, max_levels=10, min_n=200):
    """[(A_l, P_l, Ps_l)] — Ps_l used for transfers, Galerkin via Ps."""
    levels = []
    l = 0
    while l < max_levels and A.shape[0] > min_n and min(shape) >= 4:
        P, coords_c, shape_c = block_P(coords, shape)
        if l < sa_levels:
            dinv = sp.diags(1.0 / A.diagonal())
            Ps = ((sp.eye(A.shape[0]) - OM_SA * (dinv @ A)) @ P).tocsr()
        else:
            Ps = P
        Ac = (Ps.T @ A @ Ps).tocsr()
        levels.append((A, Ps))
        A, coords, shape = Ac, coords_c, shape_c
        l += 1
    return levels, A  # A = coarsest


def vcycle_apply(levels, coarsest_solve, r, nu, omega):
    def go(l, r):
        if l == len(levels):
            return coarsest_solve(r)
        A, Ps = levels[l]
        dinv = omega / A.diagonal()
        x = dinv * r
        for _ in range(nu - 1):
            x = x + dinv * (r - A @ x)
        rc = Ps.T @ (r - A @ x)
        x = x + Ps @ go(l + 1, rc)
        for _ in range(nu):
            x = x + dinv * (r - A @ x)
        return x

    return go(0, r)


def measure(name, A, levels, coarsest, eps=1e-9, rho_iters=40):
    nf = A.shape[0]
    solve_c = spla.factorized(coarsest.tocsc())
    M = lambda r: vcycle_apply(levels, solve_c, r, NU, OMEGA)
    # contraction of the stationary iteration
    rng = np.random.default_rng(0)
    e = rng.standard_normal(nf)
    e /= np.linalg.norm(e)
    rho = 0.0
    for _ in range(rho_iters):
        e2 = e - M(A @ e)
        rho = np.linalg.norm(e2)
        e = e2 / max(rho, 1e-300)
    # PCG iterations to eps on the Dirichlet problem RHS
    b = rng.standard_normal(nf)  # generic rhs
    x = np.zeros(nf)
    r = b.copy()
    z = M(r)
    p = z.copy()
    rz = r @ z
    bnorm = np.linalg.norm(b)
    it = 0
    while np.linalg.norm(r) / bnorm > eps and it < 400:
        Ap = A @ p
        al = rz / (p @ Ap)
        x += al * p
        r -= al * Ap
        z = M(r)
        rz2 = r @ z
        p = z + (rz2 / rz) * p
        rz = rz2
        it += 1
    nnz_per = [f"{lv[0].nnz / lv[0].shape[0]:.0f}" for lv in levels]
    print(f"{name:12s} rho = {rho:.4f}   pcg(1e-9) = {it:3d} iters   "
          f"levels = {len(levels)}  nnz/row = {nnz_per}")


def main():
    free = porous_mask(N, POROSITY, SEED)
    A, idx, free = assemble(free)
    coords = np.stack(np.nonzero(free), axis=1)
    print(f"N={N} free={A.shape[0]}")
    for name, sa_levels in (("pc-all", 0), ("sa-first", 1), ("sa-two", 2),
                            ("sa-all", 99)):
        levels, coarsest = build_hierarchy(A, coords, free.shape, sa_levels)
        measure(name, A, levels, coarsest)


if __name__ == "__main__":
    main()


def extra_exact_l1():
    """sa-first with EXACT level-1 solve: the ceiling a stronger cycle
    below level 1 (W/K-cycle) could approach without deeper SA."""
    free = porous_mask(N, POROSITY, SEED)
    A, idx, free = assemble(free)
    coords = np.stack(np.nonzero(free), axis=1)
    levels, _ = build_hierarchy(A, coords, free.shape, 1, max_levels=1,
                                min_n=0)
    A0, Ps = levels[0]
    measure("sa1-exactL1", A, [(A0, Ps)], (Ps.T @ A0 @ Ps).tocsr())


if __name__ == "__main__" and os.environ.get("EXACT_L1") == "1":
    extra_exact_l1()
