"""Two-level contraction harness for coarse-space experiments (scipy, exact
coarse solves) — the round-3 follow-up to the round-2 floor localisation
(BASELINE.md "known levers": PC transfers over fixed 2x2x2 blocks give
rho = 0.81 on porous masks with an EXACT coarse solve, so the coarse SPACE
is the bottleneck, not the smoother or transfer order).

Measures the asymptotic two-level error contraction

    E = S^nu2 (I - P Ac^{-1} R A) S^nu1,   Ac = R A P  (exact Galerkin)

by power iteration, for several aggregate constructions on the same mask:

  blocks      fixed 2x2x2 blocks (the production PC coarse space; baseline)
  split       2x2x2 blocks SPLIT by connected component within the block
              (plain aggregation on the conductance graph; stays geometric:
              at most 4 components fit in a 2x2x2 block under
              6-connectivity, so the coarse space maps to a (nc,nc,nc,4)
              slot field on TPU)
  split-sa    same aggregates with ONE damped-Jacobi smoothing of P
              (smoothed aggregation: P_s = (I - om D^{-1} A) P)

Usage: python scripts/agg2level.py [N=32] [POROSITY=0.45] [NU=2] [OMEGA=0.9]
"""
import os
import sys

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("N", "32"))
POROSITY = float(os.environ.get("POROSITY", "0.45"))
NU = int(os.environ.get("NU", "2"))
OMEGA = float(os.environ.get("OMEGA", "0.9"))
SEED = int(os.environ.get("SEED", "3"))


def porous_mask(n, porosity, seed, sigma=None):
    """Blobby percolating labyrinth: Gaussian-filtered white noise
    thresholded at the target porosity.  ``sigma`` sets the feature size
    (~2*sigma voxels); the default 2.0 gives pore necks and walls a few
    voxels wide — unaligned with the 2x2x2 coarsening blocks, like the
    bench/golden volumes (porespy blobs use the same construction)."""
    from scipy.ndimage import gaussian_filter

    sigma = float(os.environ.get("SIGMA", "2.0")) if sigma is None else sigma
    rng = np.random.default_rng(seed)
    field = gaussian_filter(rng.standard_normal((n,) * 3), sigma, mode="wrap")
    phase = field < np.quantile(field, porosity)
    phase[:, n // 2, n // 2] = True  # guarantee percolation along X
    from openimpala_tpu.ops.floodfill import flood_fill_host

    rin, rout = flood_fill_host(phase, 0)
    return rin & rout


def assemble(active):
    """Eliminated SPD tortuosity operator on the free set (X-direction
    Dirichlet planes folded in), matching ops/stencil.py semantics."""
    n = active.shape[0]
    idx = -np.ones(active.shape, np.int64)
    free = active.copy()
    nf = int(free.sum())
    idx[free] = np.arange(nf)
    rows, cols, vals = [], [], []
    diag = np.zeros(nf)
    I, J, K = np.nonzero(free)
    for ax, d in ((0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)):
        I2, J2, K2 = I.copy(), J.copy(), K.copy()
        (I2, J2, K2)[ax][:] += d
        inb = (0 <= (I2, J2, K2)[ax]) & ((I2, J2, K2)[ax] < n)
        nb_free = np.zeros(len(I), bool)
        nb_free[inb] = free[I2[inb], J2[inb], K2[inb]]
        # link to free neighbour: off-diag -1, diag +1
        src = idx[I[nb_free], J[nb_free], K[nb_free]]
        dst = idx[I2[nb_free], J2[nb_free], K2[nb_free]]
        rows.append(src)
        cols.append(dst)
        vals.append(-np.ones(len(src)))
        np.add.at(diag, src, 1.0)
        # Dirichlet neighbour (outside domain along X): diag +1, no link
        if ax == 0:
            outside = ~inb
            src_d = idx[I[outside], J[outside], K[outside]]
            np.add.at(diag, src_d, 1.0)
    rows.append(np.arange(nf))
    cols.append(np.arange(nf))
    vals.append(diag)
    A = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(nf, nf),
    )
    return A, idx, free


def block_aggregates(free, idx, split: bool):
    """Aggregate id per free cell.  ``split=False``: one aggregate per
    2x2x2 block.  ``split=True``: one per connected component (within-block
    6-connectivity) per block."""
    n = free.shape[0]
    nf = int(free.sum())
    agg = -np.ones(nf, np.int64)
    next_id = 0
    # local adjacency inside a 2x2x2 block: positions 0..7, bit = (x,y,z)
    local_edges = []
    for p in range(8):
        x, y, z = p >> 2 & 1, p >> 1 & 1, p & 1
        for q in range(p + 1, 8):
            x2, y2, z2 = q >> 2 & 1, q >> 1 & 1, q & 1
            if abs(x - x2) + abs(y - y2) + abs(z - z2) == 1:
                local_edges.append((p, q))
    for bi in range(n // 2):
        for bj in range(n // 2):
            for bk in range(n // 2):
                cells = []
                for p in range(8):
                    x = 2 * bi + (p >> 2 & 1)
                    y = 2 * bj + (p >> 1 & 1)
                    z = 2 * bk + (p & 1)
                    cells.append(idx[x, y, z])  # -1 if not free
                present = [p for p in range(8) if cells[p] >= 0]
                if not present:
                    continue
                if not split:
                    for p in present:
                        agg[cells[p]] = next_id
                    next_id += 1
                    continue
                # union-find over the block
                parent = list(range(8))

                def find(a):
                    while parent[a] != a:
                        parent[a] = parent[parent[a]]
                        a = parent[a]
                    return a

                for p, q in local_edges:
                    if cells[p] >= 0 and cells[q] >= 0:
                        parent[find(p)] = find(q)
                comp_ids = {}
                for p in present:
                    root = find(p)
                    if root not in comp_ids:
                        comp_ids[root] = next_id
                        next_id += 1
                    agg[cells[p]] = comp_ids[root]
    assert (agg >= 0).all()
    return agg, next_id


def two_level_rho(A, P, nu, omega, iters=60, seed=0, Ac=None):
    nf = A.shape[0]
    R = P.T.tocsr()
    Ac = (R @ A @ P).tocsc() if Ac is None else Ac.tocsc()
    solve_c = spla.factorized(Ac)
    dinv = 1.0 / A.diagonal()

    def smooth(x, b):
        for _ in range(nu):
            x = x + omega * dinv * (b - A @ x)
        return x

    def E(e):
        # error propagation with b = 0
        e = smooth(e, np.zeros(nf)) if nu else e
        e = e - P @ solve_c(R @ (A @ e))
        e = smooth(e, np.zeros(nf)) if nu else e
        return e

    rng = np.random.default_rng(seed)
    e = rng.standard_normal(nf)
    e /= np.linalg.norm(e)
    rho = 0.0
    for _ in range(iters):
        e2 = E(e)
        rho = np.linalg.norm(e2)
        e = e2 / max(rho, 1e-300)
    return rho


def main():
    free = porous_mask(N, POROSITY, SEED)
    print(f"N={N} porous mask: {free.mean():.3f} active fraction")
    A, idx, free = assemble(free)
    nf = A.shape[0]
    print(f"free cells: {nf}")

    results = {}
    for name, split in (("blocks", False), ("split", True)):
        agg, nagg = block_aggregates(free, idx, split)
        P = sp.csr_matrix(
            (np.ones(nf), (np.arange(nf), agg)), shape=(nf, nagg))
        rho = two_level_rho(A, P, NU, OMEGA)
        results[name] = rho
        print(f"{name:9s} nagg={nagg:7d}  rho = {rho:.4f}")
        if split:
            # smoothed aggregation on the same aggregates
            dinv = sp.diags(1.0 / A.diagonal())
            om_sa = 2.0 / 3.0  # classic SA smoothing weight ~ 4/(3 lam_max)
            Ps = ((sp.eye(nf) - om_sa * (dinv @ A)) @ P).tocsr()
            rho_sa = two_level_rho(A, Ps, NU, OMEGA)
            results["split-sa"] = rho_sa
            print(f"{'split-sa':9s} nagg={nagg:7d}  rho = {rho_sa:.4f}")
            # SA transfers over the PC-Galerkin coarse operator — the
            # zero-new-machinery variant: the production conductance
            # hierarchy is exactly P^T A P for PC P (preconditioners.py
            # galerkin_coarsen), so if this holds up, only the transfers
            # change on TPU (one extra fine apply per transfer direction).
            Ac_pc = (P.T @ A @ P).tocsc()
            rho_mix = two_level_rho(A, Ps, NU, OMEGA, Ac=Ac_pc)
            results["sa-pcgal"] = rho_mix
            print(f"{'sa-pcgal':9s} nagg={nagg:7d}  rho = {rho_mix:.4f}")
            # rescaled variant: PC-Galerkin Ac underestimates the SA
            # coarse energy by ~ (sum of P_s column weights)^2 per agg
            colsum = np.asarray(Ps.sum(axis=0)).ravel()
            blkcol = np.asarray(P.sum(axis=0)).ravel()
            scale = sp.diags((colsum / blkcol) ** 2)
            rho_mix2 = two_level_rho(A, Ps, NU, OMEGA, Ac=(scale @ Ac_pc))
            results["sa-pcgal-scaled"] = rho_mix2
            print(f"{'sa-pcgal-scaled':9s}            rho = {rho_mix2:.4f}")

    # --- filtered-true-Galerkin SA: drop coarse couplings beyond the
    # 27-point neighbourhood, lumping them into the diagonal (row-sum
    # preserving).  If rho holds near the exact-Ac 0.42, the TPU coarse
    # operator stays a 27-point stencil instead of 5x5x5.
    agg, nagg = block_aggregates(free, idx, True)
    P = sp.csr_matrix((np.ones(nf), (np.arange(nf), agg)), shape=(nf, nagg))
    dinv = sp.diags(1.0 / A.diagonal())
    Ps = ((sp.eye(nf) - (2.0 / 3.0) * (dinv @ A)) @ P).tocsr()
    Ac_true = (Ps.T @ A @ Ps).tocoo()
    # aggregate -> block coordinates (first fine member's block)
    I3, J3, K3 = np.nonzero(free)
    bcoord = np.zeros((nagg, 3), np.int64)
    bcoord[agg] = np.stack([I3, J3, K3], axis=1) // 2
    d3 = np.abs(bcoord[Ac_true.row] - bcoord[Ac_true.col]).max(axis=1)
    keep = d3 <= 1
    lump_r, lump_v = Ac_true.row[~keep], Ac_true.data[~keep]
    diag_add = np.zeros(nagg)
    np.add.at(diag_add, lump_r, lump_v)
    Ac_f = sp.coo_matrix(
        (np.concatenate([Ac_true.data[keep], diag_add]),
         (np.concatenate([Ac_true.row[keep], np.arange(nagg)]),
          np.concatenate([Ac_true.col[keep], np.arange(nagg)]))),
        shape=(nagg, nagg)).tocsc()
    dropped = (~keep).sum()
    rho_f = two_level_rho(A, Ps, NU, OMEGA, Ac=Ac_f)
    results["sa-filter27"] = rho_f
    print(f"{'sa-filter27':9s} dropped={dropped}  rho = {rho_f:.4f}")
    for mode in ("drop", "abslump"):
        dadd = (np.zeros(nagg) if mode == "drop" else
                np.zeros(nagg))
        if mode == "abslump":
            np.add.at(dadd, lump_r, np.abs(lump_v))
        Ac_v = sp.coo_matrix(
            (np.concatenate([Ac_true.data[keep], dadd]),
             (np.concatenate([Ac_true.row[keep], np.arange(nagg)]),
              np.concatenate([Ac_true.col[keep], np.arange(nagg)]))),
            shape=(nagg, nagg)).tocsc()
        rho_v = two_level_rho(A, Ps, NU, OMEGA, Ac=Ac_v)
        results[f"sa-f27-{mode}"] = rho_v
        print(f"sa-f27-{mode}  rho = {rho_v:.4f}")

    # --- aggressive 4x4x4 aggregates + SA --------------------------------
    # Motivation: with 2x2x2 blocks the TRUE SA Galerkin operator is a
    # 5x5x5 coarse stencil (63 unique coeffs — memory- and bandwidth-
    # prohibitive at 512^3 level 1).  With 4x4x4 blocks the smoothed
    # support (deg d: block + d-ring) only reaches nearest-neighbour
    # blocks, so Ac is 27-point (14 unique), and the coarse grid is 64x
    # smaller than fine — TPU-friendly.  Classic SA pairs aggressive
    # coarsening with higher prolongator-smoothing degree.
    b4 = (np.stack(np.nonzero(free), axis=1) // 4)
    nb4 = free.shape[0] // 4
    agg4 = (b4[:, 0] * nb4 + b4[:, 1]) * nb4 + b4[:, 2]
    uniq, agg4 = np.unique(agg4, return_inverse=True)
    P4 = sp.csr_matrix((np.ones(nf), (np.arange(nf), agg4)),
                       shape=(nf, len(uniq)))
    dinv = sp.diags(1.0 / A.diagonal())
    S_sm = sp.eye(nf) - (2.0 / 3.0) * (dinv @ A)
    for deg in (1, 2, 3):
        Ps4 = P4
        for _ in range(deg):
            Ps4 = S_sm @ Ps4
        rho4 = two_level_rho(A, Ps4.tocsr(), NU, OMEGA)
        results[f"agg4-sa{deg}"] = rho4
        print(f"agg4-sa{deg}  nagg={len(uniq):7d}  rho = {rho4:.4f}")

    # context: the fully-active (plain Poisson w/ Dirichlet X) baseline
    full = np.ones((N, N, N), bool)
    A2, idx2, _ = assemble(full)
    for name, split in (("poisson-blocks", False),):
        agg, nagg = block_aggregates(full, idx2, split)
        P = sp.csr_matrix((np.ones(A2.shape[0]),
                           (np.arange(A2.shape[0]), agg)),
                          shape=(A2.shape[0], nagg))
        print(f"{name:9s} nagg={nagg:7d}  rho = "
              f"{two_level_rho(A2, P, NU, OMEGA):.4f}")
    return results


if __name__ == "__main__":
    main()
