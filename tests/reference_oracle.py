"""Independent dense re-implementation of the reference matrix fills.

These functions transcribe the *rules* of ``TortuosityHypreFill.F90`` and
``EffDiffFillMtx.F90`` (documented in SURVEY.md §2.1) into straightforward
dense numpy assembly.  They are deliberately written loop-by-loop, separate
from the library's fused matrix-free operators, so tests can pin the
operator semantics against an independent implementation — the test-side
equivalent of ``TortuosityHypre::checkMatrixProperties``.
"""

from __future__ import annotations

import numpy as np


def _ravel(shape):
    def idx(i, j, k):
        return (i * shape[1] + j) * shape[2] + k

    return idx


def assemble_tortuosity_dense(active, direction, vlo, vhi, dx=(1.0, 1.0, 1.0)):
    """Full-system A, b, xinit for the flow-through operator
    (``TortuosityHypreFill.F90:44-262``).  Out-of-domain neighbours are
    inactive (clamped)."""
    active = np.asarray(active, bool)
    shape = active.shape
    n = active.size
    idx = _ravel(shape)
    w = [1.0 / (d * d) for d in dx]
    A = np.zeros((n, n))
    b = np.zeros(n)
    xinit = np.zeros(n)
    offsets = [(-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1)]
    weights = [w[0], w[0], w[1], w[1], w[2], w[2]]
    nd = shape[direction]

    for i in range(shape[0]):
        for j in range(shape[1]):
            for k in range(shape[2]):
                c = idx(i, j, k)
                if not active[i, j, k]:
                    A[c, c] = 1.0
                    continue
                diag = 0.0
                for (oi, oj, ok), wf in zip(offsets, weights):
                    ni, nj, nk = i + oi, j + oj, k + ok
                    inside = (0 <= ni < shape[0] and 0 <= nj < shape[1]
                              and 0 <= nk < shape[2])
                    if inside and active[ni, nj, nk]:
                        A[c, idx(ni, nj, nk)] = -wf
                        diag += wf
                A[c, c] = diag
                if diag < 1e-15:  # safety decouple (F90:172-181)
                    A[c, :] = 0.0
                    A[c, c] = 1.0
                    continue
                pos = (i, j, k)[direction]
                if pos == 0:
                    A[c, :] = 0.0
                    A[c, c] = 1.0
                    b[c] = vlo
                elif pos == nd - 1:
                    A[c, :] = 0.0
                    A[c, c] = 1.0
                    b[c] = vhi
                xinit[c] = vlo + (vhi - vlo) * pos / (nd - 1)
    return A, b, xinit


def assemble_tortuosity_sparse(active, direction, vlo, vhi, dx=(1.0, 1.0, 1.0)):
    """scipy.sparse CSR assembly of the SAME rules as
    ``assemble_tortuosity_dense`` (vectorised so it scales to the 100^3
    golden volume — 1e6 rows).  Returns (A_csr, b, xinit).  Shares no code
    with the library's matrix-free operators."""
    from scipy import sparse

    active = np.asarray(active, bool)
    shape = active.shape
    n = active.size
    lin = np.arange(n).reshape(shape)
    w = [1.0 / (d * d) for d in dx]
    nd = shape[direction]

    # weighted degree: sum of w_f over active in-domain neighbours
    degree = np.zeros(shape)
    pairs = []  # (row_idx, col_idx, weight) arrays per face direction
    for ax in range(3):
        sl_lo = [slice(None)] * 3
        sl_hi = [slice(None)] * 3
        sl_lo[ax] = slice(0, -1)
        sl_hi[ax] = slice(1, None)
        sl_lo, sl_hi = tuple(sl_lo), tuple(sl_hi)
        link = active[sl_lo] & active[sl_hi]
        degree[sl_lo] += np.where(link, w[ax], 0.0)
        degree[sl_hi] += np.where(link, w[ax], 0.0)
        pairs.append((lin[sl_lo][link], lin[sl_hi][link], w[ax]))

    connected = active & (degree > 0)
    pos = np.arange(nd).reshape([-1 if a == direction else 1 for a in range(3)])
    dir_lo = connected & (pos == 0)
    dir_hi = connected & (pos == nd - 1)
    free = connected & ~dir_lo & ~dir_hi

    free_flat = free.ravel()
    rows, cols, data = [], [], []
    for lo_idx, hi_idx, wf in pairs:
        # off-diagonals only on FREE rows (identity/Dirichlet rows have none)
        m = free_flat[lo_idx]
        rows.append(lo_idx[m]); cols.append(hi_idx[m])
        data.append(np.full(m.sum(), -wf))
        m = free_flat[hi_idx]
        rows.append(hi_idx[m]); cols.append(lo_idx[m])
        data.append(np.full(m.sum(), -wf))
    all_idx = lin.ravel()
    rows.append(all_idx); cols.append(all_idx)
    data.append(np.where(free_flat, degree.ravel(), 1.0))  # diag / identity

    A = sparse.csr_matrix(
        (np.concatenate(data), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n),
    )
    b = np.where(dir_lo, float(vlo), 0.0) + np.where(dir_hi, float(vhi), 0.0)
    ramp = vlo + (vhi - vlo) * pos / (nd - 1)
    xinit = np.where(free, np.broadcast_to(ramp, shape), b.reshape(shape))
    return A, b.ravel(), xinit.ravel()


def assemble_cell_problem_sparse(active, dir_k, dx=(1.0, 1.0, 1.0)):
    """scipy.sparse CSR assembly of the periodic cell problem (same rules as
    ``assemble_cell_problem_dense``, vectorised).  Returns (A_csr, b)."""
    from scipy import sparse

    active = np.asarray(active, bool)
    shape = active.shape
    n = active.size
    lin = np.arange(n).reshape(shape)
    w = [1.0 / (d * d) for d in dx]
    act_flat = active.ravel()

    rows, cols, data = [], [], []
    diag = np.where(active, 2.0 * (w[0] + w[1] + w[2]), 1.0)  # identity rows
    rhs = np.zeros(shape)
    for ax in range(3):
        nbr_hi = np.roll(active, -1, axis=ax)  # neighbour at +1 (wrapped)
        lin_hi = np.roll(lin, -1, axis=ax)
        link = active & nbr_hi
        # off-diagonals between active pairs, both directions
        rows.append(lin[link]); cols.append(lin_hi[link])
        data.append(np.full(int(link.sum()), -w[ax]))
        rows.append(lin_hi[link]); cols.append(lin[link])
        data.append(np.full(int(link.sum()), -w[ax]))
        if ax == dir_k:
            nbr_lo = np.roll(active, 1, axis=ax)
            inv_d = 1.0 / dx[ax]
            # interface flux (EffDiffFillMtx.F90:156-221): +1/dx at a solid
            # -face, -1/dx at a solid +face
            rhs += np.where(active & ~nbr_lo, inv_d, 0.0)
            rhs += np.where(active & ~nbr_hi, -inv_d, 0.0)
            # central difference of D along k (:225-232)
            d_m = nbr_lo.astype(float)
            d_p = nbr_hi.astype(float)
            rhs += np.where(active, -(d_p - d_m) / (2.0 * dx[ax]), 0.0)

    all_idx = lin.ravel()
    rows.append(all_idx); cols.append(all_idx)
    data.append(diag.ravel())
    A = sparse.csr_matrix(
        (np.concatenate(data), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n),
    )
    return A, np.where(active, rhs, 0.0).ravel()


def assemble_cell_problem_dense(active, dir_k, dx=(1.0, 1.0, 1.0)):
    """Full-system A, b for the periodic homogenisation cell problem
    (``EffDiffFillMtx.F90:42-264``).  All axes periodic."""
    active = np.asarray(active, bool)
    shape = active.shape
    n = active.size
    idx = _ravel(shape)
    w = [1.0 / (d * d) for d in dx]
    A = np.zeros((n, n))
    b = np.zeros(n)
    offsets = [(-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1)]
    weights = [w[0], w[0], w[1], w[1], w[2], w[2]]
    axes = [0, 0, 1, 1, 2, 2]
    signs = [-1, +1, -1, +1, -1, +1]

    for i in range(shape[0]):
        for j in range(shape[1]):
            for k in range(shape[2]):
                c = idx(i, j, k)
                if not active[i, j, k]:
                    A[c, c] = 1.0
                    continue
                diag = 0.0
                rhs = 0.0
                for (oi, oj, ok), wf, ax, sg in zip(offsets, weights, axes, signs):
                    ni = (i + oi) % shape[0]
                    nj = (j + oj) % shape[1]
                    nk = (k + ok) % shape[2]
                    if active[ni, nj, nk]:
                        A[c, idx(ni, nj, nk)] += -wf
                        diag += wf
                    else:
                        diag += wf  # interface: diagonal only
                        if ax == dir_k:
                            # -face (sg=-1): +1/dx ; +face (sg=+1): -1/dx
                            rhs += -sg * (1.0 / dx[ax])
                A[c, c] = diag
                # central difference of D along k (EffDiffFillMtx.F90:225-232)
                lo = [i, j, k]
                hi = [i, j, k]
                lo[dir_k] = (lo[dir_k] - 1) % shape[dir_k]
                hi[dir_k] = (hi[dir_k] + 1) % shape[dir_k]
                d_m = 1.0 if active[tuple(lo)] else 0.0
                d_p = 1.0 if active[tuple(hi)] else 0.0
                rhs += -(d_p - d_m) / (2.0 * dx[dir_k])
                b[c] = rhs
    return A, b
