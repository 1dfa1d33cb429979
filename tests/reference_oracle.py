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
