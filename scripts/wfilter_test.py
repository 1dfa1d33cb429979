import os
import numpy as np
import scipy.sparse as sp
import sa_ml
from sa_ml import (assemble, porous_mask, block_P, measure, N, POROSITY,
                   SEED, NU, OMEGA, OM_SA)


def build(A, coords, shape, sa_levels, filter_deep_smoother):
    levels = []
    l = 0
    bcoords = coords
    while l < 10 and A.shape[0] > 200 and min(shape) >= 4:
        P, coords_c, shape_c = block_P(bcoords, shape)
        if l < sa_levels:
            Asm = A
            if l >= 1 and filter_deep_smoother:
                # smoother uses only nearest-neighbour taps of A
                Ac_ = A.tocoo()
                d = np.abs(bcoords[Ac_.row] - bcoords[Ac_.col]).max(axis=1)
                keep = d <= 1
                Asm = sp.csr_matrix((Ac_.data[keep],
                                     (Ac_.row[keep], Ac_.col[keep])),
                                    shape=A.shape)
            dinv = sp.diags(1.0 / A.diagonal())
            Ps = ((sp.eye(A.shape[0]) - OM_SA * (dinv @ Asm)) @ P).tocsr()
        else:
            Ps = P
        Ac = (Ps.T @ A @ Ps).tocsr()
        levels.append((A, Ps))
        A, bcoords, shape = Ac, coords_c, shape_c
        l += 1
    return levels, A


free = porous_mask(N, POROSITY, SEED)
A, idx, free = assemble(free)
coords = np.stack(np.nonzero(free), axis=1)
for name, flt in (("sa-two-full", False), ("sa-two-filt", True)):
    levels, coarsest = build(A, coords, free.shape, 2, flt)
    measure(name, A, levels, coarsest)
