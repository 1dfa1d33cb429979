"""Preconditioners as pytree dataclasses.

Preconditioner state (diagonals, multigrid hierarchies) must flow into the
jitted Krylov loops as ARGUMENTS, not as Python closures: a closure's arrays
become constants embedded in the HLO, which bloats compile time, defeats the
persistent compilation cache, and at 512^3 produces compile payloads in the
hundreds of MB.  Each class here is a registered dataclass (arrays = leaves,
hyperparameters = static) whose ``__call__`` applies M^{-1} r.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.stencil import apply_restricted, weighted_degree


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IdentityPreconditioner:
    def __call__(self, r):
        return r


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class JacobiPreconditioner:
    """Diagonal scaling restricted to the free set."""

    diag: jax.Array
    free: jax.Array

    @classmethod
    def from_system(cls, system):
        return cls(diag=system.diag, free=system.free)

    def __call__(self, r):
        diag = jnp.broadcast_to(self.diag, r.shape).astype(r.dtype)
        safe = jnp.where(diag > 0, diag, jnp.ones((), r.dtype))
        return jnp.where(self.free, r / safe, jnp.zeros((), r.dtype))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MGLevel:
    diag: jax.Array  # per-cell diagonal (or scalar 0-d) on this level
    free: jax.Array
    w: tuple = dataclasses.field(metadata=dict(static=True))
    periodic: tuple = dataclasses.field(metadata=dict(static=True))

    def apply(self, x):
        return apply_restricted(x, self.diag, self.free, self.w, self.periodic)


def _can_coarsen(shape):
    return all(s % 2 == 0 and s >= 8 for s in shape)


# NB: the obvious 6-D reshape+reduce forms of these transfers crash the TPU
# compiler outright at >= 384^3; strided-slice forms lower cleanly.


def _restrict(x):
    acc = None
    for i in (0, 1):
        for j in (0, 1):
            for k in (0, 1):
                sl = x[i::2, j::2, k::2]
                acc = sl if acc is None else acc + sl
    return acc * jnp.asarray(0.125, x.dtype)


def _prolong(xc):
    x = jnp.repeat(xc, 2, axis=0)
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def _coarsen_free(free):
    acc = None
    for i in (0, 1):
        for j in (0, 1):
            for k in (0, 1):
                sl = free[i::2, j::2, k::2]
                acc = sl if acc is None else acc | sl
    return acc


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MultigridPreconditioner:
    """Geometric multigrid V-cycle (see solve/multigrid.py docstring).

    ``levels`` is a tuple of MGLevel from fine to coarse; smoothing is
    damped Jacobi with symmetric pre/post counts so the V-cycle is a fixed
    symmetric operator and PCG stays valid.
    """

    levels: Tuple[MGLevel, ...]
    nu1: int = dataclasses.field(default=2, metadata=dict(static=True))
    nu2: int = dataclasses.field(default=2, metadata=dict(static=True))
    omega: float = dataclasses.field(default=0.8, metadata=dict(static=True))
    coarse_sweeps: int = dataclasses.field(default=30, metadata=dict(static=True))

    @classmethod
    def from_system(cls, system, max_levels: int = 10, **kw):
        dtype = system.r0_b.dtype
        diag_is_scalar = jnp.ndim(system.diag) == 0
        levels = [MGLevel(diag=system.diag, free=system.free, w=system.w,
                          periodic=system.periodic)]
        free = system.free
        w = system.w
        while len(levels) < max_levels and _can_coarsen(free.shape):
            free = _coarsen_free(free)
            w = tuple(wi / 4.0 for wi in w)  # dx doubles
            if diag_is_scalar:
                diag = jnp.asarray(2.0 * sum(w), dtype)
            else:
                diag = weighted_degree(free, w, system.periodic, dtype)
            levels.append(MGLevel(diag=diag, free=free, w=w,
                                  periodic=system.periodic))
        return cls(levels=tuple(levels), **kw)

    def _smooth(self, level: MGLevel, x, r, n: int):
        diag = jnp.broadcast_to(level.diag, r.shape).astype(r.dtype)
        inv_d = jnp.where(
            level.free & (diag > 0),
            jnp.asarray(self.omega, r.dtype) / jnp.where(diag > 0, diag, 1.0),
            jnp.zeros((), r.dtype),
        )

        def body(i, x):
            return x + inv_d * (r - level.apply(x))

        return jax.lax.fori_loop(0, n, body, x)

    def _vcycle(self, idx: int, r):
        level = self.levels[idx]
        x = jnp.zeros_like(r)
        if idx == len(self.levels) - 1:
            return self._smooth(level, x, r, self.coarse_sweeps)
        x = self._smooth(level, x, r, self.nu1)
        resid = jnp.where(level.free, r - level.apply(x), jnp.zeros((), r.dtype))
        rc = _restrict(resid)
        coarse = self.levels[idx + 1]
        rc = jnp.where(coarse.free, rc.astype(r.dtype), jnp.zeros((), r.dtype))
        ec = self._vcycle(idx + 1, rc)
        x = x + jnp.where(level.free, _prolong(ec), jnp.zeros((), r.dtype))
        return self._smooth(level, x, r, self.nu2)

    def __call__(self, r):
        return self._vcycle(0, r)
