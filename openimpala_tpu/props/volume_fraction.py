"""Volume fraction of a phase.

Replaces ``OpenImpala::VolumeFraction`` (``src/props/VolumeFraction.{H,cpp}``):
count cells equal to the phase id over the valid region and divide by the
total cell count.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def volume_fraction_counts(phase, phase_id: int, local: bool = False):
    """(phase_count, total_count) — the reference's
    ``VolumeFraction::value(pc, tc, local)`` (``VolumeFraction.cpp:22-66``).

    ``local=True`` mirrors the reference's skip-the-MPI-reduction mode: for a
    device-sharded array it returns per-shard ``(counts, totals)`` lists (one
    entry per addressable shard) instead of globally reduced scalars.
    """
    if local and hasattr(phase, "addressable_shards"):
        shards = phase.addressable_shards
        if len(shards) > 1:
            counts = [int(np.asarray(s.data == phase_id).sum()) for s in shards]
            totals = [int(np.asarray(s.data).size) for s in shards]
            return counts, totals
    if isinstance(phase, np.ndarray):
        return int((phase == phase_id).sum()), int(phase.size)
    from ..utils.common import count_true

    return count_true(phase == phase_id), int(phase.size)


def volume_fraction(phase, phase_id: int) -> float:
    """phase_count / total_count — ``VolumeFraction::value_vf``."""
    pc, tc = volume_fraction_counts(phase, phase_id)
    return pc / tc if tc > 0 else 0.0
