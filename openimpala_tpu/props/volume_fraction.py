"""Volume fraction of a phase.

Replaces ``OpenImpala::VolumeFraction`` (``src/props/VolumeFraction.{H,cpp}``):
count cells equal to the phase id over the valid region and divide by the
total cell count.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def volume_fraction_counts(phase, phase_id: int):
    """(phase_count, total_count) — the reference's
    ``VolumeFraction::value(pc, tc)`` (``VolumeFraction.cpp:22-66``)."""
    if isinstance(phase, np.ndarray):
        return int((phase == phase_id).sum()), int(phase.size)
    return int(jnp.sum(phase == phase_id)), int(phase.size)


def volume_fraction(phase, phase_id: int) -> float:
    """phase_count / total_count — ``VolumeFraction::value_vf``."""
    pc, tc = volume_fraction_counts(phase, phase_id)
    return pc / tc if tc > 0 else 0.0
