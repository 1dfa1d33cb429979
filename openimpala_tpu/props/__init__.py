"""Physics drivers — the L3 "properties" layer of the reference
(``src/props/``): volume fraction, flow-through tortuosity, homogenised
effective diffusivity, REV studies, and the explicit baseline solver."""

from .volume_fraction import volume_fraction, volume_fraction_counts
from .tortuosity import tortuosity, TortuosityResult
from .effective_diffusivity import (
    effective_diffusivity,
    deff_tensor,
    EffectiveDiffusivityResult,
)
from .tortuosity_direct import tortuosity_direct, TortuosityDirectResult
from .rev import rev_study

__all__ = [
    "volume_fraction",
    "volume_fraction_counts",
    "tortuosity",
    "TortuosityResult",
    "effective_diffusivity",
    "deff_tensor",
    "EffectiveDiffusivityResult",
    "tortuosity_direct",
    "TortuosityDirectResult",
    "rev_study",
]

from ..utils.common import parse_direction, DIRECTIONS  # noqa: E402
