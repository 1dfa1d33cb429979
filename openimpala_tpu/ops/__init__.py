"""Masked 7-point stencil operators and supporting grid ops.

Matrix-free, TPU-first replacement for the reference's Fortran fill kernels +
Hypre StructMatrix (``src/props/TortuosityHypreFill.F90``,
``src/props/EffDiffFillMtx.F90``).  Instead of assembling 7 coefficients per
cell, the operator action is fused mask logic around a 7-point neighbour sum;
XLA fuses the whole matvec into one bandwidth-bound pass, and the Pallas
kernel (ops/stencil_pallas.py) fuses the halo reads explicitly.
"""

from .stencil import (
    StencilSystem,
    apply_restricted,
    neighbor_sum,
    weighted_degree,
    make_tortuosity_system,
    make_cell_problem_system,
    check_operator_properties,
)
from .masks import phase_mask, pad_volume_to, linear_ramp
from .floodfill import percolation_mask, flood_fill_device, flood_fill_host
from .filters import remspot
from .flux import boundary_fluxes, deff_integrand_sum

__all__ = [
    "StencilSystem",
    "apply_restricted",
    "neighbor_sum",
    "weighted_degree",
    "make_tortuosity_system",
    "make_cell_problem_system",
    "check_operator_properties",
    "phase_mask",
    "pad_volume_to",
    "linear_ramp",
    "percolation_mask",
    "flood_fill_device",
    "flood_fill_host",
    "remspot",
    "boundary_fluxes",
    "deff_integrand_sum",
]
