"""Horizontal/vertical grid-shift ops — placeholder filled in milestone 3.

Reference: src/transformations/hgridshift.cpp, vgridshift.cpp,
src/grids.cpp:2875-3054 (bilinear interpolation + fixed-point inverse).
"""

from __future__ import annotations

from proj_4_spark.kernels.base import PJ, ProjError


def setup_hgridshift(P: PJ) -> PJ:
    raise ProjError("unsupported", "hgridshift not yet implemented")


def setup_vgridshift(P: PJ) -> PJ:
    raise ProjError("unsupported", "vgridshift not yet implemented")
