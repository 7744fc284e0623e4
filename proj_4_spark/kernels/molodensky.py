"""Molodensky datum shift — placeholder filled in milestone 2.

Reference: src/transformations/molodensky.cpp:174-352.
"""

from __future__ import annotations

from proj_4_spark.kernels.base import PJ, ProjError


def setup_molodensky(P: PJ) -> PJ:
    raise ProjError("unsupported", "molodensky not yet implemented")
