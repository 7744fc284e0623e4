"""Stereographic family — placeholder (implemented in milestone 2).

Reference: src/projections/stere.cpp:44-310, sterea.cpp, laea.cpp.
"""

from __future__ import annotations

from proj_4_spark.kernels.base import PJ, ProjError


def setup_stere(P: PJ) -> PJ:
    raise ProjError("unsupported", "stere not yet implemented")


def setup_ups(P: PJ) -> PJ:
    raise ProjError("unsupported", "ups not yet implemented")


def setup_sterea(P: PJ) -> PJ:
    raise ProjError("unsupported", "sterea not yet implemented")


def setup_laea(P: PJ) -> PJ:
    raise ProjError("unsupported", "laea not yet implemented")
