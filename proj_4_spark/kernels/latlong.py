"""Identity pseudo-projections and geocentric-latitude helper.

Reference: src/projections/latlong.cpp:40-95 (lonlat/latlon/latlong/longlat),
pj_geocentric_latitude src/4D_api.cpp:558-583.
"""

from __future__ import annotations

import numpy as np

from proj_4_spark.kernels import common as C
from proj_4_spark.kernels.base import PJ, UNITS_DEGREES, UNITS_RADIANS


def geocentric_latitude(P: PJ, direction: str, phi: np.ndarray) -> np.ndarray:
    """Geographic <-> geocentric latitude; src/4D_api.cpp:558-583.

    No conversion within 1e-9 rad of the poles or on a sphere.
    """
    if P.es == 0:
        return phi
    limit = C.M_HALFPI - 1e-9
    polar = (phi > limit) | (phi < -limit)
    factor = P.one_es if direction == "fwd" else P.rone_es
    with np.errstate(invalid="ignore"):
        converted = np.arctan(factor * np.tan(phi))
    return np.where(polar, phi, converted)


def _identity4(lam, phi, z, t, P):
    return lam, phi, z, t


def setup_latlong(P: PJ) -> PJ:
    """latlong.cpp:88-101: unit tagging only (radians both sides);
    x0/y0 forced to 0."""
    P.is_latlong = True
    P.x0 = 0.0
    P.y0 = 0.0
    P.fwd = _identity4
    P.inv = _identity4
    P.fwd4d = _identity4
    P.inv4d = _identity4
    P.left = UNITS_RADIANS
    P.right = UNITS_RADIANS
    return P
