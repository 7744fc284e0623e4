"""Mercator / Web Mercator.

Reference: src/projections/merc.cpp:22-100 (ell+sph fwd/inv, setup),
webmerc = spherical kernel with k0 forced to 1 (merc.cpp:92-100).
"""

from __future__ import annotations

import math

import numpy as np

from proj_4_spark.kernels import common as C
from proj_4_spark.kernels.base import PJ, ProjError, UNITS_CLASSIC, UNITS_RADIANS

_EPS10 = 1.0e-10


def merc_e_forward(lam, phi, z, t, P: PJ):
    """merc.cpp:22-31."""
    bad = np.abs(np.abs(phi) - C.M_HALFPI) <= _EPS10
    x = P.k0 * lam
    with np.errstate(divide="ignore", invalid="ignore"):
        y = -P.k0 * np.log(C.tsfn(phi, np.sin(phi), P.e))
    x = np.where(bad, np.nan, x)
    y = np.where(bad, np.nan, y)
    return x, y, z, t


def merc_s_forward(lam, phi, z, t, P: PJ):
    """merc.cpp:34-43."""
    bad = np.abs(np.abs(phi) - C.M_HALFPI) <= _EPS10
    x = P.k0 * lam
    y = P.k0 * C.logtanpfpim1(phi)
    x = np.where(bad, np.nan, x)
    y = np.where(bad, np.nan, y)
    return x, y, z, t


def merc_e_inverse(x, y, z, t, P: PJ):
    """merc.cpp:46-54."""
    phi = C.phi2(np.exp(-y / P.k0), P.e)
    lam = x / P.k0
    lam = np.where(np.isnan(phi), np.nan, lam)
    return lam, phi, z, t


def merc_s_inverse(x, y, z, t, P: PJ):
    """merc.cpp:57-62."""
    phi = np.arctan(np.sinh(y / P.k0))
    lam = x / P.k0
    return lam, phi, z, t


def setup_merc(P: PJ) -> PJ:
    """merc.cpp:65-90."""
    is_phits = P.has("lat_ts")
    phits = 0.0
    if is_phits:
        phits = abs(P.param_r("lat_ts"))
        if phits >= C.M_HALFPI:
            raise ProjError("lat_ts_larger_than_90")
    if P.es != 0.0:
        if is_phits:
            P.k0 = float(C.msfn(np.float64(math.sin(phits)),
                                np.float64(math.cos(phits)), P.es))
        P.fwd, P.inv = merc_e_forward, merc_e_inverse
    else:
        if is_phits:
            P.k0 = math.cos(phits)
        P.fwd, P.inv = merc_s_forward, merc_s_inverse
    P.left = UNITS_RADIANS
    P.right = UNITS_CLASSIC
    return P


def setup_webmerc(P: PJ) -> PJ:
    """merc.cpp:92-100: spherical kernel on the ellipsoid's a, k0=1."""
    P.k0 = 1.0
    P.fwd, P.inv = merc_s_forward, merc_s_inverse
    P.left = UNITS_RADIANS
    P.right = UNITS_CLASSIC
    return P
