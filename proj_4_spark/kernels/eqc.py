"""Equidistant Cylindrical (Plate Carree) and Equal Area Cylindrical.

Reference: src/projections/eqc.cpp (54 LoC), src/projections/cea.cpp.
"""

from __future__ import annotations

import math

import numpy as np

from proj_4_spark.kernels import common as C
from proj_4_spark.kernels.base import PJ, ProjError, UNITS_CLASSIC, UNITS_RADIANS

_EPS = 1e-10


def eqc_s_forward(lam, phi, z, t, P: PJ):
    """eqc.cpp:19-27."""
    rc = P.opaque["rc"]
    return rc * lam, phi - P.phi0, z, t


def eqc_s_inverse(x, y, z, t, P: PJ):
    """eqc.cpp:30-38."""
    rc = P.opaque["rc"]
    return x / rc, y + P.phi0, z, t


def setup_eqc(P: PJ) -> PJ:
    """eqc.cpp:41-54: spherical-only (es forced to 0)."""
    rc = math.cos(P.param_r("lat_ts"))
    if rc <= 0.0:
        raise ProjError("lat_ts_larger_than_90")
    P.opaque["rc"] = rc
    # P->es = 0 (eqc.cpp:52): kernel is spherical regardless of ellipsoid
    P.fwd, P.inv = eqc_s_forward, eqc_s_inverse
    P.left = UNITS_RADIANS
    P.right = UNITS_CLASSIC
    return P


def cea_e_forward(lam, phi, z, t, P: PJ):
    """cea.cpp:20-26."""
    x = P.k0 * lam
    y = 0.5 * C.qsfn(np.sin(phi), P.e, P.one_es) / P.k0
    return x, y, z, t


def cea_s_forward(lam, phi, z, t, P: PJ):
    """cea.cpp:29-34."""
    return P.k0 * lam, np.sin(phi) / P.k0, z, t


def cea_e_inverse(x, y, z, t, P: PJ):
    """cea.cpp:37-42."""
    Q = P.opaque
    phi = C.authlat(np.arcsin(np.clip(2.0 * y * P.k0 / Q["qp"], -1.0, 1.0)), Q["apa"])
    lam = x / P.k0
    return lam, phi, z, t


def cea_s_inverse(x, y, z, t, P: PJ):
    """cea.cpp:45-61."""
    yk = y * P.k0
    ta = np.abs(yk)
    ok = ta - _EPS <= 1.0
    phi = np.where(
        ta >= 1.0,
        np.where(yk < 0.0, -C.M_HALFPI, C.M_HALFPI),
        np.arcsin(np.clip(yk, -1.0, 1.0)),
    )
    lam = x / P.k0
    phi = np.where(ok, phi, np.nan)
    lam = np.where(ok, lam, np.nan)
    return lam, phi, z, t


def setup_cea(P: PJ) -> PJ:
    """cea.cpp:74-105."""
    Q = P.opaque
    t0 = 0.0
    if P.has("lat_ts"):
        t0 = P.param_r("lat_ts")
        P.k0 = math.cos(t0)
        if P.k0 < 0.0:
            raise ProjError("lat_ts_larger_than_90")
    if P.es != 0.0:
        st = math.sin(t0)
        P.k0 /= math.sqrt(1.0 - P.es * st * st)
        Q["apa"] = C.authset(P.es)
        Q["qp"] = float(C.qsfn(np.float64(1.0), P.e, P.one_es))
        P.fwd, P.inv = cea_e_forward, cea_e_inverse
    else:
        P.fwd, P.inv = cea_s_forward, cea_s_inverse
    P.left = UNITS_RADIANS
    P.right = UNITS_CLASSIC
    return P
