"""Lambert Conformal Conic (1SP/2SP).

Reference: src/projections/lcc.cpp:23-157.
"""

from __future__ import annotations

import math

import numpy as np

from proj_4_spark.kernels import common as C
from proj_4_spark.kernels.base import PJ, ProjError, UNITS_CLASSIC, UNITS_RADIANS

_EPS10 = 1.0e-10


def lcc_e_forward(lam, phi, z, t, P: PJ):
    """lcc.cpp:23-43."""
    Q = P.opaque
    n = Q["n"]
    at_pole = np.abs(np.abs(phi) - C.M_HALFPI) < _EPS10
    bad = at_pole & ((phi * n) <= 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        if P.es != 0.0:
            rho = Q["c"] * np.power(C.tsfn(phi, np.sin(phi), P.e), n)
        else:
            rho = Q["c"] * np.power(np.tan(C.M_FORTPI + 0.5 * phi), -n)
    rho = np.where(at_pole, 0.0, rho)
    lamn = lam * n
    x = P.k0 * (rho * np.sin(lamn))
    y = P.k0 * (Q["rho0"] - rho * np.cos(lamn))
    x = np.where(bad, np.nan, x)
    y = np.where(bad, np.nan, y)
    return x, y, z, t


def lcc_e_inverse(x, y, z, t, P: PJ):
    """lcc.cpp:46-77 (iterative phi2 for the ellipsoidal case)."""
    Q = P.opaque
    n = Q["n"]
    x = x / P.k0
    y = y / P.k0
    y = Q["rho0"] - y
    rho = np.hypot(x, y)
    neg = n < 0.0
    if neg:
        rho = -rho
        x = -x
        y = -y
    nonzero = rho != 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        if P.es != 0.0:
            phi = C.phi2(np.power(np.where(nonzero, rho, 1.0) / Q["c"], 1.0 / n), P.e)
        else:
            phi = 2.0 * np.arctan(np.power(Q["c"] / np.where(nonzero, rho, 1.0), 1.0 / n)) - C.M_HALFPI
        lam = np.arctan2(x, y) / n
    pole_phi = C.M_HALFPI if n > 0.0 else -C.M_HALFPI
    phi = np.where(nonzero, phi, pole_phi)
    lam = np.where(nonzero, lam, 0.0)
    lam = np.where(np.isnan(phi), np.nan, lam)
    return lam, phi, z, t


def setup_lcc(P: PJ) -> PJ:
    """lcc.cpp:80-157."""
    Q: dict = {}
    phi1 = P.param_r("lat_1")
    if P.has("lat_2"):
        phi2 = P.param_r("lat_2")
    else:
        phi2 = phi1
        if not P.has("lat_0"):
            P.phi0 = phi1
    if abs(phi1) > C.M_HALFPI or abs(phi2) > C.M_HALFPI:
        raise ProjError("lat_larger_than_90")
    if abs(phi1 + phi2) < _EPS10:
        raise ProjError("conic_lat_equal")

    sinphi = math.sin(phi1)
    n = sinphi
    cosphi = math.cos(phi1)
    secant = abs(phi1 - phi2) >= _EPS10
    if P.es != 0.0:
        m1 = float(C.msfn(np.float64(sinphi), np.float64(cosphi), P.es))
        ml1 = float(C.tsfn(np.float64(phi1), np.float64(sinphi), P.e))
        if ml1 == 0:
            raise ProjError("lat_1_or_2_zero_or_90")
        if secant:
            sinphi = math.sin(phi2)
            n = math.log(m1 / float(C.msfn(np.float64(sinphi),
                                           np.float64(math.cos(phi2)), P.es)))
            if n == 0:
                raise ProjError("invalid_eccentricity")
            ml2 = float(C.tsfn(np.float64(phi2), np.float64(sinphi), P.e))
            if ml2 == 0:
                raise ProjError("lat_1_or_2_zero_or_90")
            denom = math.log(ml1 / ml2)
            if denom == 0:
                raise ProjError("invalid_eccentricity")
            n /= denom
        rho0 = m1 * math.pow(ml1, -n) / n
        c = rho0
        if abs(abs(P.phi0) - C.M_HALFPI) < _EPS10:
            rho0 = 0.0
        else:
            rho0 *= math.pow(
                float(C.tsfn(np.float64(P.phi0), np.float64(math.sin(P.phi0)), P.e)), n
            )
    else:
        if abs(cosphi) < _EPS10 or abs(math.cos(phi2)) < _EPS10:
            raise ProjError("lat_1_or_2_zero_or_90")
        if secant:
            n = math.log(cosphi / math.cos(phi2)) / math.log(
                math.tan(C.M_FORTPI + 0.5 * phi2) / math.tan(C.M_FORTPI + 0.5 * phi1)
            )
        if n == 0:
            raise ProjError("conic_lat_equal")
        c = cosphi * math.pow(math.tan(C.M_FORTPI + 0.5 * phi1), n) / n
        if abs(abs(P.phi0) - C.M_HALFPI) < _EPS10:
            rho0 = 0.0
        else:
            rho0 = c * math.pow(math.tan(C.M_FORTPI + 0.5 * P.phi0), -n)

    Q["n"] = n
    Q["c"] = c
    Q["rho0"] = rho0
    P.opaque.update(Q)
    P.fwd, P.inv = lcc_e_forward, lcc_e_inverse
    P.left = UNITS_RADIANS
    P.right = UNITS_CLASSIC
    return P
