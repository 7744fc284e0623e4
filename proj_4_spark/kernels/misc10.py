"""Batch 12: bertin1953, labrd (Laborde Madagascar).

References: src/projections/bertin1953.cpp, src/projections/labrd.cpp.
"""

from __future__ import annotations

import math

import numpy as np

from proj_4_spark.kernels import common as C
from proj_4_spark.kernels.base import PJ, ProjError, UNITS_CLASSIC, UNITS_RADIANS


def setup_bertin1953(P: PJ) -> PJ:
    """bertin1953.cpp (no inverse; fixed pole at phi0=-42, lam offset
    -16.5 deg)."""
    P.lam0 = 0.0
    P.phi0 = math.radians(-42.0)
    cdp = math.cos(P.phi0)
    sdp = math.sin(P.phi0)
    cdg, sdg = 1.0, 0.0

    def fwd(lam, phi, z_, t, _P):
        fu, k, w = 1.4, 12.0, 1.68
        lam = lam + math.radians(-16.5)
        cosphi = np.cos(phi)
        x = np.cos(lam) * cosphi
        y = np.sin(lam) * cosphi
        zz = np.sin(phi)
        z0 = zz * cdp + x * sdp
        lam = np.arctan2(y * cdg - z0 * sdg, x * cdp - zz * sdp)
        z0 = z0 * cdg + y * sdg
        phi = np.arcsin(np.clip(z0, -1, 1))
        lam = C.adjlon(lam)
        cond = lam + phi < -fu
        d = (lam - phi + 1.6) * (lam + phi + fu) / 8.0
        lam = np.where(cond, lam + d, lam)
        phi = np.where(cond, phi - 0.8 * d * np.sin(phi + C.M_PI / 2.0), phi)
        cosphi = np.cos(phi)
        d = np.sqrt(2.0 / (1.0 + cosphi * np.cos(lam / 2.0)))
        x = w * d * cosphi * np.sin(lam / 2.0)
        y = d * np.sin(phi)
        d = (1.0 - np.cos(lam * phi)) / k
        x = np.where(y < 0.0, x * (1.0 + d), x)
        y = np.where(y > 0.0, y * (1.0 + d / 1.5 * x * x), y)
        return x, y, z_, t

    P.es = 0.0
    P.fwd = fwd
    P.left = UNITS_RADIANS
    P.right = UNITS_CLASSIC
    return P


def setup_labrd(P: PJ) -> PJ:
    """labrd.cpp (Laborde; 20-iteration fixed point in the inverse)."""
    if P.phi0 == 0.0:
        raise ProjError("lat_0_is_zero")
    Az = P.param_r("azi")
    sinp = math.sin(P.phi0)
    t = 1.0 - P.es * sinp * sinp
    N = 1.0 / math.sqrt(t)
    R = P.one_es * N / t
    kRg = P.k0 * math.sqrt(N * R)
    p0s = math.atan(math.sqrt(R / N) * math.tan(P.phi0))
    A = sinp / math.sin(p0s)
    t = P.e * sinp
    Cc = (0.5 * P.e * A * math.log((1.0 + t) / (1.0 - t))
          - A * math.log(math.tan(C.M_FORTPI + 0.5 * P.phi0))
          + math.log(math.tan(C.M_FORTPI + 0.5 * p0s)))
    t = Az + Az
    Cb = 1.0 / (12.0 * kRg * kRg)
    Ca = (1.0 - math.cos(t)) * Cb
    Cb *= math.sin(t)
    Cc3 = 3.0 * (Ca * Ca - Cb * Cb)
    Cd = 6.0 * Ca * Cb

    def fwd(lam, phi, z_, t_, _P):
        V1 = A * np.log(np.tan(C.M_FORTPI + 0.5 * phi))
        tt = P.e * np.sin(phi)
        V2 = 0.5 * P.e * A * np.log((1.0 + tt) / (1.0 - tt))
        ps = 2.0 * (np.arctan(np.exp(V1 - V2 + Cc)) - C.M_FORTPI)
        I1 = ps - p0s
        cosps = np.cos(ps)
        cosps2 = cosps * cosps
        sinps = np.sin(ps)
        sinps2 = sinps * sinps
        I4 = A * cosps
        I2 = 0.5 * A * I4 * sinps
        I3 = I2 * A * A * (5.0 * cosps2 - sinps2) / 12.0
        I6 = I4 * A * A
        I5 = I6 * (cosps2 - sinps2) / 6.0
        I6 = I6 * (A * A * (5.0 * cosps2 * cosps2 + sinps2 * (sinps2 - 18.0 * cosps2)) / 120.0)
        tt = lam * lam
        x = kRg * lam * (I4 + tt * (I5 + tt * I6))
        y = kRg * (I1 + tt * (I2 + tt * I3))
        x2 = x * x
        y2 = y * y
        V1 = 3.0 * x * y2 - x * x2
        V2 = y * y2 - 3.0 * x2 * y
        x = x + (Ca * V1 + Cb * V2)
        y = y + (Ca * V2 - Cb * V1)
        return x, y, z_, t_

    def inv(x, y, z_, t_, _P):
        x2 = x * x
        y2 = y * y
        V1 = 3.0 * x * y2 - x * x2
        V2 = y * y2 - 3.0 * x2 * y
        V3 = x * (5.0 * y2 * y2 + x2 * (-10.0 * y2 + x2))
        V4 = y * (5.0 * x2 * x2 + y2 * (-10.0 * x2 + y2))
        x = x + (-Ca * V1 - Cb * V2 + Cc3 * V3 + Cd * V4)
        y = y + (Cb * V1 - Ca * V2 - Cd * V3 + Cc3 * V4)
        ps = p0s + y / kRg
        pe = ps + P.phi0 - p0s
        conv = np.zeros(pe.shape, dtype=bool)
        for _ in range(20):
            V1 = A * np.log(np.tan(C.M_FORTPI + 0.5 * pe))
            tpe = P.e * np.sin(pe)
            V2 = 0.5 * P.e * A * np.log((1.0 + tpe) / (1.0 - tpe))
            tt = ps - 2.0 * (np.arctan(np.exp(V1 - V2 + Cc)) - C.M_FORTPI)
            pe = np.where(conv, pe, pe + tt)
            conv = conv | (np.abs(tt) < 1e-10)
            if conv.all():
                break
        tt = P.e * np.sin(pe)
        tt = 1.0 - tt * tt
        Re = P.one_es / (tt * np.sqrt(tt))
        tt = np.tan(ps)
        t2 = tt * tt
        s = kRg * kRg
        d = Re * P.k0 * kRg
        I7 = tt / (2.0 * d)
        I8 = tt * (5.0 + 3.0 * t2) / (24.0 * d * s)
        d = np.cos(ps) * kRg * A
        I9 = 1.0 / d
        d = d * s
        I10 = (1.0 + 2.0 * t2) / (6.0 * d)
        I11 = (5.0 + t2 * (28.0 + 24.0 * t2)) / (120.0 * d * s)
        x2 = x * x
        phi = pe + x2 * (-I7 + I8 * x2)
        lam = x * (I9 + x2 * (-I10 + x2 * I11))
        return lam, phi, z_, t_

    P.fwd, P.inv = fwd, inv
    P.left = UNITS_RADIANS
    P.right = UNITS_CLASSIC
    return P
