"""Batch 8: geos, goode/igh-style composites, calcofi.

References (src/projections/): geos.cpp, goode.cpp, calcofi.cpp.
"""

from __future__ import annotations

import math

import numpy as np

from proj_4_spark.kernels import common as C
from proj_4_spark.kernels.base import PJ, ProjError, UNITS_CLASSIC, UNITS_RADIANS

_EPS10 = 1e-10


def setup_geos(P: PJ) -> PJ:
    """geos.cpp (geostationary satellite view)."""
    h = P.param_f("h")
    sweep = P.params.get("sweep")
    if sweep is None:
        flip = False
    elif sweep in ("x", "y"):
        flip = sweep == "x"
    else:
        raise ProjError("invalid_sweep_axis")
    radius_g_1 = h / P.a
    if radius_g_1 <= 0 or radius_g_1 > 1e10:
        raise ProjError("invalid_h")
    radius_g = 1.0 + radius_g_1
    Cq = radius_g * radius_g - 1.0
    if P.es != 0.0:
        radius_p = math.sqrt(P.one_es)
        radius_p2 = P.one_es
        radius_p_inv2 = P.rone_es
    else:
        radius_p = radius_p2 = radius_p_inv2 = 1.0
    ell = P.es != 0.0

    def fwd(lam, phi, z, t, _P):
        if ell:
            phi = np.arctan(radius_p2 * np.tan(phi))
            r = radius_p / np.hypot(radius_p * np.cos(phi), np.sin(phi))
        else:
            r = 1.0
        Vx = r * np.cos(lam) * np.cos(phi)
        Vy = r * np.sin(lam) * np.cos(phi)
        Vz = r * np.sin(phi)
        bad = ((radius_g - Vx) * Vx - Vy * Vy - Vz * Vz * radius_p_inv2) < 0.0
        tmp = radius_g - Vx
        if flip:
            x = radius_g_1 * np.arctan(Vy / np.hypot(Vz, tmp))
            y = radius_g_1 * np.arctan(Vz / tmp)
        else:
            x = radius_g_1 * np.arctan(Vy / tmp)
            y = radius_g_1 * np.arctan(Vz / np.hypot(Vy, tmp))
        if ell:
            x = np.where(bad, np.nan, x)
            y = np.where(bad, np.nan, y)
        return x, y, z, t

    def inv(x, y, z, t, _P):
        Vx = -1.0
        if flip:
            Vz = np.tan(y / radius_g_1)
            Vy = np.tan(x / radius_g_1) * (np.hypot(1.0, Vz) if ell else np.sqrt(1.0 + Vz * Vz))
        else:
            Vy = np.tan(x / radius_g_1)
            Vz = np.tan(y / radius_g_1) * (np.hypot(1.0, Vy) if ell else np.sqrt(1.0 + Vy * Vy))
        if ell:
            aa = Vz / radius_p
            aa = Vy * Vy + aa * aa + Vx * Vx
        else:
            aa = Vy * Vy + Vz * Vz + Vx * Vx
        bb = 2 * radius_g * Vx
        det = bb * bb - 4 * aa * Cq
        bad = det < 0.0
        k = (-bb - np.sqrt(np.maximum(det, 0.0))) / (2.0 * aa)
        Vx2 = radius_g + k * Vx
        Vy2 = Vy * k
        Vz2 = Vz * k
        lam = np.arctan2(Vy2, Vx2)
        phi = np.arctan(Vz2 * np.cos(lam) / Vx2)
        if ell:
            phi = np.arctan(radius_p_inv2 * np.tan(phi))
        return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi), z, t

    P.fwd, P.inv = fwd, inv
    P.left = UNITS_RADIANS
    P.right = UNITS_CLASSIC
    return P


def setup_goode(P: PJ) -> PJ:
    """goode.cpp: sinusoidal below |phi| <= 0.7109..., Mollweide above
    with a y correction."""
    from proj_4_spark.kernels.pseudocyl import (
        gn_sinu_s_forward,
        gn_sinu_s_inverse,
        moll_s_forward,
        moll_s_inverse,
        _moll_setup,
        _sinu_sph_setup,
    )

    Y_COR = 0.05280
    PHI_LIM = 0.71093078197902358062

    # build the two sub-kernels with their own opaque stores
    sinu_pj = PJ("sinu", {}, P.ell)
    sinu_pj.opaque["n"] = 1.0
    sinu_pj.opaque["m"] = 0.0
    _sinu_sph_setup(sinu_pj)
    moll_pj = PJ("moll", {}, P.ell)
    _moll_setup(moll_pj, C.M_HALFPI)

    def fwd(lam, phi, z, t, _P):
        low = np.abs(phi) <= PHI_LIM
        sx, sy, _, _ = gn_sinu_s_forward(lam, phi, z, t, sinu_pj)
        mx, my, _, _ = moll_s_forward(lam, phi, z, t, moll_pj)
        my = my - np.where(phi >= 0.0, Y_COR, -Y_COR)
        return np.where(low, sx, mx), np.where(low, sy, my), z, t

    def inv(x, y, z, t, _P):
        low = np.abs(y) <= PHI_LIM
        slam, sphi, _, _ = gn_sinu_s_inverse(x, y, z, t, sinu_pj)
        ym = y + np.where(y >= 0.0, Y_COR, -Y_COR)
        mlam, mphi, _, _ = moll_s_inverse(x, ym, z, t, moll_pj)
        return np.where(low, slam, mlam), np.where(low, sphi, mphi), z, t

    P.es = 0.0
    P.fwd, P.inv = fwd, inv
    P.left = UNITS_RADIANS
    P.right = UNITS_CLASSIC
    return P


def setup_calcofi(P: PJ) -> PJ:
    """calcofi.cpp (CalCOFI line/station grid)."""
    DEG_TO_LINE = 5
    DEG_TO_STATION = 15
    LINE_TO_RAD = 0.0034906585039886592
    STATION_TO_RAD = 0.0011635528346628863
    PT_O_LINE = 80
    PT_O_STATION = 60
    PT_O_LAMBDA = -2.1144663887911301
    PT_O_PHI = 0.59602993955606354
    ROT = 0.52359877559829882
    ell = P.es != 0.0

    def fwd(lam, phi, z, t, _P):
        bad = np.abs(np.abs(phi) - C.M_HALFPI) <= _EPS10
        if ell:
            y = -np.log(C.tsfn(phi, np.sin(phi), P.e))
            oy = -math.log(float(C.tsfn(np.float64(PT_O_PHI),
                                        np.float64(math.sin(PT_O_PHI)), P.e)))
        else:
            y = np.log(np.tan(C.M_FORTPI + 0.5 * phi))
            oy = math.log(math.tan(C.M_FORTPI + 0.5 * PT_O_PHI))
        l1 = (y - oy) * math.tan(ROT)
        l2 = -lam - l1 + PT_O_LAMBDA
        ry = l2 * math.cos(ROT) * math.sin(ROT) + y
        if ell:
            ry = C.phi2(np.exp(-ry), P.e)
        else:
            ry = C.M_HALFPI - 2.0 * np.arctan(np.exp(-ry))
        x = PT_O_LINE - C.RAD_TO_DEG * (ry - PT_O_PHI) * DEG_TO_LINE / math.cos(ROT)
        y = PT_O_STATION + C.RAD_TO_DEG * (ry - phi) * DEG_TO_STATION / math.sin(ROT)
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y), z, t

    def inv(x, y, z, t, _P):
        ry = PT_O_PHI - LINE_TO_RAD * (x - PT_O_LINE) * math.cos(ROT)
        phi = ry - STATION_TO_RAD * (y - PT_O_STATION) * math.sin(ROT)
        if ell:
            oym = -math.log(float(C.tsfn(np.float64(PT_O_PHI),
                                         np.float64(math.sin(PT_O_PHI)), P.e)))
            rym = -np.log(C.tsfn(ry, np.sin(ry), P.e))
            xym = -np.log(C.tsfn(phi, np.sin(phi), P.e))
        else:
            oym = math.log(math.tan(C.M_FORTPI + 0.5 * PT_O_PHI))
            rym = np.log(np.tan(C.M_FORTPI + 0.5 * ry))
            xym = np.log(np.tan(C.M_FORTPI + 0.5 * phi))
        l1 = (xym - oym) * math.tan(ROT)
        l2 = (rym - xym) / (math.cos(ROT) * math.sin(ROT))
        lam = PT_O_LAMBDA - (l1 + l2)
        return lam, phi, z, t

    # CalCOFI stomps lam0/a/ra/x0/y0 and sets +over so the line/station
    # numbers pass through the CLASSIC finalize unscaled
    # (calcofi.cpp:146-153 "user +lon_0/+x_0 are ignored")
    P.lam0 = 0.0
    P.ra = 1.0
    P.a = 1.0
    P.x0 = 0.0
    P.y0 = 0.0
    P.over = True
    P.fwd, P.inv = fwd, inv
    P.left = UNITS_RADIANS
    P.right = UNITS_CLASSIC
    return P
