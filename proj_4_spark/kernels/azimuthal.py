"""Azimuthal projections: stere/ups, laea.

References: src/projections/stere.cpp:44-330, src/projections/laea.cpp.
Mode dispatch (N_POLE/S_POLE/OBLIQ/EQUIT) is plan-time; kernels are
mode-specialized column programs.
"""

from __future__ import annotations

import math

import numpy as np

from proj_4_spark.kernels import common as C
from proj_4_spark.kernels.base import PJ, ProjError, UNITS_CLASSIC, UNITS_RADIANS

_EPS10 = 1.0e-10
_TOL = 1.0e-8
_NITER = 8
_CONV = 1.0e-10


def _ssfn(phit, sinphi, e):
    """stere.cpp:37-41."""
    sinphi = sinphi * e
    return np.tan(0.5 * (C.M_HALFPI + phit)) * np.power(
        (1.0 - sinphi) / (1.0 + sinphi), 0.5 * e
    )


# --- stere ------------------------------------------------------------------

def stere_e_forward(lam, phi, z, t, P: PJ):
    """stere.cpp:44-96."""
    Q = P.opaque
    mode = Q["mode"]
    coslam = np.cos(lam)
    sinlam = np.sin(lam)
    sinphi = np.sin(phi)
    x = np.zeros_like(lam)
    y = np.zeros_like(lam)
    if mode in ("obliq", "equit"):
        X = 2.0 * np.arctan(_ssfn(phi, sinphi, P.e)) - C.M_HALFPI
        sinX = np.sin(X)
        cosX = np.cos(X)
        if mode == "obliq":
            denom = Q["cosX1"] * (1.0 + Q["sinX1"] * sinX + Q["cosX1"] * cosX * coslam)
            bad = denom == 0
            with np.errstate(divide="ignore", invalid="ignore"):
                A = Q["akm1"] / np.where(bad, 1.0, denom)
            y = A * (Q["cosX1"] * sinX - Q["sinX1"] * cosX * coslam)
            x = A * cosX
            x = np.where(bad, np.nan, x)
            y = np.where(bad, np.nan, y)
        else:
            denom = 1.0 + cosX * coslam
            bad = denom == 0.0
            with np.errstate(divide="ignore", invalid="ignore"):
                A = Q["akm1"] / np.where(bad, 1.0, denom)
            y = np.where(bad, np.nan, A * sinX)
            x = np.where(bad, np.nan, A * cosX)
    else:
        if mode == "s_pole":
            phi = -phi
            coslam = -coslam
            sinphi = -sinphi
        x = Q["akm1"] * C.tsfn(phi, sinphi, P.e)
        y = -x * coslam
    x = x * sinlam
    return x, y, z, t


def stere_s_forward(lam, phi, z, t, P: PJ):
    """stere.cpp:99-140."""
    Q = P.opaque
    mode = Q["mode"]
    sinphi = np.sin(phi)
    cosphi = np.cos(phi)
    coslam = np.cos(lam)
    sinlam = np.sin(lam)
    if mode in ("equit", "obliq"):
        if mode == "equit":
            y = 1.0 + cosphi * coslam
        else:
            y = 1.0 + Q["sinX1"] * sinphi + Q["cosX1"] * cosphi * coslam
        bad = y <= _EPS10
        with np.errstate(divide="ignore", invalid="ignore"):
            y = Q["akm1"] / np.where(bad, 1.0, y)
        x = y * cosphi * sinlam
        if mode == "equit":
            y = y * sinphi
        else:
            y = y * (Q["cosX1"] * sinphi - Q["sinX1"] * cosphi * coslam)
        x = np.where(bad, np.nan, x)
        y = np.where(bad, np.nan, y)
    else:
        if mode == "n_pole":
            coslam = -coslam
            phi = -phi
        bad = np.abs(phi - C.M_HALFPI) < _TOL
        y = Q["akm1"] * np.tan(C.M_FORTPI + 0.5 * phi)
        x = sinlam * y
        y = y * coslam
        x = np.where(bad, np.nan, x)
        y = np.where(bad, np.nan, y)
    return x, y, z, t


def stere_e_inverse(x, y, z, t, P: PJ):
    """stere.cpp:143-190 (8-iteration conformal-lat inversion @1e-10)."""
    Q = P.opaque
    mode = Q["mode"]
    rho = np.hypot(x, y)
    if mode in ("obliq", "equit"):
        tp = 2.0 * np.arctan2(rho * Q["cosX1"], Q["akm1"])
        cosphi = np.cos(tp)
        sinphi = np.sin(tp)
        with np.errstate(invalid="ignore", divide="ignore"):
            phi_l = np.where(
                rho == 0.0,
                np.arcsin(np.clip(cosphi * Q["sinX1"], -1, 1)),
                np.arcsin(np.clip(cosphi * Q["sinX1"] + (y * sinphi * Q["cosX1"] / np.where(rho == 0, 1.0, rho)), -1, 1)),
            )
        tp = np.tan(0.5 * (C.M_HALFPI + phi_l))
        x = x * sinphi
        y = rho * Q["cosX1"] * cosphi - y * Q["sinX1"] * sinphi
        halfpi = C.M_HALFPI
        halfe = 0.5 * P.e
    else:
        yy = -y if mode == "n_pole" else y
        tp = -rho / Q["akm1"]
        phi_l = C.M_HALFPI - 2.0 * np.arctan(tp)
        halfpi = -C.M_HALFPI
        halfe = -0.5 * P.e
        y = yy

    phi = np.full_like(phi_l, np.nan)
    active = np.isfinite(phi_l)
    cur = phi_l.copy()
    for _ in range(_NITER):
        if not active.any():
            break
        sinphi = P.e * np.sin(cur[active])
        new_phi = 2.0 * np.arctan(
            tp[active] * np.power((1.0 + sinphi) / (1.0 - sinphi), halfe)
        ) - halfpi
        done = np.abs(cur[active] - new_phi) < _CONV
        phi_vals = phi[active]
        phi_vals[done] = new_phi[done]
        phi[active] = phi_vals
        cur[active] = new_phi
        nxt = active.copy()
        nxt[active] = ~done
        active = nxt
    if mode == "s_pole":
        phi = -phi
    lam = np.where((x == 0.0) & (y == 0.0), 0.0, np.arctan2(x, y))
    lam = np.where(np.isnan(phi), np.nan, lam)
    return lam, phi, z, t


def stere_s_inverse(x, y, z, t, P: PJ):
    """stere.cpp:193-234."""
    Q = P.opaque
    mode = Q["mode"]
    rh = np.hypot(x, y)
    c = 2.0 * np.arctan(rh / Q["akm1"])
    sinc = np.sin(c)
    cosc = np.cos(c)
    lam = np.zeros_like(x)
    if mode == "equit":
        with np.errstate(invalid="ignore", divide="ignore"):
            phi = np.where(np.abs(rh) <= _EPS10, 0.0,
                           np.arcsin(np.clip(y * sinc / np.where(rh == 0, 1.0, rh), -1, 1)))
        lam = np.where((cosc != 0.0) | (x != 0.0), np.arctan2(x * sinc, cosc * rh), 0.0)
    elif mode == "obliq":
        with np.errstate(invalid="ignore", divide="ignore"):
            phi = np.where(
                np.abs(rh) <= _EPS10, P.phi0,
                np.arcsin(np.clip(cosc * Q["sinX1"] + y * sinc * Q["cosX1"] / np.where(rh == 0, 1.0, rh), -1, 1)),
            )
        cc = cosc - Q["sinX1"] * np.sin(phi)
        lam = np.where((cc != 0.0) | (x != 0.0), np.arctan2(x * sinc * Q["cosX1"], cc * rh), 0.0)
    else:
        yy = -y if mode == "n_pole" else y
        pole_phi = np.arcsin(np.clip(-cosc if mode == "s_pole" else cosc, -1, 1))
        phi = np.where(np.abs(rh) <= _EPS10, P.phi0, pole_phi)
        lam = np.where((x == 0.0) & (yy == 0.0), 0.0, np.arctan2(x, yy))
    return lam, phi, z, t


def _stere_setup(P: PJ) -> PJ:
    """stere.cpp:237-296."""
    Q = P.opaque
    ta = abs(P.phi0)
    if abs(ta - C.M_HALFPI) < _EPS10:
        Q["mode"] = "s_pole" if P.phi0 < 0 else "n_pole"
    else:
        Q["mode"] = "obliq" if ta > _EPS10 else "equit"
    Q["phits"] = abs(Q["phits"])

    if P.es != 0.0:
        if Q["mode"] in ("n_pole", "s_pole"):
            if abs(Q["phits"] - C.M_HALFPI) < _EPS10:
                Q["akm1"] = 2.0 * P.k0 / math.sqrt(
                    math.pow(1 + P.e, 1 + P.e) * math.pow(1 - P.e, 1 - P.e)
                )
            else:
                tt = math.sin(Q["phits"])
                Q["akm1"] = math.cos(Q["phits"]) / float(
                    C.tsfn(np.float64(Q["phits"]), np.float64(tt), P.e))
                tt *= P.e
                Q["akm1"] /= math.sqrt(1.0 - tt * tt)
        else:
            tt = math.sin(P.phi0)
            X = 2.0 * math.atan(float(_ssfn(np.float64(P.phi0), np.float64(tt), P.e))) - C.M_HALFPI
            tt *= P.e
            Q["akm1"] = 2.0 * P.k0 * math.cos(P.phi0) / math.sqrt(1.0 - tt * tt)
            Q["sinX1"] = math.sin(X)
            Q["cosX1"] = math.cos(X)
        P.fwd, P.inv = stere_e_forward, stere_e_inverse
    else:
        if Q["mode"] == "obliq":
            Q["sinX1"] = math.sin(P.phi0)   # sinph0 alias, stere.cpp:30-31
            Q["cosX1"] = math.cos(P.phi0)
        if Q["mode"] in ("obliq", "equit"):
            Q["akm1"] = 2.0 * P.k0
        else:
            Q["akm1"] = (
                math.cos(Q["phits"]) / math.tan(C.M_FORTPI - 0.5 * Q["phits"])
                if abs(Q["phits"] - C.M_HALFPI) >= _EPS10
                else 2.0 * P.k0
            )
        P.fwd, P.inv = stere_s_forward, stere_s_inverse
    P.left = UNITS_RADIANS
    P.right = UNITS_CLASSIC
    return P


def setup_stere(P: PJ) -> PJ:
    """stere.cpp:299-309."""
    P.opaque["phits"] = P.param_r("lat_ts") if P.has("lat_ts") else C.M_HALFPI
    P.opaque.setdefault("sinX1", 0.0)
    P.opaque.setdefault("cosX1", 0.0)
    return _stere_setup(P)


def setup_ups(P: PJ) -> PJ:
    """stere.cpp:312-330."""
    P.phi0 = -C.M_HALFPI if P.param_b("south") else C.M_HALFPI
    if P.es == 0.0:
        raise ProjError("ellipsoid_use_required")
    P.k0 = 0.994
    P.x0 = 2000000.0
    P.y0 = 2000000.0
    P.opaque["phits"] = C.M_HALFPI
    P.opaque.setdefault("sinX1", 0.0)
    P.opaque.setdefault("cosX1", 0.0)
    P.lam0 = 0.0
    return _stere_setup(P)


# --- laea -------------------------------------------------------------------

def laea_e_forward(lam, phi, z, t, P: PJ):
    """laea.cpp:35-95."""
    Q = P.opaque
    mode = Q["mode"]
    coslam = np.cos(lam)
    sinlam = np.sin(lam)
    sinphi = np.sin(phi)
    q = C.qsfn(sinphi, P.e, P.one_es)
    if mode in ("obliq", "equit"):
        sinb = q / Q["qp"]
        cosb2 = 1.0 - sinb * sinb
        cosb = np.where(cosb2 > 0, np.sqrt(np.maximum(cosb2, 0)), 0.0)
        if mode == "obliq":
            b = 1.0 + Q["sinb1"] * sinb + Q["cosb1"] * cosb * coslam
        else:
            b = 1.0 + cosb * coslam
        bad = np.abs(b) < _EPS10
        with np.errstate(divide="ignore", invalid="ignore"):
            bb = np.sqrt(2.0 / np.where(bad, 1.0, b))
        if mode == "obliq":
            y = Q["ymf"] * bb * (Q["cosb1"] * sinb - Q["sinb1"] * cosb * coslam)
        else:
            y = bb * sinb * Q["ymf"]
        x = Q["xmf"] * bb * cosb * sinlam
        x = np.where(bad, np.nan, x)
        y = np.where(bad, np.nan, y)
    else:
        if mode == "n_pole":
            b = C.M_HALFPI + phi
            qq = Q["qp"] - q
        else:
            b = phi - C.M_HALFPI
            qq = Q["qp"] + q
        bad = np.abs(b) < _EPS10
        small = qq < 1e-15
        bb = np.sqrt(np.maximum(qq, 0))
        x = np.where(small, 0.0, bb * sinlam)
        y = np.where(small, 0.0, coslam * (bb if mode == "s_pole" else -bb))
        x = np.where(bad, np.nan, x)
        y = np.where(bad, np.nan, y)
    return x, y, z, t


def laea_s_forward(lam, phi, z, t, P: PJ):
    """laea.cpp:98-137."""
    Q = P.opaque
    mode = Q["mode"]
    sinphi = np.sin(phi)
    cosphi = np.cos(phi)
    coslam = np.cos(lam)
    if mode in ("equit", "obliq"):
        if mode == "equit":
            y = 1.0 + cosphi * coslam
        else:
            y = 1.0 + Q["sinb1"] * sinphi + Q["cosb1"] * cosphi * coslam
        bad = y <= _EPS10
        with np.errstate(divide="ignore", invalid="ignore"):
            y = np.sqrt(2.0 / np.where(bad, 1.0, y))
        x = y * cosphi * np.sin(lam)
        if mode == "equit":
            y = y * sinphi
        else:
            y = y * (Q["cosb1"] * sinphi - Q["sinb1"] * cosphi * coslam)
        x = np.where(bad, np.nan, x)
        y = np.where(bad, np.nan, y)
    else:
        if mode == "n_pole":
            coslam = -coslam
        bad = np.abs(phi + P.phi0) < _EPS10
        yy = C.M_FORTPI - phi * 0.5
        yy = 2.0 * (np.cos(yy) if mode == "s_pole" else np.sin(yy))
        x = yy * np.sin(lam)
        y = yy * coslam
        x = np.where(bad, np.nan, x)
        y = np.where(bad, np.nan, y)
    return x, y, z, t


def laea_e_inverse(x, y, z, t, P: PJ):
    """laea.cpp:140-186."""
    Q = P.opaque
    mode = Q["mode"]
    if mode in ("equit", "obliq"):
        x = x / Q["dd"]
        y = y * Q["dd"]
        rho = np.hypot(x, y)
        center = rho < _EPS10
        sCe = 2.0 * np.arcsin(np.clip(0.5 * rho / Q["rq"], -1, 1))
        cCe = np.cos(sCe)
        sCe = np.sin(sCe)
        x = x * sCe
        rho_safe = np.where(center, 1.0, rho)
        if mode == "obliq":
            ab = cCe * Q["sinb1"] + y * sCe * Q["cosb1"] / rho_safe
            y = rho * Q["cosb1"] * cCe - y * Q["sinb1"] * sCe
        else:
            ab = y * sCe / rho_safe
            y = rho * cCe
        lam = np.where(center, 0.0, np.arctan2(x, y))
        phi = np.where(center, P.phi0,
                       C.authlat(np.arcsin(np.clip(ab, -1, 1)), Q["apa"]))
        return lam, phi, z, t
    yy = -y if mode == "n_pole" else y
    q = x * x + yy * yy
    center = q == 0.0
    ab = 1.0 - q / Q["qp"]
    if mode == "s_pole":
        ab = -ab
    lam = np.where(center, 0.0, np.arctan2(x, yy))
    phi = np.where(center, P.phi0,
                   C.authlat(np.arcsin(np.clip(ab, -1, 1)), Q["apa"]))
    return lam, phi, z, t


def laea_s_inverse(x, y, z, t, P: PJ):
    """laea.cpp:189-228."""
    Q = P.opaque
    mode = Q["mode"]
    rh = np.hypot(x, y)
    half = rh * 0.5
    bad = half > 1.0
    phi = 2.0 * np.arcsin(np.clip(half, -1, 1))
    if mode in ("obliq", "equit"):
        sinz = np.sin(phi)
        cosz = np.cos(phi)
        rh_safe = np.where(rh == 0, 1.0, rh)
        if mode == "equit":
            phi = np.where(np.abs(rh) <= _EPS10, 0.0,
                           np.arcsin(np.clip(y * sinz / rh_safe, -1, 1)))
            x = x * sinz
            y = cosz * rh
        else:
            phi = np.where(np.abs(rh) <= _EPS10, P.phi0,
                           np.arcsin(np.clip(cosz * Q["sinb1"] + y * sinz * Q["cosb1"] / rh_safe, -1, 1)))
            x = x * sinz * Q["cosb1"]
            y = (cosz - np.sin(phi) * Q["sinb1"]) * rh
        lam = np.where((y == 0.0), 0.0, np.arctan2(x, y))
    elif mode == "n_pole":
        y = -y
        phi = C.M_HALFPI - phi
        lam = np.arctan2(x, y)
    else:
        phi = phi - C.M_HALFPI
        lam = np.arctan2(x, y)
    phi = np.where(bad, np.nan, phi)
    lam = np.where(bad, np.nan, lam)
    return lam, phi, z, t


def setup_laea(P: PJ) -> PJ:
    """laea.cpp:243-300."""
    Q = P.opaque
    t_ = abs(P.phi0)
    if t_ > C.M_HALFPI + _EPS10:
        raise ProjError("lat_larger_than_90")
    if abs(t_ - C.M_HALFPI) < _EPS10:
        Q["mode"] = "s_pole" if P.phi0 < 0 else "n_pole"
    elif abs(t_) < _EPS10:
        Q["mode"] = "equit"
    else:
        Q["mode"] = "obliq"
    if P.es != 0.0:
        Q["qp"] = float(C.qsfn(np.float64(1.0), P.e, P.one_es))
        Q["mmf"] = 0.5 / (1.0 - P.es)
        Q["apa"] = C.authset(P.es)
        Q["sinb1"] = 0.0
        Q["cosb1"] = 0.0
        Q["xmf"] = Q["ymf"] = Q["rq"] = 0.0
        if Q["mode"] in ("n_pole", "s_pole"):
            Q["dd"] = 1.0
        elif Q["mode"] == "equit":
            Q["rq"] = math.sqrt(0.5 * Q["qp"])
            Q["dd"] = 1.0 / Q["rq"]
            Q["xmf"] = 1.0
            Q["ymf"] = 0.5 * Q["qp"]
        else:
            Q["rq"] = math.sqrt(0.5 * Q["qp"])
            sinphi = math.sin(P.phi0)
            Q["sinb1"] = float(C.qsfn(np.float64(sinphi), P.e, P.one_es)) / Q["qp"]
            Q["cosb1"] = math.sqrt(1.0 - Q["sinb1"] * Q["sinb1"])
            Q["dd"] = math.cos(P.phi0) / (
                math.sqrt(1.0 - P.es * sinphi * sinphi) * Q["rq"] * Q["cosb1"]
            )
            Q["xmf"] = Q["rq"]
            Q["ymf"] = Q["rq"] / Q["dd"]
            Q["xmf"] = Q["xmf"] * Q["dd"]
        P.fwd, P.inv = laea_e_forward, laea_e_inverse
    else:
        Q["sinb1"] = math.sin(P.phi0) if Q["mode"] == "obliq" else 0.0
        Q["cosb1"] = math.cos(P.phi0) if Q["mode"] == "obliq" else 0.0
        P.fwd, P.inv = laea_s_forward, laea_s_inverse
    P.left = UNITS_RADIANS
    P.right = UNITS_CLASSIC
    return P
