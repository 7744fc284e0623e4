"""Transverse Mercator — Poder-Engsager ("exact") and Evenden-Snyder
("approx") algorithms, plus UTM.

Reference: src/projections/tmerc.cpp — exact fwd 334-415, exact inv 419-489,
setup_exact 491-570, Clenshaw helpers gatg/clenS/clens 267-331, approx
76-228, auto switch 574-591, UTM setup 727-763.

Kernels are straight NumPy transliterations preserving the C operation
order; the Clenshaw recurrences loop over the 6 series coefficients with
whole columns inside (SURVEY.md §2.6).
"""

from __future__ import annotations

import math

import numpy as np

from proj_4_spark.kernels import common as C
from proj_4_spark.kernels.base import PJ, ProjError, UNITS_CLASSIC, UNITS_RADIANS

PROJ_ETMERC_ORDER = 6


def _gatg_scalar(p, B, cos_2B, sin_2B):
    """Scalar gatg for setup-time constants; src/projections/tmerc.cpp:267-279."""
    h, h2 = 0.0, 0.0
    two_cos_2B = 2 * cos_2B
    h1 = p[-1]
    for k in range(len(p) - 2, -1, -1):
        h = -h2 + two_cos_2B * h1 + p[k]
        h2 = h1
        h1 = h
    return B + h * sin_2B


def _gatg(p, B, cos_2B, sin_2B):
    """Vectorized gatg (Clenshaw over trig series); tmerc.cpp:267-279."""
    h = np.zeros_like(B)
    h2 = np.zeros_like(B)
    two_cos_2B = 2 * cos_2B
    h1 = np.full_like(B, p[-1])
    for k in range(len(p) - 2, -1, -1):
        h = -h2 + two_cos_2B * h1 + p[k]
        h2 = h1
        h1 = h
    return B + h * sin_2B


def _clenS(a, sin_arg_r, cos_arg_r, sinh_arg_i, cosh_arg_i):
    """Vectorized complex Clenshaw summation; tmerc.cpp:283-311.

    Returns (R, I).
    """
    r = 2 * cos_arg_r * cosh_arg_i
    i = -2 * sin_arg_r * sinh_arg_i
    hi1 = np.zeros_like(r)
    hr1 = np.zeros_like(r)
    hi = np.zeros_like(r)
    hr = np.full_like(r, a[-1])
    for k in range(len(a) - 2, -1, -1):
        hr2 = hr1
        hi2 = hi1
        hr1 = hr
        hi1 = hi
        hr = -hr2 + r * hr1 - i * hi1 + a[k]
        hi = -hi2 + i * hr1 + r * hi1
    r = sin_arg_r * cosh_arg_i
    i = cos_arg_r * sinh_arg_i
    R = r * hr - i * hi
    I = r * hi + i * hr
    return R, I


def _clens_scalar(a, arg_r):
    """Scalar real Clenshaw summation; tmerc.cpp:315-331."""
    cos_arg_r = math.cos(arg_r)
    r = 2 * cos_arg_r
    hr1 = 0.0
    hr = a[-1]
    for k in range(len(a) - 2, -1, -1):
        hr2 = hr1
        hr1 = hr
        hr = -hr2 + r * hr1 + a[k]
    return math.sin(arg_r) * hr


def _setup_exact(P: PJ) -> None:
    """Series coefficients; src/projections/tmerc.cpp:491-570."""
    assert P.es > 0
    n = P.n
    np_ = n

    cgb = [0.0] * 6
    cbg = [0.0] * 6
    utg = [0.0] * 6
    gtu = [0.0] * 6

    cgb[0] = n * (2 + n * (-2 / 3.0 + n * (-2 + n * (116 / 45.0 + n * (26 / 45.0 +
             n * (-2854 / 675.0))))))
    cbg[0] = n * (-2 + n * (2 / 3.0 + n * (4 / 3.0 + n * (-82 / 45.0 + n * (32 / 45.0 +
             n * (4642 / 4725.0))))))
    np_ *= n
    cgb[1] = np_ * (7 / 3.0 + n * (-8 / 5.0 + n * (-227 / 45.0 + n * (2704 / 315.0 +
             n * (2323 / 945.0)))))
    cbg[1] = np_ * (5 / 3.0 + n * (-16 / 15.0 + n * (-13 / 9.0 + n * (904 / 315.0 +
             n * (-1522 / 945.0)))))
    np_ *= n
    cgb[2] = np_ * (56 / 15.0 + n * (-136 / 35.0 + n * (-1262 / 105.0 +
             n * (73814 / 2835.0))))
    cbg[2] = np_ * (-26 / 15.0 + n * (34 / 21.0 + n * (8 / 5.0 +
             n * (-12686 / 2835.0))))
    np_ *= n
    cgb[3] = np_ * (4279 / 630.0 + n * (-332 / 35.0 + n * (-399572 / 14175.0)))
    cbg[3] = np_ * (1237 / 630.0 + n * (-12 / 5.0 + n * (-24832 / 14175.0)))
    np_ *= n
    cgb[4] = np_ * (4174 / 315.0 + n * (-144838 / 6237.0))
    cbg[4] = np_ * (-734 / 315.0 + n * (109598 / 31185.0))
    np_ *= n
    cgb[5] = np_ * (601676 / 22275.0)
    cbg[5] = np_ * (444337 / 155925.0)

    np2 = n * n
    Qn = P.k0 / (1 + n) * (1 + np2 * (1 / 4.0 + np2 * (1 / 64.0 + np2 / 256.0)))

    utg[0] = n * (-0.5 + n * (2 / 3.0 + n * (-37 / 96.0 + n * (1 / 360.0 +
             n * (81 / 512.0 + n * (-96199 / 604800.0))))))
    gtu[0] = n * (0.5 + n * (-2 / 3.0 + n * (5 / 16.0 + n * (41 / 180.0 +
             n * (-127 / 288.0 + n * (7891 / 37800.0))))))
    utg[1] = np2 * (-1 / 48.0 + n * (-1 / 15.0 + n * (437 / 1440.0 + n * (-46 / 105.0 +
             n * (1118711 / 3870720.0)))))
    gtu[1] = np2 * (13 / 48.0 + n * (-3 / 5.0 + n * (557 / 1440.0 + n * (281 / 630.0 +
             n * (-1983433 / 1935360.0)))))
    np3 = np2 * n
    utg[2] = np3 * (-17 / 480.0 + n * (37 / 840.0 + n * (209 / 4480.0 +
             n * (-5569 / 90720.0))))
    gtu[2] = np3 * (61 / 240.0 + n * (-103 / 140.0 + n * (15061 / 26880.0 +
             n * (167603 / 181440.0))))
    np4 = np3 * n
    utg[3] = np4 * (-4397 / 161280.0 + n * (11 / 504.0 + n * (830251 / 7257600.0)))
    gtu[3] = np4 * (49561 / 161280.0 + n * (-179 / 168.0 + n * (6601661 / 7257600.0)))
    np5 = np4 * n
    utg[4] = np5 * (-4583 / 161280.0 + n * (108847 / 3991680.0))
    gtu[4] = np5 * (34729 / 80640.0 + n * (-3418889 / 1995840.0))
    np6 = np5 * n
    utg[5] = np6 * (-20648693 / 638668800.0)
    gtu[5] = np6 * (212378941 / 319334400.0)

    Z = _gatg_scalar(cbg, P.phi0, math.cos(2 * P.phi0), math.sin(2 * P.phi0))
    Zb = -Qn * (Z + _clens_scalar(gtu, 2 * Z))

    P.opaque["exact"] = {
        "cgb": cgb, "cbg": cbg, "utg": utg, "gtu": gtu, "Qn": Qn, "Zb": Zb,
    }


_CE_LIMIT = 2.623395162778  # |Ce| bound (~150 deg), tmerc.cpp:409,427


def exact_e_fwd(lam, phi, z, t, P: PJ):
    """src/projections/tmerc.cpp:334-415."""
    Q = P.opaque["exact"]
    Cn = _gatg(Q["cbg"], phi, np.cos(2 * phi), np.sin(2 * phi))
    sin_Cn = np.sin(Cn)
    cos_Cn = np.cos(Cn)
    sin_Ce = np.sin(lam)
    cos_Ce = np.cos(lam)

    cos_Cn_cos_Ce = cos_Cn * cos_Ce
    Cn = np.arctan2(sin_Cn, cos_Cn_cos_Ce)

    inv_denom_tan_Ce = 1.0 / np.hypot(sin_Cn, cos_Cn_cos_Ce)
    tan_Ce = sin_Ce * cos_Cn * inv_denom_tan_Ce

    Ce = np.arcsinh(tan_Ce)

    two_inv_denom_tan_Ce = 2 * inv_denom_tan_Ce
    two_inv_denom_tan_Ce_square = two_inv_denom_tan_Ce * inv_denom_tan_Ce
    tmp_r = cos_Cn_cos_Ce * two_inv_denom_tan_Ce_square
    sin_arg_r = sin_Cn * tmp_r
    cos_arg_r = cos_Cn_cos_Ce * tmp_r - 1

    sinh_arg_i = tan_Ce * two_inv_denom_tan_Ce
    cosh_arg_i = two_inv_denom_tan_Ce_square - 1

    dCn, dCe = _clenS(Q["gtu"], sin_arg_r, cos_arg_r, sinh_arg_i, cosh_arg_i)
    Cn = Cn + dCn
    Ce = Ce + dCe

    ok = np.abs(Ce) <= _CE_LIMIT
    y = np.where(ok, Q["Qn"] * Cn + Q["Zb"], np.nan)
    x = np.where(ok, Q["Qn"] * Ce, np.nan)
    return x, y, z, t


def exact_e_inv(x, y, z, t, P: PJ):
    """src/projections/tmerc.cpp:419-489."""
    Q = P.opaque["exact"]
    Cn = (y - Q["Zb"]) / Q["Qn"]
    Ce = x / Q["Qn"]

    ok = np.abs(Ce) <= _CE_LIMIT

    sin_arg_r = np.sin(2 * Cn)
    cos_arg_r = np.cos(2 * Cn)
    with np.errstate(over="ignore", invalid="ignore"):
        exp_2_Ce = np.exp(2 * np.where(ok, Ce, 0.0))
    half_inv_exp_2_Ce = 0.5 / exp_2_Ce
    sinh_arg_i = 0.5 * exp_2_Ce - half_inv_exp_2_Ce
    cosh_arg_i = 0.5 * exp_2_Ce + half_inv_exp_2_Ce

    dCn, dCe = _clenS(Q["utg"], sin_arg_r, cos_arg_r, sinh_arg_i, cosh_arg_i)
    Cn = Cn + dCn
    Ce = Ce + dCe

    sin_Cn = np.sin(Cn)
    cos_Cn = np.cos(Cn)

    sinhCe = np.sinh(Ce)
    Ce = np.arctan2(sinhCe, cos_Cn)
    modulus_Ce = np.hypot(sinhCe, cos_Cn)
    Cn = np.arctan2(sin_Cn, modulus_Ce)

    tmp = 2 * modulus_Ce / (sinhCe * sinhCe + 1)
    sin_2_Cn = sin_Cn * tmp
    cos_2_Cn = tmp * modulus_Ce - 1.0

    phi = _gatg(Q["cgb"], Cn, cos_2_Cn, sin_2_Cn)
    lam = Ce
    phi = np.where(ok, phi, np.nan)
    lam = np.where(ok, lam, np.nan)
    return lam, phi, z, t


# --- Evenden-Snyder "approx" kernels, tmerc.cpp:55-214 ----------------------
_EPS10 = 1.0e-10
_FC1 = 1.0
_FC2 = 0.5
_FC3 = 0.16666666666666666666
_FC4 = 0.08333333333333333333
_FC5 = 0.05
_FC6 = 0.03333333333333333333
_FC7 = 0.02380952380952380952
_FC8 = 0.01785714285714285714


def _setup_approx(P: PJ) -> None:
    """src/projections/tmerc.cpp:228-243."""
    Q: dict = {}
    if P.es != 0.0:
        Q["en"] = C.enfn(P.es)
        Q["ml0"] = C.mlfn(
            np.float64(P.phi0), np.sin(np.float64(P.phi0)),
            np.cos(np.float64(P.phi0)), Q["en"]
        )
        Q["esp"] = P.es / (1.0 - P.es)
    else:
        Q["esp"] = P.k0
        Q["ml0"] = 0.5 * Q["esp"]
    P.opaque["approx"] = Q


def approx_e_fwd(lam, phi, z, t, P: PJ):
    """Ellipsoidal approx forward; src/projections/tmerc.cpp:76-116.

    Fails for |lam| > 90 deg from the central meridian (tmerc.cpp:89-94).
    """
    Q = P.opaque["approx"]
    bad = (lam < -C.M_HALFPI) | (lam > C.M_HALFPI)
    sinphi = np.sin(phi)
    cosphi = np.cos(phi)
    tphi = np.where(np.abs(cosphi) > 1e-10, sinphi / cosphi, 0.0)
    tsq = tphi * tphi
    al = cosphi * lam
    als = al * al
    al = al / np.sqrt(1.0 - P.es * sinphi * sinphi)
    nn = Q["esp"] * cosphi * cosphi
    x = P.k0 * al * (_FC1 +
        _FC3 * als * (1.0 - tsq + nn +
        _FC5 * als * (5.0 + tsq * (tsq - 18.0) + nn * (14.0 - 58.0 * tsq)
        + _FC7 * als * (61.0 + tsq * (tsq * (179.0 - tsq) - 479.0))
        )))
    y = P.k0 * (C.mlfn(phi, sinphi, cosphi, Q["en"]) - Q["ml0"] +
        sinphi * al * lam * _FC2 * (1.0 +
        _FC4 * als * (5.0 - tsq + nn * (9.0 + 4.0 * nn) +
        _FC6 * als * (61.0 + tsq * (tsq - 58.0) + nn * (270.0 - 330 * tsq)
        + _FC8 * als * (1385.0 + tsq * (tsq * (543.0 - tsq) - 3111.0))
        ))))
    x = np.where(bad, np.nan, x)
    y = np.where(bad, np.nan, y)
    return x, y, z, t


def approx_e_inv(x, y, z, t, P: PJ):
    """Ellipsoidal approx inverse; src/projections/tmerc.cpp:163-193."""
    Q = P.opaque["approx"]
    phi_ = C.inv_mlfn(Q["ml0"] + y / P.k0, P.es, Q["en"])
    at_pole = np.abs(phi_) >= C.M_HALFPI
    sinphi = np.sin(phi_)
    cosphi = np.cos(phi_)
    tphi = np.where(np.abs(cosphi) > 1e-10, sinphi / cosphi, 0.0)
    nn = Q["esp"] * cosphi * cosphi
    con = 1.0 - P.es * sinphi * sinphi
    dd = x * np.sqrt(con) / P.k0
    con = con * tphi
    tsq = tphi * tphi
    ds = dd * dd
    phi = phi_ - (con * ds / (1.0 - P.es)) * _FC2 * (1.0 -
        ds * _FC4 * (5.0 + tsq * (3.0 - 9.0 * nn) + nn * (1.0 - 4 * nn) -
        ds * _FC6 * (61.0 + tsq * (90.0 - 252.0 * nn + 45.0 * tsq) + 46.0 * nn
        - ds * _FC8 * (1385.0 + tsq * (3633.0 + tsq * (4095.0 + 1575.0 * tsq)))
        )))
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = dd * (_FC1 -
            ds * _FC3 * (1.0 + 2.0 * tsq + nn -
            ds * _FC5 * (5.0 + tsq * (28.0 + 24.0 * tsq + 8.0 * nn) + 6.0 * nn
            - ds * _FC7 * (61.0 + tsq * (662.0 + tsq * (1320.0 + 720.0 * tsq)))
            ))) / cosphi
    phi = np.where(at_pole, np.where(y < 0.0, -C.M_HALFPI, C.M_HALFPI), phi)
    lam = np.where(at_pole, 0.0, lam)
    return lam, phi, z, t


def approx_s_fwd(lam, phi, z, t, P: PJ):
    """Spherical approx forward; src/projections/tmerc.cpp:118-161."""
    Q = P.opaque["approx"]
    bad = (lam < -C.M_HALFPI) | (lam > C.M_HALFPI)
    cosphi = np.cos(phi)
    b = cosphi * np.sin(lam)
    bad = bad | (np.abs(np.abs(b) - 1.0) <= _EPS10)
    with np.errstate(divide="ignore", invalid="ignore"):
        x = Q["ml0"] * np.log((1.0 + b) / (1.0 - b))
        yy = cosphi * np.cos(lam) / np.sqrt(1.0 - b * b)
    ayy = np.abs(yy)
    bad = bad | ((ayy >= 1.0) & ((ayy - 1.0) > _EPS10))
    y = np.where(
        ayy >= 1.0, 0.0, np.arccos(np.clip(yy, -1.0, 1.0))
    )
    y = np.where(phi < 0.0, -y, y)
    y = Q["esp"] * (y - P.phi0)
    x = np.where(bad, np.nan, x)
    y = np.where(bad, np.nan, y)
    return x, y, z, t


def approx_s_inv(x, y, z, t, P: PJ):
    """Spherical approx inverse; src/projections/tmerc.cpp:195-214.

    exp underflow to 0 is an invalid_x_or_y error (tmerc.cpp:200-204).
    """
    Q = P.opaque["approx"]
    with np.errstate(over="ignore", under="ignore"):
        h = np.exp(x / Q["esp"])
    bad = h == 0
    h_safe = np.where(bad, 1.0, h)
    g = 0.5 * (h_safe - 1.0 / h_safe)
    h2 = np.cos(P.phi0 + y / Q["esp"])
    phi = np.arcsin(np.sqrt((1.0 - h2 * h2) / (1.0 + g * g)))
    # hemisphere fix when false northing is used (tmerc.cpp:210)
    phi = np.where((y < 0.0) & (-phi + P.phi0 < 0.0), -phi, phi)
    lam = np.where((g != 0.0) | (h2 != 0.0), np.arctan2(g, h2), 0.0)
    phi = np.where(bad, np.nan, phi)
    lam = np.where(bad, np.nan, lam)
    return lam, phi, z, t


def auto_e_fwd(lam, phi, z, t, P: PJ):
    """+algo=auto forward split at |lam|>3 deg; tmerc.cpp:574-579."""
    use_exact = np.abs(lam) > 3 * C.DEG_TO_RAD
    xe, ye, _, _ = exact_e_fwd(lam, phi, z, t, P)
    xa, ya, _, _ = approx_e_fwd(lam, phi, z, t, P)
    return np.where(use_exact, xe, xa), np.where(use_exact, ye, ya), z, t


def auto_e_inv(x, y, z, t, P: PJ):
    """+algo=auto inverse parabola frontier; tmerc.cpp:581-591."""
    use_exact = np.abs(x) > 0.053 - 0.022 * y * y
    le, pe, _, _ = exact_e_inv(x, y, z, t, P)
    la, pa, _, _ = approx_e_inv(x, y, z, t, P)
    return np.where(use_exact, le, la), np.where(use_exact, pe, pa), z, t


def _get_algo(P: PJ) -> str:
    """+approx / +algo= parsing; tmerc.cpp:647-696.

    Default algo is ctx->defaultTmercAlgo = poder_engsager
    (data/proj.ini "tmerc_default_algo"); AUTO falls back to
    PODER_ENGSAGER when es > 0.1, phi0 != 0 or |k0 - 1| > 0.01
    (tmerc.cpp:686-693).
    """
    if P.param_b("approx"):
        return "evenden_snyder"
    algo = P.params.get("algo")
    if algo in (None, ""):
        algo = "poder_engsager"
    if algo not in ("auto", "evenden_snyder", "poder_engsager"):
        raise ProjError("invalid_arg", f"unknown algo {algo!r}")
    if algo == "auto" and (P.es > 0.1 or P.phi0 != 0 or abs(P.k0 - 1) > 0.01):
        algo = "poder_engsager"
    return algo


def _install(P: PJ, algo: str) -> None:
    """tmerc setup dispatch; src/projections/tmerc.cpp:593-644."""
    if P.es == 0:
        algo = "evenden_snyder"
    if algo == "evenden_snyder":
        _setup_approx(P)
        if P.es == 0:
            P.fwd, P.inv = approx_s_fwd, approx_s_inv
        else:
            P.fwd, P.inv = approx_e_fwd, approx_e_inv
    elif algo == "poder_engsager":
        _setup_exact(P)
        P.fwd, P.inv = exact_e_fwd, exact_e_inv
    elif algo == "auto":
        _setup_approx(P)
        _setup_exact(P)
        P.fwd, P.inv = auto_e_fwd, auto_e_inv
    else:
        raise ProjError("invalid_arg", algo)
    P.left = UNITS_RADIANS
    P.right = UNITS_CLASSIC


def setup_tmerc(P: PJ) -> PJ:
    _install(P, _get_algo(P))
    return P


def setup_etmerc(P: PJ) -> PJ:
    """src/projections/tmerc.cpp:716-723."""
    if P.es == 0.0:
        raise ProjError("ellipsoid_use_required")
    _install(P, "evenden_snyder" if P.param_b("approx") else "poder_engsager")
    return P


def setup_utm(P: PJ) -> PJ:
    """src/projections/tmerc.cpp:727-763."""
    if P.es == 0.0:
        raise ProjError("ellipsoid_use_required")
    if P.lam0 < -1000.0 or P.lam0 > 1000.0:
        raise ProjError("invalid_utm_zone")

    P.y0 = 10000000.0 if P.param_b("south") else 0.0
    P.x0 = 500000.0
    if P.has("zone"):
        zone = P.param_i("zone")
        if 0 < zone <= 60:
            zone -= 1
        else:
            raise ProjError("invalid_utm_zone")
    else:
        zone = int(round(math.floor((float(C.adjlon(np.float64(P.lam0))) + C.M_PI) * 30.0 / C.M_PI)))
        zone = min(max(zone, 0), 59)
    P.lam0 = (zone + 0.5) * C.M_PI / 30.0 - C.M_PI
    P.k0 = 0.9996
    P.phi0 = 0.0
    _install(P, _get_algo(P))
    return P
