"""Batch 11: rouss (Roussilhe Stereographic), col_urban (Colombia Urban).

References: src/projections/rouss.cpp, src/projections/col_urban.cpp,
src/proj_mdist.cpp (exact meridional-distance series).
"""

from __future__ import annotations

import math

import numpy as np

from proj_4_spark.kernels import common as C
from proj_4_spark.kernels.base import PJ, UNITS_CLASSIC, UNITS_RADIANS


def mdist_ini(es: float):
    """proj_mdist_ini (src/proj_mdist.cpp:17-59): exact meridional
    distance series coefficients."""
    MAX_ITER = 20
    ens = es
    numf = twon1 = denfi = 1.0
    denf = 1.0
    twon = 4.0
    E = [1.0] + [0.0] * (MAX_ITER - 1)
    Es = 1.0
    El = 1.0
    i = 1
    for i in range(1, MAX_ITER):
        numf *= twon1 * twon1
        den = twon * denf * denf * twon1
        T = numf / den
        E[i] = T * ens
        Es -= E[i]
        ens *= es
        twon *= 4.0
        denfi += 1.0
        denf *= denfi
        twon1 += 2.0
        if Es == El:
            break
        El = Es
    nb = i - 1
    b = [0.0] * i
    E_total = Es
    b[0] = 1.0 - Es
    Es = 1.0 - Es  # matches C: b->b[0] = Es = 1. - Es
    numf = denf = 1.0
    numfi = 2.0
    denfi = 3.0
    for j in range(1, i):
        Es -= E[j]
        numf *= numfi
        denf *= denfi
        b[j] = Es * numf / denf
        numfi += 2.0
        denfi += 2.0
    return {"nb": nb, "es": es, "E": E_total, "b": b}


def mdist(phi, sphi, cphi, en):
    """proj_mdist (proj_mdist.cpp:61-74)."""
    b = en["b"]
    sc = sphi * cphi
    sphi2 = sphi * sphi
    D = phi * en["E"] - en["es"] * sc / np.sqrt(1.0 - en["es"] * sphi2)
    i = en["nb"]
    s = np.full_like(np.asarray(phi, dtype=np.float64), b[i])
    while i:
        i -= 1
        s = b[i] + sphi2 * s
    return D + sc * s


def inv_mdist(dist, en):
    """proj_inv_mdist (proj_mdist.cpp:76-95): Newton, 20 iters @1e-14,
    per-lane freeze."""
    dist = np.asarray(dist, dtype=np.float64)
    k = 1.0 / (1.0 - en["es"])
    phi = dist.copy()
    active = np.isfinite(phi)
    for _ in range(20):
        if not active.any():
            break
        s = np.sin(phi[active])
        t = 1.0 - en["es"] * s * s
        step = (mdist(phi[active], s, np.cos(phi[active]), en) - dist[active]) * (t * np.sqrt(t)) * k
        phi[active] = phi[active] - step
        done = np.abs(step) < 1e-14
        nxt = active.copy()
        nxt[active] = ~done
        active = nxt
    return phi


def setup_rouss(P: PJ) -> PJ:
    """rouss.cpp (series coefficients transliterated)."""
    en = mdist_ini(P.es)
    es2 = math.sin(P.phi0)
    s0 = float(mdist(np.float64(P.phi0), np.float64(es2), np.float64(math.cos(P.phi0)), en))
    es2 = P.es * es2 * es2
    t = 1.0 - es2
    N0 = 1.0 / math.sqrt(t)
    R_R0_2 = t * t / P.one_es
    R_R0_4 = R_R0_2 * R_R0_2
    t = math.tan(P.phi0)
    t2 = t * t
    A1 = C1 = R_R0_2 / 4.0
    A2 = C2 = R_R0_2 * (2 * t2 - 1.0 - 2.0 * es2) / 12.0
    A3 = R_R0_2 * t * (1.0 + 4.0 * t2) / (12.0 * N0)
    A4 = R_R0_4 / 24.0
    A5 = R_R0_4 * (-1.0 + t2 * (11.0 + 12.0 * t2)) / 24.0
    A6 = R_R0_4 * (-2.0 + t2 * (11.0 - 2.0 * t2)) / 240.0
    B1 = t / (2.0 * N0)
    B2 = R_R0_2 / 12.0
    B3 = R_R0_2 * (1.0 + 2.0 * t2 - 2.0 * es2) / 4.0
    B4 = R_R0_2 * t * (2.0 - t2) / (24.0 * N0)
    B5 = R_R0_2 * t * (5.0 + 4.0 * t2) / (8.0 * N0)
    B6 = R_R0_4 * (-2.0 + t2 * (-5.0 + 6.0 * t2)) / 48.0
    B7 = R_R0_4 * (5.0 + t2 * (19.0 + 12.0 * t2)) / 24.0
    B8 = R_R0_4 / 120.0
    C3 = R_R0_2 * t * (1.0 + t2) / (3.0 * N0)
    C4 = R_R0_4 * (-3.0 + t2 * (34.0 + 22.0 * t2)) / 240.0
    C5 = R_R0_4 * (4.0 + t2 * (13.0 + 12.0 * t2)) / 24.0
    C6 = R_R0_4 / 16.0
    C7 = R_R0_4 * t * (11.0 + t2 * (33.0 + t2 * 16.0)) / (48.0 * N0)
    C8 = R_R0_4 * t * (1.0 + t2 * 4.0) / (36.0 * N0)
    D1 = t / (2.0 * N0)
    D2 = R_R0_2 / 12.0
    D3 = R_R0_2 * (2 * t2 + 1.0 - 2.0 * es2) / 4.0
    D4 = R_R0_2 * t * (1.0 + t2) / (8.0 * N0)
    D5 = R_R0_2 * t * (1.0 + t2 * 2.0) / (4.0 * N0)
    D6 = R_R0_4 * (1.0 + t2 * (6.0 + t2 * 6.0)) / 16.0
    D7 = R_R0_4 * t2 * (3.0 + t2 * 4.0) / 8.0
    D8 = R_R0_4 / 80.0
    D9 = R_R0_4 * t * (-21.0 + t2 * (178.0 - t2 * 26.0)) / 720.0
    D10 = R_R0_4 * t * (29.0 + t2 * (86.0 + t2 * 48.0)) / (96.0 * N0)
    D11 = R_R0_4 * t * (37.0 + t2 * 44.0) / (96.0 * N0)

    def fwd(lam, phi, z, t_, _P):
        cp = np.cos(phi)
        sp = np.sin(phi)
        s = mdist(phi, sp, cp, en) - s0
        s2 = s * s
        al = lam * cp / np.sqrt(1.0 - P.es * sp * sp)
        al2 = al * al
        x = P.k0 * al * (1.0 + s2 * (A1 + s2 * A4)
                         - al2 * (A2 + s * A3 + s2 * A5 + al2 * A6))
        y = P.k0 * (al2 * (B1 + al2 * B4)
                    + s * (1.0 + al2 * (B3 - al2 * B6)
                           + s2 * (B2 + s2 * B8)
                           + s * al2 * (B5 + s * B7)))
        return x, y, z, t_

    def inv(x, y, z, t_, _P):
        xx = x / P.k0
        yy = y / P.k0
        x2 = xx * xx
        y2 = yy * yy
        al = xx * (1.0 - C1 * y2 + x2 * (C2 + C3 * yy - C4 * x2 + C5 * y2 - C7 * x2 * yy)
                   + y2 * (C6 * y2 - C8 * x2 * yy))
        s = s0 + yy * (1.0 + y2 * (-D2 + D8 * y2)) + x2 * (
            -D1 + yy * (-D3 + yy * (-D5 + yy * (-D7 + yy * D11)))
            + x2 * (D4 + yy * (D6 + yy * D10) - x2 * D9))
        phi = inv_mdist(s, en)
        sp = np.sin(phi)
        lam = al * np.sqrt(1.0 - P.es * sp * sp) / np.cos(phi)
        return lam, phi, z, t_

    P.fwd, P.inv = fwd, inv
    P.left = UNITS_RADIANS
    P.right = UNITS_CLASSIC
    return P


def setup_col_urban(P: PJ) -> PJ:
    """col_urban.cpp (IOGP GN7-2 Colombia Urban)."""
    h0 = P.param_f("h_0") / P.a
    sinphi0 = math.sin(P.phi0)
    nu0 = 1.0 / math.sqrt(1 - P.es * sinphi0 * sinphi0)
    A = 1 + h0 / nu0
    rho0 = (1 - P.es) / math.pow(1 - P.es * sinphi0 * sinphi0, 1.5)
    B = math.tan(P.phi0) / (2 * rho0 * nu0)
    Cc = 1 + h0
    D = rho0 * (1 + h0 / (1 - P.es))

    def fwd(lam, phi, z, t, _P):
        cosphi = np.cos(phi)
        sinphi = np.sin(phi)
        nu = 1.0 / np.sqrt(1 - P.es * sinphi * sinphi)
        lnc = lam * nu * cosphi
        x = A * lnc
        sinphi_m = np.sin(0.5 * (phi + P.phi0))
        rho_m = (1 - P.es) / np.power(1 - P.es * sinphi_m * sinphi_m, 1.5)
        G = 1 + h0 / rho_m
        y = G * rho0 * ((phi - P.phi0) + B * lnc * lnc)
        return x, y, z, t

    def inv(x, y, z, t, _P):
        phi = P.phi0 + y / D - B * (x / Cc) * (x / Cc)
        sinphi = np.sin(phi)
        nu = 1.0 / np.sqrt(1 - P.es * sinphi * sinphi)
        lam = x / (Cc * nu * np.cos(phi))
        return lam, phi, z, t

    P.fwd, P.inv = fwd, inv
    P.left = UNITS_RADIANS
    P.right = UNITS_CLASSIC
    return P
