"""molodensky (standard + abridged) and ob_tran (general oblique).

References: src/transformations/molodensky.cpp, src/projections/ob_tran.cpp.
"""

from __future__ import annotations

import math

import numpy as np

from proj_4_spark.kernels import common as C
from proj_4_spark.kernels.base import PJ, ProjError, UNITS_RADIANS


def _RN(a, es, phi):
    """molodensky.cpp RN (prime vertical radius)."""
    s = np.sin(phi)
    if es == 0:
        return np.full_like(np.asarray(phi, dtype=np.float64), a)
    return a / np.sqrt(1 - es * s * s)


def _RM(a, es, phi):
    """molodensky.cpp RM (meridian radius), incl. the scalar special
    cases vectorized."""
    s = np.sin(phi)
    if es == 0:
        return np.full_like(np.asarray(phi, dtype=np.float64), a)
    out = (a * (1 - es)) / np.power(1 - es * s * s, 1.5)
    out = np.where(phi == 0, a * (1 - es), out)
    out = np.where(np.abs(phi) == C.M_HALFPI, a / math.sqrt(1 - es), out)
    return out


def setup_molodensky(P: PJ) -> PJ:
    """molodensky.cpp:170-214."""
    required = ("dx", "dy", "dz", "da", "df")
    n_given = sum(1 for k in required if P.has(k))
    if n_given == 0:
        raise ProjError("no_args")
    if n_given != 5:
        raise ProjError("missing_args")
    dx = P.param_f("dx")
    dy = P.param_f("dy")
    dz = P.param_f("dz")
    da = P.param_f("da")
    df = P.param_f("df")
    abridged = P.param_b("abridged")
    a, es, f = P.a, P.es, P.f

    def _deltas(lam, phi, z):
        slam = np.sin(lam)
        clam = np.cos(lam)
        sphi = np.sin(phi)
        cphi = np.cos(phi)
        if abridged:
            # calc_abridged_params, molodensky.cpp:94-120
            adffda = a * df + f * da
            dphi = (-dx * sphi * clam - dy * sphi * slam + dz * cphi
                    + adffda * np.sin(2 * phi))
            dphi = dphi / _RM(a, es, phi)
            dlam = -dx * slam + dy * clam
            dlam_denom = _RN(a, es, phi) * cphi
            bad = dlam_denom == 0.0
            dlam = dlam / np.where(bad, 1.0, dlam_denom)
            dh = (dx * cphi * clam + dy * cphi * slam + dz * sphi - da
                  + adffda * sphi * sphi)
        else:
            # calc_standard_params, molodensky.cpp:59-92
            rho = _RM(a, es, phi)
            nu = _RN(a, es, phi)
            dphi = (-dx * sphi * clam) - (dy * sphi * slam) + (dz * cphi) \
                + ((nu * es * sphi * cphi * da) / a) \
                + (sphi * cphi * (rho / (1 - f) + nu * (1 - f)) * df)
            dphi_denom = rho + z
            bad = dphi_denom == 0.0
            dphi = dphi / np.where(bad, 1.0, dphi_denom)
            dlam_denom = (nu + z) * cphi
            bad = bad | (dlam_denom == 0.0)
            dlam = (-dx * slam + dy * clam) / np.where(dlam_denom == 0, 1.0, dlam_denom)
            dh = (dx * cphi * clam + dy * cphi * slam + dz * sphi
                  - (a / nu) * da + nu * (1 - f) * sphi * sphi * df)
        dlam = np.where(bad, np.nan, dlam)
        dphi = np.where(bad, np.nan, dphi)
        dh = np.where(bad, np.nan, dh)
        return dlam, dphi, dh

    def fwd4d(lam, phi, z, t, _P):
        dlam, dphi, dh = _deltas(lam, phi, z)
        return lam + dlam, phi + dphi, z + dh, t

    def inv4d(lam, phi, z, t, _P):
        dlam, dphi, dh = _deltas(lam, phi, z)
        return lam - dlam, phi - dphi, z - dh, t

    P.fwd4d = fwd4d
    P.inv4d = inv4d
    P.left = UNITS_RADIANS
    P.right = UNITS_RADIANS
    return P


def setup_ob_tran(P: PJ) -> PJ:
    """ob_tran.cpp: rotate through a new pole, then apply the linked
    projection.  The linked projection is constructed from the o_proj=
    parameter with the remaining args (o_*-stripped) passed through."""
    from proj_4_spark.engine.plan import Operation, _make_pj

    TOL = 1e-10
    if not P.has("o_proj"):
        raise ProjError("no_rotation_proj")
    o_proj = str(P.params["o_proj"])
    if o_proj == "ob_tran":
        raise ProjError("failed_to_find_proj")
    link_params = {
        k: v for k, v in P.params.items()
        if k not in ("proj", "o_proj") and not k.startswith("o_")
    }
    link_params["proj"] = o_proj
    link_pj = _make_pj(link_params)
    link = Operation(link_pj)
    # the link runs bare kernels; ob_tran's own prepare/finalize handles
    # offsets (ob_tran calls link->fwd directly)
    link_pj.skip_fwd_prepare = True
    link_pj.skip_fwd_finalize = True
    link_pj.skip_inv_prepare = True
    link_pj.skip_inv_finalize = True

    if P.has("o_alpha"):
        lamc = P.param_r("o_lon_c")
        phic = P.param_r("o_lat_c")
        alpha = P.param_r("o_alpha")
        if abs(abs(phic) - C.M_HALFPI) <= TOL:
            raise ProjError("lat_0_or_alpha_eq_90")
        lamp = lamc + math.atan2(-math.cos(alpha), -math.sin(alpha) * math.sin(phic))
        phip = math.asin(max(-1, min(1, math.cos(phic) * math.sin(alpha))))
    elif P.has("o_lat_p"):
        lamp = P.param_r("o_lon_p")
        phip = P.param_r("o_lat_p")
    else:
        lam1 = P.param_r("o_lon_1")
        phi1 = P.param_r("o_lat_1")
        lam2 = P.param_r("o_lon_2")
        phi2 = P.param_r("o_lat_2")
        con = abs(phi1)
        if (abs(phi1 - phi2) <= TOL or con <= TOL
                or abs(con - C.M_HALFPI) <= TOL
                or abs(abs(phi2) - C.M_HALFPI) <= TOL):
            raise ProjError("lat_1_or_2_zero_or_90")
        lamp = math.atan2(
            math.cos(phi1) * math.sin(phi2) * math.cos(lam1)
            - math.sin(phi1) * math.cos(phi2) * math.cos(lam2),
            math.sin(phi1) * math.cos(phi2) * math.sin(lam2)
            - math.cos(phi1) * math.sin(phi2) * math.sin(lam1),
        )
        phip = math.atan(-math.cos(lamp - lam1) / math.tan(phi1))

    oblique = abs(phip) > TOL
    cphip = math.cos(phip)
    sphip = math.sin(phip)

    def _link_fwd(lam, phi, z, t):
        return link_pj.fwd(lam, phi, z, t, link_pj)

    def _link_inv(x, y, z, t):
        return link_pj.inv(x, y, z, t, link_pj)

    if oblique:
        def fwd(lam, phi, z, t, _P):
            coslam = np.cos(lam)
            sinphi = np.sin(phi)
            cosphi = np.cos(phi)
            nlam = C.adjlon(C.aatan2(
                cosphi * np.sin(lam), sphip * cosphi * coslam + cphip * sinphi
            ) + lamp)
            nphi = C.aasin(sphip * sinphi - cphip * cosphi * coslam)
            return _link_fwd(nlam, nphi, z, t)

        def inv(x, y, z, t, _P):
            lam, phi, z, t = _link_inv(x, y, z, t)
            lam = lam - lamp
            coslam = np.cos(lam)
            sinphi = np.sin(phi)
            cosphi = np.cos(phi)
            nphi = C.aasin(sphip * sinphi + cphip * cosphi * coslam)
            nlam = C.aatan2(cosphi * np.sin(lam),
                            sphip * cosphi * coslam - cphip * sinphi)
            nphi = np.where(np.isnan(lam), np.nan, nphi)
            return nlam, nphi, z, t
    else:
        def fwd(lam, phi, z, t, _P):
            cosphi = np.cos(phi)
            coslam = np.cos(lam)
            nlam = C.adjlon(C.aatan2(cosphi * np.sin(lam), np.sin(phi)) + lamp)
            nphi = C.aasin(-cosphi * coslam)
            return _link_fwd(nlam, nphi, z, t)

        def inv(x, y, z, t, _P):
            lam, phi, z, t = _link_inv(x, y, z, t)
            cosphi = np.cos(phi)
            tt = lam - lamp
            nlam = C.aatan2(cosphi * np.sin(tt), -np.sin(phi))
            nphi = C.aasin(cosphi * np.cos(tt))
            nlam = np.where(np.isnan(lam), np.nan, nlam)
            return nlam, nphi, z, t

    P.fwd = fwd if link_pj.fwd is not None else None
    P.inv = inv if link_pj.inv is not None else None
    P.left = UNITS_RADIANS
    P.right = link_pj.right
    if link_pj.right == UNITS_RADIANS:
        P.right = "whatever"  # ob_tran.cpp:188-189
    return P
