"""SCH — Spherical Cross-track Height (JPL radar-mapping sensor frame).

Reference: src/projections/sch.cpp — fwd3d 85-113, inv3d 59-83,
setup 127-185, param parsing 189-223.  (Hensley 2000, Buckley 2000 —
published JPL/UT-Austin references cited in the C header.)

Geometry: an osculating sphere of radius `rcurv` (the along-heading
radius of curvature at the peg point, plus h_0) replaces the ellipsoid;
s/c coordinates are arc lengths on that sphere in a frame rotated so the
peg's heading is the s-axis.
"""

from __future__ import annotations

import math
from types import SimpleNamespace

import numpy as np

from proj_4_spark.kernels.base import PJ, ProjError, UNITS_CLASSIC, UNITS_RADIANS
from proj_4_spark.kernels.cart import cart_fwd3d, cart_inv3d


def sch_fwd3d(lam, phi, z, t, P: PJ):
    """src/projections/sch.cpp:85-113."""
    Q = P.opaque
    # geodetic -> geocentric on the real ellipsoid
    x, y, zz, _ = cart_fwd3d(lam, phi, z, t, P)
    x = x - Q["xyzoff"][0]
    y = y - Q["xyzoff"][1]
    zz = zz - Q["xyzoff"][2]
    M = Q["transMat"]
    # transpose rotation (sch.cpp:97-101)
    rx = M[0] * x + M[3] * y + M[6] * zz
    ry = M[1] * x + M[4] * y + M[7] * zz
    rz = M[2] * x + M[5] * y + M[8] * zz
    # local sphere cartesian -> local lat/lon/height
    llam, lphi, lz, _ = cart_inv3d(rx, ry, rz, t, Q["sph"])
    # arc lengths in units of a (finalize multiplies by P.a)
    sx = llam * (Q["rcurv"] / P.a)
    sy = lphi * (Q["rcurv"] / P.a)
    return sx, sy, lz, t


def sch_inv3d(x, y, z, t, P: PJ):
    """src/projections/sch.cpp:59-83."""
    Q = P.opaque
    llam = x * (P.a / Q["rcurv"])
    lphi = y * (P.a / Q["rcurv"])
    # local lat/lon/height -> local sphere cartesian
    sx, sy, sz, _ = cart_fwd3d(llam, lphi, z, t, Q["sph"])
    M = Q["transMat"]
    rx = M[0] * sx + M[1] * sy + M[2] * sz
    ry = M[3] * sx + M[4] * sy + M[5] * sz
    rz = M[6] * sx + M[7] * sy + M[8] * sz
    rx = rx + Q["xyzoff"][0]
    ry = ry + Q["xyzoff"][1]
    rz = rz + Q["xyzoff"][2]
    return cart_inv3d(rx, ry, rz, t, P)


def setup_sch(P: PJ) -> PJ:
    """src/projections/sch.cpp:127-223."""
    for key in ("plat_0", "plon_0", "phdg_0"):
        if not P.has(key):
            raise ProjError("missing_args", f"sch requires +{key}")
    plat = P.param_r("plat_0")
    plon = P.param_r("plon_0")
    phdg = P.param_r("phdg_0")
    h0 = P.param_f("h_0", 0.0)

    clt, slt = math.cos(plat), math.sin(plat)
    clo, slo = math.cos(plon), math.sin(plon)
    temp = math.sqrt(1.0 - P.es * slt * slt)
    reast = P.a / temp
    rnorth = P.a * (1.0 - P.es) / temp**3
    chdg, shdg = math.cos(phdg), math.sin(phdg)
    rcurv = h0 + (reast * rnorth) / (
        reast * chdg * chdg + rnorth * shdg * shdg
    )

    transMat = [
        clt * clo, -shdg * slo - slt * clo * chdg, slo * chdg - slt * clo * shdg,
        clt * slo, clo * shdg - slt * slo * chdg, -clo * chdg - slt * slo * shdg,
        slt, clt * chdg, clt * shdg,
    ]
    # peg point on the ellipsoid at height h0 (sch.cpp:172-179)
    px, py, pz, _ = cart_fwd3d(
        np.float64(plon), np.float64(plat), np.float64(h0), np.float64(0.0), P
    )
    xyzoff = [
        float(px) - rcurv * clt * clo,
        float(py) - rcurv * clt * slo,
        float(pz) - rcurv * slt,
    ]
    P.opaque.update(
        rcurv=rcurv,
        transMat=transMat,
        xyzoff=xyzoff,
        # osculating sphere "ellipsoid" for the cart kernels
        sph=SimpleNamespace(a=rcurv, b=rcurv, es=0.0, e2s=0.0),
    )
    P.fwd3d = sch_fwd3d
    P.inv3d = sch_inv3d
    P.left = UNITS_RADIANS
    P.right = UNITS_CLASSIC
    return P
