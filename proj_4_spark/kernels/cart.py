"""Geodetic <-> geocentric cartesian conversion.

Reference: src/conversions/cart.cpp — forward 132-147 (N(phi) 110-116),
closed-form inverse 150-205 (Bowring-flavored with pole handling).
"""

from __future__ import annotations

import numpy as np

from proj_4_spark.kernels import common as C
from proj_4_spark.kernels.base import PJ, UNITS_CARTESIAN, UNITS_RADIANS


def _normal_radius_of_curvature(a: float, es: float, sinphi):
    """cart.cpp:110-116."""
    if es == 0:
        return np.full_like(sinphi, a)
    return a / np.sqrt(1 - es * sinphi * sinphi)


def _geocentric_radius(a: float, b: float, cosphi, sinphi):
    """cart.cpp:119-128."""
    return np.hypot(a * a * cosphi, b * b * sinphi) / np.hypot(
        a * cosphi, b * sinphi
    )


def cart_fwd3d(lam, phi, z, t, P: PJ):
    """Geodetic -> cartesian; cart.cpp:132-147."""
    cosphi = np.cos(phi)
    sinphi = np.sin(phi)
    N = _normal_radius_of_curvature(P.a, P.es, sinphi)
    x = (N + z) * cosphi * np.cos(lam)
    y = (N + z) * cosphi * np.sin(lam)
    zz = (N * (1 - P.es) + z) * sinphi
    return x, y, zz, t


def cart_inv3d(x, y, z, t, P: PJ):
    """Cartesian -> geodetic; cart.cpp:150-205."""
    p = np.hypot(x, y)

    y_theta = z * P.a
    x_theta = p * P.b
    norm = np.hypot(y_theta, x_theta)
    c = np.where(norm == 0, 1.0, x_theta / np.where(norm == 0, 1.0, norm))
    s = np.where(norm == 0, 0.0, y_theta / np.where(norm == 0, 1.0, norm))

    y_phi = z + P.e2s * P.b * s * s * s
    x_phi = p - P.es * P.a * c * c * c
    norm_phi = np.hypot(y_phi, x_phi)
    cosphi = np.where(norm_phi == 0, 1.0, x_phi / np.where(norm_phi == 0, 1.0, norm_phi))
    sinphi = np.where(norm_phi == 0, 0.0, y_phi / np.where(norm_phi == 0, 1.0, norm_phi))

    near_origin = x_phi <= 0
    with np.errstate(divide="ignore", invalid="ignore"):
        phi = np.arctan(y_phi / x_phi)
    phi = np.where(near_origin, np.where(z >= 0, C.M_HALFPI, -C.M_HALFPI), phi)
    cosphi = np.where(near_origin, 0.0, cosphi)
    sinphi = np.where(near_origin, np.where(z >= 0, 1.0, -1.0), sinphi)

    lam = np.arctan2(y, x)

    polar = cosphi < 1e-6
    r = _geocentric_radius(P.a, P.b, cosphi, sinphi)
    z_polar = np.abs(z) - r
    N = _normal_radius_of_curvature(P.a, P.es, sinphi)
    with np.errstate(divide="ignore", invalid="ignore"):
        z_normal = p / cosphi - N
    zz = np.where(polar, z_polar, z_normal)
    return lam, phi, zz, t


def cart_fwd(lam, phi, z, t, P: PJ):
    """2D entry: z forced to 0 on the ellipsoid surface; cart.cpp:210-217."""
    x, y, _, t = cart_fwd3d(lam, phi, np.zeros_like(lam), t, P)
    return x, y, z, t


def cart_inv(x, y, z, t, P: PJ):
    """cart.cpp:220-227."""
    lam, phi, _, t = cart_inv3d(x, y, np.zeros_like(x), t, P)
    return lam, phi, z, t


def setup_cart(P: PJ) -> PJ:
    """cart.cpp:232-240."""
    P.fwd3d = cart_fwd3d
    P.inv3d = cart_inv3d
    P.fwd = cart_fwd
    P.inv = cart_inv
    P.left = UNITS_RADIANS
    P.right = UNITS_CARTESIAN
    return P


def setup_geocent(P: PJ) -> PJ:
    """Tag-only geocentric pseudo-projection; src/conversions/geocent.cpp:35-64.

    The actual conversion happens via the P->cart helper sub-op invoked by
    fwd_finalize/inv_prepare (src/fwd.cpp:112-114, src/inv.cpp:65-67); the
    helper runs with prepare/finalize skipped (skip_prep_fin,
    src/4D_api.cpp:597-607).
    """

    def identity(a, b, c, d, _P):
        return a, b, c, d

    P.fwd = identity
    P.inv = identity
    P.is_geocent = True
    P.x0 = 0.0
    P.y0 = 0.0
    P.left = UNITS_RADIANS
    P.right = UNITS_CARTESIAN

    from proj_4_spark.engine.plan import Operation

    cart_pj = PJ("cart", {}, P.ell)
    setup_cart(cart_pj)
    cart_pj.skip_fwd_prepare = True
    cart_pj.skip_fwd_finalize = True
    cart_pj.skip_inv_prepare = True
    cart_pj.skip_inv_finalize = True
    P.cart = Operation(cart_pj)
    return P


def setup_noop(P: PJ) -> PJ:
    """Identity; src/conversions/noop.cpp:5-19."""

    def identity4(a, b, c, d, _P):
        return a, b, c, d

    P.fwd4d = identity4
    P.inv4d = identity4
    P.left = "whatever"
    P.right = "whatever"
    P.skip_fwd_prepare = True
    P.skip_fwd_finalize = True
    P.skip_inv_prepare = True
    P.skip_inv_finalize = True
    return P


def setup_geoc(P: PJ) -> PJ:
    """Geodetic <-> geocentric latitude tag op; src/conversions/geoc.cpp:36-58.

    Implemented through the generic geocentric-latitude conversion used by
    prepare/finalize (pj_geocentric_latitude, src/4D_api.cpp:97-135).
    """
    from proj_4_spark.kernels.latlong import geocentric_latitude

    def fwd4d(lam, phi, z, t, P_):
        return lam, geocentric_latitude(P_, "fwd", phi), z, t

    def inv4d(lam, phi, z, t, P_):
        return lam, geocentric_latitude(P_, "inv", phi), z, t

    P.fwd4d = fwd4d
    P.inv4d = inv4d
    P.left = UNITS_RADIANS
    P.right = UNITS_RADIANS
    return P


def setup_set(P: PJ) -> PJ:
    """Set coordinate components; src/conversions/set.cpp:22-75.
    fwd == inv: any of v_1..v_4 present overwrites that component."""
    vals = [(i, float(P.params[f"v_{i}"]))
            for i in (1, 2, 3, 4) if P.has(f"v_{i}")]

    def set4(a, b, c, d, _P):
        out = [np.asarray(a).copy(), np.asarray(b).copy(),
               np.asarray(c).copy(), np.asarray(d).copy()]
        for i, v in vals:
            out[i - 1] = np.full_like(out[i - 1], v)
        return tuple(out)

    P.fwd4d = set4
    P.inv4d = set4
    P.left = "whatever"
    P.right = "whatever"
    P.skip_fwd_prepare = True
    P.skip_fwd_finalize = True
    P.skip_inv_prepare = True
    P.skip_inv_finalize = True
    return P
