"""Horner polynomial evaluation (real 2D + complex), the reference's
parameterized "runtime UDF" transform (SURVEY.md §2.7).

Reference: src/transformations/horner.cpp — gen_pol evaluation order
preserved (backwards summation, tiny high-order terms first,
horner.cpp:104-183; complex variant 193-249).
"""

from __future__ import annotations

import numpy as np

from proj_4_spark.kernels.base import PJ, ProjError, UNITS_PROJECTED


def _ncoefs(order: int) -> int:
    return (order + 1) * (order + 2) // 2


def _parse_list(P: PJ, key: str, n: int):
    if not P.has(key):
        return None
    vals = [float(v) for v in str(P.params[key]).split(",")]
    if len(vals) != n:
        raise ProjError("missing_args", f"horner: {key} needs {n} coefs")
    return vals


def _real_eval(tcx, tcy, order, e, n):
    """horner_func core; horner.cpp:160-181.  tcx/tcy are the coefficient
    lists; e/n arrays of offsets."""
    ix = len(tcx)
    iy = len(tcy)
    iy -= 1
    N = np.full_like(n, tcy[iy])
    ix -= 1
    E = np.full_like(e, tcx[ix])
    g = order
    for r in range(g, 0, -1):
        iy -= 1
        u = np.full_like(n, tcy[iy])
        ix -= 1
        v = np.full_like(e, tcx[ix])
        for _c in range(g, r - 1, -1):
            iy -= 1
            u = n * u + tcy[iy]
            ix -= 1
            v = e * v + tcx[ix]
        N = e * N + u
        E = n * E + v
    return E, N


def _complex_eval(c, e, n):
    """complex_horner core; horner.cpp:236-247."""
    i = len(c)
    i -= 1
    E = np.full_like(e, c[i])
    i -= 1
    N = np.full_like(n, c[i])
    while i > 0:
        i -= 1
        w = n * E + e * N + c[i]
        i -= 1
        N = n * N - e * E + c[i]
        E = w
    return E, N


def setup_horner(P: PJ) -> PJ:
    """horner.cpp:300-351."""
    if not P.has("deg"):
        raise ProjError("missing_args", "horner: +deg required")
    degree = P.param_i("deg")
    if degree < 0 or degree > 10000:
        raise ProjError("invalid_arg", "unreasonable degree")
    complex_poly = P.has("fwd_c") or P.has("inv_c")

    fwd_origin = _parse_list(P, "fwd_origin", 2)
    inv_origin = _parse_list(P, "inv_origin", 2)
    if fwd_origin is None or inv_origin is None:
        raise ProjError("missing_args", "horner: origins required")
    rng = _parse_list(P, "range", 1)
    rng = rng[0] if rng else 500000.0

    if complex_poly:
        n = 2 * degree + 2
        fwd_c = _parse_list(P, "fwd_c", n)
        inv_c = _parse_list(P, "inv_c", n)
        if fwd_c is None or inv_c is None:
            raise ProjError("missing_args", "horner: fwd_c/inv_c required")
        uneg = -1.0 if P.has("uneg") else 1.0
        vneg = -1.0 if P.has("vneg") else 1.0

        def fwd4d(x, y, z, t, _P):
            e = (x - fwd_origin[0]) * uneg
            nn = (y - fwd_origin[1]) * vneg
            bad = (np.abs(nn) > rng) | (np.abs(e) > rng)
            E, N = _complex_eval(fwd_c, e, nn)
            return np.where(bad, np.nan, E), np.where(bad, np.nan, N), z, t

        def inv4d(x, y, z, t, _P):
            e = (x - inv_origin[0]) * uneg
            nn = (y - inv_origin[1]) * vneg
            bad = (np.abs(nn) > rng) | (np.abs(e) > rng)
            E, N = _complex_eval(inv_c, e, nn)
            return np.where(bad, np.nan, E), np.where(bad, np.nan, N), z, t
    else:
        n = _ncoefs(degree)
        fwd_u = _parse_list(P, "fwd_u", n)
        fwd_v = _parse_list(P, "fwd_v", n)
        inv_u = _parse_list(P, "inv_u", n)
        inv_v = _parse_list(P, "inv_v", n)
        if None in (fwd_u, fwd_v, inv_u, inv_v):
            raise ProjError("missing_args", "horner: fwd_u/fwd_v/inv_u/inv_v required")

        def fwd4d(x, y, z, t, _P):
            e = x - fwd_origin[0]
            nn = y - fwd_origin[1]
            bad = (np.abs(nn) > rng) | (np.abs(e) > rng)
            E, N = _real_eval(fwd_u, fwd_v, degree, e, nn)
            return np.where(bad, np.nan, E), np.where(bad, np.nan, N), z, t

        def inv4d(x, y, z, t, _P):
            e = x - inv_origin[0]
            nn = y - inv_origin[1]
            bad = (np.abs(nn) > rng) | (np.abs(e) > rng)
            E, N = _real_eval(inv_u, inv_v, degree, e, nn)
            return np.where(bad, np.nan, E), np.where(bad, np.nan, N), z, t

    P.fwd4d = fwd4d
    P.inv4d = inv4d
    P.left = UNITS_PROJECTED
    P.right = UNITS_PROJECTED
    return P
