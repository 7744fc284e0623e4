"""ISEA — Icosahedral Snyder Equal Area.

Reference: src/projections/isea.cpp (public-domain code by Nathan
Wagner) — Snyder forward 317-489 (his 1992 equal-area polyhedral
equations 5-12), coordinate rotation snyder_ctran/isea_ctran 497-577,
plane placement 637-668, hex-grid addressing (ptdd/dddi/hex) 670-877,
PROJ glue 957-1114.

Forward-only (like the reference).  All twenty triangle tests run as
masked lanes; the per-point 120-degree azimuth folding unrolls to two
conditional passes (Az < 2*pi so at most two subtractions).
"""

from __future__ import annotations

import math

import numpy as np

from proj_4_spark.kernels.base import PJ, ProjError, UNITS_CLASSIC, UNITS_RADIANS

DEG36 = 0.62831853071795864768
DEG72 = 1.25663706143591729537
DEG90 = math.pi / 2
DEG108 = 1.88495559215387594306
DEG120 = 2.09439510239319549229
DEG144 = 2.51327412287183459075
DEG180 = math.pi

ISEA_SCALE = 0.8301572857837594396028083
V_LAT = 0.46364760899944494524
E_RAD = 0.91843818702186776133
F_RAD = 0.18871053072122403508
TABLE_G = 0.6615845383
TABLE_H = 0.1909830056
ISEA_STD_LAT = 1.01722196792335072101
ISEA_STD_LON = 0.19634954084936207740
RPRIME = 0.91038328153090290025

_VERTEX = [
    (0.0, DEG90), (DEG180, V_LAT), (-DEG108, V_LAT), (-DEG36, V_LAT),
    (DEG36, V_LAT), (DEG108, V_LAT), (-DEG144, -V_LAT), (-DEG72, -V_LAT),
    (0.0, -V_LAT), (DEG72, -V_LAT), (DEG144, -V_LAT), (0.0, -DEG90),
]
_TRI_V1 = [0, 0, 0, 0, 0, 0, 6, 7, 8, 9, 10, 2, 3, 4, 5, 1, 11, 11, 11, 11, 11]
_CENTERS = [
    (0.0, 0.0),
    (-DEG144, E_RAD), (-DEG72, E_RAD), (0.0, E_RAD), (DEG72, E_RAD),
    (DEG144, E_RAD),
    (-DEG144, F_RAD), (-DEG72, F_RAD), (0.0, F_RAD), (DEG72, F_RAD),
    (DEG144, F_RAD),
    (-DEG108, -F_RAD), (-DEG36, -F_RAD), (DEG36, -F_RAD), (DEG108, -F_RAD),
    (DEG180, -F_RAD),
    (-DEG108, -E_RAD), (-DEG36, -E_RAD), (DEG36, -E_RAD), (DEG108, -E_RAD),
    (DEG180, -E_RAD),
]

# Snyder constants for the icosahedron (isea.cpp:197-200)
_G_DEG, _BIGG_DEG, _THETA_DEG = 37.37736814, 36.0, 30.0


def _az_adjustment(tri: int) -> float:
    """isea.cpp:246-262."""
    vlon, vlat = _VERTEX[_TRI_V1[tri]]
    clon, clat = _CENTERS[tri]
    return math.atan2(
        math.cos(vlat) * math.sin(vlon - clon),
        math.cos(clat) * math.sin(vlat)
        - math.sin(clat) * math.cos(vlat) * math.cos(vlon - clon),
    )


def _triangle_xy(tri: int) -> tuple[float, float]:
    """Plane center of triangle `tri` (isea.cpp:264-295)."""
    t = (tri - 1) % 20
    x = TABLE_G * ((t % 5) - 2) * 2.0
    if t > 9:
        x += TABLE_G
    y = [5.0 * TABLE_H, TABLE_H, -TABLE_H, -5.0 * TABLE_H][t // 5]
    return x * RPRIME, y * RPRIME


def _snyder_forward(lon, lat):
    """isea_snyder_forward vectorized over lanes (isea.cpp:317-489).
    Returns (x, y, tri) with tri=0 for lanes on no triangle (should not
    happen for finite input)."""
    theta = math.radians(_THETA_DEG)
    g = math.radians(_G_DEG)
    G = math.radians(_BIGG_DEG)
    cot_theta = 1.0 / math.tan(theta)
    tan_g = math.tan(g)
    n = len(lon)
    x = np.full(n, np.nan)
    y = np.full(n, np.nan)
    tri_out = np.zeros(n, dtype=np.int64)
    done = np.zeros(n, dtype=bool)
    eps = np.finfo(np.float64).eps

    for i in range(1, 21):
        if done.all():
            break
        clon, clat = _CENTERS[i]
        z = np.arccos(np.clip(
            math.sin(clat) * np.sin(lat)
            + math.cos(clat) * np.cos(lat) * np.cos(lon - clon), -1.0, 1.0))
        cand = ~done & (z <= g + 0.000005)
        if not cand.any():
            continue
        Az = np.arctan2(
            np.cos(lat) * np.sin(lon - clon),
            math.cos(clat) * np.sin(lat)
            - math.sin(clat) * np.cos(lat) * np.cos(lon - clon),
        )
        Az = Az - _az_adjustment(i)
        Az = np.where(Az < 0.0, Az + 2.0 * math.pi, Az)
        # fold into [0, 120deg]: Az < 2*pi so at most two subtractions
        adj = np.zeros(n)
        for _ in range(2):
            over = Az > DEG120 + eps
            Az = np.where(over, Az - DEG120, Az)
            adj = adj + np.where(over, 1.0, 0.0)
        q = np.arctan2(tan_g, np.cos(Az) + np.sin(Az) * cot_theta)
        cand = cand & (z <= q + 0.000005)
        if not cand.any():
            continue
        H = np.arccos(np.clip(
            np.sin(Az) * math.sin(G) * math.cos(g) - np.cos(Az) * math.cos(G),
            -1.0, 1.0))
        Ag = Az + G + H - DEG180
        Azprime = np.arctan2(
            2.0 * Ag, RPRIME * RPRIME * tan_g * tan_g - 2.0 * Ag * cot_theta)
        dprime = RPRIME * tan_g / (np.cos(Azprime) + np.sin(Azprime) * cot_theta)
        f = dprime / (2.0 * RPRIME * np.sin(q / 2.0))
        rho = 2.0 * RPRIME * f * np.sin(z / 2.0)
        Azprime = Azprime + DEG120 * adj
        x = np.where(cand, rho * np.sin(Azprime), x)
        y = np.where(cand, rho * np.cos(Azprime), y)
        tri_out = np.where(cand, i, tri_out)
        done = done | cand
    return x, y, tri_out


def _snyder_ctran(np_lon, np_lat, lon, lat):
    """Spherical coordinate rotation (isea.cpp:505-545, Snyder p.31)."""
    alpha = np_lat
    beta = np_lon
    cos_p = np.cos(lat)
    sin_a = math.sin(alpha)
    sin_phip = sin_a * np.sin(lat) - math.cos(alpha) * cos_p * np.cos(lon - beta)
    lp_b = np.arctan2(
        cos_p * np.sin(lon - beta),
        sin_a * cos_p * np.cos(lon - beta) + math.cos(alpha) * np.sin(lat),
    )
    lambdap = lp_b + beta
    lambdap = np.remainder(lambdap, 2 * math.pi)
    lambdap = np.where(lambdap > math.pi, lambdap - 2 * math.pi, lambdap)
    phip = np.arcsin(np.clip(sin_phip, -1.0, 1.0))
    return lambdap, phip


def _isea_ctran(o_lon, o_lat, lon, lat, lon0):
    """isea.cpp:547-577."""
    plon = o_lon + math.pi
    nlon, nlat = _snyder_ctran(plon, o_lat, lon, lat)
    nlon = nlon - (math.pi - lon0 + plon - math.pi)
    nlon = nlon + math.pi
    nlon = np.remainder(nlon, 2 * math.pi)
    nlon = np.where(nlon > math.pi, nlon - 2 * math.pi, nlon)
    return nlon, nlat


def _rotate(x, y, degrees):
    """isea_rotate (isea.cpp:637-652); degrees may be an array."""
    rad = -np.asarray(degrees, dtype=np.float64) * math.pi / 180.0
    c, s = np.cos(rad), np.sin(rad)
    return x * c + y * s, -x * s + y * c


def _cdiv2(v):
    """C integer division v/2 (truncation toward zero) on int64 arrays."""
    return np.where(v >= 0, v // 2, -((-v) // 2))


def _hexbin2(width: float, x, y):
    """isea.cpp:84-135: snap plane coords to the hex grid; returns
    (i, j) after hex_xy, plus an overflow mask (C throws there)."""
    x = x / math.cos(30 * math.pi / 180.0)
    y = y - x / 2.0
    x = x / width
    y = y / width
    z = -x - y
    rx = np.floor(x + 0.5)
    ry = np.floor(y + 0.5)
    rz = np.floor(z + 0.5)
    overflow = (np.abs(rx + ry) > 2**31 - 1) | (np.abs(rx + ry + rz) > 2**31 - 1)
    rx_s = np.where(overflow, 0.0, rx)
    ry_s = np.where(overflow, 0.0, ry)
    rz_s = np.where(overflow, 0.0, rz)
    ix = rx_s.astype(np.int64)
    iy = ry_s.astype(np.int64)
    iz = rz_s.astype(np.int64)
    s = ix + iy + iz
    abs_dx = np.abs(rx_s - x)
    abs_dy = np.abs(ry_s - y)
    abs_dz = np.abs(rz_s - z)
    fix_x = (s != 0) & (abs_dx >= abs_dy) & (abs_dx >= abs_dz)
    fix_y = (s != 0) & ~fix_x & (abs_dy >= abs_dx) & (abs_dy >= abs_dz)
    fix_z = (s != 0) & ~fix_x & ~fix_y
    ix = np.where(fix_x, ix - s, ix)
    iy = np.where(fix_y, iy - s, iy)
    iz = np.where(fix_z, iz - s, iz)
    # hex_xy (iso -> xy): y = -y - (x+1)/2 (x>=0) else -y - x/2
    hy = np.where(ix >= 0, -iy - _cdiv2(ix + 1), -iy - _cdiv2(ix))
    return ix, hy, overflow


def _hex_iso(hx, hy):
    """hex_iso (isea.cpp:69-81): xy -> iso (x, y, z)."""
    y = np.where(hx >= 0, -hy - _cdiv2(hx + 1), -hy - _cdiv2(hx))
    z = -hx - y
    return hx, y, z


def _ptdd(tri, x, y):
    """isea_ptdd (isea.cpp:670-683): projected tri -> quad 2DD coords."""
    downtri = (((tri - 1) // 5) % 2) == 1
    quad = ((tri - 1) % 5) + ((tri - 1) // 10) * 5 + 1
    x, y = _rotate(x, y, np.where(downtri, 240.0, 60.0))
    x = np.where(downtri, x + 0.5, x)
    y = np.where(downtri, y + 0.86602540378443864672, y)
    return quad, x, y


def _dddi(aperture: int, resolution: int, quad, x, y):
    """isea_dddi (+ap3odd variant), vectorized (isea.cpp:685-817).
    Returns (quad, d, i, overflow)."""
    if aperture == 3 and resolution % 2 != 0:
        sidelength_d = (2.0 ** resolution + 1.0) / 2.0
        hexwidth = math.cos(math.pi / 6.0) / sidelength_d
        maxcoord = int(round(sidelength_d * 2.0))
        hx, hy, overflow = _hexbin2(hexwidth, x, y)
        hx, hy2, hz = _hex_iso(hx, hy)
        d = hx - hz
        i = hx + hy2 + hy2
        north = (quad <= 5) & (d == 0) & (i == maxcoord)
        upper = (quad <= 5) & ~north & (i == maxcoord)
        lowerr = (quad <= 5) & ~north & ~upper & (d == maxcoord)
        south = (quad >= 6) & (i == 0) & (d == maxcoord)
        lower2 = (quad >= 6) & ~south & (d == maxcoord)
        upper2 = (quad >= 6) & ~south & ~lower2 & (i == maxcoord)
        nq = quad.copy()
        nd = d.copy()
        ni = i.copy()
        nq = np.where(north, 0, nq)
        nd = np.where(north, 0, nd)
        ni = np.where(north, 0, ni)
        q_up = np.where(quad + 1 == 6, 1, quad + 1)
        nq = np.where(upper, q_up, nq)
        ni = np.where(upper, maxcoord - d, ni)
        nd = np.where(upper, 0, nd)
        nq = np.where(lowerr, quad + 5, nq)
        nd = np.where(lowerr, 0, nd)
        nq = np.where(south, 11, nq)
        nd = np.where(south, 0, nd)
        ni = np.where(south, 0, ni)
        q_dn = np.where(quad + 1 == 11, 6, quad + 1)
        nq = np.where(lower2, q_dn, nq)
        nd = np.where(lower2, maxcoord - i, nd)
        ni = np.where(lower2, 0, ni)
        nq = np.where(upper2, (quad - 4) % 5, nq)
        ni = np.where(upper2, 0, ni)
        return nq, nd, ni, overflow

    if aperture > 0:
        sidelength_d = aperture ** (resolution / 2.0)
        if abs(sidelength_d) > 2**31 - 1:
            raise ProjError("non_convergent", "isea sidelength overflow")
        sidelength = int(round(sidelength_d))
    else:
        sidelength = resolution
    if sidelength == 0:
        raise ProjError("non_convergent", "isea zero sidelength")
    hexwidth = 1.0 / sidelength
    x, y = _rotate(x, y, -30.0)
    hx, hy, overflow = _hexbin2(hexwidth, x, y)
    hx, hy2, hz = _hex_iso(hx, hy)

    nq = quad.copy()
    nx, ny, nz = hx.copy(), hy2.copy(), hz.copy()
    north = (quad <= 5) & (hx == 0) & (hz == -sidelength)
    up = (quad <= 5) & ~north & (hz == -sidelength)
    right = (quad <= 5) & ~north & ~up & (hx == sidelength)
    south = (quad >= 6) & (hz == 0) & (hx == sidelength)
    dn = (quad >= 6) & ~south & (hx == sidelength)
    left = (quad >= 6) & ~south & ~dn & (hy2 == -sidelength)

    nq = np.where(north, 0, nq)
    nx = np.where(north, 0, nx)
    ny = np.where(north, 0, ny)
    nz = np.where(north, 0, nz)
    q_up = np.where(quad + 1 == 6, 1, quad + 1)
    nq = np.where(up, q_up, nq)
    ny = np.where(up, sidelength - hx, ny)
    nz = np.where(up, hx - sidelength, nz)
    nx = np.where(up, 0, nx)
    nq = np.where(right, quad + 5, nq)
    ny = np.where(right, -hz, ny)
    nx = np.where(right, 0, nx)
    nq = np.where(south, 11, nq)
    nx = np.where(south, 0, nx)
    ny = np.where(south, 0, ny)
    nz = np.where(south, 0, nz)
    q_dn = np.where(quad + 1 == 11, 6, quad + 1)
    nq = np.where(dn, q_dn, nq)
    nx2 = hy2 + sidelength
    nx = np.where(dn, nx2, nx)
    ny = np.where(dn, 0, ny)
    nz = np.where(dn, -nx2, nz)
    nq = np.where(left, quad - 4, nq)
    ny = np.where(left, 0, ny)
    nz = np.where(left, -hx, nz)
    return nq, nx, -nz, overflow


def isea_s_forward(lam, phi, z, t, P: PJ):
    """isea.cpp:970-991 + isea_forward 884-935."""
    Q = P.opaque
    lon, lat = _isea_ctran(Q["o_lon"], Q["o_lat"], lam, phi, Q["o_az"])
    x, y, tri = _snyder_forward(lon, lat)
    radius = Q["radius"]
    x = x * radius
    y = y * radius
    bad = tri == 0
    mode = Q["output"]

    if mode == "plane":
        tri_s = np.maximum(tri, 1)
        downtri = (((tri_s - 1) // 5) % 2) == 1
        rx, ry = _rotate(x, y, 180.0)
        x = np.where(downtri, rx, x)
        y = np.where(downtri, ry, y)
        tcx = np.array([0.0] + [_triangle_xy(i)[0] for i in range(1, 21)])
        tcy = np.array([0.0] + [_triangle_xy(i)[1] for i in range(1, 21)])
        x = x + tcx[tri_s] * radius
        y = y + tcy[tri_s] * radius
        return (np.where(bad, np.nan, x), np.where(bad, np.nan, y), z, t)

    # non-plane modes: normalize to the standard triangle (isea.cpp:900-904)
    x = x / radius * ISEA_SCALE + 0.5
    y = y / radius * ISEA_SCALE + 2.0 * 0.14433756729740644112
    quad, dx, dy = _ptdd(np.maximum(tri, 1), x, y)
    if mode == "dd":
        return (np.where(bad, np.nan, dx), np.where(bad, np.nan, dy), z, t)
    nq, d, i, overflow = _dddi(Q["aperture"], Q["resolution"], quad, dx, dy)
    bad = bad | overflow
    if mode == "di":
        return (np.where(bad, np.nan, d.astype(np.float64)),
                np.where(bad, np.nan, i.astype(np.float64)), z, t)
    # hex (isea.cpp:846-877): x' = d*16 + quad, y' = i
    shift_bad = (d < -(2**31 >> 4)) | (d > (2**31 - 1) >> 4)
    bad = bad | shift_bad
    hxv = d * 16 + nq
    return (np.where(bad, np.nan, hxv.astype(np.float64)),
            np.where(bad, np.nan, i.astype(np.float64)), z, t)


def setup_isea(P: PJ) -> PJ:
    """isea.cpp:1004-1114."""
    Q = P.opaque
    Q.update(
        o_lat=ISEA_STD_LAT, o_lon=ISEA_STD_LON, o_az=0.0,
        aperture=3, resolution=4, radius=1.0, output="plane",
    )
    orient = P.params.get("orient")
    if orient is not None:
        if orient == "isea":
            pass
        elif orient == "pole":
            Q["o_lat"] = math.pi / 2.0
            Q["o_lon"] = 0.0
        else:
            raise ProjError("invalid_arg", f"isea orient {orient!r}")
    if P.has("azi"):
        Q["o_az"] = P.param_r("azi")
    if P.has("lon_0"):
        Q["o_lon"] = P.param_r("lon_0")
    if P.has("lat_0"):
        Q["o_lat"] = P.param_r("lat_0")
    mode = P.params.get("mode")
    if mode is not None:
        if mode not in ("plane", "di", "dd", "hex"):
            raise ProjError("invalid_arg", f"isea mode {mode!r}")
        Q["output"] = mode
    if P.param_b("rescale"):
        Q["radius"] = ISEA_SCALE
    if P.has("resolution"):
        Q["resolution"] = P.param_i("resolution")
    if P.has("aperture"):
        Q["aperture"] = P.param_i("aperture")
    P.fwd = isea_s_forward
    P.left = UNITS_RADIANS
    P.right = UNITS_CLASSIC
    return P
