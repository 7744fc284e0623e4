"""Multi-component deformation model (+proj=defmodel +model=file.json).

Reference: src/transformations/defmodel.cpp + defmodel_impl.hpp +
defmodel.hpp.  The master JSON declares components, each with a bbox
extent, a GeoTIFF spatial model (east/north/vertical offset samples, in
degrees or metres) and a time function (constant / velocity / step /
reverse_step / piecewise / exponential).  The forward sums
time-scaled offsets over components; horizontal offsets apply by
addition (degree or metre via DeltaEastingNorthingToLongLat) or
geocentrically; metre grids may interpolate in geocentric space
(geocentric_bilinear, GridEx::getBilinearGeocentric with the reference's
small-angle approximations).  The inverse is 10 fixed-point iterations
of the forward (defmodel_impl.hpp:1224-1262).

definition_crs resolution: the reference asks its CRS database whether
the string is geographic; without a database we use the EPSG numbering
convention (geodetic CRS codes are the 4xxx block) and default to
geographic when unparseable, as the C does when proj_create fails
(defmodel.cpp:267-277).
"""

from __future__ import annotations

import json
import math

import numpy as np

from proj_4_spark.kernels.base import PJ, ProjError

DEG_TO_RAD = math.pi / 180.0

_MONTHS = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]
_MONTHS_LEAP = [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def iso8601_to_decimal_year(s: str) -> float:
    """ISO8601ToDecimalYear (defmodel_impl.hpp:225-256)."""
    import re

    m = re.fullmatch(r"(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})Z", s)
    if not m:
        raise ProjError("invalid_arg", f"defmodel: bad date-time {s!r}")
    year, month, day, hour, mi, sec = (int(g) for g in m.groups())
    if (year < 1582 or not 1 <= month <= 12 or not 1 <= day <= 31
            or hour >= 24 or mi >= 60 or sec >= 61):
        raise ProjError("invalid_arg", f"defmodel: bad date-time {s!r}")
    leap = (year % 4 == 0 and year % 100 != 0) or year % 400 == 0
    table = _MONTHS_LEAP if leap else _MONTHS
    if day > table[month - 1]:
        raise ProjError("invalid_arg", f"defmodel: bad date-time {s!r}")
    day_in_year = day - 1 + sum(table[: month - 1])
    return year + (day_in_year * 86400 + hour * 3600 + mi * 60 + sec) / (
        86400.0 * (366 if leap else 365))


def _make_time_function(tf: dict):
    """Parse + vectorize a time_function (defmodel_impl.hpp:541-623,
    evaluateAt bodies 623-707).  Returns f(t: ndarray) -> ndarray."""
    typ = tf.get("type")
    p = tf.get("parameters", {})
    if typ == "constant":
        return lambda t: np.ones_like(t)
    if typ == "velocity":
        t0 = iso8601_to_decimal_year(p["reference_epoch"])
        return lambda t: t - t0
    if typ == "step":
        t0 = iso8601_to_decimal_year(p["step_epoch"])
        return lambda t: np.where(t < t0, 0.0, 1.0)
    if typ == "reverse_step":
        t0 = iso8601_to_decimal_year(p["step_epoch"])
        return lambda t: np.where(t < t0, -1.0, 0.0)
    if typ == "piecewise":
        before = p["before_first"]
        after = p["after_last"]
        model = [(iso8601_to_decimal_year(e["epoch"]), float(e["scale_factor"]))
                 for e in p["model"]]

        def piecewise(t):
            t = np.asarray(t, dtype=np.float64)
            out = np.zeros_like(t)
            if not model:
                return out
            dts = [m[0] for m in model]
            fs = [m[1] for m in model]
            # before first
            if before == "zero":
                bval = np.zeros_like(t)
            elif before == "constant" or len(model) == 1:
                bval = np.full_like(t, fs[0])
            else:
                d1, d2, f1, f2 = dts[0], dts[1], fs[0], fs[1]
                bval = (np.full_like(t, f1) if d1 == d2 else
                        (f1 * (d2 - t) + f2 * (t - d1)) / (d2 - d1))
            out = np.where(t < dts[0], bval, out)
            # interior segments
            for i in range(1, len(model)):
                seg = (t >= dts[i - 1]) & (t < dts[i])
                interp = (fs[i - 1] * (dts[i] - t) + fs[i] * (t - dts[i - 1])) \
                    / (dts[i] - dts[i - 1])
                out = np.where(seg, interp, out)
            # after last
            if after == "zero":
                aval = np.zeros_like(t)
            elif after == "constant" or len(model) == 1:
                aval = np.full_like(t, fs[-1])
            else:
                d1, d2, f1, f2 = dts[-2], dts[-1], fs[-2], fs[-1]
                aval = (np.full_like(t, f2) if d1 == d2 else
                        (f1 * (d2 - t) + f2 * (t - d1)) / (d2 - d1))
            out = np.where(t >= dts[-1], aval, out)
            return out

        return piecewise
    if typ == "exponential":
        t0 = iso8601_to_decimal_year(p["reference_epoch"])
        end = p.get("end_epoch", "")
        tend = iso8601_to_decimal_year(end) if end else None
        tau = float(p["relaxation_constant"])
        if tau <= 0:
            raise ProjError("invalid_arg", "defmodel: bad relaxation_constant")
        f_before = float(p["before_scale_factor"])
        f0 = float(p["initial_scale_factor"])
        f1 = float(p["final_scale_factor"])

        def exponential(t):
            t = np.asarray(t, dtype=np.float64)
            tt = np.minimum(t, tend) if tend is not None else t
            val = f0 + (f1 - f0) * (1.0 - np.exp(-(tt - t0) / tau))
            return np.where(t < t0, f_before, val)

        return exponential
    raise ProjError("invalid_arg", f"defmodel: time function {typ!r}")


def _bbox(extent: dict, geographic: bool):
    b = extent["parameters"]["bbox"]
    mul = DEG_TO_RAD if geographic else 1.0
    return b[0] * mul, b[1] * mul, b[2] * mul, b[3] * mul


def _is_geographic_crs(crs: str) -> bool:
    crs = (crs or "").strip().upper()
    if crs.startswith("EPSG:"):
        try:
            code = int(crs.split(":")[1])
        except ValueError:
            return True
        return 4000 <= code <= 4999
    return True  # C defaults to geographic when it cannot resolve


class _Component:
    def __init__(self, c: dict, geographic: bool):
        self.displacement = c["displacement_type"]
        self.extent = _bbox(c["extent"], geographic)
        sm = c["spatial_model"]
        self.filename = sm["filename"]
        self.bilinear = sm.get("interpolation_method", "bilinear") == "bilinear"
        self.tfunc = _make_time_function(c["time_function"])
        self.grids = None  # lazy list[GTiffGrid]

    def load(self):
        if self.grids is None:
            from proj_4_spark.sources.grids import resolve_grid_path
            from proj_4_spark.sources.tiff import read_gtiff_grids

            self.grids = read_gtiff_grids(resolve_grid_path(self.filename))
        return self.grids

    def sample_indices(self, g, want_horizontal: bool, want_vertical: bool):
        sx, sy, sz = 0, 1, 2
        if g.samples == 1 and want_vertical and not want_horizontal:
            sz = 0
        for i in range(g.samples):
            d = g.item("DESCRIPTION", i)
            if d == "east_offset":
                sx = i
            elif d == "north_offset":
                sy = i
            elif d == "vertical_offset":
                sz = i
        return sx, sy, sz


class DefModel:
    def __init__(self, text: str, a: float, b: float):
        j = json.loads(text)
        if j.get("file_type") != "deformation_model_master_file":
            raise ProjError("invalid_arg", "defmodel: wrong file_type")
        self.a = a
        self.b = b
        self.es = 1.0 - (b * b) / (a * a)
        self.geographic = _is_geographic_crs(j.get("definition_crs", ""))
        self.unit_degree = j.get("horizontal_offset_unit") == "degree"
        self.is_addition = j.get("horizontal_offset_method", "addition") == "addition"
        if not self.geographic and self.unit_degree:
            raise ProjError("invalid_arg",
                            "defmodel: projected CRS with degree unit")
        if not self.geographic and not self.is_addition:
            raise ProjError("invalid_arg",
                            "defmodel: projected CRS with geocentric method")
        self.extent = _bbox(j["extent"], self.geographic)
        te = j["time_extent"]
        self.t_first = iso8601_to_decimal_year(te["first"])
        self.t_last = iso8601_to_decimal_year(te["last"])
        self.components = [_Component(c, self.geographic)
                           for c in j["components"]]
        for c in self.components:
            if not self.geographic and not c.bilinear:
                raise ProjError(
                    "invalid_arg",
                    "defmodel: projected CRS with geocentric_bilinear")

    # -- forward (defmodel_impl.hpp:824-1220), vectorized -------------------
    def forward(self, x_in, y_in, z_in, t, for_inverse: bool):
        x_out = x_in.copy()
        y_out = y_in.copy()
        z_out = z_in.copy()
        EPS = 1e-10 if self.geographic else 1e-5
        minx, miny, maxx, maxy = self.extent
        x = x_in.copy()
        y = y_in.copy()
        if self.geographic:
            for _ in range(3):
                x = np.where(x < minx - EPS, x + 2 * math.pi, x)
                x = np.where(x > maxx + EPS, x - 2 * math.pi, x)
        margin = DEG_TO_RAD * 0.1 if self.geographic else 10000.0
        ok = self._bbox_check(x, y, for_inverse, minx, miny, maxx, maxy,
                              EPS, margin)
        ok &= (t >= self.t_first) & (t <= self.t_last)

        dlam = np.zeros_like(x)
        dphi = np.zeros_like(x)
        de = np.zeros_like(x)
        dn = np.zeros_like(x)
        dz = np.zeros_like(x)
        sinphi = np.sin(y)
        cosphi = np.cos(y)

        for comp in self.components:
            if comp.displacement == "none":
                continue
            cminx, cminy, cmaxx, cmaxy = comp.extent
            xg = x.copy()
            yg = y.copy()
            in_comp = ok & self._bbox_check(xg, yg, for_inverse, cminx, cminy,
                                            cmaxx, cmaxy, EPS, 0.0)
            if not in_comp.any():
                continue
            xg = np.clip(xg, cminx, cmaxx)
            yg = np.clip(yg, cminy, cmaxy)
            tfac = comp.tfunc(t)
            in_comp &= tfac != 0.0
            if not in_comp.any():
                continue
            grids = comp.load()
            want_h = comp.displacement in ("horizontal", "3d")
            want_v = comp.displacement in ("vertical", "3d")
            # finest containing grid per point
            gidx = np.full(x.shape, -1, dtype=np.int64)
            best = np.full(x.shape, np.inf)
            for gi, g in enumerate(grids):
                ins = (in_comp & (xg >= g.west - EPS) & (xg <= g.east + EPS)
                       & (yg >= g.south - EPS) & (yg <= g.north + EPS))
                finer = ins & (g.resx < best)
                gidx = np.where(finer, gi, gidx)
                best = np.where(finer, g.resx, best)
            for gi, g in enumerate(grids):
                sel = (gidx == gi)
                if not sel.any():
                    continue
                if g.width < 2 or g.height < 2:
                    ok &= ~sel
                    continue
                ix_d = (xg - g.west) / g.resx
                iy_d = (yg - g.south) / g.resy
                in_grid = (sel & (ix_d >= -EPS) & (iy_d >= -EPS)
                           & (ix_d + 1 < g.width + EPS)
                           & (iy_d + 1 < g.height + EPS))
                if not in_grid.any():
                    continue
                ix0 = np.minimum(np.trunc(ix_d).astype(np.int64), g.width - 2)
                iy0 = np.minimum(np.trunc(iy_d).astype(np.int64), g.height - 2)
                ix0 = np.clip(ix0, 0, g.width - 2)
                iy0 = np.clip(iy0, 0, g.height - 2)
                fx = ix_d - ix0
                fy = iy_d - iy0
                m00 = (1 - fx) * (1 - fy)
                m10 = fx * (1 - fy)
                m01 = (1 - fx) * fy
                m11 = fx * fy
                sx, sy, sz = comp.sample_indices(g, want_h, want_v)

                def corner(band, iy_, ix_):
                    return band[iy_, ix_].astype(np.float64)

                if want_v:
                    bz = g.data[sz]
                    # float32 cells like GTiffGrid::valueAt
                    z00 = corner(bz, iy0, ix0)
                    z10 = corner(bz, iy0, ix0 + 1)
                    z01 = corner(bz, iy0 + 1, ix0)
                    z11 = corner(bz, iy0 + 1, ix0 + 1)
                    dzi = z00 * m00 + z01 * m01 + z10 * m10 + z11 * m11
                    dz = np.where(in_grid, dz + tfac * dzi, dz)
                if want_h:
                    bx = g.data[sx]
                    by = g.data[sy]
                    e00 = corner(bx, iy0, ix0)
                    e10 = corner(bx, iy0, ix0 + 1)
                    e01 = corner(bx, iy0 + 1, ix0)
                    e11 = corner(bx, iy0 + 1, ix0 + 1)
                    n00 = corner(by, iy0, ix0)
                    n10 = corner(by, iy0, ix0 + 1)
                    n01 = corner(by, iy0 + 1, ix0)
                    n11 = corner(by, iy0 + 1, ix0 + 1)
                    if self.unit_degree:
                        # values in degrees -> radians (getLonLatOffset)
                        dli = (e00 * m00 + e01 * m01 + e10 * m10
                               + e11 * m11) * DEG_TO_RAD
                        dpi = (n00 * m00 + n01 * m01 + n10 * m10
                               + n11 * m11) * DEG_TO_RAD
                        dlam = np.where(in_grid, dlam + tfac * dli, dlam)
                        dphi = np.where(in_grid, dphi + tfac * dpi, dphi)
                    elif comp.bilinear:
                        dei = e00 * m00 + e01 * m01 + e10 * m10 + e11 * m11
                        dni = n00 * m00 + n01 * m01 + n10 * m10 + n11 * m11
                        de = np.where(in_grid, de + tfac * dei, de)
                        dn = np.where(in_grid, dn + tfac * dni, dn)
                    else:
                        # geocentric_bilinear (GridEx::getBilinearGeocentric,
                        # defmodel_impl.hpp:87-168)
                        shx = math.sin(g.resx / 2)
                        chx = math.cos(g.resx / 2)
                        y0 = g.south + iy0 * g.resy
                        sp0 = np.sin(y0)
                        cp0 = np.cos(y0)
                        sry, cry = math.sin(g.resy), math.cos(g.resy)
                        sp1 = sp0 * cry + cp0 * sry
                        cp1 = cp0 * cry - sp0 * sry

                        def enu2xyz(dE, dN, slam, clam, sphi_, cphi_):
                            dnsp = dN * sphi_
                            return (-dE * slam - dnsp * clam,
                                    dE * clam - dnsp * slam,
                                    dN * cphi_)

                        X00, Y00, Z00 = enu2xyz(e00, n00, -shx, chx, sp0, cp0)
                        X01, Y01, Z01 = enu2xyz(e01, n01, -shx, chx, sp1, cp1)
                        X10, Y10, Z10 = enu2xyz(e10, n10, shx, chx, sp0, cp0)
                        X11, Y11, Z11 = enu2xyz(e11, n11, shx, chx, sp1, cp1)
                        dX = m00 * X00 + m01 * X01 + m10 * X10 + m11 * X11
                        dY = m00 * Y00 + m01 * Y01 + m10 * Y10 + m11 * Y11
                        dZ = m00 * Z00 + m01 * Z01 + m10 * Z10 + m11 * Z11
                        lrel = (fx - 0.5) * g.resx
                        if g.resx < DEG_TO_RAD:  # smallResx approximations
                            slam = lrel * (1 - (1.0 / 6) * lrel * lrel)
                            clam = 1 - 0.5 * lrel * lrel
                        else:
                            slam = np.sin(lrel)
                            clam = np.cos(lrel)
                        dei = -dX * slam + dY * clam
                        dni = (-dX * clam - dY * slam) * sinphi + dZ * cosphi
                        de = np.where(in_grid, de + tfac * dei, de)
                        dn = np.where(in_grid, dn + tfac * dni, dn)

        # apply (defmodel_impl.hpp:1153-1219)
        if self.unit_degree:
            x_out = x_out + dlam
            y_out = y_out + dphi
        elif self.is_addition and not self.geographic:
            x_out = x_out + de
            y_out = y_out + dn
        elif self.is_addition:
            # DeltaEastingNorthingToLongLat (defmodel_impl.hpp:710-723)
            one_minu_x = self.es * (1 - cosphi * cosphi)
            X = 1 - one_minu_x
            sqrtX = np.sqrt(X)
            with np.errstate(divide="ignore", invalid="ignore"):
                x_out = x_out + de * sqrtX / (self.a * cosphi)
            y_out = y_out + dn * self.a * sqrtX * X / (self.b * self.b)
        else:
            # geocentric application
            from proj_4_spark.kernels.cart import cart_fwd3d, cart_inv3d

            pj = _CartShim(self.a, self.es)
            sinlam = np.sin(x)
            coslam = np.cos(x)
            dnsp = dn * sinphi
            dX = -de * sinlam - dnsp * coslam
            dY = de * coslam - dnsp * sinlam
            dZ = dn * cosphi
            X, Y, Z, _ = cart_fwd3d(x, y, np.zeros_like(x), np.zeros_like(x), pj)
            lam2, phi2, _, _ = cart_inv3d(X + dX, Y + dY, Z + dZ,
                                          np.zeros_like(x), pj)
            x_out = lam2
            y_out = phi2
        z_out = z_out + dz
        return x_out, y_out, z_out, ok

    @staticmethod
    def _bbox_check(x, y, for_inverse, minx, miny, maxx, maxy, EPS, margin):
        """bboxCheck (defmodel_impl.hpp:790-822); clamps x/y in place for
        the inverse margin case."""
        inside = ((x >= minx - EPS) & (x <= maxx + EPS)
                  & (y >= miny - EPS) & (y <= maxy + EPS))
        if not for_inverse or margin == 0.0:
            if margin == 0.0 and for_inverse:
                return inside
            return inside
        x_lo = (x > minx - margin) & (x < minx)
        x_hi = (x < maxx + margin) & (x > maxx)
        y_lo = (y > miny - margin) & (y < miny)
        y_hi = (y < maxy + margin) & (y > maxy)
        x[...] = np.where(x_lo, minx, np.where(x_hi, maxx, x))
        y[...] = np.where(y_lo, miny, np.where(y_hi, maxy, y))
        x_ok = ((x >= minx - EPS) & (x <= maxx + EPS)) | x_lo | x_hi
        y_ok = ((y >= miny - EPS) & (y <= maxy + EPS)) | y_lo | y_hi
        return x_ok & y_ok


class _CartShim:
    """Minimal PJ-like carrier for cart_fwd3d/cart_inv3d."""

    def __init__(self, a: float, es: float):
        self.a = a
        self.es = es
        self.b = a * math.sqrt(1 - es)
        self.e2s = es / (1 - es)


def setup_defmodel(P: PJ) -> PJ:
    """defmodel.cpp:393-451."""
    from proj_4_spark.sources.grids import resolve_grid_path

    model = P.params.get("model")
    if not model:
        raise ProjError("no_args", "defmodel: +model= required")
    try:
        path = resolve_grid_path(str(model))
    except FileNotFoundError:
        raise ProjError("invalid_arg", f"defmodel: cannot open {model}") from None
    import os

    if os.path.getsize(path) > 10 * 1024 * 1024:
        raise ProjError("invalid_arg", "defmodel: file too large")
    try:
        dm = DefModel(open(path, encoding="utf-8", errors="replace").read(),
                      P.a, P.a * math.sqrt(P.one_es))
    except (ValueError, KeyError, TypeError) as e:
        raise ProjError("invalid_arg", f"defmodel: invalid model: {e}") from None

    def fwd4d(x, y, z, t, _P):
        xo, yo, zo, good = dm.forward(np.asarray(x, dtype=np.float64),
                                      np.asarray(y, dtype=np.float64),
                                      np.asarray(z, dtype=np.float64),
                                      np.asarray(t, dtype=np.float64), False)
        bad = ~good
        return (np.where(bad, np.nan, xo), np.where(bad, np.nan, yo),
                np.where(bad, np.nan, zo), t)

    def inv4d(x, y, z, t, _P):
        """Evaluator::inverse (defmodel_impl.hpp:1224-1262)."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        z = np.asarray(z, dtype=np.float64)
        t = np.asarray(t, dtype=np.float64)
        xo, yo, zo = x.copy(), y.copy(), z.copy()
        active = np.ones(x.shape, dtype=bool)
        done = np.zeros(x.shape, dtype=bool)
        bad = np.zeros(x.shape, dtype=bool)
        for _ in range(10):
            if not active.any():
                break
            xn, yn, zn, good = dm.forward(xo, yo, zo, t, True)
            nb = active & ~good
            bad |= nb
            dx = xn - x
            dy = yn - y
            dzv = zn - z
            upd = active & good
            xo = np.where(upd, xo - dx, xo)
            yo = np.where(upd, yo - dy, yo)
            zo = np.where(upd, zo - dzv, zo)
            conv = (np.maximum(np.abs(dx), np.abs(dy)) < 1e-12) \
                & (np.abs(dzv) < 1e-3)
            done |= upd & conv
            active = active & ~nb & ~conv
        bad |= active  # non-convergence after 10 iterations
        return (np.where(bad, np.nan, xo), np.where(bad, np.nan, yo),
                np.where(bad, np.nan, zo), t)

    P.fwd4d = fwd4d
    P.inv4d = inv4d
    if dm.geographic:
        P.left = "radians"
        P.right = "radians"
    else:
        P.left = "projected"
        P.right = "projected"
    return P
