"""Linear, angular and time unit conversion.

Reference: src/conversions/unitconvert.cpp — time converters 147-260,
fwd/inv at all arities 285-388, factor lookup 390-470, setup 433-560.
Time conversions (mjd/decimalyear/gps_week/yyyymmdd) are vectorized with
the same calendar arithmetic (is_leap_year/days_in_year/days_in_month,
unitconvert.cpp:100-145).
"""

from __future__ import annotations

import numpy as np

from proj_4_spark.kernels import common as C
from proj_4_spark.kernels.base import PJ, ProjError, UNITS_TO_METER

ANGULAR_FACTOR = {  # src/units.cpp:54-59 (factor = to-radians)
    "rad": 1.0,
    "deg": C.DEG_TO_RAD,
    "grad": np.pi / 200.0,
}


def _factor(name: str) -> tuple[float, bool | None, str | None]:
    """(factor, is_linear, normalized_name); unitconvert.cpp:390-430,470-485.

    Falls back to a numeric literal (incl. 'a/b' ratio, pj_atof semantics)
    when the name is not a known unit id.
    """
    if name in UNITS_TO_METER:
        return UNITS_TO_METER[name], True, name
    if name in ANGULAR_FACTOR:
        return ANGULAR_FACTOR[name], False, name
    try:
        if "/" in name:
            num, den = name.split("/", 1)
            f = float(num) / float(den)
        else:
            f = float(name)
    except ValueError:
        raise ProjError("unknown_unit_id", name) from None
    if f == 0.0 or 1.0 / f == 0.0:
        raise ProjError("unknown_unit_id", name)
    return f, None, None


# --- calendar helpers, unitconvert.cpp:98-145 --------------------------------

def _is_leap(year):
    year = np.asarray(year)
    return ((year % 4 == 0) & (year % 100 != 0)) | (year % 400 == 0)


def _days_in_year(year):
    return np.where(_is_leap(year), 366, 365)


_MONTH_TABLE = np.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])


def _days_in_month(year, month):
    month = np.clip(month, 1, 12)
    days = _MONTH_TABLE[month - 1]
    return np.where(_is_leap(year) & (month == 2), days + 1, days)


def _daynumber_in_year(year, month, day):
    month = np.clip(month, 1, 12)
    day = np.minimum(day, _days_in_month(year, month))
    out = np.zeros(np.broadcast(year, month).shape, dtype=np.float64)
    for m in range(1, 12):
        out = out + np.where(month > m, _days_in_month(year, m), 0)
    return out + day


# --- time converters, unitconvert.cpp:147-260 --------------------------------

def decimalyear_to_mjd(dy):
    dy = np.asarray(dy, dtype=np.float64)
    valid = (dy >= -10000) & (dy <= 10000)
    dy_s = np.where(valid, dy, 2000.0)
    year = np.floor(dy_s).astype(np.int64)
    frac = dy_s - year
    mjd = (year - 1859) * 365.0 + 14 + 31
    mjd = mjd + frac * _days_in_year(year)
    # leap-day corrections for every leap year in (1858, year)
    max_y = int(year.max()) if year.size else 1859
    ys = np.arange(1859, max(max_y, 1859))
    leaps = _is_leap(ys)
    # cumulative count of leap years < y for y = year
    leap_cum = np.cumsum(leaps)
    idx = np.clip(year - 1859, 0, len(ys))
    add = np.where(idx > 0, leap_cum[np.clip(idx - 1, 0, max(len(ys) - 1, 0))], 0) if len(ys) else 0
    mjd = mjd + add
    return np.where(valid, mjd, 0.0)


def mjd_to_decimalyear(mjd):
    mjd = np.asarray(mjd, dtype=np.float64)
    out = np.empty_like(mjd)
    # brute force per the reference (unitconvert.cpp:186-205), but over the
    # unique years present in the batch, not per element
    years = np.full(mjd.shape, 1859, dtype=np.int64)
    base = np.full(mjd.shape, 14.0 + 31.0)
    active = np.isfinite(mjd)
    # iteratively advance years; bounded by ~200 iterations for sane epochs
    for _ in range(500):
        diy = _days_in_year(years)
        adv = active & (mjd >= base + diy)
        if not adv.any():
            break
        base = np.where(adv, base + diy, base)
        years = np.where(adv, years + 1, years)
    out = years + (mjd - base) / _days_in_year(years)
    return out


def gps_week_to_mjd(w):
    return 44244.0 + np.asarray(w, dtype=np.float64) * 7.0


def mjd_to_gps_week(mjd):
    return (np.asarray(mjd, dtype=np.float64) - 44244.0) / 7.0


def yyyymmdd_to_mjd(v):
    v = np.asarray(v, dtype=np.float64)
    year = np.floor(v / 10000).astype(np.int64)
    month = np.floor((v - year * 10000) / 100).astype(np.int64)
    day = np.floor(v - year * 10000 - month * 100)
    mjd = _daynumber_in_year(year, month, day)
    max_y = int(year.max()) if year.size else 1859
    ys = np.arange(1859, max(max_y, 1859))
    if len(ys):
        diy = _days_in_year(ys).astype(np.float64)
        cum = np.cumsum(diy)
        idx = np.clip(year - 1859, 0, len(ys))
        add = np.where(idx > 0, cum[np.clip(idx - 1, 0, len(ys) - 1)], 0.0)
        mjd = mjd + add
    return mjd + 13 + 31


def mjd_to_yyyymmdd(mjd):
    mjd = np.asarray(mjd, dtype=np.float64)
    base = np.full(mjd.shape, 14.0 + 31.0)
    years = np.full(mjd.shape, 1859, dtype=np.int64)
    for _ in range(500):
        diy = _days_in_year(years)
        adv = mjd >= base + diy
        if not adv.any():
            break
        base = np.where(adv, base + diy, base)
        years = np.where(adv, years + 1, years)
    month = np.full(mjd.shape, 1, dtype=np.int64)
    for _ in range(12):
        dim = _days_in_month(years, month)
        adv = base + dim <= mjd
        base = np.where(adv, base + dim, base)
        month = np.where(adv, month + 1, month)
    day = mjd - base + 1
    return years * 10000.0 + month * 100.0 + np.floor(day)


TIME_UNITS = {
    "mjd": (lambda v: np.asarray(v, dtype=np.float64), lambda v: np.asarray(v, dtype=np.float64)),
    "decimalyear": (decimalyear_to_mjd, mjd_to_decimalyear),
    "gps_week": (gps_week_to_mjd, mjd_to_gps_week),
    "yyyymmdd": (yyyymmdd_to_mjd, mjd_to_yyyymmdd),
}


def setup_unitconvert(P: PJ) -> PJ:
    """unitconvert.cpp:433-560."""
    Q: dict = {"xy_factor": 1.0, "z_factor": 1.0, "t_in": None, "t_out": None}
    xy_in_lin = xy_out_lin = z_in_lin = z_out_lin = None
    P.left = "whatever"   # defaults set before unit parsing (unitconvert.cpp:452-453)
    P.right = "whatever"

    if P.has("xy_in"):
        f, lin, norm = _factor(str(P.params["xy_in"]))
        Q["xy_factor"] = f
        xy_in_lin = lin
        # angular unit names tag the I/O sides (unitconvert.cpp:480-485)
        if norm == "rad":
            P.left = "radians"
        elif norm == "deg":
            P.left = "degrees"
    if P.has("xy_out"):
        f, lin, norm = _factor(str(P.params["xy_out"]))
        Q["xy_factor"] /= f
        xy_out_lin = lin
        if norm == "rad":
            P.right = "radians"
        elif norm == "deg":
            P.right = "degrees"
    if xy_in_lin is not None and xy_out_lin is not None and xy_in_lin != xy_out_lin:
        raise ProjError("incompatible_unit_types", "xy_in/xy_out")

    if P.has("z_in"):
        f, lin, _ = _factor(str(P.params["z_in"]))
        Q["z_factor"] = f
        z_in_lin = lin
    if P.has("z_out"):
        f, lin, _ = _factor(str(P.params["z_out"]))
        Q["z_factor"] /= f
        z_out_lin = lin
    if z_in_lin is not None and z_out_lin is not None and z_in_lin != z_out_lin:
        raise ProjError("incompatible_unit_types", "z_in/z_out")

    if P.has("t_in"):
        name = str(P.params["t_in"])
        if name not in TIME_UNITS:
            raise ProjError("unknown_unit_id", name)
        Q["t_in"] = TIME_UNITS[name]
    if P.has("t_out"):
        name = str(P.params["t_out"])
        if name not in TIME_UNITS:
            raise ProjError("unknown_unit_id", name)
        Q["t_out"] = TIME_UNITS[name]

    xyf = Q["xy_factor"]
    zf = Q["z_factor"]
    t_in = Q["t_in"]
    t_out = Q["t_out"]

    def fwd4d(x, y, z, t, _P):
        x2, y2, z2 = x * xyf, y * xyf, z * zf
        t2 = t
        if t_in is not None:
            t2 = t_in[0](t2)
        if t_out is not None:
            t2 = t_out[1](t2)
        return x2, y2, z2, t2

    def inv4d(x, y, z, t, _P):
        x2, y2, z2 = x / xyf, y / xyf, z / zf
        t2 = t
        if t_out is not None:
            t2 = t_out[0](t2)
        if t_in is not None:
            t2 = t_in[1](t2)
        return x2, y2, z2, t2

    P.fwd4d = fwd4d
    P.inv4d = inv4d
    P.skip_fwd_prepare = True
    P.skip_inv_prepare = True
    P.opaque.update(Q)
    return P
