"""Compile an EPSG preset catalog from the reference's public EPSG SQL
dataset (data/sql/*.sql, the same files proj.db is built from by
scripts/build_db.py) into proj-string presets, rendered the way
`+init=epsg:` expanded under classic proj.4 init rules
(use_proj4_init_rules, src/iso19111/factory.cpp:135-334 semantics):

- projected CRS  -> conversion method/params mapped to proj kernels
  (UTM detection, DMS/grad/arc-second unit conversion, foot-based false
  origins converted per-axis-unit);
- geographic CRS -> proj=longlat + ellipsoid/prime-meridian;
- geocentric CRS -> proj=geocent;
- towgs84        -> the best non-deprecated Helmert to WGS 84 (EPSG
  target 4326) for the base geographic CRS: min accuracy, then min code
  (position-vector convention; Coordinate Frame rotations sign-flipped);
- units          -> from the coordinate system's first axis unit.

Axis *order* is deliberately ignored (classic init rules: GIS-friendly
lon/lat, easting/northing) except where the method itself is
south/west-orientated (TM South Orientated -> axis=wsu).

Output: proj_4_spark/sources/epsg_generated.py (PRESETS dict).

Usage: python tools/gen_epsg_catalog.py [--sql-dir DIR] [--out FILE]
"""

from __future__ import annotations

import argparse
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SQL_DIR = "/root/reference/data/sql"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "proj_4_spark", "sources", "epsg_generated.py")

_INSERT_RE = re.compile(r"INSERT INTO \"?(\w+)\"? VALUES\s*\(", re.S)


def parse_sql_file(path: str):
    """Yield (table, [values...]) for every INSERT in the file.
    Values: str | float | int | None; numeric literals also keep their
    raw text (needed for sexagesimal-DMS, which is positional)."""
    text = open(path, encoding="utf-8").read()
    for m in _INSERT_RE.finditer(text):
        table = m.group(1)
        try:
            yield _parse_values(text, m.end(), table)
        except (ValueError, IndexError):
            # rows built with SQL || concatenation (a handful of
            # proj-string customization rows) are not preset material
            continue


def _parse_values(text: str, i: int, table: str):
        vals = []
        raw = []
        while True:
            c = text[i]
            if c == ')':
                break
            if c == ',' or c.isspace():
                i += 1
                continue
            if text.startswith("--", i):  # inline SQL comment
                i = text.index("\n", i) + 1
                continue
            if c == "'":
                j = i + 1
                buf = []
                while True:
                    if text[j] == "'":
                        if text[j + 1] == "'":
                            buf.append("'")
                            j += 2
                            continue
                        break
                    buf.append(text[j])
                    j += 1
                vals.append("".join(buf))
                raw.append(None)
                i = j + 1
            elif text.startswith("NULL", i):
                vals.append(None)
                raw.append(None)
                i += 4
            else:
                j = i
                while text[j] not in ",)":
                    j += 1
                tok = text[i:j].strip()
                vals.append(float(tok) if ("." in tok or "e" in tok or "E" in tok)
                            else int(tok))
                raw.append(tok)
                i = j
        return table, vals, raw


# EPSG method codes of the Geographic3D -> GravityRelatedHeight family
# (geoid model grid, parameter 8666).  9635 is the Geog3D ->
# Geog2D+GravityRelatedHeight variant targeting a compound CRS.
_GEOID_METHODS = {9635, 9661, 9662, 9663, 9664, 9665, 1025, 1030, 1045,
                  1047, 1048, 1050, 1059, 1060, 1072, 1073, 1081, 1082}


# grid_alternatives uses a column-list INSERT (one per row in the
# generated_noaa file, one giant multi-row VALUES in the curated file);
# we only need (original_grid_name, proj_grid_name, old_proj_grid_name)
_GA_ROW_RE = re.compile(
    r"\(\s*'([^']*)'\s*,\s*'([^']*)'\s*,\s*(?:'([^']*)'|NULL)\s*,"
    r"\s*'([^']*)'\s*,\s*'([^']*)'", re.S)


def load_grid_alternatives(sql_dir: str) -> dict[str, str]:
    """original_grid_name -> the name our loaders can read: the proj.4-era
    old_proj_grid_name (.gtx/.gsb/ctable2) when one exists, else the
    CDN GTiff proj_grid_name (data/sql/grid_alternatives*.sql)."""
    alias: dict[str, str] = {}
    for fn in ("grid_alternatives.sql",
               "grid_alternatives_generated_noaa.sql"):
        path = os.path.join(sql_dir, fn)
        if not os.path.exists(path):
            continue
        text = open(path, encoding="utf-8").read()
        text = "\n".join(ln for ln in text.splitlines()
                         if not ln.lstrip().startswith("--"))
        for m in _GA_ROW_RE.finditer(text):
            orig, proj_name, old_name, _fmt, _method = m.groups()
            alias[orig] = old_name or proj_name
    return alias


def load_tables(sql_dir: str):
    tables: dict[str, list] = {}
    for fn in sorted(os.listdir(sql_dir)):
        if not fn.endswith(".sql"):
            continue
        if fn in ("customizations.sql", "proj_db_table_defs.sql"):
            continue
        for table, vals, raw in parse_sql_file(os.path.join(sql_dir, fn)):
            tables.setdefault(table, []).append((vals, raw))
    tables["__grid_alias__"] = load_grid_alternatives(sql_dir)
    return tables


# --------------------------------------------------------------------------
# unit conversion

def dms_to_deg(raw: str) -> float:
    """EPSG uom 9110 sexagesimal DMS: DDD.MMSSsssss (positional — must
    come from the SQL literal text, not a parsed float)."""
    neg = raw.startswith("-")
    s = raw.lstrip("+-")
    if "." in s:
        d, frac = s.split(".", 1)
    else:
        d, frac = s, ""
    frac = (frac + "0000")[: max(4, len(frac))]  # pad minutes/seconds
    mm = int(frac[:2] or 0)
    ss = float((frac[2:4] or "0") + ("." + frac[4:] if len(frac) > 4 else ""))
    deg = int(d or 0) + mm / 60.0 + ss / 3600.0
    return -deg if neg else deg


class Units:
    def __init__(self, rows):
        self.factor = {}
        self.kind = {}
        for vals, _ in rows:
            # ('EPSG', code, name, type, factor, deprecated?... )
            code, name, typ, fac = int(vals[1]), vals[2], vals[3], vals[4]
            self.factor[code] = fac
            self.kind[code] = typ

    def angle_deg(self, value, uom: int, raw: str | None) -> float:
        # exact paths for the standard angle units (routing degrees
        # through the radian factor would turn 21 into 20.99999999999998)
        if uom == 9110:
            return dms_to_deg(raw if raw is not None else repr(value))
        if uom == 9102:   # degree
            return value
        if uom == 9105:   # grad
            return value * 0.9
        if uom == 9104:   # arc-second
            return value / 3600.0
        if uom == 9103:   # arc-minute
            return value / 60.0
        fac = self.factor.get(uom)
        if fac is None:
            raise KeyError(f"angle uom {uom}")
        return value * fac * 180.0 / math.pi

    def length_m(self, value, uom: int) -> float:
        fac = self.factor.get(uom)
        if fac is None:
            raise KeyError(f"length uom {uom}")
        return value * fac

    def scale_unity(self, value, uom: int) -> float:
        fac = self.factor.get(uom)
        if fac is None:
            raise KeyError(f"scale uom {uom}")
        return value * fac

    def rot_arcsec(self, value, uom: int) -> float:
        if uom == 9104:   # arc-second (the overwhelmingly common case)
            return value
        if uom == 9103:
            return value * 60.0
        if uom == 9102:
            return value * 3600.0
        fac = self.factor.get(uom)
        if fac is None:
            raise KeyError(f"rot uom {uom}")
        return value * fac * (180.0 * 3600.0) / math.pi


# proj +units= tokens for common axis units; anything else -> +to_meter=
UNIT_TOKEN = {
    9001: "m",
    9002: "ft",
    9003: "us-ft",
    9036: "km",
    9096: "yd",
}

# EPSG ellipsoid code -> proj +ellps= name (proj_ellps table, pj_ellps.c)
ELLPS_NAME = {
    7001: "airy", 7002: "mod_airy", 7003: "aust_SA", 7004: "bessel",
    7008: "clrk66", 7012: "clrk80", 7011: "clrk80ign", 7015: "evrst30",
    7016: "evrstSS", 7019: "GRS80", 7020: "helmert", 7022: "intl",
    7024: "krass", 7027: "plessis", 7030: "WGS84", 7036: "GRS67",
    7043: "WGS72", 7044: "evrst56", 7046: "bess_nam", 7049: "IAU76",
}

# geodetic DATUM codes whose classic expansion is a named +datum=
# (these expand to grid chains / canonical towgs84 inside the engine's
# datum registry): 6326 WGS84, 6267 NAD27, 6269 NAD83, 6277 OSGB36
DATUM_NAME = {6326: "WGS84", 6267: "NAD27", 6269: "NAD83", 6277: "OSGB36"}


# IGNF frames aligned to ITRF/WGS84 by definition (towgs84 = 0,0,0 in
# the classic IGNF registry; no Helmert row exists because none is
# needed): the modern French reference networks + WGS84/ETRS realizations
IGNF_WGS84_FRAMES = ("RGF93", "RGR92", "RGSPM06", "RGPF", "RGM04",
                     "RGFG95", "RGTAAF", "RGNC", "WGS84", "WGS72",
                     "ETRS89")


def _ignf_zero_frame(key) -> bool:
    return (isinstance(key, str) and key.startswith("IGNF:")
            and key.split(":", 1)[1].startswith(IGNF_WGS84_FRAMES)
            and not key.split(":", 1)[1].startswith("WGS72"))


def _k(auth, code):
    """Composite table key: EPSG codes as ints (the common fast path),
    other authorities (IGNF) as 'AUTH:code' strings."""
    if auth == "EPSG":
        return int(code)
    return f"{auth}:{code}"


def fmt(v: float) -> str:
    """Shortest round-trip decimal (classic init files print plainly)."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


class Catalog:
    def __init__(self, tables):
        self.units = Units(tables["unit_of_measure"])
        self.ellipsoid = {_k(v[0], v[1]): v for v, _ in tables["ellipsoid"]}
        self.pm = {_k(v[0], v[1]): (v, r) for v, r in tables["prime_meridian"]}
        self.datum = {_k(v[0], v[1]): v for v, _ in tables["geodetic_datum"]}
        self.geod_crs = {_k(v[0], v[1]): v for v, _ in tables["geodetic_crs"]}
        self.conversion = {_k(v[0], v[1]): (v, r)
                           for v, r in tables["conversion"]}
        self.proj_crs = {_k(v[0], v[1]): v for v, _ in tables["projected_crs"]}
        self.axis = {}
        for v, _ in tables["axis"]:
            # ('EPSG',code,name,abbrev,orientation,'EPSG',cs_code,order,'EPSG',uom)
            cs = _k(v[5], v[6])
            self.axis.setdefault(cs, []).append(
                (int(v[7]), v[4], int(v[9]) if v[9] is not None else None))
        for cs in self.axis:
            self.axis[cs].sort()
        # usage -> extent bbox per (table, code)
        self.extent = {_k(v[0], v[1]): v for v, _ in tables.get("extent", [])}
        self.usage_extent: dict[tuple, object] = {}
        for v, _ in tables.get("usage", []):
            try:
                self.usage_extent[(v[2], _k(v[3], v[4]))] = _k(v[5], v[6])
            except (TypeError, ValueError):
                continue
        # helmert candidates to WGS84 by source geographic CRS
        self.helmert = {}
        self._helmert_indirect = []
        self.helmert_all = []   # (code, name, method, src, tgt, acc, row)
        for v, r in tables["helmert_transformation"]:
            if v[-1]:  # deprecated
                continue
            method = int(v[5])
            if method not in (9603, 9606, 9607, 1031, 1032, 1033):
                continue
            src, tgt = _k(v[7], v[8]), _k(v[9], v[10])
            acc = v[11] if isinstance(v[11], (int, float)) else 999.0
            self.helmert_all.append((_k(v[0], v[1]), v[2], method, src, tgt,
                                     acc, v))
            # WGS84 hub targets: EPSG:4326 or the IGNF WGS84 geographic
            if tgt in (4326, "IGNF:WGS84G"):
                self.helmert.setdefault(src, []).append(
                    (acc, str(_k(v[0], v[1])), v, r))
            else:
                self._helmert_indirect.append(
                    (acc, str(_k(v[0], v[1])), v, r, tgt))
        # one-step hub closure: a transformation to a CRS that is
        # itself 0,0,0-to-WGS84 (the ITRF-compatible RGF93/RGR92/...
        # realizations) counts as a transformation to WGS84
        zero_equiv = {k for k in self.geod_crs if _ignf_zero_frame(k)}
        for src, rows in self.helmert.items():
            for acc, code, v, r in rows:
                if (v[12], v[13], v[14]) == (0.0, 0.0, 0.0) and v[17] is None:
                    zero_equiv.add(src)
                    break
        for acc, code, v, r, tgt in self._helmert_indirect:
            if tgt in zero_equiv:
                self.helmert.setdefault(_k(v[7], v[8]), []).append(
                    (acc, code, v, r))
        for src in self.helmert:
            # min accuracy, then min code (numeric EPSG codes compare
            # numerically; string authority codes after, lexically)
            self.helmert[src].sort(key=lambda t: (
                t[0], not t[1].isdigit(),
                int(t[1]) if t[1].isdigit() else 0, t[1]))
        # grid transformations (NADCON 9613, NTv2 9615)
        self.grid_tf = []       # (code, name, method, src, tgt, acc, grid)
        for v, _ in tables.get("grid_transformation", []):
            if v[-1]:
                continue
            method = int(v[5])
            if method not in (9613, 9615):
                continue
            grid = v[15]
            if not isinstance(grid, str):
                continue
            if method == 9613 and grid.endswith(".las"):
                grid = grid[:-4]   # NADCON pair -> merged ctable2 name
            acc = v[11] if isinstance(v[11], (int, float)) else 999.0
            self.grid_tf.append((_k(v[0], v[1]), v[2], method,
                                 _k(v[7], v[8]), _k(v[9], v[10]), acc, grid))
        # geoid-model grid transformations (the Geographic3D ->
        # GravityRelatedHeight method family; parameter 8666 carries the
        # geoid model file): source geographic-3D CRS -> target vertical
        # CRS.  Method 9635 targets a compound CRS instead — its
        # vertical component is resolved in build().
        self.geoid_tf = []
        for v, _ in tables.get("grid_transformation", []):
            if v[-1]:
                continue
            method = int(v[5])
            if method not in _GEOID_METHODS:
                continue
            grid = v[15]
            if not isinstance(grid, str):
                continue
            acc = v[11] if isinstance(v[11], (int, float)) else 999.0
            self.geoid_tf.append(
                (_k(v[0], v[1]), v[2], _k(v[7], v[8]),
                 _k(v[9], v[10]), acc, grid))
        # vertical-to-vertical datum changes: Vertical Offset by Grid
        # Interpolation (9658 VERTCON, 1071 NZLVD, 1080 BEV AT, 1084
        # gtx, 1085 asc; grid file parameter) and the constant Vertical
        # Offset method (9616, other_transformation parameter 8603)
        self.vert_tf = []
        for v, _ in tables.get("grid_transformation", []):
            if v[-1] and int(v[5]) != 9658:
                # keep the deprecated VERTCON rows: the reference's
                # vertcon route is proj.4's classic NGVD29 path
                pass
            method = int(v[5])
            if method not in (9658, 1071, 1080, 1084, 1085):
                continue
            grid = v[15]
            if not isinstance(grid, str):
                continue
            acc = v[11] if isinstance(v[11], (int, float)) else 999.0
            self.vert_tf.append(
                (_k(v[0], v[1]), v[2], "vgrid", _k(v[7], v[8]),
                 _k(v[9], v[10]), acc, grid))
        for v, _ in tables.get("other_transformation", []):
            if v[-1]:
                continue
            try:
                if int(v[5]) != 9616:  # constant Vertical Offset
                    continue
                if v[13] is None or int(v[13]) != 8603 or v[15] is None:
                    continue
            except (TypeError, ValueError):
                continue  # PROJString-method rows have another layout
            acc = v[11] if isinstance(v[11], (int, float)) else 999.0
            try:
                dz = self.units.length_m(float(v[15]), int(v[17]))
            except (KeyError, TypeError, ValueError):
                continue
            self.vert_tf.append(
                (_k(v[0], v[1]), v[2], "voffset", _k(v[7], v[8]),
                 _k(v[9], v[10]), acc, dz))
        # vertical + compound CRS rows
        # vertical_crs: (auth, code, name, desc, cs_auth, cs, datum_auth,
        # datum, deprecated); compound_crs: (auth, code, name, desc,
        # horiz_auth, horiz, vert_auth, vert, deprecated)
        self.vert_crs = {_k(v[0], v[1]): v
                         for v, _ in tables.get("vertical_crs", [])}
        self.compound_crs = {_k(v[0], v[1]): v
                             for v, _ in tables.get("compound_crs", [])}
        self.grid_alias: dict[str, str] = tables.get("__grid_alias__", {})

    # ----------------------------------------------------------------
    def towgs84(self, geod_code) -> str | None:
        if _ignf_zero_frame(geod_code):
            return "towgs84=0,0,0"
        cands = self.helmert.get(geod_code)
        if not cands:
            sib = self.pm_sibling(geod_code)
            if sib is not None:
                cands = self.helmert.get(sib)
        if not cands:
            return None
        _, _, v, _ = cands[0]
        u = self.units
        method = int(v[5])
        tx = u.length_m(v[12], int(v[16]))
        ty = u.length_m(v[13], int(v[16]))
        tz = u.length_m(v[14], int(v[16]))
        if v[17] is None:
            return f"towgs84={fmt(tx)},{fmt(ty)},{fmt(tz)}"
        rx = u.rot_arcsec(v[17], int(v[21]))
        ry = u.rot_arcsec(v[18], int(v[21]))
        rz = u.rot_arcsec(v[19], int(v[21]))
        ds = v[22] * u.factor[int(v[24])] * 1e6 if v[22] is not None else 0.0
        if method in (9607, 1032):  # Coordinate Frame -> position vector
            rx, ry, rz = -rx, -ry, -rz
        vals = [tx, ty, tz, round(rx, 12), round(ry, 12), round(rz, 12),
                round(ds, 12)]
        return "towgs84=" + ",".join(fmt(x) for x in vals)

    def pm_sibling(self, geod_code):
        """For a CRS on a non-Greenwich datum variant ('NTF (Paris)'),
        the geographic-2D CRS of the Greenwich base datum of the same
        name and ellipsoid — classic init gave both the same towgs84
        (the longitude rotation commutes with the Helmert shift to
        within the shift's own accuracy)."""
        g = self.geod_crs.get(geod_code)
        if g is None or g[8] is None:
            return None
        d = self.datum.get(_k(g[7], g[8]))
        if d is None or _k(d[6], d[7]) == 8901:
            return None
        base_name = re.sub(r"\s*\([^)]*\)\s*$", "", d[2])
        for code2, d2 in self.datum.items():
            if (d2[2] == base_name and _k(d2[6], d2[7]) == 8901
                    and d2[5] == d[5]):
                for gc, g2 in self.geod_crs.items():
                    if (g2[8] is not None and _k(g2[7], g2[8]) == code2
                            and g2[4] == "geographic 2D"
                            and gc in self.helmert):
                        return gc
        return None

    def ellps_fragment(self, ell_code) -> str | None:
        name = ELLPS_NAME.get(ell_code)
        if name:
            return f"ellps={name}"
        v = self.ellipsoid.get(ell_code)
        if v is None:
            return None
        a = self.units.length_m(v[6], int(v[8]))
        inv_f, b = v[9], v[10]
        if inv_f == 0:           # sphere convention (ESRI rf=0 rows)
            return f"a={fmt(a)} b={fmt(a)}"
        if inv_f is not None:
            return f"a={fmt(a)} rf={fmt(inv_f)}"
        b_m = self.units.length_m(b, int(v[8]))
        if b_m == a:
            return f"a={fmt(a)} b={fmt(b_m)}"
        return f"a={fmt(a)} b={fmt(b_m)}"

    def pm_fragment(self, pm_code) -> str | None:
        if pm_code == 8901:  # Greenwich
            return None
        v, r = self.pm[pm_code]
        deg = self.units.angle_deg(v[3], int(v[5]), r[3])
        named = {8902: "lisbon", 8903: "paris", 8904: "bogota",
                 8905: "madrid", 8906: "rome", 8907: "bern", 8908: "jakarta",
                 8909: "ferro", 8910: "brussels", 8911: "stockholm",
                 8912: "athens", 8913: "oslo"}
        if pm_code in named:
            return f"pm={named[pm_code]}"
        return f"pm={fmt(deg)}"

    def base_fragment(self, geod_code, with_towgs84: bool = True) -> str | None:
        """Datum/ellipsoid/pm (+towgs84) fragment for a geographic CRS."""
        g = self.geod_crs.get(geod_code)
        if g is None:
            return None
        if g[8] is None:
            return None
        datum_key = _k(g[7], g[8])
        if datum_key in DATUM_NAME:
            return f"datum={DATUM_NAME[datum_key]}"
        d = self.datum.get(datum_key)
        if d is None:
            return None
        ef = self.ellps_fragment(_k(d[4], d[5]))
        if ef is None:
            return None
        parts = [ef]
        pmf = self.pm_fragment(_k(d[6], d[7]))
        if pmf:
            parts.append(pmf)
        if with_towgs84:
            tw = self.towgs84(geod_code)
            if tw:
                parts.append(tw)
        return " ".join(parts)

    # ----------------------------------------------------------------
    def conv_params(self, conv_vals, conv_raw) -> dict[int, tuple]:
        """{param_code: (value, uom, raw)} from a conversion row."""
        out = {}
        # layout: ...,'EPSG',method,method_name, then 7x
        # ('EPSG', pcode, pname, value, 'EPSG', uom)
        i = 7
        v, r = conv_vals, conv_raw
        while i + 5 < len(v):
            if v[i] != "EPSG" or v[i + 1] is None:
                break
            pcode = int(v[i + 1])
            val = v[i + 3]
            uom = v[i + 5]
            out[pcode] = (val, int(uom) if uom is not None else None, r[i + 3])
            i += 6
        return out

    def angle(self, p, code, default=None):
        if code not in p:
            return default
        val, uom, raw = p[code]
        return self.units.angle_deg(val, uom, raw)

    def length(self, p, code, default=0.0):
        if code not in p:
            return default
        val, uom, _ = p[code]
        return self.units.length_m(val, uom)

    def scale(self, p, code, default=1.0):
        if code not in p:
            return default
        val, uom, _ = p[code]
        return self.units.scale_unity(val, uom)

    def method_fragment(self, method: int, p: dict) -> str | None:
        from proj_4_spark.sources.epsg_methods import method_fragment
        return method_fragment(method, p, self.angle, self.length,
                               self.scale)

    def proj_native_fragment(self, name: str, p: dict) -> str | None:
        """IGNF conversions with a PROJ-native method ('PROJ','gstm'
        Gauss Schreiber TM, 'PROJ','mill')."""
        A, L, K = self.angle, self.length, self.scale
        if name == "gstm":
            return (f"proj=gstmerc lat_0={fmt(A(p, 8801, 0.0))} "
                    f"lon_0={fmt(A(p, 8802, 0.0))} k_0={fmt(K(p, 8805))} "
                    f"x_0={fmt(L(p, 8806))} y_0={fmt(L(p, 8807))}")
        if name == "mill":
            return (f"proj=mill lon_0={fmt(A(p, 8802, 0.0))} "
                    f"x_0={fmt(L(p, 8806))} y_0={fmt(L(p, 8807))}")
        return None

    # ESRI WKT1 text-definition compilation (the 54xxx world family,
    # 102003 Albers, 102100 web mercator, ... have NULL conversion refs
    # and carry an inline PROJCS[...] instead; the geodetic base is
    # still referenced normally, so only PROJECTION/PARAMETER/UNIT need
    # parsing).  Parameter names per the ESRI WKT1 dialect.
    def esri_wkt_fragment(self, wkt: str) -> tuple | None:
        from proj_4_spark.sources.esri_wkt1 import esri_wkt_fragment
        return esri_wkt_fragment(wkt)

    def units_fragment(self, cs_code) -> str | None:
        axes = self.axis.get(cs_code)
        if not axes:
            return "units=m"
        uom = axes[0][2]
        if uom is None:
            return "units=m"
        tok = UNIT_TOKEN.get(uom)
        if tok:
            return f"units={tok}"
        fac = self.units.factor.get(uom)
        if fac is None or self.units.kind.get(uom) != "length":
            return None  # unsupported axis unit -> code dropped
        return f"to_meter={fmt(fac)}"

    def bbox(self, table: str, code):
        """(west, south, east, north) degrees for a CRS code, or None."""
        ext_code = self.usage_extent.get((table, code))
        if ext_code is None:
            return None
        e = self.extent.get(ext_code)
        if e is None or e[4] is None:
            return None
        south, north, west, east = e[4], e[5], e[6], e[7]
        return (west, south, east, north)

    # ----------------------------------------------------------------
    def build(self):
        presets: dict[int, str] = {}
        extents: dict[int, tuple] = {}
        counts = {"geographic 2D": 0, "geographic 3D": 0, "geocentric": 0,
                  "projected": 0, "dropped": 0}
        for code, g in self.geod_crs.items():
            # deprecated codes stay resolvable (the classic init files
            # carried them and the reference test suites use some)
            typ = g[4]
            base = self.base_fragment(code)
            if base is None:
                counts["dropped"] += 1
                continue
            if typ == "geocentric":
                presets[code] = f"proj=geocent {base} units=m no_defs"
                counts["geocentric"] += 1
            elif typ in ("geographic 2D", "geographic 3D"):
                presets[code] = f"proj=longlat {base} no_defs"
                counts[typ] += 1
            else:
                continue
            bb = self.bbox("geodetic_crs", code)
            if bb:
                extents[code] = bb
        for code, pc in self.proj_crs.items():
            # ('EPSG',code,name,desc,'EPSG',cs,'EPSG',geod,'EPSG',conv,text,dep)
            if pc[7] is not None and pc[9] is None \
                    and isinstance(pc[10], str) and "PROJCS" in pc[10]:
                # ESRI inline WKT definition (conversion ref is NULL)
                got = self.esri_wkt_fragment(pc[10])
                base = self.base_fragment(_k(pc[6], pc[7]))
                if got is None or base is None:
                    counts["dropped"] += 1
                    continue
                frag, unitf = got
                presets[code] = f"{frag} {base} {unitf} no_defs"
                counts["projected"] += 1
                bb = self.bbox("projected_crs", code)
                if bb:
                    extents[code] = bb
                continue
            if pc[5] is None or pc[7] is None or pc[9] is None:
                counts["dropped"] += 1
                continue
            cs_code = _k(pc[4], pc[5])
            geod_code = _k(pc[6], pc[7])
            conv_code = _k(pc[8], pc[9])
            conv = self.conversion.get(conv_code)
            if conv is None:
                counts["dropped"] += 1
                continue
            p = self.conv_params(conv[0], conv[1])
            try:
                if conv[0][4] == "EPSG":
                    frag = self.method_fragment(int(conv[0][5]), p)
                else:
                    frag = self.proj_native_fragment(conv[0][5], p)
            except KeyError:
                frag = None
            base = self.base_fragment(geod_code)
            unitf = self.units_fragment(cs_code)
            if frag is None or base is None or unitf is None:
                counts["dropped"] += 1
                continue
            presets[code] = f"{frag} {base} {unitf} no_defs"
            counts["projected"] += 1
            bb = self.bbox("projected_crs", code)
            if bb:
                extents[code] = bb
        # coordinate-operation candidates per (src, tgt) geographic pair
        transforms: dict[tuple, list] = {}
        for code, name, method, src, tgt, acc, grid in self.grid_tf:
            bb = self.bbox("grid_transformation", code)
            transforms.setdefault((src, tgt), []).append(
                (code, name, "grid", grid, acc, bb))
        u = self.units
        for code, name, method, src, tgt, acc, v in self.helmert_all:
            bb = self.bbox("helmert_transformation", code)
            tx = u.length_m(v[12], int(v[16]))
            ty = u.length_m(v[13], int(v[16]))
            tz = u.length_m(v[14], int(v[16]))
            if v[17] is None:
                payload = (tx, ty, tz)
            else:
                rx = u.rot_arcsec(v[17], int(v[21]))
                ry = u.rot_arcsec(v[18], int(v[21]))
                rz = u.rot_arcsec(v[19], int(v[21]))
                ds = (v[22] * u.factor[int(v[24])] * 1e6
                      if v[22] is not None else 0.0)
                if method in (9607, 1032):  # Coordinate Frame -> PV
                    rx, ry, rz = -rx, -ry, -rz
                payload = (tx, ty, tz, round(rx, 12), round(ry, 12),
                           round(rz, 12), round(ds, 12))
            transforms.setdefault((src, tgt), []).append(
                (code, name, "helmert", payload, acc, bb))

        # vertical CRS presets: per vertical code, its axis fragment
        # (orientation + unit) and accuracy-ranked geoid-model
        # candidates (src geographic-3D CRS, grid file — remapped
        # through grid_alternatives to the proj.4-era name, accuracy,
        # area-of-use bbox)
        geoid_by_vert: dict[object, list] = {}
        for code, name, src, tgt, acc, grid in self.geoid_tf:
            vert = tgt
            if tgt in self.compound_crs:   # method 9635 targets compound
                cc = self.compound_crs[tgt]
                vert = _k(cc[6], cc[7])
            if vert not in self.vert_crs:
                continue
            bb = self.bbox("grid_transformation", code)
            geoid_by_vert.setdefault(vert, []).append(
                (acc, src, self.grid_alias.get(grid, grid), bb))
        vert_presets: dict[object, tuple] = {}
        for code, v in self.vert_crs.items():
            cs_code = _k(v[4], v[5])
            ax = self.axis.get(cs_code)
            if not ax:
                counts["dropped"] += 1
                continue
            _order, orientation, uom = ax[0]
            frag_parts = []
            if orientation == "down":
                frag_parts.append("axis=end")
            if uom == 9002:
                frag_parts.append("vunits=ft")
            elif uom == 9003:
                frag_parts.append("vunits=us-ft")
            elif uom is not None and uom != 9001:
                frag_parts.append(f"vto_meter={fmt(self.units.factor[uom])}")
            cands = sorted(geoid_by_vert.get(code, ()),
                           key=lambda t: (t[0], str(t[2])))
            vert_presets[code] = (v[2], " ".join(frag_parts),
                                  tuple((s, g, a, bb)
                                        for a, s, g, bb in cands))
            bb = self.bbox("vertical_crs", code)
            if bb:
                extents[code] = bb
        compound_presets: dict[object, tuple] = {}
        for code, v in self.compound_crs.items():
            horiz, vert = _k(v[4], v[5]), _k(v[6], v[7])
            if horiz not in presets or vert not in vert_presets:
                counts["dropped"] += 1
                continue
            compound_presets[code] = (v[2], horiz, vert)
            bb = self.bbox("compound_crs", code)
            if bb:
                extents[code] = bb
        # vertical-to-vertical candidates per (src_vert, dst_vert)
        vert_transforms: dict[tuple, list] = {}
        for code, name, kind, src, tgt, acc, payload in self.vert_tf:
            if kind == "vgrid":
                payload = self.grid_alias.get(payload, payload)
            bb = self.bbox("grid_transformation" if kind == "vgrid"
                           else "other_transformation", code)
            vert_transforms.setdefault((src, tgt), []).append(
                (code, name, kind, payload, acc, bb))
        counts["vertical"] = len(vert_presets)
        counts["compound"] = len(compound_presets)
        counts["vert_transforms"] = sum(
            len(v) for v in vert_transforms.values())
        return (presets, extents, transforms, counts, vert_presets,
                compound_presets, vert_transforms)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sql-dir", default=SQL_DIR)
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args(argv)
    tables = load_tables(args.sql_dir)
    cat = Catalog(tables)
    (presets, extents, transforms, counts, vert_presets,
     compound_presets, vert_transforms) = cat.build()
    with open(args.out, "w", encoding="utf-8") as f:
        f.write('"""AUTO-GENERATED by tools/gen_epsg_catalog.py from the\n')
        f.write("reference's public EPSG SQL dataset (data/sql/*.sql) —\n")
        f.write('the classic +init=epsg: expansion.  DO NOT EDIT BY HAND.\n')
        f.write(f'\nCounts: {counts}\n"""\n\n')
        epsg = {c: v for c, v in presets.items() if isinstance(c, int)}
        ignf = {c.split(":", 1)[1]: v for c, v in presets.items()
                if isinstance(c, str) and c.startswith("IGNF:")}
        esri = {int(c.split(":", 1)[1]): v for c, v in presets.items()
                if isinstance(c, str) and c.startswith("ESRI:")}
        f.write("PRESETS: dict[int, str] = {\n")
        for code in sorted(epsg):
            f.write(f"    {code}: {epsg[code]!r},\n")
        f.write("}\n\n")
        f.write("# IGNF authority registry (same compilation, ignf.sql)\n")
        f.write("IGNF_PRESETS: dict[str, str] = {\n")
        for code in sorted(ignf):
            f.write(f"    {code!r}: {ignf[code]!r},\n")
        f.write("}\n\n")
        f.write("# ESRI authority registry (same compilation, esri.sql)\n")
        f.write("ESRI_PRESETS: dict[int, str] = {\n")
        for code in sorted(esri):
            f.write(f"    {code}: {esri[code]!r},\n")
        f.write("}\n\n")
        f.write("# (west, south, east, north) degrees, from usage+extent\n")
        f.write("EXTENTS: dict = {\n")
        for code in sorted(extents, key=lambda c: (isinstance(c, str), c)):
            w, s_, e, n = extents[code]
            f.write(f"    {code!r}: ({w!r}, {s_!r}, {e!r}, {n!r}),\n")
        f.write("}\n\n")
        f.write("# coordinate-operation candidates per (src_crs, tgt_crs):\n")
        f.write("# (epsg_code, name, kind, payload, accuracy, bbox)\n")
        f.write("# kind='grid' -> payload is the grid file; 'helmert' ->\n")
        f.write("# payload is (tx,ty,tz[,rx,ry,rz,ds]) position-vector\n")
        f.write("TRANSFORMS: dict[tuple, list] = {\n")
        for key in sorted(transforms, key=repr):
            f.write(f"    {key!r}: {transforms[key]!r},\n")
        f.write("}\n\n")
        f.write("# vertical CRS registry: code -> (name, axis/unit\n")
        f.write("# fragment, geoid-model candidates sorted most-precise\n")
        f.write("# first: (src_geog3d_crs, grid, accuracy_m, bbox)) —\n")
        f.write("# compiled from vertical_crs.sql + the Geographic3D->\n")
        f.write("# GravityRelatedHeight rows of grid_transformation.sql,\n")
        f.write("# grid names remapped via grid_alternatives.sql\n")
        f.write("VERT_PRESETS: dict = {\n")
        for key in sorted(vert_presets, key=lambda c: (isinstance(c, str), c)):
            f.write(f"    {key!r}: {vert_presets[key]!r},\n")
        f.write("}\n\n")
        f.write("# compound CRS registry: code -> (name, horizontal CRS\n")
        f.write("# code, vertical CRS code), from compound_crs.sql\n")
        f.write("COMPOUND_PRESETS: dict = {\n")
        for key in sorted(compound_presets,
                          key=lambda c: (isinstance(c, str), c)):
            f.write(f"    {key!r}: {compound_presets[key]!r},\n")
        f.write("}\n\n")
        f.write("# vertical-to-vertical operation candidates per\n")
        f.write("# (src_vert, dst_vert): (code, name, kind, payload,\n")
        f.write("# accuracy, bbox); kind='vgrid' -> payload is a shift\n")
        f.write("# grid (VERTCON etc.), 'voffset' -> constant dz metres\n")
        f.write("VERT_TRANSFORMS: dict[tuple, list] = {\n")
        for key in sorted(vert_transforms, key=repr):
            f.write(f"    {key!r}: {vert_transforms[key]!r},\n")
        f.write("}\n")
    n_ignf = sum(1 for c in presets
                 if isinstance(c, str) and c.startswith("IGNF:"))
    n_esri = sum(1 for c in presets
                 if isinstance(c, str) and c.startswith("ESRI:"))
    print(f"wrote {len(presets)} presets ({n_ignf} IGNF, {n_esri} ESRI), "
          f"{sum(len(v) for v in transforms.values())} transforms "
          f"to {args.out}; counts={counts}")


if __name__ == "__main__":
    sys.exit(main())
