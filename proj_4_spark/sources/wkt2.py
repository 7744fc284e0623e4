"""WKT2 (ISO 19162) CRS text ingestion — subset.

Modern CRS text pastes (GEOGCRS / PROJCRS, WKT2-2015/2019) compile to
proj-strings without proj.db, reusing the SAME EPSG conversion-method
mapping the generated catalog is built with
(sources/epsg_methods.method_fragment) — so a WKT2 definition and its
catalog preset produce identical fragments.

Supported subset (the survey's §7.7 WKT scope, narrowed to what the
engine can execute):

- GEOGCRS/GEODCRS: DATUM or ENSEMBLE -> ELLIPSOID[name, a, rf],
  PRIMEM -> +pm, angle unit on the base (degree assumed when absent);
- PROJCRS: BASEGEOGCRS (same extraction) + CONVERSION[METHOD,
  PARAMETER...] + CS axis LENGTHUNIT -> +units/+to_meter;
- METHOD/PARAMETER resolve by ID["EPSG",code] when present, else by
  canonical EPSG name (the reference accepts both,
  src/iso19111/io.cpp WKTParser);
- parameter values convert through the unit factor carried in the WKT
  text itself, with exact paths for degree/grad (matching the
  generator's uom handling — roundtripping degrees through the radian
  factor would corrupt them).

Also supported: VERTCRS (ID-keyed, with a normalized-name fallback
against the generated VERT_PRESETS), COMPOUNDCRS (horizontal +
vertical members), and BOUNDCRS (SOURCECRS + ABRIDGEDTRANSFORMATION
-> +towgs84 on the source CRS, io.cpp:4406 buildBoundCRS — the shape
gdalsrsinfo exports for any towgs84-bearing CRS).

Out of scope (raise ValueError): DERIVEDPROJCRS, WKT1 (see
sources/esri_wkt1.py for the ESRI WKT1 reader).

References: WKTParser grammar src/iso19111/io.cpp:1103+; test strings
test/unit/test_io.cpp (wkt2_2019 / wkt2_2019_simplified cases).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from proj_4_spark.kernels.ellipsoid import ELLPS_TABLE
from proj_4_spark.sources.epsg_methods import fmt, method_fragment

# ---------------------------------------------------------------------------
# tokenizer / parser
# ---------------------------------------------------------------------------


@dataclass
class Node:
    kw: str
    args: list = field(default_factory=list)

    def first(self, *kws):
        for a in self.args:
            if isinstance(a, Node) and a.kw.upper() in kws:
                return a
        return None

    def all(self, *kws):
        return [a for a in self.args
                if isinstance(a, Node) and a.kw.upper() in kws]


def _tokenize(text: str):
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace() or c == ",":
            i += 1
            continue
        if c in "[]()":
            yield c
            i += 1
            continue
        if c == '"':
            j = i + 1
            buf = []
            while j < n:
                if text[j] == '"':
                    if j + 1 < n and text[j + 1] == '"':
                        buf.append('"')
                        j += 2
                        continue
                    break
                buf.append(text[j])
                j += 1
            yield ("str", "".join(buf))
            i = j + 1
            continue
        j = i
        while j < n and text[j] not in '[](),"' and not text[j].isspace():
            j += 1
        tok = text[i:j]
        try:
            yield ("num", float(tok))
        except ValueError:
            yield ("word", tok)
        i = j


def parse_wkt(text: str) -> Node:
    toks = list(_tokenize(text))
    pos = 0

    def parse_value():
        nonlocal pos
        t = toks[pos]
        if isinstance(t, tuple) and t[0] == "word" and pos + 1 < len(toks) \
                and toks[pos + 1] in ("[", "("):
            kw = t[1]
            pos += 2
            node = Node(kw)
            while toks[pos] not in ("]", ")"):
                node.args.append(parse_value())
            pos += 1
            return node
        pos += 1
        if isinstance(t, tuple):
            return t[1]
        raise ValueError(f"unexpected token {t!r} in WKT")

    root = parse_value()
    if pos != len(toks):
        raise ValueError("trailing tokens after WKT root node")
    if not isinstance(root, Node):
        raise ValueError("WKT root is not a node")
    return root


# ---------------------------------------------------------------------------
# EPSG name tables (canonical names, io.cpp WKTParser accepts either
# the name or the ID node; codes per conversion.sql)
# ---------------------------------------------------------------------------

METHOD_NAME_TO_CODE = {
    "transverse mercator": 9807,
    "transverse mercator (south orientated)": 9808,
    "lambert conic conformal (1sp)": 9801,
    "lambert conic conformal (2sp)": 9802,
    "lambert conic conformal (2sp michigan)": 1051,
    "mercator (variant a)": 9804,
    "mercator (variant b)": 9805,
    "popular visualisation pseudo mercator": 1024,
    "cassini-soldner": 9806,
    "oblique stereographic": 9809,
    "polar stereographic (variant a)": 9810,
    "polar stereographic (variant b)": 9829,
    "hotine oblique mercator (variant a)": 9812,
    "hotine oblique mercator (variant b)": 9815,
    "american polyconic": 9818,
    "krovak": 1041,
    "krovak (north orientated)": 9819,
    "lambert azimuthal equal area": 9820,
    "lambert azimuthal equal area (spherical)": 9821,
    "albers equal area": 9822,
    "equal earth": 1078,
    "equidistant cylindrical": 1028,
    "equidistant cylindrical (spherical)": 1029,
    "lambert cylindrical equal area": 9835,
    "lambert cylindrical equal area (spherical)": 9834,
    "new zealand map grid": 9811,
    "modified azimuthal equidistant": 9832,
    "guam projection": 9831,
    "colombia urban": 1052,
    "bonne": 9827,
    "lambert conic near-conformal": 9817,
}

PARAM_NAME_TO_CODE = {
    "latitude of natural origin": 8801,
    "longitude of natural origin": 8802,
    "scale factor at natural origin": 8805,
    "false easting": 8806,
    "false northing": 8807,
    "latitude of projection centre": 8811,
    "longitude of projection centre": 8812,
    "azimuth of initial line": 8813,
    "azimuth at projection centre": 8813,
    "angle from rectified to skew grid": 8814,
    "scale factor on initial line": 8815,
    "scale factor at projection centre": 8815,
    "easting at projection centre": 8816,
    "northing at projection centre": 8817,
    "scale factor on pseudo standard parallel": 8819,
    "latitude of false origin": 8821,
    "longitude of false origin": 8822,
    "latitude of 1st standard parallel": 8823,
    "latitude of 2nd standard parallel": 8824,
    "easting at false origin": 8826,
    "northing at false origin": 8827,
    "latitude of standard parallel": 8832,
    "longitude of origin": 8833,
    "co-latitude of cone axis": 1036,
    "ellipsoid scaling factor": 1038,
    "projection plane origin height": 1039,
}

# parameter kind per code (drives default-unit handling)
_ANGLE_CODES = {8801, 8802, 8811, 8812, 8813, 8814, 8821, 8822, 8823,
                8824, 8832, 8833, 1036}
_SCALE_CODES = {8805, 8815, 8819, 1038}

_DEG = math.pi / 180.0


def _angle_value(value: float, factor: float | None) -> float:
    """WKT angle value -> degrees, with exact degree/grad paths (the
    radian-factor roundtrip corrupts integral degrees)."""
    # the conventional WKT degree factor 0.0174532925199433 is a
    # 15-digit rounding of pi/180 — treat anything within 1e-16 as the
    # exact degree unit (routing through the rounded factor would turn
    # 49 into 49.000000000000014)
    if factor is None or abs(factor - _DEG) < 1e-16:
        return value
    if abs(factor - math.pi / 200.0) < 1e-16:  # grad
        return value * 0.9
    return value * factor * 180.0 / math.pi


def _unit_factor(node: Node | None) -> float | None:
    if node is None:
        return None
    nums = [a for a in node.args if isinstance(a, float)]
    return nums[0] if nums else None


def _id_code(node: Node) -> int | None:
    idn = node.first("ID", "AUTHORITY")
    if idn is None:
        return None
    args = [a for a in idn.args if not isinstance(a, Node)]
    if len(args) >= 2 and str(args[0]).upper() == "EPSG":
        try:
            return int(float(str(args[1])))
        except ValueError:
            return None
    return None


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def _ellps_fragment_from(ell: Node) -> str:
    vals = [a for a in ell.args if isinstance(a, float)]
    if len(vals) < 2:
        raise ValueError("ELLIPSOID needs semi-major axis and 1/f")
    a, rf = vals[0], vals[1]
    lu = _unit_factor(ell.first("LENGTHUNIT", "UNIT"))
    if lu is not None and lu != 1.0:
        a *= lu
    # prefer the named registry entry when (a, 1/f) matches exactly —
    # b-defined entries (clrk66 etc.) compare by their effective
    # inverse flattening a/(a-b), the same expression the writer uses
    for name, spec in ELLPS_TABLE.items():
        if spec.get("a") != a:
            continue
        if "rf" in spec:
            erf = spec["rf"]
        else:
            b = spec["b"]
            erf = 0.0 if b == a else a / (a - b)
        if erf == rf:
            return f"ellps={name}"
    if rf == 0.0:
        return f"a={fmt(a)} b={fmt(a)}"
    return f"a={fmt(a)} rf={fmt(rf)}"


def _base_fragments(crs: Node) -> list[str]:
    datum = crs.first("DATUM", "TRF", "GEODETICDATUM", "ENSEMBLE")
    if datum is None:
        raise ValueError("GEOGCRS without DATUM/ENSEMBLE")
    ell = datum.first("ELLIPSOID", "SPHEROID")
    if ell is None:
        raise ValueError("DATUM without ELLIPSOID")
    frags = [_ellps_fragment_from(ell)]
    pm = crs.first("PRIMEM", "PRIMEMERIDIAN")
    if pm is not None:
        vals = [a for a in pm.args if isinstance(a, float)]
        if vals:
            lon = _angle_value(vals[0],
                               _unit_factor(pm.first("ANGLEUNIT", "UNIT")))
            if lon != 0.0:
                frags.append(f"pm={fmt(lon)}")
    return frags


def _pm_degrees(p: dict) -> float:
    """Resolve a +pm token — numeric degrees or a NAMED meridian
    (``pm=paris`` etc., src/datums.cpp pj_prime_meridians) — to decimal
    degrees via the same table the proj-string reader uses.  Shared by
    the WKT2 and PROJJSON writers so named meridians round-trip instead
    of crashing float()."""
    raw = p.get("pm", 0.0) or 0.0
    try:
        return float(raw)
    except (TypeError, ValueError):
        from proj_4_spark.engine.projstring import prime_meridian_rad
        return prime_meridian_rad(str(raw)) * 180.0 / math.pi


def _conversion_params(conv: Node) -> tuple[int, dict]:
    meth = conv.first("METHOD", "PROJECTION")
    if meth is None:
        raise ValueError("CONVERSION without METHOD")
    code = _id_code(meth)
    if code is None:
        names = [a for a in meth.args if isinstance(a, str)]
        code = METHOD_NAME_TO_CODE.get(names[0].lower()) if names else None
    if code is None:
        raise ValueError(f"unsupported WKT2 method {meth.args[:1]}")
    p: dict[int, float] = {}
    for par in conv.all("PARAMETER"):
        pcode = _id_code(par)
        if pcode is None:
            names = [a for a in par.args if isinstance(a, str)]
            pcode = PARAM_NAME_TO_CODE.get(names[0].lower()) if names else None
        if pcode is None:
            continue  # unknown parameter: skip (io.cpp warns similarly)
        vals = [a for a in par.args if isinstance(a, float)]
        if not vals:
            continue
        v = vals[0]
        if pcode in _ANGLE_CODES:
            v = _angle_value(v, _unit_factor(
                par.first("ANGLEUNIT", "UNIT")))
        elif pcode in _SCALE_CODES:
            f = _unit_factor(par.first("SCALEUNIT", "UNIT"))
            v = v * f if f not in (None, 1.0) else v
        else:
            f = _unit_factor(par.first("LENGTHUNIT", "UNIT"))
            v = v * f if f not in (None, 1.0) else v
        p[pcode] = v
    return code, p


def _units_fragment_from(crs: Node) -> str:
    """+units from the CS axis length unit (PROJCRS level)."""
    factor = None
    cs = crs.first("CS")
    for scope in ([cs] if cs is not None else []) + [crs] + \
            (crs.all("AXIS") or []):
        if scope is None:
            continue
        u = scope.first("LENGTHUNIT", "UNIT")
        if u is not None:
            factor = _unit_factor(u)
            break
    if factor is None:
        for ax in crs.all("AXIS"):
            u = ax.first("LENGTHUNIT", "UNIT")
            if u is not None:
                factor = _unit_factor(u)
                break
    if factor is None or factor == 1.0:
        return "units=m"
    if abs(factor - 0.3048) < 1e-15:
        return "units=ft"
    if abs(factor - 1200.0 / 3937.0) < 1e-15:
        return "units=us-ft"
    return f"to_meter={fmt(factor)}"


def _vertical_fragment_from(vert: Node) -> str:
    """VERTCRS -> the catalog's +geoidgrids/+vunits fragment.  WKT2
    vertical CRS text carries no geoid model, so resolution goes
    through the vertical registry by the node's ID["EPSG",code] —
    the same way the reference resolves a VerticalCRS against proj.db
    before building a vertical transformation."""
    from proj_4_spark.sources.epsg_generated import VERT_PRESETS

    code = _id_code(vert)
    if code is None:
        # name-keyed fallback: real-world WKT2 sometimes omits the ID;
        # the reference resolves vertical datums by name too (WKTParser
        # datum name lookup).  Normalized CRS name first, then the
        # VDATUM name with/without a " height" suffix.
        def norm(s: str) -> str:
            return "".join(ch for ch in s.lower() if ch.isalnum())

        by_name = {norm(v[0]): c for c, v in VERT_PRESETS.items() if v[0]}
        names = [a for a in vert.args if isinstance(a, str)][:1]
        vd = vert.first("VDATUM", "VERTICALDATUM", "VRF")
        if vd is not None:
            dn = [a for a in vd.args if isinstance(a, str)][:1]
            for d in dn:
                names.append(d)
                names.append(d + " height")
                if d.lower().endswith(" geoid"):
                    names.append(d[: -len(" geoid")] + " height")
        for cand in names:
            code = by_name.get(norm(cand))
            if code is not None:
                break
        if code is None:
            raise ValueError(
                f"VERTCRS {names[:1]} has no ID[\"EPSG\",...] and its "
                "name matches no generated vertical preset")
    if code not in VERT_PRESETS:
        raise ValueError(f"vertical CRS EPSG:{code} not in the generated "
                         "registry")
    from proj_4_spark.sources.initfiles import vertical_fragment

    return vertical_fragment(code)


def wkt2_to_projstring(text: str) -> str:
    """Compile a WKT2 GEOGCRS/PROJCRS/COMPOUNDCRS/BOUNDCRS string to a
    proj-string."""
    root = parse_wkt(text)
    return _node_to_projstring(root)


# ABRIDGEDTRANSFORMATION parameter slots (EPSG parameter codes 8605-8611)
_ABRIDGED_SLOTS = {8605: 0, 8606: 1, 8607: 2, 8608: 3, 8609: 4,
                   8610: 5, 8611: 6}
_ABRIDGED_NAMES = {"x-axis translation": 0, "y-axis translation": 1,
                   "z-axis translation": 2, "x-axis rotation": 3,
                   "y-axis rotation": 4, "z-axis rotation": 5,
                   "scale difference": 6}


def _boundcrs_to_projstring(root: Node) -> str:
    """BOUNDCRS[SOURCECRS, TARGETCRS[WGS84], ABRIDGEDTRANSFORMATION]
    -> the source CRS fragments + towgs84 — the most common WKT2 shape
    a user pastes from gdalsrsinfo (GDAL exports any towgs84-bearing
    CRS this way).

    Reference: WKTParser::Private::buildBoundCRS
    (src/iso19111/io.cpp:4406) + Transformation::getTOWGS84Parameters
    (src/iso19111/coordinateoperation.cpp:6706): abridged parameter
    values are unitless metres / arc-seconds, Scale difference is
    (value - 1) * 1e6 ppm (convertFromAbridged,
    coordinateoperation.cpp:1294-1345), and Coordinate Frame rotations
    flip sign into the position-vector towgs84 convention."""
    src = root.first("SOURCECRS")
    ab = root.first("ABRIDGEDTRANSFORMATION")
    if src is None or ab is None:
        raise ValueError("BOUNDCRS needs SOURCECRS and "
                         "ABRIDGEDTRANSFORMATION")
    inner = next((a for a in src.args if isinstance(a, Node)), None)
    if inner is None:
        raise ValueError("SOURCECRS without a CRS node")
    frag = _node_to_projstring(inner)

    meth = ab.first("METHOD")
    if meth is None:
        raise ValueError("ABRIDGEDTRANSFORMATION without METHOD")
    mname = next((a for a in meth.args if isinstance(a, str)), "").lower()
    mcode = _id_code(meth)
    if "ntv2" in mname or mcode == 9615:
        pf = ab.first("PARAMETERFILE")
        if pf is None:
            raise ValueError("NTv2 BOUNDCRS without PARAMETERFILE")
        grid = [a for a in pf.args if isinstance(a, str)]
        if len(grid) < 2:
            raise ValueError("PARAMETERFILE needs a file name")
        extra = f"nadgrids={grid[1]}"
        if frag.endswith(" no_defs"):
            return frag[: -len(" no_defs")] + f" {extra} no_defs"
        return f"{frag} {extra}"
    if "coordinate frame" in mname or mcode in (1032, 1038, 9607):
        invert_rot = True
    elif "position vector" in mname or mcode in (1033, 1037, 9606):
        invert_rot = False
    elif "geocentric translations" in mname or mcode in (1031, 1035, 9603):
        invert_rot = False
    else:
        raise ValueError(f"unsupported BOUNDCRS method {mname!r} "
                         f"(EPSG:{mcode})")

    vals = [0.0] * 7
    for prm in ab.all("PARAMETER"):
        pname = next((a for a in prm.args if isinstance(a, str)), "")
        value = next((a for a in prm.args
                      if isinstance(a, (int, float))), None)
        if value is None:
            continue
        slot = _ABRIDGED_SLOTS.get(_id_code(prm))
        if slot is None:
            slot = _ABRIDGED_NAMES.get(pname.lower())
        if slot is None:
            raise ValueError(
                f"unsupported ABRIDGEDTRANSFORMATION parameter {pname!r}")
        if slot == 6:
            value = (value - 1.0) * 1e6
        vals[slot] = float(value)
    if invert_rot:
        for i_ in (3, 4, 5):
            vals[i_] = -vals[i_] if vals[i_] != 0.0 else 0.0
    towgs84 = "towgs84=" + ",".join(fmt(v) for v in vals)
    if frag.endswith(" no_defs"):
        return frag[: -len(" no_defs")] + f" {towgs84} no_defs"
    return f"{frag} {towgs84}"


def _node_to_projstring(root: Node) -> str:
    kw = root.kw.upper()
    if kw in ("GEOGCRS", "GEODCRS", "GEOGRAPHICCRS", "GEODETICCRS"):
        return " ".join(["proj=longlat"] + _base_fragments(root)
                        + ["no_defs"])
    if kw == "COMPOUNDCRS":
        parts = [a for a in root.args if isinstance(a, Node)
                 and a.kw.upper() in ("GEOGCRS", "GEODCRS", "PROJCRS",
                                      "VERTCRS", "VERTICALCRS")]
        horiz = [p for p in parts if p.kw.upper() not in
                 ("VERTCRS", "VERTICALCRS")]
        vert = [p for p in parts if p.kw.upper() in
                ("VERTCRS", "VERTICALCRS")]
        if len(horiz) != 1 or len(vert) != 1:
            raise ValueError("COMPOUNDCRS needs one horizontal and one "
                             "vertical component")
        hfrag = _node_to_projstring(horiz[0])
        vfrag = _vertical_fragment_from(vert[0])
        if not vfrag:
            return hfrag
        if hfrag.endswith(" no_defs"):
            return hfrag[: -len(" no_defs")] + f" {vfrag} no_defs"
        return f"{hfrag} {vfrag}"
    if kw == "BOUNDCRS":
        return _boundcrs_to_projstring(root)
    if kw != "PROJCRS" and kw != "PROJECTEDCRS":
        raise ValueError(f"unsupported WKT2 root {root.kw!r} "
                         "(subset: GEOGCRS/PROJCRS/COMPOUNDCRS/"
                         "BOUNDCRS)")
    base = root.first("BASEGEOGCRS", "BASEGEODCRS")
    if base is None:
        raise ValueError("PROJCRS without BASEGEOGCRS")
    conv = root.first("CONVERSION")
    if conv is None:
        raise ValueError("PROJCRS without CONVERSION")
    code, p = _conversion_params(conv)

    def A(prm, c, default=None):
        return prm.get(c, default)

    def L(prm, c, default=0.0):
        return prm.get(c, default)

    def K(prm, c, default=1.0):
        return prm.get(c, default)

    frag = method_fragment(code, p, A, L, K)
    if frag is None:
        raise ValueError(f"unsupported EPSG method {code}")
    return " ".join([frag] + _base_fragments(base)
                    + [_units_fragment_from(root), "no_defs"])


# ---------------------------------------------------------------------------
# writer (for round-trip testing and interchange): proj-string preset ->
# WKT2-2019 text for the same supported method subset
# ---------------------------------------------------------------------------

_WKT_METHODS = {
    # proj name -> (method code, method name,
    #               [(param code, param name, proj key, kind, default)])
    "tmerc": (9807, "Transverse Mercator", [
        (8801, "Latitude of natural origin", "lat_0", "A", 0.0),
        (8802, "Longitude of natural origin", "lon_0", "A", 0.0),
        (8805, "Scale factor at natural origin", "k", "K", 1.0),
        (8806, "False easting", "x_0", "L", 0.0),
        (8807, "False northing", "y_0", "L", 0.0)]),
    "lcc2": (9802, "Lambert Conic Conformal (2SP)", [
        (8821, "Latitude of false origin", "lat_0", "A", 0.0),
        (8822, "Longitude of false origin", "lon_0", "A", 0.0),
        (8823, "Latitude of 1st standard parallel", "lat_1", "A", 0.0),
        (8824, "Latitude of 2nd standard parallel", "lat_2", "A", 0.0),
        (8826, "Easting at false origin", "x_0", "L", 0.0),
        (8827, "Northing at false origin", "y_0", "L", 0.0)]),
    "lcc2m": (1051, "Lambert Conic Conformal (2SP Michigan)", [
        (8821, "Latitude of false origin", "lat_0", "A", 0.0),
        (8822, "Longitude of false origin", "lon_0", "A", 0.0),
        (8823, "Latitude of 1st standard parallel", "lat_1", "A", 0.0),
        (8824, "Latitude of 2nd standard parallel", "lat_2", "A", 0.0),
        (8826, "Easting at false origin", "x_0", "L", 0.0),
        (8827, "Northing at false origin", "y_0", "L", 0.0),
        (1038, "Ellipsoid scaling factor", "k_0", "K", 1.0)]),
    "lcc1": (9801, "Lambert Conic Conformal (1SP)", [
        (8801, "Latitude of natural origin", "lat_0", "A", 0.0),
        (8802, "Longitude of natural origin", "lon_0", "A", 0.0),
        (8805, "Scale factor at natural origin", "k_0", "K", 1.0),
        (8806, "False easting", "x_0", "L", 0.0),
        (8807, "False northing", "y_0", "L", 0.0)]),
    "merc_a": (9804, "Mercator (variant A)", [
        (8802, "Longitude of natural origin", "lon_0", "A", 0.0),
        (8805, "Scale factor at natural origin", "k", "K", 1.0),
        (8806, "False easting", "x_0", "L", 0.0),
        (8807, "False northing", "y_0", "L", 0.0)]),
    "merc_b": (9805, "Mercator (variant B)", [
        (8823, "Latitude of 1st standard parallel", "lat_ts", "A", 0.0),
        (8802, "Longitude of natural origin", "lon_0", "A", 0.0),
        (8806, "False easting", "x_0", "L", 0.0),
        (8807, "False northing", "y_0", "L", 0.0)]),
    "webmerc": (1024, "Popular Visualisation Pseudo Mercator", [
        (8802, "Longitude of natural origin", "lon_0", "A", 0.0),
        (8806, "False easting", "x_0", "L", 0.0),
        (8807, "False northing", "y_0", "L", 0.0)]),
    "cass": (9806, "Cassini-Soldner", [
        (8801, "Latitude of natural origin", "lat_0", "A", 0.0),
        (8802, "Longitude of natural origin", "lon_0", "A", 0.0),
        (8806, "False easting", "x_0", "L", 0.0),
        (8807, "False northing", "y_0", "L", 0.0)]),
    "sterea": (9809, "Oblique Stereographic", [
        (8801, "Latitude of natural origin", "lat_0", "A", 0.0),
        (8802, "Longitude of natural origin", "lon_0", "A", 0.0),
        (8805, "Scale factor at natural origin", "k", "K", 1.0),
        (8806, "False easting", "x_0", "L", 0.0),
        (8807, "False northing", "y_0", "L", 0.0)]),
    "laea": (9820, "Lambert Azimuthal Equal Area", [
        (8801, "Latitude of natural origin", "lat_0", "A", 0.0),
        (8802, "Longitude of natural origin", "lon_0", "A", 0.0),
        (8806, "False easting", "x_0", "L", 0.0),
        (8807, "False northing", "y_0", "L", 0.0)]),
    "aea": (9822, "Albers Equal Area", [
        (8821, "Latitude of false origin", "lat_0", "A", 0.0),
        (8822, "Longitude of false origin", "lon_0", "A", 0.0),
        (8823, "Latitude of 1st standard parallel", "lat_1", "A", 0.0),
        (8824, "Latitude of 2nd standard parallel", "lat_2", "A", 0.0),
        (8826, "Easting at false origin", "x_0", "L", 0.0),
        (8827, "Northing at false origin", "y_0", "L", 0.0)]),
    "poly": (9818, "American Polyconic", [
        (8801, "Latitude of natural origin", "lat_0", "A", 0.0),
        (8802, "Longitude of natural origin", "lon_0", "A", 0.0),
        (8806, "False easting", "x_0", "L", 0.0),
        (8807, "False northing", "y_0", "L", 0.0)]),
    "eqearth": (1078, "Equal Earth", [
        (8802, "Longitude of natural origin", "lon_0", "A", 0.0),
        (8806, "False easting", "x_0", "L", 0.0),
        (8807, "False northing", "y_0", "L", 0.0)]),
    "eqc": (1028, "Equidistant Cylindrical", [
        (8823, "Latitude of 1st standard parallel", "lat_ts", "A", 0.0),
        (8802, "Longitude of natural origin", "lon_0", "A", 0.0),
        (8806, "False easting", "x_0", "L", 0.0),
        (8807, "False northing", "y_0", "L", 0.0)]),
    "cea": (9835, "Lambert Cylindrical Equal Area", [
        (8823, "Latitude of 1st standard parallel", "lat_ts", "A", 0.0),
        (8802, "Longitude of natural origin", "lon_0", "A", 0.0),
        (8806, "False easting", "x_0", "L", 0.0),
        (8807, "False northing", "y_0", "L", 0.0)]),
    "bonne": (9827, "Bonne", [
        (8801, "Latitude of natural origin", "lat_1", "A", 0.0),
        (8802, "Longitude of natural origin", "lon_0", "A", 0.0),
        (8806, "False easting", "x_0", "L", 0.0),
        (8807, "False northing", "y_0", "L", 0.0)]),
    "aeqd": (9832, "Modified Azimuthal Equidistant", [
        (8801, "Latitude of natural origin", "lat_0", "A", 0.0),
        (8802, "Longitude of natural origin", "lon_0", "A", 0.0),
        (8806, "False easting", "x_0", "L", 0.0),
        (8807, "False northing", "y_0", "L", 0.0)]),
    "somerc": (9815, "Hotine Oblique Mercator (variant B)", [
        (8811, "Latitude of projection centre", "lat_0", "A", 0.0),
        (8812, "Longitude of projection centre", "lon_0", "A", 0.0),
        (8813, "Azimuth at projection centre", "__alpha90", "A", 90.0),
        (8814, "Angle from Rectified to Skew Grid", "__gamma90", "A", 90.0),
        (8815, "Scale factor at projection centre", "k_0", "K", 1.0),
        (8816, "Easting at projection centre", "x_0", "L", 0.0),
        (8817, "Northing at projection centre", "y_0", "L", 0.0)]),
    "krovak": (9819, "Krovak (North Orientated)", [
        (8811, "Latitude of projection centre", "lat_0", "A", 0.0),
        (8833, "Longitude of origin", "lon_0", "A", 0.0),
        (1036, "Co-latitude of cone axis", "alpha", "A", 0.0),
        (8819, "Scale factor on pseudo standard parallel", "k", "K", 1.0),
        (8806, "False easting", "x_0", "L", 0.0),
        (8807, "False northing", "y_0", "L", 0.0)]),
    "guam": (9831, "Guam Projection", [
        (8801, "Latitude of natural origin", "lat_0", "A", 0.0),
        (8802, "Longitude of natural origin", "lon_0", "A", 0.0),
        (8806, "False easting", "x_0", "L", 0.0),
        (8807, "False northing", "y_0", "L", 0.0)]),
    "nzmg": (9811, "New Zealand Map Grid", [
        (8801, "Latitude of natural origin", "lat_0", "A", 0.0),
        (8802, "Longitude of natural origin", "lon_0", "A", 0.0),
        (8806, "False easting", "x_0", "L", 0.0),
        (8807, "False northing", "y_0", "L", 0.0)]),
}

_UNIT_WKT = {
    "m": ("metre", 1.0),
    "ft": ("foot", 0.3048),
    "us-ft": ("US survey foot", 1200.0 / 3937.0),
}


def _parse_projstring_tokens(projstring: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for tok in projstring.replace("+", " ").split():
        if "=" in tok:
            k, v = tok.split("=", 1)
            out[k] = v
        else:
            out[tok] = ""
    return out


def _wkt_family(params: dict[str, str]) -> tuple[str, dict[str, str]] | None:
    name = params.get("proj")
    p = dict(params)
    if name == "utm":
        zone = int(p["zone"])
        p["lat_0"] = "0"
        p["lon_0"] = str(zone * 6 - 183)
        p["k"] = "0.9996"
        p["x_0"] = "500000"
        p["y_0"] = "10000000" if "south" in p else "0"
        return "tmerc", p
    if name == "tmerc" and "axis" not in p:
        return "tmerc", p
    if name == "lcc" and "axis" not in p:
        if "lat_2" in p:
            return ("lcc2m" if "k_0" in p else "lcc2"), p
        return "lcc1", p
    if name == "merc":
        return ("merc_b" if "lat_ts" in p else "merc_a"), p
    if name == "aeqd":
        return ("guam" if "guam" in p else "aeqd"), p
    if name in ("webmerc", "cass", "sterea", "poly", "eqearth", "bonne",
                "nzmg", "somerc"):
        return name, p
    if name == "krovak" and p.get("axis") == "swu":
        return "krovak", p
    if name == "laea" and "R_A" not in p:
        return "laea", p
    if name == "aea":
        return "aea", p
    if name == "eqc" and "R_A" not in p:
        return "eqc", p
    if name == "cea" and "R_A" not in p:
        return "cea", p
    return None


_WGS84_GEOG_WKT = ('GEOGCRS["WGS 84",DATUM["World Geodetic System '
                   '1984",ELLIPSOID["WGS 84",6378137,298.257223563,'
                   'LENGTHUNIT["metre",1]]],'
                   'UNIT["degree",0.0174532925199433]]')


def _bound_wkt(core: str, p: dict, name: str) -> str:
    """Wrap datum-bearing presets in BOUNDCRS — the writer must not
    silently DROP +towgs84/+nadgrids (the reader converts back).
    Note the ABRIDGED convention stores Scale difference as
    1 + ppm*1e-6, which round-trips the ppm value to ~1e-10 relative
    (inherent to the WKT2 abridged form; PROJ has the same artifact)."""
    tw = p.get("towgs84")
    ng = p.get("nadgrids")
    if not tw and not ng:
        return core
    if ng:
        tr = (f'ABRIDGEDTRANSFORMATION["{name} to WGS84",'
              'METHOD["NTv2",ID["EPSG",9615]],'
              'PARAMETERFILE["Latitude and longitude difference file",'
              f'"{ng}"]]')
    else:
        vals = [float(x) for x in str(tw).split(",")]
        while len(vals) < 7:
            vals.append(0.0)
        pnames = ["X-axis translation", "Y-axis translation",
                  "Z-axis translation", "X-axis rotation",
                  "Y-axis rotation", "Z-axis rotation"]
        parts = [f'PARAMETER["{n}",{fmt(v)}]'
                 for n, v in zip(pnames, vals[:6])]
        parts.append(f'PARAMETER["Scale difference",'
                     f'{fmt(1.0 + vals[6] * 1e-6)}]')
        tr = (f'ABRIDGEDTRANSFORMATION["{name} to WGS84",'
              'METHOD["Position Vector transformation '
              '(geog2D domain)",ID["EPSG",9606]],'
              + ",".join(parts) + "]")
    return (f"BOUNDCRS[SOURCECRS[{core}],"
            f"TARGETCRS[{_WGS84_GEOG_WKT}],{tr}]")


def projstring_to_wkt2(projstring: str, name: str = "unnamed") -> str:
    """WKT2-2019 text for a supported projected/geographic proj-string
    preset (the writer half of the round-trip test: parse(write(x))
    must reproduce x's parameters exactly, INCLUDING the datum shift —
    towgs84/nadgrids presets emit a BOUNDCRS wrapper)."""
    from proj_4_spark.engine.plan import DATUMS

    p = _parse_projstring_tokens(projstring)
    if "datum" in p:
        d = DATUMS.get(p["datum"])
        if d is None:
            raise ValueError(f"unknown datum {p['datum']}")
        for k, v in d.items():
            p.setdefault(k, v)
    if "ellps" in p:
        ell = ELLPS_TABLE[p["ellps"]]
        a = ell["a"]
        if "rf" in ell:
            rf = ell["rf"]
        else:
            b = ell["b"]
            rf = 0.0 if b == a else a / (a - b)
        ename = p["ellps"]
    elif "a" in p:
        a = float(p["a"])
        rf = float(p["rf"]) if "rf" in p else 0.0
        if rf == 0.0 and "b" in p and float(p["b"]) != a:
            b = float(p["b"])
            rf = a / (a - b)
        ename = "unnamed"
    else:
        raise ValueError("preset without ellipsoid information")
    ell_wkt = (f'ELLIPSOID["{ename}",{fmt(a)},{fmt(rf)},'
               'LENGTHUNIT["metre",1]]')
    pm = _pm_degrees(p)
    pm_wkt = (f'PRIMEM["unnamed",{fmt(pm)},'
              'ANGLEUNIT["degree",0.0174532925199433]]') if pm else ""
    base = (f'BASEGEOGCRS["{name} base",DATUM["unknown",{ell_wkt}]'
            + ("," + pm_wkt if pm_wkt else "")
            + ',UNIT["degree",0.0174532925199433]]')
    if p.get("proj") == "longlat":
        return _bound_wkt(
            (f'GEOGCRS["{name}",DATUM["unknown",{ell_wkt}]'
             + ("," + pm_wkt if pm_wkt else "")
             + ',CS[ellipsoidal,2],AXIS["latitude",north],'
             'AXIS["longitude",east],'
             'UNIT["degree",0.0174532925199433]]'), p, name)
    fam = _wkt_family(p)
    if fam is None:
        raise ValueError(f"no WKT2 writer for proj={p.get('proj')!r}")
    key, pp = fam
    code, mname, plist = _WKT_METHODS[key]
    parts = [f'CONVERSION["{name} conversion",'
             f'METHOD["{mname}",ID["EPSG",{code}]]']
    for pcode, pname, projkey, kind, default in plist:
        v = float(pp.get(projkey, default) or default)
        if kind == "A":
            unit = 'ANGLEUNIT["degree",0.0174532925199433]'
        elif kind == "K":
            unit = 'SCALEUNIT["unity",1]'
        else:
            unit = 'LENGTHUNIT["metre",1]'
        parts.append(f'PARAMETER["{pname}",{fmt(v)},{unit},'
                     f'ID["EPSG",{pcode}]]')
    conv = ",".join(parts) + "]"
    if "units" in p and p["units"] in _UNIT_WKT:
        uname, ufac = _UNIT_WKT[p["units"]]
    elif "to_meter" in p:
        uname, ufac = "unknown", float(p["to_meter"])
    else:
        uname, ufac = "metre", 1.0
    return _bound_wkt(
        (f'PROJCRS["{name}",{base},{conv},'
         f'CS[Cartesian,2],AXIS["(E)",east],AXIS["(N)",north],'
         f'LENGTHUNIT["{uname}",{fmt(ufac)}]]'), p, name)
