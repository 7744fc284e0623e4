"""PROJJSON CRS text ingestion — subset.

Reference: src/iso19111/io.cpp:4905 (``class JSONParser``);
createFromUserInput dispatches on a leading ``{`` (io.cpp:5974).
PROJJSON carries the same model as WKT2, so the reader maps the JSON
dict onto the WKT2 ``Node`` tree and reuses sources/wkt2's compiler —
the same EPSG method mappers, ellipsoid matching and unit handling —
so a PROJJSON definition and its WKT2 twin produce identical
proj-strings.

Supported subset (mirrors the WKT2 reader's):
- GeographicCRS / GeodeticCRS (datum or datum_ensemble, prime
  meridian, degree/grad/custom angle units);
- ProjectedCRS (base_crs + conversion via the shared EPSG method
  mapping + axis length unit);
- CompoundCRS (horizontal + vertical), VerticalCRS (ID- or
  name-keyed against the generated vertical presets);
- BoundCRS: helmert-family transformations -> +towgs84 (PROJJSON
  values are TRUE values with units — metres / arc-seconds / ppm —
  unlike the abridged WKT2 convention), NTv2 (EPSG:9615, parameter
  8656) -> +nadgrids.

The writer half (projstring_to_projjson) emits the same subset for
the catalog presets, sharing the WKT2 writer's method tables; the
round-trip test pins parse(write(x)) == x parameter-exactly.
"""

from __future__ import annotations

import json
import math

from proj_4_spark.sources.epsg_methods import fmt
from proj_4_spark.sources.wkt2 import (
    Node,
    _node_to_projstring,
    _parse_projstring_tokens,
    _wkt_family,
    _WKT_METHODS,
    _UNIT_WKT,
)

_ARCSEC_RAD = math.pi / 180.0 / 3600.0
_DEG_RAD = math.pi / 180.0


def _num(v, kind: str = "L") -> float:
    """A PROJJSON measure: plain number (SI / degree) or
    {"value": v, "unit": <string or unit object>}."""
    if isinstance(v, dict):
        val = float(v.get("value", 0.0))
        u = v.get("unit")
        f = _unit_conv(u)
        if f is None:
            return val
        if kind == "A":
            # angle: factor is rad/unit -> degrees
            return val * f / _DEG_RAD
        return val * f
    return float(v)


def _unit_conv(u) -> float | None:
    """Conversion factor of a PROJJSON unit (string enum or object);
    None for the kind's default (metre / degree / unity)."""
    if u is None or u in ("metre", "degree", "unity"):
        return None
    if isinstance(u, dict):
        f = u.get("conversion_factor")
        return float(f) if f is not None else None
    known = {"arc-second": _ARCSEC_RAD, "grad": math.pi / 200.0,
             "radian": 1.0, "parts per million": 1e-6,
             "foot": 0.3048, "US survey foot": 1200.0 / 3937.0,
             "kilometre": 1000.0}
    return known.get(str(u))


def _unit_node(u, wkt_kind: str) -> Node | None:
    """PROJJSON unit -> a WKT2 unit Node the wkt2 compiler understands
    (None when the default applies)."""
    f = _unit_conv(u)
    if f is None:
        return None
    name = u.get("name", "unknown") if isinstance(u, dict) else str(u)
    return Node(wkt_kind, [name, float(f)])


def _id_node(d: dict) -> Node | None:
    idd = d.get("id")
    if idd is None:
        ids = d.get("ids")
        idd = ids[0] if ids else None
    if not isinstance(idd, dict):
        return None
    return Node("ID", [str(idd.get("authority", "")),
                       float(idd.get("code", -1))])


def _ellipsoid_node(e: dict) -> Node:
    name = str(e.get("name", "unknown"))
    if "radius" in e:
        a = _num(e["radius"])
        rf = 0.0
    else:
        a = _num(e["semi_major_axis"])
        if "inverse_flattening" in e:
            rf = _num(e["inverse_flattening"], "K")
        elif "semi_minor_axis" in e:
            b = _num(e["semi_minor_axis"])
            rf = 0.0 if b == a else a / (a - b)
        else:
            rf = 0.0
    return Node("ELLIPSOID", [name, float(a), float(rf)])


def _geog_args(d: dict) -> list:
    """Shared GEOGCRS/BASEGEOGCRS arg list for a GeographicCRS dict."""
    datum = d.get("datum") or d.get("datum_ensemble")
    if datum is None:
        raise ValueError("GeographicCRS without datum/datum_ensemble")
    ell = datum.get("ellipsoid")
    if ell is None:
        raise ValueError("datum without ellipsoid")
    args: list = [str(d.get("name", "unknown")),
                  Node("DATUM", [str(datum.get("name", "unknown")),
                                 _ellipsoid_node(ell)])]
    pm = d.get("prime_meridian")
    if pm is not None:
        lon = _num(pm.get("longitude", 0.0), "A")
        args.append(Node("PRIMEM", [str(pm.get("name", "unknown")),
                                    float(lon)]))
    # CS/AXIS nodes (axis order + angular unit) — ignored by the CRS
    # compiler but required by the coordinate-operation compiler's
    # normalization steps (wkt2._geog_io_steps)
    cs = d.get("coordinate_system")
    if isinstance(cs, dict):
        axes = cs.get("axis", [])
        args.append(Node("CS", [str(cs.get("subtype", "ellipsoidal")),
                                float(len(axes))]))
        for ax in axes:
            axargs: list = [str(ax.get("name", "")),
                            str(ax.get("direction", ""))]
            u = ax.get("unit")
            if u == "degree":
                axargs.append(Node("ANGLEUNIT", ["degree", _DEG_RAD]))
            else:
                un = _unit_node(u, "ANGLEUNIT")
                if un is not None:
                    axargs.append(un)
            args.append(Node("AXIS", axargs))
    idn = _id_node(d)
    if idn is not None:
        args.append(idn)
    return args


def _conversion_node(c: dict) -> Node:
    m = c.get("method")
    if m is None:
        raise ValueError("conversion without method")
    margs: list = [str(m.get("name", ""))]
    idn = _id_node(m)
    if idn is not None:
        margs.append(idn)
    args: list = [str(c.get("name", "unknown")), Node("METHOD", margs)]
    for prm in c.get("parameters", []):
        v = prm.get("value")
        if not isinstance(v, (int, float)):
            raise ValueError(
                f"non-numeric conversion parameter {prm.get('name')!r}")
        pargs: list = [str(prm.get("name", "")), float(v)]
        u = prm.get("unit")
        if isinstance(u, dict):
            t = str(u.get("type", "")).lower()
            wkt_kind = {"angularunit": "ANGLEUNIT",
                        "linearunit": "LENGTHUNIT",
                        "scaleunit": "SCALEUNIT"}.get(t, "UNIT")
            un = _unit_node(u, wkt_kind)
            if un is not None:
                pargs.append(un)
        elif u not in (None, "metre", "degree", "unity"):
            f = _unit_conv(u)
            if f is not None:
                pargs.append(Node("UNIT", [str(u), float(f)]))
        idn = _id_node(prm)
        if idn is not None:
            pargs.append(idn)
        args.append(Node("PARAMETER", pargs))
    return Node("CONVERSION", args)


def _axis_length_unit(d: dict) -> Node | None:
    cs = d.get("coordinate_system") or {}
    for ax in cs.get("axis", []):
        un = _unit_node(ax.get("unit"), "LENGTHUNIT")
        if un is not None:
            return un
        if ax.get("unit") == "metre":
            return Node("LENGTHUNIT", ["metre", 1.0])
    return None


def _vert_node(d: dict) -> Node:
    args: list = [str(d.get("name", "unknown"))]
    datum = d.get("datum") or d.get("datum_ensemble")
    if datum is not None:
        args.append(Node("VDATUM", [str(datum.get("name", "unknown"))]))
    idn = _id_node(d)
    if idn is not None:
        args.append(idn)
    return Node("VERTCRS", args)


def _to_node(d: dict) -> Node:
    t = str(d.get("type", ""))
    if t in ("GeographicCRS", "GeodeticCRS"):
        return Node("GEOGCRS", _geog_args(d))
    if t == "ProjectedCRS":
        base = d.get("base_crs")
        if base is None:
            raise ValueError("ProjectedCRS without base_crs")
        conv = d.get("conversion")
        if conv is None:
            raise ValueError("ProjectedCRS without conversion")
        args: list = [str(d.get("name", "unknown")),
                      Node("BASEGEOGCRS", _geog_args(base)),
                      _conversion_node(conv)]
        un = _axis_length_unit(d)
        if un is not None:
            args.append(un)
        idn = _id_node(d)
        if idn is not None:
            args.append(idn)
        return Node("PROJCRS", args)
    if t == "DerivedProjectedCRS":
        # io.cpp:5494 buildDerivedProjectedCRS (json_import
        # derived_projected_crs, test_io.cpp:12577): base ProjectedCRS +
        # deriving conversion -> the WKT DERIVEDPROJCRS Node shape
        base = d.get("base_crs")
        if base is None or str(base.get("type", "")) != "ProjectedCRS":
            raise ValueError("DerivedProjectedCRS needs a ProjectedCRS "
                             "base_crs")
        conv = d.get("conversion")
        if conv is None:
            raise ValueError("DerivedProjectedCRS without conversion")
        basegeog = base.get("base_crs")
        baseconv = base.get("conversion")
        if basegeog is None or baseconv is None:
            raise ValueError("base ProjectedCRS without base_crs/"
                             "conversion")
        basep = Node("BASEPROJCRS",
                     [str(base.get("name", "unknown")),
                      Node("BASEGEOGCRS", _geog_args(basegeog)),
                      _conversion_node(baseconv)])
        dconv = _conversion_node(conv)
        args = [str(d.get("name", "unknown")), basep,
                Node("DERIVINGCONVERSION", dconv.args)]
        un = _axis_length_unit(d)
        if un is not None:
            args.append(un)
        idn = _id_node(d)
        if idn is not None:
            args.append(idn)
        return Node("DERIVEDPROJCRS", args)
    if t == "CompoundCRS":
        comps = [_to_node(c) for c in d.get("components", [])]
        return Node("COMPOUNDCRS", [str(d.get("name", "unknown"))] + comps)
    if t == "VerticalCRS":
        return _vert_node(d)
    if t == "Transformation":
        return _transformation_node(d)
    if t == "ConcatenatedOperation":
        args: list = [str(d.get("name", "unknown"))]
        for key, kw in (("source_crs", "SOURCECRS"),
                        ("target_crs", "TARGETCRS")):
            c = d.get(key)
            if c is None:
                raise ValueError(f"ConcatenatedOperation without {key}")
            args.append(Node(kw, [_to_node(c)]))
        steps = d.get("steps", [])
        for s in steps:
            args.append(Node("STEP", [_to_node(s)]))
        return Node("CONCATENATEDOPERATION", args)
    if t == "Conversion":
        return _conversion_node(d)
    raise ValueError(f"unsupported PROJJSON type {t!r} (subset: "
                     "GeographicCRS/ProjectedCRS/CompoundCRS/"
                     "VerticalCRS/BoundCRS/Transformation/"
                     "ConcatenatedOperation)")


# known PROJJSON unit strings -> (WKT unit node kind, factor); exact
# factors so the wkt2 converters take their exact degree/arcsec/ppm
# paths (io.cpp getUnit: same five SI-or-common cases)
_UNIT_STRINGS = {
    "metre": ("LENGTHUNIT", 1.0),
    "degree": ("ANGLEUNIT", _DEG_RAD),
    "arc-second": ("ANGLEUNIT", _ARCSEC_RAD),
    "grad": ("ANGLEUNIT", math.pi / 200.0),
    "radian": ("ANGLEUNIT", 1.0),
    "unity": ("SCALEUNIT", 1.0),
    "parts per million": ("SCALEUNIT", 1e-6),
    "kilometre": ("LENGTHUNIT", 1000.0),
    "foot": ("LENGTHUNIT", 0.3048),
    "US survey foot": ("LENGTHUNIT", 1200.0 / 3937.0),
    "year": ("TIMEUNIT", 1.0),
}


def _transformation_node(d: dict) -> Node:
    """PROJJSON Transformation -> the WKT COORDINATEOPERATION Node shape
    (io.cpp:5635 JSONParser::buildTransformation), compiled by
    wkt2._operation_to_projstring.  String parameter values are grid
    file names -> PARAMETERFILE (ParameterValue::createFilename)."""
    args: list = [str(d.get("name", "unknown"))]
    for key, kw in (("source_crs", "SOURCECRS"),
                    ("target_crs", "TARGETCRS")):
        c = d.get(key)
        if c is None:
            raise ValueError(f"Transformation without {key}")
        args.append(Node(kw, [_to_node(c)]))
    m = d.get("method")
    if m is None:
        raise ValueError("Transformation without method")
    margs: list = [str(m.get("name", ""))]
    idn = _id_node(m)
    if idn is not None:
        margs.append(idn)
    args.append(Node("METHOD", margs))
    for prm in d.get("parameters", []):
        v = prm.get("value")
        if isinstance(v, str):
            args.append(Node("PARAMETERFILE",
                             [str(prm.get("name", "")), v]))
            continue
        pargs: list = [str(prm.get("name", "")), float(v)]
        u = prm.get("unit")
        if isinstance(u, str) and u in _UNIT_STRINGS:
            kind, f = _UNIT_STRINGS[u]
            pargs.append(Node(kind, [u, f]))
        elif isinstance(u, dict):
            t2 = str(u.get("type", "")).lower()
            wkt_kind = {"angularunit": "ANGLEUNIT",
                        "linearunit": "LENGTHUNIT",
                        "scaleunit": "SCALEUNIT",
                        "timeunit": "TIMEUNIT"}.get(t2, "UNIT")
            un = _unit_node(u, wkt_kind)
            if un is not None:
                pargs.append(un)
        elif u is not None:
            raise ValueError(f"unsupported parameter unit {u!r} in "
                             "Transformation")
        idn = _id_node(prm)
        if idn is not None:
            pargs.append(idn)
        args.append(Node("PARAMETER", pargs))
    return Node("COORDINATEOPERATION", args)


# BoundCRS helmert parameter slots (EPSG parameter codes) and the
# target unit of each towgs84 slot
_HELMERT_SLOTS = {8605: (0, "L"), 8606: (1, "L"), 8607: (2, "L"),
                  8608: (3, "R"), 8609: (4, "R"), 8610: (5, "R"),
                  8611: (6, "S")}
_HELMERT_NAMES = {"x-axis translation": 8605, "y-axis translation": 8606,
                  "z-axis translation": 8607, "x-axis rotation": 8608,
                  "y-axis rotation": 8609, "z-axis rotation": 8610,
                  "scale difference": 8611}


def _bound_to_projstring(d: dict) -> str:
    """BoundCRS -> source fragments + towgs84/nadgrids.

    Unlike the WKT2 ABRIDGEDTRANSFORMATION convention, PROJJSON
    transformation parameters carry TRUE values with units
    (io.cpp JSONParser::buildBoundCRS): translations in metres,
    rotations with an angular unit (arc-second in GDAL exports),
    Scale difference in parts per million."""
    src = d.get("source_crs")
    tr = d.get("transformation")
    if src is None or tr is None:
        raise ValueError("BoundCRS needs source_crs and transformation")
    frag = _node_to_projstring(_to_node(src))
    m = tr.get("method") or {}
    mname = str(m.get("name", "")).lower()
    mid = m.get("id") or {}
    mcode = int(mid.get("code", -1)) if isinstance(mid, dict) else -1

    def _inject(extra: str) -> str:
        if frag.endswith(" no_defs"):
            return frag[: -len(" no_defs")] + f" {extra} no_defs"
        return f"{frag} {extra}"

    if mcode == 9615 or "ntv2" in mname:
        for prm in tr.get("parameters", []):
            pid = prm.get("id") or {}
            if (isinstance(pid, dict) and int(pid.get("code", -1)) == 8656) \
                    or "difference file" in str(prm.get("name", "")).lower():
                return _inject(f"nadgrids={prm.get('value')}")
        raise ValueError("NTv2 BoundCRS without a grid file parameter")

    if "coordinate frame" in mname or mcode in (1032, 1038, 9607):
        invert_rot = True
    elif "position vector" in mname or mcode in (1033, 1037, 9606):
        invert_rot = False
    elif "geocentric translations" in mname or mcode in (1031, 1035, 9603):
        invert_rot = False
    else:
        raise ValueError(f"unsupported BoundCRS method {mname!r} "
                         f"(EPSG:{mcode})")
    vals = [0.0] * 7
    for prm in tr.get("parameters", []):
        pid = prm.get("id") or {}
        pcode = int(pid.get("code", -1)) if isinstance(pid, dict) else -1
        if pcode not in _HELMERT_SLOTS:
            pcode = _HELMERT_NAMES.get(str(prm.get("name", "")).lower(), -1)
        if pcode not in _HELMERT_SLOTS:
            raise ValueError(
                f"unsupported BoundCRS parameter {prm.get('name')!r}")
        slot, kind = _HELMERT_SLOTS[pcode]
        v = float(prm.get("value", 0.0))
        u = prm.get("unit")
        if kind == "L":
            f = _unit_conv(u)
            v = v * f if f is not None else v
        elif kind == "R":
            # to arc-seconds.  NOTE: the schema-valid string "degree"
            # is NOT the slot default here (the _unit_conv None return
            # means metre/degree/unity SI defaults, but rotation slots
            # default to arc-second) — handle the strings explicitly
            if u in (None, "arc-second"):
                pass
            elif u == "degree":
                v = v * 3600.0
            else:
                f = _unit_conv(u)
                if f is None:
                    raise ValueError(
                        f"unsupported rotation unit {u!r} in BoundCRS")
                # exact paths: multiplying by f then dividing by the
                # same arc-second factor would corrupt the last bits
                # (the WKT2 degree-factor lesson).  Unit OBJECTS whose
                # conversion_factor is the (possibly 15-digit-rounded)
                # degree factor get the same exact *3600 route as the
                # "degree" string.
                if abs(f - _DEG_RAD) < 1e-16:
                    v = v * 3600.0
                elif f != _ARCSEC_RAD:
                    v = v * f / _ARCSEC_RAD
        else:
            # to ppm; same reasoning for the "unity" string
            if u in (None, "parts per million"):
                pass
            elif u == "unity":
                v = v * 1e6
            else:
                f = _unit_conv(u)
                if f is None:
                    raise ValueError(
                        f"unsupported scale unit {u!r} in BoundCRS")
                if f == 1.0:  # unit OBJECT for unity: exact *1e6 path
                    v = v * 1e6
                elif f != 1e-6:  # exact ppm path (see above)
                    v = v * f / 1e-6
        vals[slot] = v
    if invert_rot:
        for i in (3, 4, 5):
            vals[i] = -vals[i] if vals[i] != 0.0 else 0.0
    return _inject("towgs84=" + ",".join(fmt(v) for v in vals))


def projjson_to_projstring(text: str | dict) -> str:
    """Compile a PROJJSON document (string or parsed dict) to a
    proj-string."""
    d = json.loads(text) if isinstance(text, str) else text
    if not isinstance(d, dict):
        raise ValueError("PROJJSON root is not an object")
    if d.get("type") == "BoundCRS":
        return _bound_to_projstring(d)
    return _node_to_projstring(_to_node(d))


# ---------------------------------------------------------------------------
# writer (round-trip half; shares the WKT2 writer's method tables)
# ---------------------------------------------------------------------------

def _ellipsoid_json(p: dict) -> dict:
    from proj_4_spark.engine.plan import DATUMS
    from proj_4_spark.kernels.ellipsoid import ELLPS_TABLE

    if "datum" in p:
        d = DATUMS.get(p["datum"])
        if d is None:
            raise ValueError(f"unknown datum {p['datum']}")
        p.setdefault("ellps", d["ellps"])
    if "ellps" in p:
        ell = ELLPS_TABLE[p["ellps"]]
        a = ell["a"]
        if "rf" in ell:
            rf = ell["rf"]
        else:
            b = ell["b"]
            rf = 0.0 if b == a else a / (a - b)
        name = p["ellps"]
    elif "a" in p:
        a = float(p["a"])
        rf = float(p["rf"]) if "rf" in p else 0.0
        if rf == 0.0 and "b" in p and float(p["b"]) != a:
            rf = a / (a - float(p["b"]))
        name = "unnamed"
    else:
        raise ValueError("preset without ellipsoid information")
    if rf == 0.0:
        return {"name": name, "radius": a}
    return {"name": name, "semi_major_axis": a, "inverse_flattening": rf}


def _geog_json(p: dict, name: str) -> dict:
    out = {
        "type": "GeographicCRS",
        "name": name,
        "datum": {"type": "GeodeticReferenceFrame", "name": "unknown",
                  "ellipsoid": _ellipsoid_json(p)},
        "coordinate_system": {
            "subtype": "ellipsoidal",
            "axis": [
                {"name": "Longitude", "abbreviation": "lon",
                 "direction": "east", "unit": "degree"},
                {"name": "Latitude", "abbreviation": "lat",
                 "direction": "north", "unit": "degree"},
            ]},
    }
    from proj_4_spark.sources.wkt2 import _pm_degrees

    pm = _pm_degrees(p)
    if pm:
        out["prime_meridian"] = {"name": str(p.get("pm", "unnamed")),
                                 "longitude": pm}
    return out


def _bound_json(core: dict, p: dict, name: str) -> dict:
    """Wrap a CRS dict in a BoundCRS when the preset carries datum
    info (+towgs84 / +nadgrids) — the writer must not silently DROP
    the datum shift; the reader converts the wrapper back."""
    tw = p.get("towgs84")
    ng = p.get("nadgrids")
    if not tw and not ng:
        return core
    if ng:
        tr = {
            "name": name + " to WGS84",
            "method": {"name": "NTv2",
                       "id": {"authority": "EPSG", "code": 9615}},
            "parameters": [
                {"name": "Latitude and longitude difference file",
                 "value": ng,
                 "id": {"authority": "EPSG", "code": 8656}}],
        }
    else:
        vals = [float(x) for x in str(tw).split(",")]
        while len(vals) < 7:
            vals.append(0.0)
        asec = {"type": "AngularUnit", "name": "arc-second",
                "conversion_factor": _ARCSEC_RAD}
        ppm = {"type": "ScaleUnit", "name": "parts per million",
               "conversion_factor": 1e-06}
        names = ["X-axis translation", "Y-axis translation",
                 "Z-axis translation", "X-axis rotation",
                 "Y-axis rotation", "Z-axis rotation",
                 "Scale difference"]
        units = ["metre", "metre", "metre", asec, asec, asec, ppm]
        params = [{"name": n, "value": v, "unit": u,
                   "id": {"authority": "EPSG", "code": 8605 + i}}
                  for i, (n, v, u) in enumerate(zip(names, vals, units))]
        # +towgs84 is the position-vector convention by definition
        tr = {
            "name": name + " to WGS84",
            "method": {"name": "Position Vector transformation "
                               "(geog2D domain)",
                       "id": {"authority": "EPSG", "code": 9606}},
            "parameters": params,
        }
    return {"type": "BoundCRS", "source_crs": core,
            "target_crs": _geog_json({"ellps": "WGS84"}, "WGS 84"),
            "transformation": tr}


def projstring_to_projjson(projstring: str, name: str = "unnamed") -> dict:
    """PROJJSON dict for a supported projected/geographic proj-string
    preset (the writer half of the round-trip test: parse(write(x))
    must reproduce x's parameters exactly, INCLUDING the datum shift —
    towgs84/nadgrids presets emit a BoundCRS wrapper)."""
    from proj_4_spark.engine.plan import DATUMS

    p = _parse_projstring_tokens(projstring)
    if "datum" in p:
        d = DATUMS.get(p["datum"])
        if d is None:
            raise ValueError(f"unknown datum {p['datum']}")
        for k, v in d.items():
            p.setdefault(k, v)
    if p.get("proj") == "longlat":
        return _bound_json(_geog_json(p, name), p, name)
    fam = _wkt_family(p)
    if fam is None:
        raise ValueError(f"no PROJJSON writer for proj={p.get('proj')!r}")
    key, pp = fam
    code, mname, plist = _WKT_METHODS[key]
    params = []
    for pcode, pname, projkey, kind, default in plist:
        v = float(pp.get(projkey, default) or default)
        unit = {"A": "degree", "K": "unity", "L": "metre"}[kind]
        params.append({"name": pname, "value": v, "unit": unit,
                       "id": {"authority": "EPSG", "code": pcode}})
    if "units" in p and p["units"] in _UNIT_WKT:
        uname, ufac = _UNIT_WKT[p["units"]]
    elif "to_meter" in p:
        uname, ufac = "unknown", float(p["to_meter"])
    else:
        uname, ufac = "metre", 1.0
    if ufac == 1.0:
        unit_json = "metre"
    else:
        unit_json = {"type": "LinearUnit", "name": uname,
                     "conversion_factor": ufac}
    return _bound_json({
        "type": "ProjectedCRS",
        "name": name,
        "base_crs": _geog_json(p, name + " base"),
        "conversion": {
            "name": name + " conversion",
            "method": {"name": mname,
                       "id": {"authority": "EPSG", "code": code}},
            "parameters": params,
        },
        "coordinate_system": {
            "subtype": "Cartesian",
            "axis": [
                {"name": "Easting", "abbreviation": "E",
                 "direction": "east", "unit": unit_json},
                {"name": "Northing", "abbreviation": "N",
                 "direction": "north", "unit": unit_json},
            ]},
    }, p, name)
