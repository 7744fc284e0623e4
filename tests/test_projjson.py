"""PROJJSON ingestion tests.

Reference literals from test/unit/test_io.cpp (json_import cases);
the round-trip test mirrors test_wkt2.py's over the same generated
catalog, pinning writer/reader parameter-exactness.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from proj_4_spark.sources.projjson import (
    projjson_to_projstring,
    projstring_to_projjson,
)

from tests.test_wkt2 import _norm


def test_reference_projected_crs_literal():
    """test_io.cpp json_import.projected_crs: UTM 31N over WGS84."""
    from proj_4_spark.engine.plan import create_operation

    j = {
        "type": "ProjectedCRS",
        "name": "WGS 84 / UTM zone 31N",
        "base_crs": {
            "name": "WGS 84",
            "datum": {"type": "GeodeticReferenceFrame",
                      "name": "World Geodetic System 1984",
                      "ellipsoid": {"name": "WGS 84",
                                    "semi_major_axis": 6378137,
                                    "inverse_flattening": 298.257223563}},
            "coordinate_system": {
                "subtype": "ellipsoidal",
                "axis": [{"name": "Geodetic latitude",
                          "abbreviation": "Lat", "direction": "north",
                          "unit": "degree"},
                         {"name": "Geodetic longitude",
                          "abbreviation": "Lon", "direction": "east",
                          "unit": "degree"}]},
            "id": {"authority": "EPSG", "code": 4326}},
        "conversion": {
            "name": "UTM zone 31N",
            "method": {"name": "Transverse Mercator",
                       "id": {"authority": "EPSG", "code": 9807}},
            "parameters": [
                {"name": "Latitude of natural origin", "value": 0,
                 "unit": "degree",
                 "id": {"authority": "EPSG", "code": 8801}},
                {"name": "Longitude of natural origin", "value": 3,
                 "unit": "degree",
                 "id": {"authority": "EPSG", "code": 8802}},
                {"name": "Scale factor at natural origin",
                 "value": 0.9996, "unit": "unity",
                 "id": {"authority": "EPSG", "code": 8805}},
                {"name": "False easting", "value": 500000,
                 "unit": "metre",
                 "id": {"authority": "EPSG", "code": 8806}},
                {"name": "False northing", "value": 0, "unit": "metre",
                 "id": {"authority": "EPSG", "code": 8807}}]},
        "coordinate_system": {
            "subtype": "Cartesian",
            "axis": [{"name": "Easting", "abbreviation": "E",
                      "direction": "east", "unit": "metre"},
                     {"name": "Northing", "abbreviation": "N",
                      "direction": "north", "unit": "metre"}]},
    }
    # dict and serialized-string entry points agree
    ps = projjson_to_projstring(j)
    assert projjson_to_projstring(json.dumps(j)) == ps

    op = create_operation("+" + ps.replace(" ", " +"))
    ref = create_operation("+proj=utm +zone=31 +ellps=WGS84")
    D = np.pi / 180.0
    lam, phi = np.array([3.5 * D]), np.array([48.0 * D])
    z = np.zeros(1)
    xa, ya, _, _ = op.apply(lam, phi, z, z.copy())
    xb, yb, _, _ = ref.apply(lam, phi, z, z.copy())
    assert xa[0] == xb[0] and ya[0] == yb[0]


def test_reference_geographic_and_bound_crs_literals():
    """json_import.geographic_crs (GEOGCRS subset) and
    json_import.bound_crs (NTv2 -> +nadgrids)."""
    geog = {
        "type": "GeographicCRS",
        "name": "WGS 84",
        "datum": {"type": "GeodeticReferenceFrame",
                  "name": "World Geodetic System 1984",
                  "ellipsoid": {"name": "WGS 84",
                                "semi_major_axis": 6378137,
                                "inverse_flattening": 298.257223563}},
        "coordinate_system": {
            "subtype": "ellipsoidal",
            "axis": [{"name": "Geodetic latitude", "abbreviation": "Lat",
                      "direction": "north", "unit": "degree"},
                     {"name": "Geodetic longitude",
                      "abbreviation": "Lon", "direction": "east",
                      "unit": "degree"}]},
        "id": {"authority": "EPSG", "code": 4326},
    }
    assert projjson_to_projstring(geog) == \
        "proj=longlat ellps=WGS84 no_defs"

    bound = {
        "type": "BoundCRS",
        "source_crs": {
            "type": "GeographicCRS",
            "name": "unknown",
            "datum": {"type": "GeodeticReferenceFrame",
                      "name": "Unknown based on GRS80 ellipsoid",
                      "ellipsoid": {"name": "GRS 1980",
                                    "semi_major_axis": 6378137,
                                    "inverse_flattening": 298.257222101,
                                    "id": {"authority": "EPSG",
                                           "code": 7019}}},
            "coordinate_system": {
                "subtype": "ellipsoidal",
                "axis": [{"name": "Longitude", "abbreviation": "lon",
                          "direction": "east", "unit": "degree"},
                         {"name": "Latitude", "abbreviation": "lat",
                          "direction": "north", "unit": "degree"}]}},
        "target_crs": geog,
        "transformation": {
            "name": "unknown to WGS84",
            "method": {"name": "NTv2",
                       "id": {"authority": "EPSG", "code": 9615}},
            "parameters": [
                {"name": "Latitude and longitude difference file",
                 "value": "@foo",
                 "id": {"authority": "EPSG", "code": 8656}}]},
    }
    got = projjson_to_projstring(bound)
    assert "nadgrids=@foo" in got and "ellps=GRS80" in got


def test_bound_crs_helmert_true_values():
    """PROJJSON BoundCRS helmert parameters carry TRUE values with
    units (not the WKT2 abridged convention): rotations through an
    arc-second AngularUnit, scale through a ppm ScaleUnit; Coordinate
    Frame flips rotation signs into the towgs84 convention."""
    src = {
        "type": "GeographicCRS", "name": "src",
        "datum": {"type": "GeodeticReferenceFrame", "name": "d",
                  "ellipsoid": {"name": "WGS 84",
                                "semi_major_axis": 6378137,
                                "inverse_flattening": 298.257223563}},
    }
    asec = {"type": "AngularUnit", "name": "arc-second",
            "conversion_factor": 4.84813681109536e-06}
    ppm = {"type": "ScaleUnit", "name": "parts per million",
           "conversion_factor": 1e-06}
    bound = {
        "type": "BoundCRS", "source_crs": src, "target_crs": src,
        "transformation": {
            "name": "t",
            "method": {"name": "Coordinate Frame rotation (geog2D "
                               "domain)",
                       "id": {"authority": "EPSG", "code": 9607}},
            "parameters": [
                {"name": "X-axis translation", "value": 1,
                 "unit": "metre",
                 "id": {"authority": "EPSG", "code": 8605}},
                {"name": "Y-axis translation", "value": 2,
                 "unit": "metre",
                 "id": {"authority": "EPSG", "code": 8606}},
                {"name": "Z-axis translation", "value": 3,
                 "unit": "metre",
                 "id": {"authority": "EPSG", "code": 8607}},
                {"name": "X-axis rotation", "value": -4, "unit": asec,
                 "id": {"authority": "EPSG", "code": 8608}},
                {"name": "Y-axis rotation", "value": -5, "unit": asec,
                 "id": {"authority": "EPSG", "code": 8609}},
                {"name": "Z-axis rotation", "value": -6, "unit": asec,
                 "id": {"authority": "EPSG", "code": 8610}},
                {"name": "Scale difference", "value": 7, "unit": ppm,
                 "id": {"authority": "EPSG", "code": 8611}}]},
    }
    got = projjson_to_projstring(bound)
    tw = [float(v) for v in
          got.split("towgs84=")[1].split()[0].split(",")]
    assert np.allclose(tw, [1, 2, 3, 4, 5, 6, 7], rtol=0, atol=1e-10)

    # unsupported transformation methods raise
    bad = dict(bound)
    bad["transformation"] = {"method": {"name": "Molodensky"},
                             "parameters": []}
    with pytest.raises(ValueError):
        projjson_to_projstring(bad)


def _norm_datum(ps: str) -> dict:
    """_norm plus the DATUM tokens the PROJJSON writer must preserve
    (towgs84 normalized to 7 floats; nadgrids verbatim; +datum
    expanded)."""
    from proj_4_spark.engine.plan import DATUMS
    from proj_4_spark.sources.wkt2 import _parse_projstring_tokens

    out = _norm(ps)
    raw = _parse_projstring_tokens(ps)
    if "datum" in raw:
        for k, v in DATUMS[raw["datum"]].items():
            raw.setdefault(k, v)
    if raw.get("towgs84"):
        vals = [float(x) for x in raw["towgs84"].split(",")]
        while len(vals) < 7:
            vals.append(0.0)
        out["towgs84"] = tuple(vals)
    if raw.get("nadgrids"):
        out["nadgrids"] = raw["nadgrids"]
    return out


def test_projjson_roundtrip_generated_catalog():
    """Every generated-catalog preset in the writer's method subset
    round-trips preset -> PROJJSON -> proj-string with EXACTLY equal
    parameters INCLUDING the datum shift (towgs84 presets emit a
    BoundCRS wrapper; a writer that silently dropped the shift would
    produce ~100 m errors on re-import)."""
    from proj_4_spark.sources.epsg_generated import PRESETS

    ok = 0
    with_datum = 0
    families = set()
    for code, ps in PRESETS.items():
        try:
            j = projstring_to_projjson(ps, name=f"EPSG:{code}")
            back = projjson_to_projstring(json.dumps(j))
        except (ValueError, KeyError):
            continue  # outside the writer subset
        assert _norm_datum(ps) == _norm_datum(back), (code, ps, back)
        ok += 1
        if "towgs84" in _norm_datum(ps) or "nadgrids" in _norm_datum(ps):
            with_datum += 1
        families.add(ps.split()[0])
    assert ok >= 5000, ok
    assert len(families) >= 15, families
    assert with_datum >= 200, with_datum


def test_projjson_bound_unit_strings():
    """Schema-valid unit STRINGS on BoundCRS helmert parameters:
    rotations in 'degree' convert via 3600, 'unity' scale via 1e6 —
    NOT silently misread as the arc-second/ppm slot defaults."""
    src = {"type": "GeographicCRS", "name": "s",
           "datum": {"type": "GeodeticReferenceFrame", "name": "d",
                     "ellipsoid": {"name": "WGS 84",
                                   "semi_major_axis": 6378137,
                                   "inverse_flattening": 298.257223563}}}
    b = {"type": "BoundCRS", "source_crs": src, "target_crs": src,
         "transformation": {
             "name": "t",
             "method": {"name": "Position Vector transformation "
                                "(geog2D domain)",
                        "id": {"authority": "EPSG", "code": 9606}},
             "parameters": [
                 {"name": "X-axis rotation", "value": 0.001,
                  "unit": "degree",
                  "id": {"authority": "EPSG", "code": 8608}},
                 {"name": "Scale difference", "value": 6.7e-06,
                  "unit": "unity",
                  "id": {"authority": "EPSG", "code": 8611}}]}}
    got = projjson_to_projstring(b)
    tw = [float(v) for v in
          got.split("towgs84=")[1].split()[0].split(",")]
    assert np.allclose(tw, [0, 0, 0, 3.6, 0, 0, 6.7], rtol=0,
                       atol=1e-12)


def test_create_operation_and_transform_accept_projjson(spark):
    """createFromUserInput dispatch on '{': PROJJSON works anywhere a
    proj-string does — create_operation AND the Spark transform
    surface."""
    import pandas as pd

    from proj_4_spark.engine.plan import create_operation
    from proj_4_spark.engine.spark import transform

    j = json.dumps(projstring_to_projjson(
        "proj=utm zone=31 ellps=WGS84", name="utm31"))
    D = np.pi / 180.0
    op = create_operation(j)
    ref = create_operation("+proj=utm +zone=31 +ellps=WGS84")
    lam, phi = np.array([3.5 * D]), np.array([48.0 * D])
    z = np.zeros(1)
    xa, ya, _, _ = op.apply(lam, phi, z, z.copy())
    xb, yb, _, _ = ref.apply(lam, phi, z, z.copy())
    assert xa[0] == xb[0] and ya[0] == yb[0]

    df = spark.createDataFrame(pd.DataFrame({"lon": [3.5],
                                             "lat": [48.0]}))
    out = transform(df, j, x="lon", y="lat", out_prefix="j_").toPandas()
    assert abs(out["j_x"][0] - xb[0]) < 1e-6
