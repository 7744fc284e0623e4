"""Engine-level unit tests: parser, ellipsoid derivation, pipelines,
round-trip drift (the BASELINE.json metric: <= 1e-8 deg)."""

import numpy as np
import pytest

from proj_4_spark.engine.plan import create_operation, peephole
from proj_4_spark.engine.projstring import dmstor, parse_projstring, split_pipeline_steps
from proj_4_spark.kernels.base import ProjError
from proj_4_spark.kernels.common import DEG_TO_RAD, RAD_TO_DEG
from proj_4_spark.kernels.ellipsoid import ellipsoid_from_params

# (projstring, roundtrip tolerance in degrees).  1e-8 deg is the BASELINE
# metric; cea-ellipsoidal inherits the truncated authalic series of the
# reference (src/auth.cpp) whose intrinsic accuracy is ~1e-8 deg.
RT_PROJS = [
    ("+proj=utm +zone=32 +ellps=GRS80", 1e-8),
    ("+proj=tmerc +ellps=GRS80 +lon_0=9", 1e-8),
    ("+proj=merc +ellps=GRS80", 1e-8),
    ("+proj=merc +R=6400000", 1e-8),
    ("+proj=webmerc +ellps=WGS84", 1e-8),
    ("+proj=lcc +ellps=GRS80 +lat_1=33 +lat_2=45", 1e-8),
    ("+proj=lcc +ellps=GRS80 +lat_1=33 +lat_0=33", 1e-8),
    ("+proj=aea +ellps=GRS80 +lat_1=29.5 +lat_2=45.5", 1e-8),
    ("+proj=eqc +ellps=GRS80", 1e-8),
    ("+proj=cea +ellps=GRS80", 5e-8),
    ("+proj=cea +R=6371000", 1e-8),
]


def _grid(n=200, lon_range=(-20, 20), lat_range=(-75, 75), seed=42):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(*lon_range, n) * DEG_TO_RAD
    lat = rng.uniform(*lat_range, n) * DEG_TO_RAD
    return lon, lat


@pytest.mark.parametrize("projstr,tol", RT_PROJS)
def test_roundtrip_below_1e8_deg(projstr, tol):
    """BASELINE.md metric: fwd+inv round-trip <= 1e-8 degrees."""
    op = create_operation(projstr)
    lon, lat = _grid()
    z = np.zeros_like(lon)
    t = np.zeros_like(lon)
    x, y, z1, t1 = op.apply(lon, lat, z, t, "fwd")
    lon2, lat2, _, _ = op.apply(x, y, z1, t1, "inv")
    assert np.nanmax(np.abs(lon2 - lon)) * RAD_TO_DEG < tol
    assert np.nanmax(np.abs(lat2 - lat)) * RAD_TO_DEG < tol


def test_roundtrip_approx_tmerc_near_meridian():
    """Evenden-Snyder is only accurate near the central meridian (the whole
    point of +algo=auto, tmerc.cpp:574-591) — test within +/-3 deg."""
    op = create_operation("+proj=tmerc +ellps=GRS80 +approx +lon_0=9")
    lon, lat = _grid(200, lon_range=(6, 12), lat_range=(-75, 75))
    z = np.zeros_like(lon)
    t = np.zeros_like(lon)
    x, y, z1, t1 = op.apply(lon, lat, z, t, "fwd")
    lon2, lat2, _, _ = op.apply(x, y, z1, t1, "inv")
    assert np.nanmax(np.abs(lon2 - lon)) * RAD_TO_DEG < 1e-8
    assert np.nanmax(np.abs(lat2 - lat)) * RAD_TO_DEG < 1e-8


def test_parse_projstring_first_wins():
    p = parse_projstring("+proj=utm +zone=32 +zone=33")
    assert p["zone"] == "32"


def test_dmstor():
    assert abs(dmstor("12.5") - 12.5 * DEG_TO_RAD) < 1e-15
    assert abs(dmstor("12d30'S") + 12.5 * DEG_TO_RAD) < 1e-15
    assert abs(dmstor("0dE")) == 0.0


def test_ellipsoid_derivation():
    e = ellipsoid_from_params({"ellps": "GRS80"})
    assert e.a == 6378137.0
    assert abs(e.rf - 298.257222101) < 1e-9
    assert abs(e.b - 6356752.314140356) < 1e-6
    s = ellipsoid_from_params({"R": "6400000"})
    assert s.es == 0.0 and s.a == 6400000.0


def test_unknown_projection_raises():
    with pytest.raises(ProjError):
        create_operation("+proj=nosuchproj")


def test_pipeline_roundtrip_and_push_pop():
    op = create_operation(
        "+proj=pipeline +ellps=GRS80 "
        "+step +proj=cart "
        "+step +proj=cart +inv"
    )
    lon, lat = _grid(50)
    z = np.linspace(-100, 100, 50)
    t = np.zeros(50)
    lon2, lat2, z2, _ = op.apply(lon, lat, z, t, "fwd")
    assert np.allclose(lon2, lon, atol=1e-12)
    assert np.allclose(lat2, lat, atol=1e-12)
    assert np.allclose(z2, z, atol=1e-6)


def test_pipeline_utm_equivalent():
    direct = create_operation("+proj=utm +zone=32 +ellps=GRS80")
    pipe = create_operation(
        "+proj=pipeline +ellps=GRS80 +step +proj=utm +zone=32"
    )
    lon, lat = _grid(50, lon_range=(6, 12), lat_range=(40, 70))
    z = np.zeros(50)
    t = np.zeros(50)
    xd, yd, _, _ = direct.apply(lon, lat, z, t)
    xp, yp, _, _ = pipe.apply(lon, lat, z, t)
    assert np.allclose(xd, xp, atol=1e-9)
    assert np.allclose(yd, yp, atol=1e-9)


def test_peephole_drops_identity_steps():
    g, steps = split_pipeline_steps(
        "+proj=pipeline +step +proj=noop +step +proj=helmert +x=0 +y=0 +z=0 "
        "+step +proj=utm +zone=32 +ellps=GRS80"
    )
    out = peephole(g, steps)
    assert len(out) == 1 and out[0]["proj"] == "utm"


def test_peephole_cancels_inverse_pair():
    g, steps = split_pipeline_steps(
        "+proj=pipeline +step +proj=cart +step +proj=cart +inv"
    )
    out = peephole(g, steps)
    assert out == []


def test_error_propagates_as_nan():
    op = create_operation("+proj=merc +ellps=GRS80")
    # lat > 90 deg must error (fwd.cpp:53-58), lon=999 out of range
    x, y, _, _ = op.apply(
        np.array([0.0, 999 * DEG_TO_RAD]),
        np.array([91 * DEG_TO_RAD, 0.0]),
        np.zeros(2), np.zeros(2),
    )
    assert np.isnan(x).all() and np.isnan(y).all()


def test_helmert_seven_param():
    # classic 7-param position_vector shift roundtrip
    op = create_operation(
        "+proj=helmert +convention=position_vector "
        "+x=67.8 +y=-106.3 +z=-119.2 +rx=0.1 +ry=0.2 +rz=0.3 +s=2.5"
    )
    x = np.array([4e6]); y = np.array([1e6]); z = np.array([4.5e6]); t = np.zeros(1)
    X, Y, Z, _ = op.apply(x, y, z, t)
    x2, y2, z2, _ = op.apply(X, Y, Z, t, "inv")
    # small-angle (approximate) rotation: the reference inverts via the
    # transpose (helmert.cpp:430-433), exact only to first order in the
    # rotation angles -> ~1e-5 m roundtrip drift is reference behaviour
    assert abs(x2[0] - 4e6) < 1e-4
    assert abs(y2[0] - 1e6) < 1e-4
    assert abs(z2[0] - 4.5e6) < 1e-4

    # with +exact the rotation matrix is orthogonal -> exact roundtrip
    op_exact = create_operation(
        "+proj=helmert +convention=position_vector +exact "
        "+x=67.8 +y=-106.3 +z=-119.2 +rx=0.1 +ry=0.2 +rz=0.3 +s=2.5"
    )
    X, Y, Z, _ = op_exact.apply(x, y, z, t)
    x2, y2, z2, _ = op_exact.apply(X, Y, Z, t, "inv")
    assert abs(x2[0] - 4e6) < 1e-7
    assert abs(y2[0] - 1e6) < 1e-7
    assert abs(z2[0] - 4.5e6) < 1e-7


def test_proj_factors_closed_forms():
    """pj_factors vs closed-form scale factors (public formulas):
    merc k=h=sqrt(1-es sin^2)/cos (conformal), aea s=1 (equal-area),
    eqc spherical k=cos(lat_ts)/cos(phi), h=1."""
    import math

    import numpy as np

    from proj_4_spark.engine.factors import factors

    D = math.pi / 180
    f = factors("+proj=merc +ellps=WGS84", np.array([12 * D]), np.array([55 * D]))
    es = 0.0066943799901413165
    k_exact = math.sqrt(1 - es * math.sin(55 * D) ** 2) / math.cos(55 * D)
    assert abs(f["k"][0] - k_exact) < 1e-9
    assert abs(f["h"][0] - k_exact) < 1e-9     # conformal: h == k
    assert abs(f["conv"][0]) < 1e-12
    assert abs(f["omega"][0]) < 1e-7           # gie_self_tests.cpp:431
    assert abs(f["thetap"][0] - math.pi / 2) < 1e-7  # gie_self_tests.cpp:435

    f = factors("+proj=aea +ellps=GRS80 +lat_1=29.5 +lat_2=45.5",
                np.array([-75 * D, 10 * D]), np.array([40 * D, -20 * D]))
    assert np.allclose(f["s"], 1.0, atol=1e-9)

    f = factors("+proj=eqc +R=6371000 +lat_ts=30", np.array([5 * D]), np.array([50 * D]))
    assert abs(f["k"][0] - math.cos(30 * D) / math.cos(50 * D)) < 1e-9
    assert abs(f["h"][0] - 1.0) < 1e-9

    # tmerc convergence ~ atan(tan(dlam) sin(phi))
    f = factors("+proj=utm +zone=32 +ellps=GRS80", np.array([12 * D]), np.array([56 * D]))
    assert abs(f["conv"][0] - math.atan(math.tan(3 * D) * math.sin(56 * D))) < 1e-6


def test_karney_geodesic_golden_cases():
    """The reference's own 20-case geodesic table
    (src/tests/geodtest.cpp:45-132) — distance to <=1 ulp (~4e-9 m at
    2e7 m), azimuths to <=3e-14 deg; plus antipodal/equatorial cases
    where Vincenty does not converge."""
    import re

    import numpy as np

    from proj_4_spark.kernels.geodesic import Geodesic

    src = open("/root/reference/src/tests/geodtest.cpp").read()
    blob = src[src.index("testcases[20][12] = {"):]
    blob = blob[blob.index("{", 20):blob.index("};")]
    nums = re.findall(r"-?\d+\.?\d*(?:[eE][-+]?\d+)?", blob)
    cases = np.array([float(x) for x in nums]).reshape(20, 12)
    lat1, lon1, azi1, lat2, lon2, azi2, s12, a12 = (cases[:, i] for i in range(8))

    g = Geodesic(6378137.0, 1 / 298.257223563)
    S, A1, A2, A12 = g.inverse(lat1, lon1, lat2, lon2)
    assert np.abs(S - s12).max() < 1e-8
    assert np.abs(A1 - azi1).max() < 1e-12
    assert np.abs(A2 - azi2).max() < 1e-12
    assert np.abs(A12 - a12).max() < 1e-12

    # equatorial near-antipodal (geodesic does NOT follow the equator)
    S3, A13, _, _ = g.inverse(np.array([0.0]), np.array([0.0]),
                              np.array([0.0]), np.array([179.5]))
    assert abs(S3[0] - 19980861.9088) < 1e-3
    assert abs(A13[0] - 55.96649514) < 1e-7
    # exact antipode of the pole-to-pole meridian
    S4, _, _, A124 = g.inverse(np.array([90.0]), np.array([0.0]),
                               np.array([-90.0]), np.array([0.0]))
    assert abs(A124[0] - 180.0) < 1e-12
    assert abs(S4[0] - 20003931.4586) < 1e-3


def test_isea_gie_values():
    """isea plane-mode values from builtins.gie:2367-2384 (0.1 mm tol)
    and the +mode=hex +resolution=31 overflow -> error case."""
    import numpy as np

    from proj_4_spark.engine.plan import create_operation

    D = np.pi / 180
    op = create_operation("+proj=isea +a=6400000")
    lon = np.array([2.0, 2.0, -2.0, -2.0]) * D
    lat = np.array([1.0, -1.0, 1.0, -1.0]) * D
    x, y, _, _ = op.apply(lon, lat, np.zeros(4), np.zeros(4))
    exp = [(-1097074.948022474, 3442909.309037183),
           (-1097074.948264795, 3233611.728585708),
           (-1575486.353641554, 3442168.342028188),
           (-1575486.353880283, 3234352.695594706)]
    for i in range(4):
        assert abs(x[i] - exp[i][0]) < 1e-4
        assert abs(y[i] - exp[i][1]) < 1e-4

    op2 = create_operation("+proj=isea +mode=hex +resolution=31")
    x2, _, _, _ = op2.apply(np.zeros(1), np.zeros(1), np.zeros(1), np.zeros(1))
    assert np.isnan(x2[0])


def test_karney_geodesic_direct_golden():
    """Direct problem vs the same 20-case table (lat1,lon1,azi1,s12 ->
    lat2,lon2,azi2,a12) and inverse->direct roundtrip closure."""
    import re

    import numpy as np

    from proj_4_spark.kernels.geodesic import Geodesic

    src = open("/root/reference/src/tests/geodtest.cpp").read()
    blob = src[src.index("testcases[20][12] = {"):]
    blob = blob[blob.index("{", 20):blob.index("};")]
    nums = re.findall(r"-?\d+\.?\d*(?:[eE][-+]?\d+)?", blob)
    cases = np.array([float(x) for x in nums]).reshape(20, 12)
    lat1, lon1, azi1, lat2, lon2, azi2, s12, a12 = (cases[:, i] for i in range(8))
    g = Geodesic(6378137.0, 1 / 298.257223563)
    LA2, LO2, A2, A12 = g.direct(lat1, lon1, azi1, s12)

    def angdiff(a, b):
        d = np.remainder(a - b, 360.0)
        return np.minimum(d, 360 - d)

    assert np.abs(LA2 - lat2).max() < 1e-12
    assert angdiff(LO2, lon2).max() < 1e-12
    assert np.abs(A2 - azi2).max() < 1e-12
    assert np.abs(A12 - a12).max() < 1e-12

    # inverse -> direct closure on a pseudo-random grid
    rng = np.random.Generator(np.random.PCG64(3))
    la1 = rng.uniform(-85, 85, 50)
    lo1 = rng.uniform(-180, 180, 50)
    la2 = rng.uniform(-85, 85, 50)
    lo2 = rng.uniform(-180, 180, 50)
    S, A1, _, _ = g.inverse(la1, lo1, la2, lo2)
    LA, LO, _, _ = g.direct(la1, lo1, A1, S)
    assert np.abs(LA - la2).max() < 1e-11
    assert angdiff(LO, lo2).max() < 1e-11


def test_common_epsg_presets():
    """High-traffic +init=epsg: codes added beyond the GIGS set, pinned
    against public worked examples: the Ordnance Survey's British
    National Grid example (OSGB36 geographic -> grid, mm-exact) and the
    swisstopo LV03 fundamental point; Lambert-93 must equal the IGNF
    registry's identical definition; everything roundtrips."""
    import numpy as np

    from proj_4_spark.engine.plan import create_operation
    from proj_4_spark.engine.projstring import dmstor

    D = np.pi / 180
    op = create_operation("+init=epsg:27700", emulation=False)
    x, y, _, _ = op.apply(np.array([dmstor('1d43\'4.5177"E')]),
                          np.array([dmstor('52d39\'27.2531"N')]),
                          np.zeros(1), np.zeros(1))
    assert abs(x[0] - 651409.903) < 1e-3
    assert abs(y[0] - 313177.270) < 1e-3

    op = create_operation("+init=epsg:21781", emulation=False)
    x, y, _, _ = op.apply(np.array([dmstor('7d26\'22.50"E')]),
                          np.array([dmstor('46d57\'08.66"N')]),
                          np.zeros(1), np.zeros(1))
    assert abs(x[0] - 600000.0) < 1e-6 and abs(y[0] - 200000.0) < 1e-6

    a = create_operation("+init=epsg:2154", emulation=False)
    b = create_operation("+init=IGNF:LAMB93", emulation=False)
    lon, lat = np.array([2.0 * D]), np.array([48.0 * D])
    xa, ya, _, _ = a.apply(lon, lat, np.zeros(1), np.zeros(1))
    xb, yb, _, _ = b.apply(lon, lat, np.zeros(1), np.zeros(1))
    # ellps=GRS80 vs a=.../rf=... derive es differing at the last ulp
    assert abs(xa[0] - xb[0]) < 1e-7 and abs(ya[0] - yb[0]) < 1e-7

    for code, lon_d, lat_d in [(3035, 10, 52), (3413, -40, 75),
                               (3031, 10, -75), (5070, -96, 37),
                               (2056, 8, 47), (2180, 19, 52)]:
        op = create_operation(f"+init=epsg:{code}", emulation=False)
        x, y, _, _ = op.apply(np.array([lon_d * D]), np.array([lat_d * D]),
                              np.zeros(1), np.zeros(1))
        lo, la, _, _ = op.apply(x, y, np.zeros(1), np.zeros(1), "inv")
        assert abs(lo[0] / D - lon_d) < 1e-9
        assert abs(la[0] / D - lat_d) < 1e-9


def test_geodesic_dataframe_surface(spark):
    """geod-app equivalents as DataFrame columns: inverse then direct
    must close on the second point (Spark surface of kernels/geodesic)."""
    import numpy as np
    from pyspark.sql import functions as F

    from proj_4_spark.engine.spark import geodesic_direct_df, geodesic_inverse_df

    df = spark.range(0, 500).select(
        ((F.col("id") * 7919 % 340000) / 1000.0 - 170.0).alias("lon1"),
        ((F.col("id") * 104729 % 160000) / 1000.0 - 80.0).alias("lat1"),
        ((F.col("id") * 15013 % 340000) / 1000.0 - 170.0).alias("lon2"),
        ((F.col("id") * 32341 % 160000) / 1000.0 - 80.0).alias("lat2"),
    )
    inv = geodesic_inverse_df(df, "lon1", "lat1", "lon2", "lat2")
    out = geodesic_direct_df(inv, "lon1", "lat1", "geo_azi1", "geo_s12",
                             out_prefix="d_").toPandas()
    assert np.abs(out["d_lat2"] - out["lat2"]).max() < 1e-9
    dlon = np.abs((out["d_lon2"] - out["lon2"] + 180.0) % 360.0 - 180.0)
    assert dlon.max() < 1e-8


def test_binary_uv_stream_roundtrip_and_cli_parity():
    """The `proj -b` wire format (src/apps/proj.cpp:65-67,127-130):
    raw native float64 PJ_UV records, radians in, meters out — byte
    roundtrip exact, and the stream transform equals the ASCII-path
    engine value-for-value (builtins.gie:6102 vector)."""
    import numpy as np

    from proj_4_spark.engine.plan import create_operation
    from proj_4_spark.sources.binary_stream import (
        decode_uv, encode_uv, proj_binary_stream,
    )

    deg = np.pi / 180
    u = np.array([12 * deg, 8.5 * deg, -72 * deg])
    v = np.array([56 * deg, 47.25 * deg, -33 * deg])
    blob = encode_uv(u, v)
    u2, v2 = decode_uv(blob)
    assert np.array_equal(u, u2) and np.array_equal(v, v2)
    # trailing partial record ignored (fread semantics)
    u3, _ = decode_uv(blob + b"\x00" * 7)
    assert len(u3) == 3

    out = proj_binary_stream(blob, "+proj=utm +zone=32 +ellps=GRS80")
    x, y = decode_uv(out)
    op = create_operation("+proj=utm +zone=32 +ellps=GRS80", emulation=False)
    ex, ey, _, _ = op.apply(u, v, np.zeros(3), np.zeros(3))
    assert np.array_equal(x, ex) and np.array_equal(y, ey)
    assert x[0] == pytest.approx(687071.43910944, abs=1e-7)  # gie pin

    # inverse direction round-trips the stream
    back = proj_binary_stream(out, "+proj=utm +zone=32 +ellps=GRS80",
                              direction="inv")
    bu, bv = decode_uv(back)
    assert np.allclose(bu, u, atol=1e-12) and np.allclose(bv, v, atol=1e-12)


def test_binary_uv_stream_spark_source(spark, tmp_path):
    import numpy as np

    from proj_4_spark.sources.binary_stream import encode_uv, read_uv_stream_df

    deg = np.pi / 180
    rng = np.random.Generator(np.random.PCG64(3))
    for i in range(3):  # three shard files = three parallel tasks
        u = rng.uniform(-3, 3, 50) * deg * 57
        v = rng.uniform(-80, 80, 50) * deg
        (tmp_path / f"shard{i}.bin").write_bytes(
            encode_uv(u * 0 + rng.uniform(-1, 1, 50), v))
    df = read_uv_stream_df(spark, str(tmp_path),
                           projstring="+proj=merc +ellps=GRS80")
    got = df.toPandas()
    assert len(got) == 150
    assert set(got["idx"]) == set(range(50))
    assert got["x"].notna().all()
    # x = a * lam for merc: exact linear relation
    assert np.allclose(got["x"], 6378137.0 * got["u"], rtol=1e-15)


def test_webmerc_jvm_fast_path_parity(spark):
    """The JVM-expression webmerc twin must agree with the Arrow-UDF
    kernel path on values (<=1e-6 m; cross-libm ulp only) AND on the
    exact NaN pattern for every error class: null/NaN inputs, |lam|>10
    rad, poles within/beyond 1e-10, adjlon wrap cases — and the plan
    must contain no Python eval."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from proj_4_spark.engine.spark import transform

    lons = [-541.0, -200.0, -180.0, -179.999999, -96.0, -1e-17, 0.0,
            1e-17, 91.3, 179.999999, 180.0, 200.0, 541.0, 572.0, 574.0,
            None, float("nan"), 45.0]
    lats = [-90.1, -90.0, -89.99999999999, -85.051128, -45.0, -2e-17,
            0.0, 2e-17, 45.0, 85.051128, 89.99999999999, 90.0, 90.1,
            None, float("nan"), 33.3, 66.6, -12.0]
    pdf = pd.DataFrame({"lon": lons * len(lats),
                        "lat": np.repeat(lats, len(lons))})
    df = spark.createDataFrame(pdf)

    fast = transform(df, "+proj=webmerc +ellps=WGS84", x="lon", y="lat",
                     out_prefix="f_")
    slow = transform(df, "+proj=webmerc +ellps=WGS84", x="lon", y="lat",
                     out_prefix="s_", jvm_fast_path=False)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    splan = slow._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in splan or "BatchEvalPython" in splan

    fp = fast.toPandas().sort_values(["lon", "lat"]).reset_index(drop=True)
    sp = slow.toPandas().sort_values(["lon", "lat"]).reset_index(drop=True)
    for c in ("x", "y"):
        a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
        b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
        assert (np.isnan(a) == np.isnan(b)).all(), c
        m = ~np.isnan(a)
        assert np.allclose(a[m], b[m], rtol=0, atol=1e-6), (
            c, np.abs(a[m] - b[m]).max())

    # keep_errors=False drops the same rows on both paths
    nf = transform(df, "+proj=webmerc +ellps=WGS84", x="lon", y="lat",
                   keep_errors=False).count()
    ns = transform(df, "+proj=webmerc +ellps=WGS84", x="lon", y="lat",
                   keep_errors=False, jvm_fast_path=False).count()
    assert nf == ns

    # r6: datum-modified (hub-leg) webmerc now takes the COMPOSED
    # datum+projection twin (datum=NAD83 wires a cart/cart_wgs84 leg;
    # values covered by test_datum_modified_jvm_fast_path_parity) —
    # grid-backed datums still refuse
    hub = transform(df, "+proj=webmerc +datum=NAD83", x="lon", y="lat")
    hplan = hub._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in hplan
    grid = transform(df, "+proj=webmerc +datum=NAD27", x="lon", y="lat")
    assert "EvalPython" in \
        grid._jdf.queryExecution().executedPlan().toString()
    # inverse webmerc now has its OWN closed-form twin (r5): no
    # Python eval, values covered by test_inverse_jvm_fast_path_parity
    inv = transform(df, "+proj=webmerc +ellps=WGS84", x="lon", y="lat",
                    direction="inv")
    assert "EvalPython" not in \
        inv._jdf.queryExecution().executedPlan().toString()


def test_webmerc_plus_inv_projstring_stays_on_udf_path(spark):
    """'+proj=webmerc ... +inv' builds Operation(inverted=True): calling
    transform(direction='fwd') must run the INVERSE kernel via the UDF
    path, never the forward-only JVM twin (ADVICE r4, high)."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    pdf = pd.DataFrame({"lon": [-10000000.0, 0.0, 5000000.0],
                        "lat": [-4000000.0, 0.0, 4000000.0]})
    df = spark.createDataFrame(pdf)
    res = transform(df, "+proj=webmerc +ellps=WGS84 +inv", x="lon",
                    y="lat", degrees=False, out_prefix="o_")
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" in plan, "inverted op must not take the JVM twin"

    # values must equal the explicit inverse direction (true inverse
    # webmerc: metres -> radians), not a forward projection of metres
    ref = transform(df, "+proj=webmerc +ellps=WGS84", x="lon", y="lat",
                    degrees=False, direction="inv", out_prefix="r_")
    a = res.toPandas().sort_values("lon")
    b = ref.toPandas().sort_values("lon")
    assert np.allclose(a["o_x"], b["r_x"], rtol=0, atol=1e-12)
    assert np.allclose(a["o_y"], b["r_y"], rtol=0, atol=1e-12)
    # sanity: output is angular (radians), not metres
    assert np.abs(a["o_y"].to_numpy()).max() < np.pi


def test_karney_kernel_emits_no_runtime_warnings():
    """Masked-lane arithmetic (near-coincident, near-antipodal,
    identical, NaN inputs) must be wrapped in np.errstate — the kNN
    oracle run should be warning-clean (VERDICT r4 item 5)."""
    import warnings

    import numpy as np

    from proj_4_spark.kernels.geodesic import (
        geodesic_direct,
        geodesic_inverse_karney,
    )

    rng = np.random.default_rng(7)
    lat = rng.uniform(-89.9, 89.9, 5000)
    lon = rng.uniform(-180.0, 180.0, 5000)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        geodesic_inverse_karney(lat, lon, lat + 1e-10, lon + 1e-10)
        geodesic_inverse_karney(lat, lon, -lat, lon + 179.7)
        geodesic_inverse_karney(lat, lon, lat, lon)
        geodesic_inverse_karney(np.array([np.nan, 10.0]),
                                np.array([0.0, np.nan]),
                                np.array([1.0, 2.0]), np.array([3.0, 4.0]))
        geodesic_direct(lat, lon, rng.uniform(0, 360, 5000),
                        rng.uniform(0, 2e7, 5000))
        # r6: prolate (f<0) near-antipodal pairs drive the astroid
        # fallback's -y*(1+k)/k lane where k can be 0 in the masked
        # branch (geodesic.py:595) — the last unwrapped divide
        geodesic_inverse_karney(lon, lat, lon + np.pi * 0.999, -lat,
                                f=-1 / 300.0)
        geodesic_inverse_karney(lon, lat, lon + np.pi, -lat)
    runtime = [x for x in w if issubclass(x.category, RuntimeWarning)]
    assert not runtime, [str(x.message) for x in runtime[:5]]


def test_merc_jvm_fast_path_parity(spark):
    """The r5 merc JVM twin (spherical AND ellipsoidal tsfn forward)
    agrees with the Arrow-UDF kernel path on values (<=1e-6 m) and the
    exact NaN pattern, for plain merc, lat_ts-scaled merc, and sphere
    merc; the plan contains no Python eval."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from proj_4_spark.engine.spark import transform

    lons = [-541.0, -180.0, -96.0, 0.0, 91.3, 180.0, 200.0, None,
            float("nan"), 45.0]
    lats = [-90.1, -90.0, -89.99999999999, -45.0, 0.0, 2e-17, 45.0,
            89.99999999999, 90.0, None]
    pdf = pd.DataFrame({"lon": lons * len(lats),
                        "lat": np.repeat(lats, len(lons))})
    df = spark.createDataFrame(pdf)

    for ps in ("+proj=merc +ellps=GRS80",
               "+proj=merc +ellps=WGS84 +lat_ts=30",
               "+proj=merc +R=6371000",
               "+proj=merc +ellps=intl +lon_0=12 +x_0=100000"):
        fast = transform(df, ps, x="lon", y="lat", out_prefix="f_")
        slow = transform(df, ps, x="lon", y="lat", out_prefix="s_",
                         jvm_fast_path=False)
        plan = fast._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, ps
        fp = fast.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        sp = slow.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        for c in ("x", "y"):
            a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            assert (np.isnan(a) == np.isnan(b)).all(), (ps, c)
            m = ~np.isnan(a)
            assert np.allclose(a[m], b[m], rtol=0, atol=1e-6), (
                ps, c, np.abs(a[m] - b[m]).max())

    # r6: datum-modified merc takes the composed twin; the
    # ellipsoidal inverse still iterates (UDF)
    hub = transform(df, "+proj=merc +datum=NAD83", x="lon", y="lat")
    assert "EvalPython" not in \
        hub._jdf.queryExecution().executedPlan().toString()
    # ellipsoidal merc inverse compiles to the r7 staged phi2 twin
    inv = transform(df, "+proj=merc +ellps=GRS80", x="lon", y="lat",
                    direction="inv")
    assert "EvalPython" not in \
        inv._jdf.queryExecution().executedPlan().toString()


def test_etmerc_jvm_fast_path_parity(spark):
    """The Poder-Engsager etmerc/utm/tmerc JVM twin (staged Catalyst
    projections) agrees with the Arrow-UDF kernel path on values
    (<=1e-6 m) and the exact NaN pattern; the plan contains no Python
    eval.  Guards: +algo=auto / approx / datum-modified / inverse stay
    on the UDF path."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    lons = [-541.0, -180.0, -96.0, 0.0, 9.01, 12.0, 91.3, 179.99,
            200.0, None, float("nan"), 45.0]
    lats = [-90.1, -90.0, -89.9999, -45.0, 0.0, 2e-17, 45.0, 56.0,
            89.9999, 90.0, None, 33.3]
    pdf = pd.DataFrame({"lon": lons * len(lats),
                        "lat": np.repeat(lats, len(lons))})
    df = spark.createDataFrame(pdf)

    for ps in ("+proj=utm +zone=32 +ellps=GRS80",
               "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
               "+x_0=400000 +y_0=-100000 +ellps=airy",
               "+proj=etmerc +lon_0=9 +k=0.9996 +x_0=500000 "
               "+ellps=WGS84 +units=us-ft",
               "+proj=utm +zone=56 +south +ellps=GRS80"):
        fast = transform(df, ps, x="lon", y="lat", out_prefix="f_",
                         jvm_fast_path="all")
        plan = fast._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, ps
        slow = transform(df, ps, x="lon", y="lat", out_prefix="s_",
                         jvm_fast_path=False)
        fp = fast.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        sp = slow.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        for c in ("x", "y"):
            a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            assert (np.isnan(a) == np.isnan(b)).all(), (ps, c)
            m = ~np.isnan(a)
            assert np.allclose(a[m], b[m], rtol=0, atol=1e-6), (
                ps, c, np.abs(a[m] - b[m]).max())

    # DEFAULT-ON since r7 (the r5 JIT cliff does not reproduce with
    # the SQL-staged shape, PLANS.md): plain transform() of a bare utm
    # forward is Python-free
    dflt = transform(df, "+proj=utm +zone=32 +ellps=GRS80", x="lon",
                     y="lat")
    assert "EvalPython" not in \
        dflt._jdf.queryExecution().executedPlan().toString()

    # guards
    for ps in ("+proj=tmerc +algo=auto +lon_0=9 +ellps=WGS84",
               "+proj=tmerc +approx +lon_0=9 +ellps=WGS84",
               "+proj=utm +zone=32 +datum=NAD83"):
        p = transform(df, ps, x="lon", y="lat", jvm_fast_path="all")
        assert "EvalPython" in \
            p._jdf.queryExecution().executedPlan().toString(), ps
    # the Poder-Engsager INVERSE is a staged twin since late r7
    # (parity pinned in test_iter_inverse_jvm_fast_path_parity)
    inv = transform(df, "+proj=utm +zone=32 +ellps=GRS80", x="lon",
                    y="lat", direction="inv", jvm_fast_path="all")
    assert "EvalPython" not in \
        inv._jdf.queryExecution().executedPlan().toString()


def test_eqc_jvm_fast_path_parity(spark):
    """The eqc Catalyst twin (pure linear scaling) agrees with the UDF
    path on values and NaN pattern — including the pole rows, which
    are VALID for eqc (unlike merc)."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    lons = [-541.0, -180.0, 0.0, 91.3, 200.0, None, float("nan")]
    lats = [-90.1, -90.0, -45.0, 0.0, 45.0, 90.0, None]
    pdf = pd.DataFrame({"lon": lons * len(lats),
                        "lat": np.repeat(lats, len(lons))})
    df = spark.createDataFrame(pdf)
    for ps in ("+proj=eqc +ellps=WGS84",
               "+proj=eqc +lat_ts=30 +lat_0=10 +lon_0=12 +R=6371000"):
        fast = transform(df, ps, x="lon", y="lat", out_prefix="f_")
        assert "EvalPython" not in \
            fast._jdf.queryExecution().executedPlan().toString(), ps
        slow = transform(df, ps, x="lon", y="lat", out_prefix="s_",
                         jvm_fast_path=False)
        fp = fast.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        sp = slow.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        for c in ("x", "y"):
            a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            assert (np.isnan(a) == np.isnan(b)).all(), (ps, c)
            m = ~np.isnan(a)
            assert np.allclose(a[m], b[m], rtol=0, atol=1e-6), (ps, c)


def test_cea_jvm_fast_path_parity(spark):
    """The cea Catalyst twin (sphere + ellipsoidal authalic q) matches
    the UDF path, including lat_ts-scaled and R_A-free variants."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    lons = [-541.0, -180.0, 0.0, 91.3, 200.0, None, float("nan")]
    lats = [-90.1, -90.0, -45.0, 0.0, 45.0, 90.0, None]
    pdf = pd.DataFrame({"lon": lons * len(lats),
                        "lat": np.repeat(lats, len(lons))})
    df = spark.createDataFrame(pdf)
    for ps in ("+proj=cea +ellps=WGS84",
               "+proj=cea +lat_ts=30 +lon_0=12 +ellps=GRS80",
               "+proj=cea +lat_ts=30 +R=6371000"):
        fast = transform(df, ps, x="lon", y="lat", out_prefix="f_")
        assert "EvalPython" not in \
            fast._jdf.queryExecution().executedPlan().toString(), ps
        slow = transform(df, ps, x="lon", y="lat", out_prefix="s_",
                         jvm_fast_path=False)
        fp = fast.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        sp = slow.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        for c in ("x", "y"):
            a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            assert (np.isnan(a) == np.isnan(b)).all(), (ps, c)
            m = ~np.isnan(a)
            assert np.allclose(a[m], b[m], rtol=0, atol=1e-6), (ps, c)


def test_lcc_aea_jvm_fast_path_parity(spark):
    """The lcc and aea/leac Catalyst twins match the UDF path on
    values and NaN pattern (wrong-side-of-cone poles NaN for lcc,
    rho^2<0 NaN for aea), for 1SP/2SP lcc, Michigan k_0, sphere and
    ellipsoid variants."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    lons = [-541.0, -180.0, 0.0, 91.3, 200.0, None, float("nan")]
    lats = [-90.1, -90.0, -89.9999, -45.0, 0.0, 45.0, 89.9999, 90.0,
            None]
    pdf = pd.DataFrame({"lon": lons * len(lats),
                        "lat": np.repeat(lats, len(lons))})
    df = spark.createDataFrame(pdf)
    for ps in (
        "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96 +ellps=GRS80",
        "+proj=lcc +lat_1=49 +lat_0=49 +lon_0=-95 +k_0=0.9998 +ellps=clrk66",
        "+proj=lcc +lat_1=-33 +lat_2=-45 +lat_0=-23 +lon_0=140 +R=6371000",
        "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +ellps=GRS80",
        "+proj=aea +lat_1=29.5 +lat_2=45.5 +R=6371000",
        "+proj=leac +lat_1=45 +ellps=WGS84",
    ):
        fast = transform(df, ps, x="lon", y="lat", out_prefix="f_")
        assert "EvalPython" not in \
            fast._jdf.queryExecution().executedPlan().toString(), ps
        slow = transform(df, ps, x="lon", y="lat", out_prefix="s_",
                         jvm_fast_path=False)
        fp = fast.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        sp = slow.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        for c in ("x", "y"):
            a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            assert (np.isnan(a) == np.isnan(b)).all(), (
                ps, c, fp[np.isnan(a) != np.isnan(b)][["lon", "lat"]])
            m = ~np.isnan(a)
            # 1e-6 m absolute at working magnitudes; rtol covers the
            # cross-libm pow() ulp on degenerate near-pole rho values
            # (|y| ~ 1e10 m at lat 89.9999 on the far cone side)
            assert np.allclose(a[m], b[m], rtol=1e-9, atol=1e-6), (
                ps, c, np.abs(a[m] - b[m]).max())


def test_stere_jvm_fast_path_parity(spark):
    """The stere/ups Catalyst twin matches the UDF path across all four
    aspect modes, sphere and ellipsoid, incl. UPS and the antipodal
    NaN rows."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    lons = [-541.0, -180.0, -90.0, 0.0, 91.3, 179.99, 200.0, None,
            float("nan")]
    lats = [-90.1, -90.0, -89.9999, -45.0, 0.0, 45.0, 89.9999, 90.0,
            None]
    pdf = pd.DataFrame({"lon": lons * len(lats),
                        "lat": np.repeat(lats, len(lons))})
    df = spark.createDataFrame(pdf)
    for ps in (
        "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +ellps=WGS84",   # N polar
        "+proj=stere +lat_0=-90 +lat_ts=-71 +ellps=WGS84",            # S polar
        "+proj=stere +lat_0=52 +lon_0=5 +k=0.9999 +ellps=bessel",     # oblique e
        "+proj=stere +lat_0=0 +lon_0=20 +ellps=GRS80",                # equat e
        "+proj=stere +lat_0=90 +R=6371000",                           # N polar s
        "+proj=stere +lat_0=40 +lon_0=-100 +R=6371000",               # oblique s
        "+proj=stere +lat_0=0 +R=6371000",                            # equat s
        "+proj=ups +ellps=WGS84",
        "+proj=ups +south +ellps=WGS84",
    ):
        fast = transform(df, ps, x="lon", y="lat", out_prefix="f_")
        assert "EvalPython" not in \
            fast._jdf.queryExecution().executedPlan().toString(), ps
        slow = transform(df, ps, x="lon", y="lat", out_prefix="s_",
                         jvm_fast_path=False)
        fp = fast.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        sp = slow.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        for c in ("x", "y"):
            a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            assert (np.isnan(a) == np.isnan(b)).all(), (
                ps, c, fp[np.isnan(a) != np.isnan(b)][["lon", "lat"]])
            m = ~np.isnan(a)
            assert np.allclose(a[m], b[m], rtol=1e-9, atol=1e-6), (
                ps, c, np.abs(a[m] - b[m]).max())


def test_laea_jvm_fast_path_parity(spark):
    """The laea Catalyst twin matches the UDF path across all aspect
    modes, sphere and ellipsoid, incl. EPSG:3035 (ETRS89-LAEA Europe)
    and the antipodal NaN rows."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    lons = [-541.0, -180.0, -90.0, 0.0, 10.0, 91.3, 170.0, 200.0,
            None, float("nan")]
    lats = [-90.1, -90.0, -89.9999, -52.0, -45.0, 0.0, 45.0, 52.0,
            89.9999, 90.0]
    pdf = pd.DataFrame({"lon": lons * len(lats),
                        "lat": np.repeat(lats, len(lons))})
    df = spark.createDataFrame(pdf)
    for ps in (
        "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
        "+ellps=GRS80",                                   # EPSG:3035 oblique
        "+proj=laea +lat_0=90 +lon_0=0 +ellps=WGS84",     # N polar e
        "+proj=laea +lat_0=-90 +ellps=WGS84",             # S polar e
        "+proj=laea +lat_0=0 +lon_0=20 +ellps=GRS80",     # equatorial e
        "+proj=laea +lat_0=40 +lon_0=-100 +R=6371000",    # oblique s
        "+proj=laea +lat_0=90 +R=6371000",                # polar s
        "+proj=laea +lat_0=0 +R=6371000",                 # equatorial s
    ):
        fast = transform(df, ps, x="lon", y="lat", out_prefix="f_")
        assert "EvalPython" not in \
            fast._jdf.queryExecution().executedPlan().toString(), ps
        slow = transform(df, ps, x="lon", y="lat", out_prefix="s_",
                         jvm_fast_path=False)
        fp = fast.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        sp = slow.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        for c in ("x", "y"):
            a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            assert (np.isnan(a) == np.isnan(b)).all(), (
                ps, c, fp[np.isnan(a) != np.isnan(b)][["lon", "lat"]])
            m = ~np.isnan(a)
            assert np.allclose(a[m], b[m], rtol=1e-9, atol=1e-6), (
                ps, c, np.abs(a[m] - b[m]).max())


def test_sterea_jvm_fast_path_parity(spark):
    """The sterea (Gauss double projection) Catalyst twin matches the
    UDF path — incl. the RD New (EPSG:28992) parameters."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    lons = [-541.0, -180.0, 0.0, 5.38, 91.3, 200.0, None, float("nan")]
    lats = [-90.1, -90.0, -45.0, 0.0, 45.0, 52.16, 90.0, None]
    pdf = pd.DataFrame({"lon": lons * len(lats),
                        "lat": np.repeat(lats, len(lons))})
    df = spark.createDataFrame(pdf)
    for ps in (
        "+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889 "
        "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel",  # RD New
        "+proj=sterea +lat_0=-30 +lon_0=20 +ellps=GRS80",
    ):
        fast = transform(df, ps, x="lon", y="lat", out_prefix="f_")
        assert "EvalPython" not in \
            fast._jdf.queryExecution().executedPlan().toString(), ps
        slow = transform(df, ps, x="lon", y="lat", out_prefix="s_",
                         jvm_fast_path=False)
        fp = fast.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        sp = slow.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        for c in ("x", "y"):
            a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            assert (np.isnan(a) == np.isnan(b)).all(), (ps, c)
            m = ~np.isnan(a)
            assert np.allclose(a[m], b[m], rtol=1e-9, atol=1e-6), (
                ps, c, np.abs(a[m] - b[m]).max())


def test_inverse_jvm_fast_path_parity(spark):
    """The INVERSE Catalyst twins (webmerc / spherical merc / eqc:
    tile->lon/lat style workloads) match the UDF path; ellipsoidal
    merc inverse compiles to the r7 staged phi2 twin (parity pinned in
    test_iter_inverse_jvm_fast_path_parity)."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    xs = [-30e6, -20037508.34, -1e7, 0.0, 5e6, 2.1e7, None, float("nan")]
    ys = [-3e7, -2e7, -5e6, 0.0, 5e6, 2e7, 3e7, None]
    pdf = pd.DataFrame({"px": xs * len(ys), "py": np.repeat(ys, len(xs))})
    df = spark.createDataFrame(pdf)
    for ps in ("+proj=webmerc +ellps=WGS84",
               "+proj=merc +R=6371000 +lat_ts=30 +x_0=10000",
               "+proj=eqc +lat_ts=30 +lat_0=10 +lon_0=12 +ellps=WGS84",
               "+proj=webmerc +ellps=WGS84 +units=km"):
        fast = transform(df, ps, x="px", y="py", direction="inv",
                         out_prefix="f_")
        assert "EvalPython" not in \
            fast._jdf.queryExecution().executedPlan().toString(), ps
        slow = transform(df, ps, x="px", y="py", direction="inv",
                         out_prefix="s_", jvm_fast_path=False)
        fp = fast.toPandas().sort_values(["px", "py"]).reset_index(
            drop=True)
        sp = slow.toPandas().sort_values(["px", "py"]).reset_index(
            drop=True)
        for c in ("x", "y"):
            a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            assert (np.isnan(a) == np.isnan(b)).all(), (ps, c)
            m = ~np.isnan(a)
            assert np.allclose(a[m], b[m], rtol=0, atol=1e-9), (
                ps, c, np.abs(a[m] - b[m]).max())
    # ellipsoidal merc inverse is a twin since r7 (staged phi2 unroll)
    p = transform(df, "+proj=merc +ellps=GRS80", x="px", y="py",
                  direction="inv")
    assert "EvalPython" not in \
        p._jdf.queryExecution().executedPlan().toString()


def test_somerc_krovak_jvm_fast_path_parity(spark):
    """The somerc (Swiss CH1903/LV95) and krovak (S-JTSK) Catalyst
    twins match the UDF path."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    lons = [-541.0, -180.0, 0.0, 7.44, 16.85, 91.3, 200.0, None,
            float("nan")]
    lats = [-90.1, -89.0, -45.0, 0.0, 46.95, 49.2, 89.0, 90.0, None]
    pdf = pd.DataFrame({"lon": lons * len(lats),
                        "lat": np.repeat(lats, len(lons))})
    df = spark.createDataFrame(pdf)
    for ps in (
        "+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333 "
        "+k_0=1 +x_0=2600000 +y_0=1200000 +ellps=bessel",   # LV95
        "+proj=krovak +ellps=bessel",                        # S-JTSK bare
        "+proj=krovak +czech +ellps=bessel",
    ):
        fast = transform(df, ps, x="lon", y="lat", out_prefix="f_")
        assert "EvalPython" not in \
            fast._jdf.queryExecution().executedPlan().toString(), ps
        slow = transform(df, ps, x="lon", y="lat", out_prefix="s_",
                         jvm_fast_path=False)
        fp = fast.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        sp = slow.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        for c in ("x", "y"):
            a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            assert (np.isnan(a) == np.isnan(b)).all(), (
                ps, c, fp[np.isnan(a) != np.isnan(b)][["lon", "lat"]])
            m = ~np.isnan(a)
            assert np.allclose(a[m], b[m], rtol=1e-9, atol=1e-6), (
                ps, c, np.abs(a[m] - b[m]).max())


def test_sinu_eqdc_jvm_fast_path_parity(spark):
    """The sinu and eqdc Catalyst twins (flat mlfn meridional-arc
    series) match the UDF path, sphere and ellipsoid."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    lons = [-541.0, -180.0, 0.0, 91.3, 200.0, None, float("nan")]
    lats = [-90.1, -90.0, -45.0, 0.0, 45.0, 90.0, None]
    pdf = pd.DataFrame({"lon": lons * len(lats),
                        "lat": np.repeat(lats, len(lons))})
    df = spark.createDataFrame(pdf)
    for ps in ("+proj=sinu +ellps=WGS84",
               "+proj=sinu +lon_0=20 +R=6371000",
               "+proj=eqdc +lat_1=20 +lat_2=60 +lat_0=40 +lon_0=-96 "
               "+ellps=GRS80",
               "+proj=eqdc +lat_1=-20 +lat_2=-60 +R=6371000"):
        fast = transform(df, ps, x="lon", y="lat", out_prefix="f_")
        assert "EvalPython" not in \
            fast._jdf.queryExecution().executedPlan().toString(), ps
        slow = transform(df, ps, x="lon", y="lat", out_prefix="s_",
                         jvm_fast_path=False)
        fp = fast.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        sp = slow.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        for c in ("x", "y"):
            a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            assert (np.isnan(a) == np.isnan(b)).all(), (
                ps, c, fp[np.isnan(a) != np.isnan(b)][["lon", "lat"]])
            m = ~np.isnan(a)
            assert np.allclose(a[m], b[m], rtol=1e-9, atol=1e-6), (
                ps, c, np.abs(a[m] - b[m]).max())


def test_datum_pipeline_jvm_fast_path_parity(spark):
    """The cart/helmert datum-pipeline Catalyst twin (r6): towgs84-style
    cart -> helmert -> cart⁻¹ chains — incl. 7-param, +exact,
    Molodensky-Badekas, hub-composed 4-step concatenations, the
    +inv-pipeline flag and direction='inv' — plan with ZERO Python eval
    nodes and match the Arrow-UDF path on values (cross-libm ulp only)
    and on the exact NaN pattern; time-dependent helmert refuses the
    twin."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    lons = [-541.0, -200.0, -180.0, -1e-17, 0.0, 91.3, 180.0, 200.0,
            574.0, None, float("nan"), 45.0]
    lats = [-90.1, -90.0, -89.99999999999, 0.0, 45.0, 89.99999999999,
            90.0, 90.1, None, float("nan"), 33.3, -12.0]
    pdf = pd.DataFrame({"lon": lons * len(lats),
                        "lat": np.repeat(lats, len(lons))})
    pdf["h"] = np.linspace(-5000.0, 9000.0, len(pdf))
    pdf.loc[3, "h"] = np.nan
    df = spark.createDataFrame(pdf)

    P3 = ("+proj=pipeline +ellps=GRS80 +step +proj=cart "
          "+step +proj=helmert +x=10 +y=-20 +z=30 "
          "+step +proj=cart +inv")
    P7 = ("+proj=pipeline +ellps=WGS84 +step +proj=cart +ellps=bessel "
          "+step +proj=helmert +x=577.326 +y=90.129 +z=463.919 "
          "+rx=5.137 +ry=1.474 +rz=5.297 +s=2.4232 "
          "+convention=position_vector "
          "+step +inv +proj=cart +ellps=GRS80")
    PX = P7.replace("+convention", "+exact +convention")
    PMB = ("+proj=pipeline +ellps=GRS80 +step +proj=cart "
           "+step +proj=molobadekas +x=593.032 +y=26.0 +z=478.741 "
           "+rx=0.409394 +ry=-0.359705 +rz=1.86849 +s=4.0772 "
           "+px=3903453.148 +py=368135.313 +pz=5012970.306 "
           "+convention=coordinate_frame "
           "+step +inv +proj=cart +ellps=bessel")
    P4 = ("+proj=pipeline +ellps=WGS84 +step +proj=cart +ellps=bessel "
          "+step +proj=helmert +x=577 +y=90 +z=464 "
          "+step +inv +proj=helmert +x=-87 +y=-98 +z=-121 "
          "+step +inv +proj=cart +ellps=intl")
    PI = "+proj=pipeline +inv " + P3.split("+proj=pipeline ")[1]

    cases = [(P3, "fwd", True), (P3, "inv", True), (P7, "fwd", True),
             (P7, "inv", True), (PX, "fwd", True), (PMB, "fwd", True),
             (P4, "fwd", True), (PI, "fwd", True), (P3, "fwd", False)]
    for ps, direc, with_z in cases:
        kw = dict(x="lon", y="lat", direction=direc, out_prefix="f_")
        if with_z:
            kw["z"] = "h"
        fast = transform(df, ps, **kw)
        plan = fast._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, (ps, direc)
        kw["out_prefix"] = "s_"
        slow = transform(df, ps, jvm_fast_path=False, **kw)
        fp = fast.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        sp = slow.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        for c in ("x", "y", "z"):
            a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            assert (np.isnan(a) == np.isnan(b)).all(), (ps, direc, c)
            m = ~np.isnan(a)
            # x,y degrees (1e-9 deg ~ 0.1 mm), z metres
            atol = 1e-9 if c in ("x", "y") else 1e-5
            assert np.allclose(a[m], b[m], rtol=0, atol=atol), (
                ps, direc, c, np.abs(a[m] - b[m]).max())

    # guards: time-dependent helmert and grid steps stay on the UDF path
    for ps in ("+proj=pipeline +ellps=GRS80 +step +proj=cart "
               "+step +proj=helmert +x=1 +dx=0.1 +t_epoch=2000.0 "
               "+step +proj=cart +inv",
               "+proj=pipeline +ellps=GRS80 +step +proj=cart "
               "+step +omit_inv +proj=helmert +x=1 "
               "+step +proj=cart +inv"):
        guarded = transform(df, ps, x="lon", y="lat", z="h",
                            out_prefix="g_")
        assert "EvalPython" in \
            guarded._jdf.queryExecution().executedPlan().toString(), ps


def test_datum_twin_signed_zero_and_prefix_collision(spark):
    """r7 ADVICE fixes on the SQL-staged datum twin: (a) the cart-inverse
    leg preserves IEEE signed zeros (geocentric Y=-0.0 -> lon -0.0, and
    Y=+0.0, X<0 -> lon +180, Y=-0.0, X<0 -> lon -180) via the same CASE
    the Column twins' atan2_ieee uses; (b) an input column colliding
    with the _jd_ staging prefix raises a clear ValueError instead of an
    ambiguous-reference AnalysisException / silent drop."""
    import math

    import pandas as pd
    from pyspark.sql import functions as F

    from proj_4_spark.engine.spark import transform

    # cart fwd -> cart inv is the minimal shape the datum twin accepts
    # (legs must start cart-fwd / end cart-inv); lon=-0.0 deg survives
    # cart fwd as geocentric Y=-0.0, so the inverse leg's atan2 sees an
    # exact signed zero
    pdf = pd.DataFrame({
        "lon": [-0.0, 0.0, 180.0, -180.0],
        "lat": [0.0, 0.0, 0.0, 0.0],
        "h": [0.0, 0.0, 0.0, 0.0],
    })
    df = spark.createDataFrame(pdf)
    ps = ("+proj=pipeline +step +proj=cart +ellps=WGS84 "
          "+step +inv +proj=cart +ellps=WGS84")
    out = transform(df, ps, x="lon", y="lat", z="h", out_prefix="o_")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    rows = {math.copysign(1.0, r["lon"]) * (abs(r["lon"]) + 1.0): r["o_x"]
            for r in out.collect()}
    assert rows[-1.0] == 0.0 and math.copysign(1.0, rows[-1.0]) == -1.0
    assert rows[1.0] == 0.0 and math.copysign(1.0, rows[1.0]) == 1.0
    assert rows[181.0] == pytest.approx(180.0, abs=1e-9)
    assert rows[-181.0] == pytest.approx(-180.0, abs=1e-9)

    clash = df.withColumn("_jd_x", F.lit(1))
    with pytest.raises(ValueError, match="_jd_"):
        transform(clash, ps, x="lon", y="lat", z="h", out_prefix="o_")


def test_inverse_jvm_fast_path_parity_r6(spark):
    """r6 inverse twins: cea (sphere+ellipsoid authlat), laea (all
    modes, sphere+ellipsoid), spherical stere (all modes), spherical
    sinu and spherical eqdc match the UDF path exactly; the iterative
    ellipsoidal inverses (stere/sinu/eqdc) stay on the UDF path."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    xs = [-30e6, -1.2e7, -6.4e6, -1e4, 0.0, 1e4, 5e6, 1.27e7, 3e7,
          None, float("nan")]
    ys = [-3e7, -1.27e7, -5e6, -1e4, 0.0, 1e4, 6.4e6, 1.2e7, 2e7, None]
    pdf = pd.DataFrame({"px": xs * len(ys), "py": np.repeat(ys, len(xs))})
    df = spark.createDataFrame(pdf)
    twins = (
        "+proj=cea +ellps=WGS84 +lat_ts=30",
        "+proj=cea +R=6371000 +lat_ts=15 +x_0=20000",
        "+proj=laea +ellps=GRS80 +lat_0=52 +lon_0=10",   # obliq ellips
        "+proj=laea +ellps=GRS80 +lat_0=0 +lon_0=10",    # equit ellips
        "+proj=laea +ellps=GRS80 +lat_0=90",             # n_pole ellips
        "+proj=laea +ellps=GRS80 +lat_0=-90",            # s_pole ellips
        "+proj=laea +R=6371000 +lat_0=45",               # obliq sphere
        "+proj=laea +R=6371000 +lat_0=0",                # equit sphere
        "+proj=laea +R=6371000 +lat_0=90",               # n_pole sphere
        "+proj=stere +R=6371000 +lat_0=90 +lat_ts=70",   # n_pole
        "+proj=stere +R=6371000 +lat_0=-90",             # s_pole
        "+proj=stere +R=6371000 +lat_0=40",              # obliq
        "+proj=stere +R=6371000 +lat_0=0",               # equit
        "+proj=sinu +R=6371000 +lon_0=20",
        "+proj=eqdc +R=6371000 +lat_1=20 +lat_2=60 +lat_0=40",
        "+proj=eqdc +R=6371000 +lat_1=-20 +lat_2=-60",   # n < 0
        # moll family (closed-form inverse; Newton is fwd-only) r7
        "+proj=moll +R=6371000 +lon_0=20",
        "+proj=wag4 +R=6371000",
        "+proj=wag5 +R=6371000",
    )
    for ps in twins:
        fast = transform(df, ps, x="px", y="py", direction="inv",
                         out_prefix="f_")
        assert "EvalPython" not in \
            fast._jdf.queryExecution().executedPlan().toString(), ps
        slow = transform(df, ps, x="px", y="py", direction="inv",
                         out_prefix="s_", jvm_fast_path=False)
        fp = fast.toPandas().sort_values(["px", "py"]).reset_index(
            drop=True)
        sp = slow.toPandas().sort_values(["px", "py"]).reset_index(
            drop=True)
        for c in ("x", "y"):
            a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            assert (np.isnan(a) == np.isnan(b)).all(), (
                ps, c, fp[np.isnan(a) != np.isnan(b)][["px", "py"]])
            m = ~np.isnan(a)
            assert np.allclose(a[m], b[m], rtol=1e-9, atol=1e-9), (
                ps, c, np.abs(a[m] - b[m]).max())
    # robin/poly inverses keep the UDF path; stere-e/sinu-e/eqdc-e/
    # eqearth/omerc/moll moved to the r7 twins
    # (test_iter_inverse_jvm_fast_path_parity)
    for ps in ("+proj=robin +R=6371000",
               "+proj=poly +ellps=GRS80"):
        p = transform(df, ps, x="px", y="py", direction="inv")
        assert "EvalPython" in \
            p._jdf.queryExecution().executedPlan().toString(), ps
    # moll/wag4/wag5 inverses are closed-form column twins (late r7;
    # values pinned against the UDF path like the other column twins)
    p = transform(df, "+proj=moll +R=6371000", x="px", y="py",
                  direction="inv")
    assert "EvalPython" not in \
        p._jdf.queryExecution().executedPlan().toString()


def test_iter_inverse_jvm_fast_path_parity(spark):
    """r7 iterative inverse twins: lcc / aea / leac (sphere AND
    ellipsoid) and ellipsoidal merc plan with zero Python workers and
    match the UDF path — the bounded phi2/phi1 iterations unroll to
    staged SQL whose carried `done` flag freezes converged lanes, so
    the per-lane update sequence is identical to the masked NumPy
    kernels (exact NaN pattern; values agree to cross-libm ulps,
    measured <=1.2e-13 deg on this grid)."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    xs = [-3.3e7, -2.5e6, -1e6, -1e4, 0.0, 1.5e5, 2.0e6, 3.3e7,
          None, float("nan")]
    # 1e10: |y| far beyond ±745*k0*a — exp(-y/k0) overflows to +Inf on
    # the ellipsoidal-merc path and the lane must FREEZE at phi=-pi/2
    # on both the kernel and the twin (ADVICE r7: pin the overflow lane)
    ys = [-4.5e7, -1e10, -3e6, -1e6, 0.0, 1e5, 2.3e6, 5e6, 4.5e7, 1e10,
          None]
    pdf = pd.DataFrame({"px": xs * len(ys), "py": np.repeat(ys, len(xs))})
    df = spark.createDataFrame(pdf)
    twins = (
        # 2SP / 1SP+k_0 / south-opening sphere lcc, offsets + units
        "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96 +ellps=GRS80",
        "+proj=lcc +lat_1=49 +lat_0=49 +lon_0=-95 +k_0=0.9998 +ellps=clrk66",
        "+proj=lcc +lat_1=-33 +lat_2=-45 +lat_0=-23 +lon_0=140 +R=6371000",
        "+proj=lcc +lat_1=40 +lat_2=43 +lat_0=39.3 +lon_0=-77 "
        "+x_0=400000 +y_0=0 +ellps=GRS80 +units=us-ft",
        # aea ellips/sphere, north- and south-opening; leac
        "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +ellps=GRS80",
        "+proj=aea +lat_1=29.5 +lat_2=45.5 +R=6371000",
        "+proj=aea +lat_1=-29.5 +lat_2=-45.5 +lat_0=-20 +ellps=WGS84",
        "+proj=leac +lat_1=45 +ellps=WGS84",
        # ellipsoidal merc (spherical merc is a closed-form r5 twin)
        "+proj=merc +lat_ts=30 +ellps=WGS84",
        # inv_mlfn families (ellipsoidal; spherical are column twins)
        "+proj=eqdc +ellps=GRS80 +lat_1=20 +lat_2=60 +lat_0=40 "
        "+lon_0=-96",
        "+proj=eqdc +ellps=WGS84 +lat_1=-20 +lat_2=-60",   # n < 0
        "+proj=sinu +ellps=WGS84 +lon_0=20",
        "+proj=cass +ellps=GRS80 +lat_0=5 +lon_0=10 +x_0=100000",
        # Poder-Engsager inverse (non-iterative Clenshaw; late r7)
        "+proj=utm +zone=32 +ellps=GRS80",
        "+proj=utm +zone=33 +south +ellps=WGS84",
        "+proj=tmerc +lat_0=49 +lon_0=-2 +k_0=0.9996012717 "
        "+x_0=400000 +y_0=-100000 +ellps=airy",            # OSGB36
        # ellipsoidal stere/ups (8-iter conformal-lat), all aspect
        # modes (late r7; sterea's 20-iter Gauss inversion measured
        # out — see _iter_inv_sql_ok)
        "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +ellps=WGS84",
        "+proj=stere +lat_0=-90 +lat_ts=-70 +ellps=WGS84",
        "+proj=ups +ellps=WGS84",
        "+proj=stere +lat_0=52 +lon_0=5 +ellps=bessel",    # obliq
        "+proj=stere +lat_0=0 +lon_0=170 +ellps=WGS84",    # equit
        # eqearth 12-iteration Newton inverse (late r7)
        "+proj=eqearth +ellps=WGS84",
        "+proj=eqearth +R=6371000 +lon_0=150",
        # omerc inverse (closed prep + phi2; late r7)
        "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31580995 "
        "+gamma=53.13010236111111 +k_0=0.99984 +x_0=804671 "
        "+ellps=evrst69",                                  # Borneo RSO
        "+proj=omerc +lat_1=1 +lon_1=104 +lat_2=3 +lon_2=109 "
        "+k_0=1 +ellps=WGS84",                             # two-point
        "+proj=omerc +lat_0=45 +lonc=10 +alpha=30 +no_rot "
        "+ellps=WGS84",
    )
    for ps in twins:
        fast = transform(df, ps, x="px", y="py", direction="inv",
                         out_prefix="f_")
        assert "EvalPython" not in \
            fast._jdf.queryExecution().executedPlan().toString(), ps
        slow = transform(df, ps, x="px", y="py", direction="inv",
                         out_prefix="s_", jvm_fast_path=False)
        fp = fast.toPandas().sort_values(["px", "py"]).reset_index(
            drop=True)
        sp = slow.toPandas().sort_values(["px", "py"]).reset_index(
            drop=True)
        for c in ("x", "y"):
            a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            assert (np.isnan(a) == np.isnan(b)).all(), (
                ps, c, fp[np.isnan(a) != np.isnan(b)][["px", "py"]])
            m = ~np.isnan(a)
            assert np.allclose(a[m], b[m], rtol=1e-9, atol=1e-9), (
                ps, c, np.abs(a[m] - b[m]).max())
    # twin-fwd -> twin-inv roundtrip holds at the reference tolerance
    lons = [-150.0, -96.0, -20.0, 0.0, 45.0, 140.0, 179.0]
    lats = [-60.0, -33.0, 0.0, 23.0, 45.5, 70.0]
    gdf = spark.createDataFrame(pd.DataFrame(
        {"lon": lons * len(lats), "lat": np.repeat(lats, len(lons))}))
    for ps in ("+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96 "
               "+ellps=GRS80",
               "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 "
               "+ellps=GRS80",
               "+proj=merc +ellps=WGS84"):
        rt = transform(
            transform(gdf, ps, x="lon", y="lat", out_prefix="p_"),
            ps, x="p_x", y="p_y", direction="inv", out_prefix="r_")
        assert "EvalPython" not in \
            rt._jdf.queryExecution().executedPlan().toString(), ps
        rp = rt.toPandas()
        assert np.allclose(rp["r_x"], rp["lon"], atol=1e-9), ps
        assert np.allclose(rp["r_y"], rp["lat"], atol=1e-9), ps


def test_omerc_fwd_jvm_fast_path_parity(spark):
    """late-r7 omerc FORWARD staged twin: Hotine oblique Mercator
    (Borneo RSO / Alaska zone 1 / two-point / +no_rot / +no_off,
    sphere + ellipsoid) plans with zero Python workers and matches
    the UDF path (exact NaN pattern incl. the |U|=1 singularity and
    the pole lanes)."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    lons = [-541.0, -180.0, -100.0, 0.0, 45.0, 115.0, 140.0, 200.0,
            None, float("nan")]
    lats = [-90.1, -90.0, -60.0, -30.0, 0.0, 4.0, 30.0, 60.0, 90.0,
            None]
    df = spark.createDataFrame(pd.DataFrame(
        {"lon": lons * len(lats), "lat": np.repeat(lats, len(lons))}))
    for ps in (
        "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31580995 "
        "+gamma=53.13010236111111 +k_0=0.99984 +x_0=804671 "
        "+ellps=evrst69",
        "+proj=omerc +lat_0=57 +lonc=-133.6666666666667 "
        "+alpha=323.1301023611111 +gamma=323.1301023611111 "
        "+k_0=0.9999 +x_0=5000000 +y_0=-5000000 +ellps=GRS80",
        "+proj=omerc +lat_1=1 +lon_1=104 +lat_2=3 +lon_2=109 +k_0=1 "
        "+ellps=WGS84",
        "+proj=omerc +lat_0=45 +lonc=10 +alpha=30 +no_rot +ellps=WGS84",
        "+proj=omerc +lat_0=45 +lonc=10 +alpha=30 +no_off +R=6371000",
    ):
        fast = transform(df, ps, x="lon", y="lat", out_prefix="f_")
        assert "EvalPython" not in \
            fast._jdf.queryExecution().executedPlan().toString(), ps
        slow = transform(df, ps, x="lon", y="lat", out_prefix="s_",
                         jvm_fast_path=False)
        fp = fast.toPandas()
        sp = slow.toPandas()
        for c in ("x", "y"):
            a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            assert (np.isnan(a) == np.isnan(b)).all(), (ps, c)
            m = ~np.isnan(a)
            assert np.allclose(a[m], b[m], rtol=1e-9, atol=1e-6), (
                ps, c, np.abs(a[m] - b[m]).max())


def test_geos_jvm_fast_path_parity(spark):
    """late-r7 geos (geostationary satellite view) twins: BOTH
    directions closed-form, sphere + ellipsoid, sweep x/y, plan with
    zero Python workers and match the UDF path (exact NaN pattern
    incl. the ellipsoidal visibility check and the det<0 horizon)."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    lons = [-541.0, -180.0, -100.0, -75.0, 0.0, 45.0, 100.0, 200.0,
            None, float("nan")]
    lats = [-90.1, -90.0, -60.0, -30.0, 0.0, 30.0, 60.0, 81.0, 90.0,
            None]
    fdf = spark.createDataFrame(pd.DataFrame(
        {"lon": lons * len(lats), "lat": np.repeat(lats, len(lons))}))
    xs = [-5.5e6, -3e6, -1e6, 0.0, 1e6, 3e6, 5.5e6, 6e6, None,
          float("nan")]
    ys = [-6e6, -5.5e6, -2e6, 0.0, 2e6, 5.5e6, 6e6, None]
    idf = spark.createDataFrame(pd.DataFrame(
        {"px": xs * len(ys), "py": np.repeat(ys, len(xs))}))
    for ps in ("+proj=geos +h=35785831.0 +lon_0=-75 +sweep=x "
               "+ellps=GRS80",                        # GOES-East style
               "+proj=geos +h=35785831.0 +lon_0=0 +ellps=WGS84",
               "+proj=geos +h=35785831.0 +R=6371000"):
        for direc, df, cols in (("fwd", fdf, ("lon", "lat")),
                                ("inv", idf, ("px", "py"))):
            fast = transform(df, ps, x=cols[0], y=cols[1],
                             direction=direc, out_prefix="f_")
            assert "EvalPython" not in \
                fast._jdf.queryExecution().executedPlan().toString(), (
                    ps, direc)
            slow = transform(df, ps, x=cols[0], y=cols[1],
                             direction=direc, out_prefix="s_",
                             jvm_fast_path=False)
            fp = fast.toPandas()
            sp = slow.toPandas()
            for c in ("x", "y"):
                a = fp[f"f_{c}"].to_numpy(dtype=np.float64,
                                          na_value=np.nan)
                b = sp[f"s_{c}"].to_numpy(dtype=np.float64,
                                          na_value=np.nan)
                assert (np.isnan(a) == np.isnan(b)).all(), (ps, direc,
                                                            c)
                m = ~np.isnan(a)
                assert np.allclose(a[m], b[m], rtol=1e-9, atol=1e-6), (
                    ps, direc, c, np.abs(a[m] - b[m]).max())


def test_datum_modified_jvm_fast_path_parity(spark):
    """r6 composed twin: a SINGLE datum-modified op (+towgs84 / +datum
    cs2cs-emulation hooks) compiles to datum legs + the projection's
    expression twin — the dominant catalog-preset shape runs with ZERO
    Python workers in both directions.  Values match the Arrow-UDF path
    (rtol covers pow/tan ulp amplification at degenerate latitudes, the
    same bound the bare twins pin) and the NaN pattern is exact —
    including the asymmetries of the emulation chain: overrange
    latitudes clip before the fwd legs (z still gets a real shift, only
    x/y go NaN) but pass UNCLIPPED into the inverse legs."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    lons = [-541.0, -180.0, -96.0, 0.0, 91.3, 180.0, 600.0, None,
            float("nan"), 45.0]
    lats = [-90.1, -90.0, -45.0, 0.0, 33.3, 84.0, 90.0, 90.1, None,
            float("nan")]
    pdf = pd.DataFrame({"lon": lons * len(lats),
                        "lat": np.repeat(lats, len(lons))})
    pdf["h"] = np.linspace(-400.0, 5000.0, len(pdf))
    pdf.loc[4, "h"] = np.nan
    df = spark.createDataFrame(pdf)

    cases = [
        # (projstring, direction, with_z)
        ("+proj=webmerc +datum=GGRS87", "fwd", True),
        ("+proj=webmerc +datum=GGRS87", "inv", True),
        ("+proj=merc +datum=OSGB36", "fwd", False),     # 7-param
        ("+proj=lcc +lat_1=49 +lat_2=77 +lat_0=49 +lon_0=-95 "
         "+ellps=clrk66 +towgs84=-10,158,187", "fwd", True),
        ("+proj=longlat +ellps=bessel +towgs84=577.326,90.129,463.919,"
         "5.137,1.474,5.297,2.4232", "fwd", True),      # geodetic shift
        ("+proj=longlat +ellps=bessel +towgs84=577.326,90.129,463.919,"
         "5.137,1.474,5.297,2.4232", "inv", True),
        ("+proj=laea +lat_0=52 +lon_0=10 +ellps=GRS80 +towgs84=1,2,3",
         "inv", True),
        ("+proj=eqc +ellps=intl +towgs84=0,0,0", "fwd", True),  # ellps hub
        # false origin + non-metre units through the composed chain
        ("+proj=lcc +lat_1=44 +lat_2=49 +lat_0=46 +lon_0=3 "
         "+x_0=700000 +y_0=6600000 +units=km +ellps=clrk80ign "
         "+towgs84=-168,-60,320", "fwd", True),
        # vto_meter scaling through the composed INVERSE chain
        ("+proj=webmerc +units=km +ellps=WGS84 +towgs84=1,2,3",
         "inv", True),
        # r7: composed ITERATIVE inverses (staged phi2/phi1 kernels
        # feeding the datum legs) — +towgs84 conic zones Python-free
        ("+proj=lcc +lat_1=49 +lat_2=77 +lat_0=49 +lon_0=-95 "
         "+ellps=clrk66 +towgs84=-10,158,187", "inv", True),
        ("+proj=aea +lat_1=29.5 +lat_2=45.5 +ellps=clrk66 "
         "+towgs84=-8,160,176", "inv", True),
        ("+proj=merc +ellps=GRS80 +towgs84=1,2,3", "inv", True),
        ("+proj=lcc +lat_1=44 +lat_2=49 +lat_0=46 +lon_0=3 "
         "+x_0=700000 +y_0=6600000 +units=km +ellps=clrk80ign "
         "+towgs84=-168,-60,320", "inv", True),
    ]
    for ps, direc, with_z in cases:
        kw = dict(x="lon", y="lat", direction=direc, out_prefix="f_")
        if with_z:
            kw["z"] = "h"
        fast = transform(df, ps, **kw)
        assert "EvalPython" not in \
            fast._jdf.queryExecution().executedPlan().toString(), (ps,
                                                                   direc)
        kw["out_prefix"] = "s_"
        slow = transform(df, ps, jvm_fast_path=False, **kw)
        fp = fast.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        sp = slow.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        for c in ("x", "y", "z"):
            a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            assert (np.isnan(a) == np.isnan(b)).all(), (ps, direc, c)
            m = ~np.isnan(a)
            assert np.allclose(a[m], b[m], rtol=1e-9, atol=1e-6), (
                ps, direc, c, np.abs(a[m] - b[m]).max())

    # guards: grid-backed datums, +axis, geocent, ellipsoidal-inverse
    # projections and vertical unit scaling stay on the UDF path
    guards = [
        ("+proj=webmerc +datum=NAD27", "fwd"),          # nadgrids
        ("+proj=merc +towgs84=1,2,3 +axis=wsu", "fwd"),
        ("+proj=robin +R=6371000 +towgs84=1,2,3",
         "inv"),                                 # off-roster family
        ("+proj=longlat +ellps=bessel +towgs84=1,2,3 +geoidgrids="
         "@egm96_15.gtx", "fwd"),
    ]
    for ps, direc in guards:
        g = transform(df, ps, x="lon", y="lat", direction=direc)
        assert "EvalPython" in \
            g._jdf.queryExecution().executedPlan().toString(), (ps, direc)


def test_eqearth_cass_ortho_gnom_jvm_fast_path_parity(spark):
    """r6 late roster additions: eqearth (Equal Earth polynomial,
    sphere+ellipsoid), cass (sphere + mlfn series), ortho (sphere all
    modes + EPSG ellipsoidal fwd), gnom (sphere formulas) forward
    twins; spherical cass/ortho/gnom inverse twins.  Iterative
    ellipsoidal inverses refuse."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    lons = [-541.0, -180.0, -96.0, 0.0, 30.0, 91.3, 180.0, 200.0,
            None, float("nan")]
    lats = [-90.1, -90.0, -60.0, 0.0, 30.0, 59.9999, 84.0, 90.0,
            None, float("nan")]
    pdf = pd.DataFrame({"lon": lons * len(lats),
                        "lat": np.repeat(lats, len(lons))})
    df = spark.createDataFrame(pdf)
    fwd = ("+proj=eqearth +ellps=WGS84", "+proj=eqearth +R=6371000",
           "+proj=cass +ellps=GRS80 +lat_0=30 +lon_0=10",
           "+proj=cass +R=6371000 +lat_0=-20",
           "+proj=ortho +ellps=WGS84 +lat_0=40 +lon_0=-30",
           "+proj=ortho +R=6371000 +lat_0=0",
           "+proj=ortho +R=6371000 +lat_0=90",
           "+proj=gnom +R=6371000 +lat_0=40",
           "+proj=gnom +R=6371000 +lat_0=-90",
           "+proj=gnom +ellps=WGS84 +lat_0=0")
    for ps in fwd:
        fast = transform(df, ps, x="lon", y="lat", out_prefix="f_")
        assert "EvalPython" not in \
            fast._jdf.queryExecution().executedPlan().toString(), ps
        slow = transform(df, ps, x="lon", y="lat", out_prefix="s_",
                         jvm_fast_path=False)
        fp = fast.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        sp = slow.toPandas().sort_values(["lon", "lat"]).reset_index(
            drop=True)
        for c in ("x", "y"):
            a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            assert (np.isnan(a) == np.isnan(b)).all(), (ps, c)
            m = ~np.isnan(a)
            assert np.allclose(a[m], b[m], rtol=1e-9, atol=1e-6), (
                ps, c, np.abs(a[m] - b[m]).max())

    xs = [-1.27e7, -6.4e6, -1e4, 0.0, 1e4, 6.36e6, 6.4e6, None,
          float("nan")]
    ys = [-1.2e7, -6.36e6, -5e6, 0.0, 1e4, 6.36e6, 6.4e6, 1.27e7]
    pdf2 = pd.DataFrame({"px": xs * len(ys), "py": np.repeat(ys, len(xs))})
    df2 = spark.createDataFrame(pdf2)
    inv = ("+proj=cass +R=6371000 +lat_0=30",
           "+proj=ortho +R=6371000 +lat_0=0",
           "+proj=ortho +R=6371000 +lat_0=42 +lon_0=-30",
           "+proj=ortho +R=6371000 +lat_0=90",
           "+proj=ortho +R=6371000 +lat_0=-90",
           "+proj=gnom +R=6371000 +lat_0=40",
           "+proj=gnom +R=6371000 +lat_0=90")
    for ps in inv:
        fast = transform(df2, ps, x="px", y="py", direction="inv",
                         out_prefix="f_")
        assert "EvalPython" not in \
            fast._jdf.queryExecution().executedPlan().toString(), ps
        slow = transform(df2, ps, x="px", y="py", direction="inv",
                         out_prefix="s_", jvm_fast_path=False)
        fp = fast.toPandas().sort_values(["px", "py"]).reset_index(
            drop=True)
        sp = slow.toPandas().sort_values(["px", "py"]).reset_index(
            drop=True)
        for c in ("x", "y"):
            a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            assert (np.isnan(a) == np.isnan(b)).all(), (ps, c)
            m = ~np.isnan(a)
            assert np.allclose(a[m], b[m], rtol=1e-9, atol=1e-9), (
                ps, c, np.abs(a[m] - b[m]).max())
    # iterative ellipsoidal inverses refuse (cass-e moved to the r7
    # inv_mlfn twin, test_iter_inverse_jvm_fast_path_parity)
    for ps in ("+proj=ortho +ellps=WGS84 +lat_0=40",
               "+proj=gnom +ellps=WGS84"):
        g = transform(df2, ps, x="px", y="py", direction="inv")
        assert "EvalPython" in \
            g._jdf.queryExecution().executedPlan().toString(), ps


def test_twin_vertical_unit_scaling_matches_udf(spark):
    """r7 fix: the bare twins must apply the generic vertical scaling
    the UDF path applies — fwd_finalize z = vfr_meter*(z+z0),
    inv_prepare z = vto_meter*z - z0 (src/fwd.cpp / src/inv.cpp).
    +units=km implies vto_meter=1000 when +vunits is absent, so a
    z-carrying km transform used to pass z through unscaled on the
    twin path (1.5 vs the UDF's 1500)."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    idf = spark.createDataFrame(pd.DataFrame(
        {"px": [1000.0, 578.8], "py": [2000.0, 4983.4],
         "pz": [1.5, None]}))
    fdf = spark.createDataFrame(pd.DataFrame(
        {"lon": [10.0, -75.0], "lat": [45.0, 30.0],
         "pz": [1500.0, None]}))
    cases = [
        ("+proj=webmerc +ellps=WGS84 +units=km", "inv", idf,
         ("px", "py")),                              # column twin
        ("+proj=utm +zone=32 +ellps=GRS80 +units=km", "inv", idf,
         ("px", "py")),                              # staged inverse
        ("+proj=lcc +lat_1=33 +lat_2=45 +ellps=GRS80 +units=km",
         "inv", idf, ("px", "py")),
        ("+proj=webmerc +ellps=WGS84 +units=km", "fwd", fdf,
         ("lon", "lat")),                            # column twin
        ("+proj=utm +zone=32 +ellps=GRS80 +units=km", "fwd", fdf,
         ("lon", "lat")),                            # staged etmerc
        ("+proj=omerc +lat_0=45 +lonc=10 +alpha=30 +ellps=WGS84 "
         "+units=km", "fwd", fdf, ("lon", "lat")),   # staged omerc
    ]
    for ps, direc, d, cols in cases:
        a = transform(d, ps, x=cols[0], y=cols[1], z="pz",
                      direction=direc, out_prefix="a_").toPandas()
        b = transform(d, ps, x=cols[0], y=cols[1], z="pz",
                      direction=direc, out_prefix="b_",
                      jvm_fast_path=False).toPandas()
        for c in ("x", "y", "z"):
            av = a[f"a_{c}"].to_numpy(dtype=np.float64,
                                      na_value=np.nan)
            bv = b[f"b_{c}"].to_numpy(dtype=np.float64,
                                      na_value=np.nan)
            assert (np.isnan(av) == np.isnan(bv)).all(), (ps, direc, c)
            m = ~np.isnan(av)
            assert np.allclose(av[m], bv[m], rtol=1e-9, atol=1e-6), (
                ps, direc, c)


def test_moll_fwd_jvm_fast_path_parity(spark):
    """late-r7 moll/wag4/wag5 FORWARD staged twin (the 10-iteration
    Newton on the parametric angle, moll.cpp:22-42): zero Python
    workers, bit-exact against the UDF path on this grid (the frozen
    unroll reproduces the masked-lane Newton update-for-update), and
    the fwd-twin -> inv-twin roundtrip closes."""
    import numpy as np
    import pandas as pd

    from proj_4_spark.engine.spark import transform

    lons = [-541.0, -180.0, -100.0, 0.0, 45.0, 140.0, 200.0, None,
            float("nan")]
    lats = [-90.1, -90.0, -60.0, -30.0, 0.0, 30.0, 60.0, 89.9999,
            90.0, None]
    df = spark.createDataFrame(pd.DataFrame(
        {"lon": lons * len(lats), "lat": np.repeat(lats, len(lons))}))
    for ps in ("+proj=moll +R=6371000",
               "+proj=moll +ellps=WGS84 +lon_0=20 +x_0=100000",
               "+proj=wag4 +R=6371000",
               "+proj=wag5 +R=6371000"):
        fast = transform(df, ps, x="lon", y="lat", out_prefix="f_")
        assert "EvalPython" not in \
            fast._jdf.queryExecution().executedPlan().toString(), ps
        slow = transform(df, ps, x="lon", y="lat", out_prefix="s_",
                         jvm_fast_path=False)
        fp = fast.toPandas()
        sp = slow.toPandas()
        for c in ("x", "y"):
            a = fp[f"f_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            b = sp[f"s_{c}"].to_numpy(dtype=np.float64, na_value=np.nan)
            assert (np.isnan(a) == np.isnan(b)).all(), (ps, c)
            m = ~np.isnan(a)
            assert np.allclose(a[m], b[m], rtol=1e-9, atol=1e-6), (
                ps, c, np.abs(a[m] - b[m]).max())
    gdf = spark.createDataFrame(pd.DataFrame(
        {"lon": [-150.0, -20.0, 0.0, 45.0, 140.0] * 4,
         "lat": np.repeat([-60.0, 0.0, 45.5, 85.0], 5)}))
    rt = transform(
        transform(gdf, "+proj=moll +R=6371000", x="lon", y="lat",
                  out_prefix="p_"),
        "+proj=moll +R=6371000", x="p_x", y="p_y", direction="inv",
        out_prefix="r_")
    assert "EvalPython" not in \
        rt._jdf.queryExecution().executedPlan().toString()
    rp = rt.toPandas()
    assert np.allclose(rp["r_x"], rp["lon"], atol=1e-9)
    assert np.allclose(rp["r_y"], rp["lat"], atol=1e-9)


def test_staged_twin_replaces_default_named_columns(spark):
    """Regression (VERDICT r7 #4): with the documented default call
    shape — input columns named x/y, out_prefix="" — every STAGED twin
    path (etmerc/utm fwd+inv, iterative inverses, omerc, moll, geos,
    ellipsoidal laea) must REPLACE x/y in place like the UDF path and
    the Column twins, not append duplicates that make any downstream
    select("x") throw AMBIGUOUS_REFERENCE."""
    from pyspark.sql import functions as F

    from proj_4_spark.engine.spark import transform

    pts = spark.range(1, 50).select(
        ((F.col("id") * 7 % 12) + 3.0).alias("x"),
        ((F.col("id") * 11 % 60) + 10.0).alias("y"),
    )
    for ps in ("+proj=utm +zone=32 +ellps=GRS80",       # staged etmerc
               "+proj=laea +lat_0=52 +lon_0=10 +ellps=GRS80"):  # staged
        fwd = transform(pts, ps)                       # out_prefix=""
        assert fwd.columns.count("x") == 1, (ps, fwd.columns)
        assert fwd.columns.count("y") == 1, (ps, fwd.columns)
        back = transform(fwd, ps, direction="inv")     # chain again
        assert back.columns.count("x") == 1, (ps, back.columns)
        rows = back.select("x", "y").limit(5).collect()  # no ambiguity
        assert rows and all(r["x"] is not None for r in rows), ps
