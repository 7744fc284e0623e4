"""Spatial layer: documents synthesis, media extraction, transform-on-Spark,
tiles, cells, PIP join vs driver oracle, kNN vs brute-force oracle,
span-sequence invariant (BASELINE.json north_rule checks)."""

import numpy as np
import pytest

pyspark = pytest.importorskip("pyspark")

from proj_4_spark.docs.media import assert_span_equality, explode_media_points
from proj_4_spark.docs.synth import synthesize_arrow, synthesize_spark
from proj_4_spark.engine.spark import transform
from proj_4_spark.sources import fixtures as FX
from proj_4_spark.spatial import cells, tiles
from proj_4_spark.spatial.knn import knn_brute_force, knn_join
from proj_4_spark.spatial.pip import pip_join
from proj_4_spark.spatial.salting import salted_count

N_DOCS = 1500


@pytest.fixture(scope="module")
def docs(spark):
    df = synthesize_spark(spark, N_DOCS, partitions=4).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def media_pts(spark, docs):
    pts = explode_media_points(docs).where("lon <= 360").cache()
    pts.count()
    return pts


def test_synth_deterministic_and_interleaved(spark):
    t1 = synthesize_arrow(200)
    t2 = synthesize_arrow(200)
    assert t1.equals(t2)
    rows = t1.to_pylist()
    assert rows[5]["doc_id"] == "doc-%012d" % 5
    assert len(rows[5]["spans"]) == 1 + (5 % 7)
    for i, r in enumerate(rows):
        for k, s in enumerate(r["spans"]):
            assert s["offset"] == k
            if (i + k) % 3 == 0:
                assert s["kind"] == "media" and s["media_ref"].startswith("media://")
            else:
                assert s["kind"] == "text" and s["text"] == f"t-{r['doc_id']}-{k}"


def test_media_extraction_roundtrips_encoding(spark, docs):
    pts = explode_media_points(docs)
    row = pts.first()
    assert row.crs == "EPSG:4326"
    assert -180 <= row.lat <= 90 or row.lon == 999.0


def test_spark_transform_matches_local(spark, media_pts):
    """The Spark UDF path must produce bit-identical results to the
    driver-side NumPy path (same kernels, same batches); the default
    path (the staged etmerc/utm Catalyst twin, default-on since r7)
    must agree within the pinned twin-parity tolerance."""
    from proj_4_spark.engine.plan import create_operation
    from proj_4_spark.kernels.common import DEG_TO_RAD

    sample = media_pts.where("abs(lat) < 84 and abs(lon) <= 180").limit(100).toPandas()
    out = transform(
        spark.createDataFrame(sample), "+proj=utm +zone=32 +ellps=GRS80",
        x="lon", y="lat", out_prefix="u_", jvm_fast_path=False,
    ).toPandas().sort_values(["doc_id", "span_offset"])
    op = create_operation("+proj=utm +zone=32 +ellps=GRS80")
    s = sample.sort_values(["doc_id", "span_offset"])
    x, y, _, _ = op.apply(
        s["lon"].to_numpy() * DEG_TO_RAD, s["lat"].to_numpy() * DEG_TO_RAD,
        np.zeros(len(s)), np.zeros(len(s)),
    )
    assert np.array_equal(out["u_x"].to_numpy(), x, equal_nan=True)
    assert np.array_equal(out["u_y"].to_numpy(), y, equal_nan=True)
    twin = transform(
        spark.createDataFrame(sample), "+proj=utm +zone=32 +ellps=GRS80",
        x="lon", y="lat", out_prefix="u_",
    ).toPandas().sort_values(["doc_id", "span_offset"])
    assert np.allclose(twin["u_x"].to_numpy(), x, rtol=1e-9, atol=1e-6)
    assert np.allclose(twin["u_y"].to_numpy(), y, rtol=1e-9, atol=1e-6)


def test_tile_assignment_exact(spark, media_pts):
    """Integer-exact tile assignment vs the closed-form NumPy oracle."""
    wm = transform(media_pts, "+proj=webmerc +ellps=WGS84",
                   x="lon", y="lat", out_prefix="wm_", keep_errors=False)
    tiled = tiles.assign_tiles(wm, x="wm_x", y="wm_y", zoom=8).toPandas()
    tx, ty = tiles.tile_np(tiled["wm_x"].to_numpy(), tiled["wm_y"].to_numpy(), 8)
    assert np.array_equal(tiled["tile_x"].to_numpy(), tx)
    assert np.array_equal(tiled["tile_y"].to_numpy(), ty)


def test_cell_jvm_matches_numpy(spark, media_pts):
    df = media_pts.withColumn("cell", cells.cell_col(
        pyspark.sql.functions.col("lon"), pyspark.sql.functions.col("lat"), 7
    )).toPandas()
    expect = cells.cell_np(df["lon"].to_numpy(), df["lat"].to_numpy(), 7)
    got = df["cell"].to_numpy()
    ok = expect != -1
    assert np.array_equal(got[ok], expect[ok])


def test_neighbors_col_exact_decode_near_row_boundary(spark):
    """Regression: neighbors_col once decoded iy via double division —
    cell ids carry res<<58 (> 2^53), so long->double rounding shifted
    decoded iy by one for ix within ~128 of a row boundary.  Sweep the
    worst band (ix near 2^res boundary at high res) and assert the JVM
    decode matches the exact-shift NumPy twin."""
    from pyspark.sql import functions as F

    res = 28  # max res: ix spans 2^28, ids near the top of the double gap
    n = 1 << res
    ixs = np.arange(n - 300, n, dtype=np.int64)
    iys = np.arange(300, dtype=np.int64) + (n // 2)
    ids = (np.int64(res) << cells.RES_SHIFT) | (iys << cells.IY_SHIFT) | ixs
    expect = cells.neighbors_np(ids, ring=1)
    df = spark.createDataFrame([(int(c),) for c in ids], "cell long")
    got = (
        df.withColumn("nb", cells.neighbors_col(F.col("cell"), res, 1))
        .orderBy("cell")
        .toPandas()
    )
    expect_sets = [set(map(int, row)) for row in expect[np.argsort(ids)]]
    got_sets = [set(map(int, row)) for row in got["nb"]]
    assert got_sets == expect_sets


def test_pip_join_distinct_zones_same_lon_profile(spark):
    """Regression: the exact-test UDF once grouped candidate rows by a
    (len, first_lon, last_lon) ring key — two lat-stacked zones sharing a
    lon band collided and points in zone B were tested against zone A's
    ring.  Build exactly that fixture and assert both memberships."""
    zones = spark.createDataFrame(
        [
            ("zA", [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)],
             0.0, 0.0, 10.0, 10.0),
            ("zB", [(0.0, 20.0), (10.0, 20.0), (10.0, 30.0), (0.0, 30.0)],
             0.0, 20.0, 10.0, 30.0),
        ],
        "zone_id string, ring array<struct<lon double, lat double>>, "
        "min_lon double, min_lat double, max_lon double, max_lat double",
    )
    pts = spark.createDataFrame(
        [("d1", 0, 5.0, 5.0), ("d2", 0, 5.0, 25.0)],
        "doc_id string, span_offset int, lon double, lat double",
    )
    got = sorted(
        (r.doc_id, r.zone_id)
        for r in pip_join(pts, zones).select("doc_id", "zone_id").collect()
    )
    assert got == [("d1", "zA"), ("d2", "zB")]


def test_pip_join_matches_oracle(spark, media_pts):
    import pyarrow.parquet as pq

    zpath = FX.ensure_fixture("zones.parquet", FX.zones_table)
    zones_df = spark.read.parquet(zpath)
    got = (
        pip_join(media_pts.where("abs(lon) <= 180"), zones_df)
        .select("doc_id", "span_offset", "zone_id")
        .toPandas()
    )
    got_set = sorted(map(tuple, got.to_numpy().tolist()))
    pts = media_pts.where("abs(lon) <= 180").select(
        "doc_id", "span_offset", "lon", "lat").toPandas()
    exp = FX.expected_pip(
        list(zip(pts.doc_id, pts.span_offset, pts.lon, pts.lat)),
        pq.read_table(zpath),
    )
    assert got_set == exp
    assert len(exp) > 0  # fixture actually exercises the join


def test_pip_join_cells_matches_broadcast_path(spark, media_pts):
    """The cell-indexed hash-join PIP (the non-broadcast 100-TB path)
    must produce exactly the broadcast path's result set."""
    from proj_4_spark.spatial.pip import pip_join_cells

    zpath = FX.ensure_fixture("zones.parquet", FX.zones_table)
    zones_df = spark.read.parquet(zpath)
    pts = media_pts.where("abs(lon) <= 180")
    a = sorted(map(tuple, pip_join(pts, zones_df)
                   .select("doc_id", "span_offset", "zone_id")
                   .toPandas().to_numpy().tolist()))
    b = sorted(map(tuple, pip_join_cells(pts, zones_df, res=5)
                   .select("doc_id", "span_offset", "zone_id")
                   .toPandas().to_numpy().tolist()))
    assert a == b
    assert len(a) > 0


def test_knn_matches_brute_force(spark, media_pts):
    qpath = FX.ensure_fixture("knn_queries.parquet", FX.knn_queries)
    queries = spark.read.parquet(qpath).limit(25)
    pts = media_pts.where("abs(lon) <= 180 and abs(lat) <= 85")
    got = knn_join(pts, queries, k=5, res=4, ring=1, max_ring=3).toPandas()
    exp = knn_brute_force(pts, queries, k=5).toPandas()
    g = got.sort_values(["q_id", "rank"]).reset_index(drop=True)
    e = exp.sort_values(["q_id", "rank"]).reset_index(drop=True)
    assert len(g) == len(e)
    assert (g["q_id"] == e["q_id"]).all()
    assert (g["doc_id"] == e["doc_id"]).all()
    assert (g["span_offset"] == e["span_offset"]).all()
    assert np.allclose(g["dist_m"], e["dist_m"], rtol=1e-9)


def test_span_sequence_invariant_after_pipeline(spark, docs, media_pts):
    """Running the full geo pipeline must not mutate the documents table
    (span-sequence equality, input_hint)."""
    _ = transform(media_pts, "+proj=webmerc +ellps=WGS84",
                  x="lon", y="lat", out_prefix="wm_").count()
    assert assert_span_equality(spark, docs, docs) == 0


def test_salted_count_equals_plain_count(spark, media_pts):
    from pyspark.sql import functions as F

    df = media_pts.withColumn("cell", cells.cell_col(F.col("lon"), F.col("lat"), 5))
    plain = {r["cell"]: r["count"] for r in df.groupBy("cell").count().collect()}
    salted = {r["cell"]: r["n"] for r in salted_count(df, "cell", "doc_id", 8).collect()}
    assert plain == salted


def test_knn_salted_equals_plain(spark):
    """n_salt>1 splits hot cells across salt sub-partitions but the
    per-query ranking is salt-agnostic: identical output to n_salt=1."""
    from pyspark.sql import functions as F

    from proj_4_spark.spatial.knn import knn_join

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").limit(3000)
    pts = ev.select(
        F.col("event_id").cast("string").alias("doc_id"),
        F.lit(0).alias("span_offset"),
        # 80% of points into one hot cell near (2.3, 48.8)
        F.when(F.col("event_id") % 5 < 4,
               2.3 + (F.col("event_id") % 89) / 10000.0)
        .otherwise((F.col("event_id") * 7919 % 360000) / 1000.0 - 180.0)
        .alias("lon"),
        F.when(F.col("event_id") % 5 < 4,
               48.8 + (F.col("event_id") % 97) / 10000.0)
        .otherwise((F.col("event_id") * 104729 % 170000) / 1000.0 - 85.0)
        .alias("lat"),
    )
    queries = pts.where("doc_id % 211 = 0").selectExpr(
        "doc_id as q_id", "lon", "lat")
    plain = knn_join(pts, queries, k=5, res=4, ring=1, max_ring=3,
                     metric="haversine").orderBy("q_id", "rank").toPandas()
    salted = knn_join(pts, queries, k=5, res=4, ring=1, max_ring=3,
                      metric="haversine", n_salt=8
                      ).orderBy("q_id", "rank").toPandas()
    assert len(plain) == len(salted)
    for c in ("q_id", "doc_id", "rank"):
        assert (plain[c].to_numpy() == salted[c].to_numpy()).all(), c
    assert np.allclose(plain["dist_m"], salted["dist_m"], rtol=0, atol=1e-9)
