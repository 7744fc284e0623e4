"""End-to-end spark-submit deployment test: the engine zipped as
--py-files, jobs/geo_pipeline_job.py as the driver program — the
north-rule run shape, executed for real in local mode."""
import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = "/root/repo"


def _zip_package(dest: str) -> str:
    zpath = os.path.join(dest, "proj_4_spark.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        pkg = os.path.join(REPO, "proj_4_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_geo_pipeline(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark
        spark_submit = os.path.join(os.path.dirname(pyspark.__file__),
                                    "bin", "spark-submit")
    assert os.path.exists(spark_submit), "spark-submit not found"

    # input: the committed interleaved-docs fixture (doc_id, spans)
    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    input_path = E._docs_fixture_path()

    zpath = _zip_package(str(tmp_path))
    out = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    res = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zpath,
         os.path.join(REPO, "jobs", "geo_pipeline_job.py"),
         "--input", input_path, "--output", out,
         "--run-id", "t-submit", "--zoom", "6",
         "--shuffle-partitions", "8"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path),  # NOT the repo: proves the zip supplies the pkg
    )
    assert res.returncode == 0, res.stderr[-4000:]
    line = [ln for ln in res.stdout.splitlines()
            if ln.startswith("GEO_PIPELINE_SUMMARY ")]
    assert line, res.stdout[-2000:]
    summary = json.loads(line[-1].split(" ", 1)[1])
    assert summary["tiles"] > 0 and summary["points"] > 0
    assert summary["partitions"] > 0
    # fixture deliberately contains pole/out-of-range spans
    assert summary["transform_errors"] > 0

    def merged_tiles(spark):
        from pyspark.sql import functions as F
        return (spark.read.parquet(os.path.join(out, "tiles"))
                .groupBy("zoom", "tile_x", "tile_y")
                .agg(F.sum("n").alias("n"))
                .orderBy("tile_x", "tile_y").toPandas())

    # the merged output equals the flagship driver query (same fixture)
    from pyspark.sql import SparkSession
    spark = SparkSession.builder.master("local[4]").getOrCreate()
    got = merged_tiles(spark)
    expect = (E._q_docs_geo_pipeline(spark, "unused")
              .orderBy("tile_x", "tile_y").toPandas())
    assert len(got) == len(expect)
    assert (got["n"].to_numpy() == expect["n"].to_numpy()).all()
    # lineage counted each point exactly ONCE (the wm cache prevents the
    # error-accounting action from re-running the pipeline)
    from proj_4_spark.docs.media import explode_media_points
    n_pts = explode_media_points(spark.read.parquet(input_path)).count()
    assert summary["points"] == n_pts, (summary["points"], n_pts)
    assert summary["docs_processed"] == \
        spark.read.parquet(input_path).count()

    def run_job(run_id, inp, extra=()):
        r = subprocess.run(
            [spark_submit, "--master", "local[4]",
             "--conf", "spark.ui.enabled=false",
             "--py-files", zpath,
             os.path.join(REPO, "jobs", "geo_pipeline_job.py"),
             "--input", inp, "--output", out,
             "--run-id", run_id, "--zoom", "6",
             "--shuffle-partitions", "8", *extra],
            capture_output=True, text=True, timeout=600, env=env,
            cwd=str(tmp_path))
        assert r.returncode == 0, r.stderr[-4000:]
        ln = [x for x in r.stdout.splitlines()
              if x.startswith("GEO_PIPELINE_SUMMARY ")]
        return json.loads(ln[-1].split(" ", 1)[1])

    # resume over the SAME input: 0 new docs AND the prior output is
    # intact (partial-histogram partitions: nothing overwritten)
    s2 = run_job("t-submit-2", input_path, ("--resume",))
    assert s2["docs_processed"] == 0
    got2 = merged_tiles(spark)
    assert (got2["n"].to_numpy() == expect["n"].to_numpy()).all()

    # resume over an EXTENDED input: only the new docs process, and the
    # merged histogram equals the full-input batch computation
    from pyspark.sql import functions as F
    base_docs = spark.read.parquet(input_path)
    extra_docs = (base_docs.limit(40)
                  .withColumn("doc_id", F.concat(F.lit("extra-"),
                                                 F.col("doc_id"))))
    ext_dir = str(tmp_path / "ext_input")
    base_docs.unionByName(extra_docs).write.mode("overwrite").parquet(ext_dir)
    s3 = run_job("t-submit-3", ext_dir, ("--resume",))
    assert s3["docs_processed"] == 40, s3

    from proj_4_spark.engine.spark import transform
    from proj_4_spark.spatial.tiles import assign_tiles
    full_pts = explode_media_points(spark.read.parquet(ext_dir))
    full_wm = transform(full_pts, "+proj=webmerc +ellps=WGS84",
                        x="lon", y="lat", out_prefix="wm_",
                        keep_errors=False)
    full_expect = (assign_tiles(full_wm, x="wm_x", y="wm_y", zoom=6)
                   .groupBy("zoom", "tile_x", "tile_y")
                   .agg(F.count("*").alias("n"))
                   .orderBy("tile_x", "tile_y").toPandas())
    got3 = merged_tiles(spark)
    assert len(got3) == len(full_expect)
    assert (got3["n"].to_numpy() == full_expect["n"].to_numpy()).all()

    # crash reconciliation: a run that died between its tiles write and
    # its snapshot append leaves an orphaned run_id partition whose docs
    # a later resume re-processes — the orphan must be dropped or those
    # tiles double-count.  Simulate by cloning t-submit-3's partition
    # under a run_id that has no snapshot rows.
    orphan = os.path.join(out, "tiles", "run_id=t-crashed")
    shutil.copytree(os.path.join(out, "tiles", "run_id=t-submit-3"), orphan)
    assert os.path.isdir(orphan)
    # sanity: merged now double-counts (the bug being fixed)
    assert merged_tiles(spark)["n"].sum() > full_expect["n"].sum()
    s4 = run_job("t-submit-4", ext_dir, ("--resume",))
    assert s4["docs_processed"] == 0, s4
    assert not os.path.isdir(orphan), "orphan partition not reconciled"
    got4 = merged_tiles(spark)
    assert len(got4) == len(full_expect)
    assert (got4["n"].to_numpy() == full_expect["n"].to_numpy()).all()


def test_reconcile_raises_on_corrupt_snapshot_instead_of_deleting(tmp_path, spark):
    """A snapshot that EXISTS but fails to read (corrupt footer, FS
    hiccup) must raise, not be treated as 'no snapshot': deleting every
    tile partition while the snapshot still marks those docs processed
    would silently undercount forever (ADVICE r4, medium)."""
    import os

    import pytest

    from jobs.geo_pipeline_job import _reconcile_orphan_tiles
    from proj_4_spark.sources.checkpoint import snapshot_dir

    out = tmp_path / "out"
    tiles = out / "tiles"
    (tiles / "run_id=r1").mkdir(parents=True)
    (tiles / "run_id=r1" / "part-0.parquet").write_bytes(b"PAR1fakePAR1")
    snap = snapshot_dir(str(out / "_snapshots"), "tiles")
    os.makedirs(snap)
    # a non-hidden file that is NOT readable parquet
    with open(os.path.join(snap, "part-0.parquet"), "wb") as f:
        f.write(b"NOT A PARQUET FILE")
    with pytest.raises(Exception):
        _reconcile_orphan_tiles(spark, str(tiles), str(out / "_snapshots"))
    # the committed tile partition must survive
    assert (tiles / "run_id=r1" / "part-0.parquet").exists()

    # an absent snapshot dir still means all partitions are orphaned
    out2 = tmp_path / "out2"
    t2 = out2 / "tiles"
    (t2 / "run_id=r9").mkdir(parents=True)
    dropped = _reconcile_orphan_tiles(spark, str(t2),
                                      str(out2 / "_snapshots"))
    assert dropped == ["r9"] and not (t2 / "run_id=r9").exists()
