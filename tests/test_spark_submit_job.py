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

    # the output equals the flagship driver query (same fixture, zoom 6)
    from pyspark.sql import SparkSession
    spark = SparkSession.builder.master("local[4]").getOrCreate()
    got = (spark.read.parquet(os.path.join(out, "tiles"))
           .orderBy("tile_x", "tile_y").toPandas())
    expect = (E._q_docs_geo_pipeline(spark, "unused")
              .orderBy("tile_x", "tile_y").toPandas())
    assert len(got) == len(expect)
    assert (got["n"].to_numpy() == expect["n"].to_numpy()).all()
    # lineage counted each point exactly ONCE (the wm cache prevents the
    # error-accounting action from re-running the pipeline)
    from proj_4_spark.docs.media import explode_media_points
    n_pts = explode_media_points(spark.read.parquet(input_path)).count()
    assert summary["points"] == n_pts, (summary["points"], n_pts)

    # resumability: a second run with --resume processes 0 new docs
    res2 = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zpath,
         os.path.join(REPO, "jobs", "geo_pipeline_job.py"),
         "--input", input_path, "--output", out,
         "--run-id", "t-submit-2", "--zoom", "6", "--resume",
         "--shuffle-partitions", "8"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path))
    assert res2.returncode == 0, res2.stderr[-4000:]
    line2 = [ln for ln in res2.stdout.splitlines()
             if ln.startswith("GEO_PIPELINE_SUMMARY ")]
    summary2 = json.loads(line2[-1].split(" ", 1)[1])
    assert summary2["docs_processed"] == 0
