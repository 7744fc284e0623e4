"""spark-submit entry point for the interleaved-document geo pipeline.

The north-rule deployment shape: the engine ships as a --py-files zip,
this script is the driver program, and the job is RESUMABLE — processed
doc_ids snapshot per stage and an anti-join skips them on restart —
with per-partition lineage/metrics written next to the output.

    zip -r proj_4_spark.zip proj_4_spark/
    spark-submit --master <cluster> --py-files proj_4_spark.zip \
        jobs/geo_pipeline_job.py \
        --input  /path/to/docs.parquet   # (doc_id, spans) interleaved \
        --output /path/to/tiles_out      \
        --run-id run-2026-08-16 [--zoom 8] [--resume]

Pipeline: scan -> posexplode media spans -> regexp geo-tag parse (JVM)
-> fused webmerc transform UDF -> integer tile assignment -> tile
histogram; plus lineage rows (partition id, row counts) and transform
error counts per partition.

Output layout: `<output>/tiles/run_id=<id>/` holds the PARTIAL tile
histogram of the docs processed by that run (tile counts are mergeable
— readers sum `n` across runs, as the summary does).  A rerun of the
same run_id replaces only its own partition (dynamic partition
overwrite); prior runs' tiles are never touched.  On a real cluster
the input is an Iceberg table; snapshots + the partition overwrite
then ride Iceberg metadata as atomic commits (sources/checkpoint.py
documents the swap-in) — the parquet paths below are the
sandbox-portable fallback.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _reconcile_orphan_tiles(spark, tiles_dir: str, snap_dir: str):
    """Delete tile partitions whose run_id never reached the snapshot.

    A run_id directory under tiles/ with no snapshot rows means the job
    died after the tiles write but before the snapshot append — those
    docs count as unprocessed, so their partial histogram must go."""
    import shutil

    from proj_4_spark.sources.checkpoint import snapshot_dir

    if not os.path.isdir(tiles_dir):
        return []
    tile_runs = {d.split("=", 1)[1] for d in os.listdir(tiles_dir)
                 if d.startswith("run_id=")}
    snapped = set()
    sdir = snapshot_dir(snap_dir, "tiles")
    # only a genuinely ABSENT/EMPTY snapshot means "every partition is
    # orphaned"; any read error (FS hiccup, corrupt footer, permission)
    # must propagate — deleting committed tiles on a transient failure
    # would silently undercount docs the snapshot already marks done
    has_snapshot = os.path.isdir(sdir) and any(
        not f.startswith(("_", ".")) for f in os.listdir(sdir))
    if has_snapshot:
        snap = spark.read.parquet(sdir)
        if "run_id" in snap.columns:
            snapped = {r["run_id"] for r in
                       snap.select("run_id").distinct().collect()}
        else:
            # pre-run_id snapshot format: cannot attribute doc_ids to
            # runs; treat every existing tile partition as committed
            snapped = tile_runs
    orphans = sorted(tile_runs - snapped)
    for rid in orphans:
        shutil.rmtree(os.path.join(tiles_dir, f"run_id={rid}"),
                      ignore_errors=True)
    if orphans:
        print(f"GEO_PIPELINE_RECONCILE dropped orphaned tile partitions: "
              f"{orphans}")
    return orphans


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="parquet of interleaved docs (doc_id, spans)")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--zoom", type=int, default=8)
    ap.add_argument("--resume", action="store_true",
                    help="skip doc_ids recorded in a previous snapshot")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName(f"geo-pipeline-{args.run_id}")
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions",
                                 str(args.shuffle_partitions))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from pyspark.sql import functions as F

    from proj_4_spark.docs.media import explode_media_points
    from proj_4_spark.engine.spark import transform
    from proj_4_spark.sources.checkpoint import (
        read_lineage,
        remaining_docs,
        transform_error_counts,
        with_partition_lineage,
        write_snapshot,
    )
    from proj_4_spark.spatial.tiles import assign_tiles

    snap_dir = os.path.join(args.output, "_snapshots")
    metrics_dir = os.path.join(args.output, "_metrics")
    tiles_dir = os.path.join(args.output, "tiles")

    docs = spark.read.parquet(args.input)
    if args.resume:
        # Reconcile orphaned tile partitions BEFORE the anti-join: if a
        # prior run died between its tiles write and its snapshot
        # append, that run_id has tiles but no snapshot rows — its docs
        # are about to be re-processed by this run, so its partial
        # histogram must be dropped or those tiles double-count.  (On
        # Iceberg, tiles+snapshot ride one atomic commit and this
        # branch never fires; it is the parquet-fallback safety net.)
        _reconcile_orphan_tiles(spark, tiles_dir, snap_dir)
        docs = remaining_docs(docs, spark, snap_dir, "tiles")
    # materialize the doc set ONCE, before anything mutates the snapshot
    # this run's anti-join reads (the lazy plan would otherwise recount
    # against the post-append snapshot and report 0)
    docs = docs.cache()
    n_docs = docs.count()

    pts = with_partition_lineage(
        explode_media_points(docs), args.run_id, "extract",
        metrics_dir=metrics_dir)
    wm = transform(pts, "+proj=webmerc +ellps=WGS84", x="lon", y="lat",
                   out_prefix="wm_", keep_errors=True)
    # cache: the transformed points feed BOTH the error accounting and
    # the tile write — without it the whole pipeline (and the lineage
    # side-channel) would execute twice
    wm = wm.cache()
    errs = transform_error_counts(wm, "wm_x").toPandas()
    ok = wm.where(F.col("wm_x").isNotNull() & ~F.isnan("wm_x"))
    tiles = (assign_tiles(ok, x="wm_x", y="wm_y", zoom=args.zoom)
             .groupBy("zoom", "tile_x", "tile_y")
             .agg(F.count("*").alias("n"))
             .withColumn("run_id", F.lit(args.run_id)))
    # PARTIAL histogram per run, dynamic partition overwrite: a resume
    # run replaces only its own run_id partition — prior runs' tiles are
    # never touched (tile counts are mergeable: readers sum across runs;
    # on Iceberg this write is a single atomic snapshot commit)
    (tiles.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("run_id")
     .parquet(tiles_dir))

    # mark processed docs for resumability AFTER the output commit; the
    # run_id column lets a later resume detect orphaned tile partitions
    # (tiles committed, snapshot append lost) and reconcile them
    write_snapshot(docs.select("doc_id").withColumn("run_id", F.lit(args.run_id)),
                   snap_dir, "tiles",
                   mode="append" if args.resume else "overwrite")

    merged = (spark.read.parquet(tiles_dir)
              .groupBy("zoom", "tile_x", "tile_y")
              .agg(F.sum("n").alias("n")))
    lineage = read_lineage(spark, metrics_dir, args.run_id, "extract").toPandas()
    summary = {
        "run_id": args.run_id,
        "docs_processed": int(n_docs),
        "points": int(lineage["n_rows"].sum()) if len(lineage) else 0,
        "partitions": int(len(lineage)),
        "transform_errors": int(errs["n_errors"].sum()) if len(errs) else 0,
        "tiles": int(merged.count()),
    }
    print("GEO_PIPELINE_SUMMARY " + json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
