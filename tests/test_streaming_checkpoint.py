"""Streaming (rate/memory sources) + checkpoint/lineage tests."""

import os
import tempfile

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_windowed_cell_counts_stream_matches_batch(spark, events, tmp_path):
    """Streaming windowed agg over a bounded memory stream must equal the
    batch equivalent (exactly-once semantics on a replayable source)."""
    from proj_4_spark.spatial.cells import cell_col
    from proj_4_spark.streaming.events import windowed_cell_counts

    src = events.limit(2000).select(
        F.col("ts").cast("timestamp").alias("ts"),
        ((F.col("event_id") * 7919 % 360000) / 1000.0 - 180.0).alias("lon"),
        ((F.col("event_id") * 104729 % 170000) / 1000.0 - 85.0).alias("lat"),
    )
    src.write.mode("overwrite").parquet(str(tmp_path / "events_in"))

    stream = (
        spark.readStream.schema(src.schema).parquet(str(tmp_path / "events_in"))
    )
    q = (
        windowed_cell_counts(stream, res=4, window="1 hour", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("cellcounts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("select * from cellcounts").toPandas()
    expect = (
        src.withColumn("cell", cell_col(F.col("lon"), F.col("lat"), 4))
        .groupBy(F.window("ts", "1 hour"), "cell")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "cell", "n")
        .toPandas()
    )
    g = got.sort_values(["window_start", "cell"]).reset_index(drop=True)
    e = expect.sort_values(["window_start", "cell"]).reset_index(drop=True)
    assert len(g) == len(e)
    assert (g["cell"].to_numpy() == e["cell"].to_numpy()).all()
    assert (g["n"].to_numpy() == e["n"].to_numpy()).all()


def test_stream_transform_stateless(spark, tmp_path):
    from proj_4_spark.streaming.events import stream_transform

    src_df = spark.range(0, 100).select(
        (F.col("id") % 60 - 30.0).cast("double").alias("lon"),
        (F.col("id") % 80 - 40.0).cast("double").alias("lat"),
    )
    src_df.write.mode("overwrite").parquet(str(tmp_path / "pts"))
    stream = spark.readStream.schema(src_df.schema).parquet(str(tmp_path / "pts"))
    q = (
        stream_transform(stream, "+proj=webmerc +ellps=WGS84", x="lon", y="lat")
        .writeStream.format("memory")
        .queryName("wmstream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from wmstream").toPandas()
    assert len(got) == 100
    assert got["out_x"].notna().all()


def test_checkpoint_resume_anti_join(spark, tmp_path):
    from proj_4_spark.docs.synth import synthesize_spark
    from proj_4_spark.sources.checkpoint import remaining_docs, write_snapshot

    docs = synthesize_spark(spark, 500, partitions=4)
    base = str(tmp_path / "snapshots")
    # first run processes half
    first_half = docs.where("doc_id < 'doc-000000000250'")
    write_snapshot(first_half.select("doc_id"), base, "stage1")
    rest = remaining_docs(docs, spark, base, "stage1")
    assert rest.count() == 250
    assert rest.agg(F.min("doc_id")).first()[0] == "doc-%012d" % 250
    # nothing processed yet for an unknown stage -> full input
    assert remaining_docs(docs, spark, base, "nope").count() == 500


def test_partition_lineage_metrics(spark, tmp_path):
    from proj_4_spark.docs.media import explode_media_points
    from proj_4_spark.docs.synth import synthesize_spark
    from proj_4_spark.engine.spark import transform
    from proj_4_spark.sources.checkpoint import (
        read_lineage,
        transform_error_counts,
        with_partition_lineage,
    )

    docs = synthesize_spark(spark, 400, partitions=4)
    pts = explode_media_points(docs)
    mdir = str(tmp_path / "metrics")
    tracked = with_partition_lineage(pts, "run-1", "extract", metrics_dir=mdir)
    n = tracked.count()
    lineage = read_lineage(spark, mdir, "run-1", "extract").toPandas()
    assert lineage["n_rows"].sum() == n
    assert (lineage["partition_id"] >= 0).all()

    wm = transform(pts, "+proj=webmerc +ellps=WGS84", x="lon", y="lat",
                   out_prefix="wm_")
    errs = transform_error_counts(wm, "wm_x").toPandas()
    assert errs["n_rows"].sum() == n
    # pathological fixture rows (lon=999, |lat|=90) must surface as errors
    assert errs["n_errors"].sum() > 0


def test_sessionize_stream_matches_batch_gap_logic(spark, tmp_path):
    """applyInPandasWithState gap sessions over a bounded replayable
    stream must equal a batch reimplementation of the same 30-min-gap
    rule, for every session CLOSED by a gap (the final session per user
    stays in state — availableNow ends the query before any
    processing-time timeout can flush it)."""
    import pandas as pd

    from proj_4_spark.streaming.events import sessionize_by_user

    rows = []
    base = pd.Timestamp("2024-01-01 00:00:00")
    for uid in range(6):
        t = base + pd.Timedelta(minutes=uid * 7)
        for burst in range(3):            # 3 sessions per user
            for k in range(4):            # 4 events, 5 min apart
                rows.append((uid, t))
                t += pd.Timedelta(minutes=5)
            t += pd.Timedelta(minutes=45)  # gap > 30 min splits
    src = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts"])
    ).select(F.col("user_id").cast("long"), F.col("ts").cast("timestamp"))
    src.write.mode("overwrite").parquet(str(tmp_path / "sess_in"))

    stream = spark.readStream.schema(src.schema).parquet(str(tmp_path / "sess_in"))
    q = (
        sessionize_by_user(stream)
        .writeStream.format("memory").queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sessions").toPandas()

    # batch oracle: same 30-min gap rule in pandas
    pdf = src.toPandas().sort_values(["user_id", "ts"])
    expect = []
    for uid, grp in pdf.groupby("user_id"):
        ts = grp["ts"].tolist()
        start = end = ts[0]
        n = 1
        for x in ts[1:]:
            if (x - end).total_seconds() > 30 * 60:
                expect.append((uid, start, end, n))
                start = end = x
                n = 1
            else:
                end = x
                n += 1
        # the final session per user stays OPEN in state: availableNow
        # terminates before any processing-time timeout fires, so the
        # stream emits only gap-CLOSED sessions
    e = pd.DataFrame(expect, columns=["user_id", "session_start",
                                      "session_end", "n_events"])
    g = got.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    e = e.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    # streaming emits closed sessions; the final open session per user is
    # flushed by the availableNow end-of-stream timeout
    assert len(g) == len(e), (len(g), len(e))
    assert (g["user_id"] == e["user_id"]).all()
    assert (g["n_events"].to_numpy() == e["n_events"].to_numpy()).all()
    assert (pd.to_datetime(g["session_start"]).to_numpy()
            == pd.to_datetime(e["session_start"]).to_numpy()).all()


def test_stream_exact_dedup_matches_batch(spark, tmp_path):
    """Streaming md5 dedup over a bounded replayable stream: one
    surviving row per distinct text, equal to the batch dedup groups."""
    import pandas as pd

    from proj_4_spark.streaming.events import stream_exact_dedup

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for i in range(300):
        rows.append((i, f"text-{i % 70}", base + pd.Timedelta(seconds=i)))
    src = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    ).select("doc_id", "text", F.col("ts").cast("timestamp"))
    src.write.mode("overwrite").parquet(str(tmp_path / "dd_in"))

    stream = spark.readStream.schema(src.schema).parquet(str(tmp_path / "dd_in"))
    q = (
        stream_exact_dedup(stream)
        .writeStream.format("memory").queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from dedup_stream").toPandas()
    assert len(got) == 70
    assert got["text"].nunique() == 70


def test_stream_dedup_state_evicts_at_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark semantics: dedup state for a text
    hash is EVICTED once the watermark passes its horizon, so a repeat
    arriving after the horizon is kept as a new first-occurrence (and
    the state store stays bounded at 100 TB/day ingest)."""
    import pandas as pd

    from proj_4_spark.streaming.events import stream_exact_dedup

    base = pd.Timestamp("2024-01-01 00:00:00")
    schema = "doc_id long, text string, ts timestamp"
    in_dir, ckpt = tmp_path / "ev_in", str(tmp_path / "ev_ckpt")
    in_dir.mkdir()

    def write_batch(name, rows):
        pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
        (spark.createDataFrame(pdf)
         .select("doc_id", "text", F.col("ts").cast("timestamp"))
         .repartition(1).write.mode("overwrite")
         .parquet(str(in_dir / name)))

    out_dir = str(tmp_path / "ev_out")

    def run_once():
        # parquet sink (memory sink cannot recover from a checkpoint)
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(str(in_dir) + "/*"))
        q = (stream_exact_dedup(stream, watermark="1 hour")
             .writeStream.format("parquet")
             .outputMode("append")
             .option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # batch 1: "dup" twice within the horizon -> one survivor
    write_batch("b1", [(0, "dup", base), (1, "dup", base + pd.Timedelta(seconds=5)),
                       (2, "other", base + pd.Timedelta(seconds=9))])
    run_once()
    # batch 2: advance event time 3h -> watermark passes base+1h, evicting
    # the batch-1 state at the end of this micro-batch
    write_batch("b2", [(3, "advance", base + pd.Timedelta(hours=3))])
    run_once()
    # batch 3: "dup" again, AFTER the horizon -> must be kept (new state)
    write_batch("b3", [(4, "dup", base + pd.Timedelta(hours=3, seconds=10))])
    run_once()

    got = spark.read.parquet(out_dir).select("doc_id", "text").toPandas()
    texts = got["text"].tolist()
    assert texts.count("dup") == 2, got  # one per horizon, not one total
    assert texts.count("other") == 1 and texts.count("advance") == 1
    assert 0 in got["doc_id"].values and 4 in got["doc_id"].values


def test_stream_geo_tiles_matches_batch(spark, tmp_path):
    """Streaming transform->tile histogram == the batch computation over
    the same replayed events (stream/batch parity of the geo path)."""
    import pandas as pd

    from proj_4_spark.engine.spark import transform
    from proj_4_spark.spatial.tiles import assign_tiles
    from proj_4_spark.streaming.events import stream_geo_tiles

    base = pd.Timestamp("2024-03-01 00:00:00")
    rows = []
    for i in range(2000):
        rows.append((i, base + pd.Timedelta(seconds=i * 7),
                     (i * 7919 % 360000) / 1000.0 - 180.0,
                     (i * 104729 % 170000) / 1000.0 - 85.0))
    src = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "lon", "lat"])
    ).select("event_id", F.col("ts").cast("timestamp"), "lon", "lat")
    src.write.mode("overwrite").parquet(str(tmp_path / "geo_in"))

    stream = spark.readStream.schema(src.schema).parquet(str(tmp_path / "geo_in"))
    q = (stream_geo_tiles(stream, zoom=6, window="10 minutes",
                          watermark="5 minutes")
         .writeStream.format("memory").queryName("geo_tiles")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "geo_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql("select * from geo_tiles").toPandas()
           .sort_values(["window_start", "tile_x", "tile_y"])
           .reset_index(drop=True))

    wm = transform(src, "+proj=webmerc +ellps=WGS84", x="lon", y="lat",
                   out_prefix="wm_", keep_errors=False)
    batch = (assign_tiles(wm, x="wm_x", y="wm_y", zoom=6)
             .groupBy(F.window("ts", "10 minutes"), "tile_x", "tile_y")
             .agg(F.count("*").alias("n"))
             .select(F.col("window.start").alias("window_start"),
                     "tile_x", "tile_y", "n")
             .toPandas()
             .sort_values(["window_start", "tile_x", "tile_y"])
             .reset_index(drop=True))
    # append mode emits only windows the watermark closed (end <=
    # max_ts - 5 min); everything else must match batch exactly
    import pandas as pd

    max_ts = pd.Timestamp("2024-03-01") + pd.Timedelta(seconds=1999 * 7)
    horizon = max_ts - pd.Timedelta(minutes=5)
    closed = batch[batch["window_start"] + pd.Timedelta(minutes=10) <= horizon]
    assert len(got) >= len(closed), (len(got), len(closed))
    merged = got.merge(batch, on=["window_start", "tile_x", "tile_y"],
                       suffixes=("_s", "_b"))
    assert len(merged) == len(got)
    assert (merged["n_s"] == merged["n_b"]).all()
