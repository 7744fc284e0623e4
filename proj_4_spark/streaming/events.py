"""Structured Streaming layer.

The reference's closest streaming analogue is `cct` — an unbounded stdin
coordinate filter with no state (src/apps/cct.cpp:197-368; SURVEY.md §2.5).
Our engine upgrades that to Structured Streaming:

- stream_transform: readStream -> whole-pipeline pandas-UDF transform ->
  writeStream (the streaming twin of engine/spark.transform; stateless,
  so exactly-once with any replayable source + idempotent sink)
- windowed_cell_counts: event-time tumbling windows + watermark for late
  data, counting media points per spatial cell
- sessionize_by_user: custom stateful operator via applyInPandasWithState
  (session gaps), the pattern for bespoke streaming state the built-ins
  can't express

Scale notes: state is keyed by (cell|user) and lives in the state store;
hot keys are pre-salted like the batch layer.  shuffle partitions sized
via spark.sql.shuffle.partitions as usual.
"""

from __future__ import annotations

import pandas as pd


def stream_transform(stream_df, projstring: str, x: str, y: str,
                     out_prefix: str = "out_"):
    """Stateless streaming transform: same fused-pipeline UDF as batch."""
    from proj_4_spark.engine.spark import transform

    return transform(stream_df, projstring, x=x, y=y, out_prefix=out_prefix)


def windowed_cell_counts(stream_df, ts_col: str = "ts",
                         lon_col: str = "lon", lat_col: str = "lat",
                         res: int = 5, window: str = "10 minutes",
                         watermark: str = "15 minutes"):
    """Event-time tumbling-window counts per spatial cell with a
    watermark bounding late-data state."""
    from pyspark.sql import functions as F

    from proj_4_spark.spatial.cells import cell_col

    return (
        stream_df.withWatermark(ts_col, watermark)
        .withColumn("cell", cell_col(F.col(lon_col), F.col(lat_col), res))
        .groupBy(F.window(F.col(ts_col), window), F.col("cell"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "cell", "n",
        )
    )


SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
SESSION_STATE_SCHEMA = "start long, end long, n long"


def _session_fn(key, pdf_iter, state):
    """applyInPandasWithState update fn: classic gap-based sessionization.
    Emits a session row when the gap since the last event exceeds the
    timeout (or the watermark closes the group)."""
    import datetime

    (user_id,) = key
    timeout_us = 30 * 60 * 1000 * 1000  # 30 min gap, microseconds
    if state.exists:
        start, end, n = state.get
    else:
        start, end, n = None, None, 0
    out = []
    for pdf in pdf_iter:
        for ts in sorted(pdf["ts"]):
            us = int(ts.value // 1000)  # ns -> us
            if start is None:
                start, end, n = us, us, 1
            elif us - end > timeout_us:
                out.append((user_id, start, end, n))
                start, end, n = us, us, 1
            else:
                end = max(end, us)
                n += 1
    if state.hasTimedOut:
        if start is not None:
            out.append((user_id, start, end, n))
        state.remove()
    else:
        state.update((start if start is not None else 0,
                      end if end is not None else 0, n))
        # timeout = the session gap itself: a shorter processing-time
        # timeout would close (and split) a session during an arrival
        # lull that the 30-min *event-time* gap semantics keep open
        state.setTimeoutDuration(30 * 60 * 1000)
    if not out:
        yield pd.DataFrame(
            columns=["user_id", "session_start", "session_end", "n_events"]
        )
        return
    yield pd.DataFrame(
        {
            "user_id": [o[0] for o in out],
            "session_start": [datetime.datetime.utcfromtimestamp(o[1] / 1e6) for o in out],
            "session_end": [datetime.datetime.utcfromtimestamp(o[2] / 1e6) for o in out],
            "n_events": [o[3] for o in out],
        }
    )


def sessionize_by_user(stream_df, ts_col: str = "ts", user_col: str = "user_id"):
    """Custom stateful streaming operator (applyInPandasWithState):
    gap-based sessions per user.  SURVEY.md §2.5 'custom stateful
    operators'."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream_df.withWatermark(ts_col, "30 minutes")
        .groupBy(user_col)
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def stream_exact_dedup(stream_df, id_col: str = "doc_id",
                       text_col: str = "text", ts_col: str = "ts",
                       watermark: str = "1 hour"):
    """Streaming exact dedup for a training-data ingest: keep the first
    occurrence of each md5(text) within the watermark horizon.

    Uses dropDuplicatesWithinWatermark so Spark actually evicts dedup
    state at the watermark: plain dropDuplicates(['text_hash']) never
    evicts (the event-time column is not in the key), so at 100 TB/day
    the state store would grow without bound.  With the WithinWatermark
    variant the store only holds one horizon's digests, and a repeat of
    a text arriving after the horizon is correctly kept as a new
    first-occurrence.  Streaming twin of functions/dedup.exact_dedup.
    """
    from pyspark.sql import functions as F

    deduped = (
        stream_df
        .withColumn("text_hash", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
    )
    if not hasattr(deduped, "dropDuplicatesWithinWatermark"):
        # Spark < 3.5: there is NO variant with these semantics —
        # dropDuplicates([hash]) never evicts state, and
        # dropDuplicates([hash, ts]) deduplicates nothing (every
        # occurrence has a distinct ts).  Fail loudly rather than
        # silently ship either wrong behavior.
        raise RuntimeError(
            "stream_exact_dedup requires Spark >= 3.5 "
            "(dropDuplicatesWithinWatermark)")
    return deduped.dropDuplicatesWithinWatermark(["text_hash"])


def stream_geo_tiles(stream_df, projstring: str = "+proj=webmerc +ellps=WGS84",
                     ts_col: str = "ts", lon_col: str = "lon",
                     lat_col: str = "lat", zoom: int = 8,
                     window: str = "10 minutes", watermark: str = "15 minutes"):
    """The flagship doc-geo pipeline as a STREAM: Arrow-batched
    projection transform -> JVM integer tile assignment -> event-time
    windowed tile histogram with a watermark bounding late-data state.

    Composes the batch building blocks unchanged (engine/spark.transform
    + spatial/tiles.assign_tiles are plan-level constructs, so they work
    on streaming DataFrames as-is) — the streaming twin of
    __spark_entry__'s docs_geo_pipeline/webmerc_tiles."""
    from pyspark.sql import functions as F

    from proj_4_spark.engine.spark import transform
    from proj_4_spark.spatial.tiles import assign_tiles

    wm = transform(stream_df.withWatermark(ts_col, watermark), projstring,
                   x=lon_col, y=lat_col, out_prefix="wm_", keep_errors=False)
    tiled = assign_tiles(wm, x="wm_x", y="wm_y", zoom=zoom)
    return (
        tiled.groupBy(F.window(F.col(ts_col), window), "tile_x", "tile_y")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"),
                "tile_x", "tile_y", "n")
    )
