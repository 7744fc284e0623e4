"""Resumable checkpoints + per-partition lineage/metrics (north_rule).

The 10^12-doc pipeline must be resumable and observable:

- Checkpointing: outputs land in a snapshot directory per run
  (`snapshot-<label>`); `remaining_docs` anti-joins already-processed
  doc_ids so a restarted job only touches unprocessed ranges
  (SURVEY.md §2.5 "resumable checkpoints": Iceberg snapshot semantics with
  a parquet fallback — this sandbox has no Iceberg catalog, so the
  parquet path is the tested one; the Iceberg variant swaps
  `format("iceberg")` in and keeps the same anti-join).
- Lineage/metrics: run_with_lineage wraps a doc->points stage with
  mapInPandas that emits per-partition counts (rows in, rows out,
  transform errors) to a metrics table keyed by (run_id, partition_id).

At scale both sides of the anti-join are bucketed by doc_id so resuming
is a co-partitioned join, not a broadcast of 10^12 keys.
"""

from __future__ import annotations

import os

import pandas as pd


def snapshot_dir(base_dir: str, label: str) -> str:
    return os.path.join(base_dir, f"snapshot-{label}")


def write_snapshot(df, base_dir: str, label: str, mode: str = "overwrite"):
    """Write a completed stage output as an immutable snapshot."""
    path = snapshot_dir(base_dir, label)
    df.write.mode(mode).parquet(path)
    return path


def processed_doc_ids(spark, base_dir: str, label: str):
    path = snapshot_dir(base_dir, label)
    try:
        return spark.read.parquet(path).select("doc_id").distinct()
    except Exception:
        return None


def remaining_docs(docs_df, spark, base_dir: str, label: str):
    """Docs not yet present in the snapshot: left_anti on doc_id
    (df.join(done, 'doc_id', 'left_anti') — SURVEY.md §2.5)."""
    done = processed_doc_ids(spark, base_dir, label)
    if done is None:
        return docs_df
    return docs_df.join(done, "doc_id", "left_anti")


def with_partition_lineage(df, run_id: str, stage: str,
                           metrics_dir: str | None = None):
    """Append per-partition lineage metrics while streaming rows through.

    mapInPandas pass-through that counts rows per physical partition and
    (optionally) writes one metrics parquet per partition under
    metrics_dir/run_id/stage/ — written executor-side so there is no
    driver collect.  Returns the unchanged DataFrame.
    """
    from pyspark import TaskContext

    schema = df.schema

    def gen(batches):
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else -1
        n_rows = 0
        n_batches = 0
        for pdf in batches:
            n_rows += len(pdf)
            n_batches += 1
            yield pdf
        if metrics_dir is not None:
            out = os.path.join(metrics_dir, run_id, stage)
            os.makedirs(out, exist_ok=True)
            pd.DataFrame(
                {
                    "run_id": [run_id],
                    "stage": [stage],
                    "partition_id": [pid],
                    "n_rows": [n_rows],
                    "n_batches": [n_batches],
                }
            ).to_parquet(os.path.join(out, f"part-{pid:05d}.parquet"))

    return df.mapInPandas(gen, schema=schema)


def read_lineage(spark, metrics_dir: str, run_id: str, stage: str):
    return spark.read.parquet(os.path.join(metrics_dir, run_id, stage))


def transform_error_counts(points_df, x_col: str):
    """Transform-count metrics: ok vs errored (NaN sentinel) rows per
    spatial partition — the 'transform counts' half of the north_rule
    lineage requirement.  Pure JVM aggregation."""
    from pyspark.sql import functions as F

    return points_df.select(
        F.spark_partition_id().alias("partition_id"),
        F.when(F.isnan(F.col(x_col)) | F.col(x_col).isNull(), 1)
        .otherwise(0).alias("is_err"),
    ).groupBy("partition_id").agg(
        F.count("*").alias("n_rows"),
        F.sum("is_err").alias("n_errors"),
    )
