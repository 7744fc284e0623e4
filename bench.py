"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and prints
ONE JSON line: {"metric", "value" (total sec), "unit", "queries", "sf"}.

`python bench.py --scaling` additionally runs the same workload at
local[8] and local[32] and reports throughput + scaling efficiency
(the sandbox proxy for N vs 4N executors, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

# headline subset: one per engine layer (transform kernel, spatial join,
# cell/tile index, window agg, join agg, dedup, ANN, full doc pipeline)
HEADLINE = [
    "merc_fwd",
    "utm_roundtrip",
    "webmerc_tiles",
    "cell_counts",
    "pipeline_datum_shift",
    "pip_rect_zones",
    "events_hourly",
    "tpch_q1",
    "revenue_by_nation",
    "dedup_exact",
    "ann_cosine_topk",
    "docs_geo_pipeline",
]


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"proj4spark-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def run_workload(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # count() forces full execution without driver-side materialization
        df.count()
        times[name] = round(time.perf_counter() - t0, 3)
    return times


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    if "--scaling" in sys.argv:
        report = {}
        for n in (8, 32):
            spark = make_spark(n)
            spark.sparkContext.setLogLevel("ERROR")
            run_workload(spark, sf_dir)  # warm-up (JIT, file cache)
            t0 = time.perf_counter()
            times = run_workload(spark, sf_dir)
            total = time.perf_counter() - t0
            spark.stop()
            report[n] = {"total_sec": round(total, 3), "queries": times}
        t8 = report[8]["total_sec"]
        t32 = report[32]["total_sec"]
        # efficiency of 4x parallelism: ideal speedup 4 -> eff = speedup/4
        eff = (t8 / t32) / 4.0
        report["scaling_efficiency_8_to_32"] = round(eff, 3)
        print(json.dumps(report))
        return

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    times = run_workload(spark, sf_dir)
    spark.stop()
    print(json.dumps({
        "metric": "headline-suite wall time (transform+spatial+agg+dedup+ann)",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
