"""Grid hot-path micro-bench (VERDICT r6 item 7): pts/s through a real
NTv2 route (+proj=hgridshift +grids=BETA2007.gsb, the DHDN->ETRS89
grid the DHDN gie file exercises), measured at

  1. single-process NumPy kernels (Operation.apply, 131072-pt batches,
     the same shape as the cart->helmert micro-bench in BENCH §1), and
  2. full Spark local[32] through transform() — this route is the last
     Arrow-bound hot path (one ArrowEvalPython node by design: the
     bilinear grid interpolation stays in the NumPy kernel layer).

Points are a deterministic grid inside the BETA2007 coverage (Germany,
lon 6..15 E, lat 47.5..54.5 N) so every lane takes the interpolation
fast path (no out-of-grid fallback rows).

Usage: python tools/bench_grid_route.py [--n 4000000]
Prints one line per configuration.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PS = "+proj=hgridshift +grids=BETA2007.gsb"
BATCH = 131072


def make_points(n: int):
    i = np.arange(n, dtype=np.float64)
    lon = 6.0 + (i * 7919.0 % 900000.0) / 100000.0   # 6..15 deg
    lat = 47.5 + (i * 104729.0 % 700000.0) / 100000.0  # 47.5..54.5
    return np.radians(lon), np.radians(lat)


def bench_numpy(n: int) -> float:
    from proj_4_spark.engine.plan import create_operation

    op = create_operation(PS)
    lon, lat = make_points(n)
    z = np.zeros(BATCH)
    t = np.zeros(BATCH)
    # warm (grid mmap + first interpolation)
    op.apply(lon[:BATCH], lat[:BATCH], z, t)
    t0 = time.time()
    for s in range(0, n, BATCH):
        sl = slice(s, min(s + BATCH, n))
        m = sl.stop - sl.start
        op.apply(lon[sl], lat[sl], z[:m], t[:m])
    dt = time.time() - t0
    return n / dt


def bench_spark(n: int) -> float:
    from pyspark.sql import SparkSession

    from proj_4_spark.engine.spark import transform

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false").getOrCreate())
    df = (spark.range(n, numPartitions=32).selectExpr(
        "radians(6.0D + (id * 7919 % 900000) / 100000.0D) AS lon",
        "radians(47.5D + (id * 104729 % 700000) / 100000.0D) AS lat",
    )).cache()
    df.count()
    out = transform(df, PS, x="lon", y="lat", degrees=False,
                    out_prefix="s_")
    out.selectExpr("sum(s_x + s_y)").collect()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out.selectExpr("sum(s_x + s_y)").collect()
        best = min(best, time.time() - t0)
    spark.stop()
    return n / best


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000)
    args = ap.parse_args(argv)
    r1 = bench_numpy(args.n)
    print(f"ntv2-route numpy 1-proc: {r1 / 1e6:.2f} M pts/s "
          f"({args.n} pts, batch {BATCH})", flush=True)
    r2 = bench_spark(args.n)
    print(f"ntv2-route spark local[32] (ArrowEvalPython): "
          f"{r2 / 1e6:.2f} M pts/s (exec-only best-of-3)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
