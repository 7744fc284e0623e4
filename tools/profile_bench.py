"""Per-query profiling for the optimization round (guide §1): splits the
bench's timed region (fn build + count) into plan-construction time vs
execution time, and adds a noop-sink full-materialization time so the
select-only rows are measured honestly (bench.py itself is frozen).

Usage: python tools/profile_bench.py [sf_dir] [query ...]
Prints one JSON line per query:
  {"q": name, "build": s, "count": s, "noop": s}  (each best-of-3)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = args[0] if args else "/root/testdata/sf1.0"
    only = args[1:]

    from bench import HEADLINE, make_spark

    import __spark_entry__ as E

    spark = make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    # warm-up identical to bench.py
    qs["merc_fwd"](spark, "/root/testdata/sf0.001").count()
    qs["utm_roundtrip"](spark, "/root/testdata/sf0.001").count()
    qs["docs_geo_pipeline"](spark, "/root/testdata/sf0.001").count()
    qs["ann_lsh_prebuilt"](spark, sf_dir)
    qs["ann_ivf_prebuilt"](spark, sf_dir)

    names = only or HEADLINE
    for name in names:
        fn = qs[name]
        build = cnt = noop = None
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"{name}: build")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{name}: count")
            df.count()
            t2 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{name}: noop")
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            b, c, n = t1 - t0, t2 - t1, t3 - t2
            build = b if build is None else min(build, b)
            cnt = c if cnt is None else min(cnt, c)
            noop = n if noop is None else min(noop, n)
        print(json.dumps({"q": name, "build": round(build, 3),
                          "count": round(cnt, 3), "noop": round(noop, 3),
                          "bench_proxy": round(build + cnt, 3)}))
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
