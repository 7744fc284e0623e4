"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at a given sf, compare
row count, schema (column names) and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(float)
                continue
            except (ValueError, TypeError):
                pass
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype("int64")
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> str:
    if len(got) != len(exp):
        return f"ROWS {len(got)} != {len(exp)}"
    g, e = normalize(got), normalize(exp)
    if list(g.columns) != list(e.columns):
        return f"SCHEMA {list(g.columns)} != {list(e.columns)}"
    for c in g.columns:
        gv, ev = g[c].to_numpy(), e[c].to_numpy()
        if gv.dtype.kind == "f":
            if not np.allclose(gv, ev, rtol=0, atol=0, equal_nan=True):
                bad = np.nonzero(~np.isclose(gv, ev, rtol=0, atol=0, equal_nan=True))[0][:3]
                return f"VALUES col {c}: e.g. {gv[bad]} vs {ev[bad]}"
        else:
            if not (gv == ev).all():
                bad = np.nonzero(gv != ev)[0][:3]
                return f"VALUES col {c}: e.g. {gv[bad]} vs {ev[bad]}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute("set TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"{name:24s} SPARK ERROR: {ex}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(got)} rows")
            n_ok += 1
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"{name:24s} ORACLE ERROR: {ex}")
            n_bad += 1
            continue
        verdict = compare(name, got, exp)
        print(f"{name:24s} {verdict}  ({len(got)} rows)")
        if verdict == "OK":
            n_ok += 1
        else:
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
