import sys, time
sys.path.insert(0, '/root/repo')
import duckdb, pandas as pd, numpy as np
from pyspark.sql import SparkSession

import __spark_entry__ as E

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in TABLES:
    con.execute(f"create view {t} as select * from parquet_scan('{SF}/{t}.parquet')")

names = sys.argv[1:] if len(sys.argv) > 1 else list(E.queries())
qs, os_ = E.queries(), E.oracle_sql()
for name in names:
    t0 = time.time()
    sdf = qs[name](spark, SF).toPandas()
    if name not in os_:
        print(f"{name}: rows-only {len(sdf)} ({time.time()-t0:.1f}s)")
        continue
    odf = con.execute(os_[name]).df()
    cols_s, cols_o = sorted(sdf.columns), sorted(odf.columns)
    ok_schema = cols_s == cols_o
    s = sdf[cols_s].sort_values(cols_s).reset_index(drop=True)
    o = odf[cols_o].sort_values(cols_o).reset_index(drop=True)
    ok_rows = len(s) == len(o)
    ok_vals = ok_rows and ok_schema and all(
        np.array_equal(s[c].to_numpy(), o[c].to_numpy())
        or (np.issubdtype(s[c].dtype, np.floating) and np.allclose(s[c], o[c], rtol=0, atol=0, equal_nan=True))
        for c in cols_s)
    print(f"{name}: rows {len(s)}/{len(o)} schema={ok_schema} values={ok_vals} ({time.time()-t0:.1f}s)")
    if not ok_vals and ok_schema and ok_rows:
        for c in cols_s:
            a, b = s[c].to_numpy(), o[c].to_numpy()
            try: eq = np.array_equal(a, b)
            except Exception: eq = (a == b).all()
            if not eq:
                print("   mismatch col", c, a[:5], b[:5])
