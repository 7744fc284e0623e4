"""Deterministically scale the driver's sf0.1 tables x10 into
benchdata/sf1 for the single sf1 bench point (VERDICT r4 item 7).

No external data and no RNG: each table is 10 deterministic copies of
the sf0.1 rows with keys offset per copy (joins stay consistent:
orders.o_custkey and customer.c_custkey shift together, lineitem rides
its orders), timestamps shifted per copy so window aggregations see new
groups, and embeddings perturbed per copy so near-duplicate structure
is preserved rather than exact-duplicated.  documents are replicated
verbatim (the dedup queries then see a 10x-duplicated corpus — realistic
for web-scale crawls and documented next to the sf1 numbers).

Usage: python tools/gen_sf1.py [--out benchdata/sf1] [--k 10]
       python tools/gen_sf1.py --out benchdata/sf10 --k 100   # sf10
(--k copies of the sf0.1 rows: 10 -> sf1, 100 -> sf10; the key-offset
arithmetic is K-independent, so joins stay consistent at any scale)
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"

N_EVENTS = 100_000
N_ORDERS = 150_000
N_CUST = 15_000
N_DOCS = 5_000
N_VECS = 2_000


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchdata", "sf1"))
    ap.add_argument("--k", type=int, default=10,
                    help="scale multiplier over sf0.1 (10=sf1, 100=sf10)")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        "create table copies as select unnest(range(%d)) as k" % args.k)

    def write(name: str, sql: str) -> None:
        out = os.path.join(args.out, f"{name}.parquet")
        con.execute(
            f"copy ({sql}) to '{out}' (format parquet, "
            "compression zstd)")
        n = con.sql(f"select count(*) from read_parquet('{out}')"
                    ).fetchone()[0]
        print(f"{name}: {n} rows")

    write("events", f"""
        select e.event_id + c.k * {N_EVENTS} as event_id,
               e.ts + to_hours(c.k) as ts,
               e.user_id + c.k * 100 as user_id,
               e.event_type, e.value, e.props
        from read_parquet('{SRC}/events.parquet') e cross join copies c
        order by event_id""")
    write("customer", f"""
        select c_custkey + c.k * {N_CUST} as c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        from read_parquet('{SRC}/customer.parquet') cross join copies c
        order by c_custkey""")
    write("orders", f"""
        select o_orderkey + c.k * {N_ORDERS * 4} as o_orderkey,
               o_custkey + c.k * {N_CUST} as o_custkey,
               o_orderstatus, o_totalprice, o_orderdate,
               o_orderpriority
        from read_parquet('{SRC}/orders.parquet') cross join copies c
        order by o_orderkey""")
    write("lineitem", f"""
        select l_orderkey + c.k * {N_ORDERS * 4} as l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag,
               l_linestatus, l_shipdate
        from read_parquet('{SRC}/lineitem.parquet') cross join copies c
        order by l_orderkey, l_linenumber""")
    write("documents", f"""
        select doc_id + c.k * {N_DOCS} as doc_id, text, lang, source,
               n_chars
        from read_parquet('{SRC}/documents.parquet') cross join copies c
        order by doc_id""")
    write("embeddings", f"""
        select vec_id + c.k * {N_VECS} as vec_id,
               case when c.k = 0 then embedding
                    else list_transform(embedding,
                         x -> cast(x + c.k * 0.001 as float)) end
                   as embedding,
               label
        from read_parquet('{SRC}/embeddings.parquet') cross join copies c
        order by vec_id""")
    for name in ("nation", "region", "supplier", "part"):
        write(name, f"select * from read_parquet('{SRC}/{name}.parquet')")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
