"""Hot-cell skew salting + two-phase aggregation.

At 10^12 documents the cell histogram is power-law (cities): a plain
groupBy(cell) sends whole metros to single reducers.  north_rule demands
explicit salting (AQE skew-join is the backstop, not the plan):

  salted = concat(cell, pmod(xxhash64(doc_id), n_salt))
  phase 1: partial aggregate per (cell, salt)   -- map-side combine
  phase 2: final aggregate per cell             -- tiny shuffle

SURVEY.md §2.5 "hot-cell skew salting".
"""

from __future__ import annotations


def with_salt(df, key_col: str = "cell", id_col: str = "doc_id",
              n_salt: int = 16, out_col: str = "salted_cell"):
    from pyspark.sql import functions as F

    return df.withColumn(
        out_col,
        F.concat_ws("#", F.col(key_col).cast("string"),
                    F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt)).cast("string")),
    )


def salted_count(df, key_col: str = "cell", id_col: str = "doc_id", n_salt: int = 16):
    """Two-phase count per key: partial per (key, salt), final per key.

    Equivalent to df.groupBy(key).count() but with bounded reducer fan-in
    on hot keys."""
    from pyspark.sql import functions as F

    salted = with_salt(df, key_col, id_col, n_salt)
    partial = salted.groupBy(key_col, "salted_cell").agg(F.count("*").alias("partial_n"))
    return partial.groupBy(key_col).agg(F.sum("partial_n").alias("n"))


def salted_agg(df, key_col: str, id_col: str, aggs: dict, n_salt: int = 16):
    """Generic two-phase aggregation for decomposable aggregates.

    aggs: {out_name: (col, 'sum'|'count'|'min'|'max')}"""
    from pyspark.sql import functions as F

    salted = with_salt(df, key_col, id_col, n_salt)
    partial_exprs = []
    final_exprs = []
    for out, (col, how) in aggs.items():
        p = f"_p_{out}"
        if how == "count":
            partial_exprs.append(F.count(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif how == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif how == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out))
        elif how == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate {how!r}")
    partial = salted.groupBy(key_col, "salted_cell").agg(*partial_exprs)
    return partial.groupBy(key_col).agg(*final_exprs)
