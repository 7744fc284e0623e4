"""Deduplication operators for large-scale training-data pipelines.

- exact_dedup:     hash-groupBy on canonical text (map-side combine;
                   one shuffle on the hash key)
- minhash_lsh:     shingle -> minhash signature -> band-bucket join
                   (near-dup candidate pairs without O(n^2))
- simhash:         64-bit simhash + Hamming-ball bucketing
- ngram_jaccard:   exact Jaccard on shingle sets for candidate pairs

Scale notes: every stage is a single shuffle keyed on a hash/band
bucket; signatures are computed in one Arrow-batched pandas UDF per doc
(NumPy across the shingle x permutation matrix).  Hot buckets (boilerplate
docs) are capped by `max_bucket` to bound reducer fan-in — the dedup
analogue of hot-cell salting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# 31-bit universe keeps (a*x + b) < 2^63: exact in int64, no bigint path
_MERSENNE = (1 << 31) - 1


def _hash_params(num_perm: int, seed: int = 42):
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64)
    return a, b


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Character k-shingles -> int64 hashes (FNV-1a, vectorized)."""
    data = text.encode("utf-8", "ignore")
    if len(data) < k:
        data = data + b" " * (k - len(data))
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(arr) - k + 1
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            h = (h ^ arr[i : i + n]) * np.uint64(0x100000001B3)
    return np.unique(h)


def _shingle_hashes_31(text: str, k: int = 5) -> np.ndarray:
    """31-bit-folded shingle universe for the minhash permutations."""
    return np.unique(
        (_shingle_hashes(text, k) & np.uint64(0x7FFFFFFF)).astype(np.int64)
    )


def exact_dedup(df, text_col: str = "text", id_col: str = "doc_id"):
    """Exact duplicate groups: md5(text) -> (hash, n_docs, keep_id).
    keep_id = min id (deterministic survivor)."""
    from pyspark.sql import functions as F

    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def minhash_signatures(df, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 64, k: int = 5, seed: int = 42):
    """Add a minhash signature column (array<long>, length num_perm)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    a, b = _hash_params(num_perm, seed)

    @pandas_udf("array<long>")
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            sh = _shingle_hashes_31(t or "", k)
            # (a*x + b) mod p per permutation, min over shingles;
            # 31-bit operands keep every product exact in int64
            vals = (a[None, :] * sh[:, None] + b[None, :]) % _MERSENNE
            out.append(vals.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    return df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")) \
             .withColumn("sig", _sig(F.col("text")))


def minhash_lsh_pairs(df, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, bands: int = 16, k: int = 5,
                      seed: int = 42, max_bucket: int = 1000):
    """Near-duplicate candidate pairs via banded LSH.

    Plan: signature UDF -> explode band digests -> self-join per
    (band, digest) bucket -> distinct pairs.  Buckets larger than
    `max_bucket` are dropped (boilerplate guard; logged upstream)."""
    from pyspark.sql import functions as F

    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, num_perm, k, seed)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[
                F.xxhash64(F.concat_ws(",", *[
                    F.col("sig")[i].cast("string")
                    for i in range(bd * rows_per_band, (bd + 1) * rows_per_band)
                ]))
                for bd in range(bands)
            ])
        ).alias("band", "digest"),
    )
    # bucket-size guard (boilerplate shield)
    from pyspark.sql import Window

    sized = banded.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("band", "digest"))
    ).where(F.col("bucket_n") <= max_bucket)
    a = sized.select("band", "digest", F.col("doc_id").alias("id_a"))
    b = sized.select("band", "digest", F.col("doc_id").alias("id_b"))
    return (
        a.join(b, ["band", "digest"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash_col(df, text_col: str = "text", id_col: str = "doc_id", k: int = 5):
    """64-bit simhash per doc (array-of-bit-majorities over shingle
    hashes), as a long column."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _sim(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            sh = _shingle_hashes(t or "", k).astype(np.uint64)
            bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
            votes = 2 * bits.sum(axis=0) - len(sh)
            word = np.uint64(0)
            for bpos in np.nonzero(votes > 0)[0]:
                word |= np.uint64(1) << np.uint64(bpos)
            out[i] = np.int64(word.astype(np.int64))
        return pd.Series(out)

    return df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")) \
             .withColumn("simhash", _sim(F.col("text")))


def ngram_jaccard_pairs(df, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 5, threshold: float = 0.7,
                        num_perm: int = 64, bands: int = 16, seed: int = 42):
    """Exact Jaccard on LSH candidate pairs (verify stage after
    minhash_lsh_pairs): returns (id_a, id_b, jaccard >= threshold)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    pairs = minhash_lsh_pairs(df, text_col, id_col, num_perm, bands, k, seed)
    texts = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    joined = (
        pairs.join(texts.withColumnRenamed("doc_id", "id_a")
                   .withColumnRenamed("text", "text_a"), "id_a")
        .join(texts.withColumnRenamed("doc_id", "id_b")
              .withColumnRenamed("text", "text_b"), "id_b")
    )

    @pandas_udf("double")
    def _jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.empty(len(ta))
        for i in range(len(ta)):
            sa = _shingle_hashes_31(ta.iloc[i] or "", k)
            sb = _shingle_hashes_31(tb.iloc[i] or "", k)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            out[i] = inter / union if union else 1.0
        return pd.Series(out)

    return (
        joined.withColumn("jaccard", _jac(F.col("text_a"), F.col("text_b")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
