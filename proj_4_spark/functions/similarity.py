"""Similarity search over embedding columns (array<float>).

- cosine_topk:      brute-force exact top-k (the baseline) — dot products
                    computed JVM-side with F.aggregate/F.zip_with (no
                    Python in the hot path)
- lsh_bucket_topk:  random-hyperplane LSH bucketing, the scale path:
                    candidates only within matching sign-buckets, exact
                    re-rank inside buckets.  At 100 TB the bucket join is
                    a hash join on a short signature key; brute force is
                    O(n*q) and reserved for oracles.
- embedding_cosine_dedup: near-dup pairs by cosine >= threshold within
                    LSH buckets (embedding analogue of minhash dedup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401 — pandas_udf resolves `pd.Series` hints


def _norm_col(vec_col):
    from pyspark.sql import functions as F

    return F.sqrt(F.aggregate(vec_col, F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x.cast("double")))


def _dot_col(a, b):
    from pyspark.sql import functions as F

    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(emb_df, query_df, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "q_id", q_vec_col: str = "embedding",
                raw_cosine: bool = False):
    """Exact brute-force cosine top-k: broadcast queries x corpus, dot
    product via zip_with/aggregate (whole-stage codegen), window top-k.

    Scale shape: corpus never shuffles; queries broadcast; the only
    shuffle is the final top-k window keyed by query (tiny)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    corpus = emb_df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"),
        _norm_col(F.col(vec_col)).alias("v_norm"),
    )
    queries = query_df.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("q"),
        _norm_col(F.col(q_vec_col)).alias("q_norm"),
    )
    cand = corpus.crossJoin(F.broadcast(queries))
    cand = cand.withColumn(
        "cosine",
        _dot_col(F.col("v"), F.col("q")) / (F.col("v_norm") * F.col("q_norm")),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    cos_out = F.col("cosine") if raw_cosine else F.round("cosine", 6)
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", cos_out.alias("cosine"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim))


# Above this many literal terms (n_planes*dim resp. n_centroids*dim) the
# JVM expression path would embed a matrix of F.lit()s in the Catalyst
# tree — at production widths (dim 768-4096, 64 planes / 65k centroids)
# that blows up analysis and codegen.  Past the threshold we switch to
# one Arrow-batched matmul per batch with the matrix as a closure
# broadcast (a plain NumPy constant shipped once per task).
_JVM_EXPR_MAX_TERMS = 4096


def _i64(mask: int) -> int:
    """Two's-complement fold into a signed 64-bit literal (bit 63 of a
    signature/probe mask must wrap, not overflow the JVM long)."""
    return mask - (1 << 64) if mask >= (1 << 63) else mask


def signature_col(vec_col, planes: np.ndarray, use_pandas: bool | None = None):
    """Sign-bucket signature: bit i = (v . plane_i) > 0, packed into a
    long.

    Small plane matrices are computed JVM-side (aggregate over zip_with
    per plane — whole-stage codegen, no Python).  Large ones switch to a
    single pandas-UDF matmul per Arrow batch so the plan stays O(1) in
    (n_planes x dim) instead of embedding the matrix as literals."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    if use_pandas is None:
        use_pandas = planes.size > _JVM_EXPR_MAX_TERMS

    if not use_pandas:
        sig = F.lit(0).cast("long")
        for i, p in enumerate(planes):
            arr = F.array(*[F.lit(float(x)) for x in p])
            dot = _dot_col(vec_col, arr)
            sig = sig + F.when(dot > 0, F.lit(_i64(1 << i)).cast("long")).otherwise(F.lit(0))
        return sig

    P_t = np.ascontiguousarray(planes.T, dtype=np.float64)  # dim x n_planes
    weights = (np.uint64(1) << np.arange(planes.shape[0], dtype=np.uint64))

    @pandas_udf("long")
    def _sig(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        V = np.asarray(vs.tolist(), dtype=np.float64)
        bits = (V @ P_t) > 0  # one matmul per batch
        out = (bits.astype(np.uint64) * weights).sum(axis=1)
        return pd.Series(out.astype(np.int64))

    return _sig(vec_col)


def lsh_bucket_topk(emb_df, query_df, k: int = 5, n_planes: int = 8,
                    dim: int | None = None, seed: int = 42,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    q_id_col: str = "q_id", q_vec_col: str = "embedding",
                    multiprobe: int = 1, raw_cosine: bool = False):
    """ANN: hyperplane-LSH bucket join + exact cosine re-rank inside the
    bucket.  `multiprobe` additionally probes buckets at Hamming
    distance <= multiprobe from the query signature (recall knob).

    Approximate by construction — the oracle for recall evaluation is
    cosine_topk.

    `dim` (embedding width) is required: inferring it would cost an
    extra Spark job per plan construction."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if dim is None:
        raise ValueError("dim is required (embedding width; avoids an "
                         "extra inference job per call)")
    planes = _hyperplanes(dim, n_planes, seed)

    corpus = emb_df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"),
        _norm_col(F.col(vec_col)).alias("v_norm"),
        signature_col(F.col(vec_col), planes).alias("bucket"),
    )
    queries = query_df.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("q"),
        _norm_col(F.col(q_vec_col)).alias("q_norm"),
        signature_col(F.col(q_vec_col), planes).alias("q_bucket"),
    )
    # multiprobe bucket expansion: probe all buckets within Hamming
    # distance <= multiprobe of the query signature
    probes = [F.col("q_bucket")]
    if multiprobe >= 1:
        probes += [F.col("q_bucket").bitwiseXOR(F.lit(_i64(1 << i)).cast("long"))
                   for i in range(n_planes)]
    if multiprobe >= 2:
        probes += [
            F.col("q_bucket").bitwiseXOR(F.lit(_i64((1 << i) | (1 << j))).cast("long"))
            for i in range(n_planes) for j in range(i + 1, n_planes)
        ]
    queries = queries.withColumn("bucket", F.explode(F.array(*probes)))

    cand = corpus.join(F.broadcast(queries), "bucket")
    cand = cand.withColumn(
        "cosine", _dot_col(F.col("v"), F.col("q")) / (F.col("v_norm") * F.col("q_norm"))
    )
    cos_out = F.col("cosine") if raw_cosine else F.round("cosine", 6)
    # Multiprobe yields the same (q_id, vec_id) candidate from several
    # probed buckets; all copies carry an identical cosine, so under the
    # ranking window's own ordering (cosine desc, vec_id) duplicates are
    # ADJACENT and a lag() marks every copy after the first.  This folds
    # the dedup into the ranking window's single Exchange(q_id) — a
    # groupBy(q_id, vec_id) would add a second full-candidate shuffle on
    # a partitioning the window can't reuse.
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        cand.select("q_id", "vec_id", "cosine")
        .withColumn("_prev", F.lag("vec_id").over(w))
        .where(F.col("_prev").isNull() | (F.col("_prev") != F.col("vec_id")))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", cos_out.alias("cosine"))
    )


def centroid_dots_col(vec_col, cents: np.ndarray, use_pandas: bool | None = None):
    """array<double> of raw dot products v . centroid_i (no norm
    division: centroid argmax and probe ordering are invariant in the
    vector's positive norm, so the division is dead work).

    Same dual path as signature_col: JVM expressions below
    _JVM_EXPR_MAX_TERMS literal terms, one Arrow-batched matmul above."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    if use_pandas is None:
        use_pandas = cents.size > _JVM_EXPR_MAX_TERMS

    if not use_pandas:
        return F.array(*[
            _dot_col(vec_col, F.array(*[F.lit(float(x)) for x in c]))
            for c in cents
        ])

    C_t = np.ascontiguousarray(cents.T, dtype=np.float64)  # dim x n_centroids

    @pandas_udf("array<double>")
    def _cd(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        V = np.asarray(vs.tolist(), dtype=np.float64)
        D = V @ C_t
        return pd.Series(list(D))

    return _cd(vec_col)


def train_centroids(emb_df, n_centroids: int, dim: int, n_iter: int = 5,
                    seed: int = 42, vec_col: str = "embedding",
                    normalize: bool = True) -> np.ndarray:
    """Distributed spherical k-means (Lloyd) for the IVF coarse
    quantizer: assignment is one centroid_dots_col argmax pass (JVM or
    Arrow-matmul path by dim), the update is ONE groupBy aggregation per
    iteration with map-side partial sums (F.aggregate element-wise sum
    over the vector column — no Python in the update).

    Returns (n_centroids, dim) float64 unit centroids, deterministic
    given the seed (empty clusters keep their previous centroid).
    Scale shape per iteration: one scan + one shuffle of n_centroids*dim
    partial sums — independent of corpus size beyond the scan."""
    from pyspark.sql import functions as F

    rng = np.random.Generator(np.random.PCG64(seed))
    cents = rng.standard_normal((n_centroids, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    base = emb_df.select(F.col(vec_col).alias("v"))
    for _ in range(n_iter):
        # two-step projection (same reason as ivf_topk): argmax
        # references the dots twice, and only a separate projection
        # stops CollapseProject from inlining the per-row matmul twice
        dotted = base.select(
            "v", centroid_dots_col(F.col("v"), cents).alias("_cd"))
        assigned = dotted.select(
            "v",
            (F.array_position(F.col("_cd"), F.array_max(F.col("_cd")))
             .cast("int") - 1).alias("list_id"),
        )
        # element-wise sums via posexplode + hash aggregate: map-side
        # partial aggregation shrinks the shuffle to n_centroids*dim
        # partials per task regardless of corpus size (collect_list-style
        # per-cluster materialization would not)
        sums = (assigned
                .select("list_id", F.posexplode("v").alias("i", "val"))
                .groupBy("list_id", "i")
                .agg(F.sum(F.col("val").cast("double")).alias("s"),
                     F.count("*").alias("n"))
                .collect())
        acc = np.zeros((n_centroids, dim))
        cnt = np.zeros(n_centroids, dtype=np.int64)
        for row in sums:
            # a non-finite corpus vector yields array_max=NaN ->
            # array_position null -> null list_id; skip it rather than
            # letting one bad vector abort training with a TypeError
            if row["list_id"] is None:
                continue
            acc[row["list_id"], row["i"]] = row["s"]
            cnt[row["list_id"]] = row["n"]
        new = cents.copy()
        nz = cnt > 0
        means = acc[nz] / cnt[nz, None]
        if normalize:
            nrm = np.linalg.norm(means, axis=1, keepdims=True)
            means = np.where(nrm > 0, means / np.where(nrm == 0, 1, nrm),
                             means)
        new[nz] = means
        cents = new
    return cents


def ivf_topk(emb_df, query_df, k: int = 5, n_centroids: int = 16,
             n_probe: int = 4, dim: int | None = None, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "embedding",
             raw_cosine: bool = False,
             centroids: np.ndarray | None = None):
    """ANN via IVF (inverted-file) coarse quantization: corpus vectors
    are assigned to their nearest of `n_centroids` fixed random-unit
    centroids (one JVM-side argmax over dot products — no k-means
    iterations, so the plan is a single deterministic pass); each query
    probes its `n_probe` nearest centroid lists and re-ranks exactly.

    Scale shape: the corpus is hash-partitioned by centroid id (the
    inverted file); queries broadcast with their probe list; candidates
    = corpus x (n_probe / n_centroids) — a tunable recall/compute knob.
    Approximate; recall vs cosine_topk pinned in tests.

    `dim` required (see lsh_bucket_topk)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if dim is None:
        raise ValueError("dim is required (embedding width)")
    if centroids is not None:
        cents = np.asarray(centroids, dtype=np.float64)
        n_centroids = cents.shape[0]
    else:
        rng = np.random.Generator(np.random.PCG64(seed))
        cents = rng.standard_normal((n_centroids, dim))
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    def _argmax(arr):
        # index of the max element (JVM-side, no UDF)
        return F.array_position(arr, F.array_max(arr)).cast("int") - 1

    # two-step projection: _argmax references its input twice, and
    # CollapseProject keeps non-cheap expressions (the pandas UDF at
    # production dims) in their own projection instead of inlining the
    # matmul twice per row
    corpus = emb_df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"),
        _norm_col(F.col(vec_col)).alias("v_norm"),
        centroid_dots_col(F.col(vec_col), cents).alias("_cd"),
    )
    corpus = corpus.withColumn("list_id", _argmax(F.col("_cd"))) \
                   .drop("_cd").repartition("list_id")

    q = query_df.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("q"),
        _norm_col(F.col(q_vec_col)).alias("q_norm"),
        centroid_dots_col(F.col(q_vec_col), cents).alias("cd"),
    )
    # probe the n_probe best centroid lists per query
    q = q.withColumn(
        "probes",
        F.slice(
            F.transform(
                F.array_sort(
                    F.transform(
                        F.col("cd"),
                        lambda d, i: F.struct((-d).alias("nd"), i.alias("i")),
                    )
                ),
                lambda s: s["i"],
            ),
            1, n_probe,
        ),
    ).withColumn("list_id", F.explode("probes")).drop("cd", "probes")

    cand = corpus.join(F.broadcast(q), "list_id")
    cand = cand.withColumn(
        "cosine", _dot_col(F.col("v"), F.col("q")) / (F.col("v_norm") * F.col("q_norm"))
    )
    cos_out = F.col("cosine") if raw_cosine else F.round("cosine", 6)
    return (
        cand.withColumn("rank", F.row_number().over(
            Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", cos_out.alias("cosine"))
    )


def embedding_cosine_dedup(emb_df, threshold: float = 0.95, n_planes: int = 12,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           seed: int = 42, dim: int | None = None):
    """Near-duplicate vector pairs (cosine >= threshold) via LSH-bucketed
    self-join + exact verification; returns (id_a, id_b, cosine).

    `dim` (embedding width) is required — see lsh_bucket_topk."""
    from pyspark.sql import functions as F

    if dim is None:
        raise ValueError("dim is required (embedding width; avoids an "
                         "extra inference job per call)")
    planes = _hyperplanes(dim, n_planes, seed)
    tagged = emb_df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"),
        _norm_col(F.col(vec_col)).alias("n"),
        signature_col(F.col(vec_col), planes).alias("bucket"),
    )
    a = tagged.select("bucket", F.col("vec_id").alias("id_a"),
                      F.col("v").alias("va"), F.col("n").alias("na"))
    b = tagged.select("bucket", F.col("vec_id").alias("id_b"),
                      F.col("v").alias("vb"), F.col("n").alias("nb"))
    pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    pairs = pairs.withColumn(
        "cosine", _dot_col(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    )
    return (
        pairs.where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .distinct()
    )
