"""media_ref geo-tag codec + span-sequence invariant.

The media_ref encoding is defined in FIXTURES.md §1:
  media://{doc_id}/{k}?lon={lon:.9f}&lat={lat:.9f}&crs={crs}

Extraction is pure JVM-side (regexp_extract inside whole-stage codegen) —
no Python in the hot path; the geodetic transform downstream is the only
pandas-UDF stage (SURVEY.md §7.0 "no per-row Python").
"""

from __future__ import annotations

import itertools

_cg_seq = itertools.count()

_LON_RE = r"[?&]lon=(-?[0-9.]+)"
_LAT_RE = r"[?&]lat=(-?[0-9.]+)"
_CRS_RE = r"[?&]crs=([A-Za-z0-9:]+)"


def explode_media_points(docs_df, keep_doc_cols: bool = True):
    """documents(doc_id, spans) -> one row per media span with parsed
    lon/lat (degrees, EPSG:4326 per fixture contract).

    Plan shape: generator-expand (posexplode) -> filter kind='media'
    -> regexp projections.  All JVM-side; Catalyst pushes the kind filter
    into the generate and prunes text columns out of the scan.
    """
    from pyspark.sql import functions as F

    ex = docs_df.select(
        "doc_id",
        F.posexplode("spans").alias("span_idx", "span"),
    ).where(F.col("span.kind") == "media")
    out = ex.select(
        "doc_id",
        F.col("span.offset").alias("span_offset"),
        F.regexp_extract("span.media_ref", _LON_RE, 1).cast("double").alias("lon"),
        F.regexp_extract("span.media_ref", _LAT_RE, 1).cast("double").alias("lat"),
        F.regexp_extract("span.media_ref", _CRS_RE, 1).alias("crs"),
    )
    # r8: close the whole-stage-codegen region here.  Fused with a
    # downstream projection twin (the doc-geo pipeline's webmerc leg)
    # the combined method reached 10,218 bytecodes — past HotSpot's
    # 8000-byte JIT ceiling, so the hottest headline region ran
    # interpreted.  The observe costs one row-count accumulator and
    # splits explode+regex from the projection math (both sub-8k).
    return out.observe(f"_media_cg_{next(_cg_seq)}",
                       F.count(F.lit(1)).alias("rows"))


def span_fingerprint(docs_df, col: str = "span_fp"):
    """Per-row fingerprint of the span sequence (kind, text, media_ref,
    order) — the invariant the engine must preserve end-to-end
    (BASELINE.json input_hint "span-sequence equality").

    xxhash64 over the canonical concatenation; computed JVM-side.
    """
    from pyspark.sql import functions as F

    canon = F.transform(
        "spans",
        lambda s: F.concat_ws(
            "\x1f", s["kind"], s["text"], s["media_ref"], s["offset"].cast("string")
        ),
    )
    return docs_df.withColumn(col, F.xxhash64(F.concat_ws("\x1e", canon)))


def assert_span_equality(spark, before_df, after_df) -> int:
    """Count rows whose span sequence changed between two document
    DataFrames (must be 0).  Join on doc_id, compare fingerprints.
    At scale both sides bucket/partition by doc_id so this is a
    co-partitioned join."""
    from pyspark.sql import functions as F

    b = span_fingerprint(before_df, "fp_before").select("doc_id", "fp_before")
    a = span_fingerprint(after_df, "fp_after").select("doc_id", "fp_after")
    return (
        b.join(a, "doc_id", "full_outer")
        .where(
            F.col("fp_before").isNull()
            | F.col("fp_after").isNull()
            | (F.col("fp_before") != F.col("fp_after"))
        )
        .count()
    )
