"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over mapInPandas.  The Spark-side plumbing — schemas,
batch shapes, partitioning, UDF signatures — is real and tested; the
codec step itself is STUBBED behind `DecodeUnavailable` (image/audio
libraries are not in this container) with a deterministic fake used by
tests (`fake=True`).

Scale notes: media bytes dominate row width -> keep them in their own
column family / table, process with mapInPandas so bytes stream through
Arrow without JVM row materialization, and size partitions by
`spark.sql.files.maxPartitionBytes` (bytes, not rows).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

MEDIA_META_DDL = (
    "struct<media_type:string, width:int, height:int, "
    "duration_ms:int, codec:string>"
)


class DecodeUnavailable(NotImplementedError):
    """Raised by the real decode path: codec libs absent in this env."""


def _real_decode(payload: bytes, media_type: str):
    raise DecodeUnavailable(
        "image/audio codecs not available in this environment; "
        "wire PIL/ffmpeg here in production"
    )


def _fake_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in: pseudo-pixels from the payload digest.
    Keeps batch shapes, dtypes and downstream feature math real."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    if media_type == "image":
        return rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    if media_type == "audio":
        return (rng.standard_normal(1600) * 0.1).astype(np.float32)
    if media_type == "video":
        return rng.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    raise ValueError(f"unknown media_type {media_type!r}")


def extract_features(media_df, payload_col: str = "payload",
                     meta_col: str = "meta", fake: bool = False):
    """binary payload -> fixed-width feature vector (array<float>, 8 dims:
    mean/std/min/max per leading channels, deterministic).

    mapInPandas so each Arrow batch decodes in one Python hop.
    """
    decode = _fake_decode if fake else _real_decode

    def gen(batches):
        for pdf in batches:
            feats = []
            for payload, meta in zip(pdf[payload_col], pdf[meta_col]):
                arr = decode(payload, meta["media_type"]).astype(np.float64)
                flat = arr.ravel()
                q = np.quantile(flat, [0.25, 0.75])
                feats.append([
                    float(flat.mean()), float(flat.std()),
                    float(flat.min()), float(flat.max()),
                    float(q[0]), float(q[1]),
                    float(len(flat)), float(arr.ndim),
                ])
            out = pdf[[c for c in pdf.columns if c not in (payload_col,)]].copy()
            out["features"] = feats
            yield out

    base_cols = [c for c in media_df.columns if c != payload_col]
    schema = ", ".join(
        f"{c} {dict(media_df.dtypes)[c]}" for c in base_cols
    ) + ", features array<double>"
    return media_df.mapInPandas(gen, schema=schema)


def frame_sample(media_df, payload_col: str = "payload", meta_col: str = "meta",
                 every_n: int = 2, fake: bool = False):
    """Video frame sampling: one output row per sampled frame
    (doc exploded by frame index) — the row-expansion plumbing for
    video pipelines."""
    decode = _fake_decode if fake else _real_decode

    def gen(batches):
        for pdf in batches:
            rows = {c: [] for c in pdf.columns if c != payload_col}
            rows["frame_idx"] = []
            rows["frame_mean"] = []
            for i in range(len(pdf)):
                meta = pdf[meta_col].iloc[i]
                if meta["media_type"] != "video":
                    continue
                arr = decode(pdf[payload_col].iloc[i], "video")
                for fi in range(0, arr.shape[0], every_n):
                    for c in rows:
                        if c not in ("frame_idx", "frame_mean"):
                            rows[c].append(pdf[c].iloc[i])
                    rows["frame_idx"].append(fi)
                    rows["frame_mean"].append(float(arr[fi].mean()))
            yield pd.DataFrame(rows)

    base_cols = [c for c in media_df.columns if c != payload_col]
    schema = ", ".join(
        f"{c} {dict(media_df.dtypes)[c]}" for c in base_cols
    ) + ", frame_idx int, frame_mean double"
    return media_df.mapInPandas(gen, schema=schema)


def synth_media_table(spark, n: int = 200, seed: int = 42):
    """Deterministic opaque-binary media table for tests/bench."""
    from pyspark.sql import functions as F

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            payloads = []
            metas = []
            kinds = ["image", "audio", "video"]
            for i in ids:
                rng = np.random.Generator(np.random.PCG64(seed ^ int(i)))
                kind = kinds[int(i) % 3]
                payloads.append(rng.bytes(64 + int(i) % 128))
                metas.append({
                    "media_type": kind,
                    "width": 16 if kind != "audio" else 0,
                    "height": 16 if kind != "audio" else 0,
                    "duration_ms": 100 if kind != "image" else 0,
                    "codec": "fake",
                })
            yield pd.DataFrame({
                "media_id": [f"m-{int(i):08d}" for i in ids],
                "payload": payloads,
                "meta": metas,
            })

    return spark.range(0, n).mapInPandas(
        gen, schema=f"media_id string, payload binary, meta {MEDIA_META_DDL}"
    )
