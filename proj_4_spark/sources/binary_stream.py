"""Binary coordinate streams — the `proj -b` wire format.

The reference's proj app (src/apps/proj.cpp:33-34, 65-67, 127-130,
315-316) reads/writes raw `PJ_UV` records with `-b`: two contiguous
native-endian float64s per point, no header, no delimiters.  Values are
in the same units the ASCII path produces AFTER dmstor parsing — i.e.
radians for geodetic coordinates, meters for projected ones (binary
input skips the DMS conversion entirely).

Surfaces:
- decode_uv / encode_uv: bytes <-> (u, v) float64 arrays
- proj_binary_stream:    bytes -> bytes through one Operation (the -b
                         CLI behavior, fwd or inv)
- read_uv_stream_df:     distributed Spark source — one row per point
                         from a directory of .bin files via binaryFile
                         + mapInPandas (each file parses in one hop)
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401 — pandas_udf resolves `pd.*` hints

_RECORD = 16  # sizeof(PJ_UV) = 2 * float64


def decode_uv(data: bytes):
    """Raw PJ_UV stream -> (u, v) float64 arrays.  A trailing partial
    record is ignored, matching fread(..., sizeof(PJ_UV), 1, ...)."""
    n = len(data) // _RECORD
    arr = np.frombuffer(data, dtype="<f8", count=2 * n).reshape(n, 2)
    return arr[:, 0].copy(), arr[:, 1].copy()


def encode_uv(u, v) -> bytes:
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    out = np.empty((len(u), 2), dtype="<f8")
    out[:, 0] = u
    out[:, 1] = v
    return out.tobytes()


def proj_binary_stream(data: bytes, projstring: str,
                       direction: str = "fwd") -> bytes:
    """The `proj -b` pipeline: binary in -> transform -> binary out.
    Uses pj_init semantics (no datum emulation), like the proj app."""
    from proj_4_spark.engine.plan import create_operation

    op = create_operation(projstring, emulation=False)
    u, v = decode_uv(data)
    z = np.zeros_like(u)
    x, y, _, _ = op.apply(u, v, z, z.copy(), direction)
    return encode_uv(x, y)


def read_uv_stream_df(spark, path: str, projstring: str | None = None,
                      direction: str = "fwd"):
    """Distributed binary-stream source: every *.bin file under `path`
    parses into (file, idx, u, v) rows; with `projstring` the transform
    applies in the same Arrow hop (x, y columns added).

    Scale shape: Spark's binaryFile source splits by FILE (records have
    no sync markers, so files are the parallelism unit — shard streams
    into many files upstream, as any 100 TB ingest already does)."""
    from pyspark.sql import functions as F

    schema = "file string, idx bigint, u double, v double"
    if projstring is not None:
        schema += ", x double, y double"

    def gen(batches):
        op = None
        if projstring is not None:
            from proj_4_spark.engine.plan import create_operation
            op = create_operation(projstring, emulation=False)
        for pdf in batches:
            for fname, content in zip(pdf["path"], pdf["content"]):
                u, v = decode_uv(bytes(content))
                out = {"file": np.repeat(fname, len(u)),
                       "idx": np.arange(len(u), dtype=np.int64),
                       "u": u, "v": v}
                if op is not None:
                    z = np.zeros_like(u)
                    x, y, _, _ = op.apply(u, v, z, z.copy(), direction)
                    out["x"], out["y"] = x, y
                yield pd.DataFrame(out)

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.bin").load(path)
             .select("path", "content"))
    return files.mapInPandas(gen, schema=schema)
