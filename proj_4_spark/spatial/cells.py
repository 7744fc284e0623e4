"""Deterministic hierarchical lon/lat cell index (H3/S2-analogue).

An equirectangular power-of-two grid: at resolution r the world splits
into 2^r x 2^r cells (lon in [-180,180), lat in [-90,90)).  Cell ids pack
(res, iy, ix) into one int64:

    id = (res << 58) | (iy << 29) | ix        (r <= 28)

Chosen over Morton/H3 for exact reproducibility with pure integer
arithmetic: the SAME expression runs JVM-side (whole-stage codegen, no
UDF), in NumPy (driver oracles), and in ANSI SQL (DuckDB correctness
gate).  Parent/child is a shift; neighbor rings are +/-1 index steps with
longitude wraparound.

Role in the engine (north_rule): the partitioning key for spatial
shuffles — PIP candidate pruning, kNN cell-partitioning, and skew
salting all key on it.  Analogue of the reference's point->subgrid
resolution (findGrid, src/grids.cpp:3058-3074).
"""

from __future__ import annotations

import numpy as np

RES_SHIFT = 58
IY_SHIFT = 29
MAX_RES = 28


def cell_np(lon, lat, res: int):
    """NumPy twin of the JVM expression.  lon/lat degrees -> int64 cell."""
    n = np.int64(1) << res
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    ix = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    iy = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
    ix = np.clip(ix, 0, n - 1)
    iy = np.clip(iy, 0, n - 1)
    out = (np.int64(res) << RES_SHIFT) | (iy << IY_SHIFT) | ix
    bad = ~(np.isfinite(lon) & np.isfinite(lat) & (np.abs(lon) <= 360) & (np.abs(lat) <= 90))
    return np.where(bad, np.int64(-1), out)


def cell_sql(lon_expr: str, lat_expr: str, res: int) -> str:
    """The same computation as ANSI SQL (used for DuckDB oracles)."""
    n = 1 << res
    ix = f"least(greatest(cast(floor(({lon_expr} + 180.0) / 360.0 * {n}) as bigint), 0), {n - 1})"
    iy = f"least(greatest(cast(floor(({lat_expr} + 90.0) / 180.0 * {n}) as bigint), 0), {n - 1})"
    return f"(cast({res} as bigint) * {1 << RES_SHIFT} + {iy} * {1 << IY_SHIFT} + {ix})"


def cell_col(lon_col, lat_col, res: int):
    """JVM-side Column expression (stays inside whole-stage codegen)."""
    from pyspark.sql import functions as F

    n = 1 << res
    ix = F.least(
        F.greatest(F.floor((lon_col + 180.0) / 360.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    iy = F.least(
        F.greatest(F.floor((lat_col + 90.0) / 180.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    return (F.lit(res).cast("long") * (1 << RES_SHIFT)) + (iy * (1 << IY_SHIFT)) + ix


def decode_np(cell):
    """int64 cell -> (res, iy, ix)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> RES_SHIFT
    iy = (cell >> IY_SHIFT) & ((np.int64(1) << IY_SHIFT) - 1)
    ix = cell & ((np.int64(1) << IY_SHIFT) - 1)
    return res, iy, ix


def parent_np(cell, parent_res: int):
    """Coarser-resolution ancestor (pure shifts)."""
    res, iy, ix = decode_np(cell)
    d = res - parent_res
    return (
        (np.int64(parent_res) << RES_SHIFT)
        | ((iy >> d) << IY_SHIFT)
        | (ix >> d)
    )


def neighbors_np(cell, ring: int = 1):
    """All cells within `ring` index steps (square ring), with longitude
    wraparound; latitude rows clamp at the poles.  Returns 2-D array
    [len(cell), (2*ring+1)**2] of int64 (may contain duplicates at poles).
    """
    cell = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    res, iy, ix = decode_np(cell)
    n = np.int64(1) << res
    offs = np.arange(-ring, ring + 1)
    dy, dx = np.meshgrid(offs, offs, indexing="ij")
    dy = dy.ravel()
    dx = dx.ravel()
    iy2 = np.clip(iy[:, None] + dy[None, :], 0, (n - 1)[:, None])
    ix2 = (ix[:, None] + dx[None, :]) % n[:, None]
    return (res[:, None] << RES_SHIFT) | (iy2 << IY_SHIFT) | ix2


def neighbors_col(cell_col_, res: int, ring: int = 1):
    """JVM-side neighbor ring as an array column (for explode-join)."""
    from pyspark.sql import functions as F

    n = 1 << res
    # Exact integer decode: shiftright/bitwise, never `/` (double division
    # rounds above 2^53 — cell ids carry res<<58, so float division can be
    # off by up to ~128 in ix/iy near row boundaries).
    iy = F.shiftright(cell_col_, IY_SHIFT).bitwiseAND(
        F.lit((1 << (RES_SHIFT - IY_SHIFT)) - 1)
    )
    ix = cell_col_.bitwiseAND(F.lit((1 << IY_SHIFT) - 1))
    cells = []
    for dy in range(-ring, ring + 1):
        for dx in range(-ring, ring + 1):
            iy2 = F.least(F.greatest(iy + dy, F.lit(0)), F.lit(n - 1))
            ix2 = F.pmod(ix + dx, F.lit(n))
            cells.append(
                (F.lit(res).cast("long") * (1 << RES_SHIFT))
                + (iy2 * (1 << IY_SHIFT)) + ix2
            )
    return F.array_distinct(F.array(*cells))


def cell_size_deg(res: int) -> tuple[float, float]:
    n = 1 << res
    return 360.0 / n, 180.0 / n
