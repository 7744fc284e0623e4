"""Raster-tile <-> vector assignment (web-mercator power-of-two tiles).

Tile math per FIXTURES.md §5 over the engine's webmerc output
(spherical Mercator kernel, src/projections/merc.cpp:92-100):

    tile_x = floor((x + HALF_CIRC) / (2*HALF_CIRC) * 2^zoom)
    tile_y = same on flipped y

Assignment is exact integer math — it IS the reference's grid-cell
resolution pattern (floor-divide against a broadcast grid description,
src/grids.cpp:2875-2944 / SURVEY.md §2.4) — and runs fully JVM-side.
"""

from __future__ import annotations

import numpy as np

# pi * 6378137 (WGS84 webmerc half-circumference)
HALF_CIRC = 20037508.342789244


def tile_np(x, y, zoom: int):
    """NumPy twin: webmerc meters -> (tile_x, tile_y)."""
    n = 1 << zoom
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    tx = np.floor((x + HALF_CIRC) / (2 * HALF_CIRC) * n).astype(np.int64)
    ty = np.floor((HALF_CIRC - y) / (2 * HALF_CIRC) * n).astype(np.int64)
    return np.clip(tx, 0, n - 1), np.clip(ty, 0, n - 1)


def tile_sql(x_expr: str, y_expr: str, zoom: int) -> tuple[str, str]:
    n = 1 << zoom
    tx = (
        f"least(greatest(cast(floor(({x_expr} + {HALF_CIRC!r}) / {2 * HALF_CIRC!r} * {n}) as bigint), 0), {n - 1})"
    )
    ty = (
        f"least(greatest(cast(floor(({HALF_CIRC!r} - ({y_expr})) / {2 * HALF_CIRC!r} * {n}) as bigint), 0), {n - 1})"
    )
    return tx, ty


def tile_cols(x_col, y_col, zoom: int):
    """JVM-side Column pair (tile_x, tile_y)."""
    from pyspark.sql import functions as F

    n = 1 << zoom
    tx = F.least(
        F.greatest(F.floor((x_col + HALF_CIRC) / (2 * HALF_CIRC) * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    ty = F.least(
        F.greatest(F.floor((F.lit(HALF_CIRC) - y_col) / (2 * HALF_CIRC) * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    return tx, ty


def assign_tiles(points_df, x: str = "x", y: str = "y", zoom: int = 8):
    """Add tile_x/tile_y/payload columns to a webmerc point DataFrame."""
    from pyspark.sql import functions as F

    tx, ty = tile_cols(F.col(x), F.col(y), zoom)
    return (
        points_df.withColumn("zoom", F.lit(zoom))
        .withColumn("tile_x", tx)
        .withColumn("tile_y", ty)
        .withColumn(
            "payload",
            F.concat(F.lit(f"tile-{zoom}/"), F.col("tile_x"), F.lit("/"), F.col("tile_y")),
        )
    )
