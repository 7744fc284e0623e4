"""Dump reference grid-shift arrays as parquet cell tables for the
driver's DuckDB oracles.

The correctness gate value-checks grid-backed queries by RE-INTERPOLATING
the same grid arrays in SQL (bilinear, term-for-term the kernel's
stencil, kernels/gridshift.py vgrid_value / _interp_grid) — so the
oracle needs the raw cells.  Each table is (iy, ix, ...values) with
row 0 = south / col 0 = west, values upcast float32 -> float64 exactly.

Deterministic: re-running reproduces the committed parquet bit-for-bit
(pyarrow deterministic writer settings, no timestamps).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def _write(path: str, table: pa.Table) -> None:
    pq.write_table(table, path, compression="zstd",
                   write_statistics=False)
    print(f"wrote {path}: {table.num_rows} rows")


def dump_vgrid(name: str, out: str) -> None:
    from proj_4_spark.sources.grids import load_vgrids

    g = load_vgrids(name)[0]
    h, w = g.values.shape
    iy, ix = np.mgrid[0:h, 0:w]
    _write(out, pa.table({
        "iy": pa.array(iy.ravel(), pa.int32()),
        "ix": pa.array(ix.ravel(), pa.int32()),
        "v": pa.array(g.values.ravel().astype(np.float64), pa.float64()),
    }))


def dump_hgrid(name: str, out: str) -> None:
    from proj_4_spark.sources.grids import load_hgrids

    g = load_hgrids(name)[0]
    h, w = g.lon_shift.shape
    iy, ix = np.mgrid[0:h, 0:w]
    _write(out, pa.table({
        "iy": pa.array(iy.ravel(), pa.int32()),
        "ix": pa.array(ix.ravel(), pa.int32()),
        "dlon": pa.array(g.lon_shift.ravel().astype(np.float64),
                         pa.float64()),
        "dlat": pa.array(g.lat_shift.ravel().astype(np.float64),
                         pa.float64()),
    }))


def main() -> int:
    dump_vgrid("egm96_15.gtx",
               os.path.join(FIXTURES, "egm96_grid_cells.parquet"))
    dump_hgrid("conus", os.path.join(FIXTURES, "conus_grid_cells.parquet"))
    dump_hgrid("alaska", os.path.join(FIXTURES, "alaska_grid_cells.parquet"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
