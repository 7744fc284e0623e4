"""Triangulation-based transformation (+proj=tinshift).

Reference: src/transformations/tinshift.cpp +
src/transformations/tinshift_impl.hpp.  A JSON file carries a TIN whose
vertices hold source/target coordinate pairs (horizontal) and/or z
offsets (vertical).  A point is located in a triangle via barycentric
coordinates (FindTriangle, tinshift_impl.hpp:414-459: lambda within
[-1e-10, 1+1e-10], lambda3 >= 0, FIRST match wins) and the output is the
lambda-weighted blend of the target columns; points outside every
triangle error (NaN).

Vectorization: one pass per triangle over the still-unresolved lanes —
exact for valid (non-overlapping) TINs and O(T) numpy sweeps.  At 100 TB
scale with a large TIN, the Spark path is the same math after a
cell-id bucket join between points and triangle bounding boxes (see
proj_4_spark/spatial/cells.py); the reference uses a quadtree for the
same pruning (BuildQuadTree, tinshift_impl.hpp:366-404).
"""

from __future__ import annotations

import json
import os

import numpy as np

from proj_4_spark.kernels.base import PJ, ProjError

_EPS = 1e-10


class TinModel:
    """Parsed triangulation_file (TINShiftFile::parse,
    tinshift_impl.hpp:94-344)."""

    def __init__(self, text: str):
        try:
            j = json.loads(text)
        except ValueError as e:
            raise ProjError("invalid_arg", f"tinshift: bad JSON: {e}") from None
        if not isinstance(j, dict):
            raise ProjError("invalid_arg", "tinshift: not an object")
        for req in ("file_type", "format_version"):
            if req not in j:
                raise ProjError("invalid_arg", f"tinshift: missing {req}")
        comps = j.get("transformed_components")
        if not isinstance(comps, list):
            raise ProjError("invalid_arg", "tinshift: missing transformed_components")
        self.horizontal = "horizontal" in comps
        self.vertical = "vertical" in comps
        vcols = j["vertices_columns"]
        col = {name: i for i, name in enumerate(vcols)}
        if "source_x" not in col or "source_y" not in col:
            raise ProjError("invalid_arg", "tinshift: source_x/source_y required")
        if self.horizontal and ("target_x" not in col or "target_y" not in col):
            raise ProjError("invalid_arg", "tinshift: target_x/target_y required")
        verts = np.asarray(j["vertices"], dtype=np.float64)
        if verts.ndim != 2 or verts.shape[1] != len(vcols):
            raise ProjError("invalid_arg", "tinshift: bad vertices shape")
        cols = [verts[:, col["source_x"]], verts[:, col["source_y"]]]
        if self.horizontal:
            cols += [verts[:, col["target_x"]], verts[:, col["target_y"]]]
        if self.vertical:
            if "offset_z" in col:
                cols.append(verts[:, col["offset_z"]])
            elif "source_z" in col and "target_z" in col:
                cols.append(verts[:, col["target_z"]] - verts[:, col["source_z"]])
            else:
                raise ProjError("invalid_arg", "tinshift: no vertical columns")
        self.v = np.column_stack(cols)  # per-vertex packed columns
        tcols = j["triangles_columns"]
        tcol = {name: i for i, name in enumerate(tcols)}
        for req in ("idx_vertex1", "idx_vertex2", "idx_vertex3"):
            if req not in tcol:
                raise ProjError("invalid_arg", f"tinshift: missing {req}")
        tris = np.asarray(j["triangles"], dtype=np.int64)
        self.tri = tris[:, [tcol["idx_vertex1"], tcol["idx_vertex2"],
                            tcol["idx_vertex3"]]]
        if (self.tri < 0).any() or (self.tri >= len(verts)).any():
            raise ProjError("invalid_arg", "tinshift: vertex index out of range")

    def _interp(self, x, y, src_ix, src_iy, out_cols):
        """Locate each (x, y) in a triangle using columns (src_ix, src_iy)
        and blend out_cols with the barycentric weights; NaN outside."""
        n = x.shape[0]
        found = np.zeros(n, dtype=bool)
        outs = [np.full(n, np.nan) for _ in out_cols]
        for t in range(self.tri.shape[0]):
            todo = ~found
            if not todo.any():
                break
            i1, i2, i3 = self.tri[t]
            x1, y1 = self.v[i1, src_ix], self.v[i1, src_iy]
            x2, y2 = self.v[i2, src_ix], self.v[i2, src_iy]
            x3, y3 = self.v[i3, src_ix], self.v[i3, src_iy]
            det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
            l1 = ((y2 - y3) * (x - x3) + (x3 - x2) * (y - y3)) / det
            l2 = ((y3 - y1) * (x - x3) + (x1 - x3) * (y - y3)) / det
            l3 = 1.0 - l1 - l2
            inside = (todo & (l1 >= -_EPS) & (l1 <= 1 + _EPS)
                      & (l2 >= -_EPS) & (l2 <= 1 + _EPS) & (l3 >= 0))
            if not inside.any():
                continue
            for k, oc in enumerate(out_cols):
                blend = (self.v[i1, oc] * l1 + self.v[i2, oc] * l2
                         + self.v[i3, oc] * l3)
                outs[k] = np.where(inside, blend, outs[k])
            found |= inside
        return outs, found


def setup_tinshift(P: PJ) -> PJ:
    """tinshift.cpp:86-133."""
    from proj_4_spark.sources.grids import resolve_grid_path

    fname = P.params.get("file")
    if not fname:
        raise ProjError("no_args", "tinshift: +file= required")
    try:
        path = resolve_grid_path(str(fname))
    except FileNotFoundError:
        raise ProjError("invalid_arg", f"tinshift: cannot open {fname}") from None
    if os.path.getsize(path) > 10 * 1024 * 1024:
        raise ProjError("invalid_arg", "tinshift: file too large")
    model = TinModel(open(path, encoding="utf-8", errors="replace").read())
    zcol = (4 if model.horizontal else 2) if model.vertical else None

    def fwd4d(x, y, z, t, _P):
        out_cols = ([2, 3] if model.horizontal else []) + ([zcol] if model.vertical else [])
        outs, found = model._interp(x, y, 0, 1, out_cols)
        i = 0
        if model.horizontal:
            ox, oy = outs[0], outs[1]
            i = 2
        else:
            ox, oy = np.where(found, x, np.nan), np.where(found, y, np.nan)
        oz = z + outs[i] if model.vertical else np.where(found, z, np.nan)
        if model.vertical and not model.horizontal:
            ox, oy = np.where(found, x, np.nan), np.where(found, y, np.nan)
        return ox, oy, oz, t

    def inv4d(x, y, z, t, _P):
        # locate in TARGET coordinates for horizontal models
        # (tinshift_impl.hpp:504-553)
        sx, sy = (2, 3) if model.horizontal else (0, 1)
        out_cols = ([0, 1] if model.horizontal else []) + ([zcol] if model.vertical else [])
        outs, found = model._interp(x, y, sx, sy, out_cols)
        i = 0
        if model.horizontal:
            ox, oy = outs[0], outs[1]
            i = 2
        else:
            ox, oy = np.where(found, x, np.nan), np.where(found, y, np.nan)
        oz = z - outs[i] if model.vertical else np.where(found, z, np.nan)
        return ox, oy, oz, t

    P.fwd4d = fwd4d
    P.inv4d = inv4d
    P.left = "whatever"
    P.right = "whatever"
    P.skip_fwd_prepare = True
    P.skip_fwd_finalize = True
    P.skip_inv_prepare = True
    P.skip_inv_finalize = True
    return P
