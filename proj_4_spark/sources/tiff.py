"""Minimal GeoTIFF grid reader (pure numpy + zlib).

Re-implements the subset of TIFF the reference's grid layer consumes
(src/grids.cpp GTiffGrid/GTiffDataset, lines 379-1100):

- classic TIFF and BigTIFF, little- or big-endian
- strips and tiles, PlanarConfig contig or separate
- Compression: none (1) and DEFLATE (8, zlib); predictor 2
  (horizontal differencing) and 3 (floating-point)
- SampleFormat int16/uint16/int32/uint32/float32/float64
- georeferencing from ModelPixelScale+ModelTiepoint or
  GeoTransformationMatrix; GTModelTypeGeoKey geographic/projected;
  RasterPixelIsArea half-pixel shift (grids.cpp:1038-1042)
- GDAL_METADATA "poor-man XML" items (grids.cpp:465-520), GDAL_NODATA,
  per-sample SCALE/OFFSET (applied at read; nodata kept raw like
  GTiffGrid::readValue, grids.cpp:569-583)

Rows are normalized to row 0 = south (valueAt yFromBottom flip,
grids.cpp:588-600: bottomUp when vRes < 0).

Scale note: fixtures here are small and read eagerly; the reference
streams per 64 KiB block with an LRU cache.  On a cluster the natural
analogue is a broadcast of the decoded arrays (grids are MBs, the
point table is the 100 TB side).
"""

from __future__ import annotations

import re
import struct
import zlib

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8, 16: 8, 17: 8, 18: 8}

TAG_WIDTH = 256
TAG_HEIGHT = 257
TAG_BITS = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_DESCRIPTION = 270
TAG_STRIP_OFFSETS = 273
TAG_SPP = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_COUNTS = 279
TAG_PLANAR = 284
TAG_PREDICTOR = 317
TAG_TILE_W = 322
TAG_TILE_H = 323
TAG_TILE_OFFSETS = 324
TAG_TILE_COUNTS = 325
TAG_SUBFILETYPE = 254
TAG_SAMPLEFORMAT = 339
TAG_PIXELSCALE = 33550
TAG_TIEPOINT = 33922
TAG_GEOTRANSMATRIX = 34264
TAG_GEOKEYS = 34735
TAG_GDAL_METADATA = 42112
TAG_GDAL_NODATA = 42113

DEG_TO_RAD = np.pi / 180.0
ARCSEC_TO_RAD = DEG_TO_RAD / 3600.0


def _read_ifds(data: bytes) -> tuple[str, list[dict]]:
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF file")
    magic = struct.unpack(bo + "H", data[2:4])[0]
    if magic == 42:
        big = False
        off = struct.unpack(bo + "I", data[4:8])[0]
    elif magic == 43:
        big = True
        offsize, _ = struct.unpack(bo + "HH", data[4:8])
        if offsize != 8:
            raise ValueError("unsupported BigTIFF offset size")
        off = struct.unpack(bo + "Q", data[8:16])[0]
    else:
        raise ValueError("bad TIFF magic")

    entry_sz = 20 if big else 12
    cnt_fmt = "Q" if big else "H"
    cnt_sz = 8 if big else 2
    ptr_fmt = "Q" if big else "I"
    ptr_sz = 8 if big else 4

    ifds = []
    while off:
        n = struct.unpack(bo + cnt_fmt, data[off:off + cnt_sz])[0]
        base = off + cnt_sz
        tags: dict[int, object] = {}
        for i in range(n):
            e = data[base + i * entry_sz: base + (i + 1) * entry_sz]
            tag, typ = struct.unpack(bo + "HH", e[:4])
            cnt = struct.unpack(bo + ptr_fmt, e[4:4 + ptr_sz])[0]
            elem = _TYPE_SIZES.get(typ)
            if elem is None:
                continue
            sz = elem * cnt
            inline = 8 if big else 4
            voff_field = e[4 + ptr_sz:4 + ptr_sz + inline]
            if sz <= inline:
                raw = voff_field[:sz]
            else:
                voff = struct.unpack(bo + ptr_fmt, voff_field[:ptr_sz])[0]
                raw = data[voff:voff + sz]
            if typ == 2:
                val: object = raw.split(b"\0")[0].decode("utf-8", "replace")
            elif typ in (1, 6, 7):
                val = np.frombuffer(raw, dtype=np.uint8)
            else:
                npdt = {3: "u2", 4: "u4", 8: "i2", 9: "i4", 11: "f4",
                        12: "f8", 16: "u8", 17: "i8"}.get(typ)
                if npdt is None and typ == 5:  # rational
                    v = np.frombuffer(raw, dtype=bo + "u4").astype(np.float64)
                    val = v[0::2] / np.maximum(v[1::2], 1)
                else:
                    val = np.frombuffer(raw, dtype=bo + npdt)
            tags[tag] = val
        off = struct.unpack(
            bo + ptr_fmt, data[base + n * entry_sz:
                               base + n * entry_sz + ptr_sz])[0]
        ifds.append(tags)
        if len(ifds) > 4096:
            raise ValueError("too many IFDs")
    return bo, ifds


def _undo_predictor(arr: np.ndarray, predictor: int, bo: str,
                    dtype, width: int, spp: int) -> np.ndarray:
    """Predictor 2 (horizontal differencing) and 3 (float bytes)."""
    if predictor == 2:
        rows = arr.reshape(-1, width * spp)
        return np.cumsum(rows.reshape(rows.shape[0], width, spp),
                         axis=1, dtype=arr.dtype).reshape(arr.shape)
    if predictor == 3:
        # floating-point predictor: per row, bytes are delta-coded then
        # stored plane-by-byte, big-endian order
        itemsize = np.dtype(dtype).itemsize
        rowbytes = width * spp * itemsize
        raw = arr.view(np.uint8).reshape(-1, rowbytes)
        raw = np.cumsum(raw, axis=1, dtype=np.uint8)
        n = width * spp
        out = np.empty_like(raw)
        for b in range(itemsize):
            out[:, (itemsize - 1 - b)::itemsize] = raw[:, b * n:(b + 1) * n]
        return out.reshape(-1).view(np.dtype("<" + np.dtype(dtype).str[1:]))
    return arr


class GTiffGrid:
    """One decoded IFD with grid semantics (rows south-up)."""

    def __init__(self, name, width, height, spp, data, metadata,
                 nodata, is_geographic, west, south, east, north,
                 resx, resy, description):
        self.name = name
        self.width = width
        self.height = height
        self.samples = spp
        self.data = data  # (spp, height, width) float32, row0 = south
        self.metadata = metadata  # {(sample, key): str}; sample -1 = global
        self.nodata = nodata
        self.is_geographic = is_geographic
        self.west, self.south = west, south
        self.east, self.north = east, north
        self.resx, self.resy = resx, resy
        self.description = description

    def item(self, key: str, sample: int = -1) -> str:
        return self.metadata.get((sample, key), "")


def _parse_gdal_metadata(text: str) -> dict:
    """Poor-man XML parse, grids.cpp:465-520."""
    out = {}
    for m in re.finditer(r"<Item\s+([^>]*)>(.*?)</Item>", text, flags=re.S):
        attrs = dict(re.findall(r'(\w+)="([^"]*)"', m.group(1)))
        name = attrs.get("name")
        if not name:
            continue
        sample = int(attrs["sample"]) if "sample" in attrs else -1
        out[(sample, name)] = m.group(2).strip()
    return out


def read_gtiff_grids(path: str) -> list[GTiffGrid]:
    with open(path, "rb") as f:
        data = f.read()
    bo, ifds = _read_ifds(data)
    grids = []
    for ifd_idx, t in enumerate(ifds):
        width = int(np.atleast_1d(t.get(TAG_WIDTH, [0]))[0])
        height = int(np.atleast_1d(t.get(TAG_HEIGHT, [0]))[0])
        if not width or not height:
            raise ValueError("invalid image size")
        spp = int(np.atleast_1d(t.get(TAG_SPP, [1]))[0])
        bits = int(np.atleast_1d(t.get(TAG_BITS, [32]))[0])
        sfmt = int(np.atleast_1d(t.get(TAG_SAMPLEFORMAT, [1]))[0])
        comp = int(np.atleast_1d(t.get(TAG_COMPRESSION, [1]))[0])
        planar = int(np.atleast_1d(t.get(TAG_PLANAR, [1]))[0])
        predictor = int(np.atleast_1d(t.get(TAG_PREDICTOR, [1]))[0])
        subfile = int(np.atleast_1d(t.get(TAG_SUBFILETYPE, [0]))[0])
        if subfile not in (0, 2):  # 2 = FILETYPE_PAGE
            continue
        dt = {(2, 16): "i2", (1, 16): "u2", (2, 32): "i4", (1, 32): "u4",
              (3, 32): "f4", (3, 64): "f8"}.get((sfmt, bits))
        if dt is None:
            raise ValueError(f"unsupported SampleFormat/BitsPerSample "
                             f"({sfmt},{bits})")
        if comp not in (1, 8):
            raise ValueError(f"unsupported compression {comp}")
        dtype = np.dtype(bo + dt)

        tiled = TAG_TILE_OFFSETS in t
        if tiled:
            bw = int(np.atleast_1d(t[TAG_TILE_W])[0])
            bh = int(np.atleast_1d(t[TAG_TILE_H])[0])
            offsets = np.atleast_1d(t[TAG_TILE_OFFSETS]).astype(np.int64)
            counts = np.atleast_1d(t[TAG_TILE_COUNTS]).astype(np.int64)
        else:
            bw = width
            bh = int(np.atleast_1d(t.get(TAG_ROWS_PER_STRIP, [height]))[0])
            bh = min(bh, height)
            offsets = np.atleast_1d(t[TAG_STRIP_OFFSETS]).astype(np.int64)
            counts = np.atleast_1d(t[TAG_STRIP_COUNTS]).astype(np.int64)
        bpr = (width + bw - 1) // bw
        bpc = (height + bh - 1) // bh

        chan = spp if planar == 1 else 1
        full = np.zeros((spp, height, width), dtype=np.float64)
        nblocks_geo = bpr * bpc
        for bi in range(len(offsets)):
            raw = data[offsets[bi]: offsets[bi] + counts[bi]]
            if comp == 8:
                raw = zlib.decompress(raw)
            arr = np.frombuffer(raw, dtype=dtype)
            geo_bi = bi % nblocks_geo
            plane = bi // nblocks_geo if planar == 2 else 0
            by, bx = divmod(geo_bi, bpr)
            rows = bh if tiled else min(bh, height - by * bh)
            arr = arr[: rows * bw * chan]
            if predictor != 1:
                arr = _undo_predictor(arr, predictor, bo, dtype, bw, chan)
            block = arr.reshape(rows, bw, chan).astype(np.float64)
            y0 = by * bh
            x0 = bx * bw
            ny = min(rows, height - y0)
            nx = min(bw, width - x0)
            if planar == 1:
                for s in range(spp):
                    full[s, y0:y0 + ny, x0:x0 + nx] = block[:ny, :nx, s]
            else:
                full[plane, y0:y0 + ny, x0:x0 + nx] = block[:ny, :nx, 0]

        meta = _parse_gdal_metadata(str(t.get(TAG_GDAL_METADATA, "")))
        nodata = None
        if TAG_GDAL_NODATA in t:
            try:
                nodata = float(str(t[TAG_GDAL_NODATA]).strip())
            except ValueError:
                nodata = None

        # per-sample scale/offset; nodata kept raw (grids.cpp:569-583)
        for s in range(spp):
            scale = float(meta.get((s, "SCALE"), 1.0))
            offset = float(meta.get((s, "OFFSET"), 0.0))
            if scale != 1.0 or offset != 0.0:
                band = full[s]
                scaled = band * scale + offset
                if nodata is not None:
                    scaled = np.where(band == nodata, band, scaled)
                full[s] = scaled

        # georeferencing (grids.cpp:986-1063)
        is_geo = True
        pixel_is_area = False
        gk = t.get(TAG_GEOKEYS)
        if gk is not None:
            gk = np.atleast_1d(gk)
            for i in range(4, len(gk) - 3, 4):
                if gk[i] == 1024 and gk[i + 3] == 1:
                    is_geo = False
                elif gk[i] == 1025 and gk[i + 3] == 1:
                    pixel_is_area = True
        if TAG_GEOTRANSMATRIX in t:
            m = np.atleast_1d(t[TAG_GEOTRANSMATRIX]).astype(np.float64)
            if m[1] != 0 or m[4] != 0:
                raise ValueError("rotational terms not supported")
            west = float(m[3])
            hres = float(m[0])
            north = float(m[7])
            vres = -float(m[5])
        else:
            scale3 = np.atleast_1d(t[TAG_PIXELSCALE]).astype(np.float64)
            tp = np.atleast_1d(t[TAG_TIEPOINT]).astype(np.float64)
            hres, vres = float(scale3[0]), float(scale3[1])
            west = float(tp[3]) - float(tp[0]) * hres
            north = float(tp[4]) + float(tp[1]) * vres
        if pixel_is_area:
            west += 0.5 * hres
            north -= 0.5 * vres
        mul = DEG_TO_RAD if is_geo else 1.0
        w = west * mul
        n = north * mul
        rx = hres * mul
        ry = abs(vres) * mul
        e = (west + hres * (width - 1)) * mul
        s_ = (north - vres * (height - 1)) * mul
        bottom_up = vres < 0
        if bottom_up:
            n, s_ = s_, n
        if not (w < e and s_ < n and rx > 1e-10 and ry > 1e-10):
            raise ValueError("inconsistent georeferencing")
        rows_south_up = full if bottom_up else full[:, ::-1, :]
        grids.append(GTiffGrid(
            name=f"{path}#{ifd_idx}", width=width, height=height, spp=spp,
            data=np.ascontiguousarray(rows_south_up.astype(np.float32)),
            metadata=meta, nodata=nodata, is_geographic=is_geo,
            west=w, south=s_, east=e, north=n, resx=rx, resy=ry,
            description=str(t.get(TAG_DESCRIPTION, ""))))
    return grids
