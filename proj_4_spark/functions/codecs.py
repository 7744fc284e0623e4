"""Pure-NumPy codecs for self-describing uncompressed media formats.

The task brief stubs decode for formats that need external libraries
(JPEG/PNG/MP4 — not in this container); these three REAL public formats
need only header parsing + reshapes, so the engine ships working
encode/decode for them:

- BMP: 24-bit uncompressed BI_RGB (BITMAPFILEHEADER + BITMAPINFOHEADER,
  bottom-up rows, 4-byte row padding) — the Windows DIB spec.
- WAV: RIFF/WAVE PCM 16-bit (fmt + data chunks).
- Y4M: YUV4MPEG2 (plain-text header + FRAME-delimited raw planes,
  C444 colourspace) — the mjpegtools interchange format.

Everything is numpy slicing over the byte buffer: zero-copy-ish, fully
vectorized per payload, deterministic.
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


def sniff_and_decode(payload: bytes):
    """Magic-sniffing decode: returns (array, kind) or raises ValueError
    for codec formats that need external libraries."""
    if payload[:2] == b"BM":
        return decode_bmp(payload), "image"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        s, _rate = decode_wav(payload)
        return s.astype(np.float32) / 32768.0, "audio"
    if payload.startswith(b"YUV4MPEG2"):
        return decode_y4m(payload), "video"
    raise ValueError("payload needs an external codec (jpeg/png/mp4)")
