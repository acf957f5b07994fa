"""Pure-numpy PNG codec (no imaging library — inflate via stdlib zlib).

Decoder: 8-bit greyscale (0), RGB (2), palette (3), grey+alpha (4) and
RGBA (6), filter types 0-4, non-interlaced. Alpha planes are dropped on
output (same convention as 32-bit BMP decode: the feature pipeline consumes
color planes). Interlaced (Adam7) and 16-bit images raise — documented
boundary. Encoder: filter-0 writer used to synthesize deterministic test
payloads; PNG is lossless so decode(encode(img)) == img exactly.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray:
    if payload[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    plte: Optional[np.ndarray] = None
    idat = bytearray()
    n = len(payload)
    while pos + 8 <= n:
        length = struct.unpack_from(">I", payload, pos)[0]
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + CRC
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if comp != 0 or filt != 0:
                raise ValueError("invalid PNG compression/filter method")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlaced PNG not supported")
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} not supported")
            ihdr = (w, h, depth, color)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"PNG color type {color} invalid")
    raw = zlib.decompress(bytes(idat))
    bpp = channels  # bytes per pixel at depth 8
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG pixel data truncated")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(
            np.int64
        )
        pos += stride
        if ft == 0:  # None
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft == 1:  # Sub: cumulative per byte-offset class mod bpp
            cur = line.copy()
            for c in range(bpp):
                cur[c::bpp] = np.cumsum(cur[c::bpp]) & 0xFF
        else:  # Average (3) / Paeth (4): left+up dependency, scalar in x
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ft == 3:
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                elif ft == 4:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (line[x] + pred) & 0xFF
                else:
                    raise ValueError(f"PNG filter type {ft} invalid")
        out[y] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(h, w, bpp)
    if color == 3:
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        return plte[img[..., 0]]
    if color == 0:
        return img[..., 0]
    if color == 2:
        return img
    if color == 4:  # grey + alpha -> grey
        return img[..., 0]
    return np.ascontiguousarray(img[..., :3])  # RGBA -> RGB


def encode_png(img: np.ndarray) -> bytes:
    """HxW (grey), HxWx3 (RGB) or HxWx4 (RGBA) uint8 -> PNG bytes
    (filter 0, one IDAT)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color, channels = 0, 1
        flat = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color, channels = 2, 3
        flat = img
    elif img.ndim == 3 and img.shape[2] == 4:
        color, channels = 6, 4
        flat = img
    else:
        raise ValueError("expected HxW, HxWx3 or HxWx4 uint8")
    h, w = img.shape[:2]
    stride = w * channels
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type None
        raw += flat[y].tobytes()

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )
