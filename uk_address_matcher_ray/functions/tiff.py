"""Baseline TIFF codec in pure numpy/struct (public Adobe TIFF 6.0 spec).

Scope (the uncompressed baseline every TIFF writer can emit): both byte
orders (II/MM), 8-bit samples, Compression=1 (none), Photometric 0/1
(grayscale, 0 = inverted), 2 (RGB, with optional 4th extra sample ->
RGBA), 3 (palette, 16-bit ColorMap mapped to 8-bit via >> 8), any
strip layout.  LZW/PackBits/JPEG-in-TIFF raise NotImplementedError —
they are compression schemes layered on the same container, documented
integration points like MP3.

Decode is lossless, so the driver oracle is the same pixel-formula SQL
as BMP/PPM/PNG (`media_decode_sql`).  The encoder emits single-strip
little-endian RGB/gray/RGBA for deterministic test synthesis.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def _read_ifd_values(payload: bytes, e: str, typ: int, count: int, raw: bytes):
    size = _TYPE_SIZE.get(typ)
    if size is None:
        return None
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(e + "I", raw)
        buf = payload[off : off + total]
    if typ == 3:
        return list(struct.unpack(e + "H" * count, buf))
    if typ == 4:
        return list(struct.unpack(e + "I" * count, buf))
    if typ == 1:
        return list(buf)
    return None


def decode_tiff(payload: bytes) -> np.ndarray:
    if payload[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("not a TIFF (bad header)")
    e = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(e + "I", payload, 4)
    (n_entries,) = struct.unpack_from(e + "H", payload, ifd_off)
    tags = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(e + "HHI", payload, base)
        vals = _read_ifd_values(
            payload, e, typ, count, payload[base + 8 : base + 12]
        )
        if vals is not None:
            tags[tag] = vals
    w = tags[256][0]
    h = tags[257][0]
    bits = tags.get(258, [8])
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    offsets = tags[273]
    spp = tags.get(277, [len(bits)])[0]
    counts = tags.get(279)
    if comp != 1:
        raise NotImplementedError(
            f"TIFF compression {comp} not supported (uncompressed baseline "
            "only; LZW/PackBits/JPEG-in-TIFF are integration points)"
        )
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} not supported")
    if counts is None:
        counts = [h * w * spp // len(offsets)] * len(offsets)
    data = b"".join(
        payload[o : o + c] for o, c in zip(offsets, counts)
    )
    need = h * w * spp
    arr = np.frombuffer(data, dtype=np.uint8, count=need)
    if photo in (0, 1):
        if spp != 1:
            raise NotImplementedError("grayscale TIFF with extra samples")
        img = arr.reshape(h, w)
        return (255 - img if photo == 0 else img).copy()
    if photo == 2:
        if spp == 3:
            return arr.reshape(h, w, 3).copy()
        if spp == 4:
            return arr.reshape(h, w, 4).copy()
        raise NotImplementedError(f"RGB TIFF with {spp} samples")
    if photo == 3:
        cmap = tags.get(320)
        if spp != 1 or cmap is None:
            raise NotImplementedError("palette TIFF without ColorMap")
        ncol = len(cmap) // 3
        pal = (
            np.array(cmap, dtype=np.uint16).reshape(3, ncol).T >> 8
        ).astype(np.uint8)
        return pal[arr.reshape(h, w)].copy()
    raise NotImplementedError(f"TIFF photometric {photo} not supported")


def encode_tiff(img: np.ndarray) -> bytes:
    """HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8 -> single-strip
    little-endian uncompressed TIFF."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        spp, photo, extra = 1, 1, None
    elif img.ndim == 3 and img.shape[2] == 3:
        spp, photo, extra = 3, 2, None
    elif img.ndim == 3 and img.shape[2] == 4:
        spp, photo, extra = 4, 2, 2  # associated alpha? unassociated (2)
    else:
        raise ValueError("expected HxW, HxWx3 or HxWx4 uint8")
    h, w = img.shape[:2]
    data = img.tobytes()
    entries = [
        (256, 4, 1, w),  # ImageWidth
        (257, 4, 1, h),  # ImageLength
        (259, 3, 1, 1),  # Compression: none
        (262, 3, 1, photo),
        (277, 3, 1, spp),
        (278, 4, 1, h),  # RowsPerStrip: one strip
        (279, 4, 1, len(data)),  # StripByteCounts
    ]
    if extra is not None:
        entries.append((338, 3, 1, extra))  # ExtraSamples
    # BitsPerSample: spp shorts — inline when spp <= 2, else out-of-line
    bits_off_placeholder = spp > 2
    n = len(entries) + 2  # + BitsPerSample + StripOffsets
    ifd_off = 8
    ifd_size = 2 + 12 * n + 4
    after_ifd = ifd_off + ifd_size
    bits_off = after_ifd
    extra_bytes = b""
    if bits_off_placeholder:
        extra_bytes = struct.pack("<" + "H" * spp, *([8] * spp))
        data_off = after_ifd + len(extra_bytes)
    else:
        data_off = after_ifd
    if bits_off_placeholder:
        entries.append((258, 3, spp, bits_off))
    else:
        packed = 8 if spp == 1 else (8 | (8 << 16))
        entries.append((258, 3, spp, packed))
    entries.append((273, 4, 1, data_off))  # StripOffsets
    entries.sort(key=lambda t: t[0])
    out = bytearray()
    out += b"II*\x00" + struct.pack("<I", ifd_off)
    out += struct.pack("<H", n)
    for tag, typ, count, val in entries:
        out += struct.pack("<HHI", tag, typ, count)
        if typ == 3 and count == 1:
            out += struct.pack("<HH", val, 0)
        elif typ == 3 and count == 2:
            out += struct.pack("<I", val)
        else:
            out += struct.pack("<I", val)
    out += struct.pack("<I", 0)  # next IFD
    out += extra_bytes
    out += data
    return bytes(out)
