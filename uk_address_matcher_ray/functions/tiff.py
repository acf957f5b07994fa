"""Baseline TIFF codec in pure numpy/struct (public Adobe TIFF 6.0 spec).

Scope: both byte orders (II/MM), 8-bit samples, Compression=1 (none),
5 (TIFF LZW, spec §13: MSB-first variable-width codes with early-change
width bumps, per-strip streams, Predictor 1/2 horizontal differencing)
and 32773 (PackBits RLE, spec §9), Photometric 0/1 (grayscale, 0 =
inverted), 2 (RGB, with optional 4th extra sample -> RGBA), 3 (palette,
16-bit ColorMap mapped to 8-bit via >> 8), any strip layout.
JPEG-in-TIFF raises NotImplementedError — a documented integration
point like MP3.

Decode is lossless, so the driver oracle is the same pixel-formula SQL
as BMP/PPM/PNG (`media_decode_sql`).  The encoder emits single-strip
little-endian RGB/gray/RGBA for deterministic test synthesis
(uncompressed, real-LZW or PackBits; optional predictor 2).
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL

# ---------------------------------------------------------------------------
# TIFF LZW (spec §13): MSB-first bit packing, clear=256 / EOI=257, first
# dynamic code 258, 9->12-bit widths with EARLY CHANGE (the width bumps one
# code earlier than GIF's LZW: decoder when next_code == (1<<width)-1 after
# adding, encoder — one table-add ahead — when next_code == 1<<width).
# ---------------------------------------------------------------------------

_T_CLEAR = 256
_T_EOI = 257
_T_FIRST = 258
_T_MAX_WIDTH = 12


def _tiff_lzw_decode(data: bytes, n_expected: int) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    pos, nbits = 0, len(bits)
    out = np.empty(n_expected, dtype=np.uint8)
    n_out = 0

    size = 1 << _T_MAX_WIDTH
    parent = np.full(size, -1, dtype=np.int32)
    char = np.zeros(size, dtype=np.uint8)
    first = np.zeros(size, dtype=np.uint8)
    length = np.zeros(size, dtype=np.int32)
    char[:256] = np.arange(256, dtype=np.uint8)
    first[:256] = char[:256]
    length[:256] = 1
    scratch = np.empty(size, dtype=np.uint8)

    next_code, width = _T_FIRST, 9
    prev = -1
    while n_out < n_expected:
        if pos + width > nbits:
            raise ValueError("TIFF: LZW stream truncated")
        code = int(
            bits[pos : pos + width]
            @ (1 << np.arange(width - 1, -1, -1, dtype=np.int64))
        )
        pos += width
        if code == _T_CLEAR:
            next_code, width = _T_FIRST, 9
            prev = -1
            continue
        if code == _T_EOI:
            break
        if prev == -1:
            if code >= 256:
                raise ValueError("TIFF: first LZW code after clear not a literal")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code < next_code:
            entry, k = code, first[code]
        elif code == next_code:
            entry, k = prev, first[prev]
        else:
            raise ValueError("TIFF: LZW code out of range")
        n = length[entry] + (1 if code == next_code else 0)
        i = n
        if code == next_code:
            i -= 1
            scratch[i] = k
        c = entry
        while c != -1:
            i -= 1
            scratch[i] = char[c]
            c = parent[c]
        take = min(n, n_expected - n_out)
        out[n_out : n_out + take] = scratch[:take]
        n_out += take
        if next_code < size:
            parent[next_code] = prev
            char[next_code] = k if code == next_code else scratch[0]
            first[next_code] = first[prev]
            length[next_code] = length[prev] + 1
            next_code += 1
            if next_code == (1 << width) - 1 and width < _T_MAX_WIDTH:
                width += 1  # early change
        prev = code
    return out


def _tiff_lzw_encode(data: bytes) -> bytes:
    codes: list[tuple[int, int]] = []
    table: dict[bytes, int] = {}

    def reset():
        table.clear()
        for c in range(256):
            table[bytes([c])] = c
        return _T_FIRST, 9

    next_code, width = reset()
    codes.append((_T_CLEAR, width))
    w = b""
    for byte in data:
        wk = w + bytes([byte])
        if wk in table:
            w = wk
            continue
        codes.append((table[w], width))
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << width) and width < _T_MAX_WIDTH:
            width += 1  # early change, one add ahead of the decoder
        if next_code == (1 << _T_MAX_WIDTH) - 2:
            codes.append((_T_CLEAR, width))
            next_code, width = reset()
        w = bytes([byte])
    if w:
        codes.append((table[w], width))
    codes.append((_T_EOI, width))

    total_bits = sum(wd for _, wd in codes)
    bits = np.zeros(total_bits, dtype=np.uint8)
    pos = 0
    for code, wd in codes:
        for b in range(wd):
            bits[pos + b] = (code >> (wd - 1 - b)) & 1
        pos += wd
    return np.packbits(bits).tobytes()


def _packbits_decode(data: bytes, n_expected: int) -> np.ndarray:
    """TIFF §9 / Apple PackBits RLE: n in 0..127 copies n+1 literals,
    n in -127..-1 repeats the next byte 1-n times, -128 is a no-op."""
    out = np.empty(n_expected, dtype=np.uint8)
    n_out, pos, n = 0, 0, len(data)
    while n_out < n_expected:
        if pos >= n:
            raise ValueError("TIFF: PackBits stream truncated")
        ctrl = data[pos]
        pos += 1
        if ctrl < 128:  # literal run
            cnt = ctrl + 1
            out[n_out : n_out + cnt] = np.frombuffer(
                data, np.uint8, cnt, pos
            )
            pos += cnt
        elif ctrl > 128:  # repeat run
            cnt = 257 - ctrl
            out[n_out : n_out + cnt] = data[pos]
            pos += 1
        else:  # 128: no-op
            continue
        n_out += cnt
    return out


def _packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: repeat runs >= 2 bytes, literals between."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += 1
        while (
            i < n
            and i - lit_start < 128
            and not (i + 1 < n and data[i] == data[i + 1])
        ):
            i += 1
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


def _undo_predictor2(arr: np.ndarray, h: int, w: int, spp: int) -> np.ndarray:
    """Predictor 2 (horizontal differencing): cumulative sum per row per
    sample channel, mod 256."""
    px = arr.reshape(h, w, spp)
    return np.cumsum(px, axis=1, dtype=np.uint64).astype(np.uint8).reshape(-1)


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
    if comp not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} not supported (none + LZW + "
            "PackBits; JPEG-in-TIFF is an integration point)"
        )
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} not supported")
    if counts is None:
        counts = [h * w * spp // len(offsets)] * len(offsets)
    need = h * w * spp
    if comp == 1:
        data = b"".join(
            payload[o : o + c] for o, c in zip(offsets, counts)
        )
        arr = np.frombuffer(data, dtype=np.uint8, count=need)
    else:  # LZW / PackBits: each strip is an independent stream
        decode = _tiff_lzw_decode if comp == 5 else _packbits_decode
        rows_per = tags.get(278, [h])[0]
        chunks = []
        row = 0
        for o, c in zip(offsets, counts):
            rows_here = min(rows_per, h - row)
            chunks.append(decode(payload[o : o + c], rows_here * w * spp))
            row += rows_here
        arr = np.concatenate(chunks) if chunks else np.empty(0, np.uint8)
        if len(arr) != need:
            raise ValueError("TIFF: compressed strips decoded to wrong size")
    predictor = tags.get(317, [1])[0]
    if predictor == 2:
        arr = _undo_predictor2(arr, h, w, spp)
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor {predictor} not supported")
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


def encode_tiff(
    img: np.ndarray, compression: str = "none", predictor: int = 1
) -> bytes:
    """HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8 -> single-strip
    little-endian TIFF; ``compression`` 'none'/'lzw'/'packbits',
    ``predictor`` 1 (none) or 2 (horizontal differencing)."""
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
    raw = img
    if predictor == 2:
        px = img.reshape(h, w, spp).astype(np.int16)
        raw = np.empty_like(px)
        raw[:, 0] = px[:, 0]
        raw[:, 1:] = px[:, 1:] - px[:, :-1]
        raw = (raw & 0xFF).astype(np.uint8)
    elif predictor != 1:
        raise ValueError("predictor must be 1 or 2")
    data = raw.tobytes()
    if compression == "lzw":
        data = _tiff_lzw_encode(data)
        comp_tag = 5
    elif compression == "packbits":
        data = _packbits_encode(data)
        comp_tag = 32773
    elif compression == "none":
        comp_tag = 1
    else:
        raise ValueError("compression must be 'none', 'lzw' or 'packbits'")
    entries = [
        (256, 4, 1, w),  # ImageWidth
        (257, 4, 1, h),  # ImageLength
        (259, 3, 1, comp_tag),  # Compression
        (262, 3, 1, photo),
        (277, 3, 1, spp),
        (278, 4, 1, h),  # RowsPerStrip: one strip
        (279, 4, 1, len(data)),  # StripByteCounts
    ]
    if predictor == 2:
        entries.append((317, 3, 1, 2))  # Predictor
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
