"""Pure-Python/numpy GIF codec (first frame), written to the public
GIF89a specification (CompuServe, 1990) — no external imaging libs.

Decoder: GIF87a/GIF89a, global + local color tables, full variable-width
LZW (dictionary growth to 12 bits, clear-code resets, deferred-clear
streams), interlaced images (4-pass deinterlace).  Returns the FIRST
image frame as an ``(h, w, 3) uint8`` RGB array rendered over the
logical screen; extension blocks (GCE/comment/application) are skipped.
Animation composition and transparency blending are out of scope — the
multimodal stage treats one frame as the feature source (the same
contract as the TIFF/PNG decoders, stages/multimodal.py).

Encoder: deterministic synthesis counterpart for tests/oracles — builds
a <=256-color palette from the image, emits ONE non-interlaced frame
with real greedy-longest-match LZW (so decoder dictionary growth and
reset paths are exercised by round-trips).  Lossless for any image with
<=256 distinct colors.

The reference engine (RobinL/uk_address_matcher) has no multimodal
surface; this closes one of the documented codec integration points
(SURVEY.md §2-extras).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_WIDTH = 12


# --------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable 3..12-bit codes)
# --------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """Decode a GIF LZW stream (already de-sub-blocked) to ``n_expected``
    palette indices (uint8)."""
    clear = 1 << min_code_size
    end = clear + 1
    # bit reader: LSB-first across the whole byte stream
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little"
    )
    pos = 0
    nbits = len(bits)

    out = np.empty(n_expected, dtype=np.uint8)
    n_out = 0

    # dictionary as parent/char tables (index = code)
    parent = np.full(1 << _MAX_CODE_WIDTH, -1, dtype=np.int32)
    char = np.zeros(1 << _MAX_CODE_WIDTH, dtype=np.uint8)
    first = np.zeros(1 << _MAX_CODE_WIDTH, dtype=np.uint8)
    length = np.zeros(1 << _MAX_CODE_WIDTH, dtype=np.int32)

    def reset_table():
        for c in range(clear):
            char[c] = c
            first[c] = c
            length[c] = 1
        return end + 1, min_code_size + 1

    next_code, width = reset_table()
    prev = -1
    scratch = np.empty(1 << _MAX_CODE_WIDTH, dtype=np.uint8)

    while n_out < n_expected:
        if pos + width > nbits:
            raise ValueError("GIF: LZW stream truncated")
        code = int(bits[pos : pos + width] @ (1 << np.arange(width, dtype=np.int64)))
        pos += width
        if code == clear:
            next_code, width = reset_table()
            prev = -1
            continue
        if code == end:
            break
        if prev == -1:
            if code >= clear:
                raise ValueError("GIF: first code after clear not a literal")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code < next_code:
            entry = code
            k = first[code]
        elif code == next_code:
            entry = prev
            k = first[prev]
        else:
            raise ValueError("GIF: LZW code out of range")
        # materialize entry string (walk parents backwards)
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
        # add prev + first char of entry
        if next_code < (1 << _MAX_CODE_WIDTH):
            parent[next_code] = prev
            char[next_code] = k if code == next_code else scratch[0]
            first[next_code] = first[prev]
            length[next_code] = length[prev] + 1
            next_code += 1
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = code
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Greedy longest-match GIF LZW; resets the table when it fills (so
    decoders never see deferred-clear growth past 12 bits)."""
    clear = 1 << min_code_size
    end = clear + 1

    codes: list[tuple[int, int]] = []  # (code, width)

    table: dict[bytes, int] = {}

    def reset():
        table.clear()
        for c in range(clear):
            table[bytes([c])] = c
        return end + 1, min_code_size + 1

    next_code, width = reset()
    codes.append((clear, width))

    w = b""
    for k in indices.tobytes():
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        codes.append((table[w], width))
        if next_code < (1 << _MAX_CODE_WIDTH):
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
                # GIF width bump happens when the NEXT code to assign
                # no longer fits; encoder mirrors the decoder's rule:
                # decoder bumps after adding code (1<<width)-1
                width += 1
        else:
            codes.append((clear, width))
            next_code, width = reset()
        w = bytes([k])
    if w:
        codes.append((table[w], width))
    codes.append((end, width))

    # pack LSB-first
    total_bits = sum(wd for _, wd in codes)
    bits = np.zeros(total_bits, dtype=np.uint8)
    pos = 0
    for code, wd in codes:
        for b in range(wd):
            bits[pos + b] = (code >> b) & 1
        pos += wd
    return np.packbits(bits, bitorder="little").tobytes()


# The encoder/decoder width-bump rules must agree exactly.  Decoder bumps
# when next_code == 1<<width AFTER adding; encoder assigns code X then the
# decoder (one step behind) adds X on the NEXT emitted code — hence the
# encoder's check is next_code == (1<<width)+1 after ITS add.  Round-trip
# tests in tests/test_gif.py pin this.


# --------------------------------------------------------------------------
# container
# --------------------------------------------------------------------------


def _sub_blocks(data: bytes, off: int):
    """Concatenate GIF data sub-blocks starting at ``off``; returns
    (bytes, next_offset)."""
    chunks = []
    while True:
        n = data[off]
        off += 1
        if n == 0:
            return b"".join(chunks), off
        chunks.append(data[off : off + n])
        off += n


_DEINTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> np.ndarray:
    """First frame of a GIF as (h, w, 3) uint8 RGB over the logical
    screen (background = palette entry of the background color index,
    or black without a global table)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", data, 6)
    off = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[off : off + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        off += 3 * n

    if gct is not None:
        screen = np.broadcast_to(gct[bg_idx], (sh, sw, 3)).copy()
    else:
        screen = np.zeros((sh, sw, 3), dtype=np.uint8)

    while off < len(data):
        block = data[off]
        off += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            off += 1
            _, off = _sub_blocks(data, off)
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, off)
        off += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(
                data[off : off + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            off += 3 * n
        if ct is None:
            raise ValueError("GIF: image without any color table")
        mcs = data[off]
        off += 1
        lzw, off = _sub_blocks(data, off)
        idx = _lzw_decode(lzw, mcs, w * h).reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            rows = np.concatenate(
                [np.arange(start, h, step) for start, step in _DEINTERLACE_PASSES]
            )
            deinter = np.empty_like(idx)
            deinter[rows] = idx
            idx = deinter
        screen[top : top + h, left : left + w] = ct[idx]
        return screen  # first frame only
    return screen


def encode_gif(pix: np.ndarray, interlace: bool = False) -> bytes:
    """One-frame GIF89a from (h, w, 3) uint8 RGB with <=256 distinct
    colors (raises ValueError beyond — synthesis images are paletted by
    construction)."""
    pix = np.ascontiguousarray(pix, dtype=np.uint8)
    h, w, _ = pix.shape
    flat = pix.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    # palette size: power of two >= max(2, n)
    n_pal = 2
    while n_pal < len(colors):
        n_pal *= 2
    pal_bits = n_pal.bit_length() - 1
    palette = np.zeros((n_pal, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        rows = np.concatenate(
            [np.arange(start, h, step) for start, step in _DEINTERLACE_PASSES]
        )
        idx = idx[rows]

    mcs = max(2, pal_bits)
    lzw = _lzw_encode(idx.reshape(-1), mcs)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += palette.tobytes()
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
