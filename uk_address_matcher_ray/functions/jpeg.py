"""Pure-numpy baseline JPEG (ITU-T T.81) codec — no codec libraries.

Decoder: baseline sequential DCT, 8-bit, Huffman, interleaved single scan,
1-3 components, 4:4:4 / 4:2:2 / 4:2:0 sampling, restart markers, byte
unstuffing. Encoder: the matching baseline writer (Annex K "typical"
Huffman tables — public spec constants) used to synthesize deterministic
test/benchmark JPEGs, since no imaging library exists in this container.

Rounding contract (documented because the DuckDB oracle mirrors it):
- component samples after IDCT round HALF-UP (floor(x + 0.5)) and clip to
  [0, 255] BEFORE color conversion;
- YCbCr->RGB (JFIF/CCIR 601 constants) also rounds floor(x + 0.5) then
  clips. Integer-valued planes therefore survive bit-exactly: the 1e-13
  float IDCT noise sits next to c + 0.5 (never a floor boundary for
  integer c), so a constant block whose quantized DC divides exactly
  reconstructs its exact integer value.

The reference repo has no multimodal surface at all — this closes the
builder-brief JPEG integration point (stages/multimodal.py) with a real
decoder rather than a stub.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

# zigzag scan order: zz[i] = (row, col) of the i-th coefficient
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# 8x8 DCT-II basis: C[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_C = np.zeros((8, 8), dtype=np.float64)
for _u in range(8):
    cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _C[_u, _x] = 0.5 * cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _half_up(x: np.ndarray) -> np.ndarray:
    return np.floor(x + 0.5)


# ---------------------------------------------------------------------------
# Annex K (ITU-T T.81, public spec) typical tables
# ---------------------------------------------------------------------------

# (bits[1..16] counts, values) for DC/AC luma/chroma
_STD_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHROMA = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_STD_AC_CHROMA = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _build_decode_table(bits: List[int], values: List[int]) -> Dict[Tuple[int, int], int]:
    """Canonical Huffman -> {(code_length, code): symbol}."""
    table: Dict[Tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: List[int], values: List[int]) -> Dict[int, Tuple[int, int]]:
    """Canonical Huffman -> {symbol: (code, code_length)}."""
    table: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[values[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: Optional[int] = None  # pending marker (e.g. RSTn, EOI)

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("unexpected end of JPEG entropy data")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = d[self.pos] if self.pos < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 1  # stuffed FF
            else:
                self.marker = nxt
                self.pos -= 1  # leave pos ON the 0xFF
                raise _MarkerHit()
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: Dict[Tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    def align_restart(self, expected: int):
        """Consume the pending RSTn marker and reset bit state."""
        self.bitbuf = 0
        self.nbits = 0
        if self.marker is None:
            # marker not yet hit: scan forward to it
            d = self.data
            while self.pos < len(d):
                if d[self.pos] == 0xFF and self.pos + 1 < len(d) and d[self.pos + 1] != 0x00:
                    self.marker = d[self.pos + 1]
                    break
                self.pos += 1
        if self.marker is None or not (0xD0 <= self.marker <= 0xD7):
            raise ValueError("expected restart marker")
        if (self.marker - 0xD0) != expected:
            raise ValueError("restart marker out of sequence")
        self.pos += 2  # skip FF Dx (pos sits ON the FF after a scan hit)
        self.marker = None


class _MarkerHit(Exception):
    pass


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t raw bits to a signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> HxWx3 uint8 RGB (or HxW for grayscale)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, Dict] = {}
    huff_ac: Dict[int, Dict] = {}
    restart_interval = 0
    frame = None  # (H, W, [(cid, h, v, tq)])
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:
            continue
        seg_len = int.from_bytes(payload[pos : pos + 2], "big")
        seg = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables (not baseline)")
                tab = np.zeros(64, dtype=np.float64)
                tab[_ZZ] = np.frombuffer(seg[p : p + 64], dtype=np.uint8)
                qt[tq] = tab.reshape(8, 8)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                p += 1
                bits = [0] + list(seg[p : p + 16])
                p += 16
                cnt = sum(bits)
                vals = list(seg[p : p + cnt])
                p += cnt
                tbl = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit precision")
            H = int.from_bytes(seg[1:3], "big")
            W = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid = seg[6 + 3 * i]
                hv = seg[7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, seg[8 + 3 * i]))
            frame = (H, W, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential (SOF0) JPEG")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs = seg[1 + 2 * i]
                t = seg[2 + 2 * i]
                scan.append((cs, t >> 4, t & 0xF))
            data_pos = pos + seg_len
            return _decode_scan(
                payload, data_pos, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn / COM / others: skip
        pos += seg_len
    raise ValueError("no SOS in JPEG")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    H, W, comps = frame
    by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcux = (W + 8 * hmax - 1) // (8 * hmax)
    mcuy = (H + 8 * vmax - 1) // (8 * vmax)

    planes = {}
    for cid, h, v, _tq in comps:
        planes[cid] = np.zeros((mcuy * v * 8, mcux * h * 8), dtype=np.float64)

    reader = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in comps}
    rst_count = 0
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.align_restart(rst_count % 8)
                rst_count += 1
                pred = {cid: 0 for cid, *_ in comps}
            for cs, td, ta in scan:
                h, v, tq = by_id[cs]
                for bv in range(v):
                    for bh in range(h):
                        try:
                            coefs = _decode_block(
                                reader, huff_dc[td], huff_ac[ta], pred, cs
                            )
                        except _MarkerHit:
                            raise ValueError("entropy data ended early")
                        block = _idct2(coefs * qt[tq]) + 128.0
                        y0 = (my * v + bv) * 8
                        x0 = (mx * h + bh) * 8
                        planes[cs][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_index += 1

    # round components half-up, clip, then upsample to full size
    out_planes = []
    for cid, h, v, _tq in comps:
        p = np.clip(_half_up(planes[cid]), 0, 255)
        p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        out_planes.append(p[:H, :W])
    if len(out_planes) == 1:
        return out_planes[0].astype(np.uint8)
    if len(out_planes) != 3:
        raise NotImplementedError("1- or 3-component JPEG only")
    y, cb, cr = out_planes
    r = _half_up(y + 1.402 * (cr - 128.0))
    g = _half_up(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0))
    b = _half_up(y + 1.772 * (cb - 128.0))
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _decode_block(reader, dc_tbl, ac_tbl, pred, cid) -> np.ndarray:
    zz = np.zeros(64, dtype=np.float64)
    t = reader.decode_symbol(dc_tbl)
    diff = _extend(reader.read_bits(t), t)
    pred[cid] += diff
    zz[0] = pred[cid]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1
    out = np.zeros(64, dtype=np.float64)
    out[_ZZ] = zz
    return out.reshape(8, 8)


# ---------------------------------------------------------------------------
# Encoder (test/bench synthesis; same baseline feature set)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def pad(self):
        if self.nbits:
            self.write(0xFF >> (8 - (8 - self.nbits)), 8 - self.nbits)


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(writer, coefs_q, pred, cid, dc_tbl, ac_tbl):
    zz = coefs_q.reshape(64)[_ZZ]
    dc = int(zz[0])
    diff = dc - pred[cid]
    pred[cid] = dc
    t = _category(diff)
    code, ln = dc_tbl[t]
    writer.write(code, ln)
    if t:
        writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    nz = np.flatnonzero(zz[1:])
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tbl[0xF0]
            writer.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_tbl[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tbl[0x00]
        writer.write(code, ln)


def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """JFIF forward transform with the codec's half-up rounding."""
    x = img.astype(np.float64)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = _half_up(0.299 * r + 0.587 * g + 0.114 * b)
    cb = _half_up(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b)
    cr = _half_up(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
    return np.clip(np.stack([y, cb, cr], axis=-1), 0, 255)


def encode_jpeg(
    img: np.ndarray,
    *,
    quant: Optional[np.ndarray] = None,
    subsampling: str = "4:2:0",
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 uint8 RGB (or HxW grayscale) -> baseline JFIF bytes.

    ``quant``: 8x8 uint8 table used for BOTH luma and chroma (default all
    8s — exact for integer constant blocks, see module docstring)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    H, W = img.shape[:2]
    if quant is None:
        quant = np.full((8, 8), 8, dtype=np.uint8)
    q = quant.astype(np.float64)

    if gray:
        comps = [(1, 1, 1, 0)]
        planes = {1: img.astype(np.float64)}
    else:
        ycc = rgb_to_ycbcr(img)
        if subsampling == "4:2:0":
            sh = sv = 2
        elif subsampling == "4:2:2":
            sh, sv = 2, 1
        elif subsampling == "4:4:4":
            sh = sv = 1
        else:
            raise ValueError(subsampling)
        comps = [(1, sh, sv, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
        planes = {1: ycc[..., 0]}
        for idx, cid in ((1, 2), (2, 3)):
            c = ycc[..., idx]
            if sh == 2 or sv == 2:
                ph = ((H + sv - 1) // sv) * sv
                pw = ((W + sh - 1) // sh) * sh
                pad = np.empty((ph, pw), dtype=np.float64)
                pad[:H, :W] = c
                pad[H:, :W] = c[H - 1 :, :]
                pad[:, W:] = pad[:, W - 1 : W]
                c = pad.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
                c = _half_up(c)
            planes[cid] = c

    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcux = (W + 8 * hmax - 1) // (8 * hmax)
    mcuy = (H + 8 * vmax - 1) // (8 * vmax)

    # pad each plane (edge replicate) to its MCU-aligned size
    for cid, h, v, _tq in comps:
        p = planes[cid]
        th, tw = mcuy * v * 8, mcux * h * 8
        out = np.empty((th, tw), dtype=np.float64)
        ph, pw = p.shape
        out[:ph, :pw] = p
        out[ph:, :pw] = p[ph - 1 :, :]
        out[:, pw:] = out[:, pw - 1 : pw]
        planes[cid] = out

    dc_l = _build_encode_table(*_STD_DC_LUMA)
    ac_l = _build_encode_table(*_STD_AC_LUMA)
    dc_c = _build_encode_table(*_STD_DC_CHROMA)
    ac_c = _build_encode_table(*_STD_AC_CHROMA)

    writer = _BitWriter()
    pred = {cid: 0 for cid, *_ in comps}
    rst = 0
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                writer.pad()
                writer.out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = {cid: 0 for cid, *_ in comps}
            for cid, h, v, _tq in comps:
                dt, at = (dc_l, ac_l) if cid == 1 else (dc_c, ac_c)
                for bv in range(v):
                    for bh in range(h):
                        y0 = (my * v + bv) * 8
                        x0 = (mx * h + bh) * 8
                        blk = planes[cid][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coef = _fdct2(blk)
                        # symmetric round-half-away (what libjpeg does)
                        cq = np.sign(coef) * np.floor(np.abs(coef) / q + 0.5)
                        _encode_block(writer, cq, pred, cid, dt, at)
            mcu_index += 1
    writer.pad()

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zzq = np.empty(64, dtype=np.uint8)
    zzq[:] = quant.reshape(64)[_ZZ]
    out += seg(0xDB, bytes([0x00]) + zzq.tobytes())
    if not gray:
        out += seg(0xDB, bytes([0x01]) + zzq.tobytes())
    sof = bytes([8]) + H.to_bytes(2, "big") + W.to_bytes(2, "big") + bytes([len(comps)])
    for cid, h, v, _tq in comps:
        sof += bytes([cid, (h << 4) | v, 0 if cid == 1 else 1])
    out += seg(0xC0, sof)

    def dht(tc, th, bits_vals):
        bits, vals = bits_vals
        return seg(0xC4, bytes([(tc << 4) | th] + bits[1:]) + bytes(vals))

    out += dht(0, 0, _STD_DC_LUMA) + dht(1, 0, _STD_AC_LUMA)
    if not gray:
        out += dht(0, 1, _STD_DC_CHROMA) + dht(1, 1, _STD_AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
