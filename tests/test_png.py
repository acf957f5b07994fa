"""PNG codec (functions/png.py): lossless roundtrip for every supported
color type, filter-type 0-4 reconstruction against hand-filtered scanlines,
palette decode, and the multimodal dispatch."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from uk_address_matcher_ray.functions.png import _SIG, decode_png, encode_png


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def _png_with_filters(img: np.ndarray, filters) -> bytes:
    """Build a PNG whose row y uses filter type filters[y] by FORWARD
    filtering the known pixels — the decoder must invert exactly."""
    h, w, bpp = img.shape
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int64)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int64)
        ft = filters[y]
        raw.append(ft)
        line = np.zeros(w * bpp, dtype=np.int64)
        for x in range(w * bpp):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[x] = (cur[x] - pred) & 0xFF
        raw += bytes(line.astype(np.uint8))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@given(
    h=st.integers(1, 9),
    w=st.integers(1, 9),
    seed=st.integers(0, 999),
    kind=st.sampled_from(["gray", "rgb", "rgba"]),
)
@settings(max_examples=40, deadline=None)
def test_roundtrip_lossless(h, w, seed, kind):
    rng = np.random.RandomState(seed)
    if kind == "gray":
        img = rng.randint(0, 256, (h, w)).astype(np.uint8)
        expected = img
    elif kind == "rgb":
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        expected = img
    else:
        img = rng.randint(0, 256, (h, w, 4)).astype(np.uint8)
        expected = img[..., :3]  # alpha dropped by contract
    dec = decode_png(encode_png(img))
    assert np.array_equal(dec, expected)


@given(seed=st.integers(0, 999), data=st.data())
@settings(max_examples=40, deadline=None)
def test_all_filter_types_reconstruct(seed, data):
    rng = np.random.RandomState(seed)
    h, w = rng.randint(2, 8), rng.randint(2, 8)
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    filters = [data.draw(st.integers(0, 4)) for _ in range(h)]
    dec = decode_png(_png_with_filters(img, filters))
    assert np.array_equal(dec, img), filters


def test_palette_decode():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    raw = bytearray()
    for y in range(2):
        raw.append(0)
        raw += idx[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    payload = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), pal[idx])


def test_rejections():
    with pytest.raises(ValueError):
        decode_png(b"nope")
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    payload = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(payload)
    # interlaced
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)
    payload = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(payload)


def test_multimodal_dispatch_png():
    from uk_address_matcher_ray.stages.multimodal import _decode_image

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert np.array_equal(_decode_image(encode_png(img)), img)
