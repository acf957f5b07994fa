"""TIFF codec (functions/tiff.py): lossless roundtrip per color layout,
big-endian + multi-strip + palette + inverted-gray hand-built files,
rejection of compressed variants, and the multimodal dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from uk_address_matcher_ray.functions.tiff import decode_tiff, encode_tiff


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**16),
    kind=st.sampled_from(["gray", "rgb", "rgba"]),
)
def test_roundtrip_lossless(h, w, seed, kind):
    rng = np.random.default_rng(seed)
    shape = {"gray": (h, w), "rgb": (h, w, 3), "rgba": (h, w, 4)}[kind]
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_tiff(encode_tiff(img))
    assert out.shape == img.shape
    assert (out == img).all()


def _be_entries(e):
    e.sort(key=lambda b: b[:2])
    return b"".join(e)


def _be_gray(img, photo=1, strips=2):
    """Hand-built big-endian multi-strip grayscale TIFF."""
    h, w = img.shape
    rows_per = (h + strips - 1) // strips
    chunks = [
        img[i * rows_per : (i + 1) * rows_per].tobytes()
        for i in range(strips)
    ]
    chunks = [c for c in chunks if c]
    ns = len(chunks)
    offs, pos = [], 8
    for c in chunks:
        offs.append(pos)
        pos += len(c)
    so = struct.pack(">" + "I" * ns, *offs)
    sc = struct.pack(">" + "I" * ns, *[len(c) for c in chunks])
    ifd_off = pos + len(so) + len(sc)

    def ent(tag, typ, count, val):
        return struct.pack(">HHI", tag, typ, count) + val

    e = [
        ent(256, 4, 1, struct.pack(">I", w)),
        ent(257, 4, 1, struct.pack(">I", h)),
        ent(258, 3, 1, struct.pack(">HH", 8, 0)),
        ent(259, 3, 1, struct.pack(">HH", 1, 0)),
        ent(262, 3, 1, struct.pack(">HH", photo, 0)),
        ent(277, 3, 1, struct.pack(">HH", 1, 0)),
    ]
    if ns == 1:
        e.append(ent(273, 4, 1, struct.pack(">I", offs[0])))
        e.append(ent(279, 4, 1, struct.pack(">I", len(chunks[0]))))
    else:
        e.append(ent(273, 4, ns, struct.pack(">I", pos)))
        e.append(ent(279, 4, ns, struct.pack(">I", pos + len(so))))
    body = b"MM\x00*" + struct.pack(">I", ifd_off)
    body += b"".join(chunks) + so + sc
    body += struct.pack(">H", len(e)) + _be_entries(e) + struct.pack(">I", 0)
    return body


def test_big_endian_multistrip_and_inverted_gray():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (7, 5), dtype=np.uint8)
    assert (decode_tiff(_be_gray(img, photo=1, strips=3)) == img).all()
    assert (decode_tiff(_be_gray(img, photo=0, strips=1)) == 255 - img).all()


def test_palette_decode():
    # little-endian palette TIFF: indices reference a 16-bit ColorMap
    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    cmap16 = [0x1100, 0x2200, 0x3300, 0x4400, 0x5500, 0x6600, 0x7700, 0x8800, 0x9900]
    # cmap layout: all R, all G, all B (3 colors)
    h, w = idx.shape
    data = idx.tobytes()

    def ent(tag, typ, count, val):
        return struct.pack("<HHI", tag, typ, count) + val

    cmap_bytes = struct.pack("<" + "H" * 9, *cmap16)
    data_off = 8
    cmap_off = data_off + len(data)
    ifd_off = cmap_off + len(cmap_bytes)
    e = [
        ent(256, 4, 1, struct.pack("<I", w)),
        ent(257, 4, 1, struct.pack("<I", h)),
        ent(258, 3, 1, struct.pack("<HH", 8, 0)),
        ent(259, 3, 1, struct.pack("<HH", 1, 0)),
        ent(262, 3, 1, struct.pack("<HH", 3, 0)),
        ent(273, 4, 1, struct.pack("<I", data_off)),
        ent(277, 3, 1, struct.pack("<HH", 1, 0)),
        ent(279, 4, 1, struct.pack("<I", len(data))),
        ent(320, 3, 9, struct.pack("<I", cmap_off)),
    ]
    e.sort(key=lambda b: b[:2])
    body = b"II*\x00" + struct.pack("<I", ifd_off) + data + cmap_bytes
    body += struct.pack("<H", len(e)) + b"".join(e) + struct.pack("<I", 0)
    out = decode_tiff(body)
    pal = (np.array(cmap16, dtype=np.uint16).reshape(3, 3).T >> 8).astype(
        np.uint8
    )
    assert (out == pal[idx]).all()


def test_rejections():
    img = np.zeros((2, 2), dtype=np.uint8)
    payload = bytearray(encode_tiff(img))
    with pytest.raises(ValueError):
        decode_tiff(b"XX" + bytes(payload)[2:])
    # flip Compression (tag 259) value to 7 (JPEG-in-TIFF) in place
    raw = bytes(payload)
    ifd_off = struct.unpack_from("<I", raw, 4)[0]
    (n,) = struct.unpack_from("<H", raw, ifd_off)
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag = struct.unpack_from("<H", raw, base)[0]
        if tag == 259:
            payload[base + 8 : base + 10] = struct.pack("<H", 7)
    with pytest.raises(NotImplementedError):
        decode_tiff(bytes(payload))


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    seed=st.integers(0, 2**16),
    kind=st.sampled_from(["gray", "rgb", "rgba"]),
    predictor=st.sampled_from([1, 2]),
)
def test_lzw_roundtrip_lossless(h, w, seed, kind, predictor):
    rng = np.random.default_rng(seed)
    shape = {"gray": (h, w), "rgb": (h, w, 3), "rgba": (h, w, 4)}[kind]
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_tiff(encode_tiff(img, compression="lzw", predictor=predictor))
    assert out.shape == img.shape
    assert (out == img).all()


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    seed=st.integers(0, 2**16),
    runs=st.booleans(),
)
def test_packbits_roundtrip_lossless(h, w, seed, runs):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 3 if runs else 256, (h, w, 3), dtype=np.uint8)
    if runs:
        img = img * 90  # long repeat runs
    out = decode_tiff(encode_tiff(img, compression="packbits"))
    assert (out == img).all()


def test_lzw_table_reset_path():
    """A big low-entropy image drives the LZW table past 4094 codes,
    forcing the encoder's mid-stream clear + early-change re-growth."""
    rng = np.random.default_rng(4)
    img = (rng.integers(0, 3, (120, 120), dtype=np.uint8) * 100)
    out = decode_tiff(encode_tiff(img, compression="lzw"))
    assert (out == img).all()


def test_multimodal_dispatch_tiff():
    from uk_address_matcher_ray.stages.multimodal import _decode_image

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (6, 4, 3), dtype=np.uint8)
    assert (_decode_image(encode_tiff(img)) == img).all()
