"""Pure-numpy baseline JPEG codec (functions/jpeg.py): exactness contract
for constant integer-YCbCr blocks, lossy-bound sanity for arbitrary images,
subsampling/grayscale/restart-marker structure, and the multimodal decoder
dispatch."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from uk_address_matcher_ray.functions.jpeg import (
    _half_up,
    decode_jpeg,
    encode_jpeg,
    rgb_to_ycbcr,
)


def _expected_roundtrip_rgb(img):
    """Closed-form decode of a constant-macroblock image: the YCbCr round
    trip with the codec's floor(x+0.5) rounding (module docstring)."""
    ycc = rgb_to_ycbcr(img)
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    r = _half_up(y + 1.402 * (cr - 128.0))
    g = _half_up(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0))
    b = _half_up(y + 1.772 * (cb - 128.0))
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _blocks_img(colors, mb=16):
    n = len(colors)
    img = np.zeros((mb, mb * n, 3), dtype=np.uint8)
    for i, c in enumerate(colors):
        img[:, i * mb : (i + 1) * mb] = c
    return img


@given(
    colors=st.lists(
        st.tuples(
            st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
        ),
        min_size=1,
        max_size=4,
    ),
    sub=st.sampled_from(["4:4:4", "4:2:2", "4:2:0"]),
    rst=st.sampled_from([0, 1, 2]),
)
@settings(max_examples=40, deadline=None)
def test_constant_macroblocks_roundtrip_exact(colors, sub, rst):
    img = _blocks_img(colors)
    dec = decode_jpeg(encode_jpeg(img, subsampling=sub, restart_interval=rst))
    assert np.array_equal(dec, _expected_roundtrip_rgb(img))


def test_arbitrary_image_lossy_bound_and_shape():
    rng = np.random.RandomState(3)
    # smooth gradient, non-MCU-multiple size
    yy, xx = np.mgrid[0:33, 0:47]
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, (yy + xx) % 256], axis=-1
    ).astype(np.uint8)
    for sub in ("4:4:4", "4:2:2", "4:2:0"):
        dec = decode_jpeg(encode_jpeg(img, subsampling=sub))
        assert dec.shape == img.shape
        mae = np.abs(dec.astype(int) - img.astype(int)).mean()
        assert mae < 3.0, (sub, mae)
    # pure noise with quant=1 at 4:4:4: only YCbCr integer rounding remains
    noise = rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
    dec = decode_jpeg(
        encode_jpeg(
            noise, subsampling="4:4:4", quant=np.ones((8, 8), dtype=np.uint8)
        )
    )
    err = np.abs(dec.astype(int) - noise.astype(int))
    # residual = YCbCr integer rounding (±~1.2 linear) + q=1 coefficient
    # rounding noise folded through the IDCT
    assert err.mean() < 1.0 and err.max() <= 6


def test_grayscale_exact_constant():
    img = np.full((16, 24), 77, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)
    # gradient grayscale: lossy-bounded
    g = (np.mgrid[0:17, 0:19].sum(axis=0) * 5 % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g))
    assert dec.shape == g.shape
    assert np.abs(dec.astype(int) - g.astype(int)).mean() < 4.0


def test_restart_markers_present_and_equal():
    img = _blocks_img([(10, 200, 30), (250, 5, 125)])
    plain = encode_jpeg(img, subsampling="4:2:0")
    rst = encode_jpeg(img, subsampling="4:2:0", restart_interval=1)
    assert b"\xff\xd0" in rst and b"\xff\xd0" not in plain
    assert np.array_equal(decode_jpeg(plain), decode_jpeg(rst))


def test_decoder_rejects_non_baseline():
    img = np.full((8, 8), 1, dtype=np.uint8)
    payload = bytearray(encode_jpeg(img))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2  # pretend progressive
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x00notajpeg")


def test_multimodal_dispatch_jpeg():
    from uk_address_matcher_ray.stages.multimodal import _decode_image

    img = _blocks_img([(1, 2, 3)])
    dec = _decode_image(encode_jpeg(img, subsampling="4:4:4"))
    assert dec.shape == img.shape
    assert np.array_equal(dec, _expected_roundtrip_rgb(img))


def test_byte_stuffing_survives():
    """Colors chosen to force 0xFF bytes into the entropy stream."""
    rng = np.random.RandomState(11)
    for _ in range(5):
        img = _blocks_img([tuple(rng.randint(0, 256, 3)) for _ in range(3)])
        payload = encode_jpeg(img, subsampling="4:2:0")
        assert np.array_equal(
            decode_jpeg(payload), _expected_roundtrip_rgb(img)
        )
