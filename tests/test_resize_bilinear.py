"""resize_bilinear: loop-reference parity, identity/2x invariants, and
the documented expression contract vs a scalar Python restatement."""

from __future__ import annotations

import math

import numpy as np
import pytest


def _resize_ref(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Scalar restatement of the docstring contract (the oracle's shape)."""
    h, w = img.shape[0], img.shape[1]
    out = np.zeros((out_h, out_w, img.shape[2]), np.uint8)
    for j in range(out_h):
        sy = (j + 0.5) * (h / out_h) - 0.5
        syc = min(max(sy, 0.0), float(h - 1))
        y0 = int(min(math.floor(syc), float(h - 2)))
        fy = syc - y0
        for i in range(out_w):
            sx = (i + 0.5) * (w / out_w) - 0.5
            sxc = min(max(sx, 0.0), float(w - 1))
            x0 = int(min(math.floor(sxc), float(w - 2)))
            fx = sxc - x0
            for c in range(img.shape[2]):
                v00 = float(img[y0][x0][c])
                v01 = float(img[y0][x0 + 1][c])
                v10 = float(img[y0 + 1][x0][c])
                v11 = float(img[y0 + 1][x0 + 1][c])
                t1 = (1 - fx) * v00 + fx * v01
                t2 = (1 - fx) * v10 + fx * v11
                v = (1 - fy) * t1 + fy * t2
                out[j][i][c] = int(min(255.0, max(0.0, math.floor(v + 0.5))))
    return out


def _img(k: int, h: int = 16, w: int = 16) -> np.ndarray:
    y = np.arange(h)[:, None, None]
    x = np.arange(w)[None, :, None]
    c = np.arange(3)[None, None, :]
    return ((k * 7 + y * 31 + x * 13 + c * 101) % 256).astype(np.uint8)


def test_matches_scalar_reference_exactly():
    from uk_address_matcher_ray.stages.multimodal import resize_bilinear

    for k in (0, 3, 11):
        for oh, ow in ((10, 7), (8, 8), (32, 5), (16, 16), (3, 29)):
            img = _img(k)
            got = resize_bilinear(img, oh, ow)
            assert np.array_equal(got, _resize_ref(img, oh, ow)), (k, oh, ow)


def test_identity_and_box_average():
    from uk_address_matcher_ray.stages.multimodal import resize_bilinear

    img = _img(5)
    # same-size resize samples exactly at pixel centers -> identity
    assert np.array_equal(resize_bilinear(img, 16, 16), img)
    # factor-2 downscale has fx=fy=0.5 everywhere -> rounded 2x2 box mean
    half = resize_bilinear(img, 8, 8)
    blocks = img.astype(np.float64).reshape(8, 2, 8, 2, 3)
    want = np.floor(blocks.mean(axis=(1, 3)) + 0.5).astype(np.uint8)
    assert np.array_equal(half, want)


def test_grayscale_and_degenerate():
    from uk_address_matcher_ray.stages.multimodal import resize_bilinear

    gray = _img(2)[:, :, 0]
    out = resize_bilinear(gray, 5, 9)
    assert out.shape == (5, 9)
    with pytest.raises(ValueError):
        resize_bilinear(np.zeros((1, 16), np.uint8), 4, 4)
