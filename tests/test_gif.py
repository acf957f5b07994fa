"""GIF codec (functions/gif.py): lossless round-trips through REAL LZW
(dictionary growth to 12 bits + table reset), interlace, degenerate
streams, rejection cases, and the multimodal dispatch."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from uk_address_matcher_ray.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 14),
    w=st.integers(1, 14),
    seed=st.integers(0, 2**16),
    ncolors=st.sampled_from([2, 3, 5, 17, 256]),
    interlace=st.booleans(),
)
def test_roundtrip_lossless(h, w, seed, ncolors, interlace):
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    img = palette[rng.integers(0, ncolors, (h, w))]
    out = decode_gif(encode_gif(img, interlace=interlace))
    assert out.shape == img.shape
    assert (out == img).all()


def test_dictionary_growth_and_reset():
    """16384 random 4-color pixels force the LZW table past 12 bits —
    the encoder must emit a mid-stream clear and the decoder must track
    every width bump on both sides of it."""
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 4, 16384).astype(np.uint8)
    out = _lzw_decode(_lzw_encode(idx, 2), 2, len(idx))
    assert (out == idx).all()


def test_long_run_kwkwk_case():
    """A constant stream exercises the code==next_code (KwKwK) branch
    on nearly every step."""
    idx = np.zeros(5000, dtype=np.uint8)
    out = _lzw_decode(_lzw_encode(idx, 2), 2, len(idx))
    assert (out == idx).all()


def test_deinterlace_is_exact_permutation():
    rng = np.random.default_rng(5)
    img = (rng.integers(0, 2, (19, 3, 1), dtype=np.uint8) * 255).repeat(3, 2)
    assert (decode_gif(encode_gif(img, interlace=True)) == img).all()


def test_rejections():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + encode_gif(img)[7:])
    rng = np.random.default_rng(7)
    toomany = rng.integers(0, 256, (17, 17, 3), dtype=np.uint8)
    assert len(np.unique(toomany.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError):
        encode_gif(toomany)


def test_multimodal_dispatch_gif():
    from uk_address_matcher_ray.stages.multimodal import _decode_image

    rng = np.random.default_rng(9)
    palette = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    img = palette[rng.integers(0, 8, (6, 4))]
    assert (_decode_image(encode_gif(img)) == img).all()
