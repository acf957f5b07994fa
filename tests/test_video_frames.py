"""RAWV video decode + frame sampling: roundtrip, stride/timestamp/luma
semantics vs a loop reference, and the codec boundary."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _clip(k: int, n: int = 7, h: int = 12, w: int = 16) -> np.ndarray:
    f = np.arange(n)[:, None, None, None]
    y = np.arange(h)[None, :, None, None]
    x = np.arange(w)[None, None, :, None]
    c = np.arange(3)[None, None, None, :]
    return ((k * 7 + f * 59 + y * 31 + x * 13 + c * 101) % 256).astype(np.uint8)


def test_rawv_roundtrip():
    from uk_address_matcher_ray.stages.multimodal import decode_rawv, encode_rawv

    frames = _clip(3)
    out, fps = decode_rawv(encode_rawv(frames, fps=25))
    assert fps == 25
    assert np.array_equal(out, frames)


def test_decode_video_boundary():
    from uk_address_matcher_ray.stages.multimodal import _decode_video

    with pytest.raises(NotImplementedError):
        _decode_video(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 32)


def test_frame_luma_matches_loop():
    from uk_address_matcher_ray.stages.multimodal import frame_luma

    fr = _clip(5)[0]
    total = 0
    for yy in range(fr.shape[0]):
        for xx in range(fr.shape[1]):
            r, g, b = (int(v) for v in fr[yy][xx])
            total += (299 * r + 587 * g + 114 * b) // 1000
    assert frame_luma(fr) == total // (fr.shape[0] * fr.shape[1])


def test_sample_video_frames(ray_session):
    import ray

    from uk_address_matcher_ray.stages.multimodal import (
        encode_rawv,
        frame_luma,
        sample_video_frames,
    )

    clips = {f"v{k}": _clip(k, n=6 + k % 5) for k in range(9)}
    tbl = pa.table(
        {
            "media_id": pa.array(list(clips), pa.string()),
            "payload": pa.array(
                [encode_rawv(c, fps=10) for c in clips.values()], pa.binary()
            ),
        }
    )
    rows = sample_video_frames(
        ray.data.from_arrow(tbl), every_n=2
    ).take_all()
    got = {(r["media_id"], r["frame_idx"]): (r["ts_ms"], r["luma"]) for r in rows}
    want = {}
    for mid, frames in clips.items():
        for f in range(0, frames.shape[0], 2):
            want[(mid, f)] = (f * 1000 // 10, frame_luma(frames[f]))
    assert got == want
