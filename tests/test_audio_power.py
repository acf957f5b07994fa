"""audio_power_windows: raw-decode parity, window math, partial-window
drop, and the 16-bit-only boundary."""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pytest


def _wav16(raw: np.ndarray, rate: int = 8000, channels: int = 1) -> bytes:
    pcm = raw.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_wav_raw_roundtrip():
    from uk_address_matcher_ray.stages.multimodal import decode_wav_raw

    raw = np.array([-32768, -1, 0, 1, 32767, 123], np.int64)
    rate, out = decode_wav_raw(_wav16(raw))
    assert rate == 8000
    assert out.shape == (6, 1)
    assert np.array_equal(out[:, 0], raw)
    with pytest.raises(NotImplementedError):
        # 8-bit PCM has no raw int16 domain
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", 4) + b"\x80\x80\x80\x80"
        decode_wav_raw(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_power_windows_semantics(ray_session):
    import ray

    from uk_address_matcher_ray.stages.multimodal import audio_power_windows

    # 2 full windows of 4 + a partial of 3 (dropped); second window silent
    raw = np.array([2, -2, 2, -2, 0, 0, 1, 0, 9, 9, 9], np.int64)
    tbl = pa.table(
        {
            "media_id": pa.array(["a1"], pa.string()),
            "payload": pa.array([_wav16(raw, rate=1000)], pa.binary()),
        }
    )
    rows = audio_power_windows(
        ray.data.from_arrow(tbl), window=4, silence_below=1
    ).take_all()
    got = {r["win_idx"]: (r["start_ms"], r["power"], r["silent"]) for r in rows}
    assert got == {0: (0, 4, False), 1: (4, 0, True)}


def test_power_uses_channel_zero(ray_session):
    import ray

    from uk_address_matcher_ray.stages.multimodal import audio_power_windows

    # stereo: ch0 = 3, ch1 = 100 — power must come from ch0 only
    inter = np.array([3, 100, 3, 100, 3, 100, 3, 100], np.int64)
    tbl = pa.table(
        {
            "media_id": pa.array(["s1"], pa.string()),
            "payload": pa.array([_wav16(inter, channels=2)], pa.binary()),
        }
    )
    rows = audio_power_windows(
        ray.data.from_arrow(tbl), window=4, silence_below=1
    ).take_all()
    assert len(rows) == 1 and rows[0]["power"] == 9


def test_resample_linear_matches_scalar_reference():
    import math

    from uk_address_matcher_ray.stages.multimodal import resample_linear

    raw = np.array([((5 * 31 + i * 17) % 4096) - 2048 for i in range(97)])
    for out_n in (97, 60, 13, 200):
        got = resample_linear(raw, out_n)
        n = len(raw)
        for i, g in enumerate(got):
            s = (i + 0.5) * (n / out_n) - 0.5
            sc = min(max(s, 0.0), float(n - 1))
            i0 = int(min(math.floor(sc), float(n - 2)))
            f = sc - i0
            v = (1 - f) * float(raw[i0]) + f * float(raw[i0 + 1])
            assert g == int(math.floor(v + 0.5)), (out_n, i)


def test_audio_resample_stage(ray_session):
    import ray

    from uk_address_matcher_ray.stages.multimodal import (
        audio_resample,
        resample_linear,
    )

    raw = np.arange(-100, 100, dtype=np.int64)
    tbl = pa.table(
        {
            "media_id": pa.array(["r1"], pa.string()),
            "payload": pa.array([_wav16(raw, rate=8000)], pa.binary()),
        }
    )
    rows = audio_resample(ray.data.from_arrow(tbl), out_rate=5000).take_all()
    assert rows[0]["out_rate"] == 5000
    want = resample_linear(raw, len(raw) * 5000 // 8000)
    assert rows[0]["samples"] == want.tolist()
