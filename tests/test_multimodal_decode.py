"""Real pure-numpy media decoders: WAV / BMP / PPM round-trip against
hand-encoded payloads, plus the actor-pool decode->feature stage."""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages import multimodal as mm


def encode_bmp24(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> uncompressed 24-bit bottom-up BMP."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
    return header + info + data


def encode_bmp8(img: np.ndarray, palette: np.ndarray) -> bytes:
    """HxW uint8 index array + 256x3 RGB palette -> 8-bit paletted BMP."""
    h, w = img.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = img[::-1]
    data = rows.tobytes()
    pal = np.zeros((256, 4), dtype=np.uint8)
    pal[: len(palette), :3] = palette[:, ::-1]  # RGB -> BGRX
    off = 14 + 40 + 1024
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(data), 0, 0, 256, 0
    )
    return header + info + pal.tobytes() + data


def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return f"P6\n# comment\n{w} {h}\n255\n".encode() + img.tobytes()


def encode_wav16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """(frames, channels) float in [-1,1) -> 16-bit PCM WAV."""
    ch = samples.shape[1]
    pcm = np.clip(samples * 32768.0, -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_bmp24_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert np.array_equal(mm.decode_bmp(encode_bmp24(img)), img)


def test_bmp8_palette_roundtrip():
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 16, size=(6, 5), dtype=np.uint8)
    palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    out = mm.decode_bmp(encode_bmp8(idx, palette))
    assert np.array_equal(out, palette[idx])


def test_ppm_roundtrip():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(4, 9, 3), dtype=np.uint8)
    assert np.array_equal(mm.decode_ppm(encode_ppm(img)), img)


def test_wav16_roundtrip():
    t = np.arange(64) / 64.0
    samples = np.stack([np.sin(2 * np.pi * t), np.cos(2 * np.pi * t)], axis=1)
    rate, out = mm.decode_wav(encode_wav16(samples, rate=16000))
    assert rate == 16000
    assert out.shape == (64, 2)
    assert np.max(np.abs(out - samples)) < 1e-3  # 16-bit quantization


def test_wav_float32_roundtrip():
    x = (np.linspace(-1, 1, 32)).astype("<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", x.nbytes) + x.tobytes()
    rate, out = mm.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert rate == 8000
    assert np.allclose(out[:, 0], x.astype(np.float64))


def test_unsupported_codecs_raise():
    # JPEG and PNG are now real decoders (functions/jpeg.py, png.py);
    # truncated payloads are ValueErrors, unknown magics stay stubs
    with pytest.raises(NotImplementedError):
        mm._decode_image(b"RIFF....WEBPwebpish")
    with pytest.raises(ValueError):
        mm._decode_image(b"\xff\xd8\xff\xe0jpegish")
    with pytest.raises(ValueError):
        mm._decode_image(b"\x89PNG\r\n\x1a\npngish")
    with pytest.raises(NotImplementedError):
        mm._decode_audio(b"ID3\x03mp3ish")


def test_resize_and_grid_features():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:4, :4] = 255  # bright top-left quadrant
    small = mm.resize_nearest(img, 4, 4)
    assert small.shape == (4, 4, 3)
    feats = mm.image_grid_features(img, 2)
    assert feats == [1.0, 0.0, 0.0, 0.0]


def test_audio_band_features():
    loud = np.ones(100)
    quiet = np.zeros(100)
    feats = mm.audio_band_features(np.concatenate([loud, quiet]), 2)
    assert feats[0] == pytest.approx(1.0)
    assert feats[1] == pytest.approx(0.0)


@pytest.mark.usefixtures("ray_session")
def test_real_decode_feature_stage():
    import ray

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(10, 10, 3), dtype=np.uint8)
    t = np.arange(256) / 256.0
    wav = np.sin(2 * np.pi * 5 * t)[:, None]
    tbl = pa.table(
        {
            "media_id": pa.array(["img1", "wav1"], pa.string()),
            "kind": pa.array(["image", "audio"], pa.string()),
            "payload": pa.array(
                [encode_bmp24(img), encode_wav16(wav)], pa.binary()
            ),
        }
    )
    out = (
        mm.extract_media_features(
            ray.data.from_arrow(tbl), use_real_decoder=True, concurrency=(1, 2)
        )
        .take_all()
    )
    by_id = {r["media_id"]: r["features"] for r in out}
    expected_img = mm.image_grid_features(mm.resize_nearest(img, 16, 16), 4)
    expected_wav = mm.audio_band_features(
        mm.decode_wav(encode_wav16(wav))[1], 16
    )
    assert by_id["img1"] == pytest.approx(expected_img)
    assert by_id["wav1"] == pytest.approx(expected_wav)
