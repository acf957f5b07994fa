"""Multimodal (binary-column) stages: decode / feature-extract / resize /
frame-sample plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; each stage
is an actor-pool ``map_batches`` transform with real Ray-side plumbing
(schema, batch sizing, actor signature, output layout).

Decoders: self-describing uncompressed formats decode for REAL with pure
numpy — WAV (RIFF PCM 8/16-bit and IEEE float32), BMP (BITMAPINFOHEADER
8-bit paletted / 24 / 32-bit), and PPM/PGM (P5/P6 binary) — so the decode →
feature path runs end-to-end in this container. Compressed codecs (JPEG /
PNG / MP3 / video) require external libraries that are NOT available here;
those magics raise a clearly-marked NotImplementedError documenting the
PIL / soundfile integration point.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

FEATURE_DIM = 16

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("content_type", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)


def decode_bmp(payload: bytes):
    """BMP (BITMAPINFOHEADER, uncompressed) -> HxWx3 uint8 numpy array.

    Supports 24/32-bit BGR(A) and 8-bit paletted; rows are bottom-up
    (positive height) or top-down (negative), 4-byte aligned."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise NotImplementedError("compressed BMP (RLE/bitfields) not supported")
    top_down = h < 0
    h = abs(h)
    stride = (w * bpp // 8 + 3) & ~3
    px = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = px.reshape(h, stride)
    if bpp == 24:
        img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    elif bpp == 32:
        img = rows[:, : w * 4].reshape(h, w, 4)[:, :, [2, 1, 0]]
    elif bpp == 8:
        ncolors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=4 * ncolors, offset=14 + hdr_size
        ).reshape(ncolors, 4)[:, [2, 1, 0]]  # BGRX -> RGB
        img = pal[rows[:, :w]]
    else:
        raise NotImplementedError(f"BMP bpp={bpp} not supported")
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def decode_ppm(payload: bytes):
    """Binary PPM (P6) / PGM (P5) -> HxWx3 (or HxW) uint8 numpy array."""
    import numpy as np

    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    ch = 3 if magic == b"P6" else 1
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=pos)
    return arr.reshape(h, w, 3) if ch == 3 else arr.reshape(h, w)


def _wav_fmt_data(payload: bytes):
    """RIFF chunk walk -> (fmt tuple, data bytes)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return fmt, data


def decode_wav_raw(payload: bytes):
    """WAV (16-bit PCM only) -> (sample_rate, int64 array (frames, channels))
    of the RAW quantized sample values — the integer domain the windowed
    power operator (audio_power_windows) and its SQL oracle share."""
    import numpy as np

    fmt, data = _wav_fmt_data(payload)
    audio_fmt, channels, rate, _byte_rate, _align, bits = fmt
    if not (audio_fmt == 1 and bits == 16):
        raise NotImplementedError("raw sample access is 16-bit PCM only")
    x = np.frombuffer(data, dtype="<i2").astype(np.int64)
    frames = len(x) // channels
    return rate, x[: frames * channels].reshape(frames, channels)


def decode_wav(payload: bytes):
    """WAV (RIFF) -> (sample_rate, float64 array shaped (frames, channels)).

    PCM 8-bit (unsigned), 16-bit (signed) and IEEE float32; samples
    normalized to [-1, 1] with the usual conventions."""
    import numpy as np

    fmt, data = _wav_fmt_data(payload)
    audio_fmt, channels, rate, _byte_rate, _align, bits = fmt
    if audio_fmt == 1 and bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(data, dtype="<f4").astype(np.float64)
    else:
        raise NotImplementedError(
            f"WAV format={audio_fmt} bits={bits} not supported"
        )
    frames = len(x) // channels
    return rate, x[: frames * channels].reshape(frames, channels)


def _decode_image(payload: bytes):
    """Image decode: real for BMP, PPM/PGM, baseline JPEG (functions/jpeg.py
    — pure-numpy Huffman + IDCT + subsampling + restart markers) and PNG
    (functions/png.py — stdlib-zlib inflate + filter reconstruction).
    Remaining codecs (WebP/TIFF/GIF) raise to document the boundary."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"P5", b"P6"):
        return decode_ppm(payload)
    if payload[:2] == b"\xff\xd8":
        from uk_address_matcher_ray.functions.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from uk_address_matcher_ray.functions.png import decode_png

        return decode_png(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from uk_address_matcher_ray.functions.tiff import decode_tiff

        return decode_tiff(payload)
    if payload[:4] == b"GIF8":
        from uk_address_matcher_ray.functions.gif import decode_gif

        return decode_gif(payload)
    raise NotImplementedError(
        "BMP/PPM/baseline-JPEG/PNG/TIFF(none+LZW+PackBits)/GIF decode in "
        "this container; other image codecs (WebP, JPEG-in-TIFF) remain "
        "integration points"
    )


def _decode_audio(payload: bytes):
    """Audio decode: real for RIFF/WAVE PCM + float32 (pure numpy).
    Compressed codecs (MP3/OGG/FLAC) need soundfile/librosa — NOT in this
    container; those magics raise to document the integration point."""
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        "only WAV decode in this container; compressed audio requires soundfile"
    )


def resize_nearest(img, out_h: int, out_w: int):
    """Deterministic nearest-neighbor resize of an HxW[xC] uint8 array —
    index-arithmetic only (no interpolation library)."""
    import numpy as np

    h, w = img.shape[0], img.shape[1]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return img[ri][:, ci]


def resize_bilinear(img, out_h: int, out_w: int):
    """Deterministic bilinear resize of an HxW[xC] uint8 array (half-pixel
    centers, edge-clamped) — the standard training-data image resize.

    Exactness contract (the DuckDB oracle restates each line verbatim, so
    resized pixels are bit-identical doubles before the final round):

        s   = (i + 0.5) * (in / out) - 0.5          # source coordinate
        sc  = min(max(s, 0.0), in - 1)               # edge clamp
        i0  = min(floor(sc), in - 2)  (as int)       # left/top neighbor
        f   = sc - i0                                # fractional weight
        t1  = (1 - fx) * v00 + fx * v01
        t2  = (1 - fx) * v10 + fx * v11
        v   = (1 - fy) * t1 + fy * t2
        out = min(255, max(0, floor(v + 0.5)))

    Every step is one IEEE-double op evaluated in this exact association
    on both engines. Requires in_h >= 2 and in_w >= 2 (use resize_nearest
    for degenerate strips)."""
    import numpy as np

    a = np.asarray(img)
    h, w = a.shape[0], a.shape[1]
    if h < 2 or w < 2:
        raise ValueError(f"bilinear needs h>=2 and w>=2, got {h}x{w}")
    squeeze = a.ndim == 2
    if squeeze:
        a = a[:, :, None]
    sy = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
    sx = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
    syc = np.minimum(np.maximum(sy, 0.0), float(h - 1))
    sxc = np.minimum(np.maximum(sx, 0.0), float(w - 1))
    y0 = np.minimum(np.floor(syc), float(h - 2)).astype(np.int64)
    x0 = np.minimum(np.floor(sxc), float(w - 2)).astype(np.int64)
    fy = (syc - y0)[:, None, None]
    fx = (sxc - x0)[None, :, None]
    af = a.astype(np.float64)
    v00 = af[np.ix_(y0, x0)]
    v01 = af[np.ix_(y0, x0 + 1)]
    v10 = af[np.ix_(y0 + 1, x0)]
    v11 = af[np.ix_(y0 + 1, x0 + 1)]
    t1 = (1.0 - fx) * v00 + fx * v01
    t2 = (1.0 - fx) * v10 + fx * v11
    v = (1.0 - fy) * t1 + fy * t2
    out = np.minimum(255.0, np.maximum(0.0, np.floor(v + 0.5))).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def image_grid_features(img, grid: int = 4):
    """gridxgrid mean-brightness features (row-major, floats in [0, 1]).

    Each feature is the mean over ALL channel values in the cell computed as
    ONE exact integer sum divided once — (sum / count) / 255 — so a SQL
    oracle (SUM(v)/count/255.0) reproduces identical doubles (a per-pixel
    luma mean first would introduce order-dependent rounding)."""
    import numpy as np

    a = np.asarray(img, dtype=np.int64)
    h, w = a.shape[0], a.shape[1]
    rs = (np.arange(grid + 1) * h) // grid
    cs = (np.arange(grid + 1) * w) // grid
    out = []
    for i in range(grid):
        for j in range(grid):
            cell = a[
                rs[i] : max(rs[i + 1], rs[i] + 1),
                cs[j] : max(cs[j + 1], cs[j] + 1),
            ]
            out.append(float(int(cell.sum())) / cell.size / 255.0)
    return out


def audio_band_features(samples, n_bands: int = FEATURE_DIM):
    """Per-band RMS energy over ``n_bands`` equal time slices of the mono
    mix — deterministic numpy reductions only."""
    import numpy as np

    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n == 0:
        return [0.0] * n_bands
    edges = (np.arange(n_bands + 1) * n) // n_bands
    out = []
    for i in range(n_bands):
        seg = mono[edges[i] : max(edges[i + 1], edges[i] + 1)]
        out.append(float(np.sqrt(np.mean(seg * seg))))
    return out


def byte_histogram_counts(payload: Optional[bytes], dim: int = FEATURE_DIM):
    """Deterministic fake feature extractor: histogram of the payload's bytes
    folded into ``dim`` buckets, as EXACT integer counts (SQL-mirrorable —
    oracle_extras.media_features_sql). Stands in for a real model embedding
    so the distributed plumbing is fully exercised and oracle-checkable."""
    import numpy as np

    if not payload:
        return [0] * dim
    buf = np.frombuffer(payload, dtype=np.uint8)
    # exact integer counts (bincount == the per-byte loop), vectorized
    return np.bincount(buf % dim, minlength=dim).astype(np.int64).tolist()


def byte_histogram_features(payload: Optional[bytes], dim: int = FEATURE_DIM):
    """Normalized float variant of ``byte_histogram_counts``."""
    counts = byte_histogram_counts(payload, dim)
    n = sum(counts)
    if n == 0:
        return [0.0] * dim
    return [round(c / n, 8) for c in counts]


class MediaFeatureStage:
    """Actor-pool stage: (media_id, payload) -> (media_id, features).

    ``use_real_decoder=True`` routes through the stubbed decoders (raises in
    this container — documents the integration point)."""

    def __init__(self, dim: int = FEATURE_DIM, use_real_decoder: bool = False):
        self.dim = dim
        self.use_real_decoder = use_real_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = (
            batch.column("kind").to_pylist()
            if "kind" in batch.column_names
            else ["image"] * len(ids)
        )
        payloads = batch.column("payload").to_pylist()
        feats = []
        hists = []
        for kind, p in zip(kinds, payloads):
            if self.use_real_decoder:
                if kind == "image":
                    img = resize_nearest(_decode_image(p), 16, 16)
                    grid = max(1, int(self.dim**0.5))
                    feats.append(image_grid_features(img, grid))
                else:
                    _rate, samples = _decode_audio(p)
                    feats.append(audio_band_features(samples, self.dim))
                hists.append(None)
            else:
                counts = byte_histogram_counts(p, self.dim)
                hists.append(counts)
                n = sum(counts)
                feats.append(
                    [round(c / n, 8) for c in counts] if n else [0.0] * self.dim
                )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "features": pa.array(feats, pa.list_(pa.float64())),
                "byte_hist": pa.array(hists, pa.list_(pa.int64())),
            }
        )


def extract_media_features(
    ds,
    *,
    dim: int = FEATURE_DIM,
    concurrency: Optional[int] = None,
    batch_size: int = 64,
    use_real_decoder: bool = False,
):
    """Small batches: payloads are large; batch_size × concurrency bounds
    worker heap (driver brief: memory-aware sizing for binary payloads).
    ``use_real_decoder=True`` decodes BMP/PPM/WAV payloads for real (pure
    numpy) and featurizes the decoded media; other codecs raise."""
    from uk_address_matcher_ray import util

    if isinstance(concurrency, tuple):
        # actor-pool (min, max) sizing from callers predating the
        # task-based conversion: tasks take a flat cap
        concurrency = concurrency[1]

    def feats(batch: pa.Table) -> pa.Table:
        st = util.memo_stage(
            ("media_feats", dim, use_real_decoder),
            lambda: MediaFeatureStage(dim, use_real_decoder),
        )
        return st(batch)

    return ds.map_batches(
        feats,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(ds, every_ms: int = 1000):
    """Video frame-sampling plumbing: emits (media_id, frame_idx, ts_ms) rows
    based on duration metadata; the frame DECODE itself is the stubbed step."""

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        durs = batch.column("duration_ms").to_pylist()
        out_id, out_idx, out_ts = [], [], []
        for i, d in zip(ids, durs):
            n = max(1, (d or 0) // every_ms)
            for f in range(n):
                out_id.append(i)
                out_idx.append(f)
                out_ts.append(f * every_ms)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.string()),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "ts_ms": pa.array(out_ts, pa.int32()),
            }
        )

    return ds.map_batches(emit, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Raw video container (RAWV) — real frame decode + sampling
# ---------------------------------------------------------------------------
#
# Container codecs (MP4/H.264, WebM/VP9, AVI/MJPEG) need ffmpeg — NOT in
# this container; their magics raise below to document the integration
# point. The engine-side semantics (frame indexing, stride sampling,
# timestamping, per-frame feature reduction, output layout) are REAL and
# exercised end-to-end over RAWV, a trivial uncompressed interchange
# format:
#
#   bytes 0-3   b"RAWV"
#   bytes 4-5   width  (uint16 LE)
#   bytes 6-7   height (uint16 LE)
#   bytes 8-9   n_frames (uint16 LE)
#   bytes 10-11 fps (uint16 LE)
#   bytes 12-   n_frames RGB24 frames, row-major, tightly packed

RAWV_MAGIC = b"RAWV"


def encode_rawv(frames, fps: int) -> bytes:
    """frames: (n, h, w, 3) uint8 -> RAWV payload (tests + synthesis)."""
    import struct

    import numpy as np

    a = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, _ = a.shape
    return RAWV_MAGIC + struct.pack("<HHHH", w, h, n, fps) + a.tobytes()


def decode_rawv(payload: bytes):
    """RAWV payload -> ((n, h, w, 3) uint8 frames, fps)."""
    import struct

    import numpy as np

    if payload[:4] != RAWV_MAGIC:
        raise ValueError("not a RAWV payload")
    w, h, n, fps = struct.unpack("<HHHH", payload[4:12])
    want = 12 + n * h * w * 3
    if len(payload) != want:
        raise ValueError(f"RAWV size mismatch: {len(payload)} != {want}")
    frames = np.frombuffer(payload, np.uint8, offset=12).reshape(n, h, w, 3)
    return frames, fps


def _decode_video(payload: bytes):
    if payload[:4] == RAWV_MAGIC:
        return decode_rawv(payload)
    raise NotImplementedError(
        "only RAWV frame decode in this container; MP4/WebM/AVI require ffmpeg"
    )


def frame_luma(frame) -> int:
    """Integer mean luma of one (h, w, 3) frame — the per-frame feature the
    driver oracle recomputes: sum over pixels of (299R + 587G + 114B)//1000,
    then // (h*w). Integer floor at both steps (DuckDB-exact)."""
    import numpy as np

    px = np.asarray(frame, dtype=np.int64)
    gray = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
    return int(gray.sum() // (px.shape[0] * px.shape[1]))


def sample_video_frames(
    ds,
    id_col: str = "media_id",
    payload_col: str = "payload",
    every_n: int = 2,
):
    """REAL video frame sampling: decode each RAWV payload in the task,
    keep every ``every_n``-th frame, emit (id, frame_idx, ts_ms, luma) —
    one skinny row per sampled frame; the frame pixels never leave the
    task. ts_ms = frame_idx * 1000 // fps (integer).

    Scale shape: row-local map_batches over opaque binary payloads — the
    decode fans out horizontally and the output is metadata-sized. With a
    real codec this exact stage body holds; only _decode_video's registry
    gains an ffmpeg-backed entry (documented NotImplementedError today)."""

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        payloads = batch.column(payload_col).to_pylist()
        out_id, out_idx, out_ts, out_luma = [], [], [], []
        for mid, payload in zip(ids, payloads):
            frames, fps = _decode_video(payload)
            for f in range(0, frames.shape[0], every_n):
                out_id.append(mid)
                out_idx.append(f)
                out_ts.append(f * 1000 // fps)
                out_luma.append(frame_luma(frames[f]))
        return pa.table(
            {
                id_col: pa.array(out_id, pa.string()),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "ts_ms": pa.array(out_ts, pa.int32()),
                "luma": pa.array(out_luma, pa.int64()),
            }
        )

    return ds.map_batches(emit, batch_format="pyarrow")


def audio_power_windows(
    ds,
    id_col: str = "media_id",
    payload_col: str = "payload",
    window: int = 256,
    silence_below: int = 1000,
):
    """Windowed audio power + silence flags — the segmentation primitive
    speech/VAD pipelines run before transcription or silence trimming.

    Operates in the RAW int16 sample domain (decode_wav_raw) so every
    number is integer-exact and the DuckDB oracle recomputes it from the
    synthesis formula:

        power(win)  = sum(s^2 for s in window) // window      (channel 0)
        silent(win) = power < silence_below
        start_ms    = win_idx * window * 1000 // rate

    Only full windows are emitted (trailing partial dropped — stated by
    the oracle too). Row-local map_batches over opaque payloads; output
    rows are 4 ints + a bool per window, the samples never leave the
    task. Compressed codecs raise in decode (documented boundary)."""
    import numpy as np

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        payloads = batch.column(payload_col).to_pylist()
        out_id, out_idx, out_ms, out_pow, out_sil = [], [], [], [], []
        for mid, payload in zip(ids, payloads):
            rate, samples = decode_wav_raw(payload)
            ch0 = samples[:, 0]
            n_win = len(ch0) // window
            if n_win == 0:
                continue
            trimmed = ch0[: n_win * window].reshape(n_win, window)
            power = (trimmed * trimmed).sum(axis=1) // window
            for i in range(n_win):
                out_id.append(mid)
                out_idx.append(i)
                out_ms.append(i * window * 1000 // rate)
                out_pow.append(int(power[i]))
                out_sil.append(bool(power[i] < silence_below))
        return pa.table(
            {
                id_col: pa.array(out_id, pa.string()),
                "win_idx": pa.array(out_idx, pa.int32()),
                "start_ms": pa.array(out_ms, pa.int32()),
                "power": pa.array(out_pow, pa.int64()),
                "silent": pa.array(out_sil, pa.bool_()),
            }
        )

    return ds.map_batches(emit, batch_format="pyarrow")


def resample_linear(samples, out_n: int):
    """Deterministic 1-D linear resample (half-sample centers, edge
    clamped) — the audio analogue of resize_bilinear, sharing its IEEE
    expression contract so the DuckDB oracle restates it line by line:

        s  = (i + 0.5) * (n / out_n) - 0.5
        sc = min(max(s, 0.0), n - 1)
        i0 = min(floor(sc), n - 2)  (as int)
        f  = sc - i0
        v  = (1 - f) * v0 + f * v1
        out = floor(v + 0.5)  (as int)

    ``samples``: 1-D int array (raw 16-bit PCM domain). Requires n >= 2."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    n = len(x)
    if n < 2:
        raise ValueError("linear resample needs at least 2 samples")
    s = (np.arange(out_n, dtype=np.float64) + 0.5) * (n / out_n) - 0.5
    sc = np.minimum(np.maximum(s, 0.0), float(n - 1))
    i0 = np.minimum(np.floor(sc), float(n - 2)).astype(np.int64)
    f = sc - i0
    v = (1.0 - f) * x[i0] + f * x[i0 + 1]
    return np.floor(v + 0.5).astype(np.int64)


def audio_resample(
    ds,
    out_rate: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
):
    """Resample each 16-bit PCM payload's channel 0 to ``out_rate`` —
    the sample-rate normalization pass in front of any audio model
    (Whisper-style pipelines resample everything to one rate first).

    out_n = n * out_rate // in_rate (integer); values stay in the raw
    int16 domain via the resample_linear contract. Row-local; emits
    (id, out_rate, samples list<int32>)."""
    import numpy as np

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        payloads = batch.column(payload_col).to_pylist()
        out_id, out_samp = [], []
        for mid, payload in zip(ids, payloads):
            rate, samples = decode_wav_raw(payload)
            ch0 = samples[:, 0]
            out_n = len(ch0) * out_rate // rate
            res = resample_linear(ch0, out_n)
            out_id.append(mid)
            out_samp.append(res.astype(np.int32).tolist())
        return pa.table(
            {
                id_col: pa.array(out_id, pa.string()),
                "out_rate": pa.array([out_rate] * len(out_id), pa.int32()),
                "samples": pa.array(out_samp, pa.list_(pa.int32())),
            }
        )

    return ds.map_batches(emit, batch_format="pyarrow")
