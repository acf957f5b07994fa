"""Multimodal (binary-column) stages: decode / feature-extract / resize /
frame-sample plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; each stage
is an actor-pool ``map_batches`` transform with real Ray-side plumbing
(schema, batch sizing, actor signature, output layout). The actual
image/audio decoders are NOT available in this container, so decode paths
are stubbed behind clearly-marked NotImplementedError / deterministic fakes
(per the driver brief) — swap ``_decode_image``/``_decode_audio`` for PIL /
soundfile implementations in a full environment.
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


def _decode_image(payload: bytes):
    """STUB: real implementation would be PIL.Image.open(BytesIO(payload)).
    No imaging library is available in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; not available in this container"
    )


def _decode_audio(payload: bytes):
    """STUB: real implementation would use soundfile/librosa."""
    raise NotImplementedError(
        "audio decode requires soundfile; not available in this container"
    )


def byte_histogram_counts(payload: Optional[bytes], dim: int = FEATURE_DIM):
    """Deterministic fake feature extractor: histogram of the payload's bytes
    folded into ``dim`` buckets, as EXACT integer counts (SQL-mirrorable —
    oracle_extras.media_features_sql). Stands in for a real model embedding
    so the distributed plumbing is fully exercised and oracle-checkable."""
    counts = [0] * dim
    if payload:
        for b in payload:
            counts[b % dim] += 1
    return counts


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
                decoded = (
                    _decode_image(p) if kind == "image" else _decode_audio(p)
                )
                feats.append(decoded)
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


def extract_media_features(ds, *, dim: int = FEATURE_DIM, concurrency: Optional[int] = None, batch_size: int = 64):
    """Small batches: payloads are large; batch_size × concurrency bounds
    worker heap (driver brief: memory-aware sizing for binary payloads)."""
    import ray

    if concurrency is None:
        concurrency = (1, max(2, int(ray.cluster_resources().get("CPU", 4)) - 2))
    return ds.map_batches(
        MediaFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"dim": dim},
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
