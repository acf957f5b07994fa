"""Perceptual image hashing (dHash) + image near-dup pairs.

The image-side analogue of text simhash dedup: decode → 64-bit
difference hash → banded-Hamming pair join.  Web-crawl image dedup
(thumbnails, re-encodes, brightness tweaks) is hash-based for the same
reason text dedup is — pairwise pixel comparison cannot scale, a
64-bit signature exchange can.

dHash spec (fixed, integer-exact — every step has a DuckDB twin so the
driver oracle can recompute it from synthesized pixel formulas):

1. grayscale: ``(299*R + 587*G + 114*B) // 1000`` per pixel (integer
   floor; the ITU-R 601 luma weights scaled to ints),
2. 8x9 cell partition by index arithmetic: pixel (py, px) belongs to
   cell ``(py*8 // h, px*9 // w)`` — near-equal integer blocks at any
   resolution (requires h >= 8 and w >= 9),
3. per-cell mean ``sum // count`` (integer floor),
4. bit(y, x) = 1 iff ``m[y][x] > m[y][x+1]`` for x in 0..7 — 64 bits of
   horizontal-gradient sign, index ``y*8 + x``,
5. dhash = the uint64 with those bits set.

Gradient signs are invariant to global brightness/contrast shifts, so
re-encoded and mildly edited copies land within a few bits; the pair
join is ``stages/dedup.hamming_pairs`` (banded pigeonhole — EXACT for
``max_hamming < bands`` — hot-bucket grid salting, fixed-size exchange
rows).

Scale shape: the decode+hash pass is row-local ``map_batches`` (an
actor pool when the decoder family warrants per-process state); only
(id, 8-byte dhash) leaves the task — the image bytes never ride a
shuffle.  The reference engine has no image surface; this is
LLM-pipeline surface (brief: multimodal dedup).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from uk_address_matcher_ray.stages.dedup import hamming_pairs
from uk_address_matcher_ray.stages.multimodal import _decode_image

DHASH_ROWS = 8  # cell grid height (bits rows)
DHASH_COLS = 9  # cell grid width (8 horizontal diffs per row)


def dhash64(img) -> int:
    """64-bit dHash of an HxWx3 (or HxW gray) uint8 array — the module
    docstring's integer-exact spec."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[:, :, None].repeat(3, axis=2)
    h, w = a.shape[0], a.shape[1]
    if h < DHASH_ROWS or w < DHASH_COLS:
        raise ValueError(f"dhash needs h>={DHASH_ROWS}, w>={DHASH_COLS}; got {h}x{w}")
    px = a.astype(np.int64)
    gray = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
    cy = (np.arange(h, dtype=np.int64) * DHASH_ROWS) // h
    cx = (np.arange(w, dtype=np.int64) * DHASH_COLS) // w
    cell = (cy[:, None] * DHASH_COLS + cx[None, :]).ravel()
    n_cells = DHASH_ROWS * DHASH_COLS
    sums = np.bincount(cell, weights=gray.ravel(), minlength=n_cells)
    counts = np.bincount(cell, minlength=n_cells)
    m = (sums.astype(np.int64) // counts).reshape(DHASH_ROWS, DHASH_COLS)
    bits = (m[:, :-1] > m[:, 1:]).ravel()  # row-major: idx = y*8 + x
    return int(np.sum(bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)))


def image_dhash(
    ds,
    id_col: str = "media_id",
    payload_col: str = "payload",
):
    """Dataset(id, dhash:uint64) — decode each image payload (BMP / PPM /
    JPEG / PNG / TIFF / GIF via the multimodal decoder registry) and emit
    its 64-bit dHash.  Row-local; output rows are 8 bytes + id."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        payloads = batch.column(payload_col).to_pylist()
        sigs = np.fromiter(
            (dhash64(_decode_image(p)) for p in payloads),
            dtype=np.uint64,
            count=len(payloads),
        )
        return pa.table(
            {
                id_col: ids,
                "dhash": pa.array(sigs, pa.uint64()),
            }
        )

    return ds.map_batches(hash_batch, batch_format="pyarrow")


def image_near_dup_pairs(
    ds,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    bands: int = 4,
    hot_bucket_rows: int = 4096,
):
    """All image pairs whose dHash Hamming distance <= max_hamming —
    decode → dhash → banded join, sharing dedup.hamming_pairs' exactness
    guarantee and hot-bucket salting."""
    sigs = image_dhash(ds, id_col=id_col, payload_col=payload_col)
    return hamming_pairs(
        sigs,
        id_col=id_col,
        sig_col="dhash",
        max_hamming=max_hamming,
        bands=bands,
        hot_bucket_rows=hot_bucket_rows,
    )
