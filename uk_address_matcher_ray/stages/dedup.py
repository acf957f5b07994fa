"""Deduplication operators for large-scale text corpora (driver brief:
first-class components alongside the reference's operator inventory).

All operators are expressed as Dataset transforms:

* exact:   hash-partition on content hash -> per-group min-id survivor.
* minhash: shingle -> minhash signature (map_batches) -> LSH band bucket
           (flat_map) -> groupby(bucket) -> candidate pairs -> exact Jaccard
           verify inside the group -> global pair dedup.
* simhash: 64-bit signature; banded buckets; Hamming-verified pairs.
* ngram-Jaccard: exact Jaccard within LSH buckets (the verify step above).
* embedding near-dup: cosine >= threshold via blockwise numpy against a
  broadcast matrix (small side) — see stages/similarity.py for the ANN path.

Hashing primitives are mirrored in DuckDB SQL (functions/hashing.py) so the
driver's oracle can replay exact/minhash/fingerprint results.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

from uk_address_matcher_ray.functions import hashing as H

_WS_SPLIT = r"\s+"


def _tokens(text: Optional[str]) -> List[str]:
    import re

    if text is None:
        return []
    return [t for t in re.split(_WS_SPLIT, text.lower().strip()) if t]


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Survivors (min id per exact text hash) -> Dataset(doc_id)."""

    def key_batch(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        return pa.table(
            {
                "h": pa.array(
                    [H.h60(t or "") for t in texts], pa.int64()
                ),
                id_col: pa.array(ids, batch.schema.field(id_col).type),
            }
        )

    keyed = ds.map_batches(key_batch, batch_format="pyarrow")
    return (
        keyed.groupby("h")
        .min(id_col)
        .map_batches(
            lambda t: t.select([f"min({id_col})"]).rename_columns([id_col]),
            batch_format="pyarrow",
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup pairs
# ---------------------------------------------------------------------------

class MinHashStage:
    """map_batches: (id, text) -> one row per LSH band bucket.

    Each shingle is md5-hashed ONCE (h60); the ``num_perm`` permutation
    values derive from the universal hash (a_i*h + b_i) mod (2^31-1) —
    vectorized over the whole batch with one ``minimum.reduceat`` per
    permutation instead of num_perm md5 calls per shingle. The shuffle
    payload is the int64 shingle-hash list (for the exact-Jaccard verify
    inside the bucket group), ~15× smaller than the shingle strings the
    previous version shipped; at extreme scale swap the verify to a
    candidate-pair keyed fetch so only (bucket, id) rides the bucket
    shuffle (documented tradeoff)."""

    def __init__(self, id_col: str, text_col: str, num_perm: int, bands: int, shingle_k: int):
        self.id_col = id_col
        self.text_col = text_col
        self.num_perm = num_perm
        self.bands = bands
        self.shingle_k = shingle_k
        self.A, self.B = H.minhash_coeffs(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        doc_ids, doc_hashes, offsets = [], [], [0]
        for i, t in zip(ids, texts):
            toks = _tokens(t)
            if not toks:
                continue
            sh = sorted({H.h60(s) for s in H.shingles(toks, self.shingle_k)})
            doc_ids.append(i)
            doc_hashes.extend(sh)
            offsets.append(len(doc_hashes))
        if not doc_ids:
            return pa.table(
                {
                    "bucket": pa.array([], pa.string()),
                    self.id_col: pa.array([], batch.schema.field(self.id_col).type),
                    "hashes": pa.array([], pa.list_(pa.int64())),
                }
            )
        Hh = np.asarray(doc_hashes, dtype=np.uint64) % np.uint64(H.MINHASH_P)
        starts = np.asarray(offsets[:-1])
        sigs = np.empty((len(doc_ids), self.num_perm), dtype=np.int64)
        for p in range(self.num_perm):
            v = (np.uint64(self.A[p]) * Hh + np.uint64(self.B[p])) % np.uint64(
                H.MINHASH_P
            )
            sigs[:, p] = np.minimum.reduceat(v, starts).astype(np.int64)
        out_id, out_bucket, out_h = [], [], []
        for d, i in enumerate(doc_ids):
            hs = doc_hashes[offsets[d] : offsets[d + 1]]
            for bk in H.band_keys(sigs[d].tolist(), self.bands):
                out_id.append(i)
                out_bucket.append(bk)
                out_h.append(hs)
        return pa.table(
            {
                "bucket": pa.array(out_bucket, pa.string()),
                self.id_col: pa.array(out_id, batch.schema.field(self.id_col).type),
                "hashes": pa.array(out_h, pa.list_(pa.int64())),
            }
        )


def minhash_lsh_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
):
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    Candidates surface in any shared LSH bucket; exact shingle-set Jaccard
    verifies inside the bucket group; cross-bucket duplicates collapse in a
    final pair-keyed groupby.
    """
    import ray

    stage = MinHashStage(
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
    )
    keyed = ds.map_batches(stage, batch_format="pyarrow")

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        rows.sort(key=lambda r: r[id_col])
        sets = [set(r["hashes"]) for r in rows]
        out_a, out_b, out_j = [], [], []
        for x in range(len(rows)):
            sx = sets[x]
            for y in range(x + 1, len(rows)):
                if rows[x][id_col] == rows[y][id_col]:
                    continue
                sy = sets[y]
                inter = len(sx & sy)
                union = len(sx) + len(sy) - inter
                j = inter / union if union else 0.0
                if j >= jaccard_threshold:
                    out_a.append(rows[x][id_col])
                    out_b.append(rows[y][id_col])
                    out_j.append(j)
        t = group.schema.field(id_col).type
        return pa.table(
            {
                "id_a": pa.array(out_a, t),
                "id_b": pa.array(out_b, t),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    raw_pairs = keyed.groupby("bucket").map_groups(
        pairs_in_bucket, batch_format="pyarrow"
    )

    def dedup_pair_group(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    def add_pair_key(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_pylist()
        b = batch.column("id_b").to_pylist()
        return batch.append_column(
            "__pair", pa.array([f"{x}|{y}" for x, y in zip(a, b)], pa.string())
        )

    return (
        raw_pairs.map_batches(add_pair_key, batch_format="pyarrow")
        .groupby("__pair")
        .map_groups(dedup_pair_group, batch_format="pyarrow")
        .drop_columns(["__pair"])
    )


# ---------------------------------------------------------------------------
# SimHash near-dup pairs
# ---------------------------------------------------------------------------

def simhash_signatures(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Dataset(id, simhash:int64) — 64-bit signature per document.

    Token hashes are memoized per batch (web-text tokens repeat heavily) and
    the 64 bit-plane accumulations run as one numpy reduceat per batch
    instead of a per-token Python loop. Semantics identical to
    functions/hashing.simhash64 (asserted in tests) and mirrored in DuckDB
    (oracle_extras.simhash_sigs_sql)."""

    def sig_batch(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        memo: dict = {}
        tok_hashes, offsets = [], [0]
        for t in texts:
            for tok in _tokens(t):
                h = memo.get(tok)
                if h is None:
                    h = (H.h60(tok) << 4) | (H.h60("s|" + tok) & 0xF)
                    memo[tok] = h
                tok_hashes.append(h)
            offsets.append(len(tok_hashes))
        n = len(ids)
        sigs = np.zeros(n, dtype=np.uint64)
        if tok_hashes:
            hs = np.asarray(tok_hashes, dtype=np.uint64)
            shifts = np.arange(64, dtype=np.uint64)
            bits = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            contrib = bits * 2 - 1
            starts = np.asarray(offsets[:-1])
            # token-less docs give repeated/out-of-range start indices:
            # clip for reduceat, then zero their rows explicitly
            acc = np.add.reduceat(
                contrib, np.minimum(starts, len(contrib) - 1), axis=0
            )
            empty = np.asarray(offsets[1:]) == starts
            acc[empty] = 0
            pows = np.left_shift(np.uint64(1), shifts)
            sigs = ((acc > 0).astype(np.uint64) * pows).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {
                id_col: pa.array(ids, batch.schema.field(id_col).type),
                "simhash": pa.array(sigs.view(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(sig_batch, batch_format="pyarrow")


def simhash_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
):
    """Pairs with Hamming(simhash) <= max_hamming, via banded bucketing
    (a pair within distance d shares at least one of ``bands`` bands when
    d < bands)."""
    sigs = simhash_signatures(ds, id_col, text_col)
    width = 64 // bands

    def emit_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        ss = batch.column("simhash").to_pylist()
        out_id, out_sig, out_bucket = [], [], []
        for i, s in zip(ids, ss):
            u = s & ((1 << 64) - 1)
            for b in range(bands):
                chunk = (u >> (b * width)) & ((1 << width) - 1)
                out_id.append(i)
                out_sig.append(s)
                out_bucket.append(f"{b}|{chunk:x}")
        return pa.table(
            {
                "bucket": pa.array(out_bucket, pa.string()),
                id_col: pa.array(out_id, batch.schema.field(id_col).type),
                "simhash": pa.array(out_sig, pa.int64()),
            }
        )

    keyed = sigs.map_batches(emit_bands, batch_format="pyarrow")

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        rows.sort(key=lambda r: r[id_col])
        out_a, out_b, out_d = [], [], []
        for x in range(len(rows)):
            for y in range(x + 1, len(rows)):
                if rows[x][id_col] == rows[y][id_col]:
                    continue
                d = bin((rows[x]["simhash"] ^ rows[y]["simhash"]) & ((1 << 64) - 1)).count("1")
                if d <= max_hamming:
                    out_a.append(rows[x][id_col])
                    out_b.append(rows[y][id_col])
                    out_d.append(d)
        t = group.schema.field(id_col).type
        return pa.table(
            {
                "id_a": pa.array(out_a, t),
                "id_b": pa.array(out_b, t),
                "hamming": pa.array(out_d, pa.int32()),
            }
        )

    raw = keyed.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pyarrow")

    def add_pair_key(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_pylist()
        b = batch.column("id_b").to_pylist()
        return batch.append_column(
            "__pair", pa.array([f"{x}|{y}" for x, y in zip(a, b)], pa.string())
        )

    return (
        raw.map_batches(add_pair_key, batch_format="pyarrow")
        .groupby("__pair")
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .drop_columns(["__pair"])
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def _vectors_from_table(tbl: pa.Table, vec_col: str):
    """list<float> column -> (n, d) float64 numpy, via the flat values buffer
    (no per-row Python lists)."""
    import numpy as np

    col = tbl.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    if n == 0:
        return np.zeros((0, 0))
    d = len(flat) // n
    return flat.reshape(n, d)


def embedding_near_dup_pairs(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_rows: int = 8192,
):
    """All pairs with cosine >= threshold — EXACT, with no driver-side
    materialization and no whole-corpus broadcast.

    Vectors are L2-normalized into ~``block_rows``-row Arrow blocks that stay
    in the object store; one Ray task per unordered block pair computes the
    (block × block) matmul and emits qualifying (id_a < id_b) pairs. Compute
    is the unavoidable O(N²/2) of an exact all-pairs operator, but memory is
    O(block²) per task and blocks ship peer-to-peer — at cluster scale the
    B(B+1)/2 tasks spread across nodes. For approximate near-dup at corpus
    scale use the IVF route (stages/similarity.py) or simhash/minhash.
    """
    import numpy as np
    import ray

    def normalize(batch: pa.Table) -> pa.Table:
        mat = _vectors_from_table(batch, vec_col)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        matn = mat / norms[:, None]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "__vn": pa.array(list(matn), pa.list_(pa.float64())),
            }
        )

    norm_ds = (
        ds.select_columns([id_col, vec_col])
        .map_batches(normalize, batch_format="pyarrow", batch_size=block_rows)
        .materialize()
    )
    refs = norm_ds.to_arrow_refs()
    id_type = None
    for n, t in zip(norm_ds.schema().names, norm_ds.schema().types):
        if n == id_col:
            id_type = t

    empty_schema = pa.schema(
        [
            pa.field("id_a", id_type),
            pa.field("id_b", id_type),
            pa.field("cosine", pa.float64()),
        ]
    )

    @ray.remote
    def block_pair(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        ids_a = np.asarray(ta.column(id_col).to_pylist())
        ids_b = np.asarray(tb.column(id_col).to_pylist())
        if len(ids_a) == 0 or len(ids_b) == 0:
            return empty_schema.empty_table()
        A = _vectors_from_table(ta, "__vn")
        B = _vectors_from_table(tb, "__vn")
        sims = A @ B.T
        mask = sims >= threshold
        if same:
            mask &= ids_a[:, None] < ids_b[None, :]
        ii, jj = np.nonzero(mask)
        lo = np.minimum(ids_a[ii], ids_b[jj])
        hi = np.maximum(ids_a[ii], ids_b[jj])
        return pa.table(
            {
                "id_a": pa.array(lo.tolist(), id_type),
                "id_b": pa.array(hi.tolist(), id_type),
                "cosine": pa.array(sims[ii, jj], pa.float64()),
            }
        )

    # one task per unordered block pair: each unordered id pair meets once
    out_refs = [
        block_pair.remote(refs[i], refs[j], i == j)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    return ray.data.from_arrow_refs(out_refs)
