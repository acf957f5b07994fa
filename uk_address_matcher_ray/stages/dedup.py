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

from typing import Dict, List, Optional

import pyarrow as pa

from uk_address_matcher_ray.functions import hashing as H

_WS_SPLIT = r"\s+"


def _tokens(text: Optional[str]) -> List[str]:
    import re

    if text is None:
        return []
    return [t for t in re.split(_WS_SPLIT, text.lower().strip()) if t]


def flat_tokens(texts):
    """Vectorized ``_tokens`` over a string array -> (parents: int64
    ndarray, tokens: pa.StringArray), intra-row order preserved.

    Arrow kernels (lower / trim / RE2 whitespace split / flatten) handle
    every row made of printable ASCII + the six basic whitespace chars;
    rows containing anything else (Unicode whitespace like U+001C or
    U+00A0, non-ASCII letters whose utf8proc lower can differ from
    CPython's) fall back to the scalar ``_tokens`` — the clean_vec
    precedent, bit-identical by construction (differential-tested in
    tests/test_pmi.py / test_source_kl.py via the oracle parity)."""
    import numpy as np
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    dirty = pc.fill_null(
        pc.match_substring_regex(texts, "[^ -~\t\n\r\v\f]"), False
    )
    base = pc.if_else(dirty, pa.scalar(""), pc.fill_null(texts, ""))
    parts = pc.split_pattern_regex(
        pc.utf8_trim(pc.utf8_lower(base), " \t\n\r\v\f"),
        "[ \t\n\r\v\f]+",
    )
    flat = pc.list_flatten(parts)
    parents = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    parents = parents[keep]
    if not pc.any(dirty).as_py():
        return parents, flat
    d_par: list = []
    d_tok: list = []
    for i in np.flatnonzero(dirty.to_numpy(zero_copy_only=False)):
        for t in _tokens(texts[int(i)].as_py()):
            d_par.append(int(i))
            d_tok.append(t)
    parents = np.concatenate([parents, np.asarray(d_par, dtype=np.int64)])
    import pyarrow as _pa

    flat = _pa.concat_arrays([flat, _pa.array(d_tok, _pa.string())])
    return parents, flat


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
# Shared LSH plumbing (minhash + simhash)
# ---------------------------------------------------------------------------

def _splitmix64(x):
    """Vectorized splitmix64 finalizer over a uint64 numpy array."""
    import numpy as np

    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _group_offsets(keys):
    """Start offsets (incl. 0 and n) of equal-key runs in a sorted array."""
    import numpy as np

    n = len(keys)
    if n == 0:
        return np.array([0], dtype=np.int64)
    idx = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    return np.concatenate([[0], idx, [n]]).astype(np.int64)


def _id_hash_u64(col: pa.Array):
    """Per-row uint64 hash of an id column (integers pass through)."""
    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return col.to_numpy(zero_copy_only=False).astype(np.uint64)
    import polars as pl

    return pl.Series("k", col.to_pylist(), dtype=pl.Utf8).hash(seed=0).to_numpy()


def _count_hot_buckets(refs, bkeys_of, hot_threshold: int):
    """Pigeonhole bucket-size pre-pass with NO shuffle (same pattern as
    stages/block.compute_hot_keys): per-block ``np.unique`` counts filtered
    to >= hot_threshold // n_blocks, tiny driver combine. A bucket with a
    global count >= T has a per-block count >= T/nb in at least one block;
    missing a bucket only skips its salt grid — results stay identical
    because grid salting preserves the exact pair set (it is a straggler
    bound, not a filter)."""
    import ray
    from collections import Counter

    nb = max(1, len(refs))
    floor_n = max(2, hot_threshold // nb)

    @ray.remote
    def count(tbl: pa.Table):
        import numpy as np

        if tbl.num_rows == 0 or tbl.num_columns == 0:
            return np.array([], dtype=np.uint64), np.array([], dtype=np.int64)
        k = bkeys_of(tbl).ravel()
        u, c = np.unique(k, return_counts=True)
        keep = c >= floor_n
        return u[keep], c[keep].astype(np.int64)

    tot: Counter = Counter()
    for u, c in ray.get([count.remote(r) for r in refs]):
        for k, n in zip(u.tolist(), c.tolist()):
            tot[k] += n
    return {k: n for k, n in tot.items() if n >= hot_threshold}


def _expand_lsh_rows(bflat, idh_flat, hot_map, cap):
    """Grid-salt hot buckets, keeping the exact pair set.

    ``bflat``/``idh_flat``: uint64 bucket key and id-hash per band row.
    Cold rows pass through (cs=ct=salt=0). A bucket with n >= cap rows gets a
    g = ceil(n/cap) salt grid: each row draws salt s = mix(idh ^ bkey) % g
    and is emitted to the g cells {(min(s,t), max(s,t)) : t < g}, so every
    unordered row pair meets in EXACTLY one cell (the pair kernel pairs
    same-salt rows only when cs == ct, cross-salt rows only when cs != ct).
    Per-cell row count is ~2·cap, bounding any single task regardless of how
    hot the bucket is.

    Returns (sel, bkey, cs, ct, salt): ``sel`` indexes back into band rows.
    """
    import numpy as np

    n = len(bflat)
    if not hot_map:
        z = np.zeros(n, dtype=np.int32)
        return np.arange(n), bflat, z, z, z
    hot_keys = np.array(sorted(hot_map), dtype=np.uint64)
    gs = np.array(
        [-(-hot_map[int(k)] // cap) for k in hot_keys], dtype=np.int64
    )
    pos = np.searchsorted(hot_keys, bflat)
    posc = np.minimum(pos, len(hot_keys) - 1)
    is_hot = hot_keys[posc] == bflat
    cold = np.flatnonzero(~is_hot)
    hi = np.flatnonzero(is_hot)
    g = gs[pos[hi]]
    salt = (_splitmix64(idh_flat[hi] ^ bflat[hi]) % g.astype(np.uint64)).astype(
        np.int64
    )
    rep = np.repeat(hi, g)
    tot = int(g.sum())
    starts = np.concatenate([[0], np.cumsum(g)[:-1]])
    t = np.arange(tot, dtype=np.int64) - np.repeat(starts, g)
    salt_rep = np.repeat(salt, g)
    cs = np.minimum(salt_rep, t)
    ct = np.maximum(salt_rep, t)
    cell = (cs.astype(np.uint64) << np.uint64(21)) | (
        ct.astype(np.uint64) + np.uint64(1)
    )
    bkey_hot = _splitmix64(np.repeat(bflat[hi], g) ^ cell)
    z = np.zeros(len(cold), dtype=np.int32)
    sel = np.concatenate([cold, rep])
    bkey = np.concatenate([bflat[cold], bkey_hot])
    cs_o = np.concatenate([z, cs.astype(np.int32)])
    ct_o = np.concatenate([z, ct.astype(np.int32)])
    salt_o = np.concatenate([z, salt_rep.astype(np.int32)])
    return sel, bkey, cs_o, ct_o, salt_o


def _cell_pair_indices(salts, cs: int, ct: int):
    """Row-index pairs within one bucket cell such that each unordered row
    pair of the original bucket appears exactly once across cells."""
    import numpy as np

    n = len(salts)
    if cs == ct:
        return np.triu_indices(n, 1)
    li = np.flatnonzero(salts == cs)
    ri = np.flatnonzero(salts == ct)
    return np.repeat(li, len(ri)), np.tile(ri, len(li))


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup pairs
# ---------------------------------------------------------------------------

class MinHashDocs:
    """map_batches: (id, text) -> ONE row per document:
    (id, hashes: sorted unique int64 shingle hashes, bkeys: list<uint64>
    LSH band bucket keys).

    Each shingle is md5-hashed ONCE (h60); the ``num_perm`` permutation
    values derive from the universal hash (a_i*h + b_i) mod (2^31-1) —
    vectorized over the whole batch with one ``minimum.reduceat`` per
    permutation instead of num_perm md5 calls per shingle. Band bucket keys
    fold each band's signature slice through splitmix64 (vectorized over
    docs), so buckets have the same equivalence classes as the oracle's
    per-band signature-tuple join (modulo a ~2^-64 fold collision)."""

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
        doc_idx, doc_hashes, offsets = [], [], [0]
        for d, t in enumerate(texts):
            toks = _tokens(t)
            if not toks:
                continue
            sh = sorted({H.h60(s) for s in H.shingles(toks, self.shingle_k)})
            doc_idx.append(d)
            doc_hashes.extend(sh)
            offsets.append(len(doc_hashes))
        id_type = batch.schema.field(self.id_col).type
        if not doc_idx:
            return pa.table(
                {
                    self.id_col: pa.array([], id_type),
                    "hashes": pa.array([], pa.list_(pa.int64())),
                    "bkeys": pa.array([], pa.list_(pa.uint64())),
                }
            )
        Hh = np.asarray(doc_hashes, dtype=np.uint64) % np.uint64(H.MINHASH_P)
        starts = np.asarray(offsets[:-1])
        sigs = np.empty((len(doc_idx), self.num_perm), dtype=np.uint64)
        for p in range(self.num_perm):
            v = (np.uint64(self.A[p]) * Hh + np.uint64(self.B[p])) % np.uint64(
                H.MINHASH_P
            )
            sigs[:, p] = np.minimum.reduceat(v, starts)
        rows = self.num_perm // self.bands
        n = len(doc_idx)
        bmat = np.empty((n, self.bands), dtype=np.uint64)
        for b in range(self.bands):
            h = _splitmix64(np.full(n, b, dtype=np.uint64))
            for r in range(rows):
                h = _splitmix64(h ^ sigs[:, b * rows + r])
            bmat[:, b] = h
        off_arr = np.asarray(offsets, dtype=np.int64)
        hashes = pa.ListArray.from_arrays(
            pa.array(off_arr, pa.int32()).cast(pa.int32()),
            pa.array(np.asarray(doc_hashes, dtype=np.int64), pa.int64()),
        )
        bkeys = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int64) * self.bands, pa.int32()).cast(pa.int32()),
            pa.array(bmat.ravel(), pa.uint64()),
        )
        return pa.table(
            {
                self.id_col: pa.array([ids[d] for d in doc_idx], id_type),
                "hashes": hashes,
                "bkeys": bkeys,
            }
        )


def _flat_list(col):
    """ChunkedArray/Array list column -> single contiguous ListArray."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.offset != 0:
        col = pa.concat_arrays([col])
    return col


def _hash_attach(cands, docs_h, id_col: str, id_type, step_b: bool, jaccard_threshold: float):
    """One gather round of the pair-keyed verify fetch.

    Tagged union of candidate rows (keyed on one end of the pair) with the
    doc hash table (keyed on id), then a grouped_map per key: the doc row
    contributes its hash set ONCE per key; step A dedups the other-end ids
    (cross-band duplicates collapse here — the group holds every candidate
    with this id_a, so the dedup is complete) and re-keys each candidate on
    id_b carrying hashes_a; step B computes exact Jaccard against hashes_b
    and filters. Hash sets therefore ride each exchange once per doc plus
    once per surviving candidate — independent of the band count, unlike the
    previous design that shipped every doc's hash list bands× through the
    bucket shuffle."""
    import numpy as np

    from uk_address_matcher_ray.stages.grouped import grouped_map

    union_schema = pa.schema(
        [
            pa.field("key", id_type),
            pa.field("tag", pa.int8()),
            pa.field("other", id_type),
            pa.field("hashes", pa.list_(pa.int64())),
        ]
    )
    tagged = docs_h.map_batches(
        lambda t: pa.table(
            {
                "key": t.column(id_col),
                "tag": pa.array(np.zeros(t.num_rows, dtype=np.int8), pa.int8()),
                "other": pa.nulls(t.num_rows, id_type),
                "hashes": t.column("hashes"),
            }
        ).cast(union_schema),
        batch_format="pyarrow",
    ).union(cands)

    if not step_b:
        out_schema = union_schema

        def kernel(tbl: pa.Table) -> pa.Table:
            keys = tbl.column("key").to_numpy(zero_copy_only=False)
            tags = tbl.column("tag").to_numpy(zero_copy_only=False)
            others = tbl.column("other").to_numpy(zero_copy_only=False)
            hl = _flat_list(tbl.column("hashes"))
            hoff = hl.offsets.to_numpy(zero_copy_only=False)
            hval = hl.values.to_numpy(zero_copy_only=False)
            offs = _group_offsets(keys)
            out_keys, out_other, val_parts, lengths = [], [], [], []
            for gi in range(len(offs) - 1):
                s, e = offs[gi], offs[gi + 1]
                t = tags[s:e]
                cand_mask = t == 1
                if not cand_mask.any():
                    continue
                doc_pos = np.flatnonzero(t == 0)
                if len(doc_pos) == 0:
                    continue
                di = s + doc_pos[0]
                hv = hval[hoff[di] : hoff[di + 1]]
                uniq = np.unique(others[s:e][cand_mask])
                k = len(uniq)
                out_keys.append(uniq)
                out_other.extend([keys[s]] * k)
                val_parts.append(np.tile(hv, k))
                lengths.extend([len(hv)] * k)
            if not out_keys:
                return out_schema.empty_table()
            offsets = np.concatenate([[0], np.cumsum(lengths)])
            return pa.table(
                {
                    "key": pa.array(np.concatenate(out_keys), id_type),
                    "tag": pa.array(
                        np.ones(len(offsets) - 1, dtype=np.int8), pa.int8()
                    ),
                    "other": pa.array(out_other, id_type),
                    "hashes": pa.ListArray.from_arrays(
                        pa.array(offsets, pa.int32()).cast(pa.int32()),
                        pa.array(np.concatenate(val_parts), pa.int64()),
                    ),
                }
            ).cast(out_schema)

        return grouped_map(tagged, "key", None, out_schema, fn_table=kernel)

    out_schema = pa.schema(
        [
            pa.field("id_a", id_type),
            pa.field("id_b", id_type),
            pa.field("jaccard", pa.float64()),
        ]
    )

    def kernel_b(tbl: pa.Table) -> pa.Table:
        keys = tbl.column("key").to_numpy(zero_copy_only=False)
        tags = tbl.column("tag").to_numpy(zero_copy_only=False)
        others = tbl.column("other").to_numpy(zero_copy_only=False)
        hl = _flat_list(tbl.column("hashes"))
        hoff = hl.offsets.to_numpy(zero_copy_only=False)
        hval = hl.values.to_numpy(zero_copy_only=False)
        offs = _group_offsets(keys)
        out_a, out_b, out_j = [], [], []
        for gi in range(len(offs) - 1):
            s, e = offs[gi], offs[gi + 1]
            t = tags[s:e]
            cand_pos = np.flatnonzero(t == 1)
            if len(cand_pos) == 0:
                continue
            doc_pos = np.flatnonzero(t == 0)
            if len(doc_pos) == 0:
                continue
            di = s + doc_pos[0]
            hb = hval[hoff[di] : hoff[di + 1]]
            lb = len(hb)
            for ci in cand_pos:
                ri = s + ci
                ha = hval[hoff[ri] : hoff[ri + 1]]
                inter = np.intersect1d(ha, hb, assume_unique=True).size
                union = len(ha) + lb - inter
                j = inter / union if union else 0.0
                if j >= jaccard_threshold:
                    out_a.append(others[ri])
                    out_b.append(keys[ri])
                    out_j.append(j)
        return pa.table(
            {
                "id_a": pa.array(out_a, id_type),
                "id_b": pa.array(out_b, id_type),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return grouped_map(tagged, "key", None, out_schema, fn_table=kernel_b)


def minhash_lsh_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    hot_bucket_rows: int = 4096,
    _is_side_b=None,
):
    """Near-duplicate pairs (id_a < id_b, exact Jaccard >= threshold),
    candidates = pairs sharing at least one LSH band bucket.

    ``_is_side_b`` (internal; used by ``minhash_lsh_pairs_ab``): a
    vectorized predicate over an id array marking corpus-B rows. When
    set, only CROSS-corpus pairs are emitted, oriented A-side first
    (instead of the self-join's id_a < id_b canonicalization).

    Scale shape (the three shuffles are each payload-minimal):

    1. one pass computes per-doc (hashes, signature band keys), materialized;
    2. the bucket exchange carries (bucket:uint64, id) ONLY — 16-24 bytes per
       band row, independent of document length; hot buckets (>=
       ``hot_bucket_rows``) are grid-salted via a shuffle-free pigeonhole
       count so no task exceeds ~2·cap rows while the pair set stays exactly
       identical (each unordered pair meets in exactly one grid cell);
    3. exact-Jaccard verification is a pair-keyed fetch: two grouped_map
       gather rounds against the doc hash table (union-by-key), so each
       doc's hash set rides an exchange once per round plus once per
       candidate — NOT once per band. Cross-band duplicate candidates
       collapse inside round one (the id_a group sees all of them).
    """
    import numpy as np

    from uk_address_matcher_ray.stages.grouped import grouped_map

    stage = MinHashDocs(
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
    )
    docs = ds.map_batches(stage, batch_format="pyarrow").materialize()
    sch = docs.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]

    def bkeys_of(tbl: pa.Table):
        return _flat_list(tbl.column("bkeys")).values.to_numpy(
            zero_copy_only=False
        )

    hot = _count_hot_buckets(
        docs.to_arrow_refs(), bkeys_of, hot_bucket_rows
    )

    def emit_bands(batch: pa.Table) -> pa.Table:
        bl = _flat_list(batch.column("bkeys"))
        boff = bl.offsets.to_numpy(zero_copy_only=False)
        bflat = bl.values.to_numpy(zero_copy_only=False)
        counts = np.diff(boff)
        idh = np.repeat(_id_hash_u64(batch.column(id_col)), counts)
        row_of = np.repeat(np.arange(batch.num_rows), counts)
        sel, bkey, cs, ct, salt = _expand_lsh_rows(bflat, idh, hot, hot_bucket_rows)
        ids = batch.column(id_col).take(pa.array(row_of[sel]))
        return pa.table(
            {
                "bkey": pa.array(bkey, pa.uint64()),
                id_col: ids,
                "cs": pa.array(cs, pa.int32()),
                "ct": pa.array(ct, pa.int32()),
                "salt": pa.array(salt, pa.int32()),
            }
        )

    bands_ds = docs.select_columns([id_col, "bkeys"]).map_batches(
        emit_bands, batch_format="pyarrow"
    )

    cand_schema = pa.schema(
        [
            pa.field("key", id_type),
            pa.field("tag", pa.int8()),
            pa.field("other", id_type),
            pa.field("hashes", pa.list_(pa.int64())),
        ]
    )

    def cand_kernel(tbl: pa.Table) -> pa.Table:
        bk = tbl.column("bkey").to_numpy(zero_copy_only=False)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        css = tbl.column("cs").to_numpy(zero_copy_only=False)
        cts = tbl.column("ct").to_numpy(zero_copy_only=False)
        salts = tbl.column("salt").to_numpy(zero_copy_only=False)
        offs = _group_offsets(bk)
        parts_a, parts_b = [], []
        for gi in range(len(offs) - 1):
            s, e = offs[gi], offs[gi + 1]
            if e - s < 2:
                continue
            xi, yi = _cell_pair_indices(salts[s:e], int(css[s]), int(cts[s]))
            if len(xi) == 0:
                continue
            ia, ib = ids[s:e][xi], ids[s:e][yi]
            if _is_side_b is not None:
                # AB mode: keep only cross-corpus pairs, A side first
                ba, bb = _is_side_b(ia), _is_side_b(ib)
                cross = ba != bb
                ia, ib, ba = ia[cross], ib[cross], ba[cross]
                lo = np.where(ba, ib, ia)
                hi = np.where(ba, ia, ib)
            else:
                neq = ia != ib
                ia, ib = ia[neq], ib[neq]
                swap = ia > ib
                lo = np.where(swap, ib, ia)
                hi = np.where(swap, ia, ib)
            parts_a.append(lo)
            parts_b.append(hi)
        if not parts_a:
            return cand_schema.empty_table()
        a = np.concatenate(parts_a)
        b = np.concatenate(parts_b)
        n = len(a)
        return pa.table(
            {
                "key": pa.array(a, id_type),
                "tag": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
                "other": pa.array(b, id_type),
                "hashes": pa.ListArray.from_arrays(
                    pa.array(np.zeros(n + 1, dtype=np.int64), pa.int32()).cast(
                        pa.int32()
                    ),
                    pa.array([], pa.int64()),
                ),
            }
        ).cast(cand_schema)

    cands = grouped_map(bands_ds, "bkey", None, cand_schema, fn_table=cand_kernel)

    docs_h = docs.select_columns([id_col, "hashes"])
    step_a = _hash_attach(cands, docs_h, id_col, id_type, False, jaccard_threshold)
    return _hash_attach(step_a, docs_h, id_col, id_type, True, jaccard_threshold)


def minhash_lsh_pairs_ab(
    ds_a,
    ds_b,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    hot_bucket_rows: int = 4096,
):
    """Cross-corpus near-duplicate pairs — fuzzy decontamination / A-vs-B
    dedup (e.g. strip training docs near-duplicate to an eval set, or dedup
    a new crawl snapshot against an existing corpus by content rather than
    the exact-hash path in stages/snapshot.py).

    Output: (id_a from ``ds_a``, id_b from ``ds_b``, jaccard) with exact
    shingle-set Jaccard >= threshold; candidates = cross pairs sharing at
    least one LSH band bucket. Within-corpus pairs are never emitted.

    Scale shape: identical to ``minhash_lsh_pairs`` — the two corpora are
    tagged into ONE id space (integer ids: ``id*2 + side`` with bit 0 as the
    side tag; other ids: an ``'a|'``/``'b|'`` string prefix) so the three
    payload-minimal exchanges (band-key bucket shuffle, two pair-keyed
    verify gathers) run unchanged over the union, and only the in-group
    candidate kernel changes: it keeps cross-side cells only, oriented
    A-side first. No extra shuffle, no broadcast of either corpus; id
    collisions between A and B are fine (the tag separates them).
    Integer ids must satisfy |id| < 2^62.
    """
    import numpy as np
    import pyarrow.compute as pc

    sch = ds_a.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    int_ids = pa.types.is_integer(id_type)

    def encoder(side: int):
        def enc(t: pa.Table) -> pa.Table:
            col = t.column(id_col)
            if int_ids:
                e = pc.add(
                    pc.multiply(col.cast(pa.int64()), pa.scalar(2, pa.int64())),
                    pa.scalar(side, pa.int64()),
                )
            else:
                e = pc.binary_join_element_wise(
                    pa.scalar("b" if side else "a"), col.cast(pa.string()), "|"
                )
            return pa.table({id_col: e, text_col: t.column(text_col)})

        return enc

    union = ds_a.map_batches(encoder(0), batch_format="pyarrow").union(
        ds_b.map_batches(encoder(1), batch_format="pyarrow")
    )

    if int_ids:
        def is_b(arr):
            return (np.asarray(arr, dtype=np.int64) & np.int64(1)).astype(bool)
    else:
        def is_b(arr):
            return np.array([s[:2] == "b|" for s in arr], dtype=bool)

    pairs = minhash_lsh_pairs(
        union,
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        jaccard_threshold=jaccard_threshold,
        hot_bucket_rows=hot_bucket_rows,
        _is_side_b=is_b,
    )

    def decode(t: pa.Table) -> pa.Table:
        a, b = t.column("id_a"), t.column("id_b")
        if int_ids:
            # arithmetic >>1 inverts 2k / 2k+1 for negative k too
            a = pc.shift_right(a, 1).cast(id_type)
            b = pc.shift_right(b, 1).cast(id_type)
        else:
            a = pc.utf8_slice_codeunits(a, 2).cast(id_type)
            b = pc.utf8_slice_codeunits(b, 2).cast(id_type)
        return pa.table({"id_a": a, "id_b": b, "jaccard": t.column("jaccard")})

    import ray

    # a 0-row union leg pins the output schema: Ray reports schema()=None
    # for an all-empty map_batches output (round-4e finding), which breaks
    # downstream empty-table handling
    out_schema = pa.schema(
        [
            pa.field("id_a", id_type),
            pa.field("id_b", id_type),
            pa.field("jaccard", pa.float64()),
        ]
    )
    return pairs.map_batches(decode, batch_format="pyarrow").union(
        ray.data.from_arrow(out_schema.empty_table())
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard similarity join (prefix filter)
# ---------------------------------------------------------------------------

class NgramPrefixDocs:
    """map_batches: (id, text) -> ONE row per document with tokens:
    (id, hashes: sorted unique int64 shingle hashes, pfx: list<uint64>
    prefix bucket keys, sz: int32 shingle-set size).

    Prefix filtering (AllPairs / SSJoin family — Bayardo et al. WWW'07,
    Chaudhuri et al. ICDE'06): under ANY fixed total order of the shingle
    universe, two sets with |a∩b| >= alpha must share an element among the
    first |x| - alpha + 1 elements of each set x. With Jaccard >= t,
    |a∩b| >= t·|x| for each side, so emitting the first
    p = n - floor(t·n) + 1 hashes (ascending hash order = the global order;
    floor rather than ceil so float rounding can only LENGTHEN the prefix)
    as bucket keys yields a candidate set with NO false negatives — this
    operator is exact, unlike the probabilistic minhash/simhash paths."""

    def __init__(self, id_col: str, text_col: str, shingle_k: int, jaccard_threshold: float):
        self.id_col = id_col
        self.text_col = text_col
        self.shingle_k = shingle_k
        self.t = jaccard_threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        doc_idx, doc_hashes, offsets = [], [], [0]
        pfx_vals, pfx_offsets = [], [0]
        sizes = []
        for d, t in enumerate(texts):
            toks = _tokens(t)
            if not toks:
                continue
            sh = sorted({H.h60(s) for s in H.shingles(toks, self.shingle_k)})
            n = len(sh)
            p = min(n, max(1, n - int(self.t * n) + 1))
            doc_idx.append(d)
            doc_hashes.extend(sh)
            offsets.append(len(doc_hashes))
            pfx_vals.extend(sh[:p])
            pfx_offsets.append(len(pfx_vals))
            sizes.append(n)
        id_type = batch.schema.field(self.id_col).type
        if not doc_idx:
            return pa.table(
                {
                    self.id_col: pa.array([], id_type),
                    "hashes": pa.array([], pa.list_(pa.int64())),
                    "pfx": pa.array([], pa.list_(pa.uint64())),
                    "sz": pa.array([], pa.int32()),
                }
            )
        hashes = pa.ListArray.from_arrays(
            pa.array(np.asarray(offsets, dtype=np.int64), pa.int32()).cast(pa.int32()),
            pa.array(np.asarray(doc_hashes, dtype=np.int64), pa.int64()),
        )
        pfx = pa.ListArray.from_arrays(
            pa.array(np.asarray(pfx_offsets, dtype=np.int64), pa.int32()).cast(
                pa.int32()
            ),
            pa.array(np.asarray(pfx_vals, dtype=np.uint64), pa.uint64()),
        )
        return pa.table(
            {
                self.id_col: pa.array([ids[d] for d in doc_idx], id_type),
                "hashes": hashes,
                "pfx": pfx,
                "sz": pa.array(np.asarray(sizes, dtype=np.int32), pa.int32()),
            }
        )


def ngram_jaccard_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    hot_bucket_rows: int = 4096,
):
    """EXACT near-duplicate pairs (id_a < id_b, n-gram Jaccard >= threshold).

    Same three payload-minimal exchanges as ``minhash_lsh_pairs`` but with a
    prefix-filter candidate generator instead of LSH bands, so the result is
    the COMPLETE set of qualifying pairs (no probabilistic misses):

    1. one pass computes per-doc (sorted shingle hashes, prefix keys, size);
    2. the bucket exchange carries (prefix hash:uint64, id, sz:int32) ONLY;
       hot prefixes (boilerplate shingles) are grid-salted via the same
       shuffle-free pigeonhole count as minhash, so no task exceeds ~2·cap
       rows while the pair set stays exactly identical;
    3. candidates are size-filtered in-bucket (J(a,b) <= min(sz)/max(sz),
       float-safe because correctly-rounded division is monotone), then
       exact-Jaccard verified by the shared pair-keyed gather
       (`_hash_attach`) — each doc's hash set rides an exchange once per
       round plus once per candidate, never once per prefix element.

    Complements the reference-less dedup family required by the driver brief
    (exact / minhash-LSH / simhash / n-gram Jaccard / embedding-cosine).
    """
    import numpy as np

    from uk_address_matcher_ray.stages.grouped import grouped_map

    stage = NgramPrefixDocs(
        id_col=id_col,
        text_col=text_col,
        shingle_k=shingle_k,
        jaccard_threshold=jaccard_threshold,
    )
    docs = ds.map_batches(stage, batch_format="pyarrow").materialize()
    sch = docs.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]

    def pfx_of(tbl: pa.Table):
        return _flat_list(tbl.column("pfx")).values.to_numpy(zero_copy_only=False)

    hot = _count_hot_buckets(docs.to_arrow_refs(), pfx_of, hot_bucket_rows)

    def emit_prefixes(batch: pa.Table) -> pa.Table:
        pl_ = _flat_list(batch.column("pfx"))
        poff = pl_.offsets.to_numpy(zero_copy_only=False)
        pflat = pl_.values.to_numpy(zero_copy_only=False)
        counts = np.diff(poff)
        idh = np.repeat(_id_hash_u64(batch.column(id_col)), counts)
        row_of = np.repeat(np.arange(batch.num_rows), counts)
        sz = batch.column("sz").to_numpy(zero_copy_only=False)
        sel, bkey, cs, ct, salt = _expand_lsh_rows(pflat, idh, hot, hot_bucket_rows)
        rows = row_of[sel]
        ids = batch.column(id_col).take(pa.array(rows))
        return pa.table(
            {
                "bkey": pa.array(bkey, pa.uint64()),
                id_col: ids,
                "sz": pa.array(sz[rows].astype(np.int32), pa.int32()),
                "cs": pa.array(cs, pa.int32()),
                "ct": pa.array(ct, pa.int32()),
                "salt": pa.array(salt, pa.int32()),
            }
        )

    pfx_ds = docs.select_columns([id_col, "pfx", "sz"]).map_batches(
        emit_prefixes, batch_format="pyarrow"
    )

    cand_schema = pa.schema(
        [
            pa.field("key", id_type),
            pa.field("tag", pa.int8()),
            pa.field("other", id_type),
            pa.field("hashes", pa.list_(pa.int64())),
        ]
    )

    def cand_kernel(tbl: pa.Table) -> pa.Table:
        bk = tbl.column("bkey").to_numpy(zero_copy_only=False)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        szs = tbl.column("sz").to_numpy(zero_copy_only=False).astype(np.float64)
        css = tbl.column("cs").to_numpy(zero_copy_only=False)
        cts = tbl.column("ct").to_numpy(zero_copy_only=False)
        salts = tbl.column("salt").to_numpy(zero_copy_only=False)
        offs = _group_offsets(bk)
        parts_a, parts_b = [], []
        for gi in range(len(offs) - 1):
            s, e = offs[gi], offs[gi + 1]
            if e - s < 2:
                continue
            xi, yi = _cell_pair_indices(salts[s:e], int(css[s]), int(cts[s]))
            if len(xi) == 0:
                continue
            ia, ib = ids[s:e][xi], ids[s:e][yi]
            sa, sb = szs[s:e][xi], szs[s:e][yi]
            # J(a,b) <= min(|a|,|b|)/max(|a|,|b|); fl(min/max) >= fl(J) because
            # correctly-rounded division is monotone, so this never drops a
            # pair the exact verify would keep.
            keep = (ia != ib) & (
                np.minimum(sa, sb) / np.maximum(sa, sb) >= jaccard_threshold
            )
            ia, ib = ia[keep], ib[keep]
            if len(ia) == 0:
                continue
            swap = ia > ib
            parts_a.append(np.where(swap, ib, ia))
            parts_b.append(np.where(swap, ia, ib))
        if not parts_a:
            return cand_schema.empty_table()
        a = np.concatenate(parts_a)
        b = np.concatenate(parts_b)
        n = len(a)
        return pa.table(
            {
                "key": pa.array(a, id_type),
                "tag": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
                "other": pa.array(b, id_type),
                "hashes": pa.ListArray.from_arrays(
                    pa.array(np.zeros(n + 1, dtype=np.int64), pa.int32()).cast(
                        pa.int32()
                    ),
                    pa.array([], pa.int64()),
                ),
            }
        ).cast(cand_schema)

    cands = grouped_map(pfx_ds, "bkey", None, cand_schema, fn_table=cand_kernel)

    docs_h = docs.select_columns([id_col, "hashes"])
    step_a = _hash_attach(cands, docs_h, id_col, id_type, False, jaccard_threshold)
    return _hash_attach(step_a, docs_h, id_col, id_type, True, jaccard_threshold)


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


_POP16 = None


def _popcount64(x):
    """Vectorized popcount of a uint64 numpy array (16-bit LUT)."""
    import numpy as np

    global _POP16
    if _POP16 is None:
        _POP16 = np.array(
            [bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8
        )
    m = np.uint64(0xFFFF)
    return (
        _POP16[(x & m).astype(np.int64)].astype(np.int64)
        + _POP16[((x >> np.uint64(16)) & m).astype(np.int64)]
        + _POP16[((x >> np.uint64(32)) & m).astype(np.int64)]
        + _POP16[((x >> np.uint64(48)) & m).astype(np.int64)]
    )


def simhash_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
    hot_bucket_rows: int = 4096,
):
    """Pairs with Hamming(simhash) <= max_hamming, via banded bucketing
    (a pair within distance d shares at least one of ``bands`` bands when
    d < bands).

    The bucket exchange carries (bucket:uint64, id, simhash:8B) per band row
    — fixed-size, so no payload amplification; buckets with >=
    ``hot_bucket_rows`` rows (boilerplate pages at web scale) are grid-salted
    from a shuffle-free pigeonhole count, bounding every pair task at ~2·cap
    rows with an exactly identical pair set. The in-bucket kernel is
    vectorized (numpy XOR + 16-bit-LUT popcount over the pair index arrays);
    cross-band duplicate pairs collapse in a composite-key grouped_map."""
    sigs = simhash_signatures(ds, id_col, text_col)
    return hamming_pairs(
        sigs,
        id_col=id_col,
        sig_col="simhash",
        max_hamming=max_hamming,
        bands=bands,
        hot_bucket_rows=hot_bucket_rows,
    )


def hamming_pairs(
    sig_ds,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    max_hamming: int = 3,
    bands: int = 4,
    hot_bucket_rows: int = 4096,
):
    """Generic banded-Hamming pair join over an EXISTING 64-bit signature
    column — the scale shape shared by simhash text near-dup and image
    perceptual-hash near-dup (stages/imagehash.py).

    Exactness: a pair at Hamming distance d <= max_hamming differs in at
    most max_hamming bit positions, so with ``bands`` disjoint bands and
    ``max_hamming < bands`` at least one band is identical (pigeonhole) —
    the banded join finds EVERY qualifying pair, it is not approximate.
    All the simhash_pairs scale machinery applies: fixed-size
    (bucket, id, sig) exchange rows, grid salting for hot buckets,
    vectorized in-bucket popcount, cross-band collapse."""
    import numpy as np

    from uk_address_matcher_ray.stages.grouped import grouped_map

    if not max_hamming < bands:
        raise ValueError(
            f"banded join is exact only for max_hamming < bands "
            f"(got {max_hamming} >= {bands})"
        )
    sigs = sig_ds.materialize()
    ssch = sigs.schema()
    id_type = dict(zip(ssch.names, ssch.types))[id_col]
    width = 64 // bands
    wmask = np.uint64((1 << width) - 1)
    # band chunks are low-entropy (similar docs cluster); mix so the bucket
    # key partitions uniformly in the hash exchange
    band_seeds = _splitmix64(np.arange(bands, dtype=np.uint64) << np.uint64(32))

    def bkeys_of(tbl: pa.Table):
        s = tbl.column(sig_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        cols = [
            _splitmix64(band_seeds[b] ^ ((s >> np.uint64(b * width)) & wmask))
            for b in range(bands)
        ]
        return np.stack(cols, axis=1).ravel()

    hot = _count_hot_buckets(sigs.to_arrow_refs(), bkeys_of, hot_bucket_rows)

    def emit_bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        bflat = bkeys_of(batch)
        idh = np.repeat(_id_hash_u64(batch.column(id_col)), bands)
        row_of = np.repeat(np.arange(n), bands)
        sel, bkey, cs, ct, salt = _expand_lsh_rows(bflat, idh, hot, hot_bucket_rows)
        take = pa.array(row_of[sel])
        return pa.table(
            {
                "bkey": pa.array(bkey, pa.uint64()),
                id_col: batch.column(id_col).take(take),
                sig_col: batch.column(sig_col).take(take),
                "cs": pa.array(cs, pa.int32()),
                "ct": pa.array(ct, pa.int32()),
                "salt": pa.array(salt, pa.int32()),
            }
        )

    keyed = sigs.map_batches(emit_bands, batch_format="pyarrow")

    pair_schema = pa.schema(
        [
            pa.field("id_a", id_type),
            pa.field("id_b", id_type),
            pa.field("hamming", pa.int32()),
        ]
    )

    def pair_kernel(tbl: pa.Table) -> pa.Table:
        bk = tbl.column("bkey").to_numpy(zero_copy_only=False)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        ss = tbl.column(sig_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        css = tbl.column("cs").to_numpy(zero_copy_only=False)
        cts = tbl.column("ct").to_numpy(zero_copy_only=False)
        salts = tbl.column("salt").to_numpy(zero_copy_only=False)
        offs = _group_offsets(bk)
        parts_a, parts_b, parts_d = [], [], []
        for gi in range(len(offs) - 1):
            s, e = offs[gi], offs[gi + 1]
            if e - s < 2:
                continue
            xi, yi = _cell_pair_indices(salts[s:e], int(css[s]), int(cts[s]))
            if len(xi) == 0:
                continue
            d = _popcount64(ss[s:e][xi] ^ ss[s:e][yi])
            ok = d <= max_hamming
            ia, ib = ids[s:e][xi][ok], ids[s:e][yi][ok]
            neq = ia != ib
            ia, ib, d = ia[neq], ib[neq], d[ok][neq]
            swap = ia > ib
            parts_a.append(np.where(swap, ib, ia))
            parts_b.append(np.where(swap, ia, ib))
            parts_d.append(d)
        if not parts_a:
            return pair_schema.empty_table()
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(parts_a), id_type),
                "id_b": pa.array(np.concatenate(parts_b), id_type),
                "hamming": pa.array(
                    np.concatenate(parts_d).astype(np.int32), pa.int32()
                ),
            }
        )

    raw = grouped_map(keyed, "bkey", None, pair_schema, fn_table=pair_kernel)

    def first_per_pair(tbl: pa.Table) -> pa.Table:
        a = tbl.column("id_a").to_numpy(zero_copy_only=False)
        b = tbl.column("id_b").to_numpy(zero_copy_only=False)
        keep = np.ones(len(a), dtype=bool)
        if len(a):
            keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return tbl.filter(pa.array(keep))

    return grouped_map(
        raw, ("id_a", "id_b"), None, pair_schema, fn_table=first_per_pair
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


def _span_windows(texts: List[Optional[str]], k: int):
    """Vectorized k-token window extraction for a batch of texts.

    Tokenization is per-row ``str.split`` (C-level; mirrors the oracle's
    ``string_split_regex(text, '\\s+')`` with empties dropped); everything
    downstream of it is numpy: returns ``(flat_tokens, starts, doc_rep)``
    where ``flat_tokens`` is one object array of every token in the batch,
    ``starts[i]`` is window i's offset into it and ``doc_rep[i]`` the row
    index that window came from."""
    flat, starts, doc_rep, _offs = _span_windows_offs(texts, k)
    return flat, starts, doc_rep


def _span_windows_offs(texts: List[Optional[str]], k: int):
    """``_span_windows`` plus the per-row token offsets (``offs[r]`` is row
    r's first index into ``flat``; ``offs[-1] == len(flat)``) — needed by
    consumers that rebuild per-row texts, e.g. ``remove_duplicate_spans``."""
    import numpy as np

    toks_per_row = [(t or "").split() for t in texts]
    lens = np.fromiter(
        (len(t) for t in toks_per_row), dtype=np.int64, count=len(toks_per_row)
    )
    flat = np.empty(int(lens.sum()), dtype=object)
    pos = 0
    for t in toks_per_row:
        flat[pos : pos + len(t)] = t
        pos += len(t)
    offs = np.concatenate([[0], np.cumsum(lens)])
    wd = np.maximum(lens - k + 1, 0)
    doc_rep = np.repeat(np.arange(len(texts), dtype=np.int64), wd)
    total = int(wd.sum())
    # window j's position within its own doc: 0..wd[d]-1, concatenated
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(wd) - wd, wd
    )
    starts = offs[doc_rep] + within
    return flat, starts, doc_rep, offs


def _span_hashes(flat, starts, k: int):
    """Order-sensitive 64-bit rolling hash of each k-token window: hash
    every token ONCE (polars vectorized 64-bit string hash), then chain k
    splitmix64 rounds over the window matrix — no span strings are ever
    built. Collisions are resolved by the exact string pass (phase 2)."""
    import numpy as np
    import polars as pl

    if len(starts) == 0:
        return np.empty(0, dtype=np.uint64)
    th = pl.Series("t", flat, dtype=pl.Utf8).hash(seed=0).to_numpy()
    h = np.zeros(len(starts), dtype=np.uint64)
    for j in range(k):
        h = _splitmix64(h ^ th[starts + j])
    return h


def _span_strings(flat, starts, k: int) -> pa.Array:
    """Space-joined span strings for the given windows — one vectorized
    polars ``concat_str`` over k strided token columns (no Python join
    loop)."""
    import polars as pl

    if len(starts) == 0:
        return pa.array([], pa.string())
    df = pl.DataFrame({f"t{j}": flat[starts + j] for j in range(k)})
    s = df.select(
        pl.concat_str([pl.col(f"t{j}") for j in range(k)], separator=" ")
    ).to_series()
    return pa.array(s.to_list(), pa.string())


def _span_finalize_kernel(id_col: str, min_docs: int):
    """Per-partition kernel over COMPLETE span groups: aggregate globally
    per (span, doc) first — a doc split across input batches contributes
    ONE row to n_docs — then count distinct docs and total occurrences."""

    def kernel(tbl: pa.Table) -> pa.Table:
        per_doc = tbl.group_by(["span", id_col]).aggregate([("occ", "sum")])
        agg = per_doc.group_by("span").aggregate(
            [(id_col, "count"), ("occ_sum", "sum")]
        )
        import pyarrow.compute as pc

        kept = agg.filter(
            pc.greater_equal(agg.column(f"{id_col}_count"), min_docs)
        )
        return pa.table(
            {
                "span": kept.column("span"),
                "n_docs": kept.column(f"{id_col}_count").cast(pa.int64()),
                "occurrences": kept.column("occ_sum_sum").cast(pa.int64()),
            }
        )

    return kernel


def _span_exchange_legacy(ds, id_col: str, text_col: str, k: int, id_type):
    """Oracle-parity exchange: (span STRING, doc, occ) combined per batch.
    ~k tokens of string payload per window — the shape the hashed exchange
    replaces at scale."""

    def span_batch(batch: pa.Table) -> pa.Table:
        flat, starts, doc_rep = _span_windows(
            batch.column(text_col).to_pylist(), k
        )
        spans = _span_strings(flat, starts, k)
        t = pa.table(
            {
                "span": spans,
                id_col: batch.column(id_col).take(pa.array(doc_rep)),
            }
        )
        return t.group_by(["span", id_col]).aggregate([([], "count_all")]).rename_columns(
            ["span", id_col, "occ"]
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        span_batch, batch_format="pyarrow"
    )


def _span_exchange_hashed(ds, id_col: str, text_col: str, k: int, id_type):
    """Scale exchange: (span_hash u64, doc, occ) — fixed 8-byte keys instead
    of k-token strings (~8x fewer exchange bytes at k=8; measured in
    tests/test_duplicate_spans_hashed.py)."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        flat, starts, doc_rep = _span_windows(
            batch.column(text_col).to_pylist(), k
        )
        h = _span_hashes(flat, starts, k)
        t = pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                id_col: batch.column(id_col).take(pa.array(doc_rep)),
            }
        )
        return t.group_by(["h", id_col]).aggregate([([], "count_all")]).rename_columns(
            ["h", id_col, "occ"]
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        hash_batch, batch_format="pyarrow"
    )


def duplicate_spans(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 2,
    hashed: Optional[bool] = None,
):
    """Exact duplicate-SPAN detection — the core primitive of exact
    substring dedup for training corpora (find every k-token window that
    recurs across documents, e.g. boilerplate/licence blocks).

    Two exchange strategies, both EXACT (bit-identical output, same oracle):

    * ``hashed=True`` (default; knob ``GRAFT_SPAN_HASH_EXCHANGE``): the
      100 TB shape. Phase 1 shuffles only ``(span_hash u64, doc, occ)``
      fixed-width rows — ~8x fewer bytes than span strings at k=8 — and
      keeps hashes whose DISTINCT-doc count reaches ``min_docs``. Hash
      collisions can only over-merge, so survivors are a superset of the
      true answer. Phase 2 re-scans the corpus, builds span strings ONLY
      for windows whose hash survived (membership via a broadcast sorted
      hash array — ``ray.put`` once, ``np.searchsorted`` per batch; swap in
      a Bloom filter if the survivor set outgrows worker heaps), then one
      small string exchange groups by the true span and re-applies the
      distinct-doc filter, which exactly cancels any collision
      over-merge.
    * ``hashed=False``: single string exchange — every window's k-token
      span string crosses the all-to-all. Kept for A/B measurement.

    Both paths aggregate per (span, doc) GLOBALLY before counting docs, so
    a doc_id whose rows straddle input batches is still counted once."""
    import os

    import numpy as np
    import ray

    from uk_address_matcher_ray.stages.grouped import grouped_map

    if hashed is None:
        hashed = os.environ.get("GRAFT_SPAN_HASH_EXCHANGE", "1") != "0"

    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    out_schema = pa.schema(
        [
            pa.field("span", pa.string()),
            pa.field("n_docs", pa.int64()),
            pa.field("occurrences", pa.int64()),
        ]
    )
    finalize = _span_finalize_kernel(id_col, min_docs)

    if not hashed:
        per_doc = _span_exchange_legacy(ds, id_col, text_col, k, id_type)
        return grouped_map(per_doc, "span", None, out_schema, fn_table=finalize)

    # ---- phase 1: hash-only exchange -> surviving span hashes -----------
    keyed = _span_exchange_hashed(ds, id_col, text_col, k, id_type)

    def phase1_kernel(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        per_doc = tbl.group_by(["h", id_col]).aggregate([])
        agg = per_doc.group_by("h").aggregate([(id_col, "count")])
        kept = agg.filter(
            pc.greater_equal(agg.column(f"{id_col}_count"), min_docs)
        )
        return pa.table({"h": kept.column("h")})

    surv_schema = pa.schema([pa.field("h", pa.uint64())])
    surv_ds = grouped_map(keyed, "h", None, surv_schema, fn_table=phase1_kernel)
    surv_tables = ray.get(surv_ds.to_arrow_refs())
    surv = np.sort(
        pa.concat_tables(surv_tables).column("h").to_numpy(zero_copy_only=False)
    )
    surv_ref = ray.put(surv)

    # ---- phase 2: strings only for surviving hashes ----------------------
    def survivor_spans(batch: pa.Table) -> pa.Table:
        surv_arr = ray.get(surv_ref)
        flat, starts, doc_rep = _span_windows(
            batch.column(text_col).to_pylist(), k
        )
        h = _span_hashes(flat, starts, k)
        if len(h):
            idx = np.searchsorted(surv_arr, h)
            idx[idx >= len(surv_arr)] = max(len(surv_arr) - 1, 0)
            mask = (
                (surv_arr[idx] == h)
                if len(surv_arr)
                else np.zeros(len(h), dtype=bool)
            )
        else:
            mask = np.zeros(0, dtype=bool)
        spans = _span_strings(flat[:], starts[mask], k)
        t = pa.table(
            {
                "span": spans,
                id_col: batch.column(id_col).take(pa.array(doc_rep[mask])),
            }
        )
        return t.group_by(["span", id_col]).aggregate([([], "count_all")]).rename_columns(
            ["span", id_col, "occ"]
        )

    per_doc = ds.select_columns([id_col, text_col]).map_batches(
        survivor_spans, batch_format="pyarrow"
    )
    return grouped_map(per_doc, "span", None, out_schema, fn_table=finalize)


def remove_duplicate_spans(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 2,
):
    """Exact-substring REMOVAL — the apply half of exact substring dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"; cf. deduplicate-text-datasets): every k-token window that
    occurs in >= ``min_docs`` DISTINCT documents is removed from EVERY
    document. This is the symmetric remove-all-copies variant —
    deterministic and order-free, so no global occurrence ranking (and no
    extra exchange) is needed.

    Semantics, mirrored exactly by the SQL oracle:

    * tokens = whitespace split with empties dropped; output text is the
      KEPT tokens joined with single spaces (whitespace normalizes — the
      standard tokenizer-bound form of the op);
    * a token position is removed iff ANY duplicated window covers it;
      overlapping duplicated windows merge naturally via the position
      mask (an n>k-token shared block removes all n tokens);
    * spans repeated only WITHIN one doc are kept (cross-doc dedup);
    * docs shorter than ``k`` tokens pass through (re-joined).

    Returns Dataset(id_col, text, n_removed:int64).

    Scale shape (100 TB): the duplicated-span relation comes from
    ``duplicate_spans`` (hashed fixed-width phase-1 exchange, survivor-only
    string verify). The TRUE span set is the SMALL side by construction —
    recurring boilerplate/licence blocks, not the corpus — and is shipped
    once per node via ``ray.put`` as (sorted u64 span-hash array, exact
    string set); the removal pass is then embarrassingly row-local:
    re-window each doc, prefilter by hash (np.searchsorted), string-verify
    the rare hits (collisions cannot remove a non-duplicated window), mask
    covered positions, re-join. Three corpus scans total, zero additional
    shuffles. Swap the broadcast set for a Bloom filter + a second verify
    pass if survivors ever outgrow worker heaps (same escape hatch as
    ``duplicate_spans``)."""
    import numpy as np
    import ray

    spans_tbl = pa.concat_tables(
        ray.get(
            duplicate_spans(
                ds, id_col=id_col, text_col=text_col, k=k, min_docs=min_docs
            ).to_arrow_refs()
        )
    )
    span_list = spans_tbl.column("span").to_pylist()
    # hash each span with the SAME rolling hash the window pass uses: every
    # span is exactly k tokens by construction, so it is its own single
    # window
    if span_list:
        sflat, sstarts, _rep, _offs = _span_windows_offs(span_list, k)
        span_hashes = np.sort(_span_hashes(sflat, sstarts, k))
    else:
        span_hashes = np.empty(0, dtype=np.uint64)
    state_ref = ray.put((span_hashes, frozenset(span_list)))

    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    out_schema = pa.schema(
        [
            pa.field(id_col, id_type),
            pa.field("text", pa.string()),
            pa.field("n_removed", pa.int64()),
        ]
    )

    def remove_batch(batch: pa.Table) -> pa.Table:
        surv_arr, surv_set = ray.get(state_ref)
        texts = batch.column(text_col).to_pylist()
        flat, starts, doc_rep, offs = _span_windows_offs(texts, k)
        h = _span_hashes(flat, starts, k)
        if len(h) and len(surv_arr):
            idx = np.searchsorted(surv_arr, h)
            idx[idx >= len(surv_arr)] = len(surv_arr) - 1
            cand = surv_arr[idx] == h
        else:
            cand = np.zeros(len(h), dtype=bool)
        cand_idx = np.nonzero(cand)[0]
        if len(cand_idx):
            cand_spans = _span_strings(flat, starts[cand_idx], k).to_pylist()
            exact = np.fromiter(
                (s in surv_set for s in cand_spans),
                dtype=bool,
                count=len(cand_spans),
            )
            hit_starts = starts[cand_idx[exact]]
        else:
            hit_starts = starts[:0]
        removed_mask = np.zeros(len(flat), dtype=bool)
        if len(hit_starts):
            removed_mask[
                (hit_starts[:, None] + np.arange(k, dtype=np.int64)).ravel()
            ] = True
        out_texts: list = []
        n_removed = np.zeros(len(texts), dtype=np.int64)
        for r in range(len(texts)):
            seg = flat[offs[r] : offs[r + 1]]
            km = removed_mask[offs[r] : offs[r + 1]]
            n_removed[r] = int(km.sum())
            out_texts.append(" ".join(seg[~km]))
        return pa.table(
            {
                id_col: batch.column(id_col),
                "text": pa.array(out_texts, pa.string()),
                "n_removed": pa.array(n_removed),
            },
            schema=out_schema,
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        remove_batch, batch_format="pyarrow"
    )


def embedding_lsh_pairs(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bands: int = 8,
    hot_bucket_rows: int = 4096,
    sig_slack_sd: float = 3.0,
    seed: int = 0xE5D0_57A1,
):
    """APPROXIMATE embedding cosine near-dup — the corpus-scale path the
    exact ``embedding_near_dup_pairs`` docstring routes to.

    Random-hyperplane LSH (Charikar): every vector gets a 64-bit signature
    (bit h = sign(v . p_h), planes drawn once from a fixed-seed PCG64 —
    deterministic across workers/runs); signatures band like simhash, the
    bucket exchange carries (bucket, id, sig) fixed-size rows (NO vector
    payload — the minhash band-amplification lesson), hot buckets are
    grid-salted from the shared pigeonhole pre-count, and the in-bucket
    kernel prunes candidates by signature Hamming distance at
    ``mean + sig_slack_sd . sd`` of the flip distribution implied by the
    cosine threshold before the EXACT verify. Verification dots the
    L2-normalized vectors through the same two pair-keyed gather rounds as
    minhash (vectors ride each exchange once per doc + once per surviving
    candidate, independent of the band count). Recall is probabilistic
    (P[band collision] for a pair at exactly ``threshold`` is printed in
    tests/test_embedding_lsh.py); emitted pairs are exactly verified —
    no false positives."""
    import numpy as np

    from uk_address_matcher_ray.stages.grouped import grouped_map

    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]

    def normalize(batch: pa.Table) -> pa.Table:
        mat = _vectors_from_table(batch, vec_col)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        matn = (mat / norms[:, None]).ravel()
        n = batch.num_rows
        d = 0 if n == 0 else len(matn) // n
        offs = pa.array(np.arange(n + 1, dtype=np.int32) * d, pa.int32())
        return pa.table(
            {
                id_col: batch.column(id_col),
                "vec": pa.ListArray.from_arrays(
                    offs, pa.array(matn, pa.float64())
                ),
            }
        )

    vecs = (
        ds.select_columns([id_col, vec_col])
        .map_batches(normalize, batch_format="pyarrow")
        .materialize()
    )

    _planes_memo: dict = {}

    def _planes(dim: int) -> np.ndarray:
        p = _planes_memo.get(dim)
        if p is None:
            rng = np.random.default_rng(np.random.PCG64(seed))
            p = rng.standard_normal((dim, 64))
            _planes_memo[dim] = p
        return p

    def sig_batch(batch: pa.Table) -> pa.Table:
        mat = _vectors_from_table(batch, "vec")
        if mat.shape[0] == 0:
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "sig": pa.array([], pa.uint64()),
                }
            )
        bits = (mat @ _planes(mat.shape[1])) >= 0.0
        sig = (bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        )
        return pa.table(
            {id_col: batch.column(id_col), "sig": pa.array(sig, pa.uint64())}
        )

    sigs = vecs.map_batches(sig_batch, batch_format="pyarrow").materialize()

    # Hamming prefilter bound from the flip distribution at the threshold:
    # p_flip = arccos(t)/pi per bit, cut at mean + k.sd (generous, recall-
    # safe for pairs ABOVE the threshold whose p is smaller)
    p_flip = float(np.arccos(np.clip(threshold, -1.0, 1.0)) / np.pi)
    max_h = int(
        np.ceil(64 * p_flip + sig_slack_sd * np.sqrt(64 * p_flip * (1 - p_flip)))
    )

    width = 64 // bands
    wmask = np.uint64((1 << width) - 1)
    band_seeds = _splitmix64(
        np.arange(bands, dtype=np.uint64) << np.uint64(32)
    )

    def bkeys_of(tbl: pa.Table):
        s = tbl.column("sig").to_numpy(zero_copy_only=False).astype(np.uint64)
        cols = [
            _splitmix64(band_seeds[b] ^ ((s >> np.uint64(b * width)) & wmask))
            for b in range(bands)
        ]
        return np.stack(cols, axis=1).ravel()

    hot = _count_hot_buckets(sigs.to_arrow_refs(), bkeys_of, hot_bucket_rows)

    def emit_bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        bflat = bkeys_of(batch)
        idh = np.repeat(_id_hash_u64(batch.column(id_col)), bands)
        row_of = np.repeat(np.arange(n), bands)
        sel, bkey, cs, ct, salt = _expand_lsh_rows(
            bflat, idh, hot, hot_bucket_rows
        )
        take = pa.array(row_of[sel])
        return pa.table(
            {
                "bkey": pa.array(bkey, pa.uint64()),
                id_col: batch.column(id_col).take(take),
                "sig": batch.column("sig").take(take),
                "cs": pa.array(cs, pa.int32()),
                "ct": pa.array(ct, pa.int32()),
                "salt": pa.array(salt, pa.int32()),
            }
        )

    keyed = sigs.map_batches(emit_bands, batch_format="pyarrow")

    cand_schema = pa.schema(
        [pa.field("id_a", id_type), pa.field("id_b", id_type)]
    )

    def cand_kernel(tbl: pa.Table) -> pa.Table:
        bk = tbl.column("bkey").to_numpy(zero_copy_only=False)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        ss = tbl.column("sig").to_numpy(zero_copy_only=False).astype(np.uint64)
        css = tbl.column("cs").to_numpy(zero_copy_only=False)
        cts = tbl.column("ct").to_numpy(zero_copy_only=False)
        salts = tbl.column("salt").to_numpy(zero_copy_only=False)
        offs = _group_offsets(bk)
        parts_a, parts_b = [], []
        for gi in range(len(offs) - 1):
            s, e = offs[gi], offs[gi + 1]
            if e - s < 2:
                continue
            xi, yi = _cell_pair_indices(salts[s:e], int(css[s]), int(cts[s]))
            if len(xi) == 0:
                continue
            d = _popcount64(ss[s:e][xi] ^ ss[s:e][yi])
            ok = d <= max_h
            ia, ib = ids[s:e][xi][ok], ids[s:e][yi][ok]
            neq = ia != ib
            ia, ib = ia[neq], ib[neq]
            swap = ia > ib
            parts_a.append(np.where(swap, ib, ia))
            parts_b.append(np.where(swap, ia, ib))
        if not parts_a:
            return cand_schema.empty_table()
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(parts_a), id_type),
                "id_b": pa.array(np.concatenate(parts_b), id_type),
            }
        )

    raw = grouped_map(keyed, "bkey", None, cand_schema, fn_table=cand_kernel)

    def first_per_pair(tbl: pa.Table) -> pa.Table:
        a = tbl.column("id_a").to_numpy(zero_copy_only=False)
        b = tbl.column("id_b").to_numpy(zero_copy_only=False)
        keep = np.ones(len(a), dtype=bool)
        if len(a):
            keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return tbl.filter(pa.array(keep))

    cands = grouped_map(
        raw, ("id_a", "id_b"), None, cand_schema, fn_table=first_per_pair
    )

    # --- pair-keyed exact-cosine verify: two gather rounds ---------------
    union_schema = pa.schema(
        [
            pa.field("key", id_type),
            pa.field("tag", pa.int8()),
            pa.field("other", id_type),
            pa.field("vec", pa.list_(pa.float64())),
        ]
    )

    def cands_tagged(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": tbl.column("id_a"),
                "tag": pa.array(
                    np.ones(tbl.num_rows, dtype=np.int8), pa.int8()
                ),
                "other": tbl.column("id_b"),
                "vec": pa.nulls(tbl.num_rows, pa.list_(pa.float64())),
            }
        ).cast(union_schema)

    def vecs_tagged(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": tbl.column(id_col),
                "tag": pa.array(
                    np.zeros(tbl.num_rows, dtype=np.int8), pa.int8()
                ),
                "other": pa.nulls(tbl.num_rows, id_type),
                "vec": tbl.column("vec"),
            }
        ).cast(union_schema)

    union_a = vecs.map_batches(vecs_tagged, batch_format="pyarrow").union(
        cands.map_batches(cands_tagged, batch_format="pyarrow")
    )

    def attach_a(tbl: pa.Table) -> pa.Table:
        keys = tbl.column("key").to_numpy(zero_copy_only=False)
        tags = tbl.column("tag").to_numpy(zero_copy_only=False)
        others = tbl.column("other").to_numpy(zero_copy_only=False)
        vec_col_arr = _flat_list(tbl.column("vec"))
        voff = vec_col_arr.offsets.to_numpy(zero_copy_only=False)
        vval = vec_col_arr.values.to_numpy(zero_copy_only=False)
        offs = _group_offsets(keys)
        out_key, out_other, vparts = [], [], []
        for gi in range(len(offs) - 1):
            s, e = offs[gi], offs[gi + 1]
            doc = None
            for j in range(s, e):
                if tags[j] == 0:
                    doc = vval[voff[j] : voff[j + 1]]
                    break
            if doc is None:
                continue
            seen = set()
            for j in range(s, e):
                if tags[j] == 1 and others[j] not in seen:
                    seen.add(others[j])
                    out_key.append(others[j])
                    out_other.append(keys[j])
                    vparts.append(doc)
        if not out_key:
            return union_schema.empty_table()
        flat = np.concatenate(vparts)
        lens = np.array([len(v) for v in vparts], dtype=np.int64)
        offsets = pa.array(
            np.concatenate([[0], np.cumsum(lens)]).astype(np.int32), pa.int32()
        )
        return pa.table(
            {
                "key": pa.array(out_key, id_type),
                "tag": pa.array(
                    np.ones(len(out_key), dtype=np.int8), pa.int8()
                ),
                "other": pa.array(out_other, id_type),
                "vec": pa.ListArray.from_arrays(
                    offsets, pa.array(flat, pa.float64())
                ),
            }
        ).cast(union_schema)

    cands_a = grouped_map(union_a, "key", None, union_schema, fn_table=attach_a)

    out_schema = pa.schema(
        [
            pa.field("id_a", id_type),
            pa.field("id_b", id_type),
            pa.field("cosine", pa.float64()),
        ]
    )

    union_b = vecs.map_batches(vecs_tagged, batch_format="pyarrow").union(
        cands_a
    )

    def verify_b(tbl: pa.Table) -> pa.Table:
        keys = tbl.column("key").to_numpy(zero_copy_only=False)
        tags = tbl.column("tag").to_numpy(zero_copy_only=False)
        others = tbl.column("other").to_numpy(zero_copy_only=False)
        vec_col_arr = _flat_list(tbl.column("vec"))
        voff = vec_col_arr.offsets.to_numpy(zero_copy_only=False)
        vval = vec_col_arr.values.to_numpy(zero_copy_only=False)
        offs = _group_offsets(keys)
        out_a, out_b, out_c = [], [], []
        for gi in range(len(offs) - 1):
            s, e = offs[gi], offs[gi + 1]
            doc = None
            for j in range(s, e):
                if tags[j] == 0:
                    doc = vval[voff[j] : voff[j + 1]]
                    break
            if doc is None:
                continue
            for j in range(s, e):
                if tags[j] != 1:
                    continue
                va = vval[voff[j] : voff[j + 1]]
                cos = float(np.dot(va, doc))
                if cos >= threshold:
                    # key here is id_b; other is id_a (a < b preserved)
                    out_a.append(others[j])
                    out_b.append(keys[j])
                    out_c.append(cos)
        if not out_a:
            return out_schema.empty_table()
        return pa.table(
            {
                "id_a": pa.array(out_a, id_type),
                "id_b": pa.array(out_b, id_type),
                "cosine": pa.array(out_c, pa.float64()),
            }
        )

    return grouped_map(union_b, "key", None, out_schema, fn_table=verify_b)


# ---------------------------------------------------------------------------
# Near-dup dedup APPLY: pairs -> components -> one survivor per cluster
# ---------------------------------------------------------------------------

def near_dedup_docs(docs_ds, pairs_ds, id_col: str = "doc_id"):
    """The end-to-end corpus-dedup apply step: given a near-duplicate pair
    relation (id_a, id_b) from any of the pair operators (ngram_jaccard /
    minhash / simhash / embedding), keep ONE document per connected
    component (the minimum id) plus every document in no pair.

    Scale shape: components come from the shared label-propagation stage
    (broadcast rounds under the 16M-node cap, hash-sharded map-reduce
    beyond); the docs-minus-nodes anti-join is ONE exchange keyed on the
    doc id (tagged union + grouped_map), never a driver-side id set.
    Node ids ride propagation as zero-padded strings so the propagated
    min-label order equals numeric id order."""
    import numpy as np
    import pyarrow.compute as pc

    from uk_address_matcher_ray.stages.cluster import propagate_labels
    from uk_address_matcher_ray.stages.grouped import grouped_map

    id_type = dict(zip(docs_ds.schema().names, docs_ds.schema().types))[id_col]
    if not pa.types.is_integer(id_type):
        raise ValueError("near_dedup_docs expects an integer id column")

    def _pad(col):
        # 19 digits fits any non-negative int64; lexicographic == numeric
        return pc.utf8_lpad(pc.cast(col, pa.string()), 19, "0")

    def emit_edges(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema(
                [pa.field("src", pa.string()), pa.field("dst", pa.string())]
            ).empty_table()
        a = _pad(batch.column("id_a"))
        b = _pad(batch.column("id_b"))
        return pa.concat_tables(
            [pa.table({"src": a, "dst": b}), pa.table({"src": b, "dst": a})]
        ).combine_chunks()

    labels = propagate_labels(
        pairs_ds.select_columns(["id_a", "id_b"]).map_batches(
            emit_edges, batch_format="pyarrow"
        )
    )

    union_schema = pa.schema(
        [
            pa.field("k", id_type),
            pa.field("tag", pa.int8()),
            pa.field("survives", pa.bool_()),
        ]
    )

    def tag_docs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "k": batch.column(id_col),
                "tag": pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
                "survives": pa.array(np.ones(n, dtype=bool), pa.bool_()),
            }
        ).cast(union_schema)

    def tag_labels(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "k": pc.cast(batch.column("node"), id_type),
                "tag": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
                "survives": pc.equal(batch.column("node"), batch.column("label")),
            }
        ).cast(union_schema)

    tagged = docs_ds.select_columns([id_col]).map_batches(
        tag_docs, batch_format="pyarrow"
    ).union(labels.map_batches(tag_labels, batch_format="pyarrow"))

    out_schema = pa.schema([pa.field(id_col, id_type)])

    def kernel(tbl: pa.Table) -> pa.Table:
        ks = tbl.column("k").to_numpy(zero_copy_only=False)
        tags = tbl.column("tag").to_numpy(zero_copy_only=False)
        surv = tbl.column("survives").to_numpy(zero_copy_only=False)
        offs = _group_offsets(ks)
        out = []
        for gi in range(len(offs) - 1):
            s, e = offs[gi], offs[gi + 1]
            t = tags[s:e]
            has_doc = (t == 0).any()
            if not has_doc:
                continue  # a pair id absent from the docs table
            lab = np.flatnonzero(t == 1)
            if len(lab) == 0 or surv[s + lab[0]]:
                out.append(ks[s])
        return pa.table({id_col: pa.array(out, id_type)})

    return grouped_map(tagged, "k", None, out_schema, fn_table=kernel)
