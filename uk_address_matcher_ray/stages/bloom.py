"""Bloom-filter benchmark decontamination (constant-memory broadcast side).

``stages/decontam.py`` broadcasts the benchmark set's EXACT k-gram set —
the right call when the eval set is thousands of documents.  When the
"do not train on this" side is itself large (a held-out corpus slice, a
licensing blocklist, another model's training set — the Dolma/BFF
regime), the exact set no longer broadcasts; the standard answer is a
Bloom filter: fixed ``m`` bits regardless of how many grams went in, at
a published false-positive rate ``(1 - e^(-k_h·n/m))^k_h``.

Everything here is DETERMINISTIC, so the DuckDB oracle reproduces the
filter bit-for-bit INCLUDING its false positives:

* **Hashing**: gram ``g`` sets bits ``int(md5(g)[8j : 8j+8], 16) % m``
  for ``j = 0..k_hashes-1`` — md5 hex slices, the same device the
  stratified sampler and hashed classifier use so DuckDB computes
  identical positions (``CAST('0x' || substr(md5(g), 1+8j, 8) AS
  UBIGINT) % m``).  md5 runs once per DISTINCT gram per batch (set
  dedup before hashing) with a per-worker memo on top.
* **Build** (``bloom_build``): one streaming pass emits per-batch
  PARTIAL ``m/8``-byte bit arrays (numpy ``bitwise_or`` over the
  batch's distinct-gram positions), OR-merged in a fan-in-8 tree of Ray
  tasks.  OR is commutative/associative/idempotent, so the filter is
  exact at any tree shape and duplicate grams across batches are free.
  Every intermediate is exactly ``m/8`` bytes — the build never holds a
  gram set anywhere.
* **Filter** (``bloom_filter_docs``): the bit array ships once via
  ``ray.put`` (per-worker memo); the corpus streams through one
  zero-shuffle ``map_batches`` — a doc is flagged when ANY of its
  k-grams has ALL ``k_hashes`` bits set.  Membership tests are
  vectorized numpy gathers ``(bits[p >> 3] >> (p & 7)) & 1`` over the
  distinct-gram position matrix.

Scale shape at 100 TB: the blocklist side streams once into ``m/8``
bytes (2^33 bits = 1 GiB handles ~600M grams at 1% FP with k_hashes=3);
the corpus side is embarrassingly parallel.  Compare
``decontam.benchmark_ngram_assets``, which is exact but
gram-set-sized.  Tokenization matches the dedup family
(``str.split()`` ≡ ``string_split_regex(text, '\\s+')`` sans empties).

The reference engine has no counterpart; this extends the engine's
LLM-pipeline decontamination surface (GPT-3 App. C exact 13-grams →
Dolma's Bloom-filter variant).
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pyarrow as pa

from uk_address_matcher_ray import util
from uk_address_matcher_ray.stages.dedup import _span_strings, _span_windows

# per-worker (gram, m, k_hashes) -> positions memo; vocab repeats across batches
_POS_MEMO: dict = {}


def _gram_positions(grams: List[str], m: int, k_hashes: int) -> np.ndarray:
    """(n_grams, k_hashes) int64 bit positions from md5 hex slices."""
    out = np.empty((len(grams), k_hashes), dtype=np.int64)
    for i, g in enumerate(grams):
        key = (g, m, k_hashes)
        pos = _POS_MEMO.get(key)
        if pos is None:
            hx = hashlib.md5(g.encode()).hexdigest()
            pos = tuple(
                int(hx[8 * j : 8 * j + 8], 16) % m for j in range(k_hashes)
            )
            _POS_MEMO[key] = pos
        out[i] = pos
    return out


def _distinct_grams(batch: pa.Table, text_col: str, k: int):
    """Batch -> (distinct gram strings, doc_rep per occurrence, grams per
    occurrence as dictionary indices) — md5 cost is per distinct gram."""
    texts = batch.column(text_col).to_pylist()
    flat, starts, doc_rep = _span_windows(texts, k)
    if len(starts) == 0:
        return [], doc_rep, np.empty(0, np.int64)
    spans = _span_strings(flat, starts, k)
    enc = spans.dictionary_encode()
    grams = enc.dictionary.to_pylist()
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return grams, doc_rep, idx


def bloom_build(
    ds,
    text_col: str = "text",
    k: int = 8,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
) -> np.ndarray:
    """Stream the blocklist corpus into an ``m_bits``-bit Bloom filter.

    Returns the packed bit array (uint8, little-bit-endian within each
    byte, length ``m_bits // 8``)."""
    import ray

    assert m_bits % 8 == 0
    nbytes = m_bits // 8

    def partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, dtype=np.uint8)
        grams, _rep, _idx = _distinct_grams(batch, text_col, k)
        if grams:
            pos = _gram_positions(grams, m_bits, k_hashes).ravel()
            np.bitwise_or.at(
                bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8)
            )
        return pa.table({"bf": pa.array([bits.tobytes()], pa.binary())})

    refs = list(
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )

    @ray.remote
    def merge(*tbls):
        acc = np.zeros(nbytes, dtype=np.uint8)
        for t in tbls:
            if "bf" not in t.schema.names:
                continue
            for buf in t.column("bf").to_pylist():
                acc |= np.frombuffer(buf, dtype=np.uint8)
        return pa.table({"bf": pa.array([acc.tobytes()], pa.binary())})

    while len(refs) > 1:
        refs = [merge.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
    if not refs:
        return np.zeros(nbytes, dtype=np.uint8)
    final = ray.get(refs[0])
    return np.frombuffer(final.column("bf").to_pylist()[0], dtype=np.uint8).copy()


def bloom_contains(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """(n, k_hashes) positions -> (n,) bool: all k bits set per row."""
    if pos.size == 0:
        return np.zeros(pos.shape[0], dtype=bool)
    hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return hit.all(axis=1)


def bloom_filter_docs(
    ds,
    bloom_assets,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
):
    """-> Dataset(id, contaminated): doc flagged when any k-gram is
    Bloom-positive (includes the filter's deterministic false positives —
    the semantics a Bloom decontaminator actually has).

    ``bloom_assets``: the packed bit array or a ``ray.put`` ref of it."""

    def kernel(batch: pa.Table) -> pa.Table:
        bits = util.get_broadcast(bloom_assets)
        grams, doc_rep, idx = _distinct_grams(batch, text_col, k)
        n_rows = batch.num_rows
        flagged = np.zeros(n_rows, dtype=bool)
        if grams:
            pos = _gram_positions(grams, m_bits, k_hashes)
            gram_hit = bloom_contains(bits, pos)
            occ_hit = gram_hit[idx]
            np.logical_or.at(flagged, doc_rep[occ_hit], True)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "contaminated": pa.array(flagged),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow"
    )


def bloom_decontaminate_sql(
    bench_pred: str,
    k: int = 8,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
) -> str:
    """DuckDB mirror over ``documents``: identical md5 bit positions, so
    the oracle reproduces the filter exactly — false positives included.
    ``bench_pred``: SQL predicate over doc_id selecting the blocklist side
    (corpus side = NOT pred)."""
    js = ", ".join(str(j) for j in range(k_hashes))

    def posexpr(col: str) -> str:
        return (
            f"CAST('0x' || substr(md5({col}), 1 + 8 * j, 8) AS UBIGINT)"
            f" % {m_bits}"
        )
    return f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
    FROM documents
),
js AS (SELECT unnest([{js}]) AS j),
bgrams AS (
    SELECT DISTINCT array_to_string(t[i + 1 : i + {k}], ' ') AS g
    FROM (SELECT t, unnest(range(len(t) - {k - 1})) AS i
          FROM toks WHERE ({bench_pred}) AND len(t) >= {k})
),
bits AS (SELECT DISTINCT {posexpr('g')} AS b FROM bgrams CROSS JOIN js),
cgrams AS (
    SELECT DISTINCT doc_id, array_to_string(t[i + 1 : i + {k}], ' ') AS g
    FROM (SELECT doc_id, t, unnest(range(len(t) - {k - 1})) AS i
          FROM toks WHERE NOT ({bench_pred}) AND len(t) >= {k})
),
hitg AS (
    SELECT cg.doc_id
    FROM cgrams cg CROSS JOIN js
    JOIN bits ON ({posexpr('cg.g')}) = bits.b
    GROUP BY cg.doc_id, cg.g
    HAVING count(DISTINCT js.j) = {k_hashes}
),
hits AS (SELECT DISTINCT doc_id FROM hitg)
SELECT toks.doc_id, (hits.doc_id IS NOT NULL) AS contaminated
FROM toks LEFT JOIN hits USING (doc_id)
WHERE NOT ({bench_pred})
"""
