"""Feature-hashing text embeddings (the "hashing trick", Weinberger et
al. 2009) — a fixed-dimension signed token-count projection that turns
arbitrary text into a dense integer vector with NO trained vocabulary.

The cheapest embedding a training-data pipeline owns: downstream of it
the whole similarity family (ann_topk / ivf_topk / semdedup / kmeans)
runs over text that never saw a model.  The defining property vs a TF
table is that the map ``token -> (bucket, sign)`` is a pure hash — no
asset pass, no vocabulary state, nothing to broadcast — so the operator
is ONE zero-shuffle ``map_batches`` pass regardless of corpus size.

Contract (mirrored bit-exactly by ``hash_embed_sql``):

* tokens: the dedup-family tokenizer — lower, strip, split ``\\s+``,
  drop empties (``dedup._tokens`` == the repo-wide ``_TOK_SPLIT_SQL``);
* per token ``t``: ``hx = md5(f"he{seed}:{t}").hexdigest()``,
  ``bucket = int(hx[:16], 16) % dim``,
  ``sign = +1 if int(hx[16], 16) % 2 == 0 else -1``;
* ``embedding[b] = sum of sign over token OCCURRENCES hashed to b`` —
  pure integer arithmetic, order-free, no float anywhere;
* every doc gets a dense length-``dim`` vector (no-token docs are all
  zeros).

Scale shape: zero exchanges; per-actor md5 memo capped at
``memo_cap`` entries (an unbounded token memo is exactly the driver-
vocabulary anti-pattern — beyond the cap tokens are hashed straight
through, same result, just no cache hit).  The reference engine has no
embedding surface; this is LLM-pipeline surface (brief: similarity
search / multimodal plumbing).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from uk_address_matcher_ray.stages.dedup import flat_tokens

_TOK_SPLIT_SQL = (
    "list_filter(regexp_split_to_array(lower(trim(coalesce({x}, ''))),"
    " '\\s+'), t -> t != '')"
)


def _bucket_sign(tok: str, dim: int, seed: int):
    hx = hashlib.md5(f"he{seed}:{tok}".encode()).hexdigest()
    bucket = int(hx[:16], 16) % dim
    sign = 1 if int(hx[16], 16) % 2 == 0 else -1
    return bucket, sign


class _EmbedStage:
    """Per-worker stage: md5 memo built lazily, capped; vectorized
    tokenize + distinct-only hashing + bincount scatter-add."""

    def __init__(self, dim: int, seed: int, id_col: str, text_col: str,
                 memo_cap: int):
        self.dim = dim
        self.seed = seed
        self.id_col = id_col
        self.text_col = text_col
        self.memo_cap = memo_cap
        self.memo: dict = {}

    def _bs(self, tok: str):
        bs = self.memo.get(tok)
        if bs is None:
            bs = _bucket_sign(tok, self.dim, self.seed)
            if len(self.memo) < self.memo_cap:
                self.memo[tok] = bs
        return bs

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # vectorized path: tokenize with the shared Arrow kernel chain,
        # md5 only the DISTINCT tokens of the batch (dictionary encode),
        # then one bincount scatter-add over (row, bucket) — signs are
        # ±1 and per-cell sums are token counts, so the float64 bincount
        # accumulator is exact (< 2^53 by construction).
        parents, toks = flat_tokens(batch.column(self.text_col))
        acc = np.zeros(n * self.dim, dtype=np.int64)
        if len(toks):
            enc = toks.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            bs = np.empty((len(enc.dictionary), 2), dtype=np.int64)
            for j, t in enumerate(enc.dictionary.to_pylist()):
                bs[j] = self._bs(t)
            cells = parents * self.dim + bs[codes, 0]
            acc += np.bincount(
                cells, weights=bs[codes, 1], minlength=n * self.dim
            ).astype(np.int64)
        flat = pa.array(acc, pa.int64())
        offsets = pa.array(
            np.arange(0, (n + 1) * self.dim, self.dim, dtype=np.int32)
        )
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "embedding": pa.ListArray.from_arrays(offsets, flat),
            }
        )


def hash_embed(
    ds,
    dim: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
    concurrency=None,
    memo_cap: int = 1_000_000,
):
    """-> Dataset(id_col, embedding: list<int64> of length ``dim``)."""

    def embed(batch: pa.Table) -> pa.Table:
        return _get_stage(dim, seed, id_col, text_col, memo_cap)(batch)

    return ds.select_columns([id_col, text_col]).map_batches(
        embed, batch_format="pyarrow", concurrency=concurrency
    )


_STAGE_MEMO: dict = {}


def _get_stage(dim, seed, id_col, text_col, memo_cap) -> _EmbedStage:
    """Per-worker-process stage memo: task-based map_batches (no
    actor-pool spawn latency) while the md5 token memo still persists
    across batches on the same worker."""
    key = (dim, seed, id_col, text_col, memo_cap)
    st = _STAGE_MEMO.get(key)
    if st is None:
        st = _EmbedStage(dim, seed, id_col, text_col, memo_cap)
        if len(_STAGE_MEMO) > 16:
            _STAGE_MEMO.clear()
        _STAGE_MEMO[key] = st
    return st


def hash_embed_sql(
    table: str = "documents",
    dim: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
) -> str:
    """DuckDB mirror: identical md5 bucket/sign, dense ordered list."""
    toks = _TOK_SPLIT_SQL.format(x=text_col)
    return f"""
WITH toks AS (
    SELECT {id_col}, unnest({toks}) AS tok FROM {table}
),
hashed AS (
    SELECT {id_col},
           CAST(CAST('0x' || substr(md5('he{seed}:' || tok), 1, 16)
                     AS UBIGINT) % {dim} AS BIGINT) AS b,
           CASE WHEN CAST('0x' || substr(md5('he{seed}:' || tok), 17, 1)
                          AS UBIGINT) % 2 = 0
                THEN 1 ELSE -1 END AS sgn
    FROM toks
),
sums AS (
    SELECT {id_col}, b, SUM(sgn) AS v FROM hashed GROUP BY {id_col}, b
),
dense AS (
    SELECT d.{id_col}, r.b, CAST(COALESCE(s.v, 0) AS BIGINT) AS v
    FROM {table} d
    CROSS JOIN (SELECT unnest(range({dim})) AS b) r
    LEFT JOIN sums s ON s.{id_col} = d.{id_col} AND s.b = r.b
)
SELECT {id_col}, list(v ORDER BY b) AS embedding
FROM dense GROUP BY {id_col}
"""
