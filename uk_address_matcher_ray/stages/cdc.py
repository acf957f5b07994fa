"""Content-defined chunking (CDC) — split every document into chunks
whose boundaries depend only on LOCAL content, the dedup-storage /
incremental-sync primitive (Muthitacharoen et al., LBFS SOSP'01;
FastCDC ATC'16).  Insert one sentence at the top of a 10 MB page and a
fixed-size chunker shifts every downstream chunk; a CDC chunker re-syncs
at the next content boundary, so all but one chunk hash is unchanged —
which is what makes chunk-level dedup across crawl snapshots work.

Token-level variant (mirrored by ``cdc_chunks_sql``):

* tokens: the dedup-family tokenizer, 0-based positions;
* gram hash at position ``i >= k-1``:
  ``g_i = h60(" ".join(tokens[i-k+1 .. i]))`` (the winnowing gram);
* position ``i`` is a CUT iff ``g_i % divisor == 0`` — the chunk ends
  AT ``i`` inclusive; expected chunk length ≈ ``divisor`` tokens;
* ``chunk_idx(p)`` = number of cuts strictly before ``p``; docs shorter
  than ``k`` tokens are one chunk; empty docs emit nothing;
* per chunk: ``start_pos`` (0-based), ``n_tokens``,
  ``chunk_hash = h60(" ".join(chunk tokens))``.

Scale shape: ZERO shuffles — one row-local ``map_batches`` pass whose
output is the skinny (id, idx, pos, n, hash) table; the chunk TEXT
never leaves the task (downstream chunk-dedup joins on ``chunk_hash``,
the same shape as duplicate_spans' hashed exchange).  No min/max chunk
clamps: those make the cut decision depend on the previous cut
(sequential state); the plain divisor rule keeps every position
independently decidable, which is what lets the operator vectorize and
the oracle stay a window expression.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from uk_address_matcher_ray.functions import hashing as H
from uk_address_matcher_ray.stages.dedup import _tokens


def cdc_chunks(
    ds,
    k: int = 4,
    divisor: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """-> Dataset(id_col, chunk_idx, start_pos, n_tokens, chunk_hash)."""
    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]

    def chunk_batch(batch: pa.Table) -> pa.Table:
        out_id, out_idx, out_pos, out_n, out_h = [], [], [], [], []
        for did, text in zip(
            batch.column(id_col).to_pylist(),
            batch.column(text_col).to_pylist(),
        ):
            toks = _tokens(text)
            n = len(toks)
            if n == 0:
                continue
            cuts = np.zeros(n, dtype=bool)
            for i in range(k - 1, n):
                g = H.h60(" ".join(toks[i - k + 1 : i + 1]))
                cuts[i] = g % divisor == 0
            # chunk index of position p = cuts strictly before p
            idx = np.concatenate([[0], np.cumsum(cuts)[:-1]])
            for ci in range(int(idx[-1]) + 1):
                mask = idx == ci
                pos = np.flatnonzero(mask)
                seg = toks[pos[0] : pos[-1] + 1]
                out_id.append(did)
                out_idx.append(ci)
                out_pos.append(int(pos[0]))
                out_n.append(len(seg))
                out_h.append(H.h60(" ".join(seg)))
        return pa.table(
            {
                id_col: pa.array(out_id, id_type),
                "chunk_idx": pa.array(out_idx, pa.int64()),
                "start_pos": pa.array(out_pos, pa.int64()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "chunk_hash": pa.array(out_h, pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        chunk_batch, batch_format="pyarrow"
    )


def cdc_chunks_sql(
    table: str = "documents",
    k: int = 4,
    divisor: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror: identical gram hash, cut rule, window cut-count."""
    split = (
        "list_filter(regexp_split_to_array(lower(trim(coalesce("
        f"{text_col}, ''))), '\\s+'), t -> t != '')"
    )
    gram = H.h60_sql(f"array_to_string(t[i - {k - 1} : i], ' ')")
    return f"""
WITH toks AS (
    SELECT {id_col}, {split} AS t FROM {table}
),
pos AS (
    SELECT {id_col}, t, unnest(range(1, len(t) + 1)) AS i
    FROM toks WHERE len(t) > 0
),
g AS (
    SELECT {id_col}, i, t[i] AS tok,
           CASE WHEN i >= {k} AND ({gram}) % {divisor} = 0
                THEN 1 ELSE 0 END AS cut
    FROM pos
),
idx AS (
    SELECT {id_col}, i, tok,
           COALESCE(SUM(cut) OVER (PARTITION BY {id_col} ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS chunk_idx
    FROM g
)
SELECT {id_col}, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(MIN(i) - 1 AS BIGINT) AS start_pos,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       {H.h60_sql("string_agg(tok, ' ' ORDER BY i)")} AS chunk_hash
FROM idx GROUP BY {id_col}, chunk_idx
"""
