"""Fixed-size overlapping token-window chunking (LLM pre-training prep).

Long documents are split into ``window``-token chunks every ``stride``
tokens (``stride < window`` gives the classic overlapped windows; GPT-2's
WebText prep and most open pre-training pipelines carry this step between
curation and packing — ``stages/packing.py`` consumes what this emits).

Shape at 100 TB: chunking is row-local — ONE zero-shuffle ``map_batches``
pass, no state, no exchange.  The kernel is vectorized end-to-end after
the C-level per-row ``str.split`` (the dedup-family tokenizer contract,
``stages/dedup._span_windows``): chunk counts / starts / lengths are
numpy offset algebra, token gathers are one Arrow ``take``, and chunk
text is ONE ``pyarrow.compute.binary_join`` over a ListArray — no Python
join loop.  Output bytes are bounded by ``window / stride`` × input
bytes (the overlap factor), so object-store amplification is the stated
ratio, not data-dependent.

Chunk rule (stated so the DuckDB oracle can run the IDENTICAL formula):
tokens = whitespace-split with empties dropped, case PRESERVED (chunks
are training payload, unlike the dedup family's lowered keys); chunk
starts are 0, stride, 2·stride, … while start < n_tokens; each chunk is
``tokens[start : start + window]`` (the last chunk may be short);
``chunk_id = start // stride``.  Token-less docs emit no chunks.

The reference engine has no chunking counterpart; this is part of the
LLM-pipeline surface this engine adds (brief: training-data prep).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_OUT_FIELDS = [
    pa.field("chunk_id", pa.int64()),
    pa.field("n_tokens", pa.int64()),
    pa.field("chunk_text", pa.string()),
]


def chunk_documents(
    ds,
    *,
    window: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """-> Dataset(id, chunk_id, n_tokens, chunk_text) — zero shuffles."""
    if not (0 < stride <= window):
        raise ValueError("need 0 < stride <= window")
    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    out_schema = pa.schema([pa.field(id_col, id_type)] + _OUT_FIELDS)

    def kernel(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        if not texts:
            return out_schema.empty_table()
        toks_per_row = [(t or "").split() for t in texts]
        lens = np.fromiter(
            (len(t) for t in toks_per_row), dtype=np.int64, count=len(texts)
        )
        flat = np.empty(int(lens.sum()), dtype=object)
        pos = 0
        for t in toks_per_row:
            flat[pos : pos + len(t)] = t
            pos += len(t)
        offs = np.concatenate([[0], np.cumsum(lens)])
        nch = -(-lens // stride)  # ceil; 0 for empty docs
        total = int(nch.sum())
        if total == 0:
            return out_schema.empty_table()
        doc_rep = np.repeat(np.arange(len(texts), dtype=np.int64), nch)
        # chunk ordinal within its doc: 0..nch[d]-1, concatenated
        ords = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(nch) - nch, nch
        )
        starts = ords * stride
        clens = np.minimum(starts + window, lens[doc_rep]) - starts
        # flat token indices of every chunk: one repeat/cumsum ramp
        coffs = np.concatenate([[0], np.cumsum(clens)])
        ramp = np.arange(int(coffs[-1]), dtype=np.int64) - np.repeat(
            coffs[:-1], clens
        )
        idx = np.repeat(offs[doc_rep] + starts, clens) + ramp
        taken = pa.array(flat[idx], pa.string())
        lst = pa.ListArray.from_arrays(pa.array(coffs, pa.int32()), taken)
        return pa.Table.from_arrays(
            [
                batch.column(id_col).take(pa.array(doc_rep)).combine_chunks(),
                pa.array(ords, pa.int64()),
                pa.array(clens, pa.int64()),
                pc.binary_join(lst, " "),
            ],
            schema=out_schema,
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow"
    )


def chunk_documents_sql(
    window: int,
    stride: int,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror: identical split / start-grid / slice formula."""
    return f"""
WITH d AS (
    SELECT {id_col},
           list_filter(regexp_split_to_array(coalesce({text_col}, ''), '\\s+'),
                       t -> t != '') AS t
    FROM {table}
),
c AS (
    SELECT {id_col}, t, unnest(range(0, len(t), {stride})) AS s
    FROM d WHERE len(t) > 0
)
SELECT {id_col},
       s // {stride} AS chunk_id,
       CAST(least(s + {window}, len(t)) - s AS BIGINT) AS n_tokens,
       array_to_string(t[s + 1 : least(s + {window}, len(t))], ' ') AS chunk_text
FROM c
"""
