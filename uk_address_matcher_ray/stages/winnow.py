"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
"Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
algorithm) and the shared-fingerprint candidate-pair join.

Winnowing guarantees that any match of at least ``w + k - 1`` consecutive
tokens between two documents shares at least one SELECTED fingerprint —
a local, position-aware near-dup signal the minhash/simhash family
(global set similarity) cannot give.  It is the standard plagiarism /
local-overlap detector and complements ``duplicate_spans`` (which finds
EXACT repeated spans; winnowing's selected grams survive edits between
the shared regions).

Selection rule (stated so the DuckDB oracle runs the IDENTICAL formula):
tokens are the dedup-family tokenizer (lower, whitespace split); grams
are k-token shingles (``functions/hashing.shingles`` convention: a doc
shorter than k contributes one whole-doc gram); gram hash is the
engine-wide ``h60`` (md5-based, SQL-mirrorable — NOT the splitmix chain,
whose polars token hash has no SQL mirror); every window of ``w``
consecutive gram hashes selects its MINIMUM, ties broken by the
RIGHTMOST position; a doc with fewer than ``w`` grams is one window.
The fingerprint set is the DISTINCT (doc, pos, hash) selections —
positions kept so downstream extent-matching can locate the overlap.

Scale shape at 100 TB:

* ``winnow_fingerprints`` is row-local — ONE zero-shuffle map_batches
  pass; the sliding-window min is one numpy ``sliding_window_view``
  reduction over the batch's flat gram-hash array (windows straddling a
  doc boundary masked out), so cost is vectorized O(tokens · w) with no
  per-row Python beyond ``str.split``.  Output is ~2/(w+1) selected
  grams per token (the paper's density bound) of 24-byte rows.
* ``winnow_pairs`` is the bucketed-exchange shape of the minhash
  family: fingerprints (already skinny) hash-exchange on the 60-bit
  fingerprint, per-group distinct docs emit pairs, and a SECOND
  exchange keyed on ``id_a`` merges per-pair counts.  Boilerplate
  fingerprints (shared by > ``max_df`` docs) are DROPPED before pairing
  — the inverted-index Zipf-head argument: a gram in thousands of docs
  is template text and would otherwise cost O(df²) pair rows.  The cap
  is part of the operator contract and mirrored in the oracle.

The reference engine has no fingerprinting counterpart; this is part of
the LLM-pipeline surface this engine adds (brief: doc fingerprinting).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from uk_address_matcher_ray.functions import hashing as H
from uk_address_matcher_ray.stages.dedup import _tokens


def _doc_fingerprints(texts, k: int, w: int):
    """Per-batch selection -> (doc_rep, pos, h) numpy arrays."""
    grams_per_doc = []
    for t in texts:
        toks = _tokens(t)
        grams_per_doc.append(H.shingles(toks, k) if toks else [])
    lens = np.fromiter(
        (len(g) for g in grams_per_doc), dtype=np.int64, count=len(texts)
    )
    total = int(lens.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    flat_h = np.fromiter(
        (H.h60(g) for doc in grams_per_doc for g in doc),
        dtype=np.int64,
        count=total,
    )
    offs = np.concatenate([[0], np.cumsum(lens)])
    doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), lens)

    sel_g: list = []  # global gram indices selected
    if total >= w:
        V = np.lib.stride_tricks.sliding_window_view(flat_h, w)
        # valid window ends: whole window inside one doc
        ends = np.arange(w - 1, total, dtype=np.int64)
        valid = doc_of[ends] == doc_of[ends - (w - 1)]
        if valid.any():
            Vv = V[valid]
            # rightmost argmin: argmin over the reversed window
            idx = (w - 1) - np.argmin(Vv[:, ::-1], axis=1)
            sel_g.append(ends[valid] - (w - 1) + idx)
    # docs with fewer than w grams: one window over all their grams
    for d in np.flatnonzero((lens > 0) & (lens < w)):
        seg = flat_h[offs[d] : offs[d + 1]]
        j = (len(seg) - 1) - int(np.argmin(seg[::-1]))
        sel_g.append(np.array([offs[d] + j], dtype=np.int64))
    sel = np.unique(np.concatenate(sel_g)) if sel_g else np.empty(0, np.int64)
    return doc_of[sel], sel - offs[doc_of[sel]], flat_h[sel]


def winnow_fingerprints(
    ds, k: int = 5, w: int = 4, id_col: str = "doc_id", text_col: str = "text"
):
    """-> Dataset(id, pos, fp) — zero shuffles; ``pos`` is the selected
    gram's token offset in its doc, ``fp`` the 60-bit gram hash."""
    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    out_schema = pa.schema(
        [
            pa.field(id_col, id_type),
            pa.field("pos", pa.int64()),
            pa.field("fp", pa.int64()),
        ]
    )

    def kernel(batch: pa.Table) -> pa.Table:
        doc_rep, pos, h = _doc_fingerprints(
            batch.column(text_col).to_pylist(), k, w
        )
        return pa.Table.from_arrays(
            [
                batch.column(id_col).take(pa.array(doc_rep)).combine_chunks(),
                pa.array(pos, pa.int64()),
                pa.array(h, pa.int64()),
            ],
            schema=out_schema,
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow"
    )


def winnow_pairs(
    fp_ds,
    min_shared: int = 2,
    max_df: int = 64,
    id_col: str = "doc_id",
):
    """-> Dataset(id_a, id_b, n_shared): doc pairs sharing >= min_shared
    DISTINCT fingerprint hashes (each counted once however many positions
    repeat it); fingerprints in more than ``max_df`` docs are dropped."""
    from uk_address_matcher_ray.stages.grouped import grouped_map

    id_type = dict(zip(fp_ds.schema().names, fp_ds.schema().types))[id_col]
    pair_schema = pa.schema(
        [pa.field("id_a", id_type), pa.field("id_b", id_type)]
    )
    out_schema = pa.schema(
        [
            pa.field("id_a", id_type),
            pa.field("id_b", id_type),
            pa.field("n_shared", pa.int64()),
        ]
    )

    # skinny (id, fp) rows, de-duplicated per batch before the exchange
    dedup = fp_ds.map_batches(
        lambda t: t.select([id_col, "fp"])
        .group_by([id_col, "fp"])
        .aggregate([]),
        batch_format="pyarrow",
    )

    def emit_pairs(tbl: pa.Table) -> pa.Table:
        """Complete fp groups -> one (id_a, id_b) row per (pair, fp)."""
        t = tbl.group_by(["fp", id_col]).aggregate([])  # global distinct
        order = pa.compute.sort_indices(
            t, sort_keys=[("fp", "ascending"), (id_col, "ascending")]
        )
        t = t.take(order)
        fps = t.column("fp").to_numpy(zero_copy_only=False)
        ids = t.column(id_col)
        starts = np.flatnonzero(
            np.concatenate([[True], fps[1:] != fps[:-1]])
        )
        counts = np.diff(np.append(starts, len(fps)))
        a_idx: list = []
        b_idx: list = []
        for s, c in zip(starts, counts):
            if c < 2 or c > max_df:
                continue
            for i in range(s, s + c):
                for j in range(i + 1, s + c):
                    a_idx.append(i)
                    b_idx.append(j)
        return pa.Table.from_arrays(
            [
                ids.take(pa.array(a_idx, pa.int64())).combine_chunks(),
                ids.take(pa.array(b_idx, pa.int64())).combine_chunks(),
            ],
            schema=pair_schema,
        )

    pairs = grouped_map(dedup, "fp", None, pair_schema, fn_table=emit_pairs)

    def count_pairs(tbl: pa.Table) -> pa.Table:
        agg = tbl.group_by(["id_a", "id_b"]).aggregate([([], "count_all")])
        agg = agg.rename_columns(["id_a", "id_b", "n_shared"])
        keep = pa.compute.greater_equal(agg.column("n_shared"), min_shared)
        return agg.filter(keep).cast(out_schema)

    return grouped_map(pairs, "id_a", None, out_schema, fn_table=count_pairs)


def winnow_fingerprints_sql(
    k: int = 5,
    w: int = 4,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror: identical shingle grid, h60 hashes, window min with
    rightmost tie-break, single window for short docs."""
    gram = H.h60_sql(f"array_to_string(t[i : i + {k - 1}], ' ')")
    return f"""
WITH toks AS (
    SELECT {id_col},
           list_filter(regexp_split_to_array(lower(trim(coalesce({text_col}, ''))), '\\s+'),
                       t -> t != '') AS t
    FROM {table}
),
g AS (
    SELECT {id_col}, CAST(i - 1 AS BIGINT) AS pos, {gram} AS h
    FROM (SELECT {id_col}, t,
                 unnest(range(1, greatest(len(t) - {k} + 1, 1) + 1)) AS i
          FROM toks WHERE len(t) > 0)
),
m AS (SELECT {id_col}, count(*) AS m FROM g GROUP BY {id_col}),
wm AS (
    SELECT {id_col}, pos AS e, min(h) OVER win AS mh
    FROM g
    WINDOW win AS (PARTITION BY {id_col} ORDER BY pos
                   ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)
),
ends AS (
    SELECT wm.{id_col}, wm.e, wm.mh
    FROM wm JOIN m USING ({id_col})
    WHERE wm.e >= least({w - 1}, m.m - 1)
)
SELECT DISTINCT ends.{id_col}, max(g.pos) AS pos, ends.mh AS fp
FROM ends JOIN g ON g.{id_col} = ends.{id_col} AND g.h = ends.mh
      AND g.pos BETWEEN ends.e - {w - 1} AND ends.e
GROUP BY ends.{id_col}, ends.e, ends.mh
"""


def winnow_pairs_sql(
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 64,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    fp_sql = winnow_fingerprints_sql(k, w, table, id_col, text_col)
    return f"""
WITH fp AS MATERIALIZED (
    SELECT DISTINCT {id_col}, fp FROM ({fp_sql})
),
keepable AS (
    SELECT fp FROM (
        SELECT fp, count(DISTINCT {id_col}) AS df FROM fp GROUP BY fp
    ) WHERE df BETWEEN 2 AND {max_df}
)
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fp a JOIN fp b ON a.fp = b.fp AND a.{id_col} < b.{id_col}
WHERE a.fp IN (SELECT fp FROM keepable)
GROUP BY 1, 2
HAVING count(*) >= {min_shared}
"""
