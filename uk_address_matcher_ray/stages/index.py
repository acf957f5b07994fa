"""Inverted index build — token -> sorted distinct posting list, with
document-frequency bounds.

The retrieval/dedup-support primitive (BM25 backends, candidate lookup
for fuzzy matching, contamination auditing): for every surviving token,
the sorted distinct list of documents containing it.  Tokenization is
the dedup-family tokenizer (``dedup._tokens``: lower, whitespace split)
so the DuckDB oracle shares one split expression with the rest of the
text family.

Skew is THE problem for index builds: stopword tokens touch nearly
every document, so a naive (token, doc) groupby melts one reducer.  The
engine splits the build:

1. **DF pre-pass**: per-batch DISTINCT (token, doc) pairs reduce to
   (token, partial_df) rows — vocabulary-bounded per batch, never the
   corpus — merged by one skinny groupby.  Only tokens with
   ``df > max_df`` are collected to the driver: by Zipf's law the
   over-cap head is TINY (dozens of stopwords even at corpus scale),
   so the broadcast drop-set costs KBs while removing exactly the
   groups that would have been hot.
2. **Posting build**: emit DISTINCT-per-batch (token, doc) pairs for
   tokens NOT in the drop-set; one token-keyed ``grouped_map`` builds
   each posting list (sort by doc inside the complete group, global
   distinct, ListArray from run offsets — vectorized).  Group size is
   bounded by ``max_df`` BY CONSTRUCTION, so no reducer can melt.
   ``min_df`` filters in-group (df is the group size — known locally).

Output: (token, df:int64, postings:list<id>) with postings ascending.
The reference engine has no index counterpart; this is part of the
LLM-pipeline surface (brief: similarity / dedup support).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from uk_address_matcher_ray.stages.dedup import _tokens

_TOK_SPLIT_SQL = (
    "list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))),"
    " '\\s+'), t -> t != '')"
)


def _distinct_pairs(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """DISTINCT (token, id) pairs within one batch."""
    toks: list = []
    ids: list = []
    id_vals = batch.column(id_col).to_pylist()
    for i, text in enumerate(batch.column(text_col).to_pylist()):
        for t in set(_tokens(text)):
            toks.append(t)
            ids.append(id_vals[i])
    return pa.table(
        {
            "token": pa.array(toks, pa.string()),
            id_col: pa.array(ids, batch.schema.field(id_col).type),
        }
    )


def inverted_index(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df: Optional[int] = None,
):
    """-> Dataset(token, df, postings) under the df bounds above."""
    import ray

    from uk_address_matcher_ray.stages.grouped import grouped_map

    sch = ds.schema()
    if sch is None:  # empty dataset: row type is unknowable, pick int64
        return ray.data.from_arrow(
            pa.schema(
                [
                    pa.field("token", pa.string()),
                    pa.field("df", pa.int64()),
                    pa.field("postings", pa.list_(pa.int64())),
                ]
            ).empty_table()
        )
    id_type = dict(zip(sch.names, sch.types))[id_col]
    src = ds.select_columns([id_col, text_col])

    drop: frozenset = frozenset()
    if max_df is not None:
        def df_partial(batch: pa.Table) -> pa.Table:
            pairs = _distinct_pairs(batch, id_col, text_col)
            return (
                pairs.group_by("token")
                .aggregate([("token", "count")])
                .rename_columns(["token", "c"])
            )

        hot = (
            src.map_batches(df_partial, batch_format="pyarrow")
            .groupby("token")
            .sum("c")
            .filter(lambda r: r["sum(c)"] > max_df)
            .take_all()
        )  # Zipf head only: the over-cap stopword set is tiny
        drop = frozenset(r["token"] for r in hot)

    drop_ref = ray.put(drop)

    def emit(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        pairs = _distinct_pairs(batch, id_col, text_col)
        if d:
            keep = pa.array(
                [t not in d for t in pairs.column("token").to_pylist()]
            )
            pairs = pairs.filter(keep)
        return pairs

    out_schema = pa.schema(
        [
            pa.field("token", pa.string()),
            pa.field("df", pa.int64()),
            pa.field("postings", pa.list_(id_type)),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        t = t.combine_chunks()
        # global distinct + sort by (token, id): dictionary-encode the
        # token column so the sort/compare runs on int codes
        codes_arr = t.column("token").combine_chunks().dictionary_encode()
        codes = codes_arr.indices.to_numpy(zero_copy_only=False)
        ids = t.column(id_col)
        order = pc.sort_indices(
            pa.table({"c": pa.array(codes), "i": ids}),
            sort_keys=[("c", "ascending"), ("i", "ascending")],
        ).to_numpy(zero_copy_only=False)
        c_s = codes[order]
        ids_s = ids.take(pa.array(order))
        # drop duplicate (token, id) pairs surviving cross-batch
        if pa.types.is_integer(id_type):
            iv = ids_s.to_numpy(zero_copy_only=False)
            dup = np.concatenate(
                [[False], (c_s[1:] == c_s[:-1]) & (iv[1:] == iv[:-1])]
            )
        else:
            il = ids_s.to_pylist()
            dup = np.array(
                [False]
                + [
                    c_s[i] == c_s[i - 1] and il[i] == il[i - 1]
                    for i in range(1, len(il))
                ]
            )
        keep = ~dup
        c_k = c_s[keep]
        ids_k = ids_s.filter(pa.array(keep))
        offs = np.concatenate(
            [[0], np.flatnonzero(c_k[1:] != c_k[:-1]) + 1, [len(c_k)]]
        ).astype(np.int32)
        tok_vals = codes_arr.dictionary.take(pa.array(c_k[offs[:-1]]))
        df = np.diff(offs).astype(np.int64)
        postings = pa.ListArray.from_arrays(
            pa.array(offs), ids_k.combine_chunks()
        )
        out = pa.table(
            {
                "token": tok_vals,
                "df": pa.array(df),
                "postings": postings,
            },
            schema=out_schema,
        )
        if min_df > 1:
            out = out.filter(pc.greater_equal(out.column("df"), min_df))
        return out

    pairs_ds = src.map_batches(emit, batch_format="pyarrow")
    return grouped_map(pairs_ds, "token", None, out_schema, fn_table=finalize)


def inverted_index_sql(
    docs_from: str,
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df: Optional[int] = None,
) -> str:
    """DuckDB mirror: shared tokenizer split, DISTINCT pairs, df bounds,
    ``list(id ORDER BY id)`` postings."""
    upper = f"AND count(*) <= {max_df}" if max_df is not None else ""
    return f"""
WITH pairs AS (
  SELECT DISTINCT {id_col}, unnest(t) AS token
  FROM (SELECT {id_col}, {_TOK_SPLIT_SQL} AS t FROM ({docs_from}))
)
SELECT token,
       count(*) AS df,
       list({id_col} ORDER BY {id_col}) AS postings
FROM pairs
GROUP BY token
HAVING count(*) >= {min_df} {upper}
"""
