"""Top-k most frequent word n-grams per group (corpus analytics).

Stopword-list induction, boilerplate phrase mining, and corpus QA
reports all start from "the most common n-grams per language/source".
Unlike ``group_cap`` (md5 rank — batch-local winners ARE global
winners), frequency top-k is NOT prunable per batch: a gram's global
count is spread across batches, so dropping batch-local losers can drop
a global winner.  The exact shape is therefore the TF shape:

* **Partial**: per-batch ``(group, gram, count)`` pre-aggregation — the
  exchange carries the batch's DISTINCT grams, never the corpus
  positions (web text repeats heavily; this is the same compression the
  TF builder gets).
* **Exchange + finalize**: one group-keyed ``grouped_map``; per complete
  group, sum counts and keep the k largest with a deterministic
  tie-break (count desc, gram asc) — stated identically in the DuckDB
  window mirror.

Scale: the exchange is vocabulary×groups-bounded, not corpus-bounded —
the same premise as ``stages/tf.py`` (and the same cure if the n-gram
vocabulary explodes: a count floor, which for top-k is SAFE once
``floor <= true k-th count / upstream-block count`` is violated only by
grams that cannot reach the top-k; the approximate path is a count-min
sketch + candidate re-count, not implemented).  Tokenization is the
dedup-family tokenizer (lower, whitespace split).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from uk_address_matcher_ray.stages.dedup import _tokens


def _gram_partial(batch: pa.Table, n: int, group_col: str, text_col: str):
    groups: list = []
    grams: list = []
    gvals = batch.column(group_col).to_pylist()
    for g, text in zip(gvals, batch.column(text_col).to_pylist()):
        toks = _tokens(text)
        for i in range(len(toks) - n + 1):
            groups.append(g)
            grams.append(" ".join(toks[i : i + n]))
    if not grams:
        return pa.table(
            {
                "g": pa.array([], pa.string()),
                "gram": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
            }
        )
    t = pa.table(
        {
            "g": pa.array(groups, pa.string()),
            "gram": pa.array(grams, pa.string()),
        }
    )
    return (
        t.group_by(["g", "gram"])
        .aggregate([([], "count_all")])
        .rename_columns(["g", "gram", "c"])
    )


def ngram_topk(
    ds,
    k: int,
    n: int = 2,
    group_col: str = "lang",
    text_col: str = "text",
):
    """-> Dataset(group, gram, cnt): the k most frequent word n-grams per
    group (count desc, gram asc tie-break)."""
    from uk_address_matcher_ray.stages.grouped import grouped_map

    def finalize(tbl: pa.Table) -> pa.Table:
        merged = tbl.group_by(["g", "gram"]).aggregate([("c", "sum")])
        order = pa.compute.sort_indices(
            merged,
            sort_keys=[
                ("g", "ascending"),
                ("c_sum", "descending"),
                ("gram", "ascending"),
            ],
        )
        s = merged.take(order)
        gcol = s.column("g")
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        enc = gcol.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = pa.compute.fill_null(enc.indices, -1).to_numpy(
            zero_copy_only=False
        )
        m = len(codes)
        idx = np.arange(m, dtype=np.int64)
        newg = np.empty(m, dtype=bool)
        if m:
            newg[0] = True
            newg[1:] = codes[1:] != codes[:-1]
        starts = np.maximum.accumulate(np.where(newg, idx, 0)) if m else idx
        kept = s.filter(pa.array(idx - starts < k))
        return pa.table(
            {
                "g": kept.column("g"),
                "gram": kept.column("gram"),
                "cnt": kept.column("c_sum").cast(pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            pa.field("g", pa.string()),
            pa.field("gram", pa.string()),
            pa.field("cnt", pa.int64()),
        ]
    )
    pre = ds.select_columns([group_col, text_col]).map_batches(
        lambda b: _gram_partial(b, n, group_col, text_col),
        batch_format="pyarrow",
    )
    return grouped_map(pre, "g", None, out_schema, fn_table=finalize)


def ngram_topk_sql(
    k: int,
    n: int = 2,
    group_col: str = "lang",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB mirror: identical tokenization, counts and tie-break."""
    tok_split = (
        f"list_filter(regexp_split_to_array(lower(trim(coalesce({text_col},"
        " ''))), '\\s+'), t -> t != '')"
    )
    return f"""
WITH docs AS (SELECT {group_col} AS g, {tok_split} AS t FROM {table}),
grams AS (
    SELECT g, array_to_string(t[i + 1 : i + {n}], ' ') AS gram
    FROM (SELECT g, t, unnest(range(len(t) - {n - 1})) AS i
          FROM docs WHERE len(t) >= {n})
),
cnts AS (SELECT g, gram, count(*) AS cnt FROM grams GROUP BY g, gram),
rnk AS (
    SELECT *, row_number() OVER (
        PARTITION BY g ORDER BY cnt DESC, gram ASC) AS rn
    FROM cnts
)
SELECT g, gram, cnt FROM rnk WHERE rn <= {k}
"""


# ---------------------------------------------------------------------------
# Approximate path: count-min sketch + candidate re-count
# ---------------------------------------------------------------------------

def _cms_rows(keys_u64: "np.ndarray", width: int, depth: int) -> "np.ndarray":
    """(len, depth) CMS row indices for pre-hashed 64-bit keys."""
    from uk_address_matcher_ray.stages.dedup import _splitmix64

    seeds = _splitmix64(
        np.arange(1, depth + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    )
    return np.stack(
        [
            (_splitmix64(keys_u64 ^ seeds[d]) % np.uint64(width)).astype(np.int64)
            for d in range(depth)
        ],
        axis=1,
    )


def ngram_topk_approx(
    ds,
    k: int,
    n: int = 2,
    group_col: str = "lang",
    text_col: str = "text",
    width: int = 1 << 14,
    depth: int = 4,
    candidate_m: int = 0,
    recount: bool = True,
):
    """The exact operator's documented scale path for exploding gram
    vocabularies: count-min sketch + candidate re-count.

    The exact ``ngram_topk`` exchange is vocabulary-bounded; when the
    n-gram vocabulary itself is too large to exchange (large n over noisy
    web text), this path bounds EVERY intermediate by constants:

    1. **Sketch + candidates, one pass**: each batch emits (a) a
       depth x width count-min partial over splitmix64(group|gram) keys —
       CMS is linear, so per-batch partials tree-merge exactly — and (b)
       its batch-local top-``candidate_m`` grams per group (default 8k).
    2. **Candidate selection**: CMS estimates (min over depth rows —
       one-sided: estimate >= truth) rank the candidate union; with
       ``recount=False`` the result uses these estimates directly.
    3. **Exact re-count** (default): the candidate set is broadcast and
       one more streaming pass counts ONLY candidates — a
       candidates-bounded exchange — so the final counts are exact and
       the ONLY approximation left is candidate recall (a true top-k
       gram is missed only if it is outside every batch's local top-m,
       impossible for globally heavy grams under any batching).

    Driver state: depth x width int64 (fixed) + the candidate union —
    never the gram vocabulary. Returns rows like the exact operator
    ((g, gram, cnt), count desc / gram asc); property-tested equal to
    ``ngram_topk`` on skewed corpora (tests/test_ngram_topk.py)."""
    import ray

    from uk_address_matcher_ray.functions import hashing as H

    if candidate_m <= 0:
        candidate_m = 8 * k

    def sketch_batch(batch: pa.Table):
        counts: dict = {}
        gvals = batch.column(group_col).to_pylist()
        for g, text in zip(gvals, batch.column(text_col).to_pylist()):
            toks = _tokens(text)
            for i in range(len(toks) - n + 1):
                key = (g, " ".join(toks[i : i + n]))
                counts[key] = counts.get(key, 0) + 1
        cms = np.zeros((depth, width), dtype=np.int64)
        if counts:
            keys = np.fromiter(
                (H.h60(g + "\x1f" + gram) for g, gram in counts),
                dtype=np.uint64,
                count=len(counts),
            )
            vals = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
            rows = _cms_rows(keys, width, depth)
            for d in range(depth):
                np.add.at(cms[d], rows[:, d], vals)
        # batch-local top-m per group
        per_group: dict = {}
        for (g, gram), c in counts.items():
            per_group.setdefault(g, []).append((-c, gram))
        cands = []
        for g, items in per_group.items():
            items.sort()
            cands.extend((g, gram) for _, gram in items[:candidate_m])
        return cms, cands

    refs = [
        ray.remote(sketch_batch).remote(t)
        for t in ds.select_columns([group_col, text_col]).to_arrow_refs()
    ]

    @ray.remote
    def merge(*parts):
        cms = parts[0][0].copy()
        cands = set(parts[0][1])
        for c2, k2 in parts[1:]:
            cms += c2
            cands.update(k2)
        return cms, sorted(cands)

    while len(refs) > 1:
        refs = [merge.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
    cms, cands = ray.get(refs[0]) if refs else (np.zeros((depth, width), np.int64), [])

    if not cands:
        return pa.table(
            {
                "g": pa.array([], pa.string()),
                "gram": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )

    if recount:
        cand_set = set(cands)
        cand_ref = ray.put(cand_set)

        def recount_batch(batch: pa.Table):
            want = ray.get(cand_ref)
            counts: dict = {}
            gvals = batch.column(group_col).to_pylist()
            for g, text in zip(gvals, batch.column(text_col).to_pylist()):
                toks = _tokens(text)
                for i in range(len(toks) - n + 1):
                    key = (g, " ".join(toks[i : i + n]))
                    if key in want:
                        counts[key] = counts.get(key, 0) + 1
            return counts

        crefs = [
            ray.remote(recount_batch).remote(t)
            for t in ds.select_columns([group_col, text_col]).to_arrow_refs()
        ]

        @ray.remote
        def cmerge(*ds_):
            out: dict = {}
            for d in ds_:
                for kk, v in d.items():
                    out[kk] = out.get(kk, 0) + v
            return out

        while len(crefs) > 1:
            crefs = [cmerge.remote(*crefs[i : i + 8]) for i in range(0, len(crefs), 8)]
        counts = ray.get(crefs[0]) if crefs else {}
        est = {kk: counts.get(kk, 0) for kk in cands}
    else:
        keys = np.fromiter(
            (H.h60(g + "\x1f" + gram) for g, gram in cands),
            dtype=np.uint64,
            count=len(cands),
        )
        rows = _cms_rows(keys, width, depth)
        mins = np.min(
            np.stack([cms[d][rows[:, d]] for d in range(depth)], axis=1), axis=1
        )
        est = {kk: int(m) for kk, m in zip(cands, mins)}

    per_group: dict = {}
    for (g, gram), c in est.items():
        per_group.setdefault(g, []).append((-c, gram))
    gs, grams, cnts = [], [], []
    for g in sorted(per_group):
        items = sorted(per_group[g])[:k]
        for negc, gram in items:
            gs.append(g)
            grams.append(gram)
            cnts.append(-negc)
    return pa.table(
        {
            "g": pa.array(gs, pa.string()),
            "gram": pa.array(grams, pa.string()),
            "cnt": pa.array(cnts, pa.int64()),
        }
    )
