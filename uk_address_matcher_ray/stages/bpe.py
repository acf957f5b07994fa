"""Distributed BPE tokenizer training + apply (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

The operator the reference has no counterpart for but every LLM training
pipeline runs once per corpus: learn byte-pair-encoding merges from word
frequencies, then segment the corpus with them.

Exact contract (mirrored line-for-line by the DuckDB oracle,
``bpe_merges_sql`` / ``bpe_token_counts_sql``):

* words = whitespace split, empties dropped; initial symbols = the
  word's characters (char-level BPE, no end-of-word marker — the
  GPT-2-style intra-word variant);
* pair counts are OVERLAPPING adjacent counts weighted by word
  frequency (``aaa`` contributes 2 to ``(a,a)``), the classic
  learn-bpe counting;
* merge r = the pair with the highest count, ties broken by
  lexicographically smallest ``(lhs, rhs)`` (byte order — identical in
  Python and DuckDB's binary collation for the ASCII corpora here);
* replacement is greedy left-to-right non-overlapping (``aaaa`` with
  merge ``(a,a)`` -> ``aa aa``), applied to every word;
* training stops early when no pair remains (merge table just ends).

Scale shape (100 TB): training never touches the corpus after ONE
distributed word-count pass — per-batch ``group_by(word)`` partials
merged in the same fan-in-8 tree as the TF/LM assets (lm.py:101), so
every intermediate stays vocabulary-sized and ``min_count`` floors the
long tail exactly like corpus stats (drop words with count < floor
BEFORE training; merge decisions then depend only on surviving mass).
The merge ITERATIONS run on the driver over the word-count table —
that is O(vocab · word_len · num_merges) work on the small side by
construction (distinct words << corpus; this is how production
tokenizer trainers are shaped: distributed count, local merge loop).
The apply pass (``bpe_token_counts``) broadcasts the merge list once
via ``ray.put`` and streams the corpus through one row-local
map_batches (per-batch distinct-word memo so each word is segmented
once per batch, not once per occurrence) followed by one
vocabulary-bounded groupby exchange.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import pyarrow as pa

_EMPTY_WC = pa.table(
    {"word": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
)


def _word_count_partial(batch: pa.Table, text_col: str) -> pa.Table:
    words: list = []
    for text in batch.column(text_col).to_pylist():
        words.extend((text or "").split())
    if not words:
        return _EMPTY_WC
    t = pa.table({"word": pa.array(words, pa.string())})
    agg = t.group_by("word").aggregate([([], "count_all")])
    return agg.rename_columns(["word", "c"])


def corpus_word_counts(
    ds, text_col: str = "text", min_count: int = 0
) -> Dict[str, int]:
    """Distributed word-count pass -> driver dict (the SMALL side:
    distinct words << corpus). Fan-in-8 tree merge of per-batch
    partials; ``min_count`` floors the tail for 100 TB vocabularies."""
    import ray

    partials = ds.map_batches(
        lambda b: _word_count_partial(b, text_col),
        batch_format="pyarrow",
        batch_size=8192,
    )
    refs = list(partials.to_arrow_refs())

    @ray.remote
    def merge(*tbls):
        live = [t for t in tbls if t.num_rows > 0 and "word" in t.schema.names]
        if not live:
            return _EMPTY_WC
        agg = pa.concat_tables(live).group_by("word").aggregate([("c", "sum")])
        return agg.rename_columns(["word", "c"])

    while len(refs) > 1:
        refs = [merge.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
    tbl = ray.get(refs[0]) if refs else _EMPTY_WC
    out = {
        w: c
        for w, c in zip(
            tbl.column("word").to_pylist(), tbl.column("c").to_pylist()
        )
        if c >= min_count
    }
    return out


def _apply_merge(syms: tuple, a: str, b: str) -> tuple:
    """One greedy left-to-right non-overlapping replacement pass."""
    out: list = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe_merges(
    word_counts: Dict[str, int], num_merges: int
) -> List[Tuple[int, str, str, int]]:
    """Driver-side merge loop over the word-count table.

    Returns [(merge_rank, lhs, rhs, pair_count)] with at most
    ``num_merges`` rows (early stop when no pair remains)."""
    words: Dict[tuple, int] = {}
    for w, c in word_counts.items():
        k = tuple(w)
        words[k] = words.get(k, 0) + c
    merges: List[Tuple[int, str, str, int]] = []
    for r in range(num_merges):
        pc: Dict[Tuple[str, str], int] = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        maxc = max(pc.values())
        lhs, rhs = min(p for p, c in pc.items() if c == maxc)
        merges.append((r, lhs, rhs, maxc))
        new_words: Dict[tuple, int] = {}
        for syms, c in words.items():
            ns = _apply_merge(syms, lhs, rhs)
            new_words[ns] = new_words.get(ns, 0) + c
        words = new_words
    return merges


def bpe_train(
    ds, text_col: str = "text", num_merges: int = 8, min_count: int = 0
) -> pa.Table:
    """-> pa.Table(merge_rank:int64, lhs, rhs, pair_count:int64) — the
    learned merge list (driver-sized by definition: ``num_merges`` rows)."""
    merges = train_bpe_merges(
        corpus_word_counts(ds, text_col, min_count), num_merges
    )
    return pa.table(
        {
            "merge_rank": pa.array([m[0] for m in merges], pa.int64()),
            "lhs": pa.array([m[1] for m in merges], pa.string()),
            "rhs": pa.array([m[2] for m in merges], pa.string()),
            "pair_count": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


def segment_word(word: str, merge_list: List[Tuple[str, str]]) -> tuple:
    """Segment one word: apply every learned merge in rank order, each a
    full greedy pass — EXACTLY the training replacement, so training and
    apply agree on every word seen during training."""
    syms = tuple(word)
    for a, b in merge_list:
        if len(syms) < 2:
            break
        syms = _apply_merge(syms, a, b)
    return syms


def bpe_token_counts(ds, merges: pa.Table, text_col: str = "text"):
    """Distributed apply: segment every word with the learned merges and
    return corpus token counts -> Dataset(token, n:int64).

    The merge list is broadcast once (``ray.put``); the corpus streams
    through one row-local map_batches (distinct words memoized per
    batch) and ONE vocabulary-bounded groupby exchange."""
    import ray

    merge_list = list(
        zip(merges.column("lhs").to_pylist(), merges.column("rhs").to_pylist())
    )
    mref = ray.put(merge_list)

    def partial(batch: pa.Table) -> pa.Table:
        ml = ray.get(mref)
        counts: Dict[str, int] = {}
        memo: Dict[str, tuple] = {}
        for text in batch.column(text_col).to_pylist():
            for w in (text or "").split():
                syms = memo.get(w)
                if syms is None:
                    syms = segment_word(w, ml)
                    memo[w] = syms
                for s in syms:
                    counts[s] = counts.get(s, 0) + 1
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "c": pa.array(list(counts.values()), pa.int64()),
            }
        )

    agg = (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .sum("c")
    )
    return agg.map_batches(
        lambda b: pa.table(
            {"token": b.column("token"), "n": b.column("sum(c)")}
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# DuckDB oracle: the merge chain unrolled as CTEs. Greedy non-overlapping
# replacement is expressed with run-parity windows: consecutive matching
# positions can only overlap when lhs == rhs, runs are detected with the
# pos - row_number() trick, and greedy keeps the ODD ranks within each run
# (proof: overlap conflicts are exactly between consecutive matching
# positions, and greedy resolves each run left-to-right).
# ---------------------------------------------------------------------------


def _bpe_chain_sql(
    num_merges: int, source: str = "documents", text_col: str = "text"
) -> str:
    parts = [
        f"""w AS MATERIALIZED (
    SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
        SELECT unnest(list_filter(string_split_regex({text_col}, '\\s+'),
                                  x -> x <> '')) AS word
        FROM {source}
    ) GROUP BY word
),
s0 AS MATERIALIZED (
    SELECT word, cnt,
           list_transform(generate_series(1, length(word)),
                          g -> substr(word, g, 1)) AS syms
    FROM w
)"""
    ]
    for r in range(num_merges):
        parts.append(
            f"""p{r} AS MATERIALIZED (
    SELECT syms[i] AS lhs, syms[i + 1] AS rhs, sum(cnt) AS pc
    FROM (
        SELECT cnt, syms, unnest(generate_series(1, len(syms) - 1)) AS i
        FROM s{r} WHERE len(syms) >= 2
    ) GROUP BY 1, 2
),
b{r} AS MATERIALIZED (
    SELECT lhs, rhs, CAST(pc AS BIGINT) AS pc FROM p{r}
    ORDER BY pc DESC, lhs, rhs LIMIT 1
),
m{r} AS MATERIALIZED (
    SELECT word, cnt, syms, pos,
           coalesce(pos < len(syms)
                    AND syms[pos] = (SELECT lhs FROM b{r})
                    AND syms[pos + 1] = (SELECT rhs FROM b{r}),
                    false) AS mt
    FROM (
        SELECT word, cnt, syms,
               unnest(generate_series(1, len(syms))) AS pos
        FROM s{r}
    )
),
c{r} AS MATERIALIZED (
    SELECT word, cnt, syms, pos,
           mt AND (row_number() OVER (PARTITION BY word, grp ORDER BY pos)
                   % 2 = 1) AS chosen
    FROM (
        SELECT word, cnt, syms, pos, mt,
               CASE WHEN mt THEN pos - row_number()
                    OVER (PARTITION BY word, mt ORDER BY pos) END AS grp
        FROM m{r}
    )
),
s{r + 1} AS MATERIALIZED (
    SELECT word, cnt, list(sym ORDER BY pos) AS syms
    FROM (
        SELECT word, cnt, pos,
               CASE WHEN chosen THEN syms[pos] || syms[pos + 1]
                    ELSE syms[pos] END AS sym,
               lag(chosen, 1, false)
                   OVER (PARTITION BY word ORDER BY pos) AS prev_chosen
        FROM c{r}
    ) WHERE NOT prev_chosen
    GROUP BY word, cnt
)"""
        )
    return ",\n".join(parts)


def bpe_merges_sql(
    num_merges: int = 8, source: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB oracle for ``bpe_train``: the unrolled merge chain."""
    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS merge_rank, lhs, rhs, pc AS pair_count FROM b{r}"
        for r in range(num_merges)
    )
    return (
        "WITH "
        + _bpe_chain_sql(num_merges, source, text_col)
        + f"\nSELECT * FROM (\n{unions}\n) ORDER BY merge_rank"
    )


def bpe_token_counts_sql(
    num_merges: int = 8, source: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB oracle for ``bpe_token_counts``: the final segmentation
    s{N} already holds every distinct word's token list — explode it
    weighted by word count."""
    return (
        "WITH "
        + _bpe_chain_sql(num_merges, source, text_col)
        + f"""
SELECT sym AS token, CAST(sum(cnt) AS BIGINT) AS n FROM (
    SELECT cnt, unnest(syms) AS sym FROM s{num_merges}
) GROUP BY sym"""
    )
