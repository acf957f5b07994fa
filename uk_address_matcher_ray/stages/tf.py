"""Term-frequency builders (reference T1-T5, SURVEY.md §2.3).

Distributed path: tokens are pre-counted inside each ``map_batches`` call
(partial aggregation) and combined with one small ``groupby("token")``
shuffle, so the all-to-all exchange only moves (token, partial_count) rows —
never the corpus. The finished TF table is tiny relative to the corpus
(vocabulary-sized) and is broadcast back to workers via ``ray.put``.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, FrozenSet, Iterable, List, Optional, Tuple

import pyarrow as pa

from uk_address_matcher_ray.functions import text as T
from uk_address_matcher_ray.stages.clean import _clean_core_row

DEFAULT_END_TOKEN_MIN_COUNT = 5


# ---------------------------------------------------------------------------
# Pure-Python builders (used by tests and as the per-batch partials)
# ---------------------------------------------------------------------------

def corpus_token_stats(
    addresses: Iterable[Optional[str]],
) -> Tuple[Counter, Counter, Counter, Counter]:
    """One pass over raw address strings -> (address_token_counts,
    numeric_token_counts, end_token_counts, nt123_counts) using the full
    cleaning core. nt123 = the numeric_token_1..3 digit-run columns (T1's
    numeric contribution, cleaning_steps.py:294-302)."""
    tok_counts: Counter = Counter()
    num_counts: Counter = Counter()
    end_counts: Counter = Counter()
    nt123_counts: Counter = Counter()
    for addr in addresses:
        core = _clean_core_row(addr, None)
        if core is None:
            continue
        tok_counts.update(core.tokens)
        num_counts.update(core.numeric_tokens or [])
        nt123_counts.update(t for t in (core.nt1, core.nt2, core.nt3) if t is not None)
        if core.tokens and core.tokens[-1]:
            end_counts[core.tokens[-1]] += 1
    return tok_counts, num_counts, end_counts, nt123_counts


def rel_freq_table(counts: Counter) -> Dict[str, float]:
    """count/total as double division (matches DuckDB count(*)/sum(count(*)))."""
    total = sum(counts.values())
    if total == 0:
        return {}
    return {t: c / total for t, c in counts.items()}


def end_token_set(
    end_counts: Counter, min_count: int = DEFAULT_END_TOKEN_MIN_COUNT
) -> FrozenSet[str]:
    return frozenset(t for t, c in end_counts.items() if c >= min_count)


def token_tf_with_numeric(addresses: Iterable[Optional[str]]) -> Dict[str, float]:
    """T1 (cleaning_steps.py:289-323): numeric tokens 1-3 + address tokens."""
    tok_counts, _num, _end, nt123 = corpus_token_stats(addresses)
    return rel_freq_table(tok_counts + nt123)


# ---------------------------------------------------------------------------
# Distributed builders over ray.data.Dataset
# ---------------------------------------------------------------------------

def _partial_counts_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial token counts -> (token, kind, count) rows.

    kind: 0 = address token, 1 = numeric token, 2 = end token,
    3 = numeric_token_1..3 column value (T1's numeric contribution).
    """
    addrs = batch.column("address_concat").to_pylist()
    tok_counts, num_counts, end_counts, nt123_counts = corpus_token_stats(addrs)
    tokens: List[str] = []
    kinds: List[int] = []
    counts: List[int] = []
    for kind, ctr in ((0, tok_counts), (1, num_counts), (2, end_counts), (3, nt123_counts)):
        for t, c in ctr.items():
            tokens.append(t)
            kinds.append(kind)
            counts.append(c)
    return pa.table(
        {
            "token": pa.array(tokens, type=pa.string()),
            "kind": pa.array(kinds, type=pa.int32()),
            "count": pa.array(counts, type=pa.int64()),
        }
    )


def corpus_stats_dataset(ds):
    """Dataset of raw address records -> small Dataset of (token, kind, count)."""
    partials = ds.map_batches(
        _partial_counts_batch, batch_format="pyarrow", batch_size=8192
    )
    return partials.groupby(["token", "kind"]).sum("count")


def collect_corpus_stats(
    ds, end_token_min_count: int = DEFAULT_END_TOKEN_MIN_COUNT
) -> Tuple[Dict[str, float], Dict[str, float], FrozenSet[str]]:
    """Full distributed pass -> (tf_dict, numeric_tf_dict, end_tokens).

    The aggregated table is vocabulary-sized (≪ corpus) so collecting it to
    the driver is bounded; at 100 TB scale the vocabulary still fits in
    memory after the count aggregation. Partial per-batch counts merge in a
    fan-in-8 TREE of Ray tasks (each level re-aggregates, so every
    intermediate stays vocabulary-bounded) — no all-to-all shuffle, and
    integer-sum merges are order-independent so the result is exact at any
    tree shape.
    """
    import ray

    partials = ds.map_batches(
        _partial_counts_batch, batch_format="pyarrow", batch_size=8192
    )
    refs = list(partials.to_arrow_refs())

    @ray.remote
    def merge(*tbls):
        live = [
            t for t in tbls if "token" in t.schema.names and t.num_rows > 0
        ]
        if not live:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "kind": pa.array([], pa.int8()),
                    "count": pa.array([], pa.int64()),
                }
            )
        t = pa.concat_tables(live)
        agg = t.group_by(["token", "kind"]).aggregate([("count", "sum")])
        return agg.rename_columns(["token", "kind", "count"])

    if not refs:
        tbl = pa.table(
            {
                "token": pa.array([], pa.string()),
                "kind": pa.array([], pa.int8()),
                "count": pa.array([], pa.int64()),
            }
        )
    else:
        while len(refs) > 1:
            refs = [merge.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
        tbl = ray.get(refs[0])
    toks = tbl.column("token").to_pylist()
    kinds = tbl.column("kind").to_pylist()
    cnts = tbl.column("count").to_pylist()
    tok_counts: Counter = Counter()
    num_counts: Counter = Counter()
    end_counts: Counter = Counter()
    nt123_counts: Counter = Counter()
    by_kind = {0: tok_counts, 1: num_counts, 2: end_counts, 3: nt123_counts}
    for t, k, c in zip(toks, kinds, cnts):
        by_kind[k][t] += c
    return (
        rel_freq_table(tok_counts),
        rel_freq_table(num_counts),
        end_token_set(end_counts, end_token_min_count),
    )


def load_tf_parquet(path: str, token_col: str = "token", freq_col: str = "rel_freq") -> Dict[str, float]:
    """Load a precomputed TF lookup (reference: address_token_frequencies.parquet,
    cleaning_pipelines.py:120-129)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=[token_col, freq_col])
    return dict(zip(t.column(token_col).to_pylist(), t.column(freq_col).to_pylist()))
