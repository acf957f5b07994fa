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
    numeric contribution, cleaning_steps.py:294-302).

    Routes through the vectorized parse chain (stages/clean_vec.py, same
    counts by differential test) unless GRAFT_CLEAN_VEC=0 pins the per-row
    spec path below."""
    import os

    if os.environ.get("GRAFT_CLEAN_VEC", "1") != "0":
        from uk_address_matcher_ray.stages.clean_vec import (
            corpus_token_stats_vec,
        )

        return corpus_token_stats_vec(
            addresses if isinstance(addresses, list) else list(addresses)
        )
    return _corpus_token_stats_rows(addresses)


def _corpus_token_stats_rows(
    addresses: Iterable[Optional[str]],
) -> Tuple[Counter, Counter, Counter, Counter]:
    """Per-row spec path (the semantic reference for the vectorized one).

    The C1-C4 string prefix runs through the SAME vectorized kernel the
    cleaning stage uses (functions/text.clean_address_first_pass_vec), so
    corpus-stats token keys always match the cleaned tokens they weight —
    Python str.upper ('ß'->'SS') vs utf8proc/DuckDB ('ß'->'ẞ') would
    otherwise fork the two on non-ASCII input."""
    import pyarrow as _pa

    from uk_address_matcher_ray.functions.text import (
        clean_address_first_pass_vec,
    )

    addr_list = addresses if isinstance(addresses, list) else list(addresses)
    prepped = clean_address_first_pass_vec(
        _pa.array(addr_list, _pa.string())
    ).to_pylist()
    tok_counts: Counter = Counter()
    num_counts: Counter = Counter()
    end_counts: Counter = Counter()
    nt123_counts: Counter = Counter()
    for addr in prepped:
        core = _clean_core_row(addr, None, prepped=True)
        if core is None:
            continue
        tok_counts.update(core.tokens)
        num_counts.update(core.numeric_tokens or [])
        nt123_counts.update(t for t in (core.nt1, core.nt2, core.nt3) if t is not None)
        if core.tokens and core.tokens[-1]:
            end_counts[core.tokens[-1]] += 1
    return tok_counts, num_counts, end_counts, nt123_counts


def rel_freq_table(counts: Counter, total: Optional[int] = None) -> Dict[str, float]:
    """count/total as double division (matches DuckDB count(*)/sum(count(*))).

    ``total`` overrides the denominator — used when rare tokens were floored
    out of ``counts`` but must still weigh in the relative frequencies so
    the surviving entries stay bit-identical to the unfloored table."""
    if total is None:
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
    import os

    col = batch.column("address_concat").cast(pa.string())
    if os.environ.get("GRAFT_CLEAN_VEC", "1") != "0":
        from uk_address_matcher_ray.stages.clean_vec import (
            corpus_token_stats_vec,
        )

        tok_counts, num_counts, end_counts, nt123_counts = (
            corpus_token_stats_vec(col)  # zero-copy Arrow column in
        )
    else:
        tok_counts, num_counts, end_counts, nt123_counts = (
            _corpus_token_stats_rows(col.to_pylist())
        )
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
    ds,
    end_token_min_count: int = DEFAULT_END_TOKEN_MIN_COUNT,
    min_token_count: "int | str" = 0,
) -> Tuple[Dict[str, float], Dict[str, float], FrozenSet[str]]:
    """Full distributed pass -> (tf_dict, numeric_tf_dict, end_tokens).

    Partial per-batch counts merge in a fan-in-8 TREE of Ray tasks (each
    level re-aggregates, so every intermediate stays vocabulary-bounded) —
    no all-to-all shuffle, and integer-sum merges are order-independent so
    the result is exact at any tree shape.

    ``min_token_count`` bounds the DRIVER's vocabulary: tokens with a global
    count below the floor are dropped (in the final tree task, before
    anything reaches the driver) while the relative-frequency denominators
    still include them, so every surviving entry is bit-identical to the
    unfloored table. At 100 TB of web text the raw distinct-token count
    grows into the billions (URLs, noise); a floor of even 2-5 collapses
    that tail. Semantic delta: a dropped token scores with the attach-time
    rare-token default (5e-5, mirroring the reference's COALESCE fallback in
    cleaning_steps.py:339) instead of its true sub-floor frequency — the
    reference itself applies that default to tokens absent from its TF
    table. Default 0 = off (bit-exact oracle parity).

    ``min_token_count="auto"`` (the flagship default) engages the floor
    SIZE-TRIGGERED, decided inside the final tree task where the global
    vocabulary size is first known: if the merged table exceeds
    ``GRAFT_TF_FLOOR_TRIGGER`` rows (default 2,000,000 ≈ 100 MB of dict on
    the driver) the floor is ``GRAFT_TF_FLOOR`` (default 2), else 0. Below
    the trigger the result is bit-identical to the unfloored run, so oracle
    runs at test scale stay exact while a 100 TB run never ships its
    billion-token noise tail to the driver.
    """
    import ray

    auto_trigger = -1
    if min_token_count == "auto":
        import os

        auto_trigger = int(os.environ.get("GRAFT_TF_FLOOR_TRIGGER", 2_000_000))
        min_token_count = int(os.environ.get("GRAFT_TF_FLOOR", 2))

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
        totals = {0: 0, 1: 0, 2: 0, 3: 0}
    else:
        while len(refs) > 1:
            refs = [merge.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]

        @ray.remote(num_returns=2)
        def finalize(t: pa.Table):
            """Per-kind totals (pre-floor denominators) + floored table, so
            the driver never holds the sub-floor vocabulary tail."""
            import pyarrow.compute as pc

            totals = {}
            kind_arr = t.column("kind")
            cnt_arr = t.column("count")
            for k in (0, 1, 2, 3):
                s = pc.sum(pc.if_else(pc.equal(kind_arr, k), cnt_arr, 0))
                totals[k] = s.as_py() or 0
            # auto mode: floor engages only above the size trigger, so
            # small (oracle/test) corpora stay bit-identical to floor=0.
            if auto_trigger >= 0 and t.num_rows <= auto_trigger:
                return totals, t
            if min_token_count > 1:
                keep = pc.or_(
                    pc.greater_equal(cnt_arr, min_token_count),
                    pc.equal(kind_arr, 2),  # end tokens have their own floor
                )
                t = t.filter(keep)
            return totals, t

        totals_ref, tbl_ref = finalize.remote(refs[0])
        totals, tbl = ray.get(totals_ref), ray.get(tbl_ref)
    # vectorized driver tail: per-kind mask + dict(zip) — the Python
    # Counter row loop over the whole vocabulary was a serial term that
    # grew with corpus size. numpy int64->float64 conversion and division
    # are exact/correctly-rounded, so values equal the scalar c / total.
    import numpy as np
    import pyarrow.compute as pc

    kind_np = tbl.column("kind").to_numpy(zero_copy_only=False)
    cnt_np = tbl.column("count").to_numpy(zero_copy_only=False)

    def _freqs(kind: int) -> Dict[str, float]:
        total = totals[kind]
        if total == 0:
            return {}
        mask = kind_np == kind
        toks_k = tbl.column("token").filter(pa.array(mask)).to_pylist()
        vals = (cnt_np[mask].astype(np.float64) / float(total)).tolist()
        return dict(zip(toks_k, vals))

    end_mask = (kind_np == 2) & (cnt_np >= end_token_min_count)
    end_set = frozenset(
        tbl.column("token").filter(pa.array(end_mask)).to_pylist()
    )
    return _freqs(0), _freqs(1), end_set


def load_tf_parquet(path: str, token_col: str = "token", freq_col: str = "rel_freq") -> Dict[str, float]:
    """Load a precomputed TF lookup (reference: address_token_frequencies.parquet,
    cleaning_pipelines.py:120-129)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=[token_col, freq_col])
    return dict(zip(t.column(token_col).to_pylist(), t.column(freq_col).to_pylist()))


def token_tf_dataset(ds):
    """Reference ``get_address_token_frequencies_from_address_table``
    (cleaning_pipelines.py T1 table): distributed partial counts + one
    vocabulary-sized groupby -> Dataset of (token, rel_freq), kinds 0+3
    (address tokens + numeric_token_1..3 values)."""
    from collections import Counter

    import ray

    from uk_address_matcher_ray.util import dataset_from_table

    counts: Counter = Counter()
    for r in corpus_stats_dataset(ds).take_all():
        if r["kind"] in (0, 3):
            counts[r["token"]] += r["sum(count)"]
    freqs = rel_freq_table(counts)
    items = sorted(freqs.items())
    return dataset_from_table(
        pa.table(
            {
                "token": pa.array([k for k, _ in items], pa.string()),
                "rel_freq": pa.array([v for _, v in items], pa.float64()),
            }
        )
    )


def numeric_tf_dataset(ds):
    """Reference ``get_numeric_term_frequencies_from_address_table``:
    Dataset of (numeric_token, rel_freq) (kind 1 counts)."""
    from collections import Counter

    from uk_address_matcher_ray.util import dataset_from_table

    counts: Counter = Counter()
    for r in corpus_stats_dataset(ds).take_all():
        if r["kind"] == 1:
            counts[r["token"]] += r["sum(count)"]
    freqs = rel_freq_table(counts)
    items = sorted(freqs.items())
    return dataset_from_table(
        pa.table(
            {
                "numeric_token": pa.array([k for k, _ in items], pa.string()),
                "rel_freq": pa.array([v for _, v in items], pa.float64()),
            }
        )
    )
