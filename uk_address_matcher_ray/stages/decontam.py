"""Benchmark decontamination: flag training documents sharing any word
k-gram with an evaluation/benchmark set.

The training-data pipeline step published with GPT-3 (Brown et al. 2020,
appendix C: 13-gram overlap removal against eval sets) and most corpus
papers since.  The reference engine has no counterpart; this is part of
the LLM-pipeline surface this engine adds.

Scale shape: the benchmark side is an EVAL set — thousands of documents
against a 100 TB corpus — so it is the canonical broadcast small side:
its distinct k-gram set is collected once (distributed distinct per
batch, then a driver-sized gather), shipped as ONE ``ray.put`` ref, and
the corpus streams through a single row-local ``map_batches`` with NO
shuffle.  Per corpus batch the kernel hashes each window once (token-
level polars hash + k splitmix64 rounds — ``dedup._span_hashes``, the
same primitive as the hashed duplicate-spans exchange), prefilters
against the sorted benchmark hash array (``np.searchsorted``), and only
hash-hit windows are materialized as strings for the EXACT membership
verify — hash collisions cannot produce a false positive and the hot
path never builds span strings.

Tokenization matches duplicate_spans: Python ``str.split()`` mirrored by
the oracle's ``string_split_regex(text, '\\s+')`` with empties dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from uk_address_matcher_ray import util
from uk_address_matcher_ray.stages.dedup import (
    _span_hashes,
    _span_strings,
    _span_windows,
)


def benchmark_ngram_assets(bench_ds, text_col: str = "text", k: int = 8):
    """Collect the benchmark set's distinct k-grams: per-batch distinct
    (hash, gram) pairs computed distributed, then gathered — the result is
    eval-set-sized (small) by contract.  Returns (sorted_hashes: np.uint64,
    gram_set: frozenset[str])."""

    def grams_batch(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        flat, starts, _ = _span_windows(texts, k)
        if len(starts) == 0:
            return pa.table(
                {"h": pa.array([], pa.uint64()), "g": pa.array([], pa.string())}
            )
        h = _span_hashes(flat, starts, k)
        g = _span_strings(flat, starts, k)
        # per-batch distinct before the gather
        t = pa.table({"h": pa.array(h, pa.uint64()), "g": g})
        return t.group_by(["h", "g"]).aggregate([])

    rows = bench_ds.map_batches(grams_batch, batch_format="pyarrow").take_all()
    grams = frozenset(r["g"] for r in rows)
    hashes = np.unique(np.array([r["h"] for r in rows], dtype=np.uint64))
    return hashes, grams


def decontaminate(
    ds,
    bench_assets,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    flag_only: bool = True,
):
    """-> Dataset(id, contaminated) when ``flag_only`` (one row per input
    doc), else the surviving original rows (contaminated docs dropped).

    ``bench_assets``: (sorted_hashes, gram_set) from
    ``benchmark_ngram_assets`` or a ``ray.put`` ref of it (broadcast once,
    memoized per worker process)."""

    def kernel(batch: pa.Table) -> pa.Table:
        hashes, grams = util.get_broadcast(bench_assets)
        texts = batch.column(text_col).to_pylist()
        flat, starts, doc_rep = _span_windows(texts, k)
        contaminated = np.zeros(batch.num_rows, dtype=bool)
        if len(starts):
            h = _span_hashes(flat, starts, k)
            pos = np.searchsorted(hashes, h)
            pos[pos == len(hashes)] = 0
            cand = np.nonzero(hashes[pos] == h)[0] if len(hashes) else []
            if len(cand):
                cand_strs = _span_strings(flat, starts[cand], k).to_pylist()
                hit = np.fromiter(
                    (s in grams for s in cand_strs), bool, len(cand_strs)
                )
                contaminated[doc_rep[cand[hit]]] = True
        if flag_only:
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "contaminated": pa.array(contaminated),
                }
            )
        return batch.filter(pa.array(~contaminated))

    return ds.map_batches(kernel, batch_format="pyarrow")
