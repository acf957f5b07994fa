"""CCNet-style line-level boilerplate removal.

CCNet (Wenzek et al. 2019) and the web-corpus pipelines that follow it
(RefinedWeb, FineWeb) drop lines that recur across many documents —
navigation bars, cookie banners, licence footers — before any
document-level dedup runs.  The reference engine
(RobinL/uk_address_matcher) has no counterpart; this is part of the
LLM-training-data surface this engine adds (SURVEY.md §2-extras).

Scale shape — the same two-phase design as ``duplicate_spans``
(dedup.py:1078):

* **phase 1 (hash exchange)**: each batch emits per-batch-distinct
  ``(line_hash u64, doc_id)`` pairs — ONE fixed-width ~16-byte/row
  all-to-all grouped on the hash.  Groups count DISTINCT docs (a doc
  whose rows straddle input batches still counts once) and hashes
  reaching ``min_docs`` survive.  No line strings cross the wire.
* **phase 2 (survivor-string exchange)**: rescan the corpus; only lines
  whose hash survived (rare by contract) materialize their string, and
  one survivor-only string exchange groups by the EXACT line and
  re-applies the distinct-doc threshold — a phase-1 hash collision can
  only inflate the survivor set and is cancelled here, so the result is
  exact.
* **removal**: the exact boilerplate line set is boilerplate-sized (the
  operator's premise: lines frequent across a corpus are few relative
  to it), broadcast once via ``ray.put`` and memoized per worker;
  the corpus then streams through one row-local ``map_batches`` with a
  sorted-hash-array prefilter (``np.searchsorted``) + exact membership
  verify.  If the set ever outgrows worker heaps, swap the broadcast
  for a semi-join on the line hash through ``grouped_map`` — the same
  exchange machinery, documented fallback.

Line identity is the RAW split segment (split on ``\\n``) with no
normalization; production CCNet additionally lowercases and strips
digits/punctuation before hashing — that is a pure pre-hash key
function and slots into ``_split_lines`` callers without changing any
exchange.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from uk_address_matcher_ray import util
from uk_address_matcher_ray.stages.grouped import grouped_map


def _split_lines(texts):
    """Vectorized line explode for a batch: returns ``(flat, doc_rep,
    lens)`` — one object array of every line, the row index each line
    came from, and lines-per-row.  ``(t or '').split('\\n')`` mirrors
    the oracle's ``string_split(text, chr(10))`` (both yield one empty
    line for an empty text)."""
    per = [(t or "").split("\n") for t in texts]
    lens = np.fromiter((len(p) for p in per), np.int64, count=len(per))
    flat = np.empty(int(lens.sum()), dtype=object)
    pos = 0
    for p in per:
        flat[pos : pos + len(p)] = p
        pos += len(p)
    doc_rep = np.repeat(np.arange(len(per), dtype=np.int64), lens)
    return flat, doc_rep, lens


def _line_hashes(flat) -> np.ndarray:
    """64-bit line hashes (polars vectorized string hash, seed 0) —
    collisions are resolved by the exact phase-2 pass."""
    import polars as pl

    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64)
    return pl.Series("l", flat, dtype=pl.Utf8).hash(seed=0).to_numpy()


def _hash_member(sorted_hashes: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Membership mask of ``h`` against a sorted u64 array."""
    if len(sorted_hashes) == 0 or len(h) == 0:
        return np.zeros(len(h), dtype=bool)
    pos = np.searchsorted(sorted_hashes, h)
    pos[pos == len(sorted_hashes)] = 0
    return sorted_hashes[pos] == h


def _distinct_doc_filter(key: str, id_col: str, min_docs: int):
    """Kernel over COMPLETE key-groups: global per-(key, doc) dedup first
    (a doc split across batches counts once), then keep keys whose
    distinct-doc count reaches ``min_docs``."""
    import pyarrow.compute as pc

    def kernel(tbl: pa.Table) -> pa.Table:
        per_doc = tbl.group_by([key, id_col]).aggregate([])
        agg = per_doc.group_by(key).aggregate([(id_col, "count")])
        kept = agg.filter(
            pc.greater_equal(agg.column(f"{id_col}_count"), min_docs)
        )
        return kept.select([key])

    return kernel


def boilerplate_line_assets(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    driver_gather: Optional[bool] = None,
):
    """Find every line occurring in >= ``min_docs`` distinct documents.

    Returns ``(sorted_hashes: np.uint64, line_set: frozenset[str])`` —
    boilerplate-sized by contract; pass through ``ray.put`` to
    :func:`remove_boilerplate_lines`.

    ``driver_gather`` (default auto, knob
    ``GRAFT_LINE_ASSETS_DRIVER_MAX_DOCS`` = 50_000): below the gate the
    per-batch-distinct ``(line, doc)`` pairs gather straight to the
    driver and resolve there — two grouped exchanges' fixed job latency
    (~0.5 s each) dominates tiny corpora, the same measured trade as the
    harness's 30k-key synth gate (NOTES.md round 4b).  The auto gate
    costs one ``ds.count()`` (an extra upstream execution for derived
    pipelines); above the gate the distributed two-phase path runs and
    nothing corpus-sized ever reaches the driver.
    """
    import os

    import ray

    if driver_gather is None:
        gate = int(os.environ.get("GRAFT_LINE_ASSETS_DRIVER_MAX_DOCS", 50_000))
        driver_gather = ds.count() <= gate

    if driver_gather:
        def string_pairs_batch(batch: pa.Table) -> pa.Table:
            flat, doc_rep, _ = _split_lines(batch.column(text_col).to_pylist())
            t = pa.table(
                {
                    "line": pa.array(flat.tolist(), pa.string()),
                    id_col: batch.column(id_col).take(pa.array(doc_rep)),
                }
            )
            return t.group_by(["line", id_col]).aggregate([])

        pairs_tbl = pa.concat_tables(
            ray.get(
                ds.map_batches(string_pairs_batch, batch_format="pyarrow")
                .materialize()
                .to_arrow_refs()
            )
        )
        kept = _distinct_doc_filter("line", id_col, min_docs)(pairs_tbl)
        lines = frozenset(kept.column("line").to_pylist())
        hashes = np.unique(_line_hashes(np.array(sorted(lines), dtype=object)))
        return hashes, lines

    # phase 1: fixed-width (hash, doc) exchange -> surviving hashes
    def pairs_batch(batch: pa.Table) -> pa.Table:
        flat, doc_rep, _ = _split_lines(batch.column(text_col).to_pylist())
        h = _line_hashes(flat)
        t = pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                id_col: batch.column(id_col).take(pa.array(doc_rep)),
            }
        )
        return t.group_by(["h", id_col]).aggregate([])

    pairs = ds.map_batches(pairs_batch, batch_format="pyarrow")
    surv = grouped_map(
        pairs,
        "h",
        None,
        pa.schema([pa.field("h", pa.uint64())]),
        fn_table=_distinct_doc_filter("h", id_col, min_docs),
    )
    surv_hashes = np.sort(
        np.array([r["h"] for r in surv.take_all()], dtype=np.uint64)
    )
    surv_ref = ray.put(surv_hashes)

    # phase 2: survivor-only string exchange -> exact boilerplate lines
    def survivor_strings_batch(batch: pa.Table) -> pa.Table:
        hs = util.get_broadcast(surv_ref)
        flat, doc_rep, _ = _split_lines(batch.column(text_col).to_pylist())
        hit = _hash_member(hs, _line_hashes(flat))
        idx = np.nonzero(hit)[0]
        t = pa.table(
            {
                "line": pa.array(flat[idx].tolist(), pa.string()),
                id_col: batch.column(id_col).take(pa.array(doc_rep[idx])),
            }
        )
        return t.group_by(["line", id_col]).aggregate([])

    strings = ds.map_batches(survivor_strings_batch, batch_format="pyarrow")
    exact = grouped_map(
        strings,
        "line",
        None,
        pa.schema([pa.field("line", pa.string())]),
        fn_table=_distinct_doc_filter("line", id_col, min_docs),
    )
    lines = frozenset(r["line"] for r in exact.take_all())
    hashes = np.unique(
        _line_hashes(np.array(sorted(lines), dtype=object))
    )
    return hashes, lines


def remove_boilerplate_lines(
    ds,
    assets,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """-> Dataset(id, text_clean, n_lines, n_removed): each document with
    its boilerplate lines dropped (order of surviving lines preserved;
    a document losing every line keeps an empty ``text_clean``).

    ``assets``: ``(sorted_hashes, line_set)`` from
    :func:`boilerplate_line_assets` or a ``ray.put`` ref of it
    (broadcast once, memoized per worker process)."""

    def kernel(batch: pa.Table) -> pa.Table:
        hashes, lines = util.get_broadcast(assets)
        flat, doc_rep, lens = _split_lines(batch.column(text_col).to_pylist())
        keep = np.ones(len(flat), dtype=bool)
        cand = np.nonzero(_hash_member(hashes, _line_hashes(flat)))[0]
        for i in cand:  # hash hits only — boilerplate-rate sized
            if flat[i] in lines:
                keep[i] = False
        offs = np.concatenate([[0], np.cumsum(lens)])
        n = batch.num_rows
        n_kept = np.bincount(doc_rep[keep], minlength=n).astype(np.int64)
        texts_clean = [
            "\n".join(flat[offs[d] : offs[d + 1]][keep[offs[d] : offs[d + 1]]])
            for d in range(n)
        ]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "text_clean": pa.array(texts_clean, pa.string()),
                "n_lines": pa.array(lens, pa.int64()),
                "n_removed": pa.array(lens - n_kept, pa.int64()),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def line_dedup_docs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    driver_gather: Optional[bool] = None,
):
    """End-to-end: collect boilerplate assets, then stream the corpus
    through the removal kernel (the input Dataset executes twice — one
    counting scan, one removal scan — exactly like ``duplicate_spans``'
    phase-2 rescan)."""
    import ray

    assets = boilerplate_line_assets(
        ds, id_col, text_col, min_docs, driver_gather=driver_gather
    )
    return remove_boilerplate_lines(ds, ray.put(assets), id_col, text_col)
