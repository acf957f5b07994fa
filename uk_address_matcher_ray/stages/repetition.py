"""Gopher-style repetition statistics and quality filtering for documents.

The repetition family from the MassiveText quality pipeline (Rae et al.
2021, "Scaling Language Models: ... Gopher", appendix A1.1 — public
paper): documents dominated by repeated lines or repeated word n-grams
are low-quality training data and get filtered before training.  The
reference engine (an address matcher) has no counterpart; this operator
is part of the training-data-pipeline surface this engine adds.

Metrics (exact spec — both the vectorized kernel and the DuckDB oracle
implement THIS, with documented deviations from the paper where the
paper is ambiguous):

- words: maximal runs of non-whitespace (``[^ \\t\\r\\n\\f\\x0b]+`` —
  explicit class on both sides; RE2's ``\\s`` changed membership across
  versions so we never write ``\\s``). ``n_words`` = count,
  ``wchars`` = total word characters (whitespace never counts).
- lines: ``text`` split on ``\\n``; lines that are empty after stripping
  ``[ \\t\\r\\f\\x0b]`` are dropped; identity is the UNSTRIPPED line.
  ``dup_line_frac`` = 1 - distinct/total (fraction of line occurrences
  that are repeats); ``dup_line_char_frac`` = chars in lines whose value
  occurs >= 2 times / chars in all kept lines.
- ``top_2gram_char_frac``: max over distinct word 2-grams of
  occurrences x gram-chars, / wchars.  Deviation from the paper: the
  paper takes "the most frequent 2-gram" (tie-broken how?); we take the
  2-gram COVERING the most characters, which is deterministic and
  SQL-mirrorable.  gram-chars = len(w1)+len(w2) (no separator).
- ``dup_3gram_char_frac``: POSITION-based coverage — a word position is
  covered when any 3-gram occurring >= 2 times in the doc spans it;
  value = covered word chars / wchars.  This is the paper's "fraction
  of characters contained within duplicate n-grams" computed exactly
  (no double counting of overlaps), for n=3.

All fractions are pure integer-ratio divisions (plus one subtraction),
which IEEE 754 rounds identically in numpy and DuckDB — the driver's
value-hash gate compares them bit-exactly.

Scale: every metric is row-local (one doc at a time), so the stage is a
single ``map_batches`` with no shuffle — embarrassingly parallel at any
corpus size.  The kernel is vectorized across the whole batch
(dictionary-encoded words, ``np.unique`` gram counting, ``bincount``
per-doc reductions); no per-row Python in the hot path.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Explicit whitespace class — identical byte-for-byte in the Arrow/RE2
# kernel, the Python scalar reference and the DuckDB oracle.
WS_CLASS = " \t\r\n\f\x0b"
WS_RE = "[ \t\r\n\f\x0b]+"
NONWS_RE = "[^ \t\r\n\f\x0b]+"
_LINE_STRIP = " \t\r\f\x0b"  # no \n: lines are already \n-split

# Thresholds adapted from the Gopher paper's published table (dup-line
# 0.30, dup-line-char 0.20, top-2-gram-char 0.20; the paper filters
# dup-5..10-gram at 0.15..0.10 — our exact-coverage 3-gram metric is
# broader, so its threshold is looser).  A doc is kept when EVERY
# metric is <= its threshold.
DEFAULT_THRESHOLDS: Dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "dup_3gram_char_frac": 0.50,
}

_STAT_COLS = [
    "n_words",
    "n_lines",
    "dup_line_frac",
    "dup_line_char_frac",
    "top_2gram_char_frac",
    "dup_3gram_char_frac",
]


def _flatten_with_parent(list_arr: pa.ListArray):
    """(values, parent_row_index) for a non-null list array."""
    offsets = list_arr.offsets.to_numpy(zero_copy_only=False)
    counts = np.diff(offsets)
    parent = np.repeat(np.arange(len(list_arr), dtype=np.int64), counts)
    return list_arr.values, parent


def repetition_stats_table(
    ids: pa.Array, texts: pa.Array, id_field: pa.Field, thresholds=None
) -> pa.Table:
    """Vectorized kernel: one Arrow table of repetition stats per doc."""
    th = dict(DEFAULT_THRESHOLDS)
    if thresholds:
        th.update(thresholds)
    n = len(texts)
    texts = pc.fill_null(texts, "")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()

    # ---- words ----------------------------------------------------------
    words_list = pc.split_pattern_regex(texts, pattern=WS_RE)
    flat, parent = _flatten_with_parent(words_list)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    codes_arr = pc.dictionary_encode(flat.filter(pa.array(keep)))
    parent_w = parent[keep]
    codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    wlen_dict = pc.utf8_length(codes_arr.dictionary).to_numpy(
        zero_copy_only=False
    )
    wlen = wlen_dict[codes] if len(codes) else np.zeros(0, np.int64)
    n_words = np.bincount(parent_w, minlength=n).astype(np.int64)
    wchars = np.bincount(parent_w, weights=wlen, minlength=n)

    # ---- word 2-grams: max char coverage --------------------------------
    top2 = np.zeros(n, dtype=np.float64)
    if len(codes) >= 2:
        adj = parent_w[:-1] == parent_w[1:]
        i2 = np.nonzero(adj)[0]
        if len(i2):
            arr2 = np.stack(
                [parent_w[i2], codes[i2], codes[i2 + 1]], axis=1
            )
            u2, c2 = np.unique(arr2, axis=0, return_counts=True)
            gchars = wlen_dict[u2[:, 1]] + wlen_dict[u2[:, 2]]
            np.maximum.at(top2, u2[:, 0], (c2 * gchars).astype(np.float64))

    # ---- word 3-grams: duplicated-position char coverage -----------------
    cov3 = np.zeros(n, dtype=np.float64)
    if len(codes) >= 3:
        adj3 = (parent_w[:-2] == parent_w[1:-1]) & (
            parent_w[:-2] == parent_w[2:]
        )
        i3 = np.nonzero(adj3)[0]
        if len(i3):
            arr3 = np.stack(
                [parent_w[i3], codes[i3], codes[i3 + 1], codes[i3 + 2]],
                axis=1,
            )
            u3, inv3, c3 = np.unique(
                arr3, axis=0, return_inverse=True, return_counts=True
            )
            starts = i3[c3[inv3] >= 2]
            covered = np.zeros(len(codes), dtype=bool)
            for off in (0, 1, 2):
                covered[starts + off] = True
            if covered.any():
                cov3 = np.bincount(
                    parent_w[covered], weights=wlen[covered], minlength=n
                )

    wpos = wchars > 0
    top2_frac = np.zeros(n, dtype=np.float64)
    dup3_frac = np.zeros(n, dtype=np.float64)
    top2_frac[wpos] = top2[wpos] / wchars[wpos]
    dup3_frac[wpos] = cov3[wpos] / wchars[wpos]

    # ---- lines -----------------------------------------------------------
    lines_list = pc.split_pattern(texts, pattern="\n")
    lflat, lparent = _flatten_with_parent(lines_list)
    lkeep = pc.not_equal(
        pc.utf8_trim(lflat, _LINE_STRIP), ""
    ).to_numpy(zero_copy_only=False)
    lcodes_arr = pc.dictionary_encode(lflat.filter(pa.array(lkeep)))
    lparent = lparent[lkeep]
    lcodes = lcodes_arr.indices.to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    llen_dict = pc.utf8_length(lcodes_arr.dictionary).to_numpy(
        zero_copy_only=False
    )
    n_lines = np.bincount(lparent, minlength=n).astype(np.int64)
    dupline_frac = np.zeros(n, dtype=np.float64)
    dupchar_frac = np.zeros(n, dtype=np.float64)
    if len(lcodes):
        arr = np.stack([lparent, lcodes], axis=1)
        u, c = np.unique(arr, axis=0, return_counts=True)
        ndist = np.bincount(u[:, 0], minlength=n).astype(np.int64)
        ulen = llen_dict[u[:, 1]]
        lchars = np.bincount(u[:, 0], weights=(ulen * c), minlength=n)
        dup = c >= 2
        dchars = np.bincount(
            u[dup, 0], weights=(ulen[dup] * c[dup]), minlength=n
        )
        lp = n_lines > 0
        dupline_frac[lp] = 1.0 - ndist[lp] / n_lines[lp]
        cp = lchars > 0
        dupchar_frac[cp] = dchars[cp] / lchars[cp]

    keep_mask = (
        (dupline_frac <= th["dup_line_frac"])
        & (dupchar_frac <= th["dup_line_char_frac"])
        & (top2_frac <= th["top_2gram_char_frac"])
        & (dup3_frac <= th["dup_3gram_char_frac"])
    )
    return pa.table(
        {
            id_field.name: ids,
            "n_words": pa.array(n_words, pa.int64()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "dup_line_frac": pa.array(dupline_frac, pa.float64()),
            "dup_line_char_frac": pa.array(dupchar_frac, pa.float64()),
            "top_2gram_char_frac": pa.array(top2_frac, pa.float64()),
            "dup_3gram_char_frac": pa.array(dup3_frac, pa.float64()),
            "keep": pa.array(keep_mask),
        }
    )


def repetition_stats_dataset(
    ds, id_col: str = "doc_id", text_col: str = "text", thresholds=None
):
    """-> Dataset(id, n_words, n_lines, dup_line_frac, dup_line_char_frac,
    top_2gram_char_frac, dup_3gram_char_frac, keep).  Row-local: no
    shuffle at any scale."""

    def kernel(batch: pa.Table) -> pa.Table:
        return repetition_stats_table(
            batch.column(id_col),
            batch.column(text_col),
            batch.schema.field(id_col),
            thresholds,
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def filter_repetitive(
    ds, id_col: str = "doc_id", text_col: str = "text", thresholds=None
):
    """Surviving original rows (all input columns) under the thresholds —
    the filter step of a quality pipeline, fused into the stats kernel so
    the corpus streams through exactly once."""

    def kernel(batch: pa.Table) -> pa.Table:
        stats = repetition_stats_table(
            batch.column(id_col),
            batch.column(text_col),
            batch.schema.field(id_col),
            thresholds,
        )
        return batch.filter(stats.column("keep"))

    return ds.map_batches(kernel, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Scalar reference (tests only): independent per-row implementation used by
# the differential/hypothesis suite to cross-check the vectorized kernel.
# ---------------------------------------------------------------------------

_NONWS = re.compile(NONWS_RE)


def repetition_stats_row(text: Optional[str], thresholds=None) -> dict:
    th = dict(DEFAULT_THRESHOLDS)
    if thresholds:
        th.update(thresholds)
    t = text or ""
    words: List[str] = _NONWS.findall(t)
    wchars = sum(len(w) for w in words)
    top2 = 0
    if len(words) >= 2:
        counts: Dict[tuple, int] = {}
        for i in range(len(words) - 1):
            g = (words[i], words[i + 1])
            counts[g] = counts.get(g, 0) + 1
        top2 = max(c * (len(g[0]) + len(g[1])) for g, c in counts.items())
    covered = [False] * len(words)
    if len(words) >= 3:
        c3: Dict[tuple, int] = {}
        for i in range(len(words) - 2):
            g = tuple(words[i : i + 3])
            c3[g] = c3.get(g, 0) + 1
        for i in range(len(words) - 2):
            if c3[tuple(words[i : i + 3])] >= 2:
                covered[i] = covered[i + 1] = covered[i + 2] = True
    cov3 = sum(len(w) for w, c in zip(words, covered) if c)
    lines = [
        ln for ln in t.split("\n") if ln.strip(_LINE_STRIP) != ""
    ]
    lcounts: Dict[str, int] = {}
    for ln in lines:
        lcounts[ln] = lcounts.get(ln, 0) + 1
    lchars = sum(len(ln) for ln in lines)
    dchars = sum(
        len(ln) * c for ln, c in lcounts.items() if c >= 2
    )
    out = {
        "n_words": len(words),
        "n_lines": len(lines),
        "dup_line_frac": (
            1.0 - len(lcounts) / len(lines) if lines else 0.0
        ),
        "dup_line_char_frac": (dchars / lchars if lchars else 0.0),
        "top_2gram_char_frac": (top2 / wchars if wchars else 0.0),
        "dup_3gram_char_frac": (cov3 / wchars if wchars else 0.0),
    }
    out["keep"] = (
        out["dup_line_frac"] <= th["dup_line_frac"]
        and out["dup_line_char_frac"] <= th["dup_line_char_frac"]
        and out["top_2gram_char_frac"] <= th["top_2gram_char_frac"]
        and out["dup_3gram_char_frac"] <= th["dup_3gram_char_frac"]
    )
    return out
