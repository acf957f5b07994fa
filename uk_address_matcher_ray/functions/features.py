"""Post-tokenisation feature kernels: TF attachment and unusual-token features.

Re-expresses the reference's T3 + P1-P5 operators (cleaning_steps.py:326-582)
over plain Python rows; applied batch-wise from stages/clean.py.

Histogram encoding: the reference's DuckDB ``map<struct<tok,rel_freq>,uint64>``
(cleaning_steps.py:462-463) is represented as a list of
``{tok, rel_freq, count}`` structs sorted by (tok, rel_freq). Since rel_freq
is a deterministic function of tok (one TF table for both sides), this is a
faithful re-encoding of the multiset (SURVEY.md §1.4). An empty source list
yields None (DuckDB aggregate over zero elements is NULL), which drives the
comparison null-levels.
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List, Optional, Sequence, Tuple

DEFAULT_REL_FREQ = 5e-5  # COALESCE(rel_freq, 5e-5), cleaning_steps.py:339
FIRST_UNUSUAL_THRESHOLD = 1e-3  # cleaning_steps.py:416

TokFreq = Tuple[str, float]


def attach_term_frequencies(
    tokens: Sequence[str], tf: Dict[str, float]
) -> List[TokFreq]:
    """T3 (cleaning_steps.py:326-367): token order preserved, unseen -> 5e-5."""
    return [(t, tf.get(t, DEFAULT_REL_FREQ)) for t in tokens]


def move_common_end_tokens(
    arr: List[TokFreq], end_tokens: FrozenSet[str]
) -> Tuple[List[TokFreq], List[TokFreq]]:
    """P1 (cleaning_steps.py:484-550) -> (token_rel_freq_arr, common_end_tokens).

    common_end_tokens = entries of the LAST THREE positions whose tok is in the
    end-token list; entries are then removed only from the LAST TWO positions
    (1-based i > len-2). The off-by-one asymmetry is the reference's.
    """
    n = len(arr)
    common = [x for x in arr[-3:] if x[0] in end_tokens]
    kept = [
        x
        for i, x in enumerate(arr, 1)
        if not (i > n - 2 and x[0] in end_tokens)
    ]
    return kept, common


def first_unusual_token(arr: List[TokFreq]) -> Optional[TokFreq]:
    """P2 (cleaning_steps.py:411-425): first entry with rel_freq < 1e-3."""
    for x in arr:
        if x[1] < FIRST_UNUSUAL_THRESHOLD:
            return x
    return None


def promote_first_unusual(
    numeric_token_1: Optional[str],
    arr: List[TokFreq],
    fu: Optional[TokFreq],
) -> Tuple[Optional[str], List[TokFreq]]:
    """P3 (cleaning_steps.py:428-448).

    If numeric_token_1 is NULL: promote fu.tok into numeric_token_1 and drop
    every entry whose tok equals fu.tok from the array (NULL-safe coalesce).
    """
    if numeric_token_1 is not None:
        return numeric_token_1, arr
    if fu is None:
        return None, arr
    return fu[0], [x for x in arr if x[0] != fu[0]]


def separate_unusual_tokens(
    arr: List[TokFreq],
) -> Tuple[List[str], List[str], List[str]]:
    """P4 (cleaning_steps.py:553-582): stable sort by rel_freq asc, band-filter.

    Bands: unusual [5e-5, 1e-4); very [1e-7, 5e-5); extremely < 1e-7.
    """
    s = sorted(arr, key=lambda x: x[1])  # Python sort is stable == list_grade_up
    unusual = [t for t, f in s if 5e-5 <= f < 1e-4]
    very = [t for t, f in s if 1e-7 <= f < 5e-5]
    extremely = [t for t, f in s if f < 1e-7]
    return unusual, very, extremely


def histogram(arr: Optional[List[TokFreq]]) -> Optional[List[dict]]:
    """P5 (cleaning_steps.py:462-463): multiset of (tok, rel_freq) structs.

    Returns None for empty/None input (DuckDB histogram over nothing -> NULL).
    """
    if not arr:
        return None
    counts: Dict[TokFreq, int] = {}
    for x in arr:
        counts[x] = counts.get(x, 0) + 1
    return [
        {"tok": k[0], "rel_freq": k[1], "count": v}
        for k, v in sorted(counts.items())
    ]
