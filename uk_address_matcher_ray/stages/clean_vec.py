"""Vectorized cleaning core: C5-C11 + T3 + P1-P5 as Arrow/numpy kernels.

``clean_batch_vec`` produces a table bit-identical to the per-row
``stages.clean.clean_batch`` (the semantic spec, differential-tested in
tests/test_clean_vec.py) but with every step expressed as a column kernel:

- C5 remove_duplicate_end_tokens: vectorized predicate over the space-split
  token lists; only the (rare) matching rows take the scalar Python path.
- C7 parse_out_flat_position_and_letter: three ``pc.extract_regex`` calls +
  coalesce (RE2 is the same engine DuckDB runs, leftmost-first like Python
  ``re`` for these patterns; cleaning_steps.py:122-169).
- C8 parse_out_numbers: one RE2 global replace marks every numeric-token
  match with NUL delimiters, one split recovers the match list (findall ==
  non-overlapping leftmost matches of the same scan); the all-digits
  flat-letter first-token drop (cleaning_steps.py:172-211) is a mask.
- C10 split_numeric_tokens: one ``extract_regex`` of the first three digit
  runs over the space-joined numeric tokens (cleaning_steps.py:231-243).
- C11 tokenise: literal single-space split (clean_second_pass guarantees
  collapsed whitespace, asserted by the differential test).
- T3/P1-P5: the flattened token array is dictionary-encoded once; rel_freq,
  end-token membership and the P1/P2/P3 masks are numpy segment algebra
  over (row_id, position); P4's stable rel_freq sort is one ``np.lexsort``;
  P5's histograms are a run-length encode of (row, token-rank) after that
  sort, ranks taken from the Python-order-sorted dictionary so the struct
  order matches ``sorted(counts.items())`` exactly.

Rows whose address contains NUL (would corrupt the C8 marker) fall back to
the scalar row path; nothing in a real corpus contains NUL, but the
differential property test generates it.
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from uk_address_matcher_ray import schema as sch
from uk_address_matcher_ray.functions import features as F
from uk_address_matcher_ray.functions import text as T

_FLOOR_PAT = (
    r"\b(?P<g>BASEMENT|GROUND FLOOR|FIRST FLOOR|SECOND FLOOR|THIRD FLOOR"
    r"|TOP FLOOR|GARDEN)\b"
)
_LETTER_PAT = r"\b\d{0,4}(?P<g>[A-Za-z])\b"
_LEADING_PAT = r"^\s*\d+(?P<g>[A-Za-z])\b"
_FLATNUM_PAT = r"\b(?P<k>FLAT|UNIT|APARTMENT)\s+(?P<n>\S*\d\S*)\s+\S*\d\S*\b"
_NUM_PAT = r"\b(\d{1,5}-\d{1,5}|[A-Za-z]?\d{1,5}[A-Za-z]?)\b"
_RUNS_PAT = r"(?P<a>\d+)(?:\D+(?P<b>\d+))?(?:\D+(?P<c>\d+))?"
_NUL = "\x00"


def _np(arr) -> np.ndarray:
    return arr.to_numpy(zero_copy_only=False)


def _flat(list_arr: pa.ListArray):
    """(offsets int64 np, flat values Array) with slice offset normalized."""
    if list_arr.offset != 0:
        list_arr = pa.concat_arrays([list_arr])
    offs = list_arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return offs, list_arr.values


def _segment_positions(offs: np.ndarray):
    """row_id and 0-based within-row position for each flattened element."""
    lens = offs[1:] - offs[:-1]
    total = int(offs[-1] - offs[0])
    row_id = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    pos = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    ) - offs[0]
    return lens, row_id, pos + 0  # pos is 0-based within row


def _dedup_end_tokens_vec(addr: pa.StringArray) -> pa.StringArray:
    """C5 (cleaning_steps.py:260-286): vectorized trigger predicate; matching
    rows (rare) run the scalar kernel."""
    parts = pc.split_pattern(addr, " ")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    offs, vals = _flat(parts)
    lens = offs[1:] - offs[:-1]
    n = len(addr)

    def tail_eq(back_a: int, back_b: int, need: int) -> np.ndarray:
        ok = lens >= need
        ia = np.where(ok, offs[1:] - back_a, offs[0])
        ib = np.where(ok, offs[1:] - back_b, offs[0])
        if not ok.any():
            return np.zeros(n, dtype=bool)
        eq = _np(
            pc.equal(
                vals.take(pa.array(ia, pa.int64())),
                vals.take(pa.array(ib, pa.int64())),
            )
        )
        return ok & eq

    cond = tail_eq(1, 2, 2) | (tail_eq(2, 4, 4) & tail_eq(1, 3, 4))
    hit = np.flatnonzero(cond)
    if len(hit) == 0:
        return addr
    fixed = pa.array(
        [T.remove_duplicate_end_tokens(s) for s in addr.take(pa.array(hit, pa.int64())).to_pylist()],
        pa.string(),
    )
    # scatter the fixed rows back
    out = _np(addr).astype(object)
    out[hit] = np.asarray(fixed.to_pylist(), dtype=object)
    return pa.array(out, pa.string())


def _parse_flat_vec(addr: pa.StringArray):
    """C7 -> (flat_positional, flat_letter) columns."""
    fp = pc.struct_field(pc.extract_regex(addr, _FLOOR_PAT), "g")
    l1 = pc.struct_field(pc.extract_regex(addr, _LETTER_PAT), "g")
    l2 = pc.struct_field(pc.extract_regex(addr, _LEADING_PAT), "g")
    kw = pc.struct_field(pc.extract_regex(addr, _FLATNUM_PAT), "k")
    kw = pc.if_else(
        pc.less_equal(pc.utf8_length(kw), 4), kw, pa.scalar(None, pa.string())
    )
    letter = pc.coalesce(l1, l2, kw)
    return fp, letter


def _parse_numbers_vec(addr: pa.StringArray, flat_letter):
    """C8 -> (address_without_numbers pre-C9, numeric_tokens ListArray)."""
    marked = pc.replace_substring_regex(
        addr, pattern=_NUM_PAT, replacement=_NUL + r"\1" + _NUL
    )
    parts = pc.split_pattern(marked, _NUL)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    offs, vals = _flat(parts)
    lens = offs[1:] - offs[:-1]
    m = (lens - 1) // 2  # match count per row
    total = int(m.sum())
    starts = offs[:-1] + 1
    within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
    tok_idx = np.repeat(starts, m) + 2 * within

    # all-digits flat_letter drops the FIRST numeric token (DuckDB [2:])
    drop = _np(
        pc.fill_null(
            pc.match_substring_regex(flat_letter, r"^\d+$"), False
        )
    ).astype(bool)
    keep_elem = ~(np.repeat(drop, m) & (within == 0))
    tok_idx = tok_idx[keep_elem]
    m2 = m - (drop & (m > 0)).astype(np.int64)

    num_vals = vals.take(pa.array(tok_idx, pa.int64()))
    num_offs = np.concatenate(([0], np.cumsum(m2)))
    num_toks = pa.ListArray.from_arrays(
        pa.array(num_offs, pa.int32()), num_vals
    )
    without = pc.replace_substring_regex(addr, pattern=_NUM_PAT, replacement="")
    return without, num_toks


def _split_numeric_vec(num_toks: pa.ListArray):
    """C10: first three digit runs of ' '.join(numeric_tokens)."""
    joined = pc.binary_join(num_toks, " ")
    runs = pc.extract_regex(joined, _RUNS_PAT)

    def grp(name):
        # RE2 reports a non-participating optional group as '' — the scalar
        # spec yields None there; '' can never be a real digit run (\d+)
        g = pc.struct_field(runs, name)
        return pc.if_else(
            pc.equal(g, ""), pa.scalar(None, pa.string()), g
        )

    return grp("a"), grp("b"), grp("c")


def _clean_second_pass_vec(arr):
    """C9: collapse whitespace runs + trim ASCII spaces."""
    a = pc.replace_substring_regex(arr, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim(a, " ")


def _hist_list(
    offsets_obj: List, toks: pa.Array, rfs: np.ndarray, counts: np.ndarray
) -> pa.Array:
    values = pa.StructArray.from_arrays(
        [
            toks,
            pa.array(rfs, pa.float64()),
            pa.array(counts, pa.int64()),
        ],
        names=["tok", "rel_freq", "count"],
    )
    return pa.ListArray.from_arrays(pa.array(offsets_obj, pa.int32()), values)


def _null_offsets(counts: np.ndarray) -> List:
    """int32 list offsets with None where the row's count is 0 (DuckDB
    histogram over nothing is NULL). pyarrow semantics: a null at
    offsets[i] makes LIST i null (verified empirically)."""
    bounds = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    out: List = [int(b) for b in bounds]
    for i, c in enumerate(counts):
        if c == 0:
            out[i] = None
    return out


def parse_chain_vec(addr: pa.StringArray):
    """C5-C11 over a non-null prefix-cleaned address column -> (addr
    post-C5 i.e. original_address_concat, flat_positional, flat_letter,
    address_without_numbers, numeric_tokens ListArray, nt1, nt2, nt3,
    token ListArray). Shared by the cleaning stage and the corpus-stats
    counting kernel."""
    addr = _dedup_end_tokens_vec(addr)
    flat_positional, flat_letter = _parse_flat_vec(addr)
    without_raw, num_toks = _parse_numbers_vec(addr, flat_letter)
    without = _clean_second_pass_vec(without_raw)
    nt1, nt2, nt3 = _split_numeric_vec(num_toks)
    tok_list = pc.split_pattern(without, " ")
    if isinstance(tok_list, pa.ChunkedArray):
        tok_list = tok_list.combine_chunks()
    return (
        addr, flat_positional, flat_letter, without,
        num_toks, nt1, nt2, nt3, tok_list,
    )


def corpus_token_stats_vec(addrs):
    """Vectorized equivalent of stages.tf.corpus_token_stats: one parse
    chain + four ``value_counts`` instead of a per-row Python pass.
    Returns the same four Counters (address tokens, numeric tokens, end
    tokens, nt1-3 values); falls back to the scalar path for NUL-bearing
    inputs (same guard as clean_batch_vec)."""
    from collections import Counter

    from uk_address_matcher_ray.functions.text import (
        clean_address_first_pass_vec,
    )

    arr = addrs if isinstance(addrs, (pa.Array, pa.ChunkedArray)) else pa.array(
        [a for a in addrs], pa.string()
    )
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    cleaned = clean_address_first_pass_vec(arr)
    if isinstance(cleaned, pa.ChunkedArray):
        cleaned = cleaned.combine_chunks()
    if _np(pc.match_substring(pc.fill_null(cleaned, ""), _NUL)).any():
        from uk_address_matcher_ray.stages.tf import _corpus_token_stats_rows

        return _corpus_token_stats_rows(
            arr.to_pylist() if not isinstance(addrs, list) else addrs
        )
    keep = np.flatnonzero(_np(pc.is_valid(cleaned)))
    addr = cleaned.take(pa.array(keep, pa.int64()))
    (_a, _fp, _fl, _wo, num_toks, nt1, nt2, nt3, tok_list) = parse_chain_vec(
        addr
    )

    def counts_of(values) -> Counter:
        vc = pc.value_counts(values)
        return Counter(
            dict(
                zip(
                    vc.field("values").to_pylist(),
                    vc.field("counts").to_pylist(),
                )
            )
        )

    tok_counts = counts_of(tok_list.values)
    num_counts = counts_of(num_toks.values)
    nt123 = Counter()
    for c in (nt1, nt2, nt3):
        vc = pc.value_counts(pc.drop_null(c))
        for t, cnt in zip(
            vc.field("values").to_pylist(), vc.field("counts").to_pylist()
        ):
            nt123[t] += cnt
    # end tokens: each row's LAST token when non-empty (scalar spec:
    # `if core.tokens and core.tokens[-1]`)
    offs, flat = _flat(tok_list)
    if len(offs) > 1:
        last = flat.take(pa.array(offs[1:] - 1, pa.int64()))
        last = last.filter(pc.not_equal(last, ""))
        end_counts = counts_of(last)
    else:
        end_counts = Counter()
    return tok_counts, num_counts, end_counts, nt123


def clean_batch_vec(
    batch: pa.Table,
    tf: Dict[str, float],
    end_tokens: FrozenSet[str],
) -> pa.Table:
    """Vectorized equivalent of ``stages.clean.clean_batch``."""
    addr_all = T.clean_address_first_pass_vec(
        batch.column("address_concat").cast(pa.string())
    )
    pc_all = T.clean_postcode_vec(batch.column("postcode").cast(pa.string()))
    if isinstance(addr_all, pa.ChunkedArray):
        addr_all = addr_all.combine_chunks()
    if isinstance(pc_all, pa.ChunkedArray):
        pc_all = pc_all.combine_chunks()

    # NUL would corrupt the C8 marker split -> scalar fallback for the batch
    has_nul = pc.match_substring(pc.fill_null(addr_all, ""), _NUL)
    if _np(has_nul).any():
        from uk_address_matcher_ray.stages.clean import clean_batch

        return clean_batch(batch, tf, end_tokens)

    keep = np.flatnonzero(_np(pc.is_valid(addr_all)))
    taken = batch.take(pa.array(keep, pa.int64()))
    addr = addr_all.take(pa.array(keep, pa.int64()))
    pcode = pc_all.take(pa.array(keep, pa.int64()))
    n = len(addr)

    # C5-C11 (C11's literal-space split is valid because C9 guarantees
    # single-space-collapsed trimmed strings)
    (
        addr, flat_positional, flat_letter, without,
        num_toks, nt1, nt2, nt3, tok_list,
    ) = parse_chain_vec(addr)

    # ---- T3 + P1-P5 over the flattened token array -----------------------
    offs, flat_toks = _flat(tok_list)
    lens, row_id, pos = _segment_positions(offs)
    enc = flat_toks.dictionary_encode()
    codes = _np(enc.indices).astype(np.int64)
    dict_strs: List[str] = enc.dictionary.to_pylist()
    rf_dict = np.array(
        [tf.get(t, F.DEFAULT_REL_FREQ) for t in dict_strs], dtype=np.float64
    )
    end_dict = np.array([t in end_tokens for t in dict_strs], dtype=bool)
    if len(dict_strs):
        order_d = np.argsort(np.array(dict_strs, dtype=object), kind="stable")
        rank_dict = np.empty(len(dict_strs), dtype=np.int64)
        rank_dict[order_d] = np.arange(len(dict_strs), dtype=np.int64)
    else:
        rank_dict = np.empty(0, dtype=np.int64)
    rf = rf_dict[codes] if len(codes) else np.empty(0, np.float64)
    is_end = end_dict[codes] if len(codes) else np.empty(0, bool)
    rank = rank_dict[codes] if len(codes) else np.empty(0, np.int64)

    n_rep = np.repeat(lens, lens)
    from_end = n_rep - pos  # 1 = last token
    # P1
    common_mask = is_end & (from_end <= 3)
    kept_mask = ~(is_end & (from_end <= 2))

    # P2: first kept entry with rf < threshold, per row
    fu_code = np.full(n, -1, dtype=np.int64)
    cand = np.flatnonzero(kept_mask & (rf < F.FIRST_UNUSUAL_THRESHOLD))
    if len(cand):
        rows_c, first_i = np.unique(row_id[cand], return_index=True)
        fu_code[rows_c] = codes[cand[first_i]]

    # P3: promote fu into NULL numeric_token_1, drop its token from kept
    nt1_valid = _np(pc.is_valid(nt1))
    promote = (~nt1_valid) & (fu_code >= 0)
    if promote.any():
        promote_rep = np.repeat(promote, lens)
        fu_rep = np.repeat(fu_code, lens)
        kept_mask = kept_mask & ~(promote_rep & (codes == fu_rep))
        nt1_py = nt1.to_pylist()
        for i in np.flatnonzero(promote):
            nt1_py[i] = dict_strs[fu_code[i]]
        nt1 = pa.array(nt1_py, pa.string())

    # P4: stable sort kept entries by rel_freq asc within row
    kept_idx = np.flatnonzero(kept_mask)
    order = kept_idx[
        np.lexsort((kept_idx, rf[kept_idx], row_id[kept_idx]))
    ]

    r_o = rf[order]

    def band_list(mask: np.ndarray) -> pa.ListArray:
        sel = order[mask]
        vals = flat_toks.take(pa.array(sel, pa.int64()))
        cnt = np.bincount(row_id[sel], minlength=n).astype(np.int64)
        o = np.concatenate(([0], np.cumsum(cnt)))
        return pa.ListArray.from_arrays(pa.array(o, pa.int32()), vals)

    unusual = band_list((r_o >= 5e-5) & (r_o < 1e-4))
    very = band_list((r_o >= 1e-7) & (r_o < 5e-5))
    extremely = band_list(r_o < 1e-7)

    def hist_over(idx_sorted_by_row_rank: np.ndarray) -> pa.Array:
        """Histogram list column from flat indices sorted by (row, rank)."""
        if len(idx_sorted_by_row_rank) == 0:
            return _hist_list(
                _null_offsets(np.zeros(n, dtype=np.int64)),
                pa.array([], pa.string()),
                np.empty(0, np.float64),
                np.empty(0, np.int64),
            )
        rr = row_id[idx_sorted_by_row_rank]
        kk = rank[idx_sorted_by_row_rank]
        bound = np.concatenate(
            ([True], (rr[1:] != rr[:-1]) | (kk[1:] != kk[:-1]))
        )
        b_idx = np.flatnonzero(bound)
        counts = np.diff(np.concatenate((b_idx, [len(rr)])))
        toks = flat_toks.take(
            pa.array(idx_sorted_by_row_rank[b_idx], pa.int64())
        )
        rfs = rf[idx_sorted_by_row_rank[b_idx]]
        per_row = np.bincount(rr[b_idx], minlength=n).astype(np.int64)
        return _hist_list(_null_offsets(per_row), toks, rfs, counts)

    # token_rel_freq_arr_hist: kept entries grouped by (row, rank)
    kept2 = np.flatnonzero(kept_mask)
    hist_order = kept2[np.lexsort((rank[kept2], row_id[kept2]))]
    tok_hist = hist_over(hist_order)
    # common_end_tokens_hist
    com = np.flatnonzero(common_mask)
    com_order = com[np.lexsort((rank[com], row_id[com]))]
    cet_hist = hist_over(com_order)

    cols: List[pa.Array] = []
    names: List[str] = []
    by_name = {
        "numeric_token_1": nt1,
        "numeric_token_2": nt2,
        "numeric_token_3": nt3,
        "token_rel_freq_arr_hist": tok_hist,
        "common_end_tokens_hist": cet_hist,
        "postcode": pcode,
        "original_address_concat": addr,
        "flat_positional": flat_positional,
        "flat_letter": flat_letter,
        "unusual_tokens_arr": unusual,
        "very_unusual_tokens_arr": very,
        "extremely_unusual_tokens_arr": extremely,
        "address_without_numbers": without,
    }
    from uk_address_matcher_ray.stages.clean import _CONSUMED

    for f in sch.CLEANED_FIELDS:
        names.append(f.name)
        if f.name == "unique_id":
            cols.append(taken.column("unique_id").cast(pa.string()).combine_chunks())
        else:
            cols.append(by_name[f.name].cast(f.type))
    for name in batch.column_names:
        if name not in _CONSUMED and name != "unique_id":
            names.append(name)
            cols.append(taken.column(name).combine_chunks())
    return pa.table(cols, names=names)
