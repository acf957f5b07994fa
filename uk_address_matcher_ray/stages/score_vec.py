"""Vectorized in-block Fellegi-Sunter pair scoring.

Semantically identical to the per-pair path in functions/compare.py
(score_pair) — asserted bit-exactly by tests/test_scoring_oracle.py and the
driver's DuckDB value-hash gate — but evaluated column-wise over ALL pairs of
a sorted block at once:

* string comparisons run on dictionary-encoded int32 codes (one Arrow
  ``dictionary_encode`` per column per block, SIMD equality after that);
* the histogram-product ladder computes each pair's product ONCE (the scalar
  path recomputes it per level — up to 34 times);
* transcendental ops stay bit-identical to the scalar engine: level Bayes
  factors pre-log2'd with ``math.log2``; TF-adjusted factors go through a
  unique-value LUT evaluated with Python floats (numpy's SIMD log2/pow differ
  from libm in the last ulp — measured, not guessed);
* the match weight is accumulated per comparison IN MODEL ORDER with
  elementwise float adds, preserving the scalar engine's (and the DuckDB
  oracle's) expression order exactly.

Reference semantics: splink_model.json comparisons via state/model.py;
level/gamma numbering per Splink (functions/compare.py:250-307).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa

from uk_address_matcher_ray.functions.text import levenshtein
from uk_address_matcher_ray.state.model import Level, MatchModel
from uk_address_matcher_ray.stages.block import (
    BLOCK_KEY2_COL,
    BLOCK_KEY_COL,
    RULE_COL,
    SIDE_COL,
)

_TF_ATTR = {"numeric_token_1": "nt1", "numeric_token_2": "nt2", "numeric_token_3": "nt3"}


def _single_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def _as_array(col) -> pa.Array:
    """ChunkedArray/Array -> plain Array (combine_chunks may stay chunked)."""
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 1:
            return col.chunk(0)
        if col.num_chunks == 0:
            return pa.array([], type=col.type)
        return pa.concat_arrays(col.chunks)
    return col


def _codes(col) -> np.ndarray:
    """Dictionary-encode a string column -> int codes, -1 for NULL."""
    import pyarrow.compute as pc

    enc = _single_array(col).dictionary_encode()
    return (
        pc.fill_null(enc.indices, -1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )


def _shared_codes(cols: List) -> List[np.ndarray]:
    """Dictionary-encode several columns against ONE shared dictionary so
    codes compare across columns (flat_letter vs numeric_token_1 etc.)."""
    import pyarrow.compute as pc

    arrs = [_single_array(c) for c in cols]
    joined = pa.concat_arrays([a.cast(pa.string()) for a in arrs])
    enc = joined.dictionary_encode()
    codes = (
        pc.fill_null(enc.indices, -1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    out = []
    ofs = 0
    for a in arrs:
        out.append(codes[ofs : ofs + len(a)])
        ofs += len(a)
    return out


class _HistCol:
    """Flattened histogram column (list<struct<tok,rel_freq,count>>) with
    LAZY per-row dict materialization.

    The eager per-row ((tok, rel_freq), count) tuple/dict build was measured
    as 74% of the whole scorer at x64 — built for EVERY gathered row while
    ``hist_prod`` actually touches a fraction of them. Here the primitive
    children convert once per slice (single C loops) and the r-side lookup
    dict materializes only for rows a pair actually reaches, keyed by int
    token codes (cheap hashing vs (str, float) tuples).

    Key equality must mean (tok, rel_freq) equality: rel_freq is the corpus
    TF of tok so tok -> rel_freq is functional by construction; a vectorized
    per-slice check verifies that and falls back to exact (tok, rel_freq)
    pair coding when violated. ``rfs`` are Python floats so the product in
    ``hist_prod`` uses libm pow (bit-exact vs the scalar engine / oracle)."""

    __slots__ = ("n", "valid", "offs", "codes", "rfs", "cnts", "_rdicts")

    def __init__(self, col, n: int):
        import pyarrow.compute as pc

        self.n = n
        self._rdicts: dict = {}
        arr = col
        if isinstance(arr, pa.ChunkedArray):
            arr = (
                arr.chunk(0)
                if arr.num_chunks == 1
                else pa.concat_arrays(arr.chunks)
                if arr.num_chunks
                else pa.array([], type=arr.type)
            )
        if arr is None or n == 0 or arr.null_count == len(arr):
            self.valid = np.zeros(n, dtype=bool)
            self.offs = np.zeros(n + 1, dtype=np.int64)
            self.codes = []
            self.rfs = []
            self.cnts = []
            return
        # normalize slice offset so offsets index the flattened children
        if arr.offset != 0:
            arr = pa.concat_arrays([arr])
        self.valid = arr.is_valid().to_numpy(zero_copy_only=False)
        self.offs = arr.offsets.to_numpy(zero_copy_only=False)
        vals = arr.values
        rf_np = vals.field("rel_freq").to_numpy(zero_copy_only=False)
        enc = vals.field("tok").dictionary_encode()
        tcode = (
            pc.fill_null(enc.indices, -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if len(tcode):
            order = np.argsort(tcode, kind="stable")
            # canonicalize ±0.0 to one bit pattern: the legacy tuple keys
            # compare rel_freq with Python float equality, where -0.0 == 0.0.
            # NaN caveat: bitwise treats same-bit NaNs as equal while the
            # legacy path only matches identical objects — unreachable for
            # corpus TFs (rel_freq is always a finite ratio).
            rf_bits = np.ascontiguousarray(rf_np).view(np.int64).copy()
            rf_bits[rf_np == 0.0] = 0
            tc_s = tcode[order]
            rf_s = rf_bits[order]
            same = tc_s[1:] == tc_s[:-1]
            if not np.all(rf_s[1:][same] == rf_s[:-1][same]):
                both = np.empty((len(tcode), 2), dtype=np.int64)
                both[:, 0] = tcode
                both[:, 1] = rf_bits
                _, tcode = np.unique(both, axis=0, return_inverse=True)
        self.codes = tcode.tolist()
        self.rfs = rf_np.tolist()  # Python floats: libm pow downstream
        self.cnts = vals.field("count").to_numpy(zero_copy_only=False).tolist()

    def rdict(self, i: int) -> dict:
        d = self._rdicts.get(i)
        if d is None:
            s, e = self.offs[i], self.offs[i + 1]
            d = dict(zip(self.codes[s:e], self.cnts[s:e]))
            self._rdicts[i] = d
        return d


class _RowFeatures:
    """Per-row (not per-pair) feature arrays for one sorted block table."""

    def __init__(self, tbl: pa.Table, numeric_tf: Dict[str, Dict[str, float]]):
        n = tbl.num_rows
        self.n = n
        names = set(tbl.column_names)

        def col(name):
            return tbl.column(name) if name in names else pa.chunked_array(
                [pa.nulls(n, pa.string())]
            )

        import pyarrow.compute as pc

        from uk_address_matcher_ray.util import timed

        pc_col = _as_array(col("postcode"))
        pc_obj = pc_col.to_numpy(zero_copy_only=False)
        self.postcode_str = pc_obj
        # outward = p.split(' ')[0]; inward = p.split(' ')[1] ('' when there
        # is no second part). Pure Arrow/numpy over the flattened split
        # parts — the per-row to_pylist loop here was 17% of the scorer.
        with timed("rf.pc_split"):
            sp = _as_array(pc.split_pattern(pc_col, " "))
            if sp.offset != 0:
                sp = pa.concat_arrays([sp])
            sp_offs = sp.offsets.to_numpy(zero_copy_only=False)
            sp_vals = sp.values
            starts = sp_offs[:-1]
            lens = sp_offs[1:] - starts
            sp_valid = sp.is_valid().to_numpy(zero_copy_only=False)
            has_first = sp_valid & (lens > 0)
            has_second = sp_valid & (lens > 1)
            null_str = pa.scalar(None, pa.string())
            outward_arr = pc.if_else(
                pa.array(has_first),
                sp_vals.take(pa.array(np.where(has_first, starts, 0), pa.int64())),
                null_str,
            )
            inward_arr = pc.if_else(
                pa.array(sp_valid),
                pc.if_else(
                    pa.array(has_second),
                    sp_vals.take(
                        pa.array(np.where(has_second, starts + 1, 0), pa.int64())
                    ),
                    pa.scalar("", pa.string()),
                ),
                null_str,
            )

        _tm_codes = timed("rf.codes"); _tm_codes.__enter__()
        nt1_col = col("numeric_token_1")
        nt1_arr = _as_array(nt1_col)
        nt1_obj = nt1_arr.to_numpy(zero_copy_only=False)
        # first digit run, NULL when none (mirror of re.search(r'\d+'))
        nt1_digits_arr = _as_array(
            pc.extract_regex(nt1_arr, r"(?P<d>[0-9]+)")
        ).field("d")

        # shared dictionary for cross-compared token columns
        self.nt1, self.nt2, self.nt3, self.flat_letter = _shared_codes(
            [nt1_col, col("numeric_token_2"), col("numeric_token_3"), col("flat_letter")]
        )
        self.original = _codes(col("original_address_concat"))
        self.postcode = _codes(col("postcode"))
        self.flat_positional = _codes(col("flat_positional"))
        self.nt1_digits = _codes(nt1_digits_arr)
        self.outward = _codes(outward_arr)
        self.inward = _codes(inward_arr)

        _tm_codes.__exit__()
        # histograms: flattened Arrow children + lazy per-row dicts.
        # Entries are STORED sorted by (tok, rel_freq) with unique keys
        # (functions/features.py:histogram) so slice order == sorted order.
        with timed("rf.hist_tok"):
            self.tok = _HistCol(
                tbl.column("token_rel_freq_arr_hist")
                if "token_rel_freq_arr_hist" in names
                else None,
                n,
            )
        with timed("rf.hist_cet"):
            self.cet = _HistCol(
                tbl.column("common_end_tokens_hist")
                if "common_end_tokens_hist" in names
                else None,
                n,
            )

        # term frequencies per row per tf-column (NaN = no adjustment value)
        self.tf: Dict[str, np.ndarray] = {}
        _tm_tf = timed("rf.tf"); _tm_tf.__enter__()
        obj_cols = {"numeric_token_1": nt1_obj}
        for tf_col, lookup in (numeric_tf or {}).items():
            if lookup is None:
                continue
            vals = obj_cols.get(tf_col)
            if vals is None:
                vals = col(tf_col).to_numpy(zero_copy_only=False)
            arr = np.full(n, np.nan)
            get = lookup.get
            for i, v in enumerate(vals):
                if v is not None:
                    t = get(v)
                    if t is not None:
                        arr[i] = t
            self.tf[tf_col] = arr
        _tm_tf.__exit__()


class _PairContext:
    """Lazily-computed per-pair arrays shared across level conditions."""

    def __init__(self, feats: _RowFeatures, LI: np.ndarray, RI: np.ndarray):
        self.f = feats
        self.LI = LI
        self.RI = RI
        self.n = len(LI)
        self._cache: Dict[str, np.ndarray] = {}

    def eq(self, la: np.ndarray, ra: np.ndarray) -> np.ndarray:
        a = la[self.LI]
        b = ra[self.RI]
        return (a == b) & (a >= 0)

    def null_l(self, arr) -> np.ndarray:
        return arr[self.LI] < 0

    def null_r(self, arr) -> np.ndarray:
        return arr[self.RI] < 0

    def hist_prod(self, which: str) -> np.ndarray:
        key = f"prod_{which}"
        out = self._cache.get(key)
        if out is not None:
            return out
        f = self.f
        h = f.cet if which == "cet" else f.tok
        from uk_address_matcher_ray.util import timed
        out = np.full(self.n, np.nan)
        both = h.valid[self.LI] & h.valid[self.RI]
        offs, codes, rfs, cnts = h.offs, h.codes, h.rfs, h.cnts
        LI, RI = self.LI, self.RI
        _tm = timed(f"sv.hist_prod_{which}"); _tm.__enter__()
        # product iterates the l row's entries in STORED (sorted) order —
        # float multiply order is identical to the scalar engine / oracle
        for k in np.nonzero(both)[0]:
            li = LI[k]
            s, e = offs[li], offs[li + 1]
            rd = h.rdict(RI[k])
            p = 1.0
            for j in range(s, e):
                cr = rd.get(codes[j], 0)
                if cr > 0:
                    cl = cnts[j]
                    p *= rfs[j] ** (cl if cl < cr else cr)
            out[k] = p
        _tm.__exit__()
        self._cache[key] = out
        return out

    def hist_valid_pair(self, which: str) -> np.ndarray:
        f = self.f
        v = (f.cet if which == "cet" else f.tok).valid
        return v[self.LI] & v[self.RI]

    def lev(self) -> np.ndarray:
        """Postcode Levenshtein per pair; 127 where either side NULL."""
        out = self._cache.get("lev")
        if out is not None:
            return out
        f = self.f
        out = np.full(self.n, 127, dtype=np.int64)
        pl = f.postcode[self.LI]
        pr = f.postcode[self.RI]
        both = (pl >= 0) & (pr >= 0)
        out[both & (pl == pr)] = 0
        todo = np.nonzero(both & (pl != pr))[0]
        from uk_address_matcher_ray.util import timed
        cache: Dict[tuple, int] = {}
        _tm = timed("sv.lev"); _tm.__enter__()
        for k in todo:
            a = f.postcode_str[self.LI[k]]
            b = f.postcode_str[self.RI[k]]
            ck = (a, b)
            d = cache.get(ck)
            if d is None:
                d = levenshtein(a, b)
                cache[ck] = d
            out[k] = d
        _tm.__exit__()
        self._cache["lev"] = out
        return out


def _cond_vector(cond: str, thr, cname: str, ctx: _PairContext) -> np.ndarray:
    f = ctx.f
    if cond == "else":
        return np.ones(ctx.n, dtype=bool)
    if cond == "exact:original_address_concat":
        return ctx.eq(f.original, f.original)
    if cond == "either_null:original_address_concat":
        return ctx.null_l(f.original) | ctx.null_r(f.original)
    if cond == "flat_all_null":
        return (
            ctx.null_l(f.flat_positional)
            & ctx.null_r(f.flat_positional)
            & ctx.null_l(f.flat_letter)
            & ctx.null_r(f.flat_letter)
        )
    if cond == "exact:flat_positional":
        return ctx.eq(f.flat_positional, f.flat_positional)
    if cond == "exact:flat_letter":
        return ctx.eq(f.flat_letter, f.flat_letter)
    if cond == "flat_letter_vs_numeric_token_1":
        return ctx.eq(f.flat_letter, f.nt1) | ctx.eq(f.nt1, f.flat_letter)
    if cond == "flat_positional_one_side_letter_other":
        return (
            ~ctx.null_l(f.flat_positional)
            & ctx.null_r(f.flat_positional)
            & ~ctx.null_r(f.flat_letter)
        ) | (
            ~ctx.null_r(f.flat_positional)
            & ctx.null_l(f.flat_positional)
            & ~ctx.null_l(f.flat_letter)
        )
    if cond == "exact:numeric_token_1":
        return ctx.eq(f.nt1, f.nt1)
    if cond == "either_null:numeric_token_1":
        return ctx.null_l(f.nt1) | ctx.null_r(f.nt1)
    if cond == "digits_equal:numeric_token_1":
        return ctx.eq(f.nt1_digits, f.nt1_digits)
    if cond == "inverted_12":
        return ctx.eq(f.nt2, f.nt1) | ctx.eq(f.nt1, f.nt2)
    if cond == "exact:numeric_token_2":
        return ctx.eq(f.nt2, f.nt2)
    if cond == "both_null:numeric_token_2":
        return ctx.null_l(f.nt2) & ctx.null_r(f.nt2)
    if cond == "either_null:numeric_token_2":
        return ctx.null_l(f.nt2) | ctx.null_r(f.nt2)
    if cond == "exact:numeric_token_3":
        return ctx.eq(f.nt3, f.nt3)
    if cond == "both_null:numeric_token_3":
        return ctx.null_l(f.nt3) & ctx.null_r(f.nt3)
    if cond == "either_null:numeric_token_3":
        return ctx.null_l(f.nt3) | ctx.null_r(f.nt3)
    if cond == "n2l_eq_n3r":
        return ctx.eq(f.nt2, f.nt3)
    if cond == "hist_null":
        which = "cet" if cname == "common_end_tokens" else "tok"
        return ~ctx.hist_valid_pair(which)
    if cond == "hist_product_lt":
        which = "cet" if cname == "common_end_tokens" else "tok"
        prod = ctx.hist_prod(which)
        with np.errstate(invalid="ignore"):
            return prod < thr
    if cond == "both_null:postcode":
        return ctx.null_l(f.postcode) & ctx.null_r(f.postcode)
    if cond == "exact:postcode":
        return ctx.eq(f.postcode, f.postcode)
    if cond == "postcode_lev1":
        return ctx.lev() <= 1
    if cond == "postcode_lev2":
        return ctx.lev() <= 2
    if cond == "outward_equal":
        return ctx.eq(f.outward, f.outward)
    if cond == "inward_equal":
        return ctx.eq(f.inward, f.inward)
    raise ValueError(f"unknown level condition: {cond}")


def _tf_log2_lut(level: Level, tf_pair: np.ndarray, base_log2: float) -> np.ndarray:
    """log2(bf * (u/tf)^w) per pair, exact: unique tf values evaluated with
    Python-float math (mirrors functions/compare.py:_tf_adjustment + log2)."""
    sent = np.where(np.isnan(tf_pair), -1.0, tf_pair)
    uniq, inv = np.unique(sent, return_inverse=True)
    lut = np.empty(len(uniq))
    for i, v in enumerate(uniq.tolist()):
        if v < 0:
            lut[i] = base_log2
        else:
            lut[i] = math.log2(
                level.bayes_factor * ((level.u_probability / v) ** level.tf_weight)
            )
    return lut[inv]


def prune_pairs_local(tbl: pa.Table, top_n: int, min_weight: float) -> pa.Table:
    """Task-local safe pre-prune before the unique_id_r shuffle (used by the
    improve path only): keep per messy record the ``top_n`` pairs by
    (match_weight DESC, unique_id_l DESC) — the EXACT order the second pass
    sorts by (stages/rescore.py:96-99) — and drop pairs at or below its
    ``min_weight`` cut, which rescore_group discards unconditionally. The
    global top-n is a subset of the union of per-task top-n, so results are
    identical while the all-to-all moves a fraction of the rows."""
    import numpy as np

    if tbl.num_rows == 0:
        return tbl
    mw = tbl.column("match_weight").to_numpy(zero_copy_only=False)
    keep = mw > min_weight
    if not keep.all():
        tbl = tbl.filter(pa.array(keep))
        mw = mw[keep]
    if tbl.num_rows == 0:
        return tbl
    uid_r = tbl.column("unique_id_r").to_numpy(zero_copy_only=False)
    uid_l = tbl.column("unique_id_l").to_numpy(zero_copy_only=False)
    _, r_rank = np.unique(uid_r, return_inverse=True)
    _, l_rank = np.unique(uid_l, return_inverse=True)
    order = np.lexsort((-l_rank, -mw, r_rank))
    rr = r_rank[order]
    ll = l_rank[order]
    # task-local (l, r) dedup first: multi-rule copies are identical rows for
    # the improve path and must not consume top-n slots
    first = np.ones(len(order), dtype=bool)
    first[1:] = (rr[1:] != rr[:-1]) | (ll[1:] != ll[:-1])
    order = order[first]
    rr = rr[first]
    pos = np.arange(len(order))
    starts = np.concatenate(([0], np.nonzero(rr[1:] != rr[:-1])[0] + 1))
    group_start = np.repeat(starts, np.diff(np.concatenate((starts, [len(order)]))))
    sel = order[pos - group_start < top_n]
    return tbl.take(pa.array(np.sort(sel)))


def score_pairs_vectorized(
    tbl: pa.Table,
    model: MatchModel,
    numeric_tf: Dict[str, Dict[str, float]],
    threshold: float,
    out_schema: pa.Schema,
    retain_columns: Sequence[str] = (),
    max_pairs_per_block: int = 1_000_000,
) -> pa.Table:
    """Score all l×r pairs of every complete block-key group in ``tbl``
    (sorted by BLOCK_KEY_COL) -> pair table matching ``out_schema``."""
    n = tbl.num_rows
    if n == 0:
        return out_schema.empty_table()

    keys = tbl.column(BLOCK_KEY_COL).to_numpy(zero_copy_only=False)
    side = tbl.column(SIDE_COL).to_numpy(zero_copy_only=False).astype(np.int8)
    # group identity is the (hash1, hash2) uint64 pair — a boundary is a
    # change in EITHER column (rows arrive sorted by both)
    change = keys[1:] != keys[:-1]
    if BLOCK_KEY2_COL in tbl.schema.names:
        k2 = tbl.column(BLOCK_KEY2_COL).to_numpy(zero_copy_only=False)
        change = change | (k2[1:] != k2[:-1])
    starts = np.concatenate(([0], np.nonzero(change)[0] + 1, [n]))

    # closed-form cross-product indices for ALL groups at once (the
    # per-group repeat/tile loop was ~30% of the scorer): stable-sort rows
    # by (group, side) — groups stay contiguous with unchanged sizes, l
    # rows precede r rows, original index order preserved within each side
    # — then pair t of a group maps to (t // nr, t % nr), reproducing the
    # legacy repeat/tile pair order exactly (bit-identical output order).
    G = len(starts) - 1
    sizes = np.diff(starts)
    g_of = np.repeat(np.arange(G), sizes)
    order = np.lexsort((side, g_of))
    is_l = (side[order] == 0).astype(np.int64)
    nl = np.add.reduceat(is_l, starts[:-1])
    nr = sizes - nl
    npair = nl * nr
    keep = np.nonzero(npair > 0)[0]
    if len(keep) == 0:
        return out_schema.empty_table()
    kp = npair[keep]
    total = int(kp.sum())
    pair_off = np.concatenate(([0], np.cumsum(kp)[:-1]))
    t = np.arange(total, dtype=np.int64) - np.repeat(pair_off, kp)
    nr_rep = np.repeat(nr[keep], kp)
    lpos = np.repeat(starts[:-1][keep], kp) + t // nr_rep
    rpos = np.repeat((starts[:-1] + nl)[keep], kp) + t % nr_rep
    LI_all = order[lpos]
    RI_all = order[rpos]

    from uk_address_matcher_ray.util import timed
    with timed("sv.row_features"):
        feats = _RowFeatures(tbl, numeric_tf or {})
    # degrade gracefully on oversized blocks: score in bounded tiles instead
    # of erroring (salting keeps blocks small; this is the memory backstop)
    if len(LI_all) > max_pairs_per_block:
        parts = [
            _score_pair_slice(
                tbl, feats, LI_all[o : o + max_pairs_per_block],
                RI_all[o : o + max_pairs_per_block], model, numeric_tf,
                threshold, out_schema,
            )
            for o in range(0, len(LI_all), max_pairs_per_block)
        ]
        return pa.concat_tables(parts)
    return _score_pair_slice(
        tbl, feats, LI_all, RI_all, model, numeric_tf, threshold, out_schema
    )


def _score_pair_slice(
    tbl: pa.Table,
    feats: "_RowFeatures",
    LI: np.ndarray,
    RI: np.ndarray,
    model: MatchModel,
    numeric_tf,
    threshold: float,
    out_schema: pa.Schema,
) -> pa.Table:
    ctx = _PairContext(feats, LI, RI)
    npairs = ctx.n

    from uk_address_matcher_ray.util import timed
    mw = np.full(npairs, model.prior_weight)
    gamma_cols: List[np.ndarray] = []
    _tmc = timed("sv.comparisons"); _tmc.__enter__()
    for comp in model.comparisons:
        nn_count = sum(1 for lv in comp.levels if not lv.is_null)
        gamma = np.full(npairs, -1, dtype=np.int32)
        logbf = np.zeros(npairs)
        undecided = np.ones(npairs, dtype=bool)
        pos = 0
        for lv in comp.levels:
            if not undecided.any():
                break
            hit = undecided & _cond_vector(lv.condition, lv.threshold, comp.name, ctx)
            if not lv.is_null:
                g = nn_count - 1 - pos
                pos += 1
                if hit.any():
                    gamma[hit] = g
                    base = math.log2(lv.bayes_factor)
                    if lv.tf_column and (numeric_tf or {}).get(lv.tf_column):
                        tf_arr = feats.tf.get(lv.tf_column)
                        if tf_arr is None:
                            logbf[hit] = base
                        else:
                            tf_pair = np.fmax(tf_arr[LI[hit]], tf_arr[RI[hit]])
                            logbf[hit] = _tf_log2_lut(lv, tf_pair, base)
                    else:
                        logbf[hit] = base
            else:
                pos += 0
            undecided &= ~hit
        mw += logbf
        gamma_cols.append(gamma)
    _tmc.__exit__()

    keep = np.nonzero(mw >= threshold)[0]
    if len(keep) == 0:
        return out_schema.empty_table()
    li = pa.array(LI[keep])
    ri = pa.array(RI[keep])
    mw_k = mw[keep]
    # bit-exact probability: Python-float pow (numpy's differs in last ulp)
    with timed("sv.prob"):
        prob = np.fromiter(
            (1.0 / (1.0 + 2.0 ** (-v)) for v in mw_k.tolist()), dtype=np.float64,
            count=len(keep),
        )

    def take_l(name):
        return tbl.column(name).take(li)

    def take_r(name):
        return tbl.column(name).take(ri)

    names = set(tbl.column_names)
    arrays: List = []
    for fld in out_schema:
        nm = fld.name
        if nm == "match_weight":
            arrays.append(pa.array(mw_k, pa.float64()))
        elif nm == "match_probability":
            arrays.append(pa.array(prob, pa.float64()))
        elif nm == "match_key":
            arrays.append(tbl.column(RULE_COL).take(li).cast(pa.int32()))
        elif nm == "unique_id_l":
            arrays.append(take_l("unique_id"))
        elif nm == "unique_id_r":
            arrays.append(take_r("unique_id"))
        elif nm == "common_end_tokens_hist_r":
            arrays.append(take_r("common_end_tokens_hist"))
        elif nm.startswith("gamma_"):
            cname = nm[len("gamma_"):]
            idx = [c.name for c in model.comparisons].index(cname)
            arrays.append(pa.array(gamma_cols[idx][keep], pa.int32()))
        elif nm.endswith("_l"):
            base = nm[:-2]
            if base in names:
                arrays.append(take_l(base))
            else:
                arrays.append(pa.nulls(len(keep), fld.type))
        elif nm.endswith("_r"):
            base = nm[:-2]
            if base in names:
                arrays.append(take_r(base))
            else:
                arrays.append(pa.nulls(len(keep), fld.type))
        else:
            raise ValueError(f"unmapped output field {nm}")
    cols = []
    for fld, arr in zip(out_schema, arrays):
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if arr.type != fld.type:
            arr = arr.cast(fld.type)
        cols.append(arr)
    return pa.Table.from_arrays(cols, schema=out_schema)
