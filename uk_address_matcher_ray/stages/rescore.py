"""Second pass: candidate-group rescoring by distinguishing tokens/bigrams.

Re-expresses the reference's
``improve_predictions_using_distinguishing_tokens``
(post_linkage/identify_distinguishing_tokens.py:4-443) as a pure-Python group
kernel applied inside ``groupby("unique_id_r").map_groups`` — the canonical
group+reduce of SURVEY.md §2.7 (groups are ≤ top_n rows).

Semantics notes (all verified against the reference SQL):
* top-n filter orders by (match_weight DESC, unique_id_l DESC) (lines 48-56);
* up to TWO trailing tokens in the messy record's common-end-token list are
  stripped from both addresses (two chained list_filters on the reversed
  token list, lines 59-88);
* block token/bigram histograms flatten ALL top-n candidates' token lists in
  top-n order; bigrams are zipped over the *flattened* list, so they span
  candidate boundaries exactly as the reference's list_zip does (lines 105-175);
* maps keyed by token/bigram; bigram maps are filtered to drop bigrams fully
  explained by their unigrams (lines 328-361);
* mw_adjustment = REWARD·Σ 1/cnt² − PUNISH·|elsewhere| − 0.1·|missing|
  + BIGRAM_REWARD·Σ 1/cnt² − BIGRAM_PUNISH·|bigrams elsewhere| (lines 376-441).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import pyarrow as pa

from uk_address_matcher_ray.stages.score import dedup_pairs_in_group

_WS = re.compile(r"\s+", re.ASCII)

DEFAULTS = dict(
    match_weight_threshold=-20.0,
    top_n_matches=5,
    use_bigrams=True,
    REWARD_MULTIPLIER=3.0,
    PUNISHMENT_MULTIPLIER=1.5,
    BIGRAM_REWARD_MULTIPLIER=3.0,
    BIGRAM_PUNISHMENT_MULTIPLIER=1.5,
    MISSING_TOKEN_PENALTY=0.1,
)


def _tokens(s: Optional[str]) -> List[str]:
    if s is None:
        return []
    return _WS.split(s.strip(" ").upper())


def _strip_common_end(s: Optional[str], cet: set) -> Optional[str]:
    """Lines 59-88: remove up to two trailing tokens that are in cet."""
    if s is None:
        return None
    toks = _WS.split(s.strip(" ").upper())
    rev = toks[::-1]
    for _ in range(2):
        if rev and rev[0] in cet:
            rev = rev[1:]
    return " ".join(rev[::-1])


def _concat_tokens(addr: Optional[str], pc: Optional[str]) -> List[str]:
    """concat_ws(' ', addr, pc).trim().upper().regexp_split('\\s+')."""
    parts = [p for p in (addr, pc) if p is not None]
    return _tokens(" ".join(parts))


def _bigrams(tokens: List[str]) -> List[Tuple[str, str]]:
    return list(zip(tokens[:-1], tokens[1:]))


def _map_cols(d: dict, key_is_bigram: bool) -> list:
    """Map -> list<struct<key,value>> for Arrow output (keys sorted)."""
    items = sorted(d.items())
    if key_is_bigram:
        return [{"key": list(k), "value": v} for k, v in items]
    return [{"key": k, "value": v} for k, v in items]


def rescore_group(
    rows: List[dict],
    *,
    match_weight_threshold: float = -20.0,
    top_n_matches: int = 5,
    use_bigrams: bool = True,
    REWARD_MULTIPLIER: float = 3.0,
    PUNISHMENT_MULTIPLIER: float = 1.5,
    BIGRAM_REWARD_MULTIPLIER: float = 3.0,
    BIGRAM_PUNISHMENT_MULTIPLIER: float = 1.5,
    MISSING_TOKEN_PENALTY: float = 0.1,
    cet_hist_fn=None,
    raw_maps: bool = False,
    l_memo: Optional[dict] = None,
) -> List[dict]:
    """Rescore the (already match_key-deduped) pairs of ONE messy record.

    ``cet_hist_fn``: optional accessor for the messy record's common-end-token
    histogram (lets the vectorized table path convert ONE histogram per group
    instead of every row's)."""
    good = [r for r in rows if r["match_weight"] > match_weight_threshold]
    # ORDER BY match_weight DESC, unique_id_l DESC -> stable sorts in reverse
    good.sort(key=lambda r: r["unique_id_l"], reverse=True)
    good.sort(key=lambda r: r["match_weight"], reverse=True)
    top = good[:top_n_matches]
    if not top:
        return []

    if cet_hist_fn is not None:
        cet = cet_hist_fn(top[0]) or set()
    else:
        cet_hist = top[0].get("common_end_tokens_hist_r") or []
        cet = {e["tok"] for e in cet_hist}

    # The reference strips trailing common-end tokens ONLY from the messy (r)
    # side actually consumed downstream: its step-3 CTE also strips _l, but
    # only tokenise_r reads the stripped columns — steps 5/6 re-read the
    # UNSTRIPPED originals from top_n_matches (identify_distinguishing_tokens.py
    # 86-120, 172-196, 269). Reproduced: tokens_l and output columns unstripped.
    stripped_r = _strip_common_end(top[0]["original_address_concat_r"], cet)

    tokens_r = _concat_tokens(stripped_r, top[0].get("postcode_r"))
    tokens_r_set = set(tokens_r)
    if l_memo is None:
        tokens_l_list = [
            _concat_tokens(r["original_address_concat_l"], r.get("postcode_l"))
            for r in top
        ]
        l_sets = [set(tl) for tl in tokens_l_list]
        if use_bigrams:
            l_bigrams = []
            for tl in tokens_l_list:
                bg = _bigrams(tl)
                l_bigrams.append((bg, set(bg)))
        else:
            l_bigrams = None
    else:
        # canonical rows recur across many messy groups in one task — memoize
        # their derived tokens/bigrams by (address, postcode)
        tokens_l_list = []
        l_sets = []
        l_bigrams = [] if use_bigrams else None
        for r in top:
            mk = (r["original_address_concat_l"], r.get("postcode_l"))
            ent = l_memo.get(mk)
            if ent is None:
                tl = _concat_tokens(mk[0], mk[1])
                if use_bigrams:
                    bg = _bigrams(tl)
                    ent = (tl, set(tl), bg, set(bg))
                else:
                    ent = (tl, set(tl), None, None)
                l_memo[mk] = ent
            tokens_l_list.append(ent[0])
            l_sets.append(ent[1])
            if use_bigrams:
                l_bigrams.append((ent[2], ent[3]))

    flat: List[str] = [t for tl in tokens_l_list for t in tl]
    hist_all_tokens: Dict[str, int] = {}
    for t in flat:
        hist_all_tokens[t] = hist_all_tokens.get(t, 0) + 1
    # sort ONCE per group: every dict derived below preserves this insertion
    # order, so the per-candidate sorted() calls collapse to .items()
    hist_all_tokens = dict(sorted(hist_all_tokens.items()))
    hist_overlap_r_block = {
        t: c for t, c in hist_all_tokens.items() if t in tokens_r_set
    }

    if use_bigrams:
        flat_bigrams = _bigrams(flat)  # spans candidate boundaries (reference)
        hist_all_bigrams: Dict[Tuple[str, str], int] = {}
        for bg in flat_bigrams:
            hist_all_bigrams[bg] = hist_all_bigrams.get(bg, 0) + 1
        # tuple sort == the oracle's '\x1f'-joined sort (separator sorts
        # below every token character)
        hist_all_bigrams = dict(sorted(hist_all_bigrams.items()))
        bigrams_r = _bigrams(tokens_r)
        bigrams_r_set = set(bigrams_r)
        hist_overlap_bigrams_r_block = {
            bg: c for bg, c in hist_all_bigrams.items() if bg in bigrams_r_set
        }

    out: List[dict] = []
    for idx_t, (r, tokens_l) in enumerate(zip(top, tokens_l_list)):
        tokens_l_set = l_sets[idx_t]
        overlapping = {
            t: c for t, c in hist_overlap_r_block.items() if t in tokens_l_set
        }
        tokens_r_not_in_l = {t for t in tokens_r if t not in tokens_l_set}
        missing_tokens = [t for t in tokens_l if t not in tokens_r_set]
        elsewhere = {
            t: c for t, c in hist_all_tokens.items() if t in tokens_r_not_in_l
        }

        # sums iterate keys in sorted order (inherited from the pre-sorted
        # group hist) so the DuckDB oracle (list_sort + list_aggregate
        # 'sum') reproduces identical doubles
        adj = REWARD_MULTIPLIER * sum(
            1.0 / (c * c) for _t, c in overlapping.items()
        )
        adj -= PUNISHMENT_MULTIPLIER * len(elsewhere)
        adj -= MISSING_TOKEN_PENALTY * len(missing_tokens)

        rec = {
            "unique_id_r": r["unique_id_r"],
            "unique_id_l": r["unique_id_l"],
            "mw_adjustment": None,  # filled below
            "match_weight_original": r["match_weight"],
            "match_weight": None,
            "overlapping_tokens_this_l_and_r": (
                list(overlapping.items())
                if raw_maps
                else _map_cols(overlapping, False)
            ),
            "tokens_elsewhere_in_block_but_not_this": (
                list(elsewhere.items())
                if raw_maps
                else _map_cols(elsewhere, False)
            ),
            "missing_tokens": missing_tokens,
            "original_address_concat_l": r["original_address_concat_l"],
            "postcode_l": r.get("postcode_l"),
            "original_address_concat_r": top[0]["original_address_concat_r"],
            "postcode_r": r.get("postcode_r"),
        }

        if use_bigrams:
            bigrams_l, bigrams_l_set = l_bigrams[idx_t]
            overlapping_bg = {
                bg: c
                for bg, c in hist_overlap_bigrams_r_block.items()
                if bg in bigrams_l_set
            }
            bigrams_r_not_in_l = {bg for bg in bigrams_r if bg not in bigrams_l_set}
            elsewhere_bg = {
                bg: c for bg, c in hist_all_bigrams.items() if bg in bigrams_r_not_in_l
            }

            def _covered(bg, v, unimap):
                return (
                    bg[0] in unimap
                    and unimap[bg[0]] <= v
                    and bg[1] in unimap
                    and unimap[bg[1]] <= v
                )

            overlapping_bg_f = {
                bg: v
                for bg, v in overlapping_bg.items()
                if not _covered(bg, v, overlapping)
            }
            elsewhere_bg_f = {
                bg: v
                for bg, v in elsewhere_bg.items()
                if not _covered(bg, v, elsewhere)
            }
            adj += BIGRAM_REWARD_MULTIPLIER * sum(
                1.0 / (c * c) for _bg, c in overlapping_bg_f.items()
            )
            adj -= BIGRAM_PUNISHMENT_MULTIPLIER * len(elsewhere_bg_f)
            if raw_maps:
                rec["overlapping_bigrams_this_l_and_r"] = list(
                    overlapping_bg.items()
                )
                rec["bigrams_elsewhere_in_block_but_not_this"] = list(
                    elsewhere_bg.items()
                )
                rec["overlapping_bigrams_this_l_and_r_filtered"] = list(
                    overlapping_bg_f.items()
                )
                rec["bigrams_elsewhere_in_block_but_not_this_filtered"] = list(
                    elsewhere_bg_f.items()
                )
            else:
                rec["overlapping_bigrams_this_l_and_r"] = _map_cols(
                    overlapping_bg, True
                )
                rec["bigrams_elsewhere_in_block_but_not_this"] = _map_cols(
                    elsewhere_bg, True
                )
                rec["overlapping_bigrams_this_l_and_r_filtered"] = _map_cols(
                    overlapping_bg_f, True
                )
                rec["bigrams_elsewhere_in_block_but_not_this_filtered"] = _map_cols(
                    elsewhere_bg_f, True
                )

        rec["mw_adjustment"] = adj
        rec["match_weight"] = r["match_weight"] + adj
        out.append(rec)
    return out


_STR_MAP_COLS = frozenset(
    {"overlapping_tokens_this_l_and_r", "tokens_elsewhere_in_block_but_not_this"}
)
_BG_MAP_COLS = frozenset(
    {
        "overlapping_bigrams_this_l_and_r",
        "bigrams_elsewhere_in_block_but_not_this",
        "overlapping_bigrams_this_l_and_r_filtered",
        "bigrams_elsewhere_in_block_but_not_this_filtered",
    }
)


def _build_str_map_col(col_items: List[list]) -> pa.Array:
    """Per-row sorted (key, value) item lists -> list<struct<key,value>>."""
    offs = [0]
    ks: List[str] = []
    vs: List[int] = []
    for items in col_items:
        for k, v in items:
            ks.append(k)
            vs.append(v)
        offs.append(len(ks))
    struct = pa.StructArray.from_arrays(
        [pa.array(ks, pa.string()), pa.array(vs, pa.int64())], ["key", "value"]
    )
    return pa.ListArray.from_arrays(pa.array(offs, pa.int32()), struct)


def _build_bg_map_col(col_items: List[list]) -> pa.Array:
    """Per-row sorted ((a, b), value) item lists ->
    list<struct<key: list<string>, value>>."""
    offs = [0]
    koffs = [0]
    ktoks: List[str] = []
    vs: List[int] = []
    for items in col_items:
        for (a, b), v in items:
            ktoks.append(a)
            ktoks.append(b)
            koffs.append(len(ktoks))
            vs.append(v)
        offs.append(len(vs))
    keys_list = pa.ListArray.from_arrays(
        pa.array(koffs, pa.int32()), pa.array(ktoks, pa.string())
    )
    struct = pa.StructArray.from_arrays(
        [keys_list, pa.array(vs, pa.int64())], ["key", "value"]
    )
    return pa.ListArray.from_arrays(pa.array(offs, pa.int32()), struct)


def _build_str_list_col(col_items: List[list]) -> pa.Array:
    offs = [0]
    toks: List[str] = []
    for items in col_items:
        toks.extend(items)
        offs.append(len(toks))
    return pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()), pa.array(toks, pa.string())
    )


def _assemble_improved(out: List[dict], schema: pa.Schema) -> pa.Table:
    """Flat-builder Arrow assembly of raw_maps rescore rows (measured ~26%
    of the rescore kernel when done per-entry via dicts + from_pylist)."""
    if not out:
        return schema.empty_table()
    arrays: List[pa.Array] = []
    for fld in schema:
        nm = fld.name
        col = [r[nm] for r in out]
        if nm in _STR_MAP_COLS:
            arrays.append(_build_str_map_col(col))
        elif nm in _BG_MAP_COLS:
            arrays.append(_build_bg_map_col(col))
        elif nm == "missing_tokens":
            arrays.append(_build_str_list_col(col))
        else:
            arrays.append(pa.array(col, fld.type))
    return pa.Table.from_arrays(arrays, schema=schema)


_STR_MAP = pa.list_(
    pa.struct([pa.field("key", pa.string()), pa.field("value", pa.int64())])
)
_BG_MAP = pa.list_(
    pa.struct(
        [pa.field("key", pa.list_(pa.string())), pa.field("value", pa.int64())]
    )
)


def improved_schema(
    use_bigrams: bool = True,
    retain_columns: Sequence[str] = (),
    passthrough: Sequence[tuple] = (),
) -> pa.Schema:
    fields = [
        pa.field("unique_id_r", pa.string()),
        pa.field("unique_id_l", pa.string()),
        pa.field("mw_adjustment", pa.float64()),
        pa.field("match_weight_original", pa.float64()),
        pa.field("match_weight", pa.float64()),
        pa.field("overlapping_tokens_this_l_and_r", _STR_MAP),
        pa.field("tokens_elsewhere_in_block_but_not_this", _STR_MAP),
        pa.field("missing_tokens", pa.list_(pa.string())),
        pa.field("original_address_concat_l", pa.string()),
        pa.field("postcode_l", pa.string()),
        pa.field("original_address_concat_r", pa.string()),
        pa.field("postcode_r", pa.string()),
    ]
    if use_bigrams:
        fields += [
            pa.field("overlapping_bigrams_this_l_and_r", _BG_MAP),
            pa.field("bigrams_elsewhere_in_block_but_not_this", _BG_MAP),
            pa.field("overlapping_bigrams_this_l_and_r_filtered", _BG_MAP),
            pa.field("bigrams_elsewhere_in_block_but_not_this_filtered", _BG_MAP),
        ]
    for col in retain_columns:
        fields.append(pa.field(f"{col}_l", pa.string()))
        fields.append(pa.field(f"{col}_r", pa.string()))
    for nm, typ in passthrough:
        fields.append(pa.field(nm, typ))
    return pa.schema(fields)


class ImproveStage:
    """map_groups callable: one messy record's pairs -> rescored pairs.

    ``dedup_first=True`` additionally applies match_key dedup so the fused
    pipeline needs only this single unique_id_r shuffle after blocking.
    """

    def __init__(
        self,
        dedup_first: bool = False,
        retain_columns: Sequence[str] = (),
        passthrough: Sequence[tuple] = (),
        **params,
    ):
        """``passthrough``: (name, pa type) pairs copied verbatim from the
        selected input row to the output (e.g. the gather path's payload row
        indices, so cluster edge extraction can stay integer-typed)."""
        self.params = {**DEFAULTS, **params}
        self.dedup_first = dedup_first
        self.retain_columns = list(retain_columns)
        self.passthrough = [tuple(p) for p in passthrough]
        # with duplicate unique_id_l (no dedup) the source row for a
        # passthrough value would be ambiguous between the two paths
        assert not self.passthrough or dedup_first, (
            "passthrough columns require dedup_first=True"
        )
        self.schema = improved_schema(
            self.params["use_bigrams"], self.retain_columns, self.passthrough
        )

    def process_rows(self, rows: List[dict]) -> List[dict]:
        """Rows of ONE messy record's pairs -> rescored pair row-dicts."""
        if self.dedup_first:
            rows = dedup_pairs_in_group(rows)
        out = rescore_group(rows, **self.params)
        if out and (self.retain_columns or self.passthrough):
            by_l = {r["unique_id_l"]: r for r in rows}
            for rec in out:
                src = by_l.get(rec["unique_id_l"], {})
                for col in self.retain_columns:
                    for suffix in ("_l", "_r"):
                        v = src.get(f"{col}{suffix}")
                        rec[f"{col}{suffix}"] = None if v is None else str(v)
                # mirror process_table_pydict: passthrough values come from
                # the selected source row (unambiguous under dedup_first)
                for nm, _typ in self.passthrough:
                    rec[nm] = src.get(nm)
        return out

    # columns the rescore kernel actually reads; everything else can be
    # projected out before the unique_id_r shuffle (see match_pipeline)
    INPUT_COLUMNS = (
        "unique_id_l",
        "unique_id_r",
        "match_weight",
        "match_key",
        "original_address_concat_l",
        "original_address_concat_r",
        "postcode_l",
        "postcode_r",
        "common_end_tokens_hist_r",
    )

    # light substitute for the histogram column: the kernel only reads the
    # token SET, so upstream may ship list<string> instead of list<struct>
    CET_TOKS_COL = "cet_toks_r"

    def input_columns(self) -> List[str]:
        cols = list(self.INPUT_COLUMNS)
        for col in self.retain_columns:
            for suffix in ("_l", "_r"):
                c = f"{col}{suffix}"
                if c not in cols:
                    cols.append(c)
        for nm, _typ in self.passthrough:
            if nm not in cols:
                cols.append(nm)
        return cols

    def process_table_pydict(self, tbl: pa.Table) -> pa.Table:
        """Legacy per-row-dict path over a table of COMPLETE unique_id_r
        groups — kept as the differential reference for ``process_table``
        (test_rescore_property.py compares all three paths)."""
        if tbl.num_rows == 0:
            return self.schema.empty_table()
        if self.CET_TOKS_COL in tbl.column_names:
            toks_col = tbl.column(self.CET_TOKS_COL).combine_chunks()

            def cet_of(row):
                v = toks_col[row["_idx"]].as_py()
                return set(v) if v else set()

        else:
            hist_col = tbl.column("common_end_tokens_hist_r").combine_chunks()

            def cet_of(row):
                v = hist_col[row["_idx"]].as_py()
                return {e["tok"] for e in v} if v else set()

        light_names = [
            n
            for n in self.input_columns()
            if n not in ("common_end_tokens_hist_r", self.CET_TOKS_COL)
            and n in tbl.column_names
        ]
        from uk_address_matcher_ray.util import timed

        with timed("rescore.to_pylist"):
            light = {n: tbl.column(n).to_pylist() for n in light_names}
        uid_r = light["unique_id_r"]
        n = tbl.num_rows
        params = dict(self.params)
        params["cet_hist_fn"] = cet_of
        params["raw_maps"] = True
        params["l_memo"] = {}
        out: List[dict] = []
        gs = 0
        for i in range(1, n + 1):
            if i < n and uid_r[i] == uid_r[gs]:
                continue
            rows = [
                {**{k: v[j] for k, v in light.items()}, "_idx": j}
                for j in range(gs, i)
            ]
            if self.dedup_first:
                rows = dedup_pairs_in_group(rows)
            recs = rescore_group(rows, **params)
            if recs and (self.retain_columns or self.passthrough):
                by_l = {r["unique_id_l"]: r for r in rows}
                for rec in recs:
                    src = by_l.get(rec["unique_id_l"], {})
                    for col in self.retain_columns:
                        for suffix in ("_l", "_r"):
                            v = src.get(f"{col}{suffix}")
                            rec[f"{col}{suffix}"] = None if v is None else str(v)
                    for nm, _typ in self.passthrough:
                        rec[nm] = src.get(nm)
            out.extend(recs)
            gs = i
        with timed("rescore.assemble"):
            return _assemble_improved(out, self.schema)

    def process_table(self, tbl: pa.Table) -> pa.Table:
        """Columnar int-code path over a table of COMPLETE unique_id_r groups.

        Selection (match_key dedup, threshold, (mw DESC, uid_l DESC) sort,
        top-n) runs as ONE numpy lexsort pass over the whole task table.
        Tokens intern to per-call int codes (tokenization memoized per
        DISTINCT (address, postcode) dictionary-code pair; the messy side per
        (address, postcode, tokens-stripped) triple), so every histogram /
        set operation in the group kernel hashes small ints instead of
        strings, and the output maps accumulate into flat code arrays decoded
        once per task via a vectorized ``take`` against the vocab.

        Bit-exactness: float sums must iterate entries in token-STRING order
        (the DuckDB oracle list_sorts). Per group the ~40 distinct token
        codes are ranked by ONE small string sort; every dict below inserts
        in rank order, and bigram (a, b) tuple order equals (rank_a, rank_b)
        because both tokens come from the ranked set."""
        import numpy as np
        import pyarrow.compute as pcmp

        from uk_address_matcher_ray.util import timed

        if tbl.num_rows == 0:
            return self.schema.empty_table()
        n = tbl.num_rows
        p = self.params
        thr = p["match_weight_threshold"]
        top_n = p["top_n_matches"]
        use_bigrams = p["use_bigrams"]
        RM = p["REWARD_MULTIPLIER"]
        PM = p["PUNISHMENT_MULTIPLIER"]
        BRM = p["BIGRAM_REWARD_MULTIPLIER"]
        BPM = p["BIGRAM_PUNISHMENT_MULTIPLIER"]
        MTP = p["MISSING_TOKEN_PENALTY"]
        names = tbl.column_names

        # ---- selection: dedup / threshold / per-group sort / top-n ------
        with timed("rescore.select"):
            uid_r_np = tbl.column("unique_id_r").to_numpy(zero_copy_only=False)
            newg = np.ones(n, dtype=bool)
            newg[1:] = uid_r_np[1:] != uid_r_np[:-1]
            gid = np.cumsum(newg) - 1
            mw = tbl.column("match_weight").to_numpy(zero_copy_only=False)
            uid_l_np = tbl.column("unique_id_l").to_numpy(zero_copy_only=False)
            _, l_rank = np.unique(uid_l_np, return_inverse=True)
            if self.dedup_first:
                mk = (
                    tbl.column("match_key")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                order = np.lexsort((mk, l_rank, gid))
                gg, ll = gid[order], l_rank[order]
                first = np.ones(n, dtype=bool)
                first[1:] = (gg[1:] != gg[:-1]) | (ll[1:] != ll[:-1])
                # back to original order: keeps later tie-breaks stable
                keep = np.sort(order[first])
            else:
                keep = np.arange(n)
            keep = keep[mw[keep] > thr]
            if len(keep) == 0:
                return self.schema.empty_table()
            # (gid ASC, mw DESC, uid_l DESC); lexsort = stable, primary LAST
            order2 = np.lexsort((-l_rank[keep], -mw[keep], gid[keep]))
            sel = keep[order2]
            sel_g = gid[sel]
            gstart = np.flatnonzero(
                np.concatenate(([True], sel_g[1:] != sel_g[:-1]))
            )
            glen = np.diff(np.append(gstart, len(sel)))
            rank_in_g = np.arange(len(sel)) - np.repeat(gstart, glen)
            topmask = rank_in_g < top_n
            sel = sel[topmask]
            sel_g = sel_g[topmask]
            gstart = np.flatnonzero(
                np.concatenate(([True], sel_g[1:] != sel_g[:-1]))
            )
            glen = np.diff(np.append(gstart, len(sel)))
            n_out = len(sel)

        # ---- dictionary codes + token interning -------------------------
        with timed("rescore.encode"):
            def _dict_col(name):
                if name not in names:
                    return np.full(n, -1, dtype=np.int64), []
                arr = tbl.column(name)
                if isinstance(arr, pa.ChunkedArray):
                    arr = (
                        arr.combine_chunks()
                        if arr.num_chunks
                        else pa.array([], type=pa.string())
                    )
                enc = arr.dictionary_encode()
                idx = (
                    pcmp.fill_null(enc.indices, -1)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                return idx, enc.dictionary.to_pylist()

            ar_idx, ar_vals = _dict_col("original_address_concat_r")
            pr_idx, pr_vals = _dict_col("postcode_r")

            # flatten the cet token column ONCE per task (per-row as_py was
            # ~3% of the kernel): python token list + offsets, slice per group
            if self.CET_TOKS_COL in names:
                cet_col = tbl.column(self.CET_TOKS_COL).combine_chunks()
                tok_of = lambda a: a.values  # noqa: E731
            else:
                cet_col = tbl.column("common_end_tokens_hist_r").combine_chunks()
                tok_of = lambda a: a.values.field("tok")  # noqa: E731
            if not pa.types.is_list(cet_col.type) and not pa.types.is_large_list(
                cet_col.type
            ):
                # all-null column inferred as NullArray (e.g. from_pylist)
                def cet_of(row_idx: int) -> set:
                    return set()

            else:
                if cet_col.offset != 0:
                    cet_col = pa.concat_arrays([cet_col])
                cet_offs = cet_col.offsets.to_numpy(zero_copy_only=False)
                cet_toks_py = tok_of(cet_col).to_pylist()
                cet_valid = cet_col.is_valid().to_numpy(zero_copy_only=False)

                def cet_of(row_idx: int) -> set:
                    if not cet_valid[row_idx]:
                        return set()
                    return set(
                        cet_toks_py[cet_offs[row_idx] : cet_offs[row_idx + 1]]
                    )

        intern: Dict[str, int] = {}
        code2str: List[str] = []

        def _codes_of(toks: List[str]) -> List[int]:
            out = []
            ap = out.append
            get = intern.get
            for t in toks:
                c = get(t)
                if c is None:
                    c = len(code2str)
                    intern[t] = c
                    code2str.append(t)
                ap(c)
            return out

        # l-side tokens: ONE Arrow pass — join addr+pc (null -> "", which is
        # _tokens-equivalent to the reference's skip-None join because the
        # extra edge separator space is stripped), dictionary-encode the
        # joined strings, trim/upper/regex-split the DISTINCT values and
        # intern the flattened token dictionary once. Per-row tokenization
        # becomes a numpy slice + take against the global code map. The
        # regex "[ \t\n\r\x0b\f]+" is exactly Python's ASCII \s; non-ASCII
        # dictionaries fall back to the Python tokenizer (upper() can
        # differ between utf8proc and CPython off-ASCII).
        with timed("rescore.l_tokens"):
            def _str_col(name):
                if name not in names:
                    return pa.nulls(n, pa.string())
                arr = tbl.column(name).combine_chunks()
                if not pa.types.is_string(arr.type):
                    arr = arr.cast(pa.string())  # all-null NullArray columns
                return arr

            joined_l = pcmp.binary_join_element_wise(
                _str_col("original_address_concat_l"),
                _str_col("postcode_l"),
                " ",
                null_handling="replace",
                null_replacement="",
            )
            enc_l = joined_l.dictionary_encode()
            jl_idx = (
                pcmp.fill_null(enc_l.indices, 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            dvals = enc_l.dictionary
            l_tok_slices = None
            if len(dvals) and pcmp.all(
                pcmp.string_is_ascii(dvals)
            ).as_py():
                sp_l = pcmp.split_pattern_regex(
                    pcmp.utf8_upper(pcmp.utf8_trim(dvals, " ")),
                    pattern="[ \t\n\r\x0b\f]+",
                )
                if sp_l.offset != 0:
                    sp_l = pa.concat_arrays([sp_l])
                l_toffs = sp_l.offsets.to_numpy(zero_copy_only=False)
                tok_enc = sp_l.values.dictionary_encode()
                local_codes = (
                    tok_enc.indices.to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                gmap = np.empty(len(tok_enc.dictionary), dtype=np.int64)
                for li, t in enumerate(tok_enc.dictionary.to_pylist()):
                    c = intern.get(t)
                    if c is None:
                        c = len(code2str)
                        intern[t] = c
                        code2str.append(t)
                    gmap[li] = c
                l_flat_codes = gmap[local_codes]
                l_tok_slices = (l_toffs, l_flat_codes)
            dvals_py = None  # lazy fallback materialization

        l_memo: Dict[int, tuple] = {}

        def l_entry(j: int) -> tuple:
            ent = l_memo.get(j)
            if ent is None:
                if l_tok_slices is not None:
                    toffs, fcodes = l_tok_slices
                    codes = fcodes[toffs[j] : toffs[j + 1]].tolist()
                else:
                    nonlocal dvals_py
                    if dvals_py is None:
                        dvals_py = dvals.to_pylist()
                    codes = _codes_of(_tokens(dvals_py[j]))
                if use_bigrams:
                    bg = list(zip(codes[:-1], codes[1:]))
                    ent = (codes, set(codes), bg, set(bg))
                else:
                    ent = (codes, set(codes), None, None)
                l_memo[j] = ent
            return ent

        # messy-side raw token strings per distinct address (pre-strip):
        # same Arrow trim/upper/split pass as the l-side when the
        # dictionary is ASCII, Python _tokens otherwise
        r_toks_cache: Dict[int, List[str]] = {}
        r_tok_slices = None
        if ar_vals:
            ar_arr = pa.array(ar_vals, pa.string())
            if pcmp.all(pcmp.string_is_ascii(ar_arr)).as_py():
                sp_r = pcmp.split_pattern_regex(
                    pcmp.utf8_upper(pcmp.utf8_trim(ar_arr, " ")),
                    pattern="[ \t\n\r\x0b\f]+",
                )
                if sp_r.offset != 0:
                    sp_r = pa.concat_arrays([sp_r])
                r_tok_slices = (
                    sp_r.offsets.to_numpy(zero_copy_only=False),
                    sp_r.values.to_pylist(),
                )
        # final messy tokens per (addr, pc, tokens_stripped) — the strip
        # count fully determines the stripped prefix, so cet only enters
        # through it
        r_memo: Dict[tuple, tuple] = {}

        def r_entry(ai: int, pi: int, cet: set) -> tuple:
            if ai >= 0:
                rtoks = r_toks_cache.get(ai)
                if rtoks is None:
                    if r_tok_slices is not None:
                        roffs, rvals = r_tok_slices
                        rtoks = rvals[roffs[ai] : roffs[ai + 1]]
                    else:
                        rtoks = _tokens(ar_vals[ai])
                    r_toks_cache[ai] = rtoks
                m = len(rtoks)
                k = 0
                for _ in range(2):
                    if m > 0 and rtoks[m - 1] in cet:
                        m -= 1
                        k += 1
            else:
                k = 0
            key = (ai, pi, k)
            ent = r_memo.get(key)
            if ent is None:
                stripped = " ".join(rtoks[: len(rtoks) - k]) if ai >= 0 else None
                parts = [
                    s
                    for s in (stripped, pr_vals[pi] if pi >= 0 else None)
                    if s is not None
                ]
                codes = _codes_of(_tokens(" ".join(parts)))
                if use_bigrams:
                    bg = list(zip(codes[:-1], codes[1:]))
                    ent = (codes, set(codes), bg, set(bg))
                else:
                    ent = (codes, set(codes), None, None)
                r_memo[key] = ent
            return ent

        # ---- flat output builders ---------------------------------------
        adj_out = np.empty(n_out, dtype=np.float64)
        o_offs = np.zeros(n_out + 1, dtype=np.int64)  # overlapping tokens
        o_codes: List[int] = []
        o_vals: List[int] = []
        e_offs = np.zeros(n_out + 1, dtype=np.int64)  # elsewhere tokens
        e_codes: List[int] = []
        e_vals: List[int] = []
        m_offs = np.zeros(n_out + 1, dtype=np.int64)  # missing tokens
        m_codes: List[int] = []
        if use_bigrams:
            # (offsets, flat interleaved key codes, values) for ob/eb/obf/ebf
            bg_builders = [
                (np.zeros(n_out + 1, dtype=np.int64), [], []) for _ in range(4)
            ]

        def _covered(bg, v, unimap):
            va = unimap.get(bg[0])
            if va is None or va > v:
                return False
            vb = unimap.get(bg[1])
            return vb is not None and vb <= v

        with timed("rescore.groups"):
            g_count = len(gstart)
            for g in range(g_count):
                s = gstart[g]
                cnt = glen[g]
                top0 = sel[s]
                cet = cet_of(int(top0))
                r_codes, r_set, r_bgs, r_bg_set = r_entry(
                    ar_idx[top0], pr_idx[top0], cet
                )

                l_entries = [
                    l_entry(jl_idx[sel[s + j]]) for j in range(cnt)
                ]
                # Only block tokens/bigrams ALSO on the messy side are ever
                # read downstream (overlapping/elsewhere keys are subsets of
                # the r token/bigram sets), so count and sort just the
                # intersection — per-group work scales with |block ∩ r|,
                # not |block|. Subset sort order == the legacy full-sort
                # order restricted to the subset (bit-exact sums).
                hist: Dict[int, int] = {}
                for ent in l_entries:
                    for c in ent[0]:
                        if c in r_set:
                            hist[c] = hist.get(c, 0) + 1
                overlap_r_block = {
                    c: hist[c]
                    for c in sorted(hist, key=code2str.__getitem__)
                }

                if use_bigrams:
                    flat: List[int] = []
                    for ent in l_entries:
                        flat.extend(ent[0])
                    bg_hist: Dict[tuple, int] = {}
                    for bg in zip(flat[:-1], flat[1:]):
                        if bg in r_bg_set:
                            bg_hist[bg] = bg_hist.get(bg, 0) + 1
                    overlap_bg_r_block = {
                        bg: bg_hist[bg]
                        for bg in sorted(
                            bg_hist,
                            key=lambda b: (code2str[b[0]], code2str[b[1]]),
                        )
                    }

                for j in range(cnt):
                    o = s + j
                    l_codes, l_set, l_bgs, l_bg_set = l_entries[j]
                    overlapping = {
                        c: v for c, v in overlap_r_block.items() if c in l_set
                    }
                    r_not_in_l = {c for c in r_codes if c not in l_set}
                    missing = [c for c in l_codes if c not in r_set]
                    elsewhere = {
                        c: v
                        for c, v in overlap_r_block.items()
                        if c in r_not_in_l
                    }
                    adj = RM * sum(
                        1.0 / (v * v) for _c, v in overlapping.items()
                    )
                    adj -= PM * len(elsewhere)
                    adj -= MTP * len(missing)

                    o_codes.extend(overlapping.keys())
                    o_vals.extend(overlapping.values())
                    o_offs[o + 1] = len(o_codes)
                    e_codes.extend(elsewhere.keys())
                    e_vals.extend(elsewhere.values())
                    e_offs[o + 1] = len(e_codes)
                    m_codes.extend(missing)
                    m_offs[o + 1] = len(m_codes)

                    if use_bigrams:
                        overlapping_bg = {
                            bg: v
                            for bg, v in overlap_bg_r_block.items()
                            if bg in l_bg_set
                        }
                        bg_r_not_in_l = {
                            bg for bg in r_bgs if bg not in l_bg_set
                        }
                        elsewhere_bg = {
                            bg: v
                            for bg, v in overlap_bg_r_block.items()
                            if bg in bg_r_not_in_l
                        }
                        overlapping_bg_f = {
                            bg: v
                            for bg, v in overlapping_bg.items()
                            if not _covered(bg, v, overlapping)
                        }
                        elsewhere_bg_f = {
                            bg: v
                            for bg, v in elsewhere_bg.items()
                            if not _covered(bg, v, elsewhere)
                        }
                        adj += BRM * sum(
                            1.0 / (v * v)
                            for _bg, v in overlapping_bg_f.items()
                        )
                        adj -= BPM * len(elsewhere_bg_f)
                        for bi, d in enumerate(
                            (
                                overlapping_bg,
                                elsewhere_bg,
                                overlapping_bg_f,
                                elsewhere_bg_f,
                            )
                        ):
                            offs, codes, vals = bg_builders[bi]
                            for (a, b), v in d.items():
                                codes.append(a)
                                codes.append(b)
                                vals.append(v)
                            offs[o + 1] = len(vals)

                    adj_out[o] = adj

        # ---- columnar assembly ------------------------------------------
        with timed("rescore.assemble"):
            vocab = pa.array(code2str, pa.string())

            def _decode(codes: List[int]) -> pa.Array:
                if not codes:
                    return pa.array([], pa.string())
                return vocab.take(pa.array(codes, pa.int64()))

            sel_arr = pa.array(sel, pa.int64())
            top0_per_out = pa.array(
                np.repeat(sel[gstart], glen), pa.int64()
            )

            def _take(name, idx):
                return tbl.column(name).take(idx)

            mw_orig = mw[sel]
            # IEEE double add is exact-rounded: numpy's elementwise add is
            # bitwise identical to the scalar engine's Python-float add
            mw_new = mw_orig + adj_out

            def _str_map(offs, codes, vals):
                struct = pa.StructArray.from_arrays(
                    [_decode(codes), pa.array(vals, pa.int64())],
                    ["key", "value"],
                )
                return pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()), struct
                )

            def _bg_map(offs, codes, vals):
                nkeys = len(vals)
                koffs = pa.array(
                    np.arange(0, 2 * nkeys + 1, 2, dtype=np.int32),
                    pa.int32(),
                )
                keys_list = pa.ListArray.from_arrays(koffs, _decode(codes))
                struct = pa.StructArray.from_arrays(
                    [keys_list, pa.array(vals, pa.int64())], ["key", "value"]
                )
                return pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()), struct
                )

            cols = {
                "unique_id_r": _take("unique_id_r", sel_arr),
                "unique_id_l": _take("unique_id_l", sel_arr),
                "mw_adjustment": pa.array(adj_out, pa.float64()),
                "match_weight_original": pa.array(mw_orig, pa.float64()),
                "match_weight": pa.array(mw_new, pa.float64()),
                "overlapping_tokens_this_l_and_r": _str_map(
                    o_offs, o_codes, o_vals
                ),
                "tokens_elsewhere_in_block_but_not_this": _str_map(
                    e_offs, e_codes, e_vals
                ),
                "missing_tokens": pa.ListArray.from_arrays(
                    pa.array(m_offs, pa.int32()), _decode(m_codes)
                ),
                "original_address_concat_l": _take(
                    "original_address_concat_l", sel_arr
                ),
                "postcode_l": _take("postcode_l", sel_arr),
                "original_address_concat_r": _take(
                    "original_address_concat_r", top0_per_out
                ),
                "postcode_r": _take("postcode_r", sel_arr),
            }
            if use_bigrams:
                for nm, (offs, codes, vals) in zip(
                    (
                        "overlapping_bigrams_this_l_and_r",
                        "bigrams_elsewhere_in_block_but_not_this",
                        "overlapping_bigrams_this_l_and_r_filtered",
                        "bigrams_elsewhere_in_block_but_not_this_filtered",
                    ),
                    bg_builders,
                ):
                    cols[nm] = _bg_map(offs, codes, vals)
            if self.retain_columns:
                # dedup path: the deduped row with rec's unique_id_l IS the
                # selected row. Non-dedup: by_l last-wins over the original
                # group rows (legacy dict-build order).
                retain_src = {}
                for col in self.retain_columns:
                    for suffix in ("_l", "_r"):
                        c = f"{col}{suffix}"
                        retain_src[c] = (
                            tbl.column(c).to_pylist() if c in names else None
                        )
                if self.dedup_first:
                    src_idx = sel
                else:
                    last_by_l: Dict[tuple, int] = {}
                    for i in range(n):
                        last_by_l[(gid[i], uid_l_np[i])] = i
                    src_idx = np.array(
                        [
                            last_by_l[(sel_g[o], uid_l_np[sel[o]])]
                            for o in range(n_out)
                        ],
                        dtype=np.int64,
                    )
                for c, vals_all in retain_src.items():
                    out_vals = [
                        None
                        if vals_all is None or vals_all[src_idx[o]] is None
                        else str(vals_all[src_idx[o]])
                        for o in range(n_out)
                    ]
                    cols[c] = pa.array(out_vals, pa.string())
            for nm, typ in self.passthrough:
                cols[nm] = (
                    _take(nm, sel_arr)
                    if nm in names
                    else pa.nulls(n_out, typ)
                )
            out_tbl = pa.table(cols)
            return out_tbl.select([f.name for f in self.schema]).cast(
                self.schema
            )

    def __call__(self, group: pa.Table) -> pa.Table:
        return pa.Table.from_pylist(
            self.process_rows(group.to_pylist()), schema=self.schema
        )


def improve_predictions(
    pairs_ds,
    *,
    retain_columns: Sequence[str] = (),
    **params,
):
    """Reference ``improve_predictions_using_distinguishing_tokens`` operator."""
    from uk_address_matcher_ray.stages.grouped import grouped_map

    stage = ImproveStage(dedup_first=False, retain_columns=retain_columns, **params)
    keep = [c for c in stage.input_columns() if c in pairs_ds.schema().names]
    return grouped_map(
        pairs_ds.select_columns(keep),
        "unique_id_r",
        None,
        stage.schema,
        fn_table=stage.process_table,
    )
