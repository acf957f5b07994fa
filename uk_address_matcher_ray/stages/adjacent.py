"""Optional cleaning-queue variant C12/C13 (SURVEY.md §2.2):
distinguishing-vs-adjacent-records start tokens + generalised token aliases
(cleaning_steps.py:585-721; enabled by
derive_distinguishing_wrt_adjacent_records in the reference).

The reference windows over the table globally sorted by
reverse(address_concat) with lag/lead neighbours. Distributed version:

1. global sort by the reverse key;
2. block row-counts -> driver computes tiny per-block offset table;
3. rows emit to window buckets (i // B) with edge rows replicated to the
   adjacent bucket, so every row sees its true neighbours — one groupby
   shuffle, exact lag/lead semantics at any scale.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

import pyarrow as pa

_WS = re.compile(r"\s+", re.ASCII)
_REMOVE = ("FLAT", "APARTMENT", "UNIT")

BUCKET = 1024  # rows per neighbour window


def _tokens(s: Optional[str]) -> List[str]:
    if s is None:
        return []
    return [t for t in _WS.split(s) if t not in _REMOVE]


def _common_suffix_len(a: List[str], b: Optional[List[str]]) -> Optional[int]:
    """max i in [0, min(len)) with last i+1 tokens equal; None when no i
    qualifies or b is absent (mirrors the reference's max-over-empty NULL)."""
    if b is None:
        return 0  # CASE WHEN prev IS NULL THEN 0 (cleaning_steps.py:624-636)
    best = None
    ra, rb = a[::-1], b[::-1]
    for i in range(min(len(a), len(b))):
        if ra[: i + 1] == rb[: i + 1]:
            best = i
    return best


def _greatest(a: Optional[int], b: Optional[int]) -> Optional[int]:
    """DuckDB greatest() ignores NULLs (returns the non-null max)."""
    vals = [v for v in (a, b) if v is not None]
    return max(vals) if vals else None


def split_adjacent_tokens(
    rows: List[dict],
) -> List[Tuple[List[str], List[str]]]:
    """For rows already in reverse-address order: per row ->
    (distinguishing_adj_start_tokens, common_adj_start_tokens)."""
    toks = [_tokens(r.get("address_concat")) for r in rows]
    out = []
    for i, t in enumerate(toks):
        prev_t = toks[i - 1] if i > 0 else None
        next_t = toks[i + 1] if i + 1 < len(toks) else None
        p = _common_suffix_len(t, prev_t)
        n = _common_suffix_len(t, next_t)
        m = _greatest(p, n)
        if m is None:
            # greatest(NULL, NULL): both neighbours exist but share no
            # suffix -> max_common NULL -> list_filter conditions NULL ->
            # both outputs empty -> COALESCE to [] (reference lines 644-654)
            out.append(([], []))
            continue
        # reference filter: i < token_count - max_common (1-based) keeps
        # positions 1..n-m-1; i >= n-m keeps the last m+1 tokens
        unique = [tok for j, tok in enumerate(t, 1) if j < len(t) - m]
        common = [tok for j, tok in enumerate(t, 1) if j >= len(t) - m]
        out.append((unique, common))
    return out


GENERALISED_ALIASES = {
    "FIRST": ["UPPERFLOOR", "LEVEL"],
    "SECOND": ["UPPERFLOOR", "LEVEL"],
    "THIRD": ["UPPERFLOOR", "LEVEL"],
    "TOP": ["UPPERFLOOR", "LEVEL"],
    "GARDEN": ["GROUNDFLOOR", "LEVEL"],
    "GROUND": ["GROUNDFLOOR", "LEVEL"],
    "BASEMENT": ["LEVEL"],
}


def generalise_tokens(tokens: List[str]) -> List[str]:
    """C13 (cleaning_steps.py:663-721): flatten of per-token alias lists."""
    out: List[str] = []
    for t in tokens:
        out.extend(GENERALISED_ALIASES.get(t, [t]))
    return out


def derive_adjacent_distinguishing_tokens(ds, bucket: int = BUCKET):
    """Dataset with address_concat -> adds distinguishing_adj_start_tokens,
    common_adj_start_tokens, distinguishing_adj_token_aliases."""
    import ray

    with_key = ds.map_batches(
        lambda b: b.append_column(
            "__rev",
            pa.array(
                [
                    (s or "")[::-1]
                    for s in b.column("address_concat").to_pylist()
                ],
                pa.string(),
            ),
        ),
        batch_format="pyarrow",
    )
    sorted_ds = with_key.sort("__rev").materialize()

    # per-block counts -> global offsets (tiny driver-side metadata)
    block_refs = sorted_ds.to_arrow_refs()
    counts = [t.num_rows for t in ray.get(block_refs)]
    offsets = []
    acc = 0
    for c in counts:
        offsets.append(acc)
        acc += c

    tagged = []
    for ref, off in zip(block_refs, offsets):
        tagged.append((ref, off))

    @ray.remote
    def emit_windows(tbl: pa.Table, offset: int) -> pa.Table:
        n = tbl.num_rows
        idx = list(range(offset, offset + n))
        buckets, gidx, core = [], [], []
        for local, i in enumerate(idx):
            b = i // bucket
            buckets.append(b)
            gidx.append(i)
            core.append(True)
            if i % bucket == 0 and b > 0:
                buckets.append(b - 1)
                gidx.append(i)
                core.append(False)
            if i % bucket == bucket - 1:
                buckets.append(b + 1)
                gidx.append(i)
                core.append(False)
        take = []
        k = 0
        for local, i in enumerate(idx):
            take.append(local)
            if i % bucket == 0 and i // bucket > 0:
                take.append(local)
            if i % bucket == bucket - 1:
                take.append(local)
        taken = tbl.take(pa.array(take, pa.int64()))
        return taken.append_column(
            "__bucket", pa.array(buckets, pa.int64())
        ).append_column("__gidx", pa.array(gidx, pa.int64())).append_column(
            "__core", pa.array(core, pa.bool_())
        )

    emitted = ray.data.from_arrow_refs(
        [emit_windows.remote(ref, off) for ref, off in tagged]
    )

    def window_group(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        rows.sort(key=lambda r: r["__gidx"])
        splits = split_adjacent_tokens(rows)
        keep = []
        for r, (uniq, common) in zip(rows, splits):
            if not r["__core"]:
                continue
            r = dict(r)
            r.pop("__bucket")
            r.pop("__gidx")
            r.pop("__core")
            r.pop("__rev", None)
            r["distinguishing_adj_start_tokens"] = uniq
            r["common_adj_start_tokens"] = common
            r["distinguishing_adj_token_aliases"] = generalise_tokens(uniq)
            keep.append(r)
        # explicit schema: all-empty list columns must stay list<string>,
        # not the null type from_pylist would infer
        base = [
            f
            for f in group.schema
            if f.name not in ("__bucket", "__gidx", "__core", "__rev")
        ]
        out_schema = pa.schema(
            base
            + [
                pa.field("distinguishing_adj_start_tokens", pa.list_(pa.string())),
                pa.field("common_adj_start_tokens", pa.list_(pa.string())),
                pa.field("distinguishing_adj_token_aliases", pa.list_(pa.string())),
            ]
        )
        return pa.Table.from_pylist(keep, schema=out_schema)

    return emitted.groupby("__bucket").map_groups(
        window_group, batch_format="pyarrow"
    )
