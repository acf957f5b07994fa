"""Deterministic stratified sampling — the data-mixing primitive.

Training-data pipelines re-weight sources/languages/quality buckets by
sampling each stratum at its own rate ("data mixing": C4 vs books vs
code proportions, language balancing, quality-bucket upsampling caps).
At 100 TB the sampler must be a pure row-local function — no
coordination, no shuffle, no RNG state — so the same row makes the same
keep/drop decision on any cluster size, any block order, any re-run,
and a resumed job never double-samples.

Decision rule: keep row iff ``md5(f"{seed}:{id}")[:8] < hex(floor(rate *
2^32))`` — an 8-hex-digit lowercase string compare, which equals the
uint32 numeric compare (fixed width, lexicographic = numeric). md5 is
chosen over a faster integer mix because the DuckDB oracle can compute
the identical key (``md5(seed || ':' || CAST(id AS VARCHAR))``); a
production swap to splitmix64-on-int-ids is one function.

Scale shape: zero shuffles — one ``map_batches`` filter; the rate table
is a tiny dict captured in the closure (per-worker constant). The md5
per row is the only per-row Python; it is ~1 us/row and row-local, so it
scales as pure map parallelism.
"""

from __future__ import annotations

import hashlib
from typing import Mapping, Optional

import numpy as np
import pyarrow as pa


def _threshold_hex(rate: float) -> Optional[str]:
    """8-hex-char keep threshold; None means keep-all (rate >= 1)."""
    if rate >= 1.0:
        return None
    if rate <= 0.0:
        return "00000000"
    return format(int(rate * (1 << 32)), "08x")


def sample_key(id_val, seed: int = 0) -> str:
    """The row's 8-hex-char sample key (uniform over [0, 2^32))."""
    return hashlib.md5(f"{seed}:{id_val}".encode()).hexdigest()[:8]


def stratified_sample(
    ds,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    seed: int = 0,
):
    """-> Dataset(id, stratum, sample_key): rows kept at each stratum's
    rate. ``sample_key`` is emitted for auditability (the decision is
    recomputable from the row alone)."""
    rates = dict(rates)

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        keys = [sample_key(i, seed) for i in ids]
        # threshold per row via the batch's dictionary-encoded strata
        s = batch.column(stratum_col)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        d = s.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        import pyarrow.compute as pc

        thr_by_code = [
            _threshold_hex(rates.get(v, default_rate))
            for v in d.dictionary.to_pylist()
        ]
        # null stratum -> default rate (mirrors SQL CASE ... ELSE default)
        thr_null = _threshold_hex(default_rate)
        codes = pc.fill_null(d.indices, -1).to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            (
                (t := thr_by_code[c] if c >= 0 else thr_null) is None
                or keys[j] < t
                for j, c in enumerate(codes)
            ),
            bool,
            len(ids),
        )
        out = pa.table(
            {
                id_col: batch.column(id_col),
                "stratum": s,
                "sample_key": pa.array(keys, pa.string()),
            }
        )
        return out.filter(pa.array(keep))

    return ds.map_batches(kernel, batch_format="pyarrow")


def stratified_sample_sql(
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    seed: int = 0,
    table: str = "documents",
) -> str:
    """DuckDB mirror: identical md5 key, identical hex-string compare."""
    branches = []
    for v in sorted(rates):
        t = _threshold_hex(rates[v])
        cond = "TRUE" if t is None else f"sample_key < '{t}'"
        branches.append(f"WHEN '{v}' THEN {cond}")
    dt = _threshold_hex(default_rate)
    default = "TRUE" if dt is None else f"sample_key < '{dt}'"
    case = f"CASE stratum {' '.join(branches)} ELSE {default} END"
    return f"""
WITH keyed AS (
  SELECT {id_col}, {stratum_col} AS stratum,
         substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8)
             AS sample_key
  FROM {table}
)
SELECT {id_col}, stratum, sample_key FROM keyed
WHERE {case}
"""


# ---------------------------------------------------------------------------
# Per-group cap (domain/language balancing)
# ---------------------------------------------------------------------------

def _topcap_kernel(tbl: pa.Table, cap: int, group_col: str, id_col: str) -> pa.Table:
    """Keep the ``cap`` rows with the smallest (sample_key, id) per group.

    Sort by (group, key, id), then rank-within-group via numpy run
    boundaries — no Python loop, no per-group slicing."""
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return tbl
    order = pc.sort_indices(
        tbl,
        sort_keys=[
            (group_col, "ascending"),
            ("sample_key", "ascending"),
            (id_col, "ascending"),
        ],
    )
    s = tbl.take(order)
    g = s.column(group_col)
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    enc = g.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    import pyarrow.compute as pc2

    codes = pc2.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False)
    n = len(codes)
    idx = np.arange(n, dtype=np.int64)
    newg = np.empty(n, dtype=bool)
    newg[0] = True
    newg[1:] = codes[1:] != codes[:-1]
    starts = np.maximum.accumulate(np.where(newg, idx, 0))
    return s.filter(pa.array(idx - starts < cap))


def group_cap(
    ds,
    cap: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
):
    """Keep at most ``cap`` rows per group — the domain/language balancing
    primitive (C4 caps pages per domain; multilingual mixes cap docs per
    language). Rows are chosen by the deterministic md5 ``sample_key``
    (smallest ``cap`` keys win, id tie-break), so the selection is a
    uniform random-N-per-group that is reproducible on any cluster size
    and SQL-mirrorable as ``row_number() OVER (PARTITION BY group ORDER BY
    sample_key, id) <= cap``.

    Scale shape: the per-batch partial keeps at most ``cap`` rows per
    (group, batch) — the global winners are necessarily batch-local
    winners — so the grouped exchange carries O(cap x groups-per-batch)
    rows, never the corpus; the grouped pass re-applies the same kernel
    over complete groups. Hot groups cost cap rows per upstream batch,
    bounded and skew-immune.

    -> Dataset(id, group, sample_key), the surviving rows.
    """
    from uk_address_matcher_ray.stages.grouped import grouped_map

    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    group_type = types[group_col]
    id_type = types[id_col]

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        keyed = pa.table(
            {
                id_col: batch.column(id_col),
                group_col: batch.column(group_col),
                "sample_key": pa.array(
                    [sample_key(i, seed) for i in ids], pa.string()
                ),
            }
        )
        return _topcap_kernel(keyed, cap, group_col, id_col)

    out_schema = pa.schema(
        [
            pa.field(id_col, id_type),
            pa.field(group_col, group_type),
            pa.field("sample_key", pa.string()),
        ]
    )
    pre = ds.select_columns([id_col, group_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    return grouped_map(
        pre,
        group_col,
        None,
        out_schema,
        fn_table=lambda t: _topcap_kernel(t, cap, group_col, id_col).select(
            [id_col, group_col, "sample_key"]
        ),
    )


def group_cap_sql(
    cap: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
    table: str = "documents",
) -> str:
    """DuckDB mirror of ``group_cap``: identical md5 key and tie-break."""
    return f"""
WITH keyed AS (
  SELECT {id_col}, {group_col},
         substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8)
             AS sample_key
  FROM {table}
),
rnk AS (
  SELECT *, row_number() OVER (
      PARTITION BY {group_col} ORDER BY sample_key, {id_col}) AS rn
  FROM keyed
)
SELECT {id_col}, {group_col}, sample_key FROM rnk WHERE rn <= {cap}
"""


def _budget_kernel(
    tbl: pa.Table, budget: int, group_col: str, id_col: str, tokens_col: str
) -> pa.Table:
    """Keep each group's md5-rank prefix while the running token sum stays
    <= budget (inclusive prefix — the first overflowing row is dropped
    along with everything ranked after it that would also overflow)."""
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return tbl
    order = pc.sort_indices(
        tbl,
        sort_keys=[
            (group_col, "ascending"),
            ("sample_key", "ascending"),
            (id_col, "ascending"),
        ],
    )
    s = tbl.take(order)
    g = s.column(group_col)
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    enc = g.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False)
    toks = s.column(tokens_col).to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(codes)
    newg = np.empty(n, dtype=bool)
    newg[0] = True
    newg[1:] = codes[1:] != codes[:-1]
    cs = np.cumsum(toks)
    # subtract the cumsum just before each group's first row
    base_at_start = np.where(newg, cs - toks, 0)
    base = np.maximum.accumulate(np.where(newg, base_at_start, 0))
    prefix_incl = cs - base
    return s.filter(pa.array(prefix_incl <= budget))


def token_budget_cap(
    ds,
    budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "token_count",
    seed: int = 0,
):
    """Keep rows per group until a TOKEN budget is reached — the data-mixing
    primitive stated in token space ("200B tokens of web, 30B of code"),
    where ``group_cap`` states it in document space.

    Rows are ranked by the deterministic md5 ``sample_key`` (id
    tie-break) and kept while the inclusive running token sum stays
    <= ``budget`` — i.e. the SQL window ``SUM(tokens) OVER (PARTITION BY
    group ORDER BY sample_key, id ROWS UNBOUNDED PRECEDING) <= budget``.
    Greedy-prefix semantics: a huge row at rank r that overflows is
    dropped, and so is any later row whose inclusive prefix still
    overflows (later SMALLER rows are NOT pulled forward — the selection
    stays a pure rank-prefix predicate, reproducible on any cluster
    size / block order / resume).

    Scale shape (the group_cap argument, restated for budgets): a row's
    batch-local inclusive prefix is a LOWER bound on its global prefix —
    batch rows are a subset of the group's rows ranked ahead of it — so
    the per-batch partial safely drops every row whose batch-local
    prefix already exceeds the budget.  The exchange then carries at
    most budget/min_tokens rows per (group, batch) and the grouped pass
    re-applies the same kernel over complete groups.

    -> Dataset(id, group, tokens, sample_key), the surviving rows.
    """
    from uk_address_matcher_ray.stages.grouped import grouped_map

    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        keyed = pa.table(
            {
                id_col: batch.column(id_col),
                group_col: batch.column(group_col),
                tokens_col: batch.column(tokens_col),
                "sample_key": pa.array(
                    [sample_key(i, seed) for i in ids], pa.string()
                ),
            }
        )
        return _budget_kernel(keyed, budget, group_col, id_col, tokens_col)

    out_schema = pa.schema(
        [
            pa.field(id_col, types[id_col]),
            pa.field(group_col, types[group_col]),
            pa.field(tokens_col, types[tokens_col]),
            pa.field("sample_key", pa.string()),
        ]
    )
    pre = ds.select_columns([id_col, group_col, tokens_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    return grouped_map(
        pre,
        group_col,
        None,
        out_schema,
        fn_table=lambda t: _budget_kernel(
            t, budget, group_col, id_col, tokens_col
        ).select([id_col, group_col, tokens_col, "sample_key"]),
    )


def token_budget_cap_sql(
    budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    tokens_expr: str = "token_count",
    seed: int = 0,
    table: str = "documents",
) -> str:
    """DuckDB mirror of ``token_budget_cap``: identical md5 key, tie-break
    and inclusive-prefix predicate."""
    return f"""
WITH keyed AS (
  SELECT {id_col}, {group_col}, {tokens_expr} AS tok,
         substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8)
             AS sample_key
  FROM {table}
),
c AS (
  SELECT *,
         SUM(tok) OVER (PARTITION BY {group_col}
                        ORDER BY sample_key, {id_col}
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS run
  FROM keyed
)
SELECT {id_col}, {group_col}, tok AS token_count, sample_key
FROM c WHERE run <= {budget}
"""


# ---------------------------------------------------------------------------
# Temperature-based domain mixing
# ---------------------------------------------------------------------------

def _topcap_kernel_caps(
    tbl: pa.Table, caps: dict, group_col: str, id_col: str
) -> pa.Table:
    """``_topcap_kernel`` with a PER-GROUP cap map (groups absent from
    ``caps`` keep zero rows)."""
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return tbl
    order = pc.sort_indices(
        tbl,
        sort_keys=[
            (group_col, "ascending"),
            ("sample_key", "ascending"),
            (id_col, "ascending"),
        ],
    )
    s = tbl.take(order)
    g = s.column(group_col)
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    enc = g.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False)
    code_caps = np.fromiter(
        (caps.get(v, 0) for v in enc.dictionary.to_pylist()),
        dtype=np.int64,
        count=len(enc.dictionary),
    )
    if len(code_caps) == 0:
        # every group value null -> nothing can pass a cap
        return s.slice(0, 0)
    n = len(codes)
    idx = np.arange(n, dtype=np.int64)
    newg = np.empty(n, dtype=bool)
    newg[0] = True
    newg[1:] = codes[1:] != codes[:-1]
    starts = np.maximum.accumulate(np.where(newg, idx, 0))
    # null group values carry code -1, which would alias the LAST
    # group's cap under fancy indexing — a null group has no cap
    # entry, so those rows are dropped explicitly (caps.get(None)==0).
    keep = idx - starts < code_caps[codes]
    keep &= codes >= 0
    return s.filter(pa.array(keep))


def temperature_mix(
    ds,
    total: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
):
    """Temperature-flattened domain mixing (alpha = 1/2): select ~``total``
    rows with per-group targets proportional to sqrt(group size) — the
    multilingual/multi-domain rebalancing rule (mC4/XLM-R style: raise
    small domains, damp head domains) at the fixed temperature that
    stays INTEGER-EXACT.

    Contract (mirrored by ``temperature_mix_sql``):

    * ``n_g`` = group row count; ``w_g = isqrt(n_g)`` (integer sqrt —
      no float power anywhere, so no sum-order or libm dependence);
    * ``target_g = min(n_g, total * w_g // Σ w)`` — truncating integer
      division; groups whose target truncates to 0 are dropped;
    * within a group, the ``target_g`` rows with the smallest
      ``(sample_key, id)`` win — the repo-wide md5 sampling key, so
      the pick is uniform, reproducible and SQL-mirrorable.

    Scale shape: one skinny groupby for the counts (driver holds one
    integer per group — the |groups| broadcast is the same boundedness
    assumption as every per-source stage); then the ``group_cap``
    machinery with a per-group cap map: per-batch partials keep at most
    ``target_g`` rows per (group, batch) so the grouped exchange
    carries O(targets), never the corpus.

    -> Dataset(id, group, sample_key), the surviving rows.
    """
    import math

    import ray

    from uk_address_matcher_ray import util
    from uk_address_matcher_ray.stages.grouped import grouped_map

    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    out_schema = pa.schema(
        [
            pa.field(id_col, types[id_col]),
            pa.field(group_col, types[group_col]),
            pa.field("sample_key", pa.string()),
        ]
    )
    counts = {
        r[group_col]: int(r["count()"])
        for r in ds.groupby(group_col).count().take_all()
    }
    if not counts:
        return ray.data.from_arrow(out_schema.empty_table())
    weights = {g: math.isqrt(n) for g, n in counts.items()}
    s = sum(weights.values())
    caps = {
        g: min(counts[g], total * w // s) for g, w in weights.items()
    }
    caps = {g: c for g, c in caps.items() if c > 0}
    caps_ref = ray.put(caps)

    def partial(batch: pa.Table) -> pa.Table:
        cmap = util.get_broadcast(caps_ref)
        ids = batch.column(id_col).to_pylist()
        keyed = pa.table(
            {
                id_col: batch.column(id_col),
                group_col: batch.column(group_col),
                "sample_key": pa.array(
                    [sample_key(i, seed) for i in ids], pa.string()
                ),
            }
        )
        return _topcap_kernel_caps(keyed, cmap, group_col, id_col)

    pre = ds.select_columns([id_col, group_col]).map_batches(
        partial, batch_format="pyarrow"
    )

    def final(tbl: pa.Table) -> pa.Table:
        cmap = util.get_broadcast(caps_ref)
        return _topcap_kernel_caps(tbl, cmap, group_col, id_col).select(
            [id_col, group_col, "sample_key"]
        )

    return grouped_map(pre, group_col, None, out_schema, fn_table=final)


def temperature_mix_sql(
    total: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    table: str = "documents",
) -> str:
    """DuckDB mirror: corrected floor-sqrt == ``math.isqrt``, truncating
    integer division, identical md5 key and tie-break."""
    return f"""
WITH n AS (
  SELECT {group_col} AS g, count(*) AS n FROM {table} GROUP BY {group_col}
),
w0 AS (
  SELECT g, n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS s0 FROM n
),
w AS (
  SELECT g, n,
         CASE WHEN (s0 + 1) * (s0 + 1) <= n THEN s0 + 1
              WHEN s0 * s0 > n THEN s0 - 1
              ELSE s0 END AS w
  FROM w0
),
tot AS (SELECT SUM(w) AS s FROM w),
tgt AS (
  SELECT g, least(n, CAST({total} * w // tot.s AS BIGINT)) AS cap
  FROM w, tot
),
keyed AS (
  SELECT {id_col}, {group_col} AS g,
         substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8)
             AS sample_key
  FROM {table}
),
rnk AS (
  SELECT *, row_number() OVER (
      PARTITION BY g ORDER BY sample_key, {id_col}) AS rn
  FROM keyed
)
SELECT {id_col}, g AS {group_col}, sample_key
FROM rnk JOIN tgt USING (g) WHERE rn <= tgt.cap
"""


# ---------------------------------------------------------------------------
# Exact-N global sample
# ---------------------------------------------------------------------------

def sample_exact_n(ds, n: int, id_col: str = "doc_id", seed: int = 0):
    """EXACTLY ``n`` uniformly-chosen rows (or all rows if fewer) ->
    Dataset(id, sample_key) — the eval-set / spot-check draw where a
    rate-based sample's ±binomial wobble is not acceptable.

    Contract (mirrored by ``sample_exact_n_sql``): the winners are the
    ``n`` smallest ``(sample_key, id)`` — the repo-wide md5 sampling
    key, so the draw is uniform, reproducible, and stable under any
    partitioning.

    Scale shape: each batch keeps only its local ``n`` smallest (a
    global winner is necessarily a batch winner — the top-cap pruning
    argument), so the driver merge sees <= n × upstream-blocks skinny
    rows, never the corpus.  ``n`` is assumed driver-sized (an eval
    draw, not a split — for corpus-scale selections use
    ``stratified_sample`` / ``temperature_mix``).
    """
    import ray

    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    out_schema = pa.schema(
        [
            pa.field(id_col, id_type),
            pa.field("sample_key", pa.string()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch.column(id_col).to_pylist()
        t = pa.table(
            {
                id_col: batch.column(id_col),
                "sample_key": pa.array(
                    [sample_key(i, seed) for i in ids], pa.string()
                ),
            }
        )
        order = pc.sort_indices(
            t,
            sort_keys=[("sample_key", "ascending"), (id_col, "ascending")],
        )
        return t.take(order[: min(n, t.num_rows)])

    winners = ds.select_columns([id_col]).map_batches(
        partial, batch_format="pyarrow"
    ).take_all()
    winners.sort(key=lambda r: (r["sample_key"], r[id_col]))
    winners = winners[:n]
    if not winners:
        return ray.data.from_arrow(out_schema.empty_table())
    return ray.data.from_arrow(
        pa.table(
            {
                id_col: pa.array([r[id_col] for r in winners], id_type),
                "sample_key": pa.array(
                    [r["sample_key"] for r in winners], pa.string()
                ),
            }
        )
    )


def sample_exact_n_sql(
    n: int,
    table: str = "documents",
    id_col: str = "doc_id",
    seed: int = 0,
) -> str:
    """DuckDB mirror: identical key, ORDER BY + LIMIT."""
    return f"""
SELECT {id_col},
       substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8)
           AS sample_key
FROM {table}
ORDER BY sample_key, {id_col}
LIMIT {n}
"""
