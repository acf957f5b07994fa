"""Web link-graph operators: vectorized href extraction and a
deterministic integer-domain PageRank over the domain graph.

The reference (RobinL/uk_address_matcher) has no graph operators; this
family serves the webtext ingestion tier the north rule targets (a
Common-Crawl-style page table): outlink extraction feeds a host/domain
graph, PageRank ranks hosts for curation (seed-quality weighting in the
CCNet / RefinedWeb style of URL-level filtering).

Determinism contract
--------------------
``extract_links`` uses SPLIT semantics, not regex-scan semantics: the
links of a document are, for every occurrence of the literal ``href="``,
the prefix of the following fragment up to its first ``"`` — fragments
with no closing quote are dropped.  ``extract_links_sql`` restates the
same split (``string_split`` + ``split_part``), so both sides agree by
construction even on adversarial inputs (e.g. an unterminated attribute
followed by another ``href=`` — regex-scan and split views differ there,
and we pin the split view on both sides).

``pagerank`` is specified entirely in the INTEGER domain so that partial
sums are order-free and the DuckDB oracle is bit-exact:

    N      = |distinct(src) union distinct(dst)|
    base   = scale // N
    r0[v]  = base
    c(e)   = r[src(e)] // outdeg[src(e)]          (int division)
    inc[v] = sum of c(e) over in-edges of v        (exact int sum)
    r'[v]  = ((dd - dn) * base + dn * inc[v]) // dd

with scale = 2**40, dn/dd = 85/100 (the classic damping).  Multi-edges
count with multiplicity; dangling-node mass is dropped (the classic
simplified formulation — stated, not hidden).  Bounds: inc[v] <= total
rank <= scale = 2**40, so dn * inc < 2**47 fits int64 with headroom.
``rank`` = rank_scaled / 2**40 is a division by a power of two — exact,
hence double-identical on both sides.

Scale shape (100 TB)
--------------------
* The edge list is materialized ONCE as (src_idx:int32, dst_idx:int32)
  — 8 B/edge in the object store (spills to disk beyond memory); every
  iteration re-reads it instead of re-running extraction.  Iterative
  graph algorithms need resident edges; this is the standard shape.
* The node/outdeg table is the SMALL side by construction (distinct
  hosts << pages; Common Crawl: ~10^8 hosts vs ~10^10 pages).  Below
  ``_BROADCAST_MAX_NODES`` it is collected to the driver and broadcast
  per iteration via one ``ray.put`` (zero-copy reads in every task);
  beyond the gate the SHARDED path runs automatically: ranks stay a
  Dataset hash-co-partitioned with the edges on the src node (tagged
  union + grouped exchange for contribs, a second grouped exchange for
  the update), driver state one scalar.  Both paths are integer-domain,
  hence bit-identical (parity test in tests/test_graph.py).
* Each iteration ships only per-batch pre-aggregated (dst_idx, contrib)
  int rows — bounded by min(batch_rows, N) per batch, never the edges.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SCALE = 1 << 40
_DAMP_NUM = 85
_DAMP_DEN = 100
# Node table is driver-held + broadcast: 16M nodes ≈ a few hundred MB of
# host strings — the same gate as stages/cluster.py's broadcast path.
_BROADCAST_MAX_NODES = 16_000_000


def _links_of_batch(html: pa.ChunkedArray | pa.Array):
    """(parent_row_indices:int64 np, links:pa.StringArray) under the split
    contract documented above.  Null html yields no links."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    parts = pc.split_pattern(html, 'href="')
    flat = pc.list_flatten(parts)
    parents = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    # Drop the first fragment of every row (text before the first href=").
    offsets = np.asarray(parts.offsets)
    sizes = np.diff(offsets)
    first_flat_pos = offsets[:-1][sizes > 0]
    keep = np.ones(len(flat), dtype=bool)
    keep[first_flat_pos] = False
    # Fragments with no closing quote are dropped (split contract).
    keep &= pc.match_substring(flat, '"').to_numpy(zero_copy_only=False)
    idx = np.nonzero(keep)[0]
    frags = flat.take(pa.array(idx))
    links = pc.list_element(pc.split_pattern(frags, '"'), 0)
    return parents[idx], links


def extract_links(ds, id_col: str = "doc_id", html_col: str = "html"):
    """-> Dataset(id, link): one row per href occurrence, split contract.

    Zero-shuffle row-local pass: ``split_pattern`` over the Arrow buffer,
    first-fragment drop via list offsets, quote filter, first-quote
    prefix — no per-row Python."""

    def kernel(batch: pa.Table) -> pa.Table:
        parents, links = _links_of_batch(batch.column(html_col))
        ids = batch.column(id_col).take(pa.array(parents))
        return pa.table({id_col: ids, "link": links})

    return ds.select_columns([id_col, html_col]).map_batches(
        kernel, batch_format="pyarrow"
    )


def extract_links_sql(html_expr: str, source: str, id_col: str = "doc_id") -> str:
    """DuckDB mirror of the split contract: ``string_split`` on the same
    literal, skip the first fragment, require a closing quote, take the
    first-quote prefix."""
    return f"""
WITH raw AS (SELECT {id_col}, {html_expr} AS h FROM {source}),
frags AS (
  SELECT {id_col}, unnest(string_split(h, 'href="')[2:]) AS frag
  FROM raw
)
SELECT {id_col}, split_part(frag, '"', 1) AS link
FROM frags
WHERE contains(frag, '"')
"""


def link_hosts(links: pa.ChunkedArray | pa.Array):
    """Host of each link under the full-split contract
    (``split_part(split_part(link, '://', 2), '/', 1)``): element 1 of the
    full '://' split, then element 0 of the full '/' split.  Callers must
    pre-filter to links containing '://'."""
    if isinstance(links, pa.ChunkedArray):
        links = links.combine_chunks()
    rest = pc.list_element(pc.split_pattern(links, "://"), 1)
    return pc.list_element(pc.split_pattern(rest, "/"), 0)


def _deg_partial_local(block: pa.Table, src_col: str, dst_col: str) -> pa.Table:
    """(node, od) partial for one block: out-degree sums for sources,
    zero rows for destinations (so sink nodes join the node set)."""
    src = block.column(src_col)
    ones = pa.array(np.ones(len(src), dtype=np.int64))
    s = (
        pa.table({"node": src, "od": ones})
        .group_by("node")
        .aggregate([("od", "sum")])
        .rename_columns(["node", "od"])
    )
    dst_u = pc.unique(block.column(dst_col).combine_chunks())
    d = pa.table(
        {
            "node": dst_u,
            "od": pa.array(np.zeros(len(dst_u), dtype=np.int64)),
        }
    )
    return (
        pa.concat_tables([s, d])
        .group_by("node")
        .aggregate([("od", "sum")])
        .rename_columns(["node", "od"])
    )


def pagerank(
    edges,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = _SCALE,
    damp_num: int = _DAMP_NUM,
    damp_den: int = _DAMP_DEN,
    broadcast_max_nodes: int = _BROADCAST_MAX_NODES,
):
    """-> Dataset(node, rank_scaled:int64, rank:float64) after ``iters``
    integer-domain power iterations (spec in the module docstring).

    Below ``broadcast_max_nodes`` distinct nodes the rank vector is
    driver-held and ray.put-broadcast per iteration; above it the
    sharded path runs (ranks stay a Dataset co-keyed with the edges —
    two grouped exchanges per iteration, no broadcast, no driver state
    beyond one scalar).  Both paths compute in the integer domain, so
    their outputs are bit-identical (tests/test_graph.py parity test)."""
    import ray

    # ---- Phase 1: node set + out-degrees (raw task wave + chunked
    # driver-side Arrow merge: per-block (node, od) partials compressed
    # every 64 blocks with group_by-sum, so the driver never holds more
    # than (broadcast gate + 64 blocks' distincts) rows; the gate check
    # runs per compression, and over-gate inputs fall back to the
    # Dataset groupby + sharded path before anything big accumulates).
    edges_m = edges.materialize()
    edge_refs = edges_m.to_arrow_refs()

    @ray.remote
    def deg_block(block: pa.Table) -> pa.Table:
        return _deg_partial_local(block, src_col, dst_col)

    deg_refs = [deg_block.remote(b) for b in edge_refs]
    acc: pa.Table | None = None
    over_gate = False
    for i in range(0, len(deg_refs), 64):
        chunk = ray.get(deg_refs[i : i + 64])
        acc = pa.concat_tables(([acc] if acc is not None else []) + chunk)
        acc = (
            acc.group_by("node")
            .aggregate([("od", "sum")])
            .rename_columns(["node", "od"])
        )
        if acc.num_rows > broadcast_max_nodes:
            over_gate = True
            break
    if over_gate:
        # rebuild the degree table distributed (never driver-held) and
        # run the sharded path — bit-identical by parity test
        deg_ds = (
            edges_m.map_batches(
                lambda b: _deg_partial_local(b, src_col, dst_col),
                batch_format="pyarrow",
            )
            .groupby("node")
            .sum("od")
            .materialize()
        )
        return _pagerank_sharded(
            edges_m, deg_ds, deg_ds.count(), iters, src_col, dst_col,
            scale, damp_num, damp_den,
        )
    if acc is None or acc.num_rows == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "rank_scaled": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.float64()),
                }
            )
        )
    acc = acc.sort_by("node")
    node_arr = acc.column("node").combine_chunks().cast(pa.string())
    od = acc.column("od").to_numpy(zero_copy_only=False).astype(np.int64)
    nodes: List[str] = node_arr.to_pylist()
    n_nodes = len(nodes)
    base = scale // n_nodes

    # ---- Phase 2: encode edges once to int32 index pairs (task wave).
    nodes_ref = ray.put(node_arr)

    @ray.remote
    def encode_block(block: pa.Table, vs: pa.Array):
        s = pc.index_in(block.column(src_col), value_set=vs)
        d = pc.index_in(block.column(dst_col), value_set=vs)
        return (
            s.cast(pa.int32()).combine_chunks(),
            d.cast(pa.int32()).combine_chunks(),
        )

    enc_refs = [encode_block.remote(b, nodes_ref) for b in edge_refs]

    # ---- Phase 3: power iterations (task wave + 8-way tree reduce of
    # nonzero-pruned partials per round — a Dataset job per round costs
    # ~0.3-0.5 s fixed; the waves are ~free and scale with blocks).
    od_ref = ray.put(od)

    @ray.remote
    def contrib(sd, rv, odv):
        s = sd[0].to_numpy(zero_copy_only=False)
        d = sd[1].to_numpy(zero_copy_only=False)
        c = rv[s] // odv[s]
        # float64 bincount is exact here: per-batch sums are bounded
        # by the total rank mass <= scale = 2**40 < 2**53.
        acc_v = np.bincount(d, weights=c.astype(np.float64))
        nz = np.nonzero(acc_v)[0].astype(np.int32)
        return nz, acc_v[nz].astype(np.int64)

    @ray.remote
    def merge(*parts):
        acc_v = np.zeros(n_nodes, dtype=np.int64)
        for nz, vals in parts:
            acc_v[nz] += vals
        nz = np.nonzero(acc_v)[0].astype(np.int32)
        return nz, acc_v[nz]

    r = np.full(n_nodes, base, dtype=np.int64)
    for _ in range(iters):
        r_ref = ray.put(r)
        refs = [contrib.remote(sd, r_ref, od_ref) for sd in enc_refs]
        while len(refs) > 1:
            refs = [
                merge.remote(*refs[i : i + 8])
                for i in range(0, len(refs), 8)
            ]
        inc = np.zeros(n_nodes, dtype=np.int64)
        if refs:
            nz, vals = ray.get(refs[0])
            inc[nz] = vals
        r = ((damp_den - damp_num) * base + damp_num * inc) // damp_den

    return ray.data.from_arrow(
        pa.table(
            {
                "node": node_arr,
                "rank_scaled": pa.array(r),
                "rank": pa.array(r.astype(np.float64) / float(scale)),
            }
        )
    )


def _pagerank_sharded(
    edges,
    deg_ds,
    n_nodes: int,
    iters: int,
    src_col: str,
    dst_col: str,
    scale: int,
    damp_num: int,
    damp_den: int,
):
    """Beyond-broadcast path: the rank vector stays a Dataset co-keyed
    with the edges.  Per iteration:

    1. tagged union (rank rows side=0, edge rows side=1) grouped on the
       src node — in-group contribs r//od, pre-aggregated per dst;
    2. groupby(dst).sum -> incoming; tagged union with the degree table
       grouped on the node — in-group integer update.

    Driver state: one scalar (n_nodes).  All arithmetic is the same
    integer spec as the broadcast path, so results are bit-identical."""
    import ray

    from uk_address_matcher_ray.stages.grouped import grouped_map

    base = scale // n_nodes
    edges_m = edges.select_columns([src_col, dst_col]).map_batches(
        lambda b: pa.table(
            {"k": b.column(src_col), "dst": b.column(dst_col)}
        ),
        batch_format="pyarrow",
    ).materialize()  # resident edges: the iterative-graph shape

    def with_rank(batch: pa.Table, r_expr) -> pa.Table:
        od = batch.column("sum(od)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": batch.column("node"),
                "od": pa.array(od),
                "r": pa.array(r_expr(batch)),
            }
        )

    ranks = deg_ds.map_batches(
        lambda b: with_rank(
            b, lambda t: np.full(t.num_rows, base, dtype=np.int64)
        ),
        batch_format="pyarrow",
    ).materialize()

    contrib_schema = pa.schema(
        [pa.field("dst", pa.string()), pa.field("c", pa.int64())]
    )
    rank_schema = pa.schema(
        [
            pa.field("k", pa.string()),
            pa.field("od", pa.int64()),
            pa.field("r", pa.int64()),
        ]
    )

    def contrib_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return contrib_schema.empty_table()
        t = t.combine_chunks()
        side = t.column("side").to_numpy(zero_copy_only=False)
        keys = t.column("k").combine_chunks().dictionary_encode()
        codes = keys.indices.to_numpy(zero_copy_only=False)
        n_codes = len(keys.dictionary)
        val = np.zeros(n_codes, dtype=np.int64)
        rk = side == 0
        r = t.column("r").to_numpy(zero_copy_only=False)
        od = t.column("od").to_numpy(zero_copy_only=False)
        src_ok = rk & (od > 0)
        val[codes[src_ok]] = r[src_ok] // od[src_ok]
        ek = np.nonzero(side == 1)[0]
        if len(ek) == 0:
            return contrib_schema.empty_table()
        c = val[codes[ek]]
        out = pa.table(
            {
                "dst": t.column("dst").take(pa.array(ek)),
                "c": pa.array(c),
            }
        )
        agg = out.group_by("dst").aggregate([("c", "sum")])
        return agg.rename_columns(["dst", "c"]).cast(contrib_schema)

    def update_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return rank_schema.empty_table()
        t = t.combine_chunks()
        side = t.column("side").to_numpy(zero_copy_only=False)
        keys = t.column("k").combine_chunks().dictionary_encode()
        codes = keys.indices.to_numpy(zero_copy_only=False)
        n_codes = len(keys.dictionary)
        inc = np.zeros(n_codes, dtype=np.int64)
        s = t.column("r").to_numpy(zero_copy_only=False)  # reused slot
        iv = side == 1
        inc[codes[iv]] = s[iv]
        odv = np.zeros(n_codes, dtype=np.int64)
        dv = side == 0
        od_in = t.column("od").to_numpy(zero_copy_only=False)
        odv[codes[dv]] = od_in[dv]
        has_deg = np.zeros(n_codes, dtype=bool)
        has_deg[codes[dv]] = True
        keep = np.nonzero(has_deg)[0]
        r_new = ((damp_den - damp_num) * base + damp_num * inc[keep]) // (
            damp_den
        )
        return pa.table(
            {
                "k": keys.dictionary.take(pa.array(keep)),
                "od": pa.array(odv[keep]),
                "r": pa.array(r_new),
            },
            schema=rank_schema,
        )

    for _ in range(iters):
        tagged = ranks.map_batches(
            lambda b: pa.table(
                {
                    "k": b.column("k"),
                    "dst": pa.nulls(b.num_rows, pa.string()),
                    "od": b.column("od"),
                    "r": b.column("r"),
                    "side": pa.array(
                        np.zeros(b.num_rows, dtype=np.int8)
                    ),
                }
            ),
            batch_format="pyarrow",
        ).union(
            edges_m.map_batches(
                lambda b: pa.table(
                    {
                        "k": b.column("k"),
                        "dst": b.column("dst"),
                        "od": pa.array(
                            np.zeros(b.num_rows, dtype=np.int64)
                        ),
                        "r": pa.array(
                            np.zeros(b.num_rows, dtype=np.int64)
                        ),
                        "side": pa.array(
                            np.ones(b.num_rows, dtype=np.int8)
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        contribs = grouped_map(
            tagged, "k", None, contrib_schema, fn_table=contrib_group
        )
        incoming = contribs.groupby("dst").sum("c")
        inc_tagged = deg_ds.map_batches(
            lambda b: pa.table(
                {
                    "k": b.column("node"),
                    "od": b.column("sum(od)"),
                    "r": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                    "side": pa.array(
                        np.zeros(b.num_rows, dtype=np.int8)
                    ),
                }
            ),
            batch_format="pyarrow",
        ).union(
            incoming.map_batches(
                lambda b: pa.table(
                    {
                        "k": b.column("dst"),
                        "od": pa.array(
                            np.zeros(b.num_rows, dtype=np.int64)
                        ),
                        "r": b.column("sum(c)"),
                        "side": pa.array(
                            np.ones(b.num_rows, dtype=np.int8)
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        ranks = grouped_map(
            inc_tagged, "k", None, rank_schema, fn_table=update_group
        ).materialize()

    return ranks.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("k"),
                "rank_scaled": b.column("r"),
                "rank": pa.array(
                    b.column("r").to_numpy(zero_copy_only=False).astype(
                        np.float64
                    )
                    / float(scale)
                ),
            }
        ),
        batch_format="pyarrow",
    )


def pagerank_sql(
    edges_sql: str,
    iters: int = 3,
    scale: int = _SCALE,
    damp_num: int = _DAMP_NUM,
    damp_den: int = _DAMP_DEN,
) -> str:
    """DuckDB mirror: the iteration chain unrolled as CTEs (the
    unrolled-Lloyd pattern), identical integer expressions."""
    parts = [
        f"edges AS ({edges_sql})",
        "nodes AS (SELECT DISTINCT node FROM ("
        "SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges))",
        "deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS od "
        "FROM edges GROUP BY src)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"r0 AS (SELECT node, CAST({scale} // n AS BIGINT) AS r "
        "FROM nodes CROSS JOIN nn)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"""r{k} AS (
  SELECT nd.node,
         CAST((({damp_den - damp_num} * ({scale} // nn.n))
               + {damp_num} * COALESCE(inc.s, 0)) // {damp_den}
              AS BIGINT) AS r
  FROM nodes nd CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(p.r // d.od) AS BIGINT) AS s
    FROM edges e
    JOIN r{k - 1} p ON p.node = e.src
    JOIN deg d ON d.node = e.src
    GROUP BY e.dst
  ) inc ON inc.node = nd.node
)"""
        )
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT node, r AS rank_scaled,
       CAST(r AS DOUBLE) / {scale} AS rank
FROM r{iters}
"""


# ---------------------------------------------------------------------------
# HITS hubs/authorities (Kleinberg 1999), integer domain
# ---------------------------------------------------------------------------

_HITS_Q = 1 << 20


def hits(
    edges,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    q: int = _HITS_Q,
    broadcast_max_nodes: int = _BROADCAST_MAX_NODES,
):
    """-> Dataset(node, auth_scaled, hub_scaled, auth, hub) after
    ``iters`` HITS rounds — hubs point at good authorities, authorities
    are pointed at by good hubs (Kleinberg 1999); the curation complement
    to PageRank on the same host graph (directories/link farms score as
    hubs, content hosts as authorities).

    Integer spec (the oracle runs the IDENTICAL formula): ``h0 = q`` for
    every node; per round ``a_raw[v] = Σ h[u] over in-edges (u,v)``
    (multi-edges count), ``a = a_raw·q // max(a_raw, 1)``, then the
    transposed half ``h_raw[u] = Σ a[v] over out-edges``, ``h = h_raw·q
    // max(h_raw, 1)`` — all values nonnegative so DuckDB's truncating
    ``//`` and numpy's floor division agree; the max-renormalization
    keeps every value ≤ q = 2^20 so per-node sums stay below 2^53 while
    in-degree < 2^33; the q-rescale runs in object ints / HUGEINT so the
    raw*q product cannot wrap int64 for hot nodes (in-degree > 2^23).
    Output doubles divide by the power-of-two q — exact both sides.

    Scale shape: identical to ``pagerank``'s broadcast path (edges
    int32-encoded once and object-store resident; two vectors of N ints
    on the driver; per-round half-sums are RAW TASK WAVES over the
    materialized edge blocks with an 8-way tree reduce of nonzero-pruned
    (idx, val) partials — a Dataset job per half-round costs ~0.3-0.5 s
    of fixed overhead ×6, the task waves are ~free).  Beyond
    ``broadcast_max_nodes`` the ``_pagerank_sharded`` two-grouped-
    exchange shape applies verbatim (ranks co-keyed with edges); it is
    not wired for HITS — the gate raises with that pointer rather than
    silently collecting an over-gate node table onto the driver."""
    import ray

    edges_m = edges.materialize()
    edge_refs = edges_m.to_arrow_refs()

    @ray.remote
    def distinct_nodes(block: pa.Table):
        s = pc.unique(block.column(src_col).combine_chunks())
        d = pc.unique(block.column(dst_col).combine_chunks())
        return pc.unique(pa.concat_arrays([s, d]))

    parts = ray.get([distinct_nodes.remote(r) for r in edge_refs])
    node_set: set = set()
    for p in parts:
        node_set.update(p.to_pylist())
        if len(node_set) > broadcast_max_nodes:
            raise NotImplementedError(
                "HITS beyond the broadcast gate: apply the "
                "_pagerank_sharded two-grouped-exchange shape "
                "(ranks co-keyed with edges)"
            )
    nodes = sorted(node_set)
    if not nodes:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "auth_scaled": pa.array([], pa.int64()),
                    "hub_scaled": pa.array([], pa.int64()),
                    "auth": pa.array([], pa.float64()),
                    "hub": pa.array([], pa.float64()),
                }
            )
        )
    node_arr = pa.array(nodes, pa.string())
    n_nodes = len(nodes)
    nodes_ref = ray.put(node_arr)

    @ray.remote
    def encode_block(block: pa.Table, vs: pa.Array):
        s = pc.index_in(block.column(src_col), value_set=vs)
        d = pc.index_in(block.column(dst_col), value_set=vs)
        return (
            s.cast(pa.int32()).combine_chunks(),
            d.cast(pa.int32()).combine_chunks(),
        )

    enc_refs = [encode_block.remote(b, nodes_ref) for b in edge_refs]

    @ray.remote
    def contrib(sd, vv, swap: bool):
        f, t = (sd[1], sd[0]) if swap else (sd[0], sd[1])
        f = f.to_numpy(zero_copy_only=False)
        t = t.to_numpy(zero_copy_only=False)
        acc = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(acc, t, vv[f])  # unbuffered: exact int64
        nz = np.nonzero(acc)[0].astype(np.int32)
        return nz, acc[nz]

    @ray.remote
    def merge(*parts):
        acc = np.zeros(n_nodes, dtype=np.int64)
        for nz, vals in parts:
            acc[nz] += vals
        nz = np.nonzero(acc)[0].astype(np.int32)
        return nz, acc[nz]

    def _half(vec: np.ndarray, swap: bool) -> np.ndarray:
        """raw[to] = Σ vec[from] over edges — task wave + tree reduce."""
        v_ref = ray.put(vec)
        refs = [contrib.remote(sd, v_ref, swap) for sd in enc_refs]
        while len(refs) > 1:
            refs = [
                merge.remote(*refs[i : i + 8])
                for i in range(0, len(refs), 8)
            ]
        raw = np.zeros(n_nodes, dtype=np.int64)
        if refs:
            nz, vals = ray.get(refs[0])
            raw[nz] = vals
        mx = max(int(raw.max()) if len(raw) else 0, 1)
        # renormalize via object ints: raw * q can pass 2^63 for nodes
        # with in-degree > 2^23 (the oracle widens to HUGEINT identically)
        return (raw.astype(object) * q // mx).astype(np.int64)

    h = np.full(n_nodes, q, dtype=np.int64)
    a = np.zeros(n_nodes, dtype=np.int64)
    for _ in range(iters):
        a = _half(h, swap=False)   # a_raw[d] = Σ h[s]
        h = _half(a, swap=True)    # h_raw[s] = Σ a[d]

    return ray.data.from_arrow(
        pa.table(
            {
                "node": node_arr,
                "auth_scaled": pa.array(a),
                "hub_scaled": pa.array(h),
                "auth": pa.array(a.astype(np.float64) / float(q)),
                "hub": pa.array(h.astype(np.float64) / float(q)),
            }
        )
    )


def hits_sql(edges_sql: str, iters: int = 3, q: int = _HITS_Q) -> str:
    """DuckDB mirror: unrolled half-round CTE chain, identical integer
    expressions (nonnegative, so // truncation == floor)."""
    parts = [
        f"edges AS MATERIALIZED ({edges_sql})",
        "nodes AS (SELECT DISTINCT node FROM ("
        "SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges))",
        f"h0 AS (SELECT node, CAST({q} AS BIGINT) AS v FROM nodes)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"""ar{k} AS MATERIALIZED (
  SELECT nd.node, COALESCE(s.c, 0) AS raw FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(p.v) AS BIGINT) AS c
    FROM edges e JOIN h{k - 1} p ON p.node = e.src GROUP BY e.dst
  ) s ON s.node = nd.node
)"""
        )
        parts.append(
            f"a{k} AS MATERIALIZED (SELECT node, CAST(raw AS HUGEINT) * {q} // "
            f"greatest((SELECT max(raw) FROM ar{k}), 1) AS v FROM ar{k})"
        )
        parts.append(
            f"""hr{k} AS MATERIALIZED (
  SELECT nd.node, COALESCE(s.c, 0) AS raw FROM nodes nd LEFT JOIN (
    SELECT e.src AS node, CAST(SUM(p.v) AS BIGINT) AS c
    FROM edges e JOIN a{k} p ON p.node = e.dst GROUP BY e.src
  ) s ON s.node = nd.node
)"""
        )
        parts.append(
            f"h{k} AS MATERIALIZED (SELECT node, CAST(raw AS HUGEINT) * {q} // "
            f"greatest((SELECT max(raw) FROM hr{k}), 1) AS v FROM hr{k})"
        )
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT a.node,
       CAST(a.v AS BIGINT) AS auth_scaled,
       CAST(h.v AS BIGINT) AS hub_scaled,
       CAST(a.v AS DOUBLE) / {q} AS auth,
       CAST(h.v AS DOUBLE) / {q} AS hub
FROM a{iters} a JOIN h{iters} h USING (node)
"""


# ---------------------------------------------------------------------------
# Triangle counting (degree-oriented, exact)
# ---------------------------------------------------------------------------

_SMALL_GRAPH_MAX_EDGES = 2_000_000  # one-task local path below; exchanges above
_GSEP = "\x00"


def _tri_local(t: pa.Table) -> pa.Table:
    """Sequential triangle_stats over one distinct-edge table — the same
    degree-oriented wedge-closure algorithm; a Counter / per-key dict
    over the WHOLE table equals the union over complete key groups, so
    the result is bit-identical to the exchange path (differential test
    in tests/test_graph_small_gate.py)."""
    import collections

    eks = t.column("ek").to_pylist()
    deg: collections.Counter = collections.Counter()
    pairs = []
    for ek in eks:
        u, v = ek.split(_GSEP)
        deg[u] += 1
        deg[v] += 1
        pairs.append((u, v))
    outs: dict = {}
    edge_set = set(eks)
    for u, v in pairs:
        s_, t_ = (u, v) if (deg[u], u) < (deg[v], v) else (v, u)
        outs.setdefault(s_, []).append(t_)
    tri = 0
    for lst in outs.values():
        lst.sort()
        for i in range(len(lst)):
            for j in range(i + 1, len(lst)):
                a, b = lst[i], lst[j]
                key = a + _GSEP + b if a < b else b + _GSEP + a
                if key in edge_set:
                    tri += 1
    return pa.table(
        {
            "n_nodes": pa.array([len(deg)], pa.int64()),
            "n_edges": pa.array([len(eks)], pa.int64()),
            "triangles": pa.array([tri], pa.int64()),
        }
    )


def _kcore_local(t: pa.Table, k: int, rounds: int) -> pa.Table:
    """Sequential kcore peel over one distinct-edge table — identical
    round semantics to the exchange path (differential-tested)."""
    import collections

    eks = t.column("ek").to_pylist()
    for _ in range(rounds):
        deg: collections.Counter = collections.Counter()
        for ek in eks:
            u, v = ek.split(_GSEP)
            deg[u] += 1
            deg[v] += 1
        eks = [
            ek
            for ek in eks
            if deg[ek.split(_GSEP)[0]] >= k and deg[ek.split(_GSEP)[1]] >= k
        ]
    cnt: collections.Counter = collections.Counter()
    for ek in eks:
        u, v = ek.split(_GSEP)
        cnt[u] += 1
        cnt[v] += 1
    ks = sorted(cnt)
    return pa.table(
        {
            "node": pa.array(ks, pa.string()),
            "deg": pa.array([cnt[x] for x in ks], pa.int64()),
        }
    )


def triangle_stats(edges, src_col: str = "src", dst_col: str = "dst"):
    """Exact triangle count over the UNDIRECTED simplification of the
    link graph -> Dataset(n_nodes, n_edges, triangles) — one row.

    The graph-health statistic of a crawl: clustering (triangles per
    wedge) separates organic link neighborhoods from link farms, whose
    star/spam topologies are triangle-poor for their edge count.

    Algorithm: the node-iterator with DEGREE ORIENTATION (Chiba-Nishizeki
    / "forward" algorithm): orient every edge from the endpoint with the
    smaller ``(degree, name)`` to the larger, enumerate wedges at the
    smaller endpoint, close them against the edge set.  The orientation
    is the hot-key defense — a degree-d hub's out-degree after
    orientation is O(sqrt(m)) so no group explodes quadratically, which
    is exactly the skew failure a name-only orientation has at 100 TB.

    Scale shape: five skinny exchanges, NO broadcast and no driver state:
    1. canonical-edge dedup (groupby edge key);
    2. degree: each distinct edge emits two (node, edge_key, other)
       halves, grouped by node — group size IS the degree;
    3. regroup by edge key to reassemble both halves -> oriented edge;
    4. wedges: group oriented edges by source, emit each out-neighbor
       pair once, keyed by the CLOSING edge's canonical key;
    5. tagged union with the edges, grouped by key: a group closes
       ``#wedge-rows`` triangles iff it contains an edge row.
    The final count is a one-row aggregate.  Mirrored by
    ``triangle_stats_sql``.
    """
    import ray

    from uk_address_matcher_ray.stages.grouped import grouped_map

    SEP = "\x00"

    def canon_partial(batch: pa.Table) -> pa.Table:
        a = batch.column(src_col).to_pylist()
        b = batch.column(dst_col).to_pylist()
        keys = {SEP.join((x, y) if x < y else (y, x))
                for x, y in zip(a, b) if x != y}
        return pa.table({"ek": pa.array(sorted(keys), pa.string())})

    distinct = (
        edges.select_columns([src_col, dst_col])
        .map_batches(canon_partial, batch_format="pyarrow")
        .groupby("ek")
        .count()
        .select_columns(["ek"])
        .materialize()  # skinny distinct-edge table, reused three times
    )

    def halves(batch: pa.Table) -> pa.Table:
        eks = batch.column("ek").to_pylist()
        node, other = [], []
        for ek in eks:
            u, v = ek.split(SEP)
            node.append(u); other.append(v)
            node.append(v); other.append(u)
        return pa.table(
            {
                "node": pa.array(node, pa.string()),
                "other": pa.array(other, pa.string()),
            }
        )

    # small-graph gate: below _SMALL_GRAPH_MAX_EDGES distinct edges the
    # whole computation runs in ONE raw task (_tri_local — identical
    # algorithm, differential-tested); the five exchanges cost fixed
    # task-wave overhead that dwarfs a small graph's compute.
    if distinct.count() <= _SMALL_GRAPH_MAX_EDGES:
        @ray.remote
        def tri_small(*tbls) -> pa.Table:
            live = [x for x in tbls if x.num_rows]
            if not live:
                return pa.table(
                    {
                        "n_nodes": pa.array([0], pa.int64()),
                        "n_edges": pa.array([0], pa.int64()),
                        "triangles": pa.array([0], pa.int64()),
                    }
                )
            return _tri_local(pa.concat_tables(live))

        return ray.data.from_arrow_refs(
            [tri_small.remote(*distinct.to_arrow_refs())]
        )

    halves_ds = distinct.map_batches(halves, batch_format="pyarrow")

    deg_schema = pa.schema(
        [
            pa.field("node", pa.string()),
            pa.field("other", pa.string()),
            pa.field("deg", pa.int64()),
        ]
    )

    def deg_kernel(tbl: pa.Table) -> pa.Table:
        import collections

        nodes = tbl.column("node").to_pylist()
        deg = collections.Counter(nodes)
        return pa.table(
            {
                "node": tbl.column("node"),
                "other": tbl.column("other"),
                "deg": pa.array([deg[n] for n in nodes], pa.int64()),
            }
        )

    with_deg = grouped_map(halves_ds, "node", None, deg_schema,
                           fn_table=deg_kernel)

    def rekey(batch: pa.Table) -> pa.Table:
        n = batch.column("node").to_pylist()
        o = batch.column("other").to_pylist()
        ek = [SEP.join((a, b) if a < b else (b, a)) for a, b in zip(n, o)]
        return pa.table(
            {
                "ek": pa.array(ek, pa.string()),
                "node": batch.column("node"),
                "deg": batch.column("deg"),
            }
        )

    keyed = with_deg.map_batches(rekey, batch_format="pyarrow")

    orient_schema = pa.schema(
        [pa.field("s", pa.string()), pa.field("t", pa.string())]
    )

    def orient_kernel(tbl: pa.Table) -> pa.Table:
        per: dict = {}
        for ek, node, deg in zip(
            tbl.column("ek").to_pylist(),
            tbl.column("node").to_pylist(),
            tbl.column("deg").to_pylist(),
        ):
            per.setdefault(ek, []).append((deg, node))
        s_out, t_out = [], []
        for ek, pair in per.items():
            (d1, n1), (d2, n2) = sorted(pair)
            s_out.append(n1); t_out.append(n2)
        return pa.table(
            {
                "s": pa.array(s_out, pa.string()),
                "t": pa.array(t_out, pa.string()),
            }
        )

    oriented = grouped_map(keyed, "ek", None, orient_schema,
                           fn_table=orient_kernel)

    wedge_schema = pa.schema(
        [pa.field("ek", pa.string()), pa.field("w", pa.int64())]
    )

    def wedge_kernel(tbl: pa.Table) -> pa.Table:
        per: dict = {}
        for s, t in zip(tbl.column("s").to_pylist(),
                        tbl.column("t").to_pylist()):
            per.setdefault(s, []).append(t)
        eks = []
        for outs in per.values():
            outs.sort()
            for i in range(len(outs)):
                for j in range(i + 1, len(outs)):
                    eks.append(outs[i] + SEP + outs[j])
        return pa.table(
            {
                "ek": pa.array(eks, pa.string()),
                "w": pa.array([1] * len(eks), pa.int64()),
            }
        )

    wedges = grouped_map(oriented, "s", None, wedge_schema,
                         fn_table=wedge_kernel)

    def edge_tag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ek": batch.column("ek"),
                "w": pa.array([0] * batch.num_rows, pa.int64()),
            }
        )

    tagged = wedges.union(distinct.map_batches(edge_tag,
                                               batch_format="pyarrow"))

    close_schema = pa.schema([pa.field("tri", pa.int64())])

    def close_kernel(tbl: pa.Table) -> pa.Table:
        import collections

        wsum: dict = collections.defaultdict(int)
        has_edge: set = set()
        for ek, w in zip(tbl.column("ek").to_pylist(),
                         tbl.column("w").to_pylist()):
            if w == 0:
                has_edge.add(ek)
            else:
                wsum[ek] += 1
        tri = sum(c for ek, c in wsum.items() if ek in has_edge)
        return pa.table({"tri": pa.array([tri], pa.int64())})

    closed = grouped_map(tagged, "ek", None, close_schema,
                         fn_table=close_kernel)

    n_edges = distinct.count()
    n_nodes = halves_ds.groupby("node").count().count()
    triangles = int(closed.sum("tri") or 0)
    return ray.data.from_arrow(
        pa.table(
            {
                "n_nodes": pa.array([n_nodes], pa.int64()),
                "n_edges": pa.array([n_edges], pa.int64()),
                "triangles": pa.array([triangles], pa.int64()),
            }
        )
    )


def triangle_stats_sql(edges_sql: str) -> str:
    """DuckDB mirror: identical canonicalization, (deg, name) row-order
    orientation, wedge join closed against the edge set."""
    return f"""
WITH tri_raw AS ({edges_sql}),
tri_e AS (
    SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
    FROM tri_raw WHERE src <> dst
),
tri_deg AS (
    SELECT n, count(*) AS d
    FROM (SELECT u AS n FROM tri_e UNION ALL SELECT v FROM tri_e) GROUP BY n
),
tri_o AS (
    SELECT CASE WHEN (du.d, te.u) < (dv.d, te.v) THEN te.u ELSE te.v END AS s,
           CASE WHEN (du.d, te.u) < (dv.d, te.v) THEN te.v ELSE te.u END AS t
    FROM tri_e te
    JOIN tri_deg du ON du.n = te.u JOIN tri_deg dv ON dv.n = te.v
),
tri_c AS (
    SELECT count(*) AS c
    FROM tri_o o1
    JOIN tri_o o2 ON o1.s = o2.s AND o1.t < o2.t
    JOIN tri_e te ON te.u = least(o1.t, o2.t) AND te.v = greatest(o1.t, o2.t)
)
SELECT (SELECT count(*) FROM tri_deg) AS n_nodes,
       (SELECT count(*) FROM tri_e) AS n_edges,
       (SELECT CAST(c AS BIGINT) FROM tri_c) AS triangles
"""


# ---------------------------------------------------------------------------
# k-core decomposition (fixed peel rounds)
# ---------------------------------------------------------------------------

def kcore(edges, k: int = 2, rounds: int = 4,
          src_col: str = "src", dst_col: str = "dst"):
    """Peel the undirected simple graph toward its k-core for a FIXED
    number of rounds -> Dataset(node, deg) — survivors with their
    degree in the post-peel subgraph.

    The link-farm / community-density primitive: spam constellations
    and boilerplate navigation rings fall out of low-k cores, organic
    hub neighborhoods survive.  Each round removes every node of
    current degree < ``k`` and the edges incident to it; after
    convergence the survivors ARE the k-core.  The round count is part
    of the CONTRACT (both engine and oracle run exactly ``rounds``
    rounds) because a data-dependent fixpoint cannot be mirrored by a
    finite CTE chain — callers size ``rounds`` like pagerank's
    ``iters`` (peeling converges in O(diameter)-ish rounds in
    practice; re-run with more rounds if the output still shrinks).

    Scale shape: TWO skinny exchanges per round, no broadcast and no
    driver node state: (1) edge halves grouped by node — group size is
    the degree, groups of size >= k re-emit their halves; (2) halves
    regrouped by edge key — edges keeping BOTH halves survive.  The
    live edge set shrinks monotonically, so round cost decays.
    Mirrored by ``kcore_sql``.
    """
    import ray

    from uk_address_matcher_ray.stages.grouped import grouped_map

    SEP = "\x00"

    def canon_partial(batch: pa.Table) -> pa.Table:
        a = batch.column(src_col).to_pylist()
        b = batch.column(dst_col).to_pylist()
        keys = {SEP.join((x, y) if x < y else (y, x))
                for x, y in zip(a, b) if x != y}
        return pa.table({"ek": pa.array(sorted(keys), pa.string())})

    live = (
        edges.select_columns([src_col, dst_col])
        .map_batches(canon_partial, batch_format="pyarrow")
        .groupby("ek")
        .count()
        .select_columns(["ek"])
        .materialize()
    )

    # small-graph gate: ONE raw task peels the whole graph
    # (_kcore_local — identical round semantics, differential-tested);
    # ~8 exchange jobs of fixed overhead otherwise dominate small inputs
    if live.count() <= _SMALL_GRAPH_MAX_EDGES:
        @ray.remote
        def peel_small(*tbls) -> pa.Table:
            live_t = [x for x in tbls if x.num_rows]
            if not live_t:
                return pa.table(
                    {
                        "node": pa.array([], pa.string()),
                        "deg": pa.array([], pa.int64()),
                    }
                )
            return _kcore_local(pa.concat_tables(live_t), k, rounds)

        return ray.data.from_arrow_refs(
            [peel_small.remote(*live.to_arrow_refs())]
        )

    half_schema = pa.schema(
        [pa.field("node", pa.string()), pa.field("ek", pa.string())]
    )

    def halves(batch: pa.Table) -> pa.Table:
        eks = batch.column("ek").to_pylist()
        node, out = [], []
        for ek in eks:
            u, v = ek.split(SEP)
            node.append(u); out.append(ek)
            node.append(v); out.append(ek)
        return pa.table(
            {
                "node": pa.array(node, pa.string()),
                "ek": pa.array(out, pa.string()),
            }
        )

    def deg_filter_kernel(tbl: pa.Table) -> pa.Table:
        import collections

        nodes = tbl.column("node").to_pylist()
        deg = collections.Counter(nodes)
        keep = pa.array([deg[n] >= k for n in nodes])
        return tbl.filter(keep)

    both_schema = pa.schema([pa.field("ek", pa.string())])

    def both_kernel(tbl: pa.Table) -> pa.Table:
        import collections

        cnt = collections.Counter(tbl.column("ek").to_pylist())
        return pa.table(
            {
                "ek": pa.array(
                    sorted(e for e, c in cnt.items() if c == 2),
                    pa.string(),
                )
            }
        )

    for _ in range(rounds):
        hs = live.map_batches(halves, batch_format="pyarrow")
        surviving_halves = grouped_map(
            hs, "node", None, half_schema, fn_table=deg_filter_kernel
        ).select_columns(["ek"])
        live = grouped_map(
            surviving_halves, "ek", None, both_schema, fn_table=both_kernel
        )

    final_halves = live.map_batches(halves, batch_format="pyarrow")
    out = (
        final_halves.groupby("node")
        .count()
        .map_batches(
            lambda b: b.rename_columns(["node", "deg"]),
            batch_format="pyarrow",
        )
    )
    return out


def kcore_sql(edges_sql: str, k: int = 2, rounds: int = 4) -> str:
    """DuckDB mirror: unrolled peel rounds, MATERIALIZED CTEs (each
    level is referenced twice — inlining re-evaluates exponentially)."""
    parts = [
        f"kc_raw AS MATERIALIZED ({edges_sql})",
        """kc_e0 AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
    FROM kc_raw WHERE src <> dst
)""",
    ]
    prev = "kc_e0"
    for r in range(1, rounds + 1):
        parts.append(
            f"""kc_a{r} AS MATERIALIZED (
    SELECT n FROM (
        SELECT u AS n FROM {prev} UNION ALL SELECT v FROM {prev}
    ) GROUP BY n HAVING count(*) >= {k}
)"""
        )
        parts.append(
            f"""kc_e{r} AS MATERIALIZED (
    SELECT e.u, e.v FROM {prev} e
    JOIN kc_a{r} au ON au.n = e.u
    JOIN kc_a{r} av ON av.n = e.v
)"""
        )
        prev = f"kc_e{r}"
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT n AS node, CAST(count(*) AS BIGINT) AS deg
FROM (SELECT u AS n FROM {prev} UNION ALL SELECT v FROM {prev})
GROUP BY n
"""
