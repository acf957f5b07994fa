"""Distributed transitive closure: groupby-min label propagation.

The reference has no clustering (its closest analogue is best-match-per-group
selection); the north rule requires connected components over thresholded
pairs. Implemented as the classic iterative min-label propagation over a
Dataset of edges:

    labels(v) = min(v, min over neighbours u of labels(u))

iterated to fixed point; rounds converge in O(component diameter) — tiny for
entity-resolution clusters (star-shaped around canonical records; measured 3
rounds on the duplicate-heavy synth corpus).

Two execution strategies, chosen by NODE count:

* ``broadcast`` (≤ threshold nodes): nodes int-ranked once, edges int32-
  encoded once; each round is a shuffle-free numpy ``minimum.at`` scatter
  per edge block + a sparse driver combine + pointer compression.
* ``sharded`` (beyond): hash-sharded map-reduce rounds over raw Ray tasks —
  edges statically partitioned by ``crc32(src) % P``, labels co-sharded, a
  round = vectorized join wave + group-min reduce wave. No driver-side
  label state, no Dataset sort jobs, scales with shard count.

Both produce bit-identical labels (asserted by parity + property tests).

Labels are the lexicographic min of member unique_ids (deterministic).
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

EDGE_SCHEMA = pa.schema(
    [pa.field("src", pa.string()), pa.field("dst", pa.string())]
)
LABEL_SCHEMA = pa.schema(
    [pa.field("node", pa.string()), pa.field("label", pa.string())]
)

# max NODES the broadcast path keeps on the driver (int64 label array +
# sorted id string array ≈ 60 B/node -> ~1 GB at the default — fine for a
# driver with tens of GB); edge count is unbounded — edges stay distributed
# as int32 blocks. Beyond this the hash-sharded map-reduce path takes over
# (no driver-side label state; scales to billions of nodes).
DEFAULT_BROADCAST_THRESHOLD = 16_000_000


def edges_from_pairs(pairs_ds, threshold: float, l_prefix: str = "c_", r_prefix: str = "m_"):
    """Thresholded pair rows -> undirected edge list (both directions).

    Node ids are prefixed per side so messy and canonical id spaces cannot
    collide (the reference keeps sides distinct via source_dataset aliases).
    """

    def emit(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mw = batch.column("match_weight")
        kept = batch.filter(
            pc.and_kleene(pc.is_valid(mw), pc.greater_equal(mw, threshold))
        )
        if kept.num_rows == 0:
            # zero-chunk chunked arrays lose their field in pa.table()
            return EDGE_SCHEMA.empty_table()
        a2 = pc.binary_replace_slice(
            kept.column("unique_id_l"), start=0, stop=0, replacement=l_prefix
        )
        b2 = pc.binary_replace_slice(
            kept.column("unique_id_r"), start=0, stop=0, replacement=r_prefix
        )
        return pa.concat_tables(
            [pa.table({"src": a2, "dst": b2}), pa.table({"src": b2, "dst": a2})]
        ).combine_chunks()

    return pairs_ds.map_batches(emit, batch_format="pyarrow")


def _discover_nodes(edges):
    """Per-block distinct (one raw task per materialized edge block; no
    Dataset job — its fixed cost is CPU-count-invariant and lands straight
    in the Amdahl serial term) + driver unique -> SORTED node array
    (lexicographic rank order). Returns None when there are no nodes."""
    import pyarrow.compute as pc
    import ray

    @ray.remote
    def distinct_src(tbl: pa.Table):
        if tbl.num_rows == 0 or "src" not in tbl.schema.names:
            return None
        return pa.table({"node": pc.unique(tbl.column("src")).cast(pa.string())})

    parts = ray.get([distinct_src.remote(r) for r in edges.to_arrow_refs()])
    parts = [t for t in parts if t is not None and t.num_rows > 0]
    if not parts:
        return None
    nodes_arr = pc.unique(pa.concat_tables(parts).column("node"))
    if len(nodes_arr) == 0:
        return None
    return nodes_arr.take(pc.sort_indices(nodes_arr))


def _min_label_rounds(int_edge_refs, n_nodes: int, max_iters: int, round_cb=None):
    """Shared broadcast-path iteration: numpy ``minimum.at`` scatter per
    int-edge block against a broadcast label array, sparse driver combine,
    pointer compression. Returns the converged int64 label array (labels are
    node ranks/indices; the caller maps them back to ids)."""
    import numpy as np
    import ray

    int_max = np.iinfo(np.int64).max

    @ray.remote
    def partial_min(batch, lab):
        if batch is None or batch.num_rows == 0:
            return None
        s = batch.column("s").to_numpy()
        d = batch.column("d").to_numpy()
        out = np.full(len(lab), int_max, dtype=np.int64)
        np.minimum.at(out, d, lab[s])
        idx = np.nonzero(out != int_max)[0]
        return idx, out[idx]

    labels = np.arange(n_nodes, dtype=np.int64)
    for it in range(max_iters):
        lab_ref = ray.put(labels)
        acc = labels.copy()
        for res in ray.get(
            [partial_min.remote(b, lab_ref) for b in int_edge_refs]
        ):
            if res is None:
                continue
            idx, vals = res
            np.minimum.at(acc, idx, vals)
        # pointer compression: labels point within the component, so
        # composing them is safe and flattens chains without extra rounds
        while True:
            nxt = acc[acc]
            if np.array_equal(nxt, acc):
                break
            acc = nxt
        if round_cb is not None:
            round_cb(it, acc)
        if np.array_equal(acc, labels):
            break
        labels = acc
    return labels


def propagate_labels_indexed(
    pairs_ds,
    threshold: float,
    payload_ref,
    max_iters: int = 25,
    l_prefix: str = "c_",
    r_prefix: str = "m_",
):
    """Flagship fast path: connected components over IMPROVED pairs that
    carry payload row indices (``__src_idx_l``/``__src_idx_r`` from the
    gather-mode match pipeline).

    Edges are int32 index pairs extracted per materialized pair block (no
    string node discovery, no id encode pass, no node-array broadcast —
    the phases that made the string path anti-scale with worker count);
    labels propagate over the dense payload row range. The reported label
    is the lexicographic MIN prefixed unique_id of the component — computed
    by one driver-side Arrow group-min over participating nodes — so the
    output is bit-identical to ``edges_from_pairs`` + ``propagate_labels``
    (parity-tested). Node count is bounded by the gather payload (same
    object-store gate as the gather path itself); beyond that the string
    sharded path takes over."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    from uk_address_matcher_ray.stages.block import SIDE_COL, SRC_IDX_COL
    from uk_address_matcher_ray.stages.score import _gathered_payload
    from uk_address_matcher_ray.util import dataset_from_table

    idx_l, idx_r = f"{SRC_IDX_COL}_l", f"{SRC_IDX_COL}_r"

    @ray.remote
    def edge_block(tbl: pa.Table):
        if tbl.num_rows == 0 or idx_l not in tbl.schema.names:
            return None
        mw = tbl.column("match_weight")
        kept = tbl.filter(
            pc.and_kleene(pc.is_valid(mw), pc.greater_equal(mw, threshold))
        )
        if kept.num_rows == 0:
            return None
        s = kept.column(idx_l).to_numpy(zero_copy_only=False).astype(np.int32)
        d = kept.column(idx_r).to_numpy(zero_copy_only=False).astype(np.int32)
        return pa.table(
            {
                "s": pa.array(np.concatenate([s, d]), pa.int32()),
                "d": pa.array(np.concatenate([d, s]), pa.int32()),
            }
        )

    @ray.remote
    def participants_of(edges):
        if edges is None:
            return None
        return np.unique(edges.column("s").to_numpy())

    edge_refs = [edge_block.remote(b) for b in pairs_ds.to_arrow_refs()]
    parts = [p for p in ray.get([participants_of.remote(r) for r in edge_refs]) if p is not None]
    if not parts:
        return ray.data.from_arrow(LABEL_SCHEMA.empty_table())
    part = np.unique(np.concatenate(parts)).astype(np.int64)

    payload = _gathered_payload((payload_ref,))
    labels = _min_label_rounds(edge_refs, payload.num_rows, max_iters)

    # ---- distributed finalize: the prefixed node ids, per-component
    # min and final label attach were ONE driver-serial Arrow pass
    # (~2.8 s at x256 — the cluster stage's whole Amdahl term); they now
    # run as a chunked task wave over the participant range, with the
    # (root -> min node id) map tree-reduced in tasks. Row order equals
    # the serial pass (chunks partition the sorted participant array in
    # order); values are bit-identical (same group-min, same joins).
    n_chunks = min(32, max(1, len(part) // 65536 or 1))
    n_shards = min(16, n_chunks)
    chunk_bounds = np.array_split(part, n_chunks)
    shard_edges = np.linspace(
        0, payload.num_rows + 1, n_shards + 1
    ).astype(np.int64)
    lab_ref = ray.put(labels)

    @ray.remote
    def finalize_chunk(pl: pa.Table, chunk: np.ndarray, lab: np.ndarray):
        """node ids for one participant range + (root, node_id) rows
        split by root-range shard (list: [(node_ids, roots), piece_0..])."""
        part_arr = pa.array(chunk, pa.int64())
        uid = pl.column("unique_id").combine_chunks().take(part_arr)
        side = pl.column(SIDE_COL).combine_chunks().take(part_arr)
        prefix = pc.if_else(
            pc.equal(side, 0),
            pa.scalar(l_prefix, pa.string()),
            pa.scalar(r_prefix, pa.string()),
        )
        node_ids = pc.binary_join_element_wise(
            prefix, uid.cast(pa.string()), ""
        )
        roots_np = lab[chunk]
        pairs_tbl = pa.table(
            {"r": pa.array(roots_np, pa.int64()), "m": node_ids}
        )
        out = [(node_ids, pa.array(roots_np, pa.int64()))]
        for s in range(n_shards):
            lo, hi = shard_edges[s], shard_edges[s + 1]
            out.append(
                pairs_tbl.filter(
                    pa.array((roots_np >= lo) & (roots_np < hi))
                )
            )
        return out

    @ray.remote
    def shard_min(*pieces):
        """group-min over ONE root range: the global string group-min's
        work divided across shards instead of one driver pass."""
        live = [p for p in pieces if p.num_rows]
        if not live:
            return pa.table(
                {"r": pa.array([], pa.int64()), "m": pa.array([], pa.string())}
            )
        return (
            pa.concat_tables(live)
            .group_by("r")
            .aggregate([("m", "min")])
            .rename_columns(["r", "m"])
            .sort_by("r")
        )

    @ray.remote
    def emit_chunk(pair, map_tbl: pa.Table) -> pa.Table:
        # r-sorted map -> vectorized binary search; pc.index_in would
        # rebuild its value-set hash table over the whole component map
        # PER CHUNK (the repo-known per-call trap). Every root is in the
        # map by construction, so searchsorted positions are exact.
        node_ids, roots = pair
        rvals = map_tbl.column("r").to_numpy()
        pos = np.searchsorted(rvals, roots.to_numpy())
        lab_str = map_tbl.column("m").combine_chunks().take(
            pa.array(pos, pa.int64())
        )
        return pa.table({"node": node_ids, "label": lab_str}).cast(LABEL_SCHEMA)

    pair_refs = []
    piece_refs: list = []
    for chunk in chunk_bounds:
        if len(chunk) == 0:
            continue
        rets = finalize_chunk.options(num_returns=1 + n_shards).remote(
            payload_ref, chunk, lab_ref
        )
        pair_refs.append(rets[0])
        piece_refs.append(rets[1:])
    shard_refs = [
        shard_min.remote(*[pieces[s] for pieces in piece_refs])
        for s in range(n_shards)
    ]
    # shard ranges are ordered and each shard is r-sorted, so the concat
    # is globally r-sorted; the map is component-count-bounded
    map_tbl = pa.concat_tables(ray.get(shard_refs))
    map_ref = ray.put(map_tbl)
    return ray.data.from_arrow_refs(
        [emit_chunk.remote(p, map_ref) for p in pair_refs]
    )


def _broadcast_propagate(
    edges, nodes_arr, max_iters: int, checkpoint_dir: Optional[str]
):
    """Broadcast path: integer-encoded min-label propagation.

    Nodes are ranked by lexicographic order ONCE (so integer min == string
    min and the output is bit-identical to the string algorithm); edges are
    encoded to int32 rank pairs ONCE via a vectorized ``pc.index_in``
    against the broadcast sorted node array; then each round is a numpy
    ``minimum.at`` scatter per edge block against a broadcast label array
    (no shuffle) with a tiny sparse driver combine, followed by driver-side
    pointer compression (``labels = labels[labels]``), which keeps label
    chains flat so rounds stay O(1)-ish instead of O(component diameter).
    Edges stay distributed at ANY count — only per-NODE arrays live on the
    driver; the distributed round covers node counts beyond that."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    n_nodes = len(nodes_arr)

    # --- one-time int32 edge encoding (rank = position in sorted array) ---
    # Every phase here runs as RAW TASKS over the materialized edge blocks:
    # a Dataset job's fixed cost (~0.5-1 s on this box) is CPU-count
    # invariant, and encode + N propagation rounds as Dataset jobs put
    # ~5 such costs straight into the Amdahl serial term (measured: the
    # cluster stage at x64 was SLOWER at 32 CPUs than at 8).
    # Encode via np.searchsorted over a fixed-width byte copy of the sorted
    # node array instead of pc.index_in: index_in rebuilds a |nodes|-entry
    # hash table in EVERY block task (measured 19-28 s at x64 = 32 tasks
    # x 1.28M-string builds), while searchsorted only probes — numpy 'S'
    # memcmp order equals Arrow's utf8 byte order for ASCII, and every
    # src/dst is a member of nodes so lookups are exact positions. The
    # 'S' conversion itself is sliced across raw tasks (driver only
    # memcpy-concatenates). Non-ASCII ids fall back to the index_in path.
    def _nodes_to_bytes():
        nbytes = pc.sum(pc.binary_length(nodes_arr.cast(pa.binary()))).as_py()
        if nbytes is None or nbytes != pc.sum(pc.utf8_length(nodes_arr)).as_py():
            return None  # non-ASCII somewhere: byte order != 'S' cast safety
        blen = pc.max(pc.binary_length(nodes_arr.cast(pa.binary()))).as_py()
        sdt = np.dtype(f"S{max(1, blen)}")
        # plain driver-side astype: ~0.4 s / 1.3M nodes (fanning this out
        # as ray tasks measured SLOWER — put + slice-pickle + round trips
        # dominate the conversion itself)
        return nodes_arr.to_numpy(zero_copy_only=False).astype(sdt)

    import os as _os
    import time as _time

    _dbg = _os.environ.get("GRAFT_CL_DEBUG") == "1"
    _t0 = _time.monotonic()
    try:
        nodes_np = _nodes_to_bytes()
    except (UnicodeEncodeError, UnicodeDecodeError, ray.exceptions.RayTaskError):
        nodes_np = None
    nodes_ref = ray.put(nodes_np if nodes_np is not None else nodes_arr)
    if _dbg:
        print(f"[cl] node-bytes {_time.monotonic()-_t0:.2f}s", flush=True)

    @ray.remote
    def encode(tbl: pa.Table, nodes):
        if tbl.num_rows == 0 or "src" not in tbl.schema.names:
            return None
        if isinstance(nodes, np.ndarray):
            s = np.searchsorted(
                nodes, np.asarray(tbl.column("src").to_pylist(), dtype=nodes.dtype)
            ).astype(np.int32)
            d = np.searchsorted(
                nodes, np.asarray(tbl.column("dst").to_pylist(), dtype=nodes.dtype)
            ).astype(np.int32)
            return pa.table(
                {"s": pa.array(s, pa.int32()), "d": pa.array(d, pa.int32())}
            )
        s = pc.index_in(tbl.column("src"), value_set=nodes).cast(pa.int32())
        d = pc.index_in(tbl.column("dst"), value_set=nodes).cast(pa.int32())
        return pa.table({"s": s, "d": d})

    # edges arrive pre-repartitioned (propagate_labels) — ~one block per
    # CPU, so the byte/hash lookup structure is probed once per block, not
    # once per tiny upstream block
    _t0 = _time.monotonic()
    enc_refs = [encode.remote(b, nodes_ref) for b in edges.to_arrow_refs()]
    int_edge_refs = [
        r for r, t in zip(enc_refs, ray.get(enc_refs))
        if t is not None and t.num_rows > 0
    ]
    if _dbg:
        print(f"[cl] encode {_time.monotonic()-_t0:.2f}s", flush=True)
        _t0 = _time.monotonic()

    round_cb = None
    if checkpoint_dir is not None:

        def round_cb(it, acc):
            import os

            import pyarrow.parquet as pq

            d = f"{checkpoint_dir}/round={it}"
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                pa.table(
                    {"node": nodes_arr, "label": nodes_arr.take(pa.array(acc))}
                ),
                f"{d}/labels.parquet",
            )

    labels = _min_label_rounds(int_edge_refs, n_nodes, max_iters, round_cb)

    if _dbg:
        print(f"[cl] rounds {_time.monotonic()-_t0:.2f}s", flush=True)
    return ray.data.from_arrow(
        pa.table({"node": nodes_arr, "label": nodes_arr.take(pa.array(labels))})
    )


def propagate_labels(
    edges_ds,
    max_iters: int = 25,
    checkpoint_dir: Optional[str] = None,
    num_partitions: Optional[int] = None,
    broadcast_threshold: int = DEFAULT_BROADCAST_THRESHOLD,
):
    """-> Dataset(node, label) of connected components.

    ``broadcast_threshold`` bounds the NODE count of the broadcast path —
    only per-node arrays ever live on the driver; edges stay distributed as
    int32 blocks at any edge count.

    ``checkpoint_dir``: when set, labels are written per round
    (``{dir}/round={k}/``) for external inspection and recovery — a
    restarted run recomputes from round 0 (rounds are cheap relative to
    edge extraction; whole-stage resume is the checkpoint_run surface in
    state/checkpoint.py, which skips clustering entirely when its output
    manifest is present).
    """
    import os as _os
    import time as _time

    import ray

    _dbg = _os.environ.get("GRAFT_CL_DEBUG") == "1"
    _t0 = _time.monotonic()

    def _mark(name):
        nonlocal _t0
        if _dbg:
            print(f"[cl] {name} {_time.monotonic()-_t0:.2f}s", flush=True)
            _t0 = _time.monotonic()

    edges = edges_ds.materialize()
    _mark("edges materialize")

    # compact the block layout once (~one block per CPU): node discovery,
    # int encoding (one index_in hash build per block) and every propagation
    # round all reread the edges
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = min(
            max(1, edges.count() // 65536), max(8, cpus)
        )
        num_partitions = max(num_partitions, 1)
    edges = edges.repartition(num_partitions).materialize()
    _mark("repartition")

    nodes_arr = _discover_nodes(edges)
    _mark("discover")
    if nodes_arr is None:
        return ray.data.from_arrow(LABEL_SCHEMA.empty_table())
    if len(nodes_arr) <= broadcast_threshold:
        out = _broadcast_propagate(edges, nodes_arr, max_iters, checkpoint_dir)
        _mark("broadcast_propagate")
        return out
    return _sharded_propagate(edges, max_iters, checkpoint_dir, num_partitions)


def _sharded_propagate(edges, max_iters: int, checkpoint_dir, P: int):
    """Beyond-broadcast fallback: hash-sharded map-reduce label propagation
    with raw Ray tasks. Edges are partitioned ONCE by ``crc32(src) % P``
    (the static side); each round is two task waves:

    * wave A (per src-shard): vectorized ``pc.index_in`` join of the shard's
      edges against the shard's labels, candidate ``(dst, label)`` rows
      re-sharded by ``crc32(dst) % P`` on the way out;
    * wave B (per dst-shard): concat candidates + own labels, one Arrow
      ``group_by(node).min(label)``; emits a changed flag for convergence.

    No driver-side label state (each shard's labels stay in the object
    store), no Dataset sort jobs, O(diameter) rounds. Labels are the
    lexicographic min of component members — identical to the broadcast
    path (asserted by tests)."""
    import ray

    P = max(8, int(P or 8))

    def shard_of_col(col):
        """Vectorized node -> shard hash. Any deterministic hash works (the
        invariant is run-internal consistency: a node's label shard and its
        edges' src shard agree by construction); polars' 64-bit hash avoids
        the per-row crc32 loop."""
        import numpy as np

        try:
            import polars as pl

            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            s = pl.from_arrow(col)
            return (s.hash(seed=0).to_numpy() % P).astype(np.int64)
        except ImportError:  # pragma: no cover
            import zlib

            vals = col.to_pylist()
            return np.fromiter(
                (zlib.crc32(v.encode()) % P for v in vals),
                dtype=np.int64,
                count=len(vals),
            )

    @ray.remote
    def split_edges(tbl: pa.Table):
        import numpy as np

        if tbl.num_rows == 0 or "src" not in tbl.schema.names:
            return tuple([None] * P)
        sh = shard_of_col(tbl.column("src"))
        return tuple(
            tbl.take(pa.array(np.nonzero(sh == p)[0])) if (sh == p).any() else None
            for p in range(P)
        )

    in_refs = edges.to_arrow_refs()
    split_refs = [split_edges.options(num_returns=P).remote(r) for r in in_refs]

    @ray.remote
    def build_shard(*parts):
        import pyarrow.compute as pc

        live = [t for t in parts if t is not None and t.num_rows > 0]
        if not live:
            empty = EDGE_SCHEMA.empty_table()
            return empty, pa.table(
                {"node": pa.array([], pa.string()), "label": pa.array([], pa.string())}
            )
        t = pa.concat_tables(live).combine_chunks()
        nodes = pc.unique(t.column("src"))
        nodes = nodes.take(pc.sort_indices(nodes))
        return t, pa.table({"node": nodes, "label": nodes})

    edge_shard = []
    label_shard = []
    for p in range(P):
        e, l = build_shard.options(num_returns=2).remote(
            *[split_refs[b][p] for b in range(len(in_refs))]
        )
        edge_shard.append(e)
        label_shard.append(l)

    @ray.remote
    def emit_candidates(edge_tbl: pa.Table, label_tbl: pa.Table):
        import numpy as np
        import pyarrow.compute as pc

        if edge_tbl.num_rows == 0:
            return tuple([None] * P)
        # label lookup for this shard's srcs (all srcs are in this shard)
        idx = pc.index_in(
            edge_tbl.column("src"), value_set=label_tbl.column("node")
        )
        labs = label_tbl.column("label").take(idx)
        dst = edge_tbl.column("dst")
        sh = shard_of_col(dst)
        out = []
        for q in range(P):
            mask = np.nonzero(sh == q)[0]
            if len(mask) == 0:
                out.append(None)
                continue
            ind = pa.array(mask)
            out.append(
                pa.table({"node": dst.take(ind), "label": labs.take(ind)})
            )
        return tuple(out)

    @ray.remote
    def reduce_shard(label_tbl: pa.Table, *cand_tbls):
        live = [t for t in cand_tbls if t is not None and t.num_rows > 0]
        t = pa.concat_tables([label_tbl] + live).combine_chunks()
        agg = t.group_by("node").aggregate([("label", "min")])
        agg = agg.rename_columns(["node", "label"])
        # stable order so equality checks and outputs are deterministic
        import pyarrow.compute as pc

        agg = agg.take(pc.sort_indices(agg.column("node")))
        changed = not agg.equals(
            label_tbl.take(pc.sort_indices(label_tbl.column("node")))
        )
        return agg, changed

    for it in range(max_iters):
        cand = [
            emit_candidates.options(num_returns=P).remote(
                edge_shard[p], label_shard[p]
            )
            for p in range(P)
        ]
        new_labels = []
        flags = []
        for q in range(P):
            l, c = reduce_shard.options(num_returns=2).remote(
                label_shard[q], *[cand[p][q] for p in range(P)]
            )
            new_labels.append(l)
            flags.append(c)
        label_shard = new_labels
        if checkpoint_dir is not None:
            import ray as _r

            _r.data.from_arrow_refs(list(label_shard)).write_parquet(
                f"{checkpoint_dir}/round={it}"
            )
        if not any(ray.get(flags)):
            break
    return ray.data.from_arrow_refs(list(label_shard))
