"""Distributed transitive closure: groupby-min label propagation.

The reference has no clustering (its closest analogue is best-match-per-group
selection); the north rule requires connected components over thresholded
pairs. Implemented as the classic iterative min-label propagation over a
Dataset of edges:

    labels(v) = min(v, min over neighbours u of labels(u))

iterated to fixed point; rounds converge in O(component diameter) — tiny for
entity-resolution clusters (star-shaped around canonical records; measured 3
rounds on the duplicate-heavy synth corpus).

Per-round join strategy: the label table is orders of magnitude smaller than
the corpus (one row per node that appears in a thresholded pair), so while it
fits ``broadcast_threshold`` it is broadcast via ``ray.put`` and each round
is ONE edge ``map_batches`` + ONE ``groupby(node).min(label)`` shuffle.
Beyond the threshold the round falls back to a fully-distributed tagged-union
join (labels ∪ edges sorted by key) — same semantics, two shuffles. Both
paths were measured; the broadcast round is ~4x faster at 10^5-node scale
and the fallback keeps the operator correct at any scale.

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
# sorted id string array ≈ 60 B/node -> ~300 MB at the default); edge count
# is unbounded — edges stay distributed as int32 blocks
DEFAULT_BROADCAST_THRESHOLD = 5_000_000


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


def _init_labels(edges_ds):
    def emit(batch: pa.Table) -> pa.Table:
        nodes = batch.column("src")
        return pa.table({"node": nodes, "label": nodes})

    return (
        edges_ds.map_batches(emit, batch_format="pyarrow")
        .groupby("node")
        .min("label")
        .map_batches(
            lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"
        )
    )


def _distributed_round(labels, edges):
    """Tagged-union join round (scale fallback): union labels (kind=l) with
    edges keyed by src (kind=e), group by key, emit candidate labels
    (dst, label_of_src) + own labels, then groupby-min."""

    def tag_labels(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch.column("node"),
                "kind": pa.array(["l"] * batch.num_rows, pa.string()),
                "val": batch.column("label"),
            }
        )

    def tag_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch.column("src"),
                "kind": pa.array(["e"] * batch.num_rows, pa.string()),
                "val": batch.column("dst"),
            }
        )

    both = labels.map_batches(tag_labels, batch_format="pyarrow").union(
        edges.map_batches(tag_edges, batch_format="pyarrow")
    )

    def emit_candidates(rows: List[dict]) -> List[dict]:
        lab = None
        dsts = []
        for r in rows:
            if r["kind"] == "l":
                lab = r["val"]
            else:
                dsts.append(r["val"])
        node = rows[0]["key"]
        out = [{"node": node, "label": lab if lab is not None else node}]
        if lab is not None:
            out.extend({"node": d, "label": lab} for d in dsts)
        return out

    from uk_address_matcher_ray.stages.grouped import grouped_map

    return (
        grouped_map(both, "key", emit_candidates, LABEL_SCHEMA)
        .groupby("node")
        .min("label")
        .map_batches(
            lambda t: t.rename_columns(["node", "label"]),
            batch_format="pyarrow",
        )
    )


def _discover_nodes(edges):
    """Distributed per-block distinct + driver unique -> SORTED node array
    (lexicographic rank order). Returns None when there are no nodes."""
    import pyarrow.compute as pc
    import ray

    node_schema = pa.schema([pa.field("node", pa.string())])

    def distinct_src(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return node_schema.empty_table()
        return pa.table(
            {"node": pc.unique(batch.column("src")).cast(pa.string())}
        )

    parts = ray.get(
        edges.map_batches(distinct_src, batch_format="pyarrow").to_arrow_refs()
    )
    # empty input blocks can pass through map_batches without invoking the
    # UDF, arriving as zero-column tables — drop them before concat
    parts = [t for t in parts if "node" in t.schema.names and t.num_rows > 0]
    if not parts:
        return None
    nodes_arr = pc.unique(pa.concat_tables(parts).column("node"))
    if len(nodes_arr) == 0:
        return None
    return nodes_arr.take(pc.sort_indices(nodes_arr))


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

    from uk_address_matcher_ray.util import get_broadcast

    n_nodes = len(nodes_arr)

    # --- one-time int32 edge encoding (rank = position in sorted array) ---
    nodes_ref = ray.put(nodes_arr)

    int_edge_schema = pa.schema([pa.field("s", pa.int32()), pa.field("d", pa.int32())])

    def encode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return int_edge_schema.empty_table()
        nodes = get_broadcast(nodes_ref)
        s = pc.index_in(batch.column("src"), value_set=nodes).cast(pa.int32())
        d = pc.index_in(batch.column("dst"), value_set=nodes).cast(pa.int32())
        return pa.table({"s": s, "d": d})

    # edges arrive pre-repartitioned (propagate_labels) — ~one block per
    # CPU, so index_in builds its value-set hash table once per block, not
    # once per tiny upstream block
    int_edges = edges.map_batches(encode, batch_format="pyarrow").materialize()

    int_max = np.iinfo(np.int64).max
    labels = np.arange(n_nodes, dtype=np.int64)
    for it in range(max_iters):
        lab_ref = ray.put(labels)

        def partial_min(batch: pa.Table) -> pa.Table:
            lab = get_broadcast(lab_ref)
            s = batch.column("s").to_numpy()
            d = batch.column("d").to_numpy()
            out = np.full(len(lab), int_max, dtype=np.int64)
            np.minimum.at(out, d, lab[s])
            idx = np.nonzero(out != int_max)[0]
            return pa.table({"i": pa.array(idx), "v": pa.array(out[idx])})

        acc = labels.copy()
        for t in ray.get(
            int_edges.map_batches(partial_min, batch_format="pyarrow").to_arrow_refs()
        ):
            if t.num_rows == 0 or "i" not in t.schema.names:
                continue
            np.minimum.at(acc, t.column("i").to_numpy(), t.column("v").to_numpy())
        # pointer compression: labels point within the component, so
        # composing them is safe and flattens chains without extra rounds
        while True:
            nxt = acc[acc]
            if np.array_equal(nxt, acc):
                break
            acc = nxt
        if checkpoint_dir is not None:
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
        if np.array_equal(acc, labels):
            break
        labels = acc

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
    (``{dir}/round={k}/``) so a failed run resumes from the last round.
    """
    import ray

    edges = edges_ds.materialize()

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

    nodes_arr = _discover_nodes(edges)
    if nodes_arr is None:
        return ray.data.from_arrow(LABEL_SCHEMA.empty_table())
    if len(nodes_arr) <= broadcast_threshold:
        return _broadcast_propagate(edges, nodes_arr, max_iters, checkpoint_dir)
    labels = _init_labels(edges).materialize()
    prev_sum = None
    for it in range(max_iters):
        new_labels = _distributed_round(labels, edges)
        if checkpoint_dir is not None:
            new_labels.write_parquet(f"{checkpoint_dir}/round={it}")
            new_labels = ray.data.read_parquet(f"{checkpoint_dir}/round={it}")
        else:
            new_labels = new_labels.materialize()
        # convergence check: order-independent checksum computed by one tiny
        # task per already-materialized block (no extra Dataset job/shuffle)
        new_sum = sum(
            ray.get([_crc_block.remote(r) for r in new_labels.to_arrow_refs()])
        )
        labels = new_labels
        if prev_sum is not None and prev_sum == new_sum:
            break
        prev_sum = new_sum
    return labels


import ray as _ray


@_ray.remote
def _crc_block(tbl: pa.Table) -> int:
    import zlib

    if "node" not in tbl.schema.names:  # empty passthrough block
        return 0
    s = 0
    for n, l in zip(tbl.column("node").to_pylist(), tbl.column("label").to_pylist()):
        s = (s + zlib.crc32(f"{n}\x1f{l}".encode())) % (1 << 61)
    return s
