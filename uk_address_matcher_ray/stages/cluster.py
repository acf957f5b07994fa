"""Distributed transitive closure: groupby-min label propagation.

The reference has no clustering (its closest analogue is best-match-per-group
selection); the north rule requires connected components over thresholded
pairs. Implemented as the classic iterative min-label propagation over a
Dataset of edges:

    labels(v) = min(v, min over neighbours u of labels(u))

iterated to fixed point. Each round is two hash shuffles (attach labels to
edge endpoints via a union+groupby join, then groupby(node).min(label));
rounds converge in O(component diameter) — tiny for entity-resolution
clusters (star-shaped around canonical records).

Labels are the lexicographic min of member unique_ids (deterministic).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

EDGE_SCHEMA = pa.schema(
    [pa.field("src", pa.string()), pa.field("dst", pa.string())]
)
LABEL_SCHEMA = pa.schema(
    [pa.field("node", pa.string()), pa.field("label", pa.string())]
)


def edges_from_pairs(pairs_ds, threshold: float, l_prefix: str = "c_", r_prefix: str = "m_"):
    """Thresholded pair rows -> undirected edge list (both directions).

    Node ids are prefixed per side so messy and canonical id spaces cannot
    collide (the reference keeps sides distinct via source_dataset aliases).
    """

    def emit(batch: pa.Table) -> pa.Table:
        mw = batch.column("match_weight").to_pylist()
        l = batch.column("unique_id_l").to_pylist()
        r = batch.column("unique_id_r").to_pylist()
        src, dst = [], []
        for w, a, b in zip(mw, l, r):
            if w is not None and w >= threshold:
                a2, b2 = l_prefix + a, r_prefix + b
                src += [a2, b2]
                dst += [b2, a2]
        return pa.table(
            {"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())}
        )

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


def propagate_labels(
    edges_ds,
    max_iters: int = 25,
    checkpoint_dir: Optional[str] = None,
    num_partitions: Optional[int] = None,
):
    """-> Dataset(node, label) of connected components.

    ``checkpoint_dir``: when set, labels are written per round
    (``{dir}/round={k}/``) so a failed run resumes from the last round.
    """
    # edges are consumed every round: pin them once. Partition count scales
    # with the edge volume (≈64k edges per partition), clamped to the
    # cluster CPU count — a fixed width would cap parallelism on a big
    # cluster, while small edge lists stay in few blocks so the per-round
    # fixed shuffle overhead doesn't multiply.
    import ray

    edges = edges_ds.materialize()
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = min(max(1, edges.count() // 65536), max(8, cpus))
        num_partitions = max(num_partitions, 1)
    edges = edges.repartition(num_partitions).materialize()
    labels = _init_labels(edges)
    prev_sum = None

    for it in range(max_iters):  # noqa: B007
        # join: union labels (kind=l) with edges keyed by src (kind=e), group
        # by node; emit candidate labels (dst, label_of_src) + own labels.
        # (benchmarked against Ray's native hash join — the tagged-union
        # grouped_map is faster here and keeps one code path.)
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

        def emit_candidates(rows):
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

        new_labels = (
            grouped_map(both, "key", emit_candidates, LABEL_SCHEMA)
            .groupby("node")
            .min("label")
            .map_batches(
                lambda t: t.rename_columns(["node", "label"]),
                batch_format="pyarrow",
            )
        )

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

    s = 0
    for n, l in zip(tbl.column("node").to_pylist(), tbl.column("label").to_pylist()):
        s = (s + zlib.crc32(f"{n}\x1f{l}".encode())) % (1 << 61)
    return s
