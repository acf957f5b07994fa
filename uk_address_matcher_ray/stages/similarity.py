"""Similarity search and embedding-space dedup over a list<float> column.

* ``brute_force_topk`` — the baseline: the (small) query matrix is broadcast
  via ``ray.put``; every batch computes a numpy block matmul and emits its
  LOCAL top-k per query (partial top-k inside map_batches — the combine is a
  tiny groupby over num_queries × k rows, never an all-to-all of scores).
* ``ivf_topk`` — the scale path: k-means-ish coarse quantizer (deterministic
  seeded init, few Lloyd iterations via Dataset aggregations), vectors
  bucketed by nearest centroid; queries probe ``nprobe`` nearest buckets so
  only those partitions are scanned.
* ``kmeans_assign`` — the quantizer exposed as a clustering operator:
  every vector labelled with its nearest trained centroid (the
  cluster-then-process primitive behind SemDeDup / cluster-balanced data
  mixing).
* ``semdedup`` — SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster
  the embeddings, then flag near-duplicates WITHIN each cluster by
  pairwise cosine — the clustering bounds the quadratic so the pairwise
  step never crosses cluster boundaries.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pyarrow as pa


def _normalized(mat):
    import numpy as np

    m = np.asarray(mat, dtype=np.float64)
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def _normalized_batch(batch: pa.Table, vec_col: str):
    """L2-normalized (n, d) float64 from a list<float> column via the flat
    values buffer — no per-row Python list materialization (same doubles as
    the to_pylist path: float32 -> float64 widening is exact)."""
    from uk_address_matcher_ray.stages.dedup import _vectors_from_table

    return _normalized(_vectors_from_table(batch, vec_col))


def _fetch_rows_by_id(ds, id_col: str, ids) -> list:
    """Rows whose id is in ``ids`` — vectorized is_in mask per batch (no
    per-row Python filter), sorted by id."""
    import pyarrow.compute as pc

    wanted = pa.array(sorted(set(ids)))

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column(id_col), value_set=wanted))

    rows = ds.map_batches(keep, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    return rows


def brute_force_topk(
    ds,
    query_ids: Sequence,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
):
    """-> Dataset(query_id, vec_id, cosine, rank) — exact top-k by cosine.

    Ties broken by vec_id ascending (deterministic)."""
    import numpy as np
    import ray

    q_rows = _fetch_rows_by_id(ds, id_col, query_ids)
    q_ids = [r[id_col] for r in q_rows]
    q_mat = _normalized([r[vec_col] for r in q_rows])
    ref = ray.put((q_ids, q_mat))

    def partial(batch: pa.Table) -> pa.Table:
        qi, qm = ray.get(ref)
        ids = batch.column(id_col).to_pylist()
        mat = _normalized_batch(batch, vec_col)
        sims = qm @ mat.T  # (nq, nb)
        out_q, out_v, out_s = [], [], []
        for a, qid in enumerate(qi):
            order = sorted(
                range(len(ids)), key=lambda j: (-sims[a, j], ids[j])
            )[: k + (0 if include_self else 1)]
            for j in order:
                if not include_self and ids[j] == qid:
                    continue
                out_q.append(qid)
                out_v.append(ids[j])
                out_s.append(float(sims[a, j]))
        t = batch.schema.field(id_col).type
        return pa.table(
            {
                "query_id": pa.array(out_q, t),
                id_col: pa.array(out_v, t),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=2048)

    def final_topk(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        rows.sort(key=lambda r: (-r["cosine"], r[id_col]))
        rows = rows[:k]
        for i, r in enumerate(rows, 1):
            r["rank"] = i
        out = pa.Table.from_pylist(rows)
        return out

    return partials.groupby("query_id").map_groups(
        final_topk, batch_format="pyarrow"
    )


def train_centroids(
    ds,
    num_centroids: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Deterministic coarse quantizer: init = vectors of the ``num_centroids``
    smallest ids; Lloyd iterations as map_batches partial-sum + tiny combine."""
    import numpy as np
    import ray

    # init = normalized vectors of the num_centroids GLOBALLY smallest ids
    # (well-defined at any block order; SQL-mirrorable: ORDER BY id LIMIT n)
    seed_rows = (
        ds.select_columns([id_col, vec_col])
        .sort(id_col)
        .limit(num_centroids)
        .take_all()
    )
    cents = _normalized([r[vec_col] for r in seed_rows])

    for _ in range(iters):
        ref = ray.put(cents)

        def partial_sums(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            mat = _normalized_batch(batch, vec_col)
            assign = np.argmax(mat @ c.T, axis=1)
            sums = np.zeros_like(c)
            counts = np.zeros(len(c), dtype=np.int64)
            for i, a in enumerate(assign):
                sums[a] += mat[i]
                counts[a] += 1
            return pa.table(
                {
                    "cid": pa.array(range(len(c)), pa.int32()),
                    "sum": pa.array([list(s) for s in sums], pa.list_(pa.float64())),
                    "count": pa.array(counts, pa.int64()),
                }
            )

        import numpy as np

        parts = ds.map_batches(
            partial_sums, batch_format="pyarrow", batch_size=4096
        ).take_all()
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.int64)
        for r in parts:
            sums[r["cid"]] += np.asarray(r["sum"])
            counts[r["cid"]] += r["count"]
        nonzero = counts > 0
        cents[nonzero] = _normalized(sums[nonzero] / counts[nonzero, None])
    return cents


def ivf_topk(
    ds,
    query_ids: Sequence,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Approximate top-k: scan only the ``nprobe`` nearest centroid buckets.

    Returns the same schema as brute_force_topk (approximate recall)."""
    import numpy as np
    import ray

    cents = train_centroids(ds, num_centroids, vec_col=vec_col, id_col=id_col)
    cref = ray.put(cents)

    def bucketize(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mat = _normalized_batch(batch, vec_col)
        assign = np.argmax(mat @ c.T, axis=1)
        return batch.append_column("__bucket", pa.array(assign, pa.int32()))

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    q_rows = _fetch_rows_by_id(ds, id_col, query_ids)
    q_mat = _normalized([r[vec_col] for r in q_rows])
    probe_buckets = set()
    q_probes = {}
    for r, qv in zip(q_rows, q_mat):
        order = np.argsort(-(cents @ qv))[:nprobe]
        q_probes[r[id_col]] = set(int(x) for x in order)
        probe_buckets.update(int(x) for x in order)

    pref = ray.put((q_rows, q_mat, q_probes))
    probe_arr = pa.array(sorted(probe_buckets), pa.int32())

    def keep_probed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.is_in(batch.column("__bucket"), value_set=probe_arr)
        )

    pruned = bucketed.map_batches(keep_probed, batch_format="pyarrow")

    def partial(batch: pa.Table) -> pa.Table:
        q_rows_, q_mat_, probes = ray.get(pref)
        ids = batch.column(id_col).to_pylist()
        buckets = batch.column("__bucket").to_pylist()
        mat = _normalized_batch(batch, vec_col)
        out_q, out_v, out_s = [], [], []
        for (qr, qv) in zip(q_rows_, q_mat_):
            qid = qr[id_col]
            sims = mat @ qv
            for j, vid in enumerate(ids):
                if buckets[j] not in probes[qid] or vid == qid:
                    continue
                out_q.append(qid)
                out_v.append(vid)
                out_s.append(float(sims[j]))
        t = batch.schema.field(id_col).type
        return pa.table(
            {
                "query_id": pa.array(out_q, t),
                id_col: pa.array(out_v, t),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    partials = pruned.map_batches(partial, batch_format="pyarrow", batch_size=2048)

    def final_topk(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        rows.sort(key=lambda r: (-r["cosine"], r[id_col]))
        rows = rows[:k]
        for i, r in enumerate(rows, 1):
            r["rank"] = i
        return pa.Table.from_pylist(rows)

    return partials.groupby("query_id").map_groups(
        final_topk, batch_format="pyarrow"
    )


def kmeans_assign(
    ds,
    num_centroids: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """-> Dataset(id, cid): each vector labelled with its nearest trained
    centroid (argmax cosine; ties -> lowest cid, numpy argmax first-max).

    Training cost is ``iters`` streaming passes of partial-sum
    aggregations (train_centroids); assignment is one row-local
    map_batches against the broadcast (num_centroids × dim) matrix —
    zero shuffles, so the operator scales as pure map parallelism."""
    import numpy as np
    import ray

    cents = train_centroids(
        ds, num_centroids, iters=iters, vec_col=vec_col, id_col=id_col
    )
    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mat = _normalized_batch(batch, vec_col)
        a = np.argmax(mat @ c.T, axis=1)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cid": pa.array(a, pa.int32()),
            }
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pyarrow"
    )


def semdedup(
    ds,
    threshold: float = 0.9,
    num_centroids: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tile_rows: int = 1024,
):
    """SemDeDup (Abbas et al. 2023): cluster embeddings with the coarse
    k-means quantizer, then WITHIN each cluster flag every vector whose
    cosine to a SMALLER-id cluster-mate reaches ``threshold`` (the
    deterministic keep-lowest-id form of the paper's greedy pass).

    -> Dataset(id, cid, max_cos_smaller, is_dup); ``max_cos_smaller`` is
    null for the cluster's lowest id (nothing to compare against).

    Scale shape: ONE exchange keyed on the int32 cluster id (rows carry
    id + vector, nothing else); the per-cluster pairwise step runs in
    ``tile_rows``-row tiles so peak memory is tile × cluster, not
    cluster². Cluster sizes bound the quadratic — that is SemDeDup's
    own design; at corpus scale pick num_centroids so the expected
    cluster fits a task (the paper uses 50k clusters for LAION), and
    sub-shard any residual hot cluster the same way block.py salts hot
    blocking keys."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    cents = train_centroids(
        ds, num_centroids, iters=iters, vec_col=vec_col, id_col=id_col
    )
    cref = ray.put(cents)

    def bucketize(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mat = _normalized_batch(batch, vec_col)
        a = np.argmax(mat @ c.T, axis=1)
        return pa.table(
            {
                id_col: batch.column(id_col),
                vec_col: batch.column(vec_col),
                "cid": pa.array(a, pa.int32()),
            }
        )

    bucketed = ds.select_columns([id_col, vec_col]).map_batches(
        bucketize, batch_format="pyarrow"
    )

    def per_cluster(group: pa.Table) -> pa.Table:
        g = group.take(pc.sort_indices(group.column(id_col)))
        n = g.num_rows
        mat = _normalized_batch(g, vec_col)
        maxp = np.full(n, -np.inf)
        for s in range(0, n, tile_rows):
            e = min(s + tile_rows, n)
            sims = mat[s:e] @ mat[:e].T  # rows s..e vs every id-rank < e
            rows = np.arange(s, e)[:, None]
            cols = np.arange(e)[None, :]
            np.copyto(sims, -np.inf, where=cols >= rows)
            if e:
                maxp[s:e] = sims.max(axis=1)
        has_prior = np.isfinite(maxp)
        return pa.table(
            {
                id_col: g.column(id_col),
                "cid": g.column("cid"),
                "max_cos_smaller": pc.round(
                    pa.array(
                        np.where(has_prior, maxp, 0.0),
                        pa.float64(),
                        mask=~has_prior,
                    ),
                    ndigits=6,
                ),
                "is_dup": pa.array(maxp >= threshold),
            }
        )

    return bucketed.groupby("cid").map_groups(
        per_cluster, batch_format="pyarrow"
    )
