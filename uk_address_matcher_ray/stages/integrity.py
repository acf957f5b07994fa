"""Referential-integrity coverage — the cross-table data-quality sweep
run before any join-dependent pipeline ships: how many child rows/keys
actually resolve against the parent table, and how many are orphans.

Contract (mirrored by ``fk_coverage_sql``): one summary row —

* ``n_child_rows``  — child rows with a non-NULL key (NULL keys are
  excluded from every count; stated, matching COUNT semantics),
* ``n_child_keys``  — distinct non-NULL child keys,
* ``n_matched_keys`` / ``n_orphan_keys`` — split of those by parent
  membership,
* ``n_orphan_rows`` — child rows whose key has no parent.

Scale shape: the decontam/incremental-dedup TAGGED-UNION anti-join —
no broadcast, no driver key state: the child side pre-aggregates
(key, rows) per batch, the parent side emits per-batch distinct keys,
both ride ONE grouped exchange keyed on the key value; the group
kernel sees a complete key's rows and reduces it to five integers,
summed by a second skinny exchange.  Key VALUES ride the shuffle once
(they are the join identity); payloads never do.
"""

from __future__ import annotations

import pyarrow as pa


def fk_coverage(child, parent, child_key: str, parent_key: str):
    """-> Dataset with ONE row: (n_child_rows, n_child_keys,
    n_matched_keys, n_orphan_keys, n_orphan_rows)."""
    import ray

    from uk_address_matcher_ray.stages.grouped import grouped_map

    def child_partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.drop_null()
            .group_by(child_key)
            .aggregate([(child_key, "count")])
        )
        return pa.table(
            {
                "k": t.column(child_key).cast(pa.int64()),
                "rows_": t.column(f"{child_key}_count").cast(pa.int64()),
                "side": pa.array([1] * t.num_rows, pa.int64()),
            }
        )

    def parent_partial(batch: pa.Table) -> pa.Table:
        u = batch.column(parent_key).combine_chunks().drop_null().unique()
        return pa.table(
            {
                "k": u.cast(pa.int64()),
                "rows_": pa.array([0] * len(u), pa.int64()),
                "side": pa.array([0] * len(u), pa.int64()),
            }
        )

    tagged = child.select_columns([child_key]).map_batches(
        child_partial, batch_format="pyarrow"
    ).union(
        parent.select_columns([parent_key]).map_batches(
            parent_partial, batch_format="pyarrow"
        )
    )

    part_schema = pa.schema(
        [
            pa.field("rows", pa.int64()),
            pa.field("keys", pa.int64()),
            pa.field("matched", pa.int64()),
            pa.field("orphan_keys", pa.int64()),
            pa.field("orphan_rows", pa.int64()),
        ]
    )

    def kernel(tbl: pa.Table) -> pa.Table:
        import numpy as np

        # vectorized: int-code the keys, exact int64 scatter-add of the
        # per-(key,batch) child counts, parent presence as a bool scatter
        k = tbl.column("k").to_numpy(zero_copy_only=False)
        r = tbl.column("rows_").to_numpy(zero_copy_only=False)
        s = tbl.column("side").to_numpy(zero_copy_only=False)
        u, codes = np.unique(k, return_inverse=True)
        cr = np.zeros(len(u), np.int64)
        np.add.at(cr, codes, r)
        hasp = np.zeros(len(u), bool)
        hasp[codes[s == 0]] = True
        child = cr > 0  # parent-only keys drop
        orphan = child & ~hasp
        return pa.table(
            {
                "rows": pa.array([int(cr[child].sum())], pa.int64()),
                "keys": pa.array([int(child.sum())], pa.int64()),
                "matched": pa.array([int((child & hasp).sum())], pa.int64()),
                "orphan_keys": pa.array([int(orphan.sum())], pa.int64()),
                "orphan_rows": pa.array([int(cr[orphan].sum())], pa.int64()),
            }
        )

    parts = grouped_map(tagged, "k", None, part_schema, fn_table=kernel)
    # ONE collect of the 1-row-per-task partials (five .sum() calls were
    # five whole Dataset jobs on ~task-count rows)
    part_tbls = [
        t
        for t in ray.get(parts.materialize().to_arrow_refs())
        if t.num_rows
    ]
    if part_tbls:
        all_parts = pa.concat_tables(part_tbls)
        agg = {
            c: int(
                pa.compute.sum(all_parts.column(c)).as_py() or 0
            )
            for c in part_schema.names
        }
    else:
        agg = {c: 0 for c in part_schema.names}
    return ray.data.from_arrow(
        pa.table(
            {
                "n_child_rows": pa.array([agg["rows"]], pa.int64()),
                "n_child_keys": pa.array([agg["keys"]], pa.int64()),
                "n_matched_keys": pa.array([agg["matched"]], pa.int64()),
                "n_orphan_keys": pa.array([agg["orphan_keys"]], pa.int64()),
                "n_orphan_rows": pa.array([agg["orphan_rows"]], pa.int64()),
            }
        )
    )


def fk_coverage_sql(
    child: str, parent: str, child_key: str, parent_key: str
) -> str:
    """DuckDB mirror: grouped child keys LEFT JOIN distinct parent keys."""
    return f"""
WITH ck AS (
    SELECT {child_key} AS k, count(*) AS rows_
    FROM {child} WHERE {child_key} IS NOT NULL GROUP BY {child_key}
),
pk AS (
    SELECT DISTINCT {parent_key} AS k
    FROM {parent} WHERE {parent_key} IS NOT NULL
)
SELECT CAST(coalesce(SUM(ck.rows_), 0) AS BIGINT) AS n_child_rows,
       CAST(count(*) AS BIGINT) AS n_child_keys,
       CAST(coalesce(SUM(CASE WHEN pk.k IS NOT NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_matched_keys,
       CAST(coalesce(SUM(CASE WHEN pk.k IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_orphan_keys,
       CAST(coalesce(SUM(CASE WHEN pk.k IS NULL THEN ck.rows_ ELSE 0 END), 0)
            AS BIGINT) AS n_orphan_rows
FROM ck LEFT JOIN pk ON pk.k = ck.k
"""
