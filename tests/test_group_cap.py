"""Per-group cap (stages/sampling.group_cap): DuckDB-oracle parity,
partition invariance, cap semantics, hot-group boundedness."""

import duckdb
import pyarrow as pa

from uk_address_matcher_ray.stages.sampling import group_cap, group_cap_sql

CAP = 3

_KEY = lambda t: (t[0] is None, t[0] or "", t[1])  # noqa: E731


def _corpus(n=240):
    langs = ["en", "de", "fr", None]
    # skewed: half the rows land in 'en' (the hot group)
    rows = [(i, langs[0] if i % 2 == 0 else langs[(i % 7) % 4]) for i in range(n)]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array(["x"] * len(rows), pa.string()),
        }
    )


def _run(tbl, parts):
    import ray

    ds = ray.data.from_arrow(tbl).repartition(parts)
    out = group_cap(ds, CAP).take_all()
    return sorted(
        ((r["lang"], r["doc_id"], r["sample_key"]) for r in out), key=_KEY
    )


def test_matches_duckdb_oracle(ray_session):
    tbl = _corpus()
    got = _run(tbl, 6)
    con = duckdb.connect()
    con.register("documents", tbl)
    ora = sorted(
        ((r[1], r[0], r[2]) for r in con.execute(group_cap_sql(CAP)).fetchall()),
        key=_KEY,
    )
    assert got == ora


def test_partition_invariant_and_cap_respected(ray_session):
    tbl = _corpus()
    a = _run(tbl, 1)
    b = _run(tbl, 13)
    assert a == b
    from collections import Counter

    per_group = Counter(lang for lang, _, _ in a)
    assert all(c <= CAP for c in per_group.values())
    # every group present in the input survives (cap selects, never drops a group)
    assert set(per_group) == {"en", "de", "fr", None}
    assert per_group["en"] == CAP  # hot group capped exactly
