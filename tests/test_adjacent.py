"""C12/C13 adjacent-record distinguishing tokens vs the reference SQL
(cleaning_steps.py:585-721) run directly in DuckDB, plus the distributed
neighbour-window version vs the single-batch kernel."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

from tests.corpus import synth_addresses
from uk_address_matcher_ray.stages.adjacent import (
    derive_adjacent_distinguishing_tokens,
    generalise_tokens,
    split_adjacent_tokens,
)

REFERENCE_SQL = """
WITH tokens AS (
    SELECT
        ['FLAT', 'APARTMENT', 'UNIT'] AS __tokens_to_remove,
        list_filter(regexp_split_to_array(address_concat, '\\s+'),
            x -> not list_contains(__tokens_to_remove, x)) AS __tokens,
        row_number() OVER (ORDER BY reverse(address_concat)) AS row_order,
        *
    FROM input_rows
),
with_neighbors AS (
    SELECT
        lag(__tokens) OVER (ORDER BY row_order) AS __prev_tokens,
        lead(__tokens) OVER (ORDER BY row_order) AS __next_tokens,
        *
    FROM tokens
),
with_suffix_lengths AS (
    SELECT
        len(__tokens) AS __token_count,
        -- duckdb 1.0 lacks correlated range(); same max-i semantics via
        -- list_filter + list_aggregate('max') (empty -> NULL, as max-over-empty)
        CASE WHEN __prev_tokens IS NOT NULL THEN
            list_aggregate(list_filter(
                range(0, least(len(__tokens), len(__prev_tokens))),
                i -> list_slice(list_reverse(__tokens), 1, i+1) =
                     list_slice(list_reverse(__prev_tokens), 1, i+1)), 'max')
        ELSE 0 END AS prev_common_suffix,
        CASE WHEN __next_tokens IS NOT NULL THEN
            list_aggregate(list_filter(
                range(0, least(len(__tokens), len(__next_tokens))),
                i -> list_slice(list_reverse(__tokens), 1, i+1) =
                     list_slice(list_reverse(__next_tokens), 1, i+1)), 'max')
        ELSE 0 END AS next_common_suffix,
        *
    FROM with_neighbors
)
SELECT unique_id,
    COALESCE(list_filter(__tokens, (token, i) ->
        i < __token_count - greatest(prev_common_suffix, next_common_suffix)),
        ARRAY[]) AS distinguishing_adj_start_tokens,
    COALESCE(list_filter(__tokens, (token, i) ->
        i >= __token_count - greatest(prev_common_suffix, next_common_suffix)),
        ARRAY[]) AS common_adj_start_tokens
FROM with_suffix_lengths
ORDER BY row_order
"""


def _input(n=120, seed=3):
    rows = [r for r in synth_addresses(n, seed=seed) if r[1] is not None]
    # reference sorts by reverse(address_concat); dedupe ties for stability
    return pa.table(
        {
            "unique_id": pa.array([r[0] for r in rows], pa.string()),
            "address_concat": pa.array(
                [r[1].upper() for r in rows], pa.string()
            ),
        }
    )


def test_kernel_matches_reference_sql():
    tbl = _input()
    con = duckdb.connect()
    con.register("input_rows", tbl)
    ref = con.sql(REFERENCE_SQL).fetchall()
    con.close()

    rows = tbl.to_pylist()
    rows.sort(key=lambda r: r["address_concat"][::-1])
    splits = split_adjacent_tokens(rows)
    got = {
        r["unique_id"]: (u, c) for r, (u, c) in zip(rows, splits)
    }
    for uid, uniq, common in ref:
        assert got[uid] == (uniq, common), (uid, got[uid], (uniq, common))


@pytest.mark.usefixtures("ray_session")
def test_distributed_matches_kernel():
    import ray

    from uk_address_matcher_ray.util import dataset_from_table

    tbl = _input(200, seed=11)
    out = derive_adjacent_distinguishing_tokens(
        dataset_from_table(tbl, target_blocks=6), bucket=16
    ).take_all()

    rows = tbl.to_pylist()
    rows.sort(key=lambda r: r["address_concat"][::-1])
    splits = split_adjacent_tokens(rows)
    expected = {r["unique_id"]: (u, c) for r, (u, c) in zip(rows, splits)}

    assert len(out) == tbl.num_rows
    for r in out:
        exp_u, exp_c = expected[r["unique_id"]]
        assert r["distinguishing_adj_start_tokens"] == exp_u, r["unique_id"]
        assert r["common_adj_start_tokens"] == exp_c, r["unique_id"]
        assert r["distinguishing_adj_token_aliases"] == generalise_tokens(exp_u)


def test_generalised_aliases():
    assert generalise_tokens(["TOP", "X", "BASEMENT"]) == [
        "UPPERFLOOR", "LEVEL", "X", "LEVEL",
    ]
