"""Hot-key-safe chunked asof_join vs the monolithic complete-group path.

The chunked path's correctness hinges on the cross-block carry (one right
row per boundary); to force real block boundaries the tests shrink
``target_max_block_size`` so the sorted union spans many blocks — a
single giant key then exercises the carry chain across blocks.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.joins import asof_join, asof_join_chunked


def _mk(rng, n_left, n_right, n_keys):
    left = pa.table(
        {
            "user_id": pa.array(
                [rng.randint(1, n_keys) for _ in range(n_left)], pa.int64()
            ),
            "ts": pa.array(
                [rng.randint(0, 5000) for _ in range(n_left)], pa.int64()
            ),
            "event_id": pa.array(list(range(n_left)), pa.int64()),
        }
    )
    right = pa.table(
        {
            "user_id": pa.array(
                [rng.randint(1, n_keys) for _ in range(n_right)], pa.int64()
            ),
            "ts": pa.array(
                [rng.randint(0, 5000) for _ in range(n_right)], pa.int64()
            ),
            "price": pa.array(
                [rng.randint(0, 999) for _ in range(n_right)], pa.int64()
            ),
            "rid": pa.array(list(range(n_right)), pa.int64()),
        }
    )
    return left, right


def _run(fn, left, right, **kw):
    import ray

    from uk_address_matcher_ray.util import dataset_from_table

    out = fn(
        dataset_from_table(left, target_blocks=8),
        dataset_from_table(right, target_blocks=8),
        key="user_id",
        ts="ts",
        right_cols=["price", "rid"],
        right_tiebreak="rid",
        **kw,
    )
    return sorted(map(repr, out.take_all()))


@pytest.mark.usefixtures("ray_session")
def test_chunked_asof_matches_monolithic_small_blocks():
    import ray

    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 8 * 1024  # force many sorted blocks
    try:
        rng = random.Random(9)
        # multi-key
        left, right = _mk(rng, 3000, 1500, 25)
        assert _run(asof_join_chunked, left, right) == _run(
            asof_join, left, right
        )
        # one giant key: every block continues the same key; carry chains
        left2, right2 = _mk(rng, 4000, 40, 1)
        a = _run(asof_join_chunked, left2, right2)
        b = _run(asof_join, left2, right2)
        assert a == b and len(a) > 0
        # rights-before-all-lefts and lefts-before-all-rights edges
        left3 = pa.table(
            {
                "user_id": pa.array([1, 1, 2, 2], pa.int64()),
                "ts": pa.array([0, 100, 0, 100], pa.int64()),
                "event_id": pa.array([0, 1, 2, 3], pa.int64()),
            }
        )
        right3 = pa.table(
            {
                "user_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array([50, 200], pa.int64()),
                "price": pa.array([7, 9], pa.int64()),
                "rid": pa.array([0, 1], pa.int64()),
            }
        )
        assert _run(asof_join_chunked, left3, right3) == _run(
            asof_join, left3, right3
        )
    finally:
        ctx.target_max_block_size = old


@pytest.mark.usefixtures("ray_session")
def test_chunked_asof_default_blocks():
    rng = random.Random(21)
    left, right = _mk(rng, 800, 400, 10)
    assert _run(asof_join_chunked, left, right) == _run(asof_join, left, right)
