"""propagate_labels_indexed (int payload-row edges, flagship fast path) must
produce labels bit-identical to edges_from_pairs + propagate_labels."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages import cluster as cmod
from uk_address_matcher_ray.stages.block import SIDE_COL, SRC_IDX_COL


def _case(n_canon=40, n_messy=60, seed=7):
    rng = np.random.default_rng(seed)
    uid = [f"https://h{i % 9}.example/c{i}" for i in range(n_canon)] + [
        f"https://h{i % 9}.example/m{i}" for i in range(n_messy)
    ]
    side = [0] * n_canon + [1] * n_messy
    payload = pa.table(
        {
            "unique_id": pa.array(uid, pa.string()),
            SIDE_COL: pa.array(side, pa.int8()),
        }
    )
    # random messy -> canonical pairs, some above and some below threshold
    m_idx = rng.integers(n_canon, n_canon + n_messy, size=120)
    c_idx = rng.integers(0, n_canon, size=120)
    mw = rng.uniform(-10, 20, size=120)
    pairs = pa.table(
        {
            "unique_id_l": pa.array([uid[i] for i in c_idx], pa.string()),
            "unique_id_r": pa.array([uid[i] for i in m_idx], pa.string()),
            "match_weight": pa.array(mw, pa.float64()),
            f"{SRC_IDX_COL}_l": pa.array(c_idx, pa.int64()),
            f"{SRC_IDX_COL}_r": pa.array(m_idx, pa.int64()),
        }
    )
    return payload, pairs


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [7, 11, 23])
def test_indexed_matches_string_path(seed):
    import ray

    payload, pairs = _case(seed=seed)
    payload_ref = ray.put(payload)
    pairs_ds = ray.data.from_arrow(pairs).repartition(3).materialize()

    labels_idx = cmod.propagate_labels_indexed(pairs_ds, 5.0, payload_ref)
    labels_str = cmod.propagate_labels(
        cmod.edges_from_pairs(pairs_ds, threshold=5.0)
    )
    a = sorted((r["node"], r["label"]) for r in labels_idx.take_all())
    b = sorted((r["node"], r["label"]) for r in labels_str.take_all())
    assert a == b
    assert len(a) > 0


@pytest.mark.usefixtures("ray_session")
def test_indexed_empty_above_threshold():
    import ray

    payload, pairs = _case()
    import pyarrow.compute as pc

    low = pairs.set_column(
        pairs.schema.get_field_index("match_weight"),
        "match_weight",
        pc.subtract(pairs.column("match_weight"), pa.scalar(1000.0)),
    )
    payload_ref = ray.put(payload)
    pairs_ds = ray.data.from_arrow(low).materialize()
    out = cmod.propagate_labels_indexed(pairs_ds, 5.0, payload_ref)
    assert out.count() == 0
