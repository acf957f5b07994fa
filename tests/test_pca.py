"""Integer-domain power-iteration PCA (stages/pca.py) vs a brute-force
big-int reference, partitioning invariance, and sanity on a planted
dominant direction.  Driver-shape DuckDB parity runs in
tests/test_entry_queries.py."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from uk_address_matcher_ray.stages.pca import Q, _tdiv, embedding_pca


def _ds(vecs, blocks=3):
    from uk_address_matcher_ray.util import dataset_from_table

    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                pa.list_(pa.float32()),
            ),
        }
    )
    return dataset_from_table(tbl, target_blocks=blocks)


def _brute(vecs, iters=4):
    n, dim = len(vecs), len(vecs[0])
    f64 = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    q = [[int(x) for x in row] for row in np.floor(f64 * Q + 0.5).astype(np.int64)]
    A = [[sum(q[r][i] * q[r][j] for r in range(n)) for j in range(dim)] for i in range(dim)]
    S = [sum(q[r][i] for r in range(n)) for i in range(dim)]
    M = [[n * A[i][j] - S[i] * S[j] for j in range(dim)] for i in range(dim)]
    x = [Q] * dim
    for _ in range(iters):
        y = [sum(M[i][j] * x[j] for j in range(dim)) for i in range(dim)]
        m = max(max(abs(c) for c in y), 1)
        x = [_tdiv(c * Q, m) for c in y]
    return {r: sum(q[r][i] * x[i] for i in range(dim)) for r in range(n)}


@pytest.mark.usefixtures("ray_session")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(-4, 4, allow_nan=False, width=32),
            min_size=3,
            max_size=3,
        ),
        min_size=1,
        max_size=25,
    )
)
def test_embedding_pca_property(vecs):
    got = {
        r["vec_id"]: r["pc1_proj"] for r in embedding_pca(_ds(vecs)).take_all()
    }
    assert got == _brute(vecs)


@pytest.mark.usefixtures("ray_session")
def test_embedding_pca_partitioning_and_direction():
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 6))
    base[:, 0] *= 25.0  # plant the dominant axis on dim 0
    vecs = base.astype(np.float32).tolist()
    a = {
        r["vec_id"]: r["pc1_proj"]
        for r in embedding_pca(_ds(vecs, blocks=2)).take_all()
    }
    b = {
        r["vec_id"]: r["pc1_proj"]
        for r in embedding_pca(_ds(vecs, blocks=7)).take_all()
    }
    assert a == b, "projection must be partitioning-invariant"
    # projections must track the planted axis (up to overall sign)
    proj = np.array([a[i] for i in range(len(vecs))], dtype=np.float64)
    axis = np.asarray(vecs, dtype=np.float64)[:, 0]
    axis = axis - axis.mean()
    corr = np.corrcoef(proj, axis)[0, 1]
    assert abs(corr) > 0.99, corr
    # degenerate: all-identical vectors (M == 0, the max(...,1) guard)
    same = [[1.5, -2.25, 0.5]] * 5
    out = embedding_pca(_ds(same)).take_all()
    assert len(out) == 5 and len({r["pc1_proj"] for r in out}) == 1
