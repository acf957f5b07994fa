"""Quality classifier (stages/classifier.py) vs a local numpy reference;
driver oracle covers sf0.01 bit-exactness vs the unrolled-GD DuckDB CTE."""

import numpy as np
import pyarrow as pa
import ray

from uk_address_matcher_ray.stages.classifier import (
    _features,
    _sigmoid,
    classifier_scores,
    quality_classifier,
    train_quality_classifier,
)


def _corpus(n=300):
    import random

    rng = random.Random(5)
    good = ["the", "of", "and", "to", "in", "science", "history"]
    bad = ["zzz", "click", "buy", "free", "casino", "xxx"]
    rows = []
    for i in range(n):
        curated = i % 3 != 0
        vocab = good if curated else bad
        text = " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 30)))
        rows.append((i, text, int(curated)))
    rows.append((n, "", 0))  # empty doc exercises the zero-token row
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "is_curated": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _local_train(tbl, dim=16, iters=3, lr=1.0):
    X = _features(tbl.column("text").to_pylist(), dim)
    y = np.asarray(tbl.column("is_curated").to_pylist(), dtype=np.float64)
    w = np.zeros(dim + 1)
    for _ in range(iters):
        w = w - lr * (X.T @ (_sigmoid(X @ w) - y)) / len(y)
    return w, X


def test_distributed_gd_matches_local():
    tbl = _corpus()
    w_local, X = _local_train(tbl)
    for parts in (1, 5):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        w = train_quality_classifier(ds, "is_curated")
        # partial-sum order differs from the single matmul only in float
        # association — must agree to ~1e-12
        assert np.allclose(w, w_local, atol=1e-12)


def test_scores_match_and_separate():
    tbl = _corpus()
    w_local, X = _local_train(tbl)
    ds = ray.data.from_arrow(tbl)
    out = quality_classifier(ds, label_col="is_curated").take_all()
    got = {r["doc_id"]: r["quality_score"] for r in out}
    expect = _sigmoid(X @ w_local)
    y = tbl.column("is_curated").to_pylist()
    assert len(got) == tbl.num_rows
    for i in range(tbl.num_rows):
        assert got[i] == round(float(np.round(expect[i], 6)), 6) or abs(
            got[i] - expect[i]
        ) < 2e-6
    # disjoint vocab: the classifier must separate the classes
    pos = [got[i] for i in range(tbl.num_rows) if y[i] == 1]
    neg = [got[i] for i in range(tbl.num_rows) if y[i] == 0]
    assert min(pos) > max(n for n, i in zip(neg, range(len(neg)))) - 1e-9 or (
        sum(pos) / len(pos) > sum(neg) / len(neg) + 0.1
    )


def test_scores_with_given_weights():
    tbl = _corpus(50)
    w = np.linspace(-1, 1, 17)
    ds = ray.data.from_arrow(tbl)
    out = classifier_scores(ds, w).take_all()
    X = _features(tbl.column("text").to_pylist(), 16)
    expect = np.round(_sigmoid(X @ w), 6)
    got = {r["doc_id"]: r["quality_score"] for r in out}
    for i in range(tbl.num_rows):
        assert got[i] == expect[i]
