"""Hashed-feature logistic-regression quality classifier.

The GPT-3 / PaLM data pipelines score every document with a small linear
classifier over hashed token features (GPT-3 appendix A: logistic
regression on hashed features, trained to separate curated text from raw
Common Crawl) and keep / re-weight documents by that score. This module
trains and applies exactly that shape on the engine:

* **Features**: the hashing trick — token ``t`` increments bucket
  ``int(md5(t)[:8], 16) % dim``; the vector is count-normalized by the
  doc's token count, with a constant 1.0 bias slot appended. md5 keeps
  the DuckDB oracle able to compute the identical buckets
  (``CAST('0x' || substr(md5(t),1,8) AS UBIGINT) % dim``); per-batch
  token->bucket memoization makes the md5 cost per DISTINCT token, not
  per occurrence.
* **Training**: deterministic full-batch gradient descent — each
  iteration is ONE streaming ``map_batches`` pass emitting the batch's
  partial gradient sum (a (dim+1)-vector + row count), combined on the
  driver (same partial-sum shape as similarity.train_centroids, so the
  driver state is dim-sized, never data-sized). No RNG, no sampling:
  the model is a pure function of the corpus, reproducible at any
  parallelism — and SQL-mirrorable by unrolling the iterations as CTEs.
* **Scoring**: one zero-shuffle row-local pass against the broadcast
  weight vector.

Scale shape: ``iters + 1`` streaming passes, zero shuffles anywhere; at
100 TB switch the full-batch gradient to a fixed deterministic
hash-sample of rows (stages/sampling.py) — the estimator changes, the
plumbing does not.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

from uk_address_matcher_ray.stages.dedup import _tokens

# per-process token -> bucket memo (vocab repeats heavily across batches)
_BUCKET_MEMO: dict = {}


def _bucket(tok: str, dim: int) -> int:
    key = (tok, dim)
    b = _BUCKET_MEMO.get(key)
    if b is None:
        b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim
        _BUCKET_MEMO[key] = b
    return b


def _features(texts, dim: int) -> np.ndarray:
    """(n, dim+1) float64: normalized hashed-bucket counts + bias 1.0."""
    X = np.zeros((len(texts), dim + 1), dtype=np.float64)
    X[:, dim] = 1.0
    for r, text in enumerate(texts):
        toks = _tokens(text)
        if not toks:
            continue
        for t in toks:
            X[r, _bucket(t, dim)] += 1.0
        X[r, :dim] /= len(toks)
    return X


def _sigmoid(m):
    return 1.0 / (1.0 + np.exp(-m))


def train_quality_classifier(
    ds,
    label_col: str,
    text_col: str = "text",
    dim: int = 16,
    iters: int = 3,
    lr: float = 1.0,
) -> np.ndarray:
    """-> weight vector (dim+1,) after ``iters`` full-batch GD steps from
    w=0. ``label_col`` holds 0/1 (or bool) targets."""
    import ray

    w = np.zeros(dim + 1, dtype=np.float64)
    for _ in range(iters):
        wref = ray.put(w)

        def partial_grad(batch: pa.Table) -> pa.Table:
            wv = ray.get(wref)
            X = _features(batch.column(text_col).to_pylist(), dim)
            y = np.asarray(
                batch.column(label_col).to_pylist(), dtype=np.float64
            )
            resid = _sigmoid(X @ wv) - y
            return pa.table(
                {
                    "g": pa.array([list(X.T @ resid)], pa.list_(pa.float64())),
                    "n": pa.array([len(y)], pa.int64()),
                }
            )

        parts = ds.map_batches(
            partial_grad, batch_format="pyarrow", batch_size=4096
        ).take_all()
        g = np.zeros(dim + 1, dtype=np.float64)
        n = 0
        for r in parts:
            g += np.asarray(r["g"])
            n += r["n"]
        if n:
            w = w - lr * (g / n)
    return w


def classifier_scores(
    ds,
    w: np.ndarray,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: Optional[int] = 6,
):
    """-> Dataset(id, quality_score): sigmoid(w . x) per doc, row-local
    against the broadcast weights."""
    import pyarrow.compute as pc
    import ray

    dim = len(w) - 1
    wref = ray.put(np.asarray(w, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        wv = ray.get(wref)
        X = _features(batch.column(text_col).to_pylist(), dim)
        s = pa.array(_sigmoid(X @ wv), pa.float64())
        if round_digits is not None:
            s = pc.round(s, ndigits=round_digits)
        return pa.table({id_col: batch.column(id_col), "quality_score": s})

    return ds.map_batches(score, batch_format="pyarrow")


def quality_classifier(
    ds,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 16,
    iters: int = 3,
    lr: float = 1.0,
):
    """Train on ``ds`` then score every row. -> Dataset(id, quality_score)."""
    w = train_quality_classifier(
        ds, label_col, text_col=text_col, dim=dim, iters=iters, lr=lr
    )
    return classifier_scores(ds, w, id_col=id_col, text_col=text_col)
