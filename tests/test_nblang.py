"""Naive Bayes language classifier (stages/nblang.py) vs a brute-force
big-float reference and a planted-separation sanity check.  Driver-shape
DuckDB parity runs in tests/test_entry_queries.py."""

from __future__ import annotations

import math

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from uk_address_matcher_ray.stages.nblang import (
    SMOOTH_A,
    _grams,
    nb_lang_id,
)

_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("lang", pa.string()),
        pa.field("text", pa.string()),
    ]
)


def _ds(rows, blocks=3):
    from uk_address_matcher_ray.util import dataset_from_table

    return dataset_from_table(
        pa.Table.from_pylist(rows, schema=_SCHEMA), target_blocks=blocks
    )


def _brute(rows, a=SMOOTH_A):
    counts: dict = {}
    totals: dict = {}
    priors: dict = {}
    vocab = set()
    for r in rows:
        priors[r["lang"]] = priors.get(r["lang"], 0) + 1
        for g in _grams(r["text"]):
            counts[(r["lang"], g)] = counts.get((r["lang"], g), 0) + 1
            totals[r["lang"]] = totals.get(r["lang"], 0) + 1
            vocab.add(g)
    V = len(vocab)
    n = sum(priors.values())
    out = {}
    for r in rows:
        grams = _grams(r["text"])
        if not grams:
            out[r["doc_id"]] = (None, None)
            continue
        best = None
        for lg in sorted(priors):
            tot = totals.get(lg, 0)
            terms = [math.log(priors[lg] / n)]
            terms += [
                math.log((counts.get((lg, g), 0) + a) / (tot + a * V))
                for g in grams
            ]
            s = round(math.fsum(terms), 6)
            if best is None or s > best[1]:
                best = (lg, s)
        out[r["doc_id"]] = best
    return out


@pytest.mark.usefixtures("ray_session")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["en", "fr", "de"]),
            st.text(alphabet="ab x", max_size=20),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_nb_lang_property(data, ):
    rows = [
        {"doc_id": i, "lang": lg, "text": t} for i, (lg, t) in enumerate(data)
    ]
    got = {
        r["doc_id"]: (r["pred_lang"], r["score"])
        for r in nb_lang_id(_ds(rows)).take_all()
    }
    assert got == _brute(rows)


@pytest.mark.usefixtures("ray_session")
def test_nb_lang_separation():
    """Clearly separated bigram distributions classify held-in docs
    correctly; empty/1-char docs predict NULL."""
    rows = []
    for i in range(10):
        rows.append({"doc_id": i, "lang": "en", "text": "the quick brown fox jumps"})
        rows.append({"doc_id": 100 + i, "lang": "fr", "text": "le renard brun rapide saute"})
    rows.append({"doc_id": 500, "lang": "en", "text": ""})
    rows.append({"doc_id": 501, "lang": "en", "text": "x"})
    got = {r["doc_id"]: r["pred_lang"] for r in nb_lang_id(_ds(rows)).take_all()}
    assert all(got[i] == "en" for i in range(10))
    assert all(got[100 + i] == "fr" for i in range(10))
    assert got[500] is None and got[501] is None


def test_predict_vectorized_matches_scalar_reference():
    """The ASCII byte-pair fast path and the non-ASCII fallback must both
    equal the naive per-gram formula (same log args, same fsum order,
    same round-6 + first-wins argmax)."""
    import math

    import pyarrow as pa
    import ray

    from uk_address_matcher_ray.stages.nblang import (
        _grams,
        nb_lang_assets,
        nb_lang_predict,
        SMOOTH_A,
    )

    train = pa.table(
        {
            "lang": ["en", "en", "fr", "fr", "de"],
            "text": [
                "the cat sat", "a hat that", "le chat", "la tête été",
                "straße über",
            ],
        }
    )
    score_rows = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": [
                "the hat", "le la", "tête à tête", "straße", "", None,
            ],
        }
    )
    assets = nb_lang_assets(ray.data.from_arrow(train), "lang", "text")
    got = {
        r["doc_id"]: (r["pred_lang"], r["score"])
        for r in nb_lang_predict(
            ray.data.from_arrow(score_rows), assets, "doc_id", "text"
        ).take_all()
    }
    counts, totals, priors, V, n_docs = assets
    langs = sorted(priors)
    av = SMOOTH_A * V
    for i, text in enumerate(score_rows.column("text").to_pylist()):
        grams = _grams(text)
        if not grams:
            assert got[i] == (None, None)
            continue
        best = None
        for lg in langs:
            terms = [math.log(priors[lg] / n_docs)]
            for g in grams:
                terms.append(
                    math.log(
                        (counts.get((lg, g), 0) + SMOOTH_A)
                        / (totals.get(lg, 0) + av)
                    )
                )
            s = round(math.fsum(terms), 6)
            if best is None or s > best[1]:
                best = (lg, s)
        assert got[i] == best, (i, text, got[i], best)
