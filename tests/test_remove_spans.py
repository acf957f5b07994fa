"""remove_duplicate_spans — exact-substring REMOVAL (Lee et al. 2022).

Every k-token window shared by >= min_docs distinct docs is removed from
every doc; kept tokens re-join with single spaces. Checked against an
independent brute-force spec restatement, plus targeted edge cases
(overlapping windows, all-duplicate docs, short docs, within-doc-only
repeats)."""

import random

import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.dedup import remove_duplicate_spans


def _spec(rows, k, min_docs):
    """Brute-force restatement: dict doc_id -> (text, n_removed)."""
    toks = {d: t.split() for d, t in rows}
    span_docs: dict = {}
    for d, ts in toks.items():
        for i in range(max(len(ts) - k + 1, 0)):
            span_docs.setdefault(" ".join(ts[i : i + k]), set()).add(d)
    dups = {s for s, ds in span_docs.items() if len(ds) >= min_docs}
    out = {}
    for d, ts in toks.items():
        cut = [False] * len(ts)
        for i in range(max(len(ts) - k + 1, 0)):
            if " ".join(ts[i : i + k]) in dups:
                for j in range(i, i + k):
                    cut[j] = True
        kept = [t for t, c in zip(ts, cut) if not c]
        out[d] = (" ".join(kept), sum(cut))
    return out


def _run(rows, k=4, min_docs=2):
    import ray

    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "text": pa.array([t for _, t in rows], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    got = remove_duplicate_spans(ds, k=k, min_docs=min_docs).take_all()
    return {r["doc_id"]: (r["text"], r["n_removed"]) for r in got}


BOILER = "common licence header repeated in many documents"  # 7 tokens


@pytest.mark.usefixtures("ray_session")
def test_remove_spans_basic_and_edges():
    rows = [
        # 3 docs sharing an 8-token boilerplate block (> k=4: overlapping
        # windows must merge and remove the whole block)
        (0, BOILER + " extra alpha beta gamma delta"),
        (1, BOILER + " extra epsilon zeta eta theta"),
        (2, BOILER + " extra iota kappa lam mu"),
        # doc that is ONLY the boilerplate -> empty output text
        (3, BOILER + " extra"),
        # short doc (< k tokens) passes through re-joined
        (4, "tiny  doc"),
        # span repeated only WITHIN one doc -> kept
        (5, "solo block one two three four solo block one two three four"),
    ]
    got = _run(rows, k=4, min_docs=2)
    want = _spec(rows, 4, 2)
    assert got == want
    assert got[3] == ("", 8)  # fully removed
    assert got[4] == ("tiny doc", 0)  # whitespace normalized, untouched
    assert got[5][1] == 0  # within-doc repeat not removed
    assert "common" not in got[0][0] and "alpha" in got[0][0]


@pytest.mark.usefixtures("ray_session")
def test_remove_spans_random_property():
    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(12)]  # tiny vocab forces collisions
    rows = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for d in range(60)
    ]
    for k, min_docs in [(3, 2), (5, 3)]:
        assert _run(rows, k=k, min_docs=min_docs) == _spec(rows, k, min_docs)


@pytest.mark.usefixtures("ray_session")
def test_remove_spans_no_duplicates():
    rows = [(d, f"doc{d} a{d} has{d} own{d} tokens{d} x{d} y{d} z{d}") for d in range(5)]
    got = _run(rows, k=4, min_docs=2)
    for d, t in rows:
        assert got[d] == (" ".join(t.split()), 0)
