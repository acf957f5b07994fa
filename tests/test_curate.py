"""Curation pipeline (pipelines/curate.py): local-reference parity,
dedup/min-id semantics, filter correctness, partition invariance."""

import pyarrow as pa

from uk_address_matcher_ray.pipelines.curate import curate_docs
from uk_address_matcher_ray.stages.textstats import (
    char_stats,
    quality_score,
    token_count,
)


def _corpus():
    import random

    rng = random.Random(21)
    vocab = ["solid", "prose", "about", "things", "words", "!!", "x"]
    rows = []
    for i in range(150):
        text = " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 15)))
        rows.append((i, text))
    # exact duplicates: same text under three ids (min id must survive)
    rows.append((900, "solid prose about things words here today fine"))
    rows.append((901, "solid prose about things words here today fine"))
    rows.append((902, "solid prose about things words here today fine"))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def _local(tbl, min_quality=0.35, min_tokens=5):
    best = {}
    for did, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        q = quality_score(text)
        tc = token_count(text)
        if q >= min_quality and tc >= min_tokens:
            if text not in best or did < best[text][0]:
                best[text] = (did, tc, q)
    return sorted(best.values())


def _run(tbl, parts):
    import ray

    ds = ray.data.from_arrow(tbl).repartition(parts)
    out = curate_docs(ds).take_all()
    return sorted((r["doc_id"], r["token_count"], r["quality"]) for r in out)


def test_matches_local_reference_and_partition_invariant(ray_session):
    tbl = _corpus()
    got = _run(tbl, 6)
    assert got == _run(tbl, 1)
    assert got == _local(tbl)
    ids = [g[0] for g in got]
    assert 900 in ids and 901 not in ids and 902 not in ids  # min id survives
    # the filter actually dropped something
    assert len(got) < tbl.num_rows


def test_thresholds_respected(ray_session):
    tbl = _corpus()
    for did, tc, q in _run(tbl, 3):
        assert q >= 0.35 and tc >= 5
        # stats are the textstats kernel's values for that doc
        text = {
            d: t
            for d, t in zip(
                tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
            )
        }[did]
        assert tc == token_count(text) and q == quality_score(text)
