"""Line-level boilerplate removal (stages/linededup.py) vs brute force,
on BOTH asset paths (driver gather and the distributed two-phase hash
exchange), with docs straddling input blocks."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.linededup import (
    boilerplate_line_assets,
    line_dedup_docs,
)


def _brute(docs, min_docs):
    cnt = collections.Counter()
    for _, t in docs:
        for ln in set(t.split("\n")):
            cnt[ln] += 1
    bo = {l for l, c in cnt.items() if c >= min_docs}
    exp = {}
    for i, t in docs:
        ls = t.split("\n")
        kept = [l for l in ls if l not in bo]
        exp[i] = ("\n".join(kept), len(ls), len(ls) - len(kept))
    return bo, exp


def _synth(n=80, seed=11):
    rng = np.random.default_rng(seed)
    words = ["aa", "bb", "cc", "dd", "ee"]
    docs = []
    for i in range(n):
        nln = int(rng.integers(1, 6))
        lines = [
            " ".join(rng.choice(words, size=int(rng.integers(1, 4))))
            for _ in range(nln)
        ]
        docs.append((i, "\n".join(lines)))
    return docs


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("driver_gather", [True, False])
def test_line_dedup_matches_brute_force(driver_gather):
    import ray

    docs = _synth()
    min_docs = 3
    bo, exp = _brute(docs, min_docs)
    assert bo, "synthesis must produce boilerplate"
    assert any(v[2] == 0 for v in exp.values()), "some docs keep all lines"

    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(9)
    out = line_dedup_docs(ds, min_docs=min_docs, driver_gather=driver_gather)
    rows = out.take_all()
    assert len(rows) == len(docs)
    for r in rows:
        assert (r["text_clean"], r["n_lines"], r["n_removed"]) == exp[r["doc_id"]]


@pytest.mark.usefixtures("ray_session")
def test_assets_paths_agree_and_straddling_doc_counts_once():
    """A doc split across input rows/blocks must count ONCE toward the
    distinct-doc threshold; both asset paths must return identical sets."""
    import ray

    # doc 0 appears as two rows each containing line 'X'; with
    # min_docs=2 'X' must NOT be boilerplate (one distinct doc),
    # while 'Y' (docs 1 and 2) must be.
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 0, 1, 2], pa.int64()),
            "text": pa.array(["X\na", "X\nb", "Y\nc", "Y\nd"], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    h1, l1 = boilerplate_line_assets(ds, min_docs=2, driver_gather=True)
    h2, l2 = boilerplate_line_assets(ds, min_docs=2, driver_gather=False)
    assert l1 == l2 == frozenset({"Y"})
    assert np.array_equal(h1, h2)


@pytest.mark.usefixtures("ray_session")
def test_doc_losing_every_line_keeps_empty_text():
    import ray

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["Z", "Z", "Z\nkeep me"], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    rows = {
        r["doc_id"]: r
        for r in line_dedup_docs(ds, min_docs=3, driver_gather=True).take_all()
    }
    assert rows[0]["text_clean"] == "" and rows[0]["n_removed"] == 1
    assert rows[2]["text_clean"] == "keep me"
    assert rows[2]["n_lines"] == 2 and rows[2]["n_removed"] == 1
