"""Flagship checkpoint/resume integration + driver entry() smoke."""

from __future__ import annotations

import os

import pytest

from uk_address_matcher_ray.pipelines.match import flagship_pipeline
from uk_address_matcher_ray.sources import synth
from uk_address_matcher_ray.sources.webpages import synth_web_pages
from uk_address_matcher_ray.state.checkpoint import PipelineRun

KEYS = list(range(1, 60))


def _pages():
    canon = synth.canonical_table(KEYS).to_pylist()
    messy = synth.messy_table(KEYS).to_pylist()
    mk = lambda rows: synth_web_pages(
        [(r["unique_id"], r["address_concat"], r["postcode"]) for r in rows]
    )
    return mk(messy), mk(canon)


@pytest.mark.usefixtures("ray_session")
def test_flagship_resume_from_checkpoints(tmp_path):
    import ray

    from uk_address_matcher_ray.util import dataset_from_table

    pages_m, pages_c = _pages()
    root = str(tmp_path / "run")

    run1 = PipelineRun(root=root)
    pairs1, _ = flagship_pipeline(
        dataset_from_table(pages_m, target_blocks=4),
        dataset_from_table(pages_c, target_blocks=4),
        checkpoint_run=run1,
    )
    rows1 = sorted(
        (r["unique_id_r"], r["unique_id_l"], r["match_weight"])
        for r in pairs1.take_all()
    )
    assert os.path.exists(os.path.join(root, "improved_pairs", "_MANIFEST.json"))
    assert run1.counters["improved_pairs.rows"] == len(rows1)

    # resume: pair stage must come from the checkpoint, not a rebuild —
    # simulate by wiping nothing and rerunning; stage() reads parquet back.
    run2 = PipelineRun(root=root)
    pairs2, _ = flagship_pipeline(
        dataset_from_table(pages_m, target_blocks=4),
        dataset_from_table(pages_c, target_blocks=4),
        checkpoint_run=run2,
    )
    rows2 = sorted(
        (r["unique_id_r"], r["unique_id_l"], r["match_weight"])
        for r in pairs2.take_all()
    )
    assert rows1 == rows2


@pytest.mark.usefixtures("ray_session")
def test_driver_entry_smoke():
    if not os.path.isdir("/root/testdata/sf0.001"):
        pytest.skip("testdata not available")
    import __ray_entry__ as entry

    res = entry.entry()
    rows = res.take_all()
    assert len(rows) >= 0
    if rows:
        assert {"unique_id_r", "unique_id_l", "match_weight"} <= set(rows[0])
