"""Checkpoint/resume (state/checkpoint.py) and hot-key salting (stages/block.py)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from uk_address_matcher_ray.sources import synth
from uk_address_matcher_ray.stages import tf as tf_mod
from uk_address_matcher_ray.stages.block import (
    BlockKeyEmitter,
    compute_hot_keys,
    row_block_keys,
)
from uk_address_matcher_ray.stages.clean import clean_batch
from uk_address_matcher_ray.state.checkpoint import PipelineRun
from uk_address_matcher_ray.state.model import MatchModel


@pytest.mark.usefixtures("ray_session")
def test_checkpoint_resume(tmp_path):
    import ray

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return ray.data.from_items([{"x": i} for i in range(100)])

    run = PipelineRun(root=str(tmp_path / "ckpt"))
    ds1 = run.stage("numbers", "fp1", build)
    assert ds1.count() == 100
    assert calls["n"] == 1
    assert run.counters["numbers.rows"] == 100

    # resume: same fingerprint -> no rebuild
    run2 = PipelineRun(root=str(tmp_path / "ckpt"))
    ds2 = run2.stage("numbers", "fp1", build)
    assert ds2.count() == 100
    assert calls["n"] == 1

    # changed fingerprint -> rebuild
    ds3 = run2.stage("numbers", "fp2", build)
    assert ds3.count() == 100
    assert calls["n"] == 2

    manifest = json.load(
        open(os.path.join(str(tmp_path / "ckpt"), "numbers", "_MANIFEST.json"))
    )
    assert manifest["fingerprint"] == "fp2"
    assert manifest["counters"]["rows"] == 100


@pytest.mark.usefixtures("ray_session")
def test_partial_stage_is_reexecuted(tmp_path):
    """A stage dir without a manifest (simulated crash) must re-run."""
    import ray

    run = PipelineRun(root=str(tmp_path / "ckpt"))
    stage_dir = os.path.join(str(tmp_path / "ckpt"), "s1")
    os.makedirs(stage_dir)
    with open(os.path.join(stage_dir, "partial.parquet"), "w") as f:
        f.write("garbage")

    ds = run.stage("s1", "fp", lambda: ray.data.range(10))
    assert ds.count() == 10


def _cleaned_rows(keys):
    """Synth rows plus an injected hot postcode (30 canonical rows sharing
    'ZZ1 9ZZ') to exercise the skew path deterministically."""
    hot_canon = pa.Table.from_pylist(
        [
            {
                "unique_id": f"chot{i}",
                "address_concat": f"{i} HOTKEY STREET LONDON",
                "postcode": "ZZ1 9ZZ",
            }
            for i in range(30)
        ]
    )
    hot_messy = pa.Table.from_pylist(
        [
            {
                "unique_id": f"mhot{i}",
                "address_concat": f"{i} HOTKEY STREET LONDON",
                "postcode": "ZZ1 9ZZ",
            }
            for i in range(5)
        ]
    )
    union = pa.concat_tables(
        [
            synth.canonical_table(keys),
            synth.messy_table(keys),
            hot_canon,
            hot_messy,
        ]
    )
    addrs = union.column("address_concat").to_pylist()
    tok_counts, _n, end_counts, _nt = tf_mod.corpus_token_stats(addrs)
    return clean_batch(
        union, tf_mod.rel_freq_table(tok_counts), tf_mod.end_token_set(end_counts)
    )


@pytest.mark.usefixtures("ray_session")
def test_salting_preserves_pair_coverage():
    """Salted and unsalted blocking must co-locate the same (l, r) pairs:
    every canonical row lands in one sub-block, the messy side is replicated
    into all of them."""
    import ray

    keys = list(range(1, 80))
    cleaned = _cleaned_rows(keys)
    model = MatchModel()
    l_tbl = cleaned.filter(
        pa.compute.match_substring_regex(cleaned.column("unique_id"), "^c")
    )
    hot = compute_hot_keys(
        ray.data.from_arrow(l_tbl), model, salt_threshold=2
    )
    assert hot, "expected at least one hot key at threshold 2"

    hot_ref = ray.put(hot)
    rows = cleaned.to_pylist()

    def pairs_from(emitted_l, emitted_r):
        got = set()
        by_key = {}
        for rec in emitted_l.to_pylist():
            by_key.setdefault(rec["__block_key"], []).append(rec["unique_id"])
        for rec in emitted_r.to_pylist():
            for luid in by_key.get(rec["__block_key"], []):
                got.add((luid, rec["unique_id"]))
        return got

    l_batch = pa.Table.from_pylist([r for r in rows if r["unique_id"].startswith("c")])
    r_batch = pa.Table.from_pylist([r for r in rows if r["unique_id"].startswith("m")])

    plain_l = BlockKeyEmitter(model, 0, {})(l_batch)
    plain_r = BlockKeyEmitter(model, 1, {})(r_batch)
    salted_l = BlockKeyEmitter(model, 0, hot)(l_batch)
    salted_r = BlockKeyEmitter(model, 1, hot)(r_batch)

    assert pairs_from(plain_l, plain_r) == pairs_from(salted_l, salted_r)
    # salting actually split something: more distinct keys on the l side
    assert len(set(salted_l.column("__block_key").to_pylist())) > len(
        set(plain_l.column("__block_key").to_pylist())
    )


@pytest.mark.usefixtures("ray_session")
def test_two_sided_salting_pairs_meet_exactly_once():
    """With BOTH sides hot, the (k_l, k_r) salt grid must present every
    (l, r) pair in exactly one sub-block (multiset check, not just set)."""
    import ray
    from collections import Counter

    keys = list(range(1, 40))
    cleaned = _cleaned_rows(keys)
    model = MatchModel()
    l_tbl = cleaned.filter(
        pa.compute.match_substring_regex(cleaned.column("unique_id"), "^c")
    )
    r_tbl = cleaned.filter(
        pa.compute.match_substring_regex(cleaned.column("unique_id"), "^m")
    )
    hot = compute_hot_keys(
        ray.data.from_arrow(l_tbl),
        model,
        salt_threshold=2,
        cleaned_r=ray.data.from_arrow(r_tbl),
    )
    assert any(kr > 1 for (_kl, kr) in hot.values()), "messy side never salted"
    assert any(kl > 1 for (kl, _kr) in hot.values()), "canonical side never salted"

    def pair_multiset(emitted_l, emitted_r):
        got = Counter()
        by_key = {}
        for rec in emitted_l.to_pylist():
            by_key.setdefault((rec["__block_key"], rec["__rule"]), []).append(
                rec["unique_id"]
            )
        for rec in emitted_r.to_pylist():
            for luid in by_key.get((rec["__block_key"], rec["__rule"]), []):
                got[(luid, rec["unique_id"], rec["__rule"])] += 1
        return got

    l_batch = l_tbl.combine_chunks()
    r_batch = r_tbl.combine_chunks()
    plain = pair_multiset(
        BlockKeyEmitter(model, 0, {})(l_batch), BlockKeyEmitter(model, 1, {})(r_batch)
    )
    salted = pair_multiset(
        BlockKeyEmitter(model, 0, hot)(l_batch), BlockKeyEmitter(model, 1, hot)(r_batch)
    )
    assert plain == salted  # same pairs, same multiplicity (exactly once per rule)


@pytest.mark.usefixtures("ray_session")
def test_hot_messy_key_predict_bit_identical():
    """predict() over a corpus with a deliberately hot MESSY key returns
    bit-identical results salted vs unsalted (and no pair-cap error)."""
    import ray
    from uk_address_matcher_ray.stages.score import predict

    keys = list(range(1, 40))
    cleaned = _cleaned_rows(keys)
    l_tbl = cleaned.filter(
        pa.compute.match_substring_regex(cleaned.column("unique_id"), "^c")
    )
    r_tbl = cleaned.filter(
        pa.compute.match_substring_regex(cleaned.column("unique_id"), "^m")
    )
    model = MatchModel()

    def run(salt):
        out = predict(
            ray.data.from_arrow(l_tbl),
            ray.data.from_arrow(r_tbl),
            model,
            {},
            salt_threshold=salt,
        )
        rows = out.select_columns(
            ["unique_id_l", "unique_id_r", "match_key", "match_weight"]
        ).take_all()
        return sorted(tuple(r.values()) for r in rows)

    assert run(0) == run(2)
