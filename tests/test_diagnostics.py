"""E2 diagnostic drill-down (inspect_match_results), match_one convenience
API, and the PSC-JSON TF-build ingest (pipelines/tfbuild.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from uk_address_matcher_ray.state.model import MatchModel


def _corpus():
    from tests.corpus import synth_addresses

    rows = synth_addresses(80)
    canon = pa.table(
        {
            "unique_id": pa.array([f"c{i}" for i in range(len(rows))], pa.string()),
            "address_concat": pa.array([r[1] for r in rows], pa.string()),
            "postcode": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    messy = canon.set_column(
        0, "unique_id", pa.array([f"m{i}" for i in range(len(rows))], pa.string())
    )
    return canon, messy


@pytest.fixture(scope="module")
def matched(ray_session):
    import ray

    from uk_address_matcher_ray.stages.clean import clean_dataset
    from uk_address_matcher_ray.stages.score import predict
    from uk_address_matcher_ray.stages.select import (
        best_matches_with_distinguishability,
    )
    from uk_address_matcher_ray.stages.tf import collect_corpus_stats
    from uk_address_matcher_ray.pipelines.match import match_pipeline
    from uk_address_matcher_ray.util import dataset_from_table

    canon, messy = _corpus()
    ds_c, ds_m = dataset_from_table(canon), dataset_from_table(messy)
    tf, num_tf, ends = collect_corpus_stats(ds_c.union(ds_m))
    ntf = {f"numeric_token_{i}": num_tf for i in (1, 2, 3)}
    cl = clean_dataset(ds_c, tf, ends).materialize()
    cm = clean_dataset(ds_m, tf, ends).materialize()
    model = MatchModel()
    improved = match_pipeline(cl, cm, model, ntf).materialize()
    pairs = predict(cl, cm, model, ntf)
    best = best_matches_with_distinguishability(pairs, dataset_from_table(messy)).materialize()
    return {
        "cl": cl, "cm": cm, "tf": tf, "ends": ends, "ntf": ntf,
        "improved": improved, "best": best, "canon": canon,
    }


def test_inspect_match_results_explicit_id(matched):
    from uk_address_matcher_ray.pipelines.evaluate import inspect_match_results

    labels = {f"m{i}": f"c{i}" for i in range(80)}
    out = inspect_match_results(
        matched["improved"],
        matched["best"],
        labels,
        cleaned_messy_ds=matched["cm"],
        cleaned_canonical_ds=matched["cl"],
        unique_id_r="m3",
    )
    assert out is not None
    h = out["header"]
    assert h["unique_id_r"] == "m3"
    assert h["best_match_id"] is not None
    assert isinstance(out["candidates"], list) and out["candidates"]
    c0 = out["candidates"][0]
    assert {"final_score", "splink_score", "adjustment_score",
            "matching_tokens", "penalty_tokens", "missing_tokens",
            "canonical_id"} <= set(c0)
    assert "unique_id_r:" in out["report"]
    assert "messy" in out["cleaned"]


def test_inspect_match_results_finds_false_positive(matched):
    from uk_address_matcher_ray.pipelines.evaluate import inspect_match_results

    # deliberately wrong labels so record m5 is a false positive
    labels = {"m5": "c77"}
    out = inspect_match_results(matched["improved"], matched["best"], labels)
    assert out is not None
    assert out["header"]["unique_id_r"] == "m5"
    assert out["header"]["is_false_positive"]
    assert out["header"]["true_match_id"] == "c77"


@pytest.mark.usefixtures("ray_session")
def test_match_one(matched):
    from uk_address_matcher_ray.pipelines.match import match_one

    canon = matched["canon"]
    addr = canon.column("address_concat")[7].as_py()
    pc = canon.column("postcode")[7].as_py()
    out = match_one(
        addr, pc, matched["cl"], matched["tf"], matched["ends"], matched["ntf"]
    ).take_all()
    assert out, "expected at least one match"
    best = max(out, key=lambda r: r["match_weight"])
    assert best["unique_id_l"] == "c7"


@pytest.mark.usefixtures("ray_session")
def test_psc_address_records_ingest():
    import ray

    from uk_address_matcher_ray.pipelines.tfbuild import (
        build_tf_tables,
        distinct_addresses,
        psc_address_records,
    )

    rows = [
        {"data": {"address": {"premises": "10", "address_line_1": "HIGH ST",
                              "locality": "LONDON", "postal_code": "E1 1AA",
                              "country": "England"}}},
        {"data": {"address": {"premises": "10", "address_line_1": "HIGH ST",
                              "locality": "LONDON", "postal_code": "E1 1AA",
                              "country": None}}},  # dup address, NULL country kept
        {"data": {"address": {"premises": "99", "address_line_1": "RUE X",
                              "postal_code": "75001", "country": "France"}}},
        {"data": {"address": {"premises": "5", "address_line_2": "BACK LANE",
                              "region": "KENT", "postal_code": "CT1 2AB",
                              "country": "United Kingdom"}}},
    ]
    ds = ray.data.from_items(rows)
    recs = psc_address_records(ds).take_all()
    # France row filtered; concat_ws skips NULL parts
    assert len(recs) == 3
    assert {r["address_concat"] for r in recs} == {
        "10 HIGH ST LONDON", "5 BACK LANE KENT"
    }
    distinct = distinct_addresses(psc_address_records(ds))
    assert distinct.count() == 2
    tok_tbl, num_tbl = build_tf_tables(distinct)
    toks = dict(zip(tok_tbl.column("token").to_pylist(),
                    tok_tbl.column("rel_freq").to_pylist()))
    assert "HIGH" in toks and "LANE" in toks
    nums = num_tbl.column("numeric_token").to_pylist()
    assert "10" in nums and "5" in nums
