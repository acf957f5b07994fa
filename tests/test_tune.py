"""SPSA multiplier tuning (reference
scripts/improve_parameters_using_gradient_descent.py): tuned multipliers
must beat deliberately-bad defaults on HELD-OUT labels, deterministically.

The corpus enriches the canonical side with two decoys per record (a
token-subset address and a bumped-number address) so the objective actually
depends on the multipliers: with REWARD near 0 and PUNISHMENT/MISSING
inflated, 13/100 best matches flip to a decoy (measured)."""

from __future__ import annotations

import re

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def tune_setup(ray_session):
    import __ray_entry__ as entry
    from uk_address_matcher_ray.sources import synth
    from uk_address_matcher_ray.stages.clean import clean_dataset
    from uk_address_matcher_ray.stages.score import scored_pairs_raw
    from uk_address_matcher_ray.stages.tf import collect_corpus_stats
    from uk_address_matcher_ray.state.model import MatchModel
    from uk_address_matcher_ray.util import dataset_from_table

    sf = "/root/testdata/sf0.001"
    keys = entry._custkeys(sf)
    canon, messy = synth.canonical_table(keys), synth.messy_table(keys)
    uids = canon.column("unique_id").to_pylist()
    addrs = canon.column("address_concat").to_pylist()
    pcs = canon.column("postcode").to_pylist()
    d_uid, d_addr, d_pc = [], [], []
    for u, a, p in zip(uids, addrs, pcs):
        toks = a.split()
        if len(toks) > 2:
            d_uid.append("d" + u[1:])
            d_addr.append(" ".join(toks[:-1]))
            d_pc.append(p)
        m = re.match(r"(\d+) (.*)", a)
        if m:
            d_uid.append("e" + u[1:])
            d_addr.append(str(int(m.group(1)) + 2) + " " + m.group(2))
            d_pc.append(p)
    canon2 = pa.table(
        {
            "unique_id": pa.array(uids + d_uid, pa.string()),
            "address_concat": pa.array(addrs + d_addr, pa.string()),
            "postcode": pa.array(pcs + d_pc, pa.string()),
        }
    )
    union = pa.concat_tables([canon2, messy])
    tf, num_tf, end_tokens = collect_corpus_stats(dataset_from_table(union))
    numeric_tf = {f"numeric_token_{i}": num_tf for i in (1, 2, 3)}
    cl = clean_dataset(dataset_from_table(canon2), tf, end_tokens)
    cm = clean_dataset(dataset_from_table(messy), tf, end_tokens)
    model = MatchModel()
    raw = scored_pairs_raw(
        cl, cm, model, numeric_tf, threshold=-50.0, local_prune=(5, -20.0)
    ).materialize()
    labels = synth.truth_labels(keys)
    ks = sorted(labels)
    train = {k: labels[k] for i, k in enumerate(ks) if i % 2 == 0}
    heldout = {k: labels[k] for i, k in enumerate(ks) if i % 2 == 1}
    return raw, model, train, heldout


# deliberately bad starting point: near-zero reward, excessive punishment
# (flips 13/100 best matches to decoys on this corpus)
BAD_CONFIG = {
    "REWARD_MULTIPLIER": (0.2, 0.0, 20.0, 0.5),
    "PUNISHMENT_MULTIPLIER": (10.0, 0.0, 20.0, 0.5),
    "BIGRAM_REWARD_MULTIPLIER": (0.2, 0.0, 20.0, 0.5),
    "BIGRAM_PUNISHMENT_MULTIPLIER": (10.0, 0.0, 20.0, 0.5),
    "MISSING_TOKEN_PENALTY": (5.0, 0.01, 10.0, 0.05),
}


def _heldout_score(raw, model, params, heldout):
    from uk_address_matcher_ray.pipelines.match import improve_raw_pairs
    from uk_address_matcher_ray.pipelines.tune import tuning_score
    from uk_address_matcher_ray.stages.rescore import ImproveStage

    stage = ImproveStage(dedup_first=True, match_weight_threshold=-20.0, **params)
    return tuning_score(improve_raw_pairs(raw, stage, model), heldout)["score"]


def test_spsa_beats_bad_defaults_on_heldout(tune_setup):
    from uk_address_matcher_ray.pipelines.tune import spsa_tune_multipliers

    raw, model, train, heldout = tune_setup
    res = spsa_tune_multipliers(
        raw, model, train, iterations=10, seed=1, config=BAD_CONFIG
    )
    assert res["score"] >= res["initial_score"]

    bad = {k: v[0] for k, v in BAD_CONFIG.items()}
    s_bad = _heldout_score(raw, model, bad, heldout)
    s_tuned = _heldout_score(raw, model, res["params"], heldout)
    assert s_tuned > s_bad


def test_spsa_deterministic(tune_setup):
    from uk_address_matcher_ray.pipelines.tune import spsa_tune_multipliers

    raw, model, train, _ = tune_setup
    r1 = spsa_tune_multipliers(raw, model, train, iterations=3, seed=7)
    r2 = spsa_tune_multipliers(raw, model, train, iterations=3, seed=7)
    assert r1["params"] == r2["params"]
    assert r1["score"] == r2["score"]
    assert r1["history"] == r2["history"]
