"""EM training (stages/train.py): planted-parameter recovery, classification
improvement from a wrong seed, and end-to-end integration with predict().

The recovery harness plants known (λ, m, u) on a synthetic gamma-pair table
(fixed numpy seed), seeds EM with deliberately wrong weights, and asserts the
estimates converge to the planted values — the textbook identifiability check
for Fellegi-Sunter EM (Splink's estimate_parameters_using_expectation_
maximisation semantics)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

from uk_address_matcher_ray.state.model import Comparison, Level, MatchModel
from uk_address_matcher_ray.stages.train import (
    apply_trained_weights,
    em_train,
    gamma_levels,
    seed_weights,
)

# planted generative truth: 3 comparisons, gammas high->0
PLANTED = {
    "alpha": {"m": {1: 0.9, 0: 0.1}, "u": {1: 0.15, 0: 0.85}},
    "beta": {"m": {2: 0.7, 1: 0.2, 0: 0.1}, "u": {2: 0.05, 1: 0.15, 0: 0.8}},
    "kappa": {"m": {1: 0.8, 0: 0.2}, "u": {1: 0.3, 0: 0.7}},
}
LAMBDA = 0.25
N_PAIRS = 40_000
NULL_FRAC = 0.1  # comparison 'kappa' is NULL (gamma -1) for 10% of pairs


def _toy_model() -> MatchModel:
    comps = []
    for name, cell in PLANTED.items():
        levels = [Level("else", bayes_factor=1.0, is_null=True)] if name == "kappa" else []
        gs = sorted(cell["m"], reverse=True)
        for g in gs[:-1]:
            levels.append(Level("else", bayes_factor=2.0))
        levels.append(Level("else", bayes_factor=0.5))
        comps.append(Comparison(name, tuple(levels)))
    return MatchModel(
        probability_two_random_records_match=0.05, comparisons=tuple(comps)
    )


def _planted_pairs() -> tuple[pa.Table, np.ndarray]:
    rng = np.random.default_rng(7)
    z = rng.random(N_PAIRS) < LAMBDA
    cols = {}
    for name, cell in PLANTED.items():
        gs = sorted(cell["m"], reverse=True)
        pm = np.array([cell["m"][g] for g in gs])
        pu = np.array([cell["u"][g] for g in gs])
        draw_m = rng.choice(gs, size=N_PAIRS, p=pm)
        draw_u = rng.choice(gs, size=N_PAIRS, p=pu)
        g = np.where(z, draw_m, draw_u).astype(np.int32)
        if name == "kappa":
            g[rng.random(N_PAIRS) < NULL_FRAC] = -1
        cols[f"gamma_{name}"] = pa.array(g, pa.int32())
    return pa.table(cols), z


def _pair_posterior(tbl: pa.Table, model, weights, lam) -> np.ndarray:
    luts = {
        name: {g: math.log2(m / u) for g, (m, u) in cell.items()}
        for name, cell in weights.items()
    }
    w = np.full(tbl.num_rows, math.log2(lam / (1 - lam)))
    for comp in model.comparisons:
        g = tbl.column(f"gamma_{comp.name}").to_numpy()
        lut = luts[comp.name]
        w += np.array([lut.get(int(v), 0.0) for v in g])
    return 1.0 / (1.0 + np.exp2(-w))


@pytest.mark.usefixtures("ray_session")
def test_em_recovers_planted_parameters():
    import ray

    tbl, z = _planted_pairs()
    model = _toy_model()
    ds = ray.data.from_arrow(tbl)
    weights, lam, out = em_train(ds, model, iterations=50, fixed_comparisons=())

    assert abs(lam - LAMBDA) < 0.02
    for name, cell in PLANTED.items():
        for g, m_true in cell["m"].items():
            m_est, u_est = weights[name][g]
            assert abs(m_est - m_true) < 0.05, (name, g, m_est, m_true)
            assert abs(u_est - cell["u"][g]) < 0.05, (name, g, u_est)

    # classification improvement vs the (wrong) seed
    seed = seed_weights(model, [c.name for c in model.comparisons])
    p0 = _pair_posterior(tbl, model, seed, model.probability_two_random_records_match)
    p1 = _pair_posterior(tbl, model, weights, lam)
    acc0 = float(np.mean((p0 > 0.5) == z))
    acc1 = float(np.mean((p1 > 0.5) == z))
    assert acc1 > acc0 + 0.02, (acc0, acc1)
    # result table shape: one row per trainable (comparison, gamma) + lambda
    n_cells = sum(len(gamma_levels(c)) for c in model.comparisons)
    assert out.num_rows == n_cells + 1


@pytest.mark.usefixtures("ray_session")
def test_em_is_deterministic_across_partitionings():
    import ray

    tbl, _ = _planted_pairs()
    model = _toy_model()
    r1 = em_train(
        ray.data.from_arrow(tbl).repartition(3), model, iterations=3,
        fixed_comparisons=(),
    )
    r2 = em_train(
        ray.data.from_arrow(tbl).repartition(17), model, iterations=3,
        fixed_comparisons=(),
    )
    assert r1[2].to_pylist() == r2[2].to_pylist()  # bit-exact across shuffles


@pytest.mark.usefixtures("ray_session")
def test_em_integrates_with_predict():
    """Train on real blocked gamma pairs from the synth address corpus and
    run predict() with the trained model end-to-end."""
    import ray

    from tests.corpus import synth_addresses
    from uk_address_matcher_ray.stages.clean import clean_dataset
    from uk_address_matcher_ray.stages.score import predict
    from uk_address_matcher_ray.stages.tf import collect_corpus_stats
    from uk_address_matcher_ray.util import dataset_from_table

    rows = synth_addresses(120)
    tbl = pa.table(
        {
            "unique_id": pa.array([f"c{i}" for i in range(len(rows))], pa.string()),
            "address_concat": pa.array([r[1] for r in rows], pa.string()),
            "postcode": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    messy = tbl.set_column(0, "unique_id", pa.array([f"m{i}" for i in range(len(rows))], pa.string()))
    ds_c, ds_m = dataset_from_table(tbl), dataset_from_table(messy)
    tf, _ntf, end_tokens = collect_corpus_stats(ds_c.union(ds_m))
    cl = clean_dataset(ds_c, tf, end_tokens).materialize()
    cm = clean_dataset(ds_m, tf, end_tokens).materialize()
    model = MatchModel()
    pairs = predict(cl, cm, model, {}, threshold=-1e300)
    weights, lam, _ = em_train(pairs, model, iterations=2)
    trained = apply_trained_weights(model, weights, lam)
    out = predict(cl, cm, trained, {}, threshold=-1e300)
    best: dict = {}
    weight: dict = {}
    for r in out.take_all():
        k, w = r["unique_id_r"], r["match_weight"]
        if k not in best or w > best[k]:
            best[k] = w
        weight[(k, r["unique_id_l"])] = w
    # under trained weights the true pair must attain the per-record max
    # (duplicated source addresses legitimately tie)
    n_top = sum(
        1 for k, mx in best.items() if weight.get((k, "c" + k[1:])) == mx
    )
    assert n_top >= int(0.9 * len(best)), (n_top, len(best))
