"""Second-pass multiplier tuning (reference
scripts/improve_parameters_using_gradient_descent.py).

The reference tunes the five improve-step multipliers (REWARD / PUNISHMENT /
BIGRAM_REWARD / BIGRAM_PUNISHMENT / MISSING_TOKEN_PENALTY) with SPSA +
momentum over a labelled reward objective (ibid. 820-867: delta = ±perturb,
gradient from the two perturbed evaluations, update clipped to the perturb
scale, velocity with momentum 0.3, alpha decay 0.99, best-params tracking).

Ray-Data-first restructuring: the multipliers only affect the SECOND pass,
so blocking + scoring run ONCE — the slimmed raw-pair dataset is
materialized and every SPSA evaluation is a single grouped_map (rescore
kernel with overridden multipliers) + the distributed reward aggregation.
The reference re-runs its whole linker per evaluation because it also tunes
first-pass model weights; for those, rebuild raw pairs per evaluation via
``raw_builder``.

Reward objective (ibid. 383-470, table ``to_score``): match weights are
min-max normalized over ALL improved pairs; per labelled messy record
  * no true match in the candidates        -> reward = -0.2
  * best != true                           -> true_w - best_w   (< 0)
  * best == true                           -> min(best_w - second_w, 0.2)
score = 5 * sum(reward) / num_labels. A deterministic tie-break
(normalized weight DESC, unique_id_l ASC) replaces the reference SQL's
unordered ROW_NUMBER so engine and oracle agree bit-exactly.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import pyarrow as pa

# (initial, lower, upper, perturb) per multiplier — reference param_config
# (improve_parameters_using_gradient_descent.py:545-574)
MULTIPLIER_CONFIG: Dict[str, Tuple[float, float, float, float]] = {
    "REWARD_MULTIPLIER": (3.0, 0.0, 20.0, 0.5),
    "PUNISHMENT_MULTIPLIER": (1.5, 0.0, 20.0, 0.5),
    "BIGRAM_REWARD_MULTIPLIER": (3.0, 0.0, 20.0, 0.5),
    "BIGRAM_PUNISHMENT_MULTIPLIER": (1.5, 0.0, 20.0, 0.5),
    "MISSING_TOKEN_PENALTY": (0.1, 0.01, 10.0, 0.05),
}


def record_rewards(
    improved,
    labels: Dict[str, str],
    *,
    indeterminate_cap: float = 0.2,
    no_true_penalty: float = -0.2,
):
    """Improved pair Dataset -> per-record reward Dataset
    (unique_id_r, reward, truth_status) for labelled records.

    One tiny min/max aggregate over the pair weights, then a unique_id_r
    grouped_map with the label dict broadcast — nothing per-pair returns to
    the driver."""
    import numpy as np
    import ray

    from uk_address_matcher_ray.stages.grouped import grouped_map

    proj = improved.select_columns(
        ["unique_id_r", "unique_id_l", "match_weight"]
    ).materialize()
    bounds = proj.aggregate(
        ray.data.aggregate.Min("match_weight"),
        ray.data.aggregate.Max("match_weight"),
    )
    mn, mx = bounds["min(match_weight)"], bounds["max(match_weight)"]
    span = (mx - mn) if (mx is not None and mn is not None and mx != mn) else None
    mn = mn if mn is not None else 0.0
    labels_ref = ray.put(dict(labels))

    out_schema = pa.schema(
        [
            pa.field("unique_id_r", pa.string()),
            pa.field("reward", pa.float64()),
            pa.field("truth_status", pa.string()),
        ]
    )

    def kernel(tbl: pa.Table) -> pa.Table:
        from uk_address_matcher_ray.util import get_broadcast

        lbl = get_broadcast(labels_ref)
        uids = tbl.column("unique_id_r").to_pylist()
        ls = tbl.column("unique_id_l").to_pylist()
        mws = tbl.column("match_weight").to_pylist()
        n = len(uids)
        out_r, out_rew, out_ts = [], [], []
        gs = 0
        for i in range(1, n + 1):
            if i < n and uids[i] == uids[gs]:
                continue
            uid = uids[gs]
            correct = lbl.get(uid)
            if correct is not None:
                # normalized weights; deterministic order (w DESC, id ASC)
                cand = sorted(
                    (
                        ((mws[j] - mn) / span if span else 0.0, ls[j])
                        for j in range(gs, i)
                    ),
                    key=lambda t: (-t[0], t[1]),
                )
                best_w, best_id = cand[0]
                second_w = cand[1][0] if len(cand) > 1 else None
                true_w = next((w for w, l in cand if l == correct), None)
                if true_w is None:
                    rew = no_true_penalty
                elif best_id != correct:
                    rew = true_w - best_w
                else:
                    rew = (
                        min(best_w - second_w, indeterminate_cap)
                        if second_w is not None
                        else indeterminate_cap
                    )
                out_r.append(uid)
                out_rew.append(rew)
                out_ts.append(
                    "indistinguishable true positive"
                    if rew == 0
                    else ("true positive" if rew > 0 else "false positive")
                )
            gs = i
        return pa.table(
            {
                "unique_id_r": pa.array(out_r, pa.string()),
                "reward": pa.array(out_rew, pa.float64()),
                "truth_status": pa.array(out_ts, pa.string()),
            }
        ).cast(out_schema)

    return grouped_map(proj, "unique_id_r", None, out_schema, fn_table=kernel)


def tuning_score(
    improved,
    labels: Dict[str, str],
    *,
    scale: float = 5.0,
) -> Dict[str, float]:
    """Scalar objective + diagnostic counts (reference ibid. 444-470)."""
    rewards = record_rewards(improved, labels)
    rows = rewards.take_all()  # one row per labelled record — driver-sized
    total = sum(r["reward"] for r in rows)
    n_labels = max(1, len(labels))
    return {
        "score": scale * total / n_labels,
        "num_matches": sum(1 for r in rows if r["truth_status"] == "true positive"),
        "num_non_matches": sum(
            1 for r in rows if r["truth_status"] == "false positive"
        ),
        "num_indeterminate": sum(
            1
            for r in rows
            if r["truth_status"] == "indistinguishable true positive"
        ),
    }


def spsa_tune_multipliers(
    raw,
    model,
    labels: Dict[str, str],
    *,
    iterations: int = 25,
    seed: int = 0,
    alpha: float = 0.5,
    alpha_decay: float = 0.99,
    min_alpha: float = 1e-4,
    momentum: float = 0.3,
    match_weight_threshold: float = -20.0,
    top_n_matches: int = 5,
    use_bigrams: bool = True,
    raw_builder: Optional[Callable[[Dict[str, float]], object]] = None,
    config: Optional[Dict[str, Tuple[float, float, float, float]]] = None,
) -> Dict:
    """SPSA + momentum over the five improve multipliers.

    ``raw``: raw scored pair Dataset (scored_pairs_raw output) — slimmed and
    materialized ONCE; each evaluation re-runs only the rescore grouped_map.
    Deterministic for a fixed ``seed`` (numpy default_rng; no wall-clock).
    Returns {params, score, history, initial_score}.
    """
    import numpy as np

    from uk_address_matcher_ray.pipelines.match import (
        improve_raw_pairs,
        slim_for_improve,
    )
    from uk_address_matcher_ray.stages.rescore import ImproveStage

    cfg = config or MULTIPLIER_CONFIG
    names = list(cfg)
    x0 = np.array([cfg[n][0] for n in names])
    lo = np.array([cfg[n][1] for n in names])
    hi = np.array([cfg[n][2] for n in names])
    perturb = np.array([cfg[n][3] for n in names])

    base_stage = ImproveStage(
        dedup_first=True,
        match_weight_threshold=match_weight_threshold,
        top_n_matches=top_n_matches,
        use_bigrams=use_bigrams,
    )
    slimmed = None
    if raw_builder is None:
        slimmed = slim_for_improve(raw, base_stage, model).materialize()

    def evaluate(params: np.ndarray) -> float:
        overrides = dict(zip(names, params.tolist()))
        stage = ImproveStage(
            dedup_first=True,
            match_weight_threshold=match_weight_threshold,
            top_n_matches=top_n_matches,
            use_bigrams=use_bigrams,
            **overrides,
        )
        if raw_builder is not None:
            improved = improve_raw_pairs(raw_builder(overrides), stage, model)
        else:
            improved = improve_raw_pairs(
                slimmed, stage, model, pre_slimmed=True
            )
        return tuning_score(improved, labels)["score"]

    rng = np.random.default_rng(seed)
    params = x0.copy()
    velocity = np.zeros(len(names))
    a = alpha
    best_score = evaluate(params)
    initial_score = best_score
    best_params = params.copy()
    history = [{"iteration": -1, "score": best_score, **dict(zip(names, params))}]

    for it in range(iterations):
        a = max(a * alpha_decay, min_alpha)
        delta = rng.choice([-1.0, 1.0], size=len(names)) * perturb
        r_plus = evaluate(np.clip(params + delta, lo, hi))
        r_minus = evaluate(np.clip(params - delta, lo, hi))
        gradient = -(r_plus - r_minus) / (2 * delta)
        update = np.clip(a * gradient, -perturb, perturb)
        velocity = momentum * velocity + update
        params = np.clip(params - velocity, lo, hi)
        score = evaluate(params)
        history.append(
            {"iteration": it, "score": score, **dict(zip(names, params))}
        )
        if score > best_score:
            best_score = score
            best_params = params.copy()
        if float(np.linalg.norm(velocity)) < 1e-5 and it > 5:
            break

    return {
        "params": dict(zip(names, best_params.tolist())),
        "score": best_score,
        "initial_score": initial_score,
        "history": history,
    }
