"""EM training of Fellegi-Sunter m/u weights as iterative Dataset aggregations.

North-star requirement: "weights learned via an EM pass implemented as
iterative Dataset aggregations". Reference analogue: the reference authors
its committed weights offline (linking_model/training.py:552-587 and
scripts/improve_parameters_using_gradient_descent.py:107-145); Splink's
estimate_parameters_using_expectation_maximisation defines the algorithm:

  E-step: under current (λ, m, u), each blocked pair's match probability is
          p = sigmoid2(prior + Σ_c log2(bf_c(γ_c))), bf = m/u for the matched
          level, 1 for the null level (γ = -1);
  M-step: m_cg = Σ p·[γ_c=g] / Σ p·[γ_c≥0],
          u_cg = Σ (1-p)·[γ_c=g] / Σ (1-p)·[γ_c≥0],  λ = Σ p / N.

Distribution shape: the γ vectors are computed ONCE by the standard blocking
+ scoring pipeline (they do not depend on the weights); each EM iteration is
one streaming pass — a ``map_batches`` that E-steps a batch vectorized and
emits ~60 partial-sum rows, plus a tiny driver-side combine. No per-pair
data ever returns to the driver.

Determinism at scale: float sums over distributed batches are
order-dependent, so per-pair probabilities are quantized to a fixed-point
grid (pq = floor(p·2^40 + 0.5), complement 2^40 − pq) and ALL aggregation
happens in integers — associative, bit-exact at any partitioning, and
mirrored verbatim by the DuckDB oracle (oracle_train.py). The int64
head-room bound (pq·N ≤ 2^63 → N ≤ 2^23 rows per numpy sum) is ENFORCED by
``_exact_sum``: per-batch sums run in ≤2^22-row numpy chunks (each ≤2^62)
and combine in arbitrary-precision Python ints, so partials of any size are
overflow-free; the driver combine is Python ints throughout.

TF adjustments are predict-time only (Splink trains m/u without them); the
histogram-ladder comparison (34 data-authored rungs) stays fixed during EM,
matching how the reference authors it separately (training.py:386-418).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import pyarrow as pa

from uk_address_matcher_ray.state.model import (
    Comparison,
    Level,
    MatchModel,
)

QUANT_BITS = 40
QUANT = 1 << QUANT_BITS
M_U_FLOOR = 1e-12  # Splink-style clamp so empty levels never produce log2(0)

DEFAULT_FIXED = ("token_rel_freq_arr_hist",)

# numpy int64 sums of 2^40-scale fixed-point values overflow beyond ~2^23
# rows; chunks of 2^22 keep every partial sum ≤ 2^62 < 2^63
_SUM_CHUNK = 1 << 22


def _exact_sum(arr) -> int:
    """Overflow-free sum of an int64 array of values ≤ 2^40: numpy sums over
    bounded chunks, combined in arbitrary-precision Python ints."""
    n = len(arr)
    if n <= _SUM_CHUNK:
        return int(arr.sum())
    return sum(int(arr[o : o + _SUM_CHUNK].sum()) for o in range(0, n, _SUM_CHUNK))


def gamma_levels(comp: Comparison) -> List[int]:
    """Gamma values of the non-null levels, in level order (first level gets
    the highest gamma, ELSE gets 0) — mirrors functions/compare.py numbering."""
    nn = sum(1 for lv in comp.levels if not lv.is_null)
    return list(range(nn - 1, -1, -1))


def seed_weights(
    model: MatchModel, trainable: Sequence[str]
) -> Dict[str, Dict[int, Tuple[float, float]]]:
    """gamma -> (m, u) per trainable comparison, from the model's committed
    Bayes factors: u seeded flat (1/num_levels), m = bf * u (bf = m/u is
    preserved, which is all the E-step consumes)."""
    out: Dict[str, Dict[int, Tuple[float, float]]] = {}
    for comp in model.comparisons:
        if comp.name not in trainable:
            continue
        nn = [lv for lv in comp.levels if not lv.is_null]
        cell: Dict[int, Tuple[float, float]] = {}
        g = len(nn) - 1
        for lv in nn:
            u = 1.0 / len(nn)
            cell[g] = (lv.bayes_factor * u, u)
            g -= 1
        out[comp.name] = cell
    return out


def fixed_log2_bf(model: MatchModel, fixed: Sequence[str]) -> Dict[str, Dict[int, float]]:
    """gamma -> log2(bayes_factor) for comparisons kept fixed during EM."""
    out: Dict[str, Dict[int, float]] = {}
    for comp in model.comparisons:
        if comp.name not in fixed:
            continue
        nn = [lv for lv in comp.levels if not lv.is_null]
        cell: Dict[int, float] = {}
        g = len(nn) - 1
        for lv in nn:
            cell[g] = math.log2(lv.bayes_factor)
            g -= 1
        out[comp.name] = cell
    return out


class _EMPartial:
    """map_batches callable: one E-step over a batch of gamma rows ->
    per-(comparison, gamma) int64 partial sums (plus the '' λ/N row)."""

    def __init__(self, comps: List[Tuple[str, List[int]]], luts_ref, prior: float):
        import ray

        luts = luts_ref
        if not isinstance(luts, dict):
            luts = ray.get(luts)
        self.comps = comps  # [(name, [gammas])]
        self.luts = luts  # name -> {gamma: log2bf}
        self.prior = prior

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch.num_rows
        w = np.full(n, self.prior)
        gcols = {}
        for name, _gs in self.comps:
            g = batch.column(f"gamma_{name}").to_numpy(zero_copy_only=False)
            g = g.astype(np.int64)
            gcols[name] = g
            lut_d = self.luts[name]
            maxg = max(lut_d) if lut_d else 0
            lut = np.zeros(maxg + 2)
            for gv, l2 in lut_d.items():
                lut[gv] = l2
            # γ = -1 indexes the trailing 0.0 (null level contributes BF 1)
            w += lut[g]
        # bit-exact quantized probabilities (Python floats; numpy pow differs
        # from libm in the last ulp and would break the DuckDB mirror)
        pq = np.fromiter(
            (math.floor((1.0 / (1.0 + 2.0 ** (-v))) * QUANT + 0.5) for v in w.tolist()),
            dtype=np.int64,
            count=n,
        )
        uq = QUANT - pq
        names, gammas, sum_pq, sum_uq = [], [], [], []
        for name, gs in self.comps:
            g = gcols[name]
            for gv in gs:
                mask = g == gv
                names.append(name)
                gammas.append(gv)
                sum_pq.append(_exact_sum(pq[mask]))
                sum_uq.append(_exact_sum(uq[mask]))
        # λ / N accumulator row
        names.append("")
        gammas.append(-1)
        sum_pq.append(_exact_sum(pq))
        sum_uq.append(n)
        return pa.table(
            {
                "comparison": pa.array(names, pa.string()),
                "gamma_value": pa.array(gammas, pa.int32()),
                "sum_pq": pa.array(sum_pq, pa.int64()),
                "sum_uq": pa.array(sum_uq, pa.int64()),
            }
        )


def em_train(
    gamma_pairs,
    model: MatchModel,
    *,
    iterations: int = 2,
    fixed_comparisons: Sequence[str] = DEFAULT_FIXED,
) -> Tuple[Dict[str, Dict[int, Tuple[float, float]]], float, pa.Table]:
    """Run ``iterations`` EM passes over a Dataset of gamma columns.

    Returns (weights, λ, results-table). ``gamma_pairs`` must carry a
    gamma_<comparison> int column per model comparison (predict output with
    threshold=-inf). The weights dict maps comparison -> gamma -> (m, u).
    """
    import ray

    trainable = [c.name for c in model.comparisons if c.name not in fixed_comparisons]
    weights = seed_weights(model, trainable)
    fixed_luts = fixed_log2_bf(model, fixed_comparisons)
    lam = model.probability_two_random_records_match
    comps = [(c.name, gamma_levels(c)) for c in model.comparisons]

    pairs = gamma_pairs.select_columns(
        [f"gamma_{c.name}" for c in model.comparisons]
    ).materialize()

    for _ in range(iterations):
        luts: Dict[str, Dict[int, float]] = {}
        for name, _gs in comps:
            if name in fixed_luts:
                luts[name] = fixed_luts[name]
            else:
                luts[name] = {
                    g: math.log2(m / u) for g, (m, u) in weights[name].items()
                }
        prior = math.log2(lam / (1.0 - lam))
        luts_ref = ray.put(luts)
        em_step = _EMPartial(comps=comps, luts_ref=luts_ref, prior=prior)
        partials = pairs.map_batches(
            em_step, batch_format="pyarrow"
        ).take_all()  # ~60 rows per batch — tiny combine on the driver
        acc: Dict[Tuple[str, int], List[int]] = {}
        for r in partials:
            k = (r["comparison"], r["gamma_value"])
            a = acc.setdefault(k, [0, 0])
            a[0] += r["sum_pq"]
            a[1] += r["sum_uq"]
        tot_pq, n_pairs = acc[("", -1)]
        lam = float(tot_pq) / float(QUANT * n_pairs)
        new_weights: Dict[str, Dict[int, Tuple[float, float]]] = {}
        for name in trainable:
            gs = dict(comps)[name]
            den_m = max(sum(acc[(name, g)][0] for g in gs), 1)
            den_u = max(sum(acc[(name, g)][1] for g in gs), 1)
            cell: Dict[int, Tuple[float, float]] = {}
            for g in gs:
                num_m, num_u = acc[(name, g)]
                m = max(float(num_m) / float(den_m), M_U_FLOOR)
                u = max(float(num_u) / float(den_u), M_U_FLOOR)
                cell[g] = (m, u)
            new_weights[name] = cell
        weights = new_weights

    rows = []
    for name in trainable:
        for g, (m, u) in sorted(weights[name].items()):
            rows.append(
                {"comparison": name, "gamma_value": g, "m_probability": m, "u_probability": u}
            )
    rows.append(
        {
            "comparison": "__lambda",
            "gamma_value": -1,
            "m_probability": lam,
            "u_probability": None,
        }
    )
    rows.sort(key=lambda r: (r["comparison"], r["gamma_value"]))
    tbl = pa.table(
        {
            "comparison": pa.array([r["comparison"] for r in rows], pa.string()),
            "gamma_value": pa.array([r["gamma_value"] for r in rows], pa.int32()),
            "m_probability": pa.array([r["m_probability"] for r in rows], pa.float64()),
            "u_probability": pa.array([r["u_probability"] for r in rows], pa.float64()),
        }
    )
    return weights, lam, tbl


def apply_trained_weights(
    model: MatchModel,
    weights: Dict[str, Dict[int, Tuple[float, float]]],
    lam: float,
) -> MatchModel:
    """MatchModel with trained Bayes factors (m/u per matched gamma level)
    substituted into the trainable comparisons; TF adjustments keep the
    trained level's u as their u_probability."""
    from dataclasses import replace

    comps = []
    for comp in model.comparisons:
        cell = weights.get(comp.name)
        if cell is None:
            comps.append(comp)
            continue
        gs = gamma_levels(comp)
        levels: List[Level] = []
        gi = 0
        for lv in comp.levels:
            if lv.is_null:
                levels.append(lv)
                continue
            m, u = cell[gs[gi]]
            gi += 1
            levels.append(
                replace(
                    lv,
                    bayes_factor=m / u,
                    u_probability=u if lv.tf_column else lv.u_probability,
                )
            )
        comps.append(Comparison(comp.name, tuple(levels)))
    return replace(
        model,
        probability_two_random_records_match=lam,
        comparisons=tuple(comps),
    )
