"""Ray-Data-native address-matching engine (see SURVEY.md).

Top-level facade mirroring the reference package's public API
(reference uk_address_matcher/__init__.py:1-36) so a reference user can
switch with the same entry-point names — each maps to the Ray-Data-first
implementation:

| reference name | here |
|---|---|
| get_linker | :func:`get_linker` -> :class:`Linker` (predict / improve / best-match workflow over Datasets) |
| clean_data_on_the_fly | :func:`clean_data_on_the_fly` |
| clean_data_using_precomputed_rel_tok_freq | :func:`clean_data_using_precomputed_rel_tok_freq` |
| get_address_token_frequencies_from_address_table | :func:`get_address_token_frequencies_from_address_table` |
| get_numeric_term_frequencies_from_address_table | :func:`get_numeric_term_frequencies_from_address_table` |
| improve_predictions_using_distinguishing_tokens | re-export of stages.rescore.improve_predictions |
| best_matches_with_distinguishability / best_matches_summary | re-exports of stages.select |
| inspect_match_results_vs_labels / evaluate_predictions_against_labels | aliases of pipelines.evaluate |
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from uk_address_matcher_ray.pipelines.evaluate import (
    accuracy_vs_labels as evaluate_predictions_against_labels,
)
from uk_address_matcher_ray.pipelines.evaluate import (
    inspect_match_results as inspect_match_results_vs_labels,
)
from uk_address_matcher_ray.stages.clean import clean_dataset
from uk_address_matcher_ray.stages.rescore import (
    improve_predictions as improve_predictions_using_distinguishing_tokens,
)
from uk_address_matcher_ray.stages.score import predict
from uk_address_matcher_ray.stages.select import (
    best_matches_summary,
    best_matches_with_distinguishability,
)
from uk_address_matcher_ray.stages.tf import collect_corpus_stats
from uk_address_matcher_ray.state.model import MatchModel


def clean_data_on_the_fly(ds, *, concurrency: Optional[int] = None):
    """Reference ``clean_data_on_the_fly`` (cleaning_pipelines.py:68-111):
    one distributed corpus-stats pass, then the cleaning queue with the
    frequencies broadcast. Returns the cleaned-feature Dataset."""
    tf, _numeric_tf, end_tokens = collect_corpus_stats(ds)
    return clean_dataset(ds, tf, end_tokens, concurrency=concurrency)


def _tf_dict_of(rel_tok_freq) -> Dict[str, float]:
    """dict | pyarrow.Table | Dataset of (token, rel_freq) -> dict."""
    if isinstance(rel_tok_freq, dict):
        return rel_tok_freq
    try:
        import ray

        if isinstance(rel_tok_freq, ray.data.Dataset):
            rows = rel_tok_freq.take_all()
            key = "token" if rows and "token" in rows[0] else "numeric_token"
            return {r[key]: r["rel_freq"] for r in rows}
    except ImportError:  # pragma: no cover
        pass
    cols = rel_tok_freq.column_names
    key = "token" if "token" in cols else "numeric_token"
    return dict(
        zip(
            rel_tok_freq.column(key).to_pylist(),
            rel_tok_freq.column("rel_freq").to_pylist(),
        )
    )


def clean_data_using_precomputed_rel_tok_freq(
    ds,
    rel_tok_freq,
    end_tokens: Sequence[str] = (),
    *,
    concurrency: Optional[int] = None,
):
    """Reference ``clean_data_using_precomputed_rel_tok_freq``: cleaning
    with a registered TF table (dict / Arrow table / Dataset of
    (token, rel_freq)) instead of an on-the-fly pass."""
    return clean_dataset(
        ds, _tf_dict_of(rel_tok_freq), frozenset(end_tokens), concurrency=concurrency
    )


def get_address_token_frequencies_from_address_table(ds):
    """Reference ``get_address_token_frequencies_from_address_table``
    -> Dataset of (token, rel_freq) over the address corpus (T1 semantics:
    address tokens + numeric_token_1..3 values)."""
    from uk_address_matcher_ray.stages.tf import token_tf_dataset

    return token_tf_dataset(ds)


def get_numeric_term_frequencies_from_address_table(ds):
    """Reference ``get_numeric_term_frequencies_from_address_table``
    -> Dataset of (numeric_token, rel_freq)."""
    from uk_address_matcher_ray.stages.tf import numeric_tf_dataset

    return numeric_tf_dataset(ds)


class Linker:
    """Reference ``Linker``-shaped workflow object over cleaned Datasets.

    The reference's get_linker returns a configured splink Linker whose
    ``inference.predict()`` drives blocking + Fellegi-Sunter scoring; here
    the same workflow runs Ray-Data-first (two all-to-alls end-to-end, see
    pipelines/match.py)."""

    def __init__(
        self,
        cleaned_messy,
        cleaned_canonical,
        model: MatchModel,
        numeric_tf: Optional[Dict[str, Dict[str, float]]] = None,
        *,
        retain_columns: Sequence[str] = (),
        salt_threshold: int = 5000,
    ):
        self.cleaned_messy = cleaned_messy
        self.cleaned_canonical = cleaned_canonical
        self.model = model
        self.numeric_tf = numeric_tf
        self.retain_columns = tuple(retain_columns)
        self.salt_threshold = salt_threshold

    def predict(self, *, threshold: float = -50.0):
        """Deduped scored pairs (reference linker.inference.predict)."""
        return predict(
            self.cleaned_canonical,
            self.cleaned_messy,
            self.model,
            self.numeric_tf,
            threshold=threshold,
            retain_columns=self.retain_columns,
            salt_threshold=self.salt_threshold,
        )

    def predict_improved(
        self,
        *,
        predict_threshold: float = -50.0,
        improve_threshold: float = -20.0,
        top_n_matches: int = 5,
        use_bigrams: bool = True,
    ):
        """Fused predict + second-pass rescoring (ONE unique_id_r
        exchange; identical output to predict() -> improve...)."""
        from uk_address_matcher_ray.pipelines.match import match_pipeline

        return match_pipeline(
            self.cleaned_canonical,
            self.cleaned_messy,
            self.model,
            self.numeric_tf,
            predict_threshold=predict_threshold,
            improve_threshold=improve_threshold,
            top_n_matches=top_n_matches,
            use_bigrams=use_bigrams,
            retain_columns=self.retain_columns,
            salt_threshold=self.salt_threshold,
        )


def get_linker(
    df_addresses_to_match,
    df_addresses_to_search_within,
    *,
    model: Optional[MatchModel] = None,
    additional_columns_to_retain: Sequence[str] = (),
    include_full_postcode_block: bool = True,
    include_outside_postcode_block: bool = True,
    precomputed_numeric_tf: Optional[Dict[str, float]] = None,
    raw_addresses_for_tf=None,
    salt_threshold: int = 5000,
) -> Linker:
    """Reference ``get_linker`` (splink_model.py:25-37) over CLEANED
    Datasets: messy first, canonical second, blocking toggles and retained
    columns as in the reference. The numeric TF adjustment needs a numeric
    term-frequency table: pass ``precomputed_numeric_tf`` (a dict, from
    ``get_numeric_term_frequencies_from_address_table(...)`` rows or
    elsewhere), or ``raw_addresses_for_tf`` (a RAW address Dataset to count
    it from — the reference's on-the-fly mode); with neither, scoring runs
    without TF adjustment (splink's behaviour when no tf table is
    registered)."""
    model = (model or MatchModel()).with_blocking_toggles(
        include_full_postcode_block=include_full_postcode_block,
        include_outside_postcode_block=include_outside_postcode_block,
    )
    if precomputed_numeric_tf is None and raw_addresses_for_tf is not None:
        num_rows = get_numeric_term_frequencies_from_address_table(
            raw_addresses_for_tf
        ).take_all()
        precomputed_numeric_tf = {
            r["numeric_token"]: r["rel_freq"] for r in num_rows
        }
    numeric_tf = (
        {f"numeric_token_{i}": precomputed_numeric_tf for i in (1, 2, 3)}
        if precomputed_numeric_tf is not None
        else None
    )
    return Linker(
        df_addresses_to_match,
        df_addresses_to_search_within,
        model,
        numeric_tf,
        retain_columns=additional_columns_to_retain,
        salt_threshold=salt_threshold,
    )


__all__ = [
    "get_linker",
    "Linker",
    "MatchModel",
    "clean_data_on_the_fly",
    "clean_data_using_precomputed_rel_tok_freq",
    "get_numeric_term_frequencies_from_address_table",
    "get_address_token_frequencies_from_address_table",
    "improve_predictions_using_distinguishing_tokens",
    "best_matches_with_distinguishability",
    "best_matches_summary",
    "inspect_match_results_vs_labels",
    "evaluate_predictions_against_labels",
]
