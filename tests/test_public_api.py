"""Top-level facade: the reference package's public entry-point names must
drive the full workflow (clean -> get_linker -> predict -> improve ->
best matches) over Ray Datasets."""

from __future__ import annotations

import pyarrow as pa
import pytest

import uk_address_matcher_ray as uam
from uk_address_matcher_ray.sources import synth
from uk_address_matcher_ray.util import dataset_from_table


@pytest.mark.usefixtures("ray_session")
def test_reference_api_workflow():
    import ray

    keys = list(range(1, 120))
    canon = synth.canonical_table(keys)
    messy = synth.messy_table(keys)

    cleaned_c = uam.clean_data_on_the_fly(dataset_from_table(canon))
    cleaned_m = uam.clean_data_on_the_fly(dataset_from_table(messy))

    linker = uam.get_linker(
        cleaned_m,
        cleaned_c,
        raw_addresses_for_tf=dataset_from_table(canon),
        salt_threshold=0,
    )
    pairs = linker.predict()
    rows = pairs.take_all()
    assert len(rows) > 0
    assert {"unique_id_l", "unique_id_r", "match_weight"} <= set(rows[0])

    improved = uam.improve_predictions_using_distinguishing_tokens(pairs)
    irows = improved.take_all()
    assert len(irows) > 0
    assert "mw_adjustment" in irows[0]

    fused = linker.predict_improved()
    frows = fused.take_all()
    assert len(frows) > 0

    best = uam.best_matches_with_distinguishability(
        fused, dataset_from_table(messy)
    )
    assert best.count() > 0

    summary = uam.best_matches_summary(best)
    assert summary.num_rows > 0


@pytest.mark.usefixtures("ray_session")
def test_precomputed_tf_cleaning_matches_on_the_fly():
    import ray

    keys = list(range(1, 80))
    canon = synth.canonical_table(keys)
    ds = dataset_from_table(canon)

    from uk_address_matcher_ray.stages.tf import collect_corpus_stats

    # the reference's on-the-fly tf is address-tokens-only
    # (cleaning_steps.py:370-391) while the registered T1 table also counts
    # numeric_token_1..3 (get_token_frequeny_table, :289-323) — so equality
    # holds for the matching (kind-0) dict, and the T1 table is a superset
    tf, _num, end_tokens = collect_corpus_stats(ds)
    a = sorted(
        map(
            repr,
            uam.clean_data_using_precomputed_rel_tok_freq(
                ds, tf, end_tokens
            ).take_all(),
        )
    )
    b = sorted(map(repr, uam.clean_data_on_the_fly(ds).take_all()))
    assert a == b

    t1_rows = uam.get_address_token_frequencies_from_address_table(ds).take_all()
    assert t1_rows and set(t1_rows[0]) == {"token", "rel_freq"}
    assert set(tf) <= {r["token"] for r in t1_rows}

    num = uam.get_numeric_term_frequencies_from_address_table(ds).take_all()
    assert num and set(num[0]) == {"numeric_token", "rel_freq"}
