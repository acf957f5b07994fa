"""Reference-workflow example (mirrors the reference's
match_example_data.ipynb flow) on the deterministic synthetic corpus.

Run: python examples/match_example.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

import uk_address_matcher_ray as uam
from uk_address_matcher_ray.sources import synth
from uk_address_matcher_ray.util import dataset_from_table


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    # 1. load raw address tables (here: deterministic synth; in production
    #    ray.data.read_parquet / read_csv via sources/readers.py)
    keys = list(range(1, 500))
    raw_canonical = dataset_from_table(synth.canonical_table(keys))
    raw_messy = dataset_from_table(synth.messy_table(keys))

    # 2. clean + feature-engineer both sides (on-the-fly term frequencies)
    cleaned_canonical = uam.clean_data_on_the_fly(raw_canonical)
    cleaned_messy = uam.clean_data_on_the_fly(raw_messy)

    # 3. configure the linker (blocking toggles, numeric TF from the
    #    canonical corpus) and predict + rescore in one fused pipeline
    linker = uam.get_linker(
        cleaned_messy,
        cleaned_canonical,
        raw_addresses_for_tf=raw_canonical,
    )
    improved = linker.predict_improved()

    # 4. best match per messy record with distinguishability categories
    best = uam.best_matches_with_distinguishability(improved, raw_messy)
    print(uam.best_matches_summary(best).to_pandas().to_string(index=False))

    for row in best.take(5):
        print(
            f"{row['unique_id_r']:>8} -> {row['unique_id_l']:<8} "
            f"mw={row['match_weight']:.2f} "
            f"[{row['distinguishability_category']}]"
        )

    ray.shutdown()


if __name__ == "__main__":
    main()
