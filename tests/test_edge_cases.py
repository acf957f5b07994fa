"""End-to-end accuracy harness over the reference's 21-case YAML corpus
(tests/edge_case_addresses.yaml; harness semantics per tests/test_edge_cases.py
in the reference). Requires the reference's packaged TF assets — skipped when
/root/reference is unavailable.

Note on numeric anchors: the expected match weights quoted in the reference's
test-file comments (e.g. 11.14441284034456) are stale snapshots from an older
model — the hist-ladder slope they imply (0.75 bits/decade) contradicts the
committed splink_model.json ladder (1 bit/decade in that region), and the
reference's CI asserts only match rate, never those numbers. This engine pins
to the committed model JSON, so the assertions here are behavioral: match
rate and determinism.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pytest

REF = Path("/root/reference")


def _run_all_blocks():
    import duckdb
    import yaml

    from uk_address_matcher_ray.functions.compare import prepare_row, score_pair
    from uk_address_matcher_ray.stages.clean import clean_batch
    from uk_address_matcher_ray.stages.rescore import rescore_group
    from uk_address_matcher_ray.stages.tf import load_tf_parquet
    from uk_address_matcher_ray.state.model import MatchModel

    tf = load_tf_parquet(
        str(REF / "uk_address_matcher/data/address_token_frequencies.parquet")
    )
    con = duckdb.connect()
    end_tokens = frozenset(
        r[0]
        for r in con.sql(
            f"select token from read_csv_auto('{REF}/uk_address_matcher/data/common_end_tokens.csv')"
            " where token_count > 3000"
        ).fetchall()
    )
    ntf = dict(
        con.sql(
            f"select * from read_parquet('{REF}/uk_address_matcher/data/numeric_token_frequencies.parquet')"
        ).fetchall()
    )
    con.close()
    numeric_tf = {f"numeric_token_{i}": ntf for i in (1, 2, 3)}
    model = MatchModel()
    data = yaml.safe_load((REF / "tests/edge_case_addresses.yaml").read_text())[
        "addresses"
    ]

    results = {}
    for bid, case in enumerate(data, 1):
        rows = [
            {
                "unique_id": "r",
                "address_concat": case["messy_address"][0],
                "postcode": case["messy_address"][1],
            }
        ]
        for i, a in enumerate(case["canonical_addresses"], 1):
            rows.append(
                {
                    "unique_id": str(bid * 1000 + i),
                    "address_concat": a[0],
                    "postcode": a[1],
                }
            )
        cleaned = {
            x["unique_id"]: x
            for x in clean_batch(pa.Table.from_pylist(rows), tf, end_tokens).to_pylist()
        }
        r_row = cleaned.pop("r")
        r_s = prepare_row(r_row)
        pairs = []
        for uid, lr in cleaned.items():
            mw, prob, _g = score_pair(prepare_row(lr), r_s, model, numeric_tf)
            if mw >= -50:
                pairs.append(
                    {
                        "match_weight": mw,
                        "match_probability": prob,
                        "unique_id_l": uid,
                        "unique_id_r": str(bid),
                        "original_address_concat_l": lr["original_address_concat"],
                        "original_address_concat_r": r_row["original_address_concat"],
                        "common_end_tokens_hist_r": r_row["common_end_tokens_hist"],
                        "postcode_l": lr["postcode"],
                        "postcode_r": r_row["postcode"],
                    }
                )
        improved = rescore_group(pairs, match_weight_threshold=-20)
        results[bid] = sorted(improved, key=lambda r: -r["match_weight"])
    return results


@pytest.fixture(scope="module")
def block_results():
    if not REF.exists():
        pytest.skip("reference assets not available")
    return _run_all_blocks()


def test_edge_case_match_rate(block_results):
    correct = sum(
        1
        for bid, rows in block_results.items()
        if rows and rows[0]["unique_id_l"] == str(bid * 1000 + 1)
    )
    assert correct >= 17, f"match rate regressed: {correct}/21"


def test_edge_case_determinism(block_results):
    again = _run_all_blocks()
    for bid in block_results:
        a = [(r["unique_id_l"], r["match_weight"]) for r in block_results[bid]]
        b = [(r["unique_id_l"], r["match_weight"]) for r in again[bid]]
        assert a == b, f"nondeterministic result in block {bid}"
