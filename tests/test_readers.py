"""Ingest adapters (S5) vs the reference's fake CSV fixtures, and the S6
broadcast semi join."""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.csv as pacsv
import pytest

from uk_address_matcher_ray.sources.readers import (
    epc_adapter,
    fhrs_adapter,
    filter_to_overlapping_postcodes,
    os_adapter,
)

REF = Path("/root/reference/tests/test_data")


def _load(name):
    if not REF.exists():
        pytest.skip("reference fixtures not available")
    return pacsv.read_csv(str(REF / name))


def test_epc_adapter():
    out = epc_adapter(_load("epc_fake.csv"))
    assert set(out.column_names) >= {"unique_id", "address_concat", "postcode"}
    rows = out.to_pylist()
    assert all(r["unique_id"] for r in rows)
    assert all("  " not in (r["address_concat"] or "x") for r in rows)


def test_os_adapter_strips_last_comma_field_and_nao():
    tbl = pa.table(
        {
            "uprn": pa.array([1, 2], pa.int64()),
            "fulladdress": pa.array(
                ["10 HIGH ST, TOWN, AB1 2CD", "SOMEWHERE, XX9 9XX"], pa.string()
            ),
            "postcode": pa.array(["AB1 2CD", "XX9 9XX"], pa.string()),
            "description": pa.array(
                ["Residential", "Non Addressable Object"], pa.string()
            ),
        }
    )
    out = os_adapter(tbl).to_pylist()
    assert len(out) == 1
    assert out[0]["address_concat"] == "10 HIGH ST, TOWN"


def test_fhrs_adapter():
    out = fhrs_adapter(_load("fhrs_fake.csv"))
    rows = out.to_pylist()
    assert all(r["unique_id"] for r in rows)


@pytest.mark.usefixtures("ray_session")
def test_postcode_semi_join():
    import ray

    canonical = ray.data.from_items(
        [
            {"unique_id": "c1", "postcode": "AA1 1AA"},
            {"unique_id": "c2", "postcode": "BB2 2BB"},
            {"unique_id": "c3", "postcode": None},
        ]
    )
    messy = ray.data.from_items([{"unique_id": "m1", "postcode": "AA1 1AA"}])
    kept = filter_to_overlapping_postcodes(canonical, messy).take_all()
    assert [r["unique_id"] for r in kept] == ["c1"]


@pytest.mark.usefixtures("ray_session")
def test_uprn_agreement():
    import ray

    from uk_address_matcher_ray.pipelines.evaluate import uprn_agreement

    best = ray.data.from_items(
        [
            {"unique_id_r": "m1", "unique_id_l": "100"},
            {"unique_id_r": "m2", "unique_id_l": "200"},
            {"unique_id_r": "m3", "unique_id_l": None},
            {"unique_id_r": "m4", "unique_id_l": "400"},
        ]
    )
    counts = uprn_agreement(best, {"m1": "100", "m2": "999", "m3": "300"})
    assert counts == {"agree": 1, "disagree": 1, "no_claim": 1, "unmatched": 1}
