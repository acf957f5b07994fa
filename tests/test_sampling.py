"""stratified_sample (stages/sampling.py): determinism, rate accuracy,
null-stratum default, and block-order invariance. The driver oracle
covers sf0.01 bit-exactness vs the DuckDB md5 mirror."""

import hashlib

import pyarrow as pa
import ray

from uk_address_matcher_ray.stages.sampling import (
    _threshold_hex,
    sample_key,
    stratified_sample,
)


def _tbl(n=2000):
    langs = ["en", "de", "zh", None]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array([langs[i % 4] for i in range(n)], pa.string()),
        }
    )


RATES = {"en": 1.0, "de": 0.5, "zh": 0.0}


def test_keep_decision_matches_scalar_rule():
    tbl = _tbl()
    out = stratified_sample(
        ray.data.from_arrow(tbl), RATES, default_rate=0.25
    ).take_all()
    got = {r["doc_id"] for r in out}
    langs = tbl.column("lang").to_pylist()
    for i in range(tbl.num_rows):
        rate = RATES.get(langs[i], 0.25) if langs[i] is not None else 0.25
        t = _threshold_hex(rate)
        expect = t is None or sample_key(i) < t
        assert (i in got) == expect
    # rate sanity: en all kept, zh none, de ~half
    by_lang = {}
    for r in out:
        by_lang[r["stratum"]] = by_lang.get(r["stratum"], 0) + 1
    assert by_lang.get("en") == 500
    assert "zh" not in by_lang
    assert 180 < by_lang.get("de", 0) < 320
    assert 60 < by_lang.get(None, 0) < 190


def test_block_order_and_seed():
    tbl = _tbl(400)
    a = sorted(
        r["doc_id"]
        for r in stratified_sample(
            ray.data.from_arrow(tbl).repartition(7), RATES
        ).take_all()
    )
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(ray.data.from_arrow(tbl), RATES).take_all()
    )
    assert a == b  # pure function of the row
    c = sorted(
        r["doc_id"]
        for r in stratified_sample(
            ray.data.from_arrow(tbl), RATES, seed=1
        ).take_all()
    )
    assert a != c  # seed changes the draw


def test_sample_key_is_md5_prefix():
    assert sample_key(42, seed=3) == hashlib.md5(b"3:42").hexdigest()[:8]
