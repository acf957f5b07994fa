"""The skinny (gather) exchange must be a pure representation change:
match_pipeline output with the gather path (default at test scale) must be
bit-identical to the legacy payload-through-shuffle path
(GRAFT_GATHER_MAX_BYTES=0 disables the gather gate)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from uk_address_matcher_ray.pipelines.match import match_pipeline
from uk_address_matcher_ray.sources import synth
from uk_address_matcher_ray.stages import tf as tf_mod
from uk_address_matcher_ray.stages.block import SIDE_COL
from uk_address_matcher_ray.stages.clean import clean_batch
from uk_address_matcher_ray.state.model import MatchModel


def _tagged_cleaned():
    keys = list(range(1, 120))
    canon, messy = synth.canonical_table(keys), synth.messy_table(keys)
    union = pa.concat_tables([canon, messy])
    addrs = union.column("address_concat").to_pylist()
    tok_counts, _n, end_counts, _nt = tf_mod.corpus_token_stats(addrs)
    cleaned = clean_batch(
        union, tf_mod.rel_freq_table(tok_counts), tf_mod.end_token_set(end_counts)
    )
    side = pa.array(
        [0] * canon.num_rows + [1] * messy.num_rows, pa.int8()
    ).take(
        pa.compute.index_in(
            cleaned.column("unique_id"), value_set=union.column("unique_id")
        )
    )
    return cleaned.append_column(SIDE_COL, side)


def _run(cleaned_tagged, gather_max: str):
    import ray

    old = os.environ.get("GRAFT_GATHER_MAX_BYTES")
    os.environ["GRAFT_GATHER_MAX_BYTES"] = gather_max
    try:
        ds = ray.data.from_arrow(cleaned_tagged)
        out = match_pipeline(ds, None, MatchModel(), None, salt_threshold=50)
        tbl = pa.concat_tables(
            [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
        )
    finally:
        if old is None:
            os.environ.pop("GRAFT_GATHER_MAX_BYTES", None)
        else:
            os.environ["GRAFT_GATHER_MAX_BYTES"] = old
    cols = sorted(tbl.column_names)
    rows = sorted(
        tuple(repr(row[c]) for c in cols) for row in tbl.select(cols).to_pylist()
    )
    return cols, rows


@pytest.mark.usefixtures("ray_session")
def test_gather_equals_legacy_exchange():
    cleaned = _tagged_cleaned()
    cols_g, rows_g = _run(cleaned, str(4 << 30))  # gather path (fits)
    cols_l, rows_l = _run(cleaned, "0")  # legacy payload shuffle
    assert cols_g == cols_l
    assert rows_g == rows_l
    assert len(rows_g) > 0


@pytest.mark.usefixtures("ray_session")
def test_gather_with_empty_blocks():
    """Empty cleaned blocks must not shift the gather row indices: the
    combined payload skips them while the per-block offsets count them at
    zero rows."""
    import ray

    cleaned = _tagged_cleaned()
    half = cleaned.num_rows // 2
    parts = [
        cleaned.slice(0, half),
        cleaned.slice(0, 0),  # empty block in the middle
        cleaned.slice(half),
    ]
    ds = ray.data.from_arrow(parts[0])
    for p in parts[1:]:
        ds = ds.union(ray.data.from_arrow(p))

    old = os.environ.get("GRAFT_GATHER_MAX_BYTES")
    os.environ["GRAFT_GATHER_MAX_BYTES"] = str(4 << 30)
    try:
        out = match_pipeline(ds, None, MatchModel(), None, salt_threshold=50)
        tbl = pa.concat_tables(
            [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
        )
    finally:
        if old is None:
            os.environ.pop("GRAFT_GATHER_MAX_BYTES", None)
        else:
            os.environ["GRAFT_GATHER_MAX_BYTES"] = old
    cols = sorted(tbl.column_names)
    rows = sorted(
        tuple(repr(row[c]) for c in cols) for row in tbl.select(cols).to_pylist()
    )
    _cols_ref, rows_ref = _run(_tagged_cleaned(), str(4 << 30))
    assert rows == rows_ref
