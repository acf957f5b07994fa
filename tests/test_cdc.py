"""Content-defined chunking: oracle parity, partition property,
boundary-resync property, edges."""

import duckdb
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from uk_address_matcher_ray.stages.cdc import cdc_chunks, cdc_chunks_sql

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]


def _chunks(texts, k=3, divisor=4):
    import ray

    docs = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    df = cdc_chunks(ray.data.from_arrow(docs), k=k, divisor=divisor).to_pandas()
    if len(df):
        df = df.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    return df, docs


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(WORDS), max_size=40).map(" ".join),
        max_size=8,
    )
)
def test_cdc_oracle_parity(texts):
    out, docs = _chunks(texts)
    con = duckdb.connect()
    con.register("documents", docs)
    exp = (
        con.sql(cdc_chunks_sql(k=3, divisor=4))
        .df()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    con.close()
    if len(exp) == 0:
        assert len(out) == 0  # all-empty docs: schemaless empty frame
        return
    assert out.equals(exp[out.columns])


@pytest.mark.usefixtures("ray_session")
def test_cdc_partition_property():
    texts = [" ".join(WORDS * 10), "one two", "", None]
    out, _ = _chunks(texts)
    # chunks partition each non-empty doc: contiguous, full coverage
    for did, grp in out.groupby("doc_id"):
        grp = grp.sort_values("chunk_idx")
        assert list(grp.chunk_idx) == list(range(len(grp)))
        expect_start = 0
        for _, r in grp.iterrows():
            assert r.start_pos == expect_start
            expect_start += r.n_tokens
        n_toks = len((texts[did] or "").split())
        assert expect_start == n_toks
    # empty/None docs emit nothing
    assert set(out.doc_id) == {0, 1}


@pytest.mark.usefixtures("ray_session")
def test_cdc_resync_after_prefix_edit():
    base = " ".join(WORDS * 5)
    out, _ = _chunks([base, "inserted " + base], k=3, divisor=3)
    h0 = set(out[out.doc_id == 0].chunk_hash)
    h1 = set(out[out.doc_id == 1].chunk_hash)
    # content-defined: all but the first chunk(s) re-synchronize
    assert len(h0 & h1) >= len(h0) - 2
