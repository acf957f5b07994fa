"""Character entropy: known values, oracle parity incl. non-ASCII,
edge cases."""

import math

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.textstats import (
    char_entropy,
    char_entropy_sql,
)


@pytest.mark.usefixtures("ray_session")
def test_char_entropy_known_and_oracle():
    import ray

    texts = ["aaaa", "abab", "the quick brown fox", "", None, "é漢字é", "x"]
    docs = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    out = (
        char_entropy(ray.data.from_arrow(docs))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    exp = (
        con.sql(char_entropy_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con.close()
    assert out.equals(exp[out.columns])

    by_id = out.set_index("doc_id")
    assert by_id.loc[0, "entropy"] == 0.0          # single repeated char
    assert by_id.loc[1, "entropy"] == round(math.log(2), 6)  # 2 equal
    assert by_id.loc[6, "entropy"] == 0.0          # length-1 doc
    assert set(out.doc_id) == {0, 1, 2, 5, 6}      # empty/None: no row
    # codepoint (not byte) counting: "é漢字é" has 4 codepoints, 3 distinct
    assert by_id.loc[5, "n_chars"] == 4


@pytest.mark.usefixtures("ray_session")
def test_char_entropy_bounds():
    import ray

    texts = ["abcdefgh", "aabbccdd", "aaaaaaab"]
    docs = pa.table(
        {"doc_id": pa.array(range(3), pa.int64()), "text": texts}
    )
    out = char_entropy(ray.data.from_arrow(docs)).to_pandas()
    by_id = out.set_index("doc_id")
    # uniform-8 maximizes entropy at ln(8); skewed distribution is lower
    assert by_id.loc[0, "entropy"] == round(math.log(8), 6)
    assert by_id.loc[1, "entropy"] == round(math.log(4), 6)
    assert 0 < by_id.loc[2, "entropy"] < by_id.loc[1, "entropy"]
