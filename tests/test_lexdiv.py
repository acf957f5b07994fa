"""Lexical diversity: oracle parity, known ratios, edge cases."""

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.textstats import (
    lexical_diversity,
    lexical_diversity_sql,
)


@pytest.mark.usefixtures("ray_session")
def test_lexdiv_known_and_oracle():
    import ray

    texts = ["the cat the cat the", "a b c d", "", None, "x",
             "spam spam spam spam", "Mixed CASE mixed case"]
    docs = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    out = (
        lexical_diversity(ray.data.from_arrow(docs))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    exp = (
        con.sql(lexical_diversity_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con.close()
    assert out.equals(exp[out.columns])

    by = out.set_index("doc_id")
    assert by.loc[0, "ttr"] == 0.4          # 2 types / 5 tokens
    assert by.loc[1, "ttr"] == 1.0          # all distinct
    assert by.loc[5, "ttr"] == 0.25         # pure repetition
    assert by.loc[6, "n_distinct"] == 2     # casefolded types
    assert set(out.doc_id) == {0, 1, 4, 5, 6}  # empty/None: no row


@pytest.mark.usefixtures("ray_session")
def test_lexdiv_partition_invariance():
    import ray

    texts = [f"tok{i % 7} tok{i % 3} filler" for i in range(50)]
    docs = pa.table(
        {"doc_id": pa.array(range(50), pa.int64()), "text": texts}
    )
    one = sorted(
        map(repr, lexical_diversity(ray.data.from_arrow(docs)).take_all())
    )
    many = sorted(
        map(
            repr,
            lexical_diversity(
                ray.data.from_arrow(docs).repartition(9)
            ).take_all(),
        )
    )
    assert one == many
