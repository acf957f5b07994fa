"""The Python and SQL synth generators must produce byte-identical tables."""

import duckdb
import pyarrow as pa

from uk_address_matcher_ray.sources import synth


def test_python_sql_mirror():
    keys = list(range(1, 200))
    con = duckdb.connect()
    con.register("customer", pa.table({"c_custkey": pa.array(keys, pa.int64())}))
    for py_tbl, sql in (
        (synth.canonical_table(keys), synth.canonical_sql()),
        (synth.messy_table(keys), synth.messy_sql()),
    ):
        sql_tbl = con.sql(sql).arrow()
        assert py_tbl.to_pylist() == sql_tbl.to_pylist()
    con.close()


def test_truth_labels_shape():
    keys = [1, 2, 3, 4, 5, 6]
    labels = synth.truth_labels(keys)
    assert labels == {"m1": "c1", "m2": "c2", "m4": "c4", "m5": "c5"}
