"""Differential test: Ray-engine cleaning vs the DuckDB oracle.

Feeds the identical rows to ``clean_batch`` (pure Python/Arrow, no Ray
needed) and to the oracle SQL mirroring the reference's cleaning queue, and
asserts byte-identical output column by column (SURVEY.md §5 plan).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

from tests.corpus import reference_edge_case_addresses, synth_addresses
from uk_address_matcher_ray import oracle
from uk_address_matcher_ray.stages.clean import clean_batch
from uk_address_matcher_ray.stages import tf as tf_mod


def _input_table(rows):
    return pa.table(
        {
            "unique_id": pa.array([r[0] for r in rows], pa.string()),
            "address_concat": pa.array([r[1] for r in rows], pa.string()),
            "postcode": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def _engine_clean(tbl: pa.Table) -> pa.Table:
    addrs = tbl.column("address_concat").to_pylist()
    tok_counts, _num, end_counts, _nt = tf_mod.corpus_token_stats(addrs)
    tf = tf_mod.rel_freq_table(tok_counts)
    end_tokens = tf_mod.end_token_set(end_counts)
    out = clean_batch(tbl, tf, end_tokens)
    return out.sort_by("unique_id")


def _oracle_clean(tbl: pa.Table) -> pa.Table:
    con = duckdb.connect()
    con.register("input_rows", tbl)
    sql = oracle.cleaned_features_sql("SELECT * FROM input_rows")
    out = con.sql(sql + " ORDER BY unique_id").arrow()
    con.close()
    return out


def _compare(engine: pa.Table, orc: pa.Table):
    assert engine.num_rows == orc.num_rows
    assert engine.column_names == orc.column_names
    e_rows = engine.to_pylist()
    o_rows = orc.to_pylist()
    for er, orow in zip(e_rows, o_rows):
        for col in engine.column_names:
            assert er[col] == orow[col], (
                f"mismatch uid={er['unique_id']} col={col}:\n"
                f"  engine: {er[col]!r}\n  oracle: {orow[col]!r}"
            )


def test_cleaning_differential_synth():
    tbl = _input_table(synth_addresses(400))
    _compare(_engine_clean(tbl), _oracle_clean(tbl))


def test_cleaning_differential_reference_yaml():
    rows = reference_edge_case_addresses()
    if not rows:
        pytest.skip("reference YAML not available")
    tbl = _input_table(rows)
    _compare(_engine_clean(tbl), _oracle_clean(tbl))


def test_reference_unit_cases_flat_parse():
    """Inline expected I/O from the reference's own unit tests
    (cleaning/tests/test_cleaning_steps.py:34-82)."""
    from uk_address_matcher_ray.functions.text import parse_flat_position_and_letter

    cases = [
        ("11A SPITFIRE COURT 243 BIRMINGHAM", None, "A"),
        ("FLAT A 11 SPITFIRE COURT 243 BIRMINGHAM", None, "A"),
        ("BASEMENT FLAT A 11 SPITFIRE COURT 243 BIRMINGHAM", "BASEMENT", "A"),
        ("BASEMENT FLAT 11 SPITFIRE COURT 243 BIRMINGHAM", "BASEMENT", None),
        ("GARDEN FLAT 11 SPITFIRE COURT 243 BIRMINGHAM", "GARDEN", None),
        ("TOP FLOOR FLAT 12A HIGH STREET", "TOP FLOOR", "A"),
        ("GROUND FLOOR FLAT B 25 MAIN ROAD", "GROUND FLOOR", "B"),
        ("FIRST FLOOR 15B LONDON ROAD", "FIRST FLOOR", "B"),
        ("UNIT C MY HOUSE 120 MY ROAD", None, "C"),
    ]
    for s, exp_pos, exp_letter in cases:
        pos, letter = parse_flat_position_and_letter(s)
        assert pos == exp_pos, s
        assert letter == exp_letter, s


def test_reference_unit_cases_duplicate_end_tokens():
    """cleaning/tests/test_cleaning_steps.py:85-111."""
    from uk_address_matcher_ray.functions.text import remove_duplicate_end_tokens

    cases = [
        ("9A SOUTHVIEW ROAD SOUTHWICK LONDON LONDON", "9A SOUTHVIEW ROAD SOUTHWICK LONDON"),
        ("1 HIGH STREET ST ALBANS ST ALBANS", "1 HIGH STREET ST ALBANS"),
        (
            "2 CORINATION ROAD KINGS LANGLEY HERTFORDSHIRE HERTFORDSHIRE",
            "2 CORINATION ROAD KINGS LANGLEY HERTFORDSHIRE",
        ),
        ("FLAT 2 8 ORCHARD WAY MILTON KEYNES MILTON KEYNES", "FLAT 2 8 ORCHARD WAY MILTON KEYNES"),
        ("9 SOUTHVIEW ROAD SOUTHWICK LONDON", "9 SOUTHVIEW ROAD SOUTHWICK LONDON"),
        ("1 LONDON ROAD LONDON", "1 LONDON ROAD LONDON"),
    ]
    for s, expected in cases:
        assert remove_duplicate_end_tokens(s) == expected


def test_tf_builders_match_oracle():
    tbl = _input_table(synth_addresses(200, seed=7))
    con = duckdb.connect()
    con.register("input_rows", tbl)
    addrs = tbl.column("address_concat").to_pylist()

    # T1 with numeric tokens
    eng = tf_mod.token_tf_with_numeric(addrs)
    orc = dict(
        con.sql(oracle.token_tf_table_sql("SELECT * FROM input_rows")).fetchall()
    )
    assert eng == orc

    # T4 numeric TF
    _tok, num_counts, _end, _nt = tf_mod.corpus_token_stats(addrs)
    eng_num = tf_mod.rel_freq_table(num_counts)
    orc_num = dict(
        con.sql(oracle.numeric_tf_table_sql("SELECT * FROM input_rows")).fetchall()
    )
    assert eng_num == orc_num
    con.close()
