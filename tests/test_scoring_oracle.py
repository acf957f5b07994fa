"""Differential test: engine blocking+scoring vs the DuckDB scoring oracle.

Runs both on the synth labeled corpus with on-the-fly TF; asserts the exact
same pair set, match_key and bit-identical match weights.
"""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pyarrow as pa

from uk_address_matcher_ray import oracle, oracle_scoring
from uk_address_matcher_ray.functions.compare import prepare_row, score_pair
from uk_address_matcher_ray.sources import synth
from uk_address_matcher_ray.stages import tf as tf_mod
from uk_address_matcher_ray.stages.block import row_block_keys
from uk_address_matcher_ray.stages.clean import clean_batch
from uk_address_matcher_ray.state.model import MatchModel

KEYS = list(range(1, 120))


def _engine_pairs():
    model = MatchModel()
    canon = synth.canonical_table(KEYS)
    messy = synth.messy_table(KEYS)
    union = pa.concat_tables([canon, messy])
    addrs = union.column("address_concat").to_pylist()
    tok_counts, num_counts, end_counts, _nt = tf_mod.corpus_token_stats(addrs)
    tf = tf_mod.rel_freq_table(tok_counts)
    num_tf = tf_mod.rel_freq_table(num_counts)
    end_tokens = tf_mod.end_token_set(end_counts)
    numeric_tf = {f"numeric_token_{i}": num_tf for i in (1, 2, 3)}

    cleaned = clean_batch(union, tf, end_tokens).to_pylist()
    l_rows = [r for r in cleaned if r["unique_id"].startswith("c")]
    r_rows = [r for r in cleaned if r["unique_id"].startswith("m")]

    by_key_l = defaultdict(list)
    for row in l_rows:
        for rid, key in row_block_keys(row, model, side=0):
            by_key_l[key].append((rid, row))
    pair_rules = defaultdict(list)
    pair_rows = {}
    for rrow in r_rows:
        for rid, key in row_block_keys(rrow, model, side=1):
            for lrid, lrow in by_key_l.get(key, []):
                pid = (lrow["unique_id"], rrow["unique_id"])
                pair_rules[pid].append(lrid)
                pair_rows[pid] = (lrow, rrow)
    out = {}
    for pid, rules in pair_rules.items():
        lrow, rrow = pair_rows[pid]
        mw, _p, _g = score_pair(
            prepare_row(lrow), prepare_row(rrow), model, numeric_tf
        )
        if mw >= -50.0:
            out[pid] = (min(rules), mw)
    return out


def _oracle_pairs():
    con = duckdb.connect()
    keys_sql = "SELECT unnest(range(1, 120)) AS c_custkey"
    union_input = (
        f"SELECT * FROM ({synth.canonical_sql(keys_sql)}) "
        f"UNION ALL SELECT * FROM ({synth.messy_sql(keys_sql)})"
    )
    cleaned_sql = oracle.cleaned_features_sql(union_input)
    ntf_sql = oracle.numeric_tf_table_sql(union_input)
    sql = oracle_scoring.predict_pairs_sql(cleaned_sql, ntf_sql)
    rows = con.sql(sql).fetchall()
    con.close()
    return {(r[0], r[1]): (r[2], r[3]) for r in rows}


def test_scoring_differential():
    eng = _engine_pairs()
    orc = _oracle_pairs()
    assert set(eng) == set(orc), (
        f"pair sets differ: only-engine={list(set(eng)-set(orc))[:5]} "
        f"only-oracle={list(set(orc)-set(eng))[:5]}"
    )
    for pid in eng:
        e_rule, e_mw = eng[pid]
        o_rule, o_mw = orc[pid]
        assert e_rule == o_rule, (pid, e_rule, o_rule)
        assert e_mw == o_mw, (pid, e_mw, o_mw, e_mw - o_mw)


def test_cluster_oracle_runs():
    con = duckdb.connect()
    keys_sql = "SELECT unnest(range(1, 120)) AS c_custkey"
    union_input = (
        f"SELECT * FROM ({synth.canonical_sql(keys_sql)}) "
        f"UNION ALL SELECT * FROM ({synth.messy_sql(keys_sql)})"
    )
    cleaned_sql = oracle.cleaned_features_sql(union_input)
    ntf_sql = oracle.numeric_tf_table_sql(union_input)
    pairs_sql = oracle_scoring.predict_pairs_sql(cleaned_sql, ntf_sql)
    rows = con.sql(oracle_scoring.clusters_sql(pairs_sql, threshold=5.0)).fetchall()
    con.close()
    labels = dict(rows)
    # every matched messy node shares its label with its true canonical node
    agree = sum(
        1
        for n, lab in labels.items()
        if n.startswith("m_m") and labels.get("c_c" + n[3:]) == lab
    )
    total = sum(1 for n in labels if n.startswith("m_m"))
    assert total > 0 and agree / total >= 0.95, (agree, total)
