"""TF-table build pipeline from raw address snapshots (reference
scripts/generate_better_tfs.py:50-155).

The reference's flow: Companies-House PSC JSON snapshots -> per-file address
extraction (nested data->address fields, UK-country filter, concat_ws) ->
``select distinct on (address_concat, postcode)`` -> address-token and
numeric-token TF tables -> zstd parquet.

Ray-Data-first version: extraction is a batch transform over
``read_json`` output; the distinct is a hash groupby keeping min(unique_id)
(DuckDB's DISTINCT ON keeps an arbitrary row — min is the deterministic
choice, mirrored in the oracle); TF counting reuses the partial-count +
vocabulary-sized shuffle of stages/tf.py; outputs are partitioned parquet.
"""

from __future__ import annotations

from collections import Counter
from typing import Optional, Tuple

import pyarrow as pa

UK_COUNTRIES = (
    "England",
    "United Kingdom",
    "Scotland",
    "Wales",
    "Northern Ireland",
    "Great Britain",
)

_ADDR_PARTS = ("premises", "address_line_1", "address_line_2", "locality", "region")


def psc_address_records(ds, file_identifier: str = "psc"):
    """PSC-shaped rows (nested ``data.address``) -> (unique_id,
    address_concat, postcode), UK rows only (generate_better_tfs.py:50-90).

    unique_id = '{file_identifier}_{n}' assigned per batch from the global
    row position (deterministic for a deterministic input order).
    """

    def extract(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        addrs, pcs = [], []
        for row in rows:
            data = row.get("data") or {}
            addr = data.get("address") or {}
            country = addr.get("country")
            if country is not None and country not in UK_COUNTRIES:
                continue
            parts = [addr.get(p) for p in _ADDR_PARTS]
            concat = " ".join(p for p in parts if p)  # concat_ws skips NULLs
            addrs.append(concat if concat else None)
            pcs.append(addr.get("postal_code"))
        return pa.table(
            {
                "address_concat": pa.array(addrs, pa.string()),
                "postcode": pa.array(pcs, pa.string()),
            }
        )

    extracted = ds.map_batches(extract, batch_format="pyarrow")

    def add_ids(batch: pa.Table, *, _ctr=Counter()) -> pa.Table:
        # per-worker monotonic ids: '{file_identifier}_{worker-local n}' —
        # ids only need uniqueness + determinism of the min per address,
        # which the distinct step's groupby-min provides
        import hashlib

        uids = []
        for a, p in zip(
            batch.column("address_concat").to_pylist(),
            batch.column("postcode").to_pylist(),
        ):
            h = hashlib.md5(f"{a}\x1f{p}".encode()).hexdigest()[:16]
            _ctr[h] += 1
            uids.append(f"{file_identifier}_{h}_{_ctr[h]}")
        return batch.append_column("unique_id", pa.array(uids, pa.string()))

    return extracted.map_batches(add_ids, batch_format="pyarrow")


def distinct_addresses(ds):
    """One row per (address_concat, postcode), keeping min(unique_id) —
    deterministic DISTINCT ON (generate_better_tfs.py:133-138)."""
    return (
        ds.groupby(["address_concat", "postcode"])
        .min("unique_id")
        .map_batches(
            lambda t: t.rename_columns(["address_concat", "postcode", "unique_id"]),
            batch_format="pyarrow",
        )
    )


def build_tf_tables(ds) -> Tuple[pa.Table, pa.Table]:
    """-> (address-token TF table, numeric-token TF table).

    Address TF = T1 semantics (numeric_token_1..3 columns + address tokens,
    cleaning_steps.py:289-323); numeric TF = unnested numeric_tokens
    (cleaning_pipelines.py:183-217). Distributed partial counts, one
    vocabulary-sized shuffle (stages/tf.py)."""
    from uk_address_matcher_ray.stages.tf import corpus_stats_dataset, rel_freq_table

    agg = corpus_stats_dataset(ds).take_all()
    tok_counts: Counter = Counter()
    num_counts: Counter = Counter()
    for r in agg:
        if r["kind"] in (0, 3):
            tok_counts[r["token"]] += r["sum(count)"]
        elif r["kind"] == 1:
            num_counts[r["token"]] += r["sum(count)"]
    tok_rel = rel_freq_table(tok_counts)
    num_rel = rel_freq_table(num_counts)

    def table(rel, name):
        items = sorted(rel.items())
        return pa.table(
            {
                "token" if name == "rel_freq" else "numeric_token": pa.array(
                    [k for k, _ in items], pa.string()
                ),
                name: pa.array([v for _, v in items], pa.float64()),
            }
        )

    return table(tok_rel, "rel_freq"), table(num_rel, "tf_numeric_token")


def build_tf_tables_to_parquet(ds, out_dir: str) -> Tuple[str, str]:
    """Full pipeline: distinct -> TF tables -> parquet files
    (address_token_frequencies.parquet / numeric_token_frequencies.parquet,
    the reference's artifact names)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    tok_tbl, num_tbl = build_tf_tables(distinct_addresses(ds))
    tok_path = os.path.join(out_dir, "address_token_frequencies.parquet")
    num_path = os.path.join(out_dir, "numeric_token_frequencies.parquet")
    pq.write_table(tok_tbl, tok_path, compression="zstd")
    pq.write_table(num_tbl, num_path, compression="zstd")
    return tok_path, num_path
