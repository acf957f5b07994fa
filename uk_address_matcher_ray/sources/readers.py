"""Sources/sinks + ingest adapters (SURVEY.md §2.1).

S1/S2: thin wrappers over ray.data read APIs with column pruning pushed to
the read (a read that loads all columns for a 2-column transform is wrong at
scale). S5: the reference's inline-SQL ingest adapters for EPC / OS-gazetteer
/ FHRS shaped files re-expressed as Arrow batch transforms. S6: the
postcode semi-join filter as a broadcast membership test (small side
collected once, shipped via ray.put — no shuffle join).
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence

import pyarrow as pa


def read_parquet(paths, columns: Optional[Sequence[str]] = None, **kwargs):
    import ray

    return ray.data.read_parquet(paths, columns=list(columns) if columns else None, **kwargs)


def read_csv(paths, **kwargs):
    import ray

    return ray.data.read_csv(paths, **kwargs)


def read_json(paths, **kwargs):
    """S3 (scripts/generate_better_tfs.py:50-77): JSON source for TF-table
    builds; thin wrapper so every reference source format has a reader."""
    import ray

    return ray.data.read_json(paths, **kwargs)


def write_partitioned_parquet(ds, path: str):
    """Resumable sink: one directory of files per Ray block (never one giant
    file); pair with state/checkpoint.PipelineRun for manifest+resume."""
    ds.write_parquet(path)
    return path


_LAST_COMMA_FIELD = re.compile(r",[^,]*$")


def epc_adapter(batch: pa.Table) -> pa.Table:
    """EPC certificates shape -> address contract
    (examples/match_epc_to_os.py:34-45): unique_id=lmk_key,
    address_concat=concat_ws(' ', address1..3), postcode."""
    import pyarrow.compute as pc

    def col(name):
        return (
            batch.column(name).cast(pa.string())
            if name in batch.column_names
            else pa.nulls(batch.num_rows, pa.string())
        )

    a1, a2, a3 = col("address1"), col("address2"), col("address3")
    addr = [
        " ".join(x for x in parts if x)
        for parts in zip(a1.to_pylist(), a2.to_pylist(), a3.to_pylist())
    ]
    out = {
        "unique_id": col("lmk_key"),
        "address_concat": pa.array(addr, pa.string()),
        "postcode": col("postcode"),
    }
    for extra in ("uprn", "uprn_source"):
        if extra in batch.column_names:
            out[extra] = batch.column(extra)
    return pa.table(out)


def os_adapter(batch: pa.Table) -> pa.Table:
    """OS gazetteer shape -> address contract
    (examples/match_epc_to_os.py:47-59): strip the trailing comma-field of
    fulladdress (the postcode repeat), drop Non Addressable Objects."""
    rows = batch.to_pylist()
    keep = [r for r in rows if r.get("description") != "Non Addressable Object"]
    return pa.table(
        {
            "unique_id": pa.array([str(r["uprn"]) for r in keep], pa.string()),
            "address_concat": pa.array(
                [
                    _LAST_COMMA_FIELD.sub("", r.get("fulladdress") or "")
                    for r in keep
                ],
                pa.string(),
            ),
            "postcode": pa.array([r.get("postcode") for r in keep], pa.string()),
        }
    )


def fhrs_adapter(batch: pa.Table) -> pa.Table:
    """FHRS shape -> address contract (examples/fhrs/match_fhrs_to_os.py:31-44)."""

    def col(name):
        return (
            batch.column(name).cast(pa.string()).to_pylist()
            if name in batch.column_names
            else [None] * batch.num_rows
        )

    lines = list(
        zip(
            col("AddressLine1"), col("AddressLine2"), col("AddressLine3"), col("AddressLine4")
        )
    )
    return pa.table(
        {
            "unique_id": pa.array(col("fhrsid"), pa.string()),
            "address_concat": pa.array(
                [" ".join(x for x in parts if x) for parts in lines], pa.string()
            ),
            "postcode": pa.array(col("PostCode"), pa.string()),
        }
    )


def filter_to_overlapping_postcodes(canonical_ds, messy_ds):
    """S6 (examples/match_epc_to_os.py:47-59): keep canonical rows whose
    postcode appears in the messy set — broadcast semi join (distinct messy
    postcodes are small; shipped once via ray.put)."""
    import ray

    def distinct_pcs(batch: pa.Table) -> pa.Table:
        vals = {
            v
            for v in batch.column("postcode").to_pylist()
            if v is not None
        }
        return pa.table({"postcode": pa.array(sorted(vals), pa.string())})

    pcs = set()
    for row in (
        messy_ds.select_columns(["postcode"])
        .map_batches(distinct_pcs, batch_format="pyarrow")
        .take_all()
    ):
        pcs.add(row["postcode"])
    ref = ray.put(frozenset(pcs))

    def keep(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ref)
        mask = [v in wanted for v in batch.column("postcode").to_pylist()]
        return batch.filter(pa.array(mask, pa.bool_()))

    return canonical_ds.map_batches(keep, batch_format="pyarrow")
