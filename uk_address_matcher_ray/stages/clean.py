"""Fused cleaning stage: C1-C11 + T3 + P1-P5 as one Arrow batch transform.

The reference folds these steps as a queue of SQL relations
(cleaning_pipelines.py:38-65); here they fuse into a single row-local pass —
no shuffle, executed via ``Dataset.map_batches`` with an actor pool so the TF
dict and end-token set load once per worker (SURVEY.md §2.4 RD note).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, FrozenSet, Iterable, List, Optional

import pyarrow as pa

from uk_address_matcher_ray import schema as sch
from uk_address_matcher_ray.functions import features as F
from uk_address_matcher_ray.functions import text as T

# Columns consumed/produced by the chain; everything else passes through.
_CONSUMED = {"address_concat", "postcode", "source_dataset"}


@dataclass
class CoreRow:
    """Result of the TF-independent cleaning core (C1-C11) for one record."""

    postcode: Optional[str]
    original: Optional[str]
    flat_positional: Optional[str]
    flat_letter: Optional[str]
    numeric_tokens: Optional[List[str]]
    nt1: Optional[str]
    nt2: Optional[str]
    nt3: Optional[str]
    address_without_numbers: Optional[str]
    tokens: Optional[List[str]]


def _clean_core_row(
    addr: Optional[str], pc: Optional[str], *, prepped: bool = False
) -> Optional[CoreRow]:
    """C1-C11 for one row; returns None when the reference would drop the row
    (NULL address_concat -> NULL token array -> inner-join drop,
    cleaning_steps.py:330-366).

    ``prepped=True``: addr/pc already went through the vectorized string
    prefix (functions/text.clean_*_vec) — skip to the parsing steps."""
    if prepped:
        s = addr
    else:
        pc = T.upper(T.canonicalise_postcode(T.trim(pc)))
        s = T.upper(T.trim(addr))
        s = T.clean_address_first_pass(s)
    s = T.remove_duplicate_end_tokens(s)
    original = s
    flat_positional, flat_letter = T.parse_flat_position_and_letter(s)
    without, numeric_tokens = T.parse_out_numbers(s, flat_letter)
    without = T.clean_second_pass(without)
    nt1, nt2, nt3 = T.split_numeric_tokens(numeric_tokens)
    tokens = T.tokenise(without)
    if tokens is None:
        return None
    return CoreRow(
        postcode=pc,
        original=original,
        flat_positional=flat_positional,
        flat_letter=flat_letter,
        numeric_tokens=numeric_tokens,
        nt1=nt1,
        nt2=nt2,
        nt3=nt3,
        address_without_numbers=without,
        tokens=tokens,
    )


def clean_batch(
    batch: pa.Table,
    tf: Dict[str, float],
    end_tokens: FrozenSet[str],
) -> pa.Table:
    """Apply the full cleaning queue to one Arrow batch.

    Rows whose address_concat is NULL are dropped — the reference's TF stage
    unnests the token array and INNER JOINs back on unique_id, which drops
    rows with NULL token arrays (cleaning_steps.py:330-366).
    """
    addr_in = T.clean_address_first_pass_vec(
        batch.column("address_concat").cast(pa.string())
    ).to_pylist()
    pc_in = T.clean_postcode_vec(batch.column("postcode").cast(pa.string())).to_pylist()

    keep_idx: List[int] = []
    out = {name: [] for name in sch.CLEANED_COLUMN_NAMES if name != "unique_id"}

    for i, (addr, pc) in enumerate(zip(addr_in, pc_in)):
        core = _clean_core_row(addr, pc, prepped=True)
        if core is None:
            continue  # NULL address_concat: dropped by reference's inner join
        keep_idx.append(i)
        # T3 + P1-P4
        arr = F.attach_term_frequencies(core.tokens, tf)
        arr, common = F.move_common_end_tokens(arr, end_tokens)
        fu = F.first_unusual_token(arr)
        nt1, arr = F.promote_first_unusual(core.nt1, arr, fu)
        unusual, very, extremely = F.separate_unusual_tokens(arr)

        out["numeric_token_1"].append(nt1)
        out["numeric_token_2"].append(core.nt2)
        out["numeric_token_3"].append(core.nt3)
        out["token_rel_freq_arr_hist"].append(F.histogram(arr))
        out["common_end_tokens_hist"].append(F.histogram(common))
        out["postcode"].append(core.postcode)
        out["original_address_concat"].append(core.original)
        out["flat_positional"].append(core.flat_positional)
        out["flat_letter"].append(core.flat_letter)
        out["unusual_tokens_arr"].append(unusual)
        out["very_unusual_tokens_arr"].append(very)
        out["extremely_unusual_tokens_arr"].append(extremely)
        out["address_without_numbers"].append(core.address_without_numbers)

    taken = batch.take(pa.array(keep_idx, type=pa.int64()))
    cols: List[pa.Array] = []
    names: List[str] = []
    for f in sch.CLEANED_FIELDS:
        names.append(f.name)
        if f.name == "unique_id":
            cols.append(taken.column("unique_id").cast(pa.string()).combine_chunks())
        else:
            cols.append(pa.array(out[f.name], type=f.type))
    # passthrough of any retained extra input columns (readme.md:24-31)
    for name in batch.column_names:
        if name not in _CONSUMED and name != "unique_id":
            names.append(name)
            cols.append(taken.column(name).combine_chunks())
    return pa.table(cols, names=names)


def dispatch_clean_batch(
    batch: pa.Table, tf: Dict[str, float], end_tokens: FrozenSet[str]
) -> pa.Table:
    """Route to the vectorized core (stages/clean_vec.py, bit-identical by
    differential property test, ~5x single-thread) unless GRAFT_CLEAN_VEC=0
    pins the per-row spec path."""
    import os

    if os.environ.get("GRAFT_CLEAN_VEC", "1") != "0":
        from uk_address_matcher_ray.stages.clean_vec import clean_batch_vec

        return clean_batch_vec(batch, tf, end_tokens)
    return clean_batch(batch, tf, end_tokens)


class CleaningStage:
    """Actor-pool callable for ``Dataset.map_batches``.

    TF dict and end-token set are built once per actor in __init__ from
    object-store refs (broadcast via ``ray.put``), not per batch.
    """

    def __init__(self, tf_ref, end_tokens_ref):
        import ray

        tf = tf_ref
        if not isinstance(tf, dict):
            tf = ray.get(tf)
        end_tokens = end_tokens_ref
        if not isinstance(end_tokens, (frozenset, set)):
            end_tokens = ray.get(end_tokens)
        self.tf = tf
        self.end_tokens = frozenset(end_tokens)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return dispatch_clean_batch(batch, self.tf, self.end_tokens)


def clean_dataset(
    ds,
    tf: Dict[str, float],
    end_tokens: Iterable[str],
    *,
    concurrency: Optional[int] = None,
    batch_size: int = 4096,
):
    """Clean a Dataset of raw address records -> cleaned-feature Dataset.

    ``tf``/``end_tokens`` are placed in the object store once (broadcast join
    replacing the reference's LEFT JOIN rel_tok_freq,
    cleaning_steps.py:339-342) and resolved once per worker process via the
    ``get_broadcast`` memo. Task-based map_batches: no actor-pool spawn
    latency, workers come from the prestarted raylet pool. ``concurrency``
    is accepted for API compatibility (tasks autoscale to the cluster)."""
    import ray

    from uk_address_matcher_ray.util import get_broadcast

    tf_ref = ray.put(dict(tf))
    end_ref = ray.put(frozenset(end_tokens))

    def clean_task(batch: pa.Table) -> pa.Table:
        return dispatch_clean_batch(
            batch, get_broadcast(tf_ref), get_broadcast(end_ref)
        )

    return ds.map_batches(
        clean_task,
        batch_format="pyarrow",
        batch_size=batch_size,
    )
