"""Adversarial tests for grouped_map's adjacency-chain boundary repair and
the tagged-union blocking path (round-2 performance rewrites — these pin the
exact-semantics invariants the fast paths rely on)."""

import pyarrow as pa
import pytest


def _make_group_sum_fn():
    """Complete-group reducer factory: (key, n_rows, sum_val) per group.

    Returned as a CLOSURE so cloudpickle serializes it by value — test
    modules are not importable on Ray workers."""

    def group_sum(tbl: pa.Table) -> pa.Table:
        keys = tbl.column("k").to_pylist()
        vals = tbl.column("v").to_pylist()
        out_k, out_n, out_s = [], [], []
        cur, n, s = None, 0, 0
        for key, v in zip(keys, vals):
            if cur is not None and key != cur:
                out_k.append(cur)
                out_n.append(n)
                out_s.append(s)
                n, s = 0, 0
            cur = key
            n += 1
            s += v
        if cur is not None:
            out_k.append(cur)
            out_n.append(n)
            out_s.append(s)
        return pa.table(
            {
                "k": pa.array(out_k, pa.string()),
                "n": pa.array(out_n, pa.int64()),
                "s": pa.array(out_s, pa.int64()),
            }
        )

    return group_sum


OUT_SCHEMA = pa.schema(
    [
        pa.field("k", pa.string()),
        pa.field("n", pa.int64()),
        pa.field("s", pa.int64()),
    ]
)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("hot_fraction", [0.0, 0.5, 0.95])
def test_grouped_map_hot_key_spans_many_blocks(hot_fraction):
    """A single key holding up to 95% of all rows straddles MANY sorted
    blocks; the chain repair must still process every group exactly once
    with all its rows."""
    import ray

    from uk_address_matcher_ray.stages.grouped import grouped_map

    n = 20_000
    n_hot = int(n * hot_fraction)
    keys = ["HOT"] * n_hot + [f"k{i % 997:03d}" for i in range(n - n_hot)]
    vals = list(range(n))
    tbl = pa.table({"k": pa.array(keys, pa.string()), "v": pa.array(vals, pa.int64())})
    # many small input blocks so the sort yields many output blocks
    slices = [tbl.slice(i, 500) for i in range(0, n, 500)]
    ds = ray.data.from_arrow(slices)

    out = grouped_map(ds, "k", None, OUT_SCHEMA, fn_table=_make_group_sum_fn())
    got = out.to_pandas().sort_values("k").reset_index(drop=True)

    import collections

    expect_n = collections.Counter(keys)
    expect_s = collections.defaultdict(int)
    for k, v in zip(keys, vals):
        expect_s[k] += v
    assert len(got) == len(expect_n), "each group exactly once"
    for _, row in got.iterrows():
        assert row["n"] == expect_n[row["k"]], row["k"]
        assert row["s"] == expect_s[row["k"]], row["k"]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("hot_fraction", [0.0, 0.6])
def test_hash_and_sort_exchanges_agree(hot_fraction):
    """grouped_map's hash exchange (default) and sort exchange (fallback)
    must produce the same group results."""
    import ray

    from uk_address_matcher_ray.stages import grouped

    n = 8_000
    n_hot = int(n * hot_fraction)
    keys = ["HOT"] * n_hot + [f"k{i % 499:03d}" for i in range(n - n_hot)]
    vals = list(range(n))
    tbl = pa.table({"k": pa.array(keys, pa.string()), "v": pa.array(vals, pa.int64())})
    slices = [tbl.slice(i, 300) for i in range(0, n, 300)]

    fn = _make_group_sum_fn()
    via_hash = (
        grouped.grouped_map(
            ray.data.from_arrow(slices), "k", None, OUT_SCHEMA, fn_table=fn
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    run_complete = grouped._make_run_complete("k", None, fn, OUT_SCHEMA)
    via_sort = (
        grouped._grouped_map_sort(
            ray.data.from_arrow(slices).materialize(), "k", run_complete, OUT_SCHEMA
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert via_hash.equals(via_sort)


@pytest.mark.usefixtures("ray_session")
def test_tagged_union_blocking_equals_two_sided():
    """scored_pairs_raw over a tagged union must produce the identical pair
    multiset as the classic two-sided call."""
    import ray

    from tests.corpus import synth_addresses
    from uk_address_matcher_ray.stages.block import SIDE_COL
    from uk_address_matcher_ray.stages.clean import clean_dataset
    from uk_address_matcher_ray.stages.score import scored_pairs_raw
    from uk_address_matcher_ray.stages.tf import collect_corpus_stats
    from uk_address_matcher_ray.state.model import MatchModel
    from uk_address_matcher_ray.util import dataset_from_table

    rows = synth_addresses(400)
    half = len(rows) // 2

    def to_tbl(rs, side):
        t = pa.table(
            {
                "unique_id": pa.array([r[0] for r in rs], pa.string()),
                "address_concat": pa.array([r[1] for r in rs], pa.string()),
                "postcode": pa.array([r[2] for r in rs], pa.string()),
            }
        )
        if side is not None:
            t = t.append_column(
                SIDE_COL, pa.array([side] * t.num_rows, pa.int8())
            )
        return t

    model = MatchModel()
    l_rows, r_rows = rows[:half], rows[half:]

    raw_l = dataset_from_table(to_tbl(l_rows, None), target_blocks=3)
    raw_r = dataset_from_table(to_tbl(r_rows, None), target_blocks=3)
    tf, num_tf, end_tokens = collect_corpus_stats(raw_l.union(raw_r))
    numeric_tf = {f"numeric_token_{i}": num_tf for i in (1, 2, 3)}

    cleaned_l = clean_dataset(raw_l, tf, end_tokens).materialize()
    cleaned_r = clean_dataset(raw_r, tf, end_tokens).materialize()
    two_sided = scored_pairs_raw(
        cleaned_l, cleaned_r, model, numeric_tf, salt_threshold=50
    ).to_pandas()

    tagged_tbl = pa.concat_tables(
        [to_tbl(l_rows, 0), to_tbl(r_rows, 1)]
    )
    tagged = clean_dataset(
        dataset_from_table(tagged_tbl, target_blocks=5), tf, end_tokens
    ).materialize()
    one_pass = scored_pairs_raw(
        tagged, None, model, numeric_tf, salt_threshold=50
    ).to_pandas()

    import numpy as np

    cols = sorted(set(two_sided.columns) & set(one_pass.columns))

    def canon(df):
        df = df[cols].copy()
        for c in df.columns:
            df[c] = df[c].map(
                lambda v: repr(list(v) if isinstance(v, np.ndarray) else v)
            )
        return df.sort_values(cols).reset_index(drop=True)

    a, b = canon(two_sided), canon(one_pass)
    assert len(a) == len(b)
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_tagged_hot_keys_match_two_sided():
    """compute_hot_keys over a tagged union (raw-task path) must find the
    same hot keys / salt grids as the classic two-sided counting pass."""
    import ray

    from tests.test_checkpoint_and_salting import _cleaned_rows
    from uk_address_matcher_ray.stages.block import SIDE_COL, compute_hot_keys
    from uk_address_matcher_ray.state.model import MatchModel

    keys = list(range(1, 40))
    cleaned = _cleaned_rows(keys)
    model = MatchModel()
    l_tbl = cleaned.filter(
        pa.compute.match_substring_regex(cleaned.column("unique_id"), "^c")
    )
    r_tbl = cleaned.filter(
        pa.compute.match_substring_regex(cleaned.column("unique_id"), "^m")
    )
    two_sided = compute_hot_keys(
        ray.data.from_arrow(l_tbl),
        model,
        salt_threshold=2,
        cleaned_r=ray.data.from_arrow(r_tbl),
    )
    tagged_tbl = pa.concat_tables(
        [
            l_tbl.append_column(
                SIDE_COL, pa.array([0] * l_tbl.num_rows, pa.int8())
            ),
            r_tbl.append_column(
                SIDE_COL, pa.array([1] * r_tbl.num_rows, pa.int8())
            ),
        ]
    )
    # single block: counting floors coincide -> exact grid parity
    tagged_one = compute_hot_keys(
        ray.data.from_arrow(tagged_tbl).materialize(),
        model,
        salt_threshold=2,
        tagged=True,
    )
    assert tagged_one == two_sided

    # multi-block: the pigeonhole floor may UNDERCOUNT keys spread thinly
    # across blocks (salting is a performance hint — results are identical
    # at any grid, asserted by the salting-coverage tests); the found keys
    # must be a subset with grids no larger than the exact ones
    slices = [tagged_tbl.slice(i, 16) for i in range(0, tagged_tbl.num_rows, 16)]
    tagged_many = compute_hot_keys(
        ray.data.from_arrow(slices).materialize(),
        model,
        salt_threshold=2,
        tagged=True,
    )
    assert set(tagged_many) <= set(two_sided)
    for k, (kl, kr) in tagged_many.items():
        assert kl <= two_sided[k][0] and kr <= two_sided[k][1]


@pytest.mark.usefixtures("ray_session")
def test_distributed_label_propagation_matches_broadcast():
    """The >threshold distributed fallback must produce the identical label
    table as the broadcast path (chains, stars, cross-block components)."""
    import ray

    from uk_address_matcher_ray.stages.cluster import propagate_labels

    # chain 0-1-2-...-9, star around h0, some singleton pairs
    edges = []
    for i in range(9):
        edges.append((f"n{i}", f"n{i+1}"))
    for i in range(12):
        edges.append(("h0", f"s{i:02d}"))
    edges.append(("z1", "z2"))
    src = [a for a, b in edges] + [b for a, b in edges]
    dst = [b for a, b in edges] + [a for a, b in edges]
    tbl = pa.table({"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())})
    slices = [tbl.slice(i, 7) for i in range(0, tbl.num_rows, 7)]

    broadcast = (
        propagate_labels(ray.data.from_arrow(slices))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    distributed = (
        propagate_labels(ray.data.from_arrow(slices), broadcast_threshold=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert broadcast.equals(distributed)
    # spot-check semantics: lexicographic min of each component
    lab = dict(zip(broadcast["node"], broadcast["label"]))
    assert lab["n9"] == "n0"
    assert lab["h0"] == "h0" and lab["s11"] == "h0"
    assert lab["z2"] == "z1"


@pytest.mark.usefixtures("ray_session")
def test_district_synth_scales_size_not_density():
    """Scaled bench corpora: district-offset keys must not share block keys
    (cross-pair work stays linear in the input)."""
    from collections import Counter

    from uk_address_matcher_ray.sources.synth import (
        DISTRICT_SPAN,
        canonical_table,
    )

    base = list(range(1, 201))
    k2 = [k + DISTRICT_SPAN for k in base]
    t1 = canonical_table(base)
    t2 = canonical_table(k2)
    pc1 = set(p.split(" ")[0] for p in t1.column("postcode").to_pylist())
    pc2 = set(p.split(" ")[0] for p in t2.column("postcode").to_pylist())
    assert not (pc1 & pc2), "outward codes must be district-distinct"
    tok1 = Counter(
        t
        for a in t1.column("address_concat").to_pylist()
        for t in a.split(" ")
    )
    tok2 = Counter(
        t
        for a in t2.column("address_concat").to_pylist()
        for t in a.split(" ")
    )
    street1 = {t for t in tok1 if any(s in t for s in ("PEPPER", "HIGH", "STATION", "CHURCH", "MILL", "VICTORIA", "QUEENSWAY", "ACACIA"))}
    street2 = {t for t in tok2 if any(s in t for s in ("PEPPER", "HIGH", "STATION", "CHURCH", "MILL", "VICTORIA", "QUEENSWAY", "ACACIA"))}
    assert not (street1 & street2), "street name tokens must be district-distinct"
