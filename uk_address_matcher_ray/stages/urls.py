"""URL parsing and domain-level operators for web corpora.

Every published web-corpus pipeline (C4, CCNet, RefinedWeb, FineWeb)
keys quality decisions on the source URL: parse out the host, reduce it
to the registered domain (eTLD+1), aggregate per domain, and filter
against domain blocklists.  The reference engine has no counterpart;
part of the LLM-training-data surface this engine adds.

Scale shape:
* ``parse_urls`` — row-local ``map_batches``, zero shuffles.  The
  scheme/host/path/query split is vectorized RE2
  (``pc.extract_regex``); the registered-domain reduction runs over the
  batch's DICTIONARY-ENCODED hosts (each distinct host computed once
  per batch — web corpora repeat hosts heavily within a shard).
* ``domain_doc_stats`` — per-batch partial aggregation (distinct
  (domain, host) pairs + doc counts combined inside ``map_batches``)
  before ONE domain-keyed exchange; only domain-cardinality rows ride
  the shuffle.
* ``filter_blocked_domains`` — blocklist broadcast once (``ray.put`` +
  per-worker memo), row-local filter; blocklists are MBs, not TBs.

The public-suffix reduction uses a built-in mini-list of multi-label
suffixes (the full Mozilla PSL is a data file this container doesn't
ship; the lookup structure and the per-distinct-host code path are the
real ones — swap ``_MULTI_LABEL_SUFFIXES`` for the full list in
production).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from uk_address_matcher_ray import util

# RE2-safe URL split; mirrored by the DuckDB oracle (same groups, DuckDB
# regexp_extract takes group indices). A non-participating optional query
# group comes back as '' in BOTH engines (RE2 semantics), not null.
URL_RE = (
    r"^(?P<scheme>[a-z][a-z0-9+.\-]*)://"
    r"(?P<host>[^/?#]*)(?P<path>[^?#]*)(?P<query>\?[^#]*)?"
)

# multi-label public suffixes recognized by the eTLD+1 reduction
# (production: the full public-suffix list — same lookup shape)
_MULTI_LABEL_SUFFIXES = frozenset(
    {"co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "co.jp", "com.br"}
)


def registered_domain(host: str) -> str:
    """eTLD+1: last two labels, or last three when the last two form a
    known multi-label suffix ('a.b.co.uk' -> 'b.co.uk').  Hosts with
    fewer labels and IP-like hosts (digits and dots only — the oracle
    mirrors this exact test) pass through unchanged."""
    import re

    if host and not re.search(r"[^0-9.]", host):
        return host
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    if ".".join(labels[-2:]) in _MULTI_LABEL_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def _parse_batch(urls) -> dict:
    """Vectorized parse of one batch's url column -> dict of arrays."""
    m = pc.extract_regex(urls, URL_RE)
    # StructArray.field() does NOT merge the struct-level validity of
    # non-matching rows into the child — mask explicitly so unparsed
    # urls carry nulls in every output column
    valid = pc.is_valid(m)
    null_str = pa.scalar(None, pa.string())

    def _field(name: str):
        # pc.struct_field handles both Array and ChunkedArray structs
        return pc.if_else(valid, pc.struct_field(m, name), null_str)

    scheme = _field("scheme")
    host = _field("host")
    path = _field("path")
    query = _field("query")
    # registered domain over DISTINCT hosts only
    d = host.dictionary_encode()
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    dict_vals = d.dictionary.to_pylist()
    reg = [None if h is None else registered_domain(h) for h in dict_vals]
    reg_arr = pa.DictionaryArray.from_arrays(
        d.indices, pa.array(reg, pa.string())
    ).cast(pa.string())
    return {
        "scheme": scheme,
        "host": host,
        "registered_domain": reg_arr,
        "path": path,
        "query": query,
    }


def parse_urls(ds, id_col: str = "doc_id", url_col: str = "url"):
    """-> Dataset(id, scheme, host, registered_domain, path, query);
    rows whose url does not parse carry nulls in every parsed column."""

    def kernel(batch: pa.Table) -> pa.Table:
        parts = _parse_batch(batch.column(url_col))
        return pa.table({id_col: batch.column(id_col), **parts})

    return ds.map_batches(kernel, batch_format="pyarrow")


def domain_doc_stats(ds, id_col: str = "doc_id", url_col: str = "url"):
    """-> Dataset(registered_domain, n_docs, n_hosts): document count
    and distinct-host count per registered domain.

    Partial-aggregates inside each batch — per-batch distinct
    (domain, host) pairs with doc counts — so the exchange carries
    domain-cardinality rows, then one grouped pass finishes the distinct
    host count and the doc sum."""
    from uk_address_matcher_ray.stages.grouped import grouped_map

    def partial(batch: pa.Table) -> pa.Table:
        parts = _parse_batch(batch.column(url_col))
        t = pa.table(
            {
                "registered_domain": parts["registered_domain"],
                "host": parts["host"],
            }
        ).drop_null()
        return t.group_by(["registered_domain", "host"]).aggregate(
            [([], "count_all")]
        )

    def finalize(tbl: pa.Table) -> pa.Table:
        per_host = tbl.group_by(["registered_domain", "host"]).aggregate(
            [("count_all", "sum")]
        )
        agg = per_host.group_by("registered_domain").aggregate(
            [("host", "count"), ("count_all_sum", "sum")]
        )
        return pa.table(
            {
                "registered_domain": agg.column("registered_domain"),
                "n_docs": agg.column("count_all_sum_sum").cast(pa.int64()),
                "n_hosts": agg.column("host_count").cast(pa.int64()),
            }
        )

    pairs = ds.map_batches(partial, batch_format="pyarrow")
    out_schema = pa.schema(
        [
            pa.field("registered_domain", pa.string()),
            pa.field("n_docs", pa.int64()),
            pa.field("n_hosts", pa.int64()),
        ]
    )
    return grouped_map(
        pairs, "registered_domain", None, out_schema, fn_table=finalize
    )


def filter_blocked_domains(
    ds,
    blocklist,
    id_col: str = "doc_id",
    url_col: str = "url",
    keep_unparsed: bool = False,
):
    """Drop rows whose registered domain is in ``blocklist`` (a
    frozenset[str] or a ``ray.put`` ref of one, broadcast once).  Rows
    whose url fails to parse are dropped unless ``keep_unparsed``."""

    def kernel(batch: pa.Table) -> pa.Table:
        blocked = util.get_broadcast(blocklist)
        parts = _parse_batch(batch.column(url_col))
        reg = parts["registered_domain"]
        is_null = pc.is_null(reg).to_numpy(zero_copy_only=False)
        hit = np.fromiter(
            (r is not None and r in blocked for r in reg.to_pylist()),
            bool,
            batch.num_rows,
        )
        keep = ~hit
        if not keep_unparsed:
            keep &= ~is_null
        return batch.filter(pa.array(keep))

    return ds.map_batches(kernel, batch_format="pyarrow")


def _best_per_url(
    tbl: pa.Table, url_col: str, ts_col: str, id_col: str
) -> pa.Table:
    """One row per url: max ts, ties -> min id (sort + run-starts take)."""
    idx = pc.sort_indices(
        tbl,
        sort_keys=[
            (url_col, "ascending"),
            (ts_col, "descending"),
            (id_col, "ascending"),
        ],
    )
    s = tbl.take(idx)
    urls = s.column(url_col).to_numpy(zero_copy_only=False)
    if len(urls) == 0:
        return s
    starts = np.concatenate(
        [[0], np.flatnonzero(urls[1:] != urls[:-1]) + 1]
    )
    return s.take(pa.array(starts, pa.int64()))


def url_dedup(
    ds,
    id_col: str = "doc_id",
    url_col: str = "url",
    ts_col: str = "fetch_ts",
):
    """Cross-snapshot URL dedup: keep the NEWEST fetch per exact URL
    (max ``ts_col``; ties -> min ``id_col``) — the re-crawl collapse every
    Common-Crawl-style pipeline runs before content dedup.

    -> Dataset(url, id, ts) with one row per distinct url.

    Scale shape: per-batch pre-reduction (the same best-per-url kernel run
    WITHIN each batch — re-crawls of a url cluster inside snapshot shards)
    so the exchange carries distinct-urls-per-batch rows; one url-keyed
    grouped pass resolves the global winner. The key is the url string
    itself (short, and the exchange is already distinct-per-batch) — no
    hash-collision risk to reason about."""
    from uk_address_matcher_ray.stages.grouped import grouped_map

    in_schema = ds.schema()
    types = {n: t for n, t in zip(in_schema.names, in_schema.types)}

    def partial(batch: pa.Table) -> pa.Table:
        return _best_per_url(
            batch.select([url_col, id_col, ts_col]), url_col, ts_col, id_col
        )

    def finalize(tbl: pa.Table) -> pa.Table:
        return _best_per_url(tbl, url_col, ts_col, id_col)

    out_schema = pa.schema(
        [
            pa.field(url_col, types[url_col]),
            pa.field(id_col, types[id_col]),
            pa.field(ts_col, types[ts_col]),
        ]
    )
    pre = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_map(pre, url_col, None, out_schema, fn_table=finalize)
