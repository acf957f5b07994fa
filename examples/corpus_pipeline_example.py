"""LLM-corpus pipeline example: the dedup / similarity / temporal
operators over the synthetic documents + events tables.

Run: python examples/corpus_pipeline_example.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import pyarrow.compute as pc

    from uk_address_matcher_ray.stages.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        near_dedup_docs,
    )
    from uk_address_matcher_ray.stages.joins import asof_join, range_join
    from uk_address_matcher_ray.stages.sessions import sessionize
    from uk_address_matcher_ray.stages.textstats import text_stats_dataset

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )

    # 1. exact dedup: hash-partition + first-per-group
    uniq = exact_dedup(docs, id_col="doc_id", text_col="text")
    print("exact-dedup survivors:", uniq.count())

    # 2. minhash-LSH near-dup pairs -> components -> survivors
    pairs = minhash_lsh_pairs(
        docs, id_col="doc_id", text_col="text",
        num_perm=16, bands=4, shingle_k=5, jaccard_threshold=0.8,
    )
    survivors = near_dedup_docs(docs, pairs, id_col="doc_id")
    print("near-dedup survivors:", survivors.count())

    # 3. text quality stats (lang-id, token counts, fingerprints)
    print("text stats sample:", text_stats_dataset(docs).take(2))

    # 3b. line-level boilerplate removal (CCNet-style), PII scrub and
    # URL/domain filters — the web-corpus hygiene trio
    import pyarrow as pa

    from uk_address_matcher_ray.stages.linededup import line_dedup_docs
    from uk_address_matcher_ray.stages.pii import redact_pii
    from uk_address_matcher_ray.stages.urls import (
        domain_doc_stats,
        filter_blocked_domains,
    )

    def to_lines(batch: pa.Table) -> pa.Table:
        texts = [
            (t or "").replace(" the ", "\n") for t in
            batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "text": pa.array(texts, pa.string())}
        )

    lined = docs.map_batches(to_lines, batch_format="pyarrow")
    cleaned = line_dedup_docs(lined, min_docs=5)
    print("line-dedup sample:", cleaned.take(1))

    print("pii-redacted sample:", redact_pii(docs).take(1))

    def add_url(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        urls = [f"https://site{i % 11}.example.com/p/{i}" for i in ids]
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "url": pa.array(urls, pa.string())}
        )

    with_urls = docs.map_batches(add_url, batch_format="pyarrow")
    print("domain stats:", domain_doc_stats(with_urls).take(3))
    blocked = filter_blocked_domains(with_urls, frozenset({"example.com"}))
    print("after blocklist:", blocked.count())

    # 4. temporal operators over the events stream
    ev_cols = ["event_id", "ts", "user_id", "event_type", "value"]

    def only(kind):
        def f(b):
            return b.filter(pc.equal(b.column("event_type"), kind))

        return f

    purchases = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=ev_cols
    ).map_batches(only("purchase"), batch_format="pyarrow")
    signups = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=ev_cols
    ).map_batches(only("signup"), batch_format="pyarrow")

    latest_signup = asof_join(
        purchases, signups, key="user_id", ts="ts", right_cols=["ts"]
    )
    print("purchases with a prior signup:", latest_signup.count())

    nearby = range_join(
        purchases, signups, key="user_id", ts="ts",
        window=86_400_000_000, right_cols=["ts"],
    )
    print("purchase/signup pairs within 1 day:", nearby.count())

    sessions = sessionize(
        ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
        ),
        key="user_id", ts="ts", gap=6 * 3600 * 1_000_000,
        value="value", tiebreak="event_id",
    )
    print("user sessions:", sessions.count())

    ray.shutdown()


if __name__ == "__main__":
    main()
