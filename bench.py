#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default: runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and prints ONE JSON line:
{"metric": ..., "value": seconds, "unit": "sec", "queries": {...},
 "sf": ..., "num_cpus": N, "counters": {...}}.

--scaling: runs the headline ER pipeline in FRESH processes at two
parallelism levels (default num_cpus=4 then 16, i.e. N and 4N; override via
GRAFT_SCALING_CPUS) on the same input — the sandbox evidence plan for the
two-cluster-size criterion, BASELINE.md — and reports both throughputs plus
scaling efficiency = thr_4N / (4 * thr_N), with per-leg cpu_ref samples and
a throttle-rejection rule (samples taken while the host ran >1.3x slower
than the session's fastest observed cpu_ref are discarded).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


SCALE_MULT = int(os.environ.get("GRAFT_SCALE_MULT", "1"))


def _flagship(sf_dir: str, mult: int = 1):
    """Headline: synth web pages from customer -> extract -> clean -> block/
    score -> rescore. Returns (messy_count, pair_count).

    ``mult`` replicates the key space (disjoint offsets) so the scaling runs
    measure a compute-bound job rather than fixed scheduling overhead; both
    parallelism levels see the identical input."""
    import ray

    import __ray_entry__ as entry
    from uk_address_matcher_ray.sources import synth
    from uk_address_matcher_ray.pipelines.match import flagship_pipeline
    from uk_address_matcher_ray.sources.webpages import synth_web_pages
    from uk_address_matcher_ray.util import dataset_from_table

    import numpy as np
    import pyarrow as pa

    base = entry._custkeys(sf_dir)
    keys = np.sort(
        (
            np.asarray(base, dtype=np.int64)[None, :]
            + 300_000 * np.arange(mult, dtype=np.int64)[:, None]
        ).ravel()
    )
    n_messy = int(np.count_nonzero(keys % 3 != 0))

    def host_of(i, uid):
        return f"host{int(uid[1:]) % 97}.example"

    def page_batches(tbl):
        rows = tbl.to_pylist()
        return synth_web_pages(
            [(r["unique_id"], r["address_concat"], r["postcode"]) for r in rows],
            host_of=host_of,
        )

    # the synthetic input tables build DISTRIBUTED from a tiny key Dataset —
    # a driver-side row loop here is O(input) serial work inside the timed
    # window (measured ~4 s at x64, straight into the Amdahl serial term)
    keys_ds = dataset_from_table(pa.table({"k": keys}))

    def messy_pages(batch):
        return page_batches(synth.messy_table(batch.column("k").to_pylist()))

    def canon_pages(batch):
        return page_batches(synth.canonical_table(batch.column("k").to_pylist()))

    pages_m = keys_ds.map_batches(messy_pages, batch_format="pyarrow")
    pages_c = keys_ds.map_batches(canon_pages, batch_format="pyarrow")
    pairs, labels = flagship_pipeline(pages_m, pages_c, cluster_threshold=5.0)
    n_pairs = pairs.count()
    n_nodes = labels.count()
    return n_messy, n_pairs, n_nodes


def _bench_queries(sf_dir: str) -> dict:
    """Secondary per-pipeline timings over the sf tables."""
    import __ray_entry__ as entry

    qs = entry.queries()
    timings = {}
    for name in [
        "exact_dedup_docs",
        "duplicate_spans",
        "minhash_pairs",
        "ngram_jaccard_pairs",
        "near_dedup_docs",
        "simhash_pairs",
        "text_stats",
        "doc_repetition",
        "decontaminate_docs",
        "bloom_decontaminate",
        "lm_perplexity",
        "bpe_merges",
        "remove_duplicate_spans",
        "quality_scores",
        "group_cap_docs",
        "token_budget_docs",
        "length_quantiles",
        "normalize_docs",
        "tfidf_topk",
        "ngram_topk",
        "curate_docs",
        "image_dhash",
        "image_near_dup",
        "video_frames",
        "audio_power",
        "line_dedup_docs",
        "redact_pii",
        "parse_urls",
        "domain_doc_stats",
        "domain_pagerank",
        "dsir_select",
        "incremental_dedup_docs",
        "inverted_index",
        "bm25_topk",
        "embedding_near_dup",
        "ann_topk",
        "events_hourly",
        "events_asof_join",
        "events_range_join",
        "user_sessions",
        "events_rolling",
        "chunk_docs",
        "ccnet_buckets",
        "winnow_pairs",
        "embedding_pca",
        "nb_lang_id",
        "domain_hits",
        "hash_embed",
        "token_pmi",
        "source_kl",
        "cdc_chunks",
        "domain_triangles",
        "funnel_conversions",
        "temperature_mix",
        "domain_kcore",
        "char_entropy",
        "profile_documents",
        "length_outliers",
        "fk_coverage",
        "latest_events",
        "jl_project",
        "lineitem_pricing",
        "lexical_diversity",
        "sample_exact_n",
        "late_ship_priority",
        "revenue_by_nation",
        "length_pct_rank",
        "orders_by_month",
        "top_parts_by_revenue",
        "user_timelines",
        "ac_scan",
        "predict_pairs",
        "match_clusters",
        "train_em",
    ]:
        t0 = time.monotonic()
        res = qs[name](sf_dir)
        try:
            import ray

            if isinstance(res, ray.data.Dataset):
                res.count()
        except Exception:
            pass
        timings[name] = round(time.monotonic() - t0, 3)
    return timings


def _cpu_ref_sec() -> float:
    """Single-core reference microbenchmark (fixed Python work). This sandbox
    VM throttles unpredictably (observed 3-5x swings); recording the machine
    speed alongside each run makes timings comparable across rounds.
    Typical unthrottled value ~0.55 s."""
    t0 = time.monotonic()
    s = 0
    for i in range(10_000_000):
        s += i
    return round(time.monotonic() - t0, 3)


def _cpu_ref_par_sec(n_procs: int = 8) -> float:
    """Parallel reference: ``n_procs`` busy-loop PROCESSES (the single-core
    probe misses multi-core bandwidth-contention windows — observed 2x
    parallel-throughput degradation at matched single-core cpu_ref).
    Healthy value ~= cpu_ref_sec; a ratio >> 1.3x cpu_ref means the host's
    parallel lanes are degraded and walls are not comparable."""
    import multiprocessing as mp

    t0 = time.monotonic()
    with mp.get_context("fork").Pool(n_procs) as pool:
        pool.map(_par_work, range(n_procs))
    return round(time.monotonic() - t0, 3)


def _par_work(_):
    s = 0
    for i in range(10_000_000):
        s += i
    return s


def run_once(num_cpus: int, include_queries: bool = True) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="error",
        )
    # NOTE: ShuffleStrategy.HASH_SHUFFLE measured ~35% faster on groupbys at
    # 16+ CPUs but its aggregator actors reserve CPUs and can starve map tasks
    # in small sessions (observed hang at num_cpus=8); left at the default.
    # The VM throttles progressively within a session (observed 3-5x, see
    # BENCH/BASELINE.md): a single flagship sample can misread as a
    # regression. Take best-of-N (GRAFT_BENCH_REPEATS, default 2) and record
    # every (time, cpu_ref) sample so rounds compare at matched machine speed.
    repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "2"))
    runs = []
    for _ in range(max(1, repeats)):
        t0 = time.monotonic()
        n_messy, n_pairs, n_nodes = _flagship(SF_DIR, mult=SCALE_MULT)
        runs.append((round(time.monotonic() - t0, 3), _cpu_ref_sec()))
    flagship_sec = min(r[0] for r in runs)

    queries = {"flagship_er": round(flagship_sec, 3)}
    if include_queries:
        queries.update(_bench_queries(SF_DIR))

    result = {
        "metric": "flagship_er_end_to_end",
        "value": round(flagship_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": num_cpus,
        "counters": {
            "messy_records": n_messy,
            "improved_pairs": n_pairs,
            "cluster_nodes": n_nodes,
            "messy_per_sec": round(n_messy / flagship_sec, 1),
            "cpu_ref_sec": runs[-1][1],
            "cpu_ref_par_sec": _cpu_ref_par_sec(),
            "flagship_runs": runs,
        },
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job, fresh processes, num_cpus=8 then 32 (N vs 4N).

    GRAFT_SCALING_REPEATS (default 1) reruns each leg and keeps its BEST
    time: this sandbox VM throttles unpredictably mid-run (cpu_ref swings
    3-5x, and the throttle tends to worsen over a session, biasing whichever
    leg runs later), so single-shot leg pairs routinely compare a throttled
    leg against an unthrottled one. Alternating repeats and taking per-leg
    minima compares like with like; every sample is recorded in counters."""
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
    # N and 4N CPUs; default 4/16 — the honest evidence pair on this box:
    # it saturates beyond ~16 workers (host oversubscription: 16- and
    # 32-CPU walls are equal within noise, busy-loop ceiling ~0.83), so an
    # 8->32 ratio measures the host's cliff, not the engine. See
    # BENCH/BASELINE.md.
    lo, hi = (
        int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "4,16").split(",")
    )
    samples = {lo: [], hi: []}
    for _rep in range(repeats):
        for n in (lo, hi):
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(n),
                GRAFT_SCALE_MULT=os.environ.get("GRAFT_SCALE_MULT", "8"),
                # leg-level best-of is handled here via GRAFT_SCALING_REPEATS
                GRAFT_BENCH_REPEATS=os.environ.get("GRAFT_BENCH_REPEATS", "1"),
            )
            proc = subprocess.run(
                [sys.executable, __file__, "--child"],
                env=env,
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
            samples[n].append(json.loads(line))
    # Throttle rejection: this VM's effective core speed swings 3-5x; a leg
    # sampled during a throttle window poisons the ratio in either
    # direction. cpu_ref measures machine speed per sample; the session
    # MINIMUM is the least-throttled observation (a median can itself be a
    # throttled sample when repeats are small), so reject samples whose
    # cpu_ref exceeds 1.3x that floor before taking per-leg bests (fall
    # back to the raw best — and say so — if a leg loses every sample).
    all_refs = sorted(
        r["counters"]["cpu_ref_sec"] for runs in samples.values() for r in runs
    )
    med_ref = all_refs[0]
    cut = 1.3 * med_ref
    # same floor rule for the PARALLEL probe: it catches multi-core
    # bandwidth-degradation windows invisible to the single-core probe
    # (observed: 2x wall inflation at matched cpu_ref, par probe 1.9x)
    par_refs = sorted(
        r["counters"].get("cpu_ref_par_sec", 0.0)
        for runs in samples.values()
        for r in runs
    )
    par_floor = par_refs[0]
    par_cut = 1.3 * par_floor if par_floor else float("inf")

    def ok(r):
        c = r["counters"]
        return (
            c["cpu_ref_sec"] <= cut
            and c.get("cpu_ref_par_sec", 0.0) <= par_cut
        )

    rejected = {
        n: sum(1 for r in runs if not ok(r)) for n, runs in samples.items()
    }
    out = {}
    throttled_leg = []
    for n, runs in samples.items():
        clean = [r for r in runs if ok(r)]
        if not clean:
            clean = runs
            throttled_leg.append(n)
        out[n] = min(clean, key=lambda r: r["value"])
    thr_lo = out[lo]["counters"]["messy_per_sec"]
    thr_hi = out[hi]["counters"]["messy_per_sec"]
    eff = thr_hi / (4.0 * thr_lo)
    result = {
        "metric": f"scaling_efficiency_{lo}_to_{hi}_cpus",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {
            f"flagship_er_{lo}cpu": out[lo]["value"],
            f"flagship_er_{hi}cpu": out[hi]["value"],
        },
        "sf": SF_DIR,
        "num_cpus": hi,
        "counters": {
            "messy_records": out[lo]["counters"]["messy_records"],
            f"messy_per_sec_{lo}cpu": thr_lo,
            f"messy_per_sec_{hi}cpu": thr_hi,
            f"cpu_ref_{lo}cpu": out[lo]["counters"]["cpu_ref_sec"],
            f"cpu_ref_{hi}cpu": out[hi]["counters"]["cpu_ref_sec"],
            f"pairs_{lo}cpu": out[lo]["counters"]["improved_pairs"],
            f"pairs_{hi}cpu": out[hi]["counters"]["improved_pairs"],
            "pairs_identical": out[lo]["counters"]["improved_pairs"]
            == out[hi]["counters"]["improved_pairs"],
            f"samples_{lo}cpu": [
                (r["value"], r["counters"]["cpu_ref_sec"]) for r in samples[lo]
            ],
            f"samples_{hi}cpu": [
                (r["value"], r["counters"]["cpu_ref_sec"]) for r in samples[hi]
            ],
            "cpu_ref_floor": med_ref,
            "cpu_ref_par_floor": par_floor,
            "throttle_cut": round(cut, 3),
            "throttle_rejected": rejected,
            "all_samples_throttled_legs": throttled_leg,
        },
    }
    return result


if __name__ == "__main__":
    if "--child" in sys.argv:
        print(json.dumps(run_once(NUM_CPUS, include_queries=False)))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_once(NUM_CPUS)))
