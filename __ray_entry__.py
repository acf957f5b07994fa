"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship web-page ER pipeline on sf0.001.
``queries()`` exposes each implemented operator/pipeline from SURVEY.md §2
(plus the large-scale-corpus extras) as a callable over ``sf_dir``;
``oracle_sql()`` gives the DuckDB-equivalent SQL the driver cross-checks at
sf=0.01. The ER inputs are synthesized deterministically from the
``customer`` table (uk_address_matcher_ray/sources/synth.py — identical
Python and SQL generators, asserted by tests/test_synth.py).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

DOC_TRUNC = 400  # bound shingle cost; mirrored via substr(text, 1, 400)
MINHASH = dict(num_perm=16, bands=4, shingle_k=5, jaccard_threshold=0.8)
NGRAM = dict(shingle_k=5, jaccard_threshold=0.8)
ANN_K = 10
NEAR_DUP_COS = 0.35  # synthetic embeddings are near-orthogonal (max cos ~0.48)
CLUSTER_THRESHOLD = 5.0


# ---------------------------------------------------------------------------
# shared input builders
# ---------------------------------------------------------------------------

def _custkeys(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    return sorted(t.column("c_custkey").to_pylist())


_SYNTH_DRIVER_MAX = 30_000  # keys; crossover measured at sf0.1 (NOTES.md)


def _synth_tables(sf_dir: str):
    """Canonical/messy input tables. Above ``_SYNTH_DRIVER_MAX`` keys the
    Python string generators run DISTRIBUTED inside map_batches over a key
    Dataset and the driver only concatenates Arrow blocks (the serial
    per-row loop used to sit inside every timed query window at x64+);
    below it, two extra Dataset jobs cost more than the ~0.5 s of driver
    synthesis they'd save, so the small path stays driver-side. Outputs
    are bit-identical either way (same generator, order-preserving
    collect)."""
    import pyarrow as pa
    import ray

    from uk_address_matcher_ray.sources import synth
    from uk_address_matcher_ray.util import dataset_from_table

    keys = _custkeys(sf_dir)
    if len(keys) <= _SYNTH_DRIVER_MAX:
        return synth.canonical_table(keys), synth.messy_table(keys)
    keys_ds = dataset_from_table(pa.table({"k": pa.array(keys, pa.int64())}))

    def collect(fn):
        def run(batch: pa.Table) -> pa.Table:
            return fn(batch.column("k").to_pylist())

        ds = keys_ds.map_batches(run, batch_format="pyarrow")
        tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        return pa.concat_tables(tbls).combine_chunks()

    return collect(synth.canonical_table), collect(synth.messy_table)


def _corpus_assets(union_tbl):
    """On-the-fly TF + numeric TF + end tokens over the union corpus.
    Above the same size gate as ``_synth_tables``, counted distributed
    (per-batch partial Counters + one vocabulary-sized groupby) instead of
    a driver-side pass over every address string; identical integer counts
    -> identical dicts either way (asserted in tests/test_entry_queries
    transitively by every hash-green query)."""
    from collections import Counter

    from uk_address_matcher_ray.stages import tf as tf_mod
    from uk_address_matcher_ray.util import dataset_from_table

    if union_tbl.num_rows <= 2 * _SYNTH_DRIVER_MAX:
        addrs = union_tbl.column("address_concat").to_pylist()
        tok, num, end, _nt = tf_mod.corpus_token_stats(addrs)
        return (
            tf_mod.rel_freq_table(tok),
            tf_mod.rel_freq_table(num),
            tf_mod.end_token_set(end),
        )
    agg = tf_mod.corpus_stats_dataset(
        dataset_from_table(union_tbl.select(["address_concat"]))
    ).take_all()
    by_kind: dict = {0: Counter(), 1: Counter(), 2: Counter()}
    for r in agg:
        if r["kind"] in by_kind:
            by_kind[r["kind"]][r["token"]] = r["sum(count)"]
    return (
        tf_mod.rel_freq_table(by_kind[0]),
        tf_mod.rel_freq_table(by_kind[1]),
        tf_mod.end_token_set(by_kind[2]),
    )


def _cleaned_sides(sf_dir: str):
    """-> (cleaned_canonical_ds, cleaned_messy_ds, numeric_tf, messy_tbl)."""
    import pyarrow as pa
    import ray

    from uk_address_matcher_ray.stages.clean import clean_dataset

    canon, messy = _synth_tables(sf_dir)
    union = pa.concat_tables([canon, messy])
    tf, num_tf, end_tokens = _corpus_assets(union)
    numeric_tf = {f"numeric_token_{i}": num_tf for i in (1, 2, 3)}
    from uk_address_matcher_ray.util import dataset_from_table

    cl = clean_dataset(dataset_from_table(canon), tf, end_tokens)
    cm = clean_dataset(dataset_from_table(messy), tf, end_tokens)
    return cl, cm, numeric_tf, messy


def _docs(sf_dir: str):
    import ray

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


def _docs_with_variants(sf_dir: str):
    """documents truncated to DOC_TRUNC chars, unioned with prefix variants
    (doc_id+1000000, first 300 chars) so near-dup pairs provably exist."""
    import pyarrow as pa

    def variants(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = [t[:DOC_TRUNC] if t else t for t in batch.column("text").to_pylist()]
        v_ids = [i + 1_000_000 for i in ids]
        v_texts = [t[:300] if t else t for t in texts]
        return pa.table(
            {
                "doc_id": pa.array(ids + v_ids, pa.int64()),
                "text": pa.array(texts + v_texts, pa.string()),
            }
        )

    return _docs(sf_dir).map_batches(variants, batch_format="pyarrow")


_DOCS_VARIANTS_SQL = f"""
SELECT doc_id, substr(text, 1, {DOC_TRUNC}) AS text FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id, substr(substr(text, 1, {DOC_TRUNC}), 1, 300) AS text
FROM documents
"""


def _union_input_sql():
    from uk_address_matcher_ray.sources import synth

    src = "SELECT c_custkey FROM customer"
    return (
        f"SELECT * FROM ({synth.canonical_sql(src)}) "
        f"UNION ALL SELECT * FROM ({synth.messy_sql(src)})"
    )


def _tf_build_oracle_sql():
    from uk_address_matcher_ray import oracle

    distinct_sql = (
        "SELECT address_concat, postcode, min(unique_id) AS unique_id "
        f"FROM ({_union_input_sql()}) GROUP BY address_concat, postcode"
    )
    tok = oracle.token_tf_table_sql(distinct_sql)
    num = oracle.numeric_tf_table_sql(distinct_sql)
    return f"""
SELECT 'address' AS kind, token, rel_freq FROM ({tok})
UNION ALL
SELECT 'numeric' AS kind, numeric_token AS token, tf_numeric_token AS rel_freq
FROM ({num})
"""


def _pairs_oracle_sql():
    from uk_address_matcher_ray import oracle, oracle_scoring

    cleaned = oracle.cleaned_features_sql(_union_input_sql())
    ntf = oracle.numeric_tf_table_sql(_union_input_sql())
    return oracle_scoring.predict_pairs_sql(cleaned, ntf)


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: synth web pages ->
    extract -> clean -> block/score -> rescore; returns the improved pairs."""
    import ray

    from uk_address_matcher_ray.pipelines.match import flagship_pipeline
    from uk_address_matcher_ray.sources.webpages import synth_web_pages

    canon, messy = _synth_tables("/root/testdata/sf0.001")

    def host_of(i, uid):
        return f"host{int(uid[1:]) % 97}.example"

    pages_c = synth_web_pages(
        [(r["unique_id"], r["address_concat"], r["postcode"]) for r in canon.to_pylist()],
        host_of=host_of,
    )
    pages_m = synth_web_pages(
        [(r["unique_id"], r["address_concat"], r["postcode"]) for r in messy.to_pylist()],
        host_of=host_of,
    )
    from uk_address_matcher_ray.util import dataset_from_table

    pairs, _labels = flagship_pipeline(
        dataset_from_table(pages_m),
        dataset_from_table(pages_c),
        cluster_threshold=CLUSTER_THRESHOLD,
    )
    return pairs.select_columns(
        [
            "unique_id_r",
            "unique_id_l",
            "mw_adjustment",
            "match_weight_original",
            "match_weight",
        ]
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_clean_features(sf_dir: str):
    import pyarrow as pa
    import ray

    from uk_address_matcher_ray.stages.clean import clean_dataset

    canon, messy = _synth_tables(sf_dir)
    union = pa.concat_tables([canon, messy])
    from uk_address_matcher_ray.util import dataset_from_table

    tf, _num_tf, end_tokens = _corpus_assets(union)
    return clean_dataset(dataset_from_table(union), tf, end_tokens)


def _q_token_tf(sf_dir: str):
    """T1 token-frequency table, counted distributed (partial counts per
    batch + one vocabulary-sized groupby; kinds 0+3 = address + nt1-3)."""
    from collections import Counter

    import pyarrow as pa
    import ray

    from uk_address_matcher_ray.stages import tf as tf_mod

    canon, messy = _synth_tables(sf_dir)
    union = pa.concat_tables([canon, messy])
    from uk_address_matcher_ray.util import dataset_from_table

    agg = tf_mod.corpus_stats_dataset(dataset_from_table(union)).take_all()
    counts = Counter()
    for r in agg:
        if r["kind"] in (0, 3):
            counts[r["token"]] += r["sum(count)"]
    freqs = tf_mod.rel_freq_table(counts)
    items = sorted(freqs.items())
    return pa.table(
        {
            "token": pa.array([k for k, _ in items], pa.string()),
            "rel_freq": pa.array([v for _, v in items], pa.float64()),
        }
    )


def _q_numeric_tf(sf_dir: str):
    import pyarrow as pa

    canon, messy = _synth_tables(sf_dir)
    union = pa.concat_tables([canon, messy])
    _tf, num_tf, _end = _corpus_assets(union)
    items = sorted(num_tf.items())
    return pa.table(
        {
            "numeric_token": pa.array([k for k, _ in items], pa.string()),
            "tf_numeric_token": pa.array([v for _, v in items], pa.float64()),
        }
    )


def _predict_ds(sf_dir: str):
    from uk_address_matcher_ray.stages.score import predict

    cl, cm, numeric_tf, _messy = _cleaned_sides(sf_dir)
    from uk_address_matcher_ray.state.model import MatchModel

    return predict(cl, cm, MatchModel(), numeric_tf, salt_threshold=20000)


def _q_predict_pairs(sf_dir: str):
    ds = _predict_ds(sf_dir)
    return ds.select_columns(
        ["unique_id_l", "unique_id_r", "match_key", "match_weight"]
    )


def _q_match_clusters(sf_dir: str):
    from uk_address_matcher_ray.stages import cluster as cmod

    pairs = _predict_ds(sf_dir)
    edges = cmod.edges_from_pairs(pairs, threshold=CLUSTER_THRESHOLD)
    return cmod.propagate_labels(edges)


def _q_improve_pairs(sf_dir: str):
    from uk_address_matcher_ray.pipelines.match import match_pipeline
    from uk_address_matcher_ray.state.model import MatchModel

    cl, cm, numeric_tf, _messy = _cleaned_sides(sf_dir)
    improved = match_pipeline(cl, cm, MatchModel(), numeric_tf, salt_threshold=20000)
    return improved.select_columns(
        [
            "unique_id_r",
            "unique_id_l",
            "mw_adjustment",
            "match_weight_original",
            "match_weight",
        ]
    )


def _q_match_one(sf_dir: str):
    """Single-record convenience surface (reference examples/match_one.py):
    clean one messy address driver-side, run the standard block/score/improve
    pipeline against the cleaned canonical side. Oracle = the improve oracle
    restricted to that unique_id_r (same tf/end-token assets)."""
    import pyarrow as pa

    from uk_address_matcher_ray.pipelines.match import match_one
    from uk_address_matcher_ray.sources import synth
    from uk_address_matcher_ray.stages.clean import clean_dataset
    from uk_address_matcher_ray.util import dataset_from_table

    keys = _custkeys(sf_dir)
    k0 = min(k for k in keys if k % 3 != 0)
    canon, messy = _synth_tables(sf_dir)
    union = pa.concat_tables([canon, messy])
    tf, num_tf, end_tokens = _corpus_assets(union)
    numeric_tf = {f"numeric_token_{i}": num_tf for i in (1, 2, 3)}
    cl = clean_dataset(dataset_from_table(canon), tf, end_tokens)
    addr, pc = synth._messy_parts(k0)
    out = match_one(
        addr, pc, cl, tf, end_tokens, numeric_tf, unique_id=f"m{k0}"
    )
    return out.select_columns(
        [
            "unique_id_r",
            "unique_id_l",
            "mw_adjustment",
            "match_weight_original",
            "match_weight",
        ]
    )


def _waterfall_pairs(sf_dir: str):
    """Deterministic drill-down pairs: the 3 smallest custkeys that HAVE a
    messy twin (synth drops k % 3 == 0 from the messy side), canonical vs
    twin (strong matches) plus one cross pair (weak)."""
    keys = [k for k in _custkeys(sf_dir) if k % 3 != 0][:3]
    sel = [(f"c{k}|m{k}", f"c{k}", f"m{k}") for k in keys]
    sel.append((f"c{keys[0]}|m{keys[1]}", f"c{keys[0]}", f"m{keys[1]}"))
    return sel


def _q_waterfall(sf_dir: str):
    """Per-pair match-weight waterfall decomposition (pipelines/report.py;
    reference accuracy_from_labels.py:222-283 renders Splink's
    waterfall_chart). Bars must reproduce the scorer bit-exactly: the oracle
    mirrors each comparison's gamma + log2 Bayes factor and the
    left-associated cumulative chain."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from uk_address_matcher_ray.pipelines.report import waterfall_rows
    from uk_address_matcher_ray.state.model import MatchModel

    cl, cm, numeric_tf, _messy = _cleaned_sides(sf_dir)
    model = MatchModel()

    import ray

    def rows_by_uid(ds, uids):
        uid_set = pa.array(sorted(uids))

        def flt(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b.column("unique_id"), value_set=uid_set))

        got = pa.concat_tables(
            [
                t
                for t in ray.get(
                    ds.map_batches(flt, batch_format="pyarrow").to_arrow_refs()
                )
                if t.num_rows
            ]
        )
        return {r["unique_id"]: r for r in got.to_pylist()}

    sel = _waterfall_pairs(sf_dir)
    l_rows = rows_by_uid(cl, {l for _p, l, _r in sel})
    r_rows = rows_by_uid(cm, {r for _p, _l, r in sel})
    parts = []
    for pair_id, uid_l, uid_r in sel:
        t = waterfall_rows(l_rows[uid_l], r_rows[uid_r], model, numeric_tf)
        t = t.select(
            ["bar", "label", "gamma", "log2_bayes_factor", "cumulative_weight"]
        )
        parts.append(
            t.add_column(0, "pair_id", pa.array([pair_id] * t.num_rows, pa.string()))
        )
    return pa.concat_tables(parts)


def _q_tune_rewards(sf_dir: str):
    """Reward objective for the second-pass multiplier tuner
    (pipelines/tune.py; reference
    scripts/improve_parameters_using_gradient_descent.py:383-470): per
    labelled messy record, min-max-normalized best-vs-true reward over the
    improved pairs. The SPSA loop itself is iterative/stochastic (covered by
    tests/test_tune.py); this checks its objective bit-exactly."""
    from uk_address_matcher_ray.pipelines.tune import record_rewards
    from uk_address_matcher_ray.sources import synth

    labels = synth.truth_labels(_custkeys(sf_dir))
    return record_rewards(_q_improve_pairs(sf_dir), labels)


def _q_best_matches(sf_dir: str):
    import ray

    from uk_address_matcher_ray.stages.select import (
        best_matches_with_distinguishability,
    )

    pairs = _predict_ds(sf_dir)
    _cl, _cm, _ntf, messy = _cleaned_sides(sf_dir)
    return best_matches_with_distinguishability(pairs, ray.data.from_arrow(messy))


def _q_best_matches_summary(sf_dir: str):
    from uk_address_matcher_ray.stages.select import best_matches_summary

    return best_matches_summary(_q_best_matches(sf_dir))


def _q_extract_pages(sf_dir: str):
    import ray

    from uk_address_matcher_ray.sources.webpages import synth_web_pages
    from uk_address_matcher_ray.stages.extract import extract_addresses

    _canon, messy = _synth_tables(sf_dir)

    def host_of(i, uid):
        return f"host{int(uid[1:]) % 97}.example"

    pages = synth_web_pages(
        [(r["unique_id"], r["address_concat"], r["postcode"]) for r in messy.to_pylist()],
        host_of=host_of,
    )
    from uk_address_matcher_ray.util import dataset_from_table

    return extract_addresses(dataset_from_table(pages)).select_columns(
        ["unique_id", "address_concat", "postcode", "lang"]
    )


def _q_exact_dedup_docs(sf_dir: str):
    from uk_address_matcher_ray.stages.dedup import exact_dedup

    return exact_dedup(_docs_with_variants(sf_dir))


def _q_minhash_pairs(sf_dir: str):
    from uk_address_matcher_ray.stages.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs_with_variants(sf_dir), **MINHASH)


def _q_minhash_pairs_ab(sf_dir: str):
    """Fuzzy decontamination shape: corpus A = truncated documents, corpus
    B = an 'eval set' (300-char prefixes of every third document, original
    ids) — cross-corpus near-dup pairs only."""
    import pyarrow as pa

    from uk_address_matcher_ray.stages.dedup import minhash_lsh_pairs_ab

    def side_a(batch: pa.Table) -> pa.Table:
        texts = [t[:DOC_TRUNC] if t else t for t in batch.column("text").to_pylist()]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "text": pa.array(texts, pa.string())}
        )

    def side_b(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        keep = [i for i, d in enumerate(ids) if d % 3 == 0]
        return pa.table(
            {
                "doc_id": pa.array([ids[i] for i in keep], pa.int64()),
                "text": pa.array(
                    [
                        (texts[i][:DOC_TRUNC])[:300] if texts[i] else texts[i]
                        for i in keep
                    ],
                    pa.string(),
                ),
            }
        )

    a = _docs(sf_dir).map_batches(side_a, batch_format="pyarrow")
    b = _docs(sf_dir).map_batches(side_b, batch_format="pyarrow")
    return minhash_lsh_pairs_ab(a, b, **MINHASH)


def _q_ngram_jaccard_pairs(sf_dir: str):
    from uk_address_matcher_ray.stages.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs_with_variants(sf_dir), **NGRAM)


def _q_near_dedup_docs(sf_dir: str):
    from uk_address_matcher_ray.stages.dedup import near_dedup_docs, ngram_jaccard_pairs

    docs = _docs_with_variants(sf_dir)
    return near_dedup_docs(docs, ngram_jaccard_pairs(docs, **NGRAM))


def _q_simhash_sigs(sf_dir: str):
    from uk_address_matcher_ray.stages.dedup import simhash_signatures

    return simhash_signatures(_docs(sf_dir))


def _q_simhash_pairs(sf_dir: str):
    from uk_address_matcher_ray.stages.dedup import simhash_pairs

    return simhash_pairs(_docs_with_variants(sf_dir), max_hamming=3)


def _q_embedding_near_dup(sf_dir: str):
    import pyarrow as pa
    import ray

    from uk_address_matcher_ray.stages.dedup import embedding_near_dup_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = embedding_near_dup_pairs(ds, threshold=NEAR_DUP_COS)

    def round_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.set_column(
            batch.schema.get_field_index("cosine"),
            "cosine",
            pc.round(batch.column("cosine"), ndigits=6),
        )

    return out.map_batches(round_batch, batch_format="pyarrow")


def _q_ann_topk(sf_dir: str):
    import pyarrow as pa
    import ray

    from uk_address_matcher_ray.stages.similarity import brute_force_topk

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qids = [
        r["vec_id"]
        for r in ds.select_columns(["vec_id"]).sort("vec_id").limit(5).take_all()
    ]
    out = brute_force_topk(ds, qids, k=ANN_K)

    def round_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.set_column(
            batch.schema.get_field_index("cosine"),
            "cosine",
            pc.round(batch.column("cosine"), ndigits=6),
        )

    return out.map_batches(round_batch, batch_format="pyarrow")


def _q_ivf_topk(sf_dir: str):
    import pyarrow as pa
    import ray

    from uk_address_matcher_ray.stages.similarity import ivf_topk

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qids = [
        r["vec_id"]
        for r in ds.select_columns(["vec_id"]).sort("vec_id").limit(5).take_all()
    ]
    out = ivf_topk(ds, qids, k=ANN_K)

    def round_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.set_column(
            batch.schema.get_field_index("cosine"),
            "cosine",
            pc.round(batch.column("cosine"), ndigits=6),
        )

    return out.map_batches(round_batch, batch_format="pyarrow")


def _q_kmeans_clusters(sf_dir: str):
    """Coarse k-means cluster label per embedding (the SemDeDup / data-mix
    primitive): trained via streaming partial-sum Lloyd passes, assigned in
    one zero-shuffle map_batches against the broadcast centroid matrix."""
    import ray

    from uk_address_matcher_ray.stages.similarity import kmeans_assign

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return kmeans_assign(ds)


def _q_semdedup(sf_dir: str):
    """SemDeDup: within-cluster smaller-id cosine flags, one cid-keyed
    exchange, tiled pairwise so memory is tile x cluster."""
    import ray

    from uk_address_matcher_ray.stages.similarity import semdedup

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return semdedup(ds, threshold=NEAR_DUP_COS)


MIX_RATES = {"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.25, "zh": 0.1}


def _q_quality_scores(sf_dir: str):
    """GPT-3-style quality classifier (stages/classifier.py): hashed-token
    logistic regression trained by full-batch GD partial-sum passes
    (labels: lang == 'en'), scored in one zero-shuffle pass."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from uk_address_matcher_ray.stages.classifier import quality_classifier

    def add_label(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "is_curated",
            pc.equal(batch.column("lang"), "en").cast(pa.int64()),
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(add_label, batch_format="pyarrow")
    return quality_classifier(ds, label_col="is_curated")


# HTML synthesized from document text (documents.parquet is plain text);
# the SQL below applies the IDENTICAL nested replaces — both Python
# str.replace and DuckDB replace are leftmost non-overlapping.
_HTML_PREFIX = (
    '<html><head><title>T</title><script>if (x < 1) { y = "</b>"; }'
    "</script><style>.c{color:red}</style></head><body><p>"
)
_HTML_SUFFIX = '</p><div>footer <a href="/f">home</a></div></body></html>'


def _html_of(text: str) -> str:
    body = (
        (text or "")
        .replace(" the ", "</p>\n<p>")
        .replace(" data ", ' <a href="https://ex.com/a">click here</a> ')
        .replace(" batch ", "<br/>")
    )
    return _HTML_PREFIX + body + _HTML_SUFFIX


_HTML_SYNTH_SQL = (
    "'" + _HTML_PREFIX.replace("'", "''") + "' || "
    "replace(replace(replace(coalesce(text, ''),"
    " ' the ', '</p>' || chr(10) || '<p>'),"
    " ' data ', ' <a href=\"https://ex.com/a\">click here</a> '),"
    " ' batch ', '<br/>')"
    " || '" + _HTML_SUFFIX.replace("'", "''") + "'"
)


def _q_extract_html(sf_dir: str):
    """Web-text ingestion (stages/html.py): script/style removal, anchor
    link-density stats, block-tag line breaks, tag strip, entity decode,
    whitespace normalize — one zero-shuffle row-local pass."""
    import pyarrow as pa
    import ray

    from uk_address_matcher_ray.stages.html import extract_text

    def add_html(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "html": pa.array(
                    [
                        _html_of(t)
                        for t in batch.column("text").to_pylist()
                    ],
                    pa.string(),
                ),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(add_html, batch_format="pyarrow")
    return extract_text(ds)


# messy-text synth for the normalization query: decomposed Unicode
# (combining acute), CRLF/CR newlines, a control byte, whitespace runs —
# mirrored verbatim by the SQL (same nested leftmost non-overlapping
# replaces; chr(769) = U+0301 combining acute)
def _messy_of(text: str) -> str:
    return (
        (text or "")
        .replace(" the ", " the\u0301 ")  # decomposed: e + U+0301
        .replace(" data ", "\r\ndata\r")
        .replace(" batch ", " ba\x07tch   ")
    )


_MESSY_SYNTH_SQL = (
    "replace(replace(replace(coalesce(text, ''),"
    " ' the ', ' the' || chr(769) || ' '),"
    " ' data ', chr(13) || chr(10) || 'data' || chr(13)),"
    " ' batch ', ' ba' || chr(7) || 'tch   ')"
)


def _q_normalize_docs(sf_dir: str):
    """ftfy-lite text normalization (stages/normalize.py): NFC, newline
    canonicalization, control-char scrub, whitespace collapse — the
    byte-sensitivity gate in front of every hash/dedup op."""
    import pyarrow as pa
    import ray

    from uk_address_matcher_ray.stages.normalize import normalize_text

    def mess(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": pa.array(
                    [_messy_of(t) for t in batch.column("text").to_pylist()],
                    pa.string(),
                ),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(mess, batch_format="pyarrow")
    return normalize_text(ds)


_QUANTILE_QS = [0.25, 0.5, 0.9, 0.99]


def _q_length_quantiles(sf_dir: str):
    """Exact per-language length quantiles (stages/quantiles.py):
    histogram partials + per-group type-1 quantile finalize — threshold
    picking for quality filters without a corpus sort."""
    import ray

    from uk_address_matcher_ray.stages.quantiles import grouped_quantiles

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )
    return grouped_quantiles(ds, _QUANTILE_QS, "n_chars", "lang")


def _q_tfidf_topk(sf_dir: str):
    """Per-document top-5 TF-IDF keywords (stages/tfidf.py): tree-merged
    vocabulary-bounded DF partials broadcast once, zero-shuffle row-local
    scoring, (score desc, token asc) tie-break mirrored by the oracle's
    window ORDER BY."""
    import ray

    from uk_address_matcher_ray.stages.tfidf import tfidf_topk

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return tfidf_topk(ds, k=5)


def _q_hash_embed(sf_dir: str):
    """Feature-hashing embeddings (stages/hashembed.py): pure-hash
    token->(bucket,sign) projection, integer-exact dense vectors, ONE
    zero-shuffle pass — no vocabulary state anywhere."""
    import ray

    from uk_address_matcher_ray.stages.hashembed import hash_embed

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return hash_embed(ds, dim=16)


def _q_token_pmi(sf_dir: str):
    """Windowed co-occurrence PMI (stages/pmi.py): min_count-floored
    vocab broadcast, numpy shift-algebra pairing, ONE int-coded pair
    exchange; ln-chain float regime shared with lm/dsir/bm25."""
    import ray

    from uk_address_matcher_ray.stages.pmi import token_pmi

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    return token_pmi(ds, window=2, min_count=5, min_pair=2)


def _q_source_kl(sf_dir: str):
    """Per-source unigram KL vs corpus (stages/kl.py): floored-vocab
    broadcast, batch-bounded (source, tok) partials, ONE grouped
    exchange with a complete-group fsum kernel."""
    import ray

    from uk_address_matcher_ray.stages.kl import source_kl

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    return source_kl(ds, min_count=5)


def _q_cdc_chunks(sf_dir: str):
    """Content-defined chunking (stages/cdc.py): rolling k-gram hash
    cut rule, zero shuffles, chunk text never leaves the task — only
    (id, idx, pos, n, h60) rides downstream."""
    import ray

    from uk_address_matcher_ray.stages.cdc import cdc_chunks

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return cdc_chunks(ds, k=4, divisor=8)


def _q_curate_docs(sf_dir: str):
    """End-to-end curation showcase (pipelines/curate.py): fused
    stats+filter pass, skinny md5-keyed exact-dedup exchange — the text
    never rides the shuffle."""
    import ray

    from uk_address_matcher_ray.pipelines.curate import curate_docs

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return curate_docs(ds)


def _q_ngram_topk(sf_dir: str):
    """Per-language top-5 word bigrams (stages/ngram_topk.py): distinct-
    gram partials, one group-keyed exchange, deterministic tie-break."""
    import ray

    from uk_address_matcher_ray.stages.ngram_topk import ngram_topk

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )
    return ngram_topk(ds, 5, n=2)


_TOKENS_LEN_SQL = (
    "len(list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))),"
    " '\\s+'), x -> x != ''))"
)


def _q_hll_tokens(sf_dir: str):
    """HLL distinct-token count per language (stages/hll.py): md5-bucket
    registers max-merged per batch, INTEGER harmonic sum (no float-order
    dependence), repr'd-literal estimate expression — a sketch the DuckDB
    oracle reproduces bit-for-bit including the estimate doubles."""
    import ray

    from uk_address_matcher_ray.stages.hll import hll_distinct_tokens

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )
    return hll_distinct_tokens(ds)


def _q_length_moments(sf_dir: str):
    """Grouped moment statistics (stages/moments.py): mean/variance/std
    of document char length per language via integer (cnt, s, ss)
    partials — one 4-int row per (group, batch) exchange, closed-form
    finalize restated verbatim by the DuckDB oracle."""
    import pyarrow as pa
    import ray

    from uk_address_matcher_ray.stages.moments import grouped_moments

    def n_chars(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch.column("lang"),
                "n_chars": pa.array(
                    [len(t or "") for t in batch.column("text").to_pylist()],
                    pa.int64(),
                ),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    ).map_batches(n_chars, batch_format="pyarrow")
    return grouped_moments(ds, "n_chars", "lang")


def _q_token_budget(sf_dir: str):
    """Token-budget data mixing (stages/sampling.token_budget_cap): keep
    each language's md5-rank prefix of documents while the running
    whitespace-token sum stays <= 2000 — the mixing primitive stated in
    token space. Oracle: the same window cumsum predicate in DuckDB."""
    import pyarrow as pa
    import ray

    from uk_address_matcher_ray.stages.dedup import _tokens
    from uk_address_matcher_ray.stages.sampling import token_budget_cap

    def count_tokens(batch: pa.Table) -> pa.Table:
        toks = [len(_tokens(t)) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "token_count": pa.array(toks, pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).map_batches(count_tokens, batch_format="pyarrow")
    return token_budget_cap(ds, budget=2000, group_col="lang")


PACK_CAPACITY = 512


def _q_pack_sequences(sf_dir: str):
    """GPT-style sequence packing (stages/packing.pack_sequences):
    documents in deterministic md5 corpus order are concatenated as a
    whitespace-token stream and cut every 512 tokens; output is the
    (seq_id, doc_id, doc_off, seg_len, win_off) segment manifest.  The
    global exclusive prefix sum runs as range-bucketed partials + a
    constant-size driver fold, never a full sort."""
    import pyarrow as pa
    import ray

    from uk_address_matcher_ray.stages.dedup import _tokens
    from uk_address_matcher_ray.stages.packing import pack_sequences

    def count_tokens(batch: pa.Table) -> pa.Table:
        toks = [len(_tokens(t)) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "token_count": pa.array(toks, pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(count_tokens, batch_format="pyarrow")
    return pack_sequences(ds, PACK_CAPACITY)


def _q_group_cap(sf_dir: str):
    """C4-style per-group document cap (stages/sampling.group_cap): keep
    at most 20 docs per language by deterministic md5 rank — per-batch
    partial top-cap bounds the exchange to cap rows per (group, batch)."""
    import ray

    from uk_address_matcher_ray.stages.sampling import group_cap

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return group_cap(ds, 20)


def _q_shuffle_shards(sf_dir: str):
    """Deterministic training-data shuffle + shard assignment
    (stages/shards.py): seeded md5 key, hash shard, within-shard rank —
    one fixed-width-key exchange, reproducible and resumable per shard
    (the 100 TB replacement for random_shuffle)."""
    import ray

    from uk_address_matcher_ray.stages.shards import shuffle_shards

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    return shuffle_shards(ds, num_shards=16, seed=0)


def _q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training (stages/bpe.py): one
    vocabulary-bounded word-count tree, merge iterations driver-side
    over the word table (the production tokenizer-trainer shape).
    Oracle: the merge chain unrolled as MATERIALIZED CTEs with
    run-parity greedy replacement."""
    import ray

    from uk_address_matcher_ray.stages.bpe import bpe_train

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    return bpe_train(ds, num_merges=8)


def _q_bpe_token_counts(sf_dir: str):
    """BPE apply: segment the corpus with the learned merges (broadcast
    once, per-batch distinct-word memo) -> corpus token counts through
    one vocabulary-bounded groupby exchange."""
    import ray

    from uk_address_matcher_ray.stages.bpe import bpe_token_counts, bpe_train

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    return bpe_token_counts(ds, bpe_train(ds, num_merges=8))


def _q_lm_perplexity(sf_dir: str):
    """CCNet-style LM quality filter (stages/lm.py): add-k bigram LM
    trained by tree-merged partial counts, scored in one zero-shuffle
    broadcast pass."""
    import ray

    from uk_address_matcher_ray.stages.lm import lm_perplexity

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return lm_perplexity(ds)


ROLL_WINDOW_US = 6 * 3600 * 1_000_000  # 6 h rolling frame
CHUNK_W, CHUNK_S = 32, 24  # token window / stride (overlap 8)


def _q_events_rolling(sf_dir: str):
    """Time-RANGE rolling aggregate (stages/sessions.rolling_window):
    per-user count + integer-cents sum over the preceding 6 h (inclusive
    bounds, all ts peers — DuckDB RANGE frame semantics), one key-hash
    exchange + a searchsorted/prefix-sum kernel."""
    import ray

    from uk_address_matcher_ray.stages.sessions import rolling_window

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )
    return rolling_window(
        ev,
        key="user_id",
        ts="ts",
        window=ROLL_WINDOW_US,
        value="value",
        id_col="event_id",
    )


def _q_chunk_docs(sf_dir: str):
    """Fixed-size overlapping token-window chunking
    (stages/chunking.py): 32-token chunks every 24 tokens, zero
    shuffles, Arrow binary_join chunk assembly."""
    import ray

    from uk_address_matcher_ray.stages.chunking import chunk_documents

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return chunk_documents(ds, window=CHUNK_W, stride=CHUNK_S)


def _q_ccnet_buckets(sf_dir: str):
    """CCNet head/middle/tail split (stages/lm.ccnet_perplexity_buckets):
    per-language perplexity tertiles over centi-perplexity bins — LM tree
    merge, one scoring pass, histogram-exchange cutoffs, zero-shuffle
    assign."""
    import ray

    from uk_address_matcher_ray.stages.lm import ccnet_perplexity_buckets

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    return ccnet_perplexity_buckets(ds)


def _q_winnow_fingerprints(sf_dir: str):
    """Winnowing (MOSS) fingerprint selection (stages/winnow.py):
    k=5-token grams, w=4 windows, rightmost-min selection — zero
    shuffles, sliding_window_view kernel."""
    import ray

    from uk_address_matcher_ray.stages.winnow import winnow_fingerprints

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return winnow_fingerprints(ds)


def _q_winnow_pairs(sf_dir: str):
    """Shared-fingerprint candidate pairs: fingerprint-hash exchange with
    the df<=64 boilerplate cap, pair-count merge keyed on id_a."""
    import ray

    from uk_address_matcher_ray.stages.winnow import (
        winnow_fingerprints,
        winnow_pairs,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return winnow_pairs(winnow_fingerprints(ds))


def _q_embedding_pca(sf_dir: str):
    """Integer-domain power-iteration PCA (stages/pca.py): exact centered
    scatter n*A - S*S^T in Python ints, 4 truncated-division iterations,
    zero-shuffle projection pass. Oracle: unrolled HUGEINT CTE chain."""
    import ray

    from uk_address_matcher_ray.stages.pca import embedding_pca

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return embedding_pca(ds)


def _q_nb_lang_id(sf_dir: str):
    """Multinomial Naive Bayes language classifier (stages/nblang.py):
    train on the labeled docs with doc_id % 3 != 0 (char-bigram counts,
    tree-merged), predict every doc in one zero-shuffle broadcast pass.
    Round-6 scores, (score DESC, lang ASC) argmax — lm.py float regime."""
    import pyarrow.compute as pc
    import ray

    from uk_address_matcher_ray.stages.nblang import nb_lang_id

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    import pyarrow as pa

    def _train_filter(t):
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pc.not_equal(pa.array(ids % 3), 0))

    train = ds.map_batches(_train_filter, batch_format="pyarrow")
    return nb_lang_id(ds, train_ds=train)


def _q_stratified_sample(sf_dir: str):
    """Deterministic data-mixing sampler (stages/sampling.py): per-language
    rates, md5 sample key, zero shuffles — the same row keeps/drops on any
    cluster size or re-run."""
    import ray

    from uk_address_matcher_ray.stages.sampling import stratified_sample

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return stratified_sample(ds, MIX_RATES)


def _q_text_stats(sf_dir: str):
    from uk_address_matcher_ray.stages.textstats import text_stats_dataset

    return text_stats_dataset(_docs(sf_dir))


def _q_decontaminate(sf_dir: str):
    """GPT-3-style benchmark decontamination: docs with doc_id % 13 == 0
    act as the eval set; every other doc is flagged when it shares any
    word 4-gram with it (k=4 at this corpus size for flag variance;
    production pipelines use 8-13 — same code path, the k knob)."""
    import numpy as np
    import ray

    from uk_address_matcher_ray.stages.decontam import (
        benchmark_ngram_assets,
        decontaminate,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def side(bench: bool):
        def f(t):
            import pyarrow as pa

            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            mask = (ids % 13 == 0) if bench else (ids % 13 != 0)
            return t.filter(pa.array(mask))

        return f

    assets = benchmark_ngram_assets(
        ds.map_batches(side(True), batch_format="pyarrow"), k=4
    )
    corpus = ds.map_batches(side(False), batch_format="pyarrow")
    return decontaminate(corpus, ray.put(assets), k=4)


_BLOOM_PRED = "doc_id % 13 = 0"
_BLOOM_KW = dict(k=4, m_bits=1 << 17, k_hashes=3)


def _q_bloom_decontaminate(sf_dir: str):
    """Dolma/BFF-style Bloom decontamination (stages/bloom.py): blocklist
    side streams into a fixed 4096-bit filter (tree-OR of per-batch
    partials), corpus side flagged in one broadcast pass. The oracle
    reproduces the filter bit-for-bit, false positives included."""
    import numpy as np
    import ray

    from uk_address_matcher_ray.stages.bloom import (
        bloom_build,
        bloom_filter_docs,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def side(bench: bool):
        def f(t):
            import pyarrow as pa

            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            mask = (ids % 13 == 0) if bench else (ids % 13 != 0)
            return t.filter(pa.array(mask))

        return f

    bits = bloom_build(
        ds.map_batches(side(True), batch_format="pyarrow"), **_BLOOM_KW
    )
    return bloom_filter_docs(
        ds.map_batches(side(False), batch_format="pyarrow"),
        ray.put(bits),
        **_BLOOM_KW,
    )


DECONTAMINATE_SQL = """
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
    FROM documents
),
bench AS (
    SELECT DISTINCT array_to_string(t[i + 1 : i + 4], ' ') AS g
    FROM (SELECT t, unnest(range(len(t) - 3)) AS i
          FROM toks WHERE doc_id % 13 = 0 AND len(t) >= 4)
),
corp AS (
    SELECT DISTINCT doc_id, array_to_string(t[i + 1 : i + 4], ' ') AS g
    FROM (SELECT doc_id, t, unnest(range(len(t) - 3)) AS i
          FROM toks WHERE doc_id % 13 <> 0 AND len(t) >= 4)
),
hits AS (SELECT DISTINCT doc_id FROM corp JOIN bench USING (g))
SELECT toks.doc_id, (hits.doc_id IS NOT NULL) AS contaminated
FROM toks LEFT JOIN hits USING (doc_id)
WHERE toks.doc_id % 13 <> 0
"""


def _q_doc_repetition(sf_dir: str):
    from uk_address_matcher_ray.stages.repetition import (
        repetition_stats_dataset,
    )

    return repetition_stats_dataset(_docs(sf_dir))


# words replaced by newlines to synthesize multi-line documents for the
# line-dedup query (documents.parquet text is single-line); the SQL
# oracle applies the IDENTICAL nested replace in the same order —
# Python str.replace and DuckDB replace are both leftmost
# non-overlapping, so the line sets match byte-for-byte.
_LINE_BREAK_WORDS = (" the ", " data ", " batch ", " join ")
_LINE_DEDUP_MIN_DOCS = 5


def _q_line_dedup(sf_dir: str):
    """CCNet-style boilerplate-line removal: lines recurring in >=
    ``min_docs`` distinct documents are dropped (stages/linededup.py —
    two-phase hash exchange + broadcast removal)."""
    import pyarrow as pa

    from uk_address_matcher_ray.stages.linededup import line_dedup_docs

    def to_lines(batch: pa.Table) -> pa.Table:
        texts = []
        for t in batch.column("text").to_pylist():
            s = t or ""
            for w in _LINE_BREAK_WORDS:
                s = s.replace(w, "\n")
            texts.append(s)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": pa.array(texts, pa.string()),
            }
        )

    ds = _docs(sf_dir).map_batches(to_lines, batch_format="pyarrow")
    return line_dedup_docs(ds, min_docs=_LINE_DEDUP_MIN_DOCS)


_LINE_DEDUP_SQL = f"""
WITH docs AS (
  SELECT doc_id,
    replace(replace(replace(replace(text,
      ' the ', chr(10)), ' data ', chr(10)), ' batch ', chr(10)),
      ' join ', chr(10)) AS text
  FROM documents
),
split AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM docs),
flat AS (
  SELECT doc_id, ls[i] AS line, i
  FROM split, LATERAL (SELECT unnest(generate_series(1, len(ls))) AS i) g
),
counts AS (SELECT line, count(DISTINCT doc_id) AS nd FROM flat GROUP BY line),
kept AS (
  SELECT f.doc_id, f.line, f.i FROM flat f JOIN counts c ON f.line = c.line
  WHERE c.nd < {_LINE_DEDUP_MIN_DOCS}
),
recon AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS text_clean,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT s.doc_id,
       coalesce(r.text_clean, '') AS text_clean,
       CAST(len(s.ls) AS BIGINT) AS n_lines,
       CAST(len(s.ls) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
FROM split s LEFT JOIN recon r USING (doc_id)
"""


def _url_of(i: int) -> str:
    """Deterministic per-doc URL (mirrored verbatim by _URL_SYNTH_SQL);
    every 41st url is schemeless so the unparsed-null path runs."""
    if i % 41 == 40:
        return f"no-scheme.example/x{i}"
    sub = f"s{i % 5}." if i % 4 == 0 else ""
    www = "www." if i % 7 == 0 else ""
    tld = ("co.uk", "com", "org")[i % 3]
    q = "?q=1" if i % 5 == 0 else ""
    return f"https://{sub}{www}site{i % 37}.{tld}/p/{i}{q}"


def _url_synth_case(e: str) -> str:
    """The SQL CASE mirroring _url_of(<e>) verbatim."""
    return f"""CASE WHEN {e} % 41 = 40 THEN 'no-scheme.example/x' || {e}
  ELSE 'https://'
    || CASE WHEN {e} % 4 = 0 THEN 's' || ({e} % 5) || '.' ELSE '' END
    || CASE WHEN {e} % 7 = 0 THEN 'www.' ELSE '' END
    || 'site' || ({e} % 37) || '.'
    || CASE {e} % 3 WHEN 0 THEN 'co.uk' WHEN 1 THEN 'com' ELSE 'org' END
    || '/p/' || {e}
    || CASE WHEN {e} % 5 = 0 THEN '?q=1' ELSE '' END
  END"""


_URL_SYNTH_SQL = f"""
SELECT doc_id, {_url_synth_case('doc_id')} AS url
FROM documents
"""


def _docs_with_urls(sf_dir: str):
    import pyarrow as pa

    def add_url(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "url": pa.array([_url_of(i) for i in ids], pa.string()),
            }
        )

    import ray

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(add_url, batch_format="pyarrow")


def _docs_with_snapshots(sf_dir: str):
    """(doc_id, url, fetch_ts): doc i is a re-crawl of url _url_of(i % 120)
    at ts (i // 120) % 2 — each url gets several fetches, max-ts ties exist
    (resolved by min doc_id). Mirrored verbatim by the SQL oracle."""
    import pyarrow as pa
    import ray

    def add(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "url": pa.array([_url_of(i % 120) for i in ids], pa.string()),
                "fetch_ts": pa.array(
                    [(i // 120) % 2 for i in ids], pa.int64()
                ),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(add, batch_format="pyarrow")


def _q_url_dedup(sf_dir: str):
    """Cross-snapshot URL dedup (stages/urls.py): keep the newest fetch per
    exact URL; per-batch pre-reduction, one url-keyed grouped pass."""
    from uk_address_matcher_ray.stages.urls import url_dedup

    return url_dedup(_docs_with_snapshots(sf_dir))


def _url_dedup_sql() -> str:
    case = _url_synth_case("(doc_id % 120)")
    return f"""
WITH f AS (
  SELECT doc_id, {case} AS url, (doc_id // 120) % 2 AS fetch_ts
  FROM documents
)
SELECT url, doc_id, fetch_ts FROM (
  SELECT url, doc_id, fetch_ts,
         ROW_NUMBER() OVER (
             PARTITION BY url ORDER BY fetch_ts DESC, doc_id
         ) AS rn
  FROM f
) t WHERE rn = 1
"""


def _q_parse_urls(sf_dir: str):
    """Vectorized URL parse + eTLD+1 reduction (stages/urls.py):
    RE2 split over the Arrow buffer, registered domain computed once per
    DISTINCT host via dictionary encoding."""
    from uk_address_matcher_ray.stages.urls import parse_urls

    return parse_urls(_docs_with_urls(sf_dir))


def _q_domain_stats(sf_dir: str):
    """Per-registered-domain doc and distinct-host counts: per-batch
    partial aggregation, one domain-keyed exchange."""
    from uk_address_matcher_ray.stages.urls import domain_doc_stats

    return domain_doc_stats(_docs_with_urls(sf_dir))


# ---------------------------------------------------------------------------
# link graph: href extraction + integer-domain PageRank (stages/graph.py)
# ---------------------------------------------------------------------------
# Deterministic linked-HTML synth: each doc links to two hosts derived
# from doc_id arithmetic (7i+3 and 13i+5 mod 23 — both multipliers are
# invertible mod 23, so the 23-host graph is fully connected in a few
# hops), plus an unterminated href (no closing quote) that the split
# contract drops on BOTH sides.  Mirrored verbatim by _LINKED_HTML_SQL.


def _linked_html_of(i: int) -> str:
    a = (i * 7 + 3) % 23
    b = (i * 13 + 5) % 23
    return (
        f'<p>see <a href="https://d{a}.example.com/x?k={i}">one</a> and '
        f'<a href="https://d{b}.example.com/y">two</a>, '
        'plain href="skip me</p>'
    )


_LINKED_HTML_SQL = (
    "'<p>see <a href=\"https://d' || (doc_id * 7 + 3) % 23 ||"
    " '.example.com/x?k=' || doc_id || '\">one</a> and"
    " <a href=\"https://d' || (doc_id * 13 + 5) % 23 ||"
    " '.example.com/y\">two</a>, plain href=\"skip me</p>'"
)


def _docs_with_linked_html(sf_dir: str):
    import pyarrow as pa
    import ray

    def add(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "html": pa.array(
                    [_linked_html_of(int(i)) for i in ids], pa.string()
                ),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(add, batch_format="pyarrow")


def _q_extract_links(sf_dir: str):
    """Vectorized outlink extraction (stages/graph.extract_links): split
    contract over the Arrow buffer — first-fragment drop via list
    offsets, closing-quote filter, first-quote prefix; zero shuffles."""
    from uk_address_matcher_ray.stages.graph import extract_links

    return extract_links(_docs_with_linked_html(sf_dir))


def _q_domain_pagerank(sf_dir: str):
    """Integer-domain PageRank over the synthetic host graph
    (stages/graph.pagerank): extract_links -> (src_host, dst_host) edges
    -> 3 damped power iterations entirely in int64 (order-free partial
    sums), DuckDB mirror unrolls the iterations as CTEs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray  # noqa: F401

    from uk_address_matcher_ray.stages.graph import (
        extract_links,
        link_hosts,
        pagerank,
    )

    links = extract_links(_docs_with_linked_html(sf_dir))

    def to_edges(batch: pa.Table) -> pa.Table:
        keep = pc.match_substring(batch.column("link"), "://")
        t = batch.filter(keep)
        ids = t.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        res = pc.cast(pa.array(ids % 23), pa.string())
        src = pc.binary_join_element_wise("d", res, ".example.com", "")
        return pa.table({"src": src, "dst": link_hosts(t.column("link"))})

    edges = links.map_batches(to_edges, batch_format="pyarrow")
    return pagerank(edges, iters=3)


def _domain_pagerank_sql() -> str:
    from uk_address_matcher_ray.stages.graph import (
        extract_links_sql,
        pagerank_sql,
    )

    links_sql = extract_links_sql(_LINKED_HTML_SQL, "documents")
    edges_sql = f"""
SELECT 'd' || (l.doc_id % 23) || '.example.com' AS src,
       split_part(split_part(l.link, '://', 2), '/', 1) AS dst
FROM ({links_sql}) l
WHERE contains(l.link, '://')
"""
    return pagerank_sql(edges_sql, iters=3)


def _q_domain_hits(sf_dir: str):
    """Integer-domain HITS hubs/authorities over the same host graph as
    domain_pagerank (stages/graph.hits): 3 max-renormalized half-round
    pairs entirely in integers; oracle unrolls the rounds as CTEs."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray  # noqa: F401

    from uk_address_matcher_ray.stages.graph import (
        extract_links,
        hits,
        link_hosts,
    )

    links = extract_links(_docs_with_linked_html(sf_dir))

    def to_edges(batch: pa.Table) -> pa.Table:
        keep = pc.match_substring(batch.column("link"), "://")
        t = batch.filter(keep)
        ids = t.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        res = pc.cast(pa.array(ids % 23), pa.string())
        src = pc.binary_join_element_wise("d", res, ".example.com", "")
        return pa.table({"src": src, "dst": link_hosts(t.column("link"))})

    edges = links.map_batches(to_edges, batch_format="pyarrow")
    return hits(edges, iters=3)


def _q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1-shape pricing summary (stages/olap.py): exact scaled-
    integer partials per batch, one skinny exchange, stated double
    division chains."""
    import ray

    from uk_address_matcher_ray.stages.olap import lineitem_pricing

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
        ],
    )
    return lineitem_pricing(ds)


def _q_top_parts(sf_dir: str):
    """Top-k parts by aggregated revenue (stages/olap.py): integer
    measure ranking after one partkey exchange, per-batch top-k
    pruning before the driver merge."""
    import ray

    from uk_address_matcher_ray.stages.olap import top_parts_by_revenue

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    return top_parts_by_revenue(li, k=10)


def _q_orders_by_month(sf_dir: str):
    """Calendar-month rollup (stages/olap.orders_by_month): numpy
    datetime64[M] truncation == date_trunc, exact cents partials, one
    skinny exchange."""
    import ray

    from uk_address_matcher_ray.stages.olap import orders_by_month

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    return orders_by_month(ds)


def _q_revenue_by_nation(sf_dir: str):
    """TPC-H Q5-shape 3-hop join (stages/olap.revenue_by_nation): two
    tagged-union key-grouped exchanges (custkey, orderkey) carrying
    3-int rows, nation map applied row-locally."""
    import ray

    from uk_address_matcher_ray.stages.olap import revenue_by_nation

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    c = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    n = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    return revenue_by_nation(li, o, c, n)


def _q_late_ship_priority(sf_dir: str):
    """TPC-H Q4-shape existence semi-join (stages/olap.py): batch-max
    lineitem partials + order rows over ONE key-grouped exchange, then
    a skinny priority count."""
    import ray

    from uk_address_matcher_ray.stages.olap import late_ship_priority_counts

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
    )
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    return late_ship_priority_counts(orders, lineitem)


def _q_jl_project(sf_dir: str):
    """Johnson–Lindenstrauss ±1 projection of embeddings
    (stages/pca.jl_project): PCA quantization + md5 sign grid, exact
    int64 sums, zero shuffles."""
    import ray

    from uk_address_matcher_ray.stages.pca import jl_project

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return jl_project(ds, k=8, dim=64)


def _q_fk_coverage(sf_dir: str):
    """Referential-integrity coverage lineitem->part
    (stages/integrity.py): tagged-union anti-join exchange, no
    broadcast, five-integer summary."""
    import ray

    from uk_address_matcher_ray.stages.integrity import fk_coverage

    child = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey"]
    )
    parent = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey"]
    )
    return fk_coverage(child, parent, "l_partkey", "p_partkey")


_AC_PHRASES = ["data", "join", "sort merge", "a", "scan", "batch batch"]


def _q_ac_scan(sf_dir: str):
    """Aho-Corasick multi-pattern scan (stages/acscan.py): automaton
    built once per actor, O(text) overlap-counting scan, zero
    shuffles; the oracle mirrors with a position explode."""
    import ray

    from uk_address_matcher_ray.stages.acscan import ac_scan

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ac_scan(ds, _AC_PHRASES)


def _q_user_timelines(sf_dir: str):
    """Ordered per-user timeline assembly
    (stages/sessions.user_timelines): one grouped exchange, in-group
    sort, (ts, event_id) tie-break; strings built at the group."""
    import ray

    from uk_address_matcher_ray.stages.sessions import user_timelines

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    )
    return user_timelines(ds)


def _q_latest_events(sf_dir: str):
    """Grouped argmax — most recent event per user
    (stages/sessions.latest_events): per-batch partial argmax, one
    grouped exchange, (us, event_id) tie-break."""
    import ray

    from uk_address_matcher_ray.stages.sessions import latest_events

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    )
    return latest_events(ds)


def _q_length_outliers(sf_dir: str):
    """Integer-exact grouped z-score outliers (stages/moments.py):
    (cnt·x - s)² > z²(cnt·ss - s²) — no float anywhere; moments
    exchange + broadcast stats + zero-shuffle flag pass."""
    import ray

    from uk_address_matcher_ray.stages.moments import grouped_outliers

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"],
    )
    return grouped_outliers(ds, "n_chars", "source", z=1)


def _q_profile_documents(sf_dir: str):
    """Generic column profiler (stages/profile.py): integer partials
    for rows/nulls, hashed-value exchange for exact distincts — values
    never ride the shuffle."""
    import ray

    from uk_address_matcher_ray.stages.profile import profile_columns

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    return profile_columns(
        ds, ["doc_id", "text", "lang", "source", "n_chars"]
    )


def _q_pct_rank(sf_dir: str):
    """Per-source percent rank of document length
    (stages/quantiles.group_percent_rank): one grouped exchange, sort +
    run-length rank kernel, SQL RANK tie semantics."""
    import ray

    from uk_address_matcher_ray.stages.quantiles import group_percent_rank

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"],
    )
    return group_percent_rank(ds, "n_chars", "source")


def _q_sample_exact_n(sf_dir: str):
    """Exact-N deterministic sample (stages/sampling.sample_exact_n):
    per-batch top-cap pruning, driver merge of batch winners only."""
    import ray

    from uk_address_matcher_ray.stages.sampling import sample_exact_n

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    return sample_exact_n(ds, 100)


def _q_lexical_diversity(sf_dir: str):
    """Type-token ratio per doc (stages/textstats.lexical_diversity):
    vectorized flat-tokens + in-batch Arrow group_bys, zero shuffles,
    one exact integer division."""
    import ray

    from uk_address_matcher_ray.stages.textstats import lexical_diversity

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return lexical_diversity(ds)


def _q_char_entropy(sf_dir: str):
    """Per-doc character-distribution entropy (stages/textstats.py):
    zero-shuffle row-local pass, lm ln-chain float regime."""
    import ray

    from uk_address_matcher_ray.stages.textstats import char_entropy

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return char_entropy(ds)


def _q_temperature_mix(sf_dir: str):
    """Temperature-flattened domain mixing (stages/sampling.py): isqrt
    integer weights, truncating per-group targets, md5-rank selection
    through the group_cap partial machinery."""
    import ray

    from uk_address_matcher_ray.stages.sampling import temperature_mix

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    return temperature_mix(ds, total=200)


def _q_funnel(sf_dir: str):
    """Funnel conversions view->click->purchase (stages/funnel.py):
    funnel-type prefilter before ONE user-keyed grouped exchange whose
    kernel reduces each user to a single reached-step integer."""
    import ray

    from uk_address_matcher_ray.stages.funnel import funnel_conversions

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    )
    return funnel_conversions(ds, ["view", "click", "purchase"])


def _q_domain_triangles(sf_dir: str):
    """Exact triangle count over the host graph
    (stages/graph.triangle_stats): degree-oriented wedge closure, five
    skinny exchanges, no broadcast and no driver node state."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray  # noqa: F401

    from uk_address_matcher_ray.stages.graph import (
        extract_links,
        link_hosts,
        triangle_stats,
    )

    links = extract_links(_docs_with_linked_html(sf_dir))

    def to_edges(batch: pa.Table) -> pa.Table:
        keep = pc.match_substring(batch.column("link"), "://")
        t = batch.filter(keep)
        ids = t.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        res = pc.cast(pa.array(ids % 23), pa.string())
        src = pc.binary_join_element_wise("d", res, ".example.com", "")
        return pa.table({"src": src, "dst": link_hosts(t.column("link"))})

    edges = links.map_batches(to_edges, batch_format="pyarrow")
    return triangle_stats(edges)


def _domain_triangles_sql() -> str:
    from uk_address_matcher_ray.stages.graph import (
        extract_links_sql,
        triangle_stats_sql,
    )

    links_sql = extract_links_sql(_LINKED_HTML_SQL, "documents")
    edges_sql = f"""
SELECT 'd' || (l.doc_id % 23) || '.example.com' AS src,
       split_part(split_part(l.link, '://', 2), '/', 1) AS dst
FROM ({links_sql}) l
WHERE contains(l.link, '://')
"""
    return triangle_stats_sql(edges_sql)


def _q_domain_kcore(sf_dir: str):
    """k-core peeling of the host graph (stages/graph.kcore): two
    skinny exchanges per fixed peel round, no broadcast, no driver
    node state."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray  # noqa: F401

    from uk_address_matcher_ray.stages.graph import (
        extract_links,
        kcore,
        link_hosts,
    )

    links = extract_links(_docs_with_linked_html(sf_dir))

    def to_edges(batch: pa.Table) -> pa.Table:
        keep = pc.match_substring(batch.column("link"), "://")
        t = batch.filter(keep)
        ids = t.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        res = pc.cast(pa.array(ids % 23), pa.string())
        src = pc.binary_join_element_wise("d", res, ".example.com", "")
        return pa.table({"src": src, "dst": link_hosts(t.column("link"))})

    edges = links.map_batches(to_edges, batch_format="pyarrow")
    return kcore(edges, k=2, rounds=4)


def _domain_kcore_sql() -> str:
    from uk_address_matcher_ray.stages.graph import (
        extract_links_sql,
        kcore_sql,
    )

    links_sql = extract_links_sql(_LINKED_HTML_SQL, "documents")
    edges_sql = f"""
SELECT 'd' || (l.doc_id % 23) || '.example.com' AS src,
       split_part(split_part(l.link, '://', 2), '/', 1) AS dst
FROM ({links_sql}) l
WHERE contains(l.link, '://')
"""
    return kcore_sql(edges_sql, k=2, rounds=4)


def _domain_hits_sql() -> str:
    from uk_address_matcher_ray.stages.graph import (
        extract_links_sql,
        hits_sql,
    )

    links_sql = extract_links_sql(_LINKED_HTML_SQL, "documents")
    edges_sql = f"""
SELECT 'd' || (l.doc_id % 23) || '.example.com' AS src,
       split_part(split_part(l.link, '://', 2), '/', 1) AS dst
FROM ({links_sql}) l
WHERE contains(l.link, '://')
"""
    return hits_sql(edges_sql, iters=3)


# ---------------------------------------------------------------------------
# DSIR importance resampling (stages/dsir.py): target = English docs
# ---------------------------------------------------------------------------
_DSIR_RAW_SQL = "SELECT doc_id, text FROM documents"
_DSIR_TGT_SQL = "SELECT doc_id, text FROM documents WHERE lang = 'en'"
_DSIR_N = 50


def _dsir_inputs(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    raw = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def en_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("lang"), "en")).select(
            ["doc_id", "text"]
        )

    tgt = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(en_only, batch_format="pyarrow")
    return raw, tgt


def _q_dsir_weights(sf_dir: str):
    """DSIR importance weights (stages/dsir.py): hashed unigram+bigram
    distributions fit via bucket-bounded partial counts, per-doc
    log-importance in one zero-shuffle broadcast pass."""
    import ray

    from uk_address_matcher_ray.stages.dsir import dsir_assets, dsir_weights

    raw, tgt = _dsir_inputs(sf_dir)
    assets = dsir_assets(raw, tgt)
    return dsir_weights(raw, ray.put(assets))


def _q_dsir_select(sf_dir: str):
    """DSIR hard-top-k selection: keep the n highest-importance docs
    (logw DESC, doc_id ASC), per-batch partial top-n prune."""
    import ray

    from uk_address_matcher_ray.stages.dsir import (
        dsir_assets,
        dsir_select,
        dsir_weights,
    )

    raw, tgt = _dsir_inputs(sf_dir)
    assets = dsir_assets(raw, tgt)
    return dsir_select(dsir_weights(raw, ray.put(assets)), _DSIR_N)


# ---------------------------------------------------------------------------
# incremental snapshot dedup + inverted index (stages/snapshot.py, index.py)
# ---------------------------------------------------------------------------
def _q_incremental_dedup(sf_dir: str):
    """Incremental snapshot dedup (stages/snapshot.py): new crawl =
    the variants table, kept corpus = even-doc_id truncated docs; one
    tagged h60-keyed exchange, seen side distinct-per-batch, in-group
    anti-join fully vectorized."""
    import pyarrow as pa

    from uk_address_matcher_ray.stages.snapshot import incremental_dedup

    def trunc_even(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        keep = [(i, t) for i, t in zip(ids, texts) if i % 2 == 0]
        return pa.table(
            {
                "doc_id": pa.array([i for i, _ in keep], pa.int64()),
                "text": pa.array(
                    [t[:DOC_TRUNC] if t else t for _, t in keep],
                    pa.string(),
                ),
            }
        )

    seen = _docs(sf_dir).map_batches(trunc_even, batch_format="pyarrow")
    return incremental_dedup(_docs_with_variants(sf_dir), seen)


_INDEX_MIN_DF = 3
_INDEX_MAX_DF = 400

_BM25_QUERIES = [
    ("q1", "HIGH STREET YORK"),
    ("q2", "FLAT MILL LANE"),
    ("q3", "STATION ROAD UNSEENTOKEN"),
]
_BM25_K = 10


def _q_bm25_topk(sf_dir: str):
    """BM25 top-k retrieval (stages/bm25.py): query-vocabulary-bounded
    integer asset pass, zero-shuffle broadcast scoring with per-batch
    per-query top-k pruning, rounded-score deterministic ranking."""
    import pyarrow as pa

    from uk_address_matcher_ray.stages.bm25 import bm25_topk
    from uk_address_matcher_ray.util import dataset_from_table

    canon, messy = _synth_tables(sf_dir)
    union = pa.concat_tables([canon, messy])
    docs = pa.table(
        {
            "unique_id": union.column("unique_id"),
            "text": union.column("address_concat"),
        }
    )
    return bm25_topk(
        dataset_from_table(docs),
        _BM25_QUERIES,
        _BM25_K,
        id_col="unique_id",
    )


def _q_inverted_index(sf_dir: str):
    """df-bounded inverted index over the address corpus
    (stages/index.py): vocabulary-bounded DF pre-pass collects only the
    over-cap Zipf head as a broadcast drop-set, posting groups bounded
    by max_df by construction."""
    import pyarrow as pa

    from uk_address_matcher_ray.stages.index import inverted_index
    from uk_address_matcher_ray.util import dataset_from_table

    canon, messy = _synth_tables(sf_dir)
    union = pa.concat_tables([canon, messy]).select(
        ["unique_id", "address_concat"]
    )
    return inverted_index(
        dataset_from_table(union),
        id_col="unique_id",
        text_col="address_concat",
        min_df=_INDEX_MIN_DF,
        max_df=_INDEX_MAX_DF,
    )


# ---------------------------------------------------------------------------
# WARC source (sources/warc.py): per-doc warcinfo+response container
# ---------------------------------------------------------------------------
def _warc_date_of(i: int) -> str:
    return f"2024-01-01T00:00:{i % 60:02d}Z"


_WARC_DATE_SQL = (
    "'2024-01-01T00:00:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') || 'Z'"
)


def _q_warc_extract(sf_dir: str):
    """WARC container parse (sources/warc.py): per-doc spec-valid
    warcinfo+response WARC bytes, Content-Length record walk, response
    filter — closed-form oracle states the expected fields directly
    from the synth inputs (the media_decode pattern)."""
    import pyarrow as pa
    import ray

    from uk_address_matcher_ray.sources.warc import (
        read_warc_blobs,
        synth_warc,
    )

    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        blobs = [
            synth_warc(
                [
                    {
                        "warc_type": "warcinfo",
                        "payload": b"software: graft-synth\r\n",
                    },
                    {
                        "warc_type": "response",
                        "target_uri": _url_of(int(i)),
                        "warc_date": _warc_date_of(int(i)),
                        "payload": _html_of(t).encode("utf-8"),
                    },
                ]
            )
            for i, t in zip(ids, texts)
        ]
        return pa.table(
            {
                "blob_id": batch.column("doc_id"),
                "warc": pa.array(blobs, pa.binary()),
            }
        )

    blobs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(build, batch_format="pyarrow")
    recs = read_warc_blobs(blobs, types=("response",))

    def project(batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("blob_id"),
                "url": batch.column("target_uri"),
                "warc_date": batch.column("warc_date"),
                "n_bytes": pa.array(
                    [len(p) for p in payloads], pa.int64()
                ),
                "page_text": pa.array(
                    [p.decode("utf-8") for p in payloads], pa.string()
                ),
            }
        )

    return recs.map_batches(project, batch_format="pyarrow")


def _warc_extract_sql() -> str:
    return f"""
SELECT doc_id,
       {_url_synth_case('doc_id')} AS url,
       {_WARC_DATE_SQL} AS warc_date,
       octet_length(encode({_HTML_SYNTH_SQL})) AS n_bytes,
       {_HTML_SYNTH_SQL} AS page_text
FROM documents
"""


def _url_oracle_cte() -> str:
    from uk_address_matcher_ray.stages.urls import (
        _MULTI_LABEL_SUFFIXES,
        URL_RE,
    )

    pat = URL_RE
    for g in ("scheme", "host", "path", "query"):
        pat = pat.replace(f"(?P<{g}>", "(")
    sufs = ",".join(f"'{s}'" for s in sorted(_MULTI_LABEL_SUFFIXES))
    return f"""
WITH u AS ({_URL_SYNTH_SQL}),
p AS (
  SELECT doc_id, regexp_matches(url, '{pat}') AS ok,
         regexp_extract(url, '{pat}', 1) AS scheme,
         regexp_extract(url, '{pat}', 2) AS host,
         regexp_extract(url, '{pat}', 3) AS path,
         regexp_extract(url, '{pat}', 4) AS query
  FROM u),
r AS (
  SELECT p.*,
    CASE WHEN host <> '' AND NOT regexp_matches(host, '[^0-9.]') THEN host
         WHEN len(string_split(host, '.')) <= 2 THEN host
         WHEN array_to_string(string_split(host, '.')[-2:], '.')
              IN ({sufs})
           THEN array_to_string(string_split(host, '.')[-3:], '.')
         ELSE array_to_string(string_split(host, '.')[-2:], '.')
    END AS registered_domain
  FROM p)
"""


def _parse_urls_sql() -> str:
    return (
        _url_oracle_cte()
        + """
SELECT doc_id,
       CASE WHEN ok THEN scheme END AS scheme,
       CASE WHEN ok THEN host END AS host,
       CASE WHEN ok THEN registered_domain END AS registered_domain,
       CASE WHEN ok THEN path END AS path,
       CASE WHEN ok THEN query END AS query
FROM r"""
    )


def _domain_stats_sql() -> str:
    return (
        _url_oracle_cte()
        + """
SELECT registered_domain,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
FROM r WHERE ok GROUP BY registered_domain"""
    )


def _q_redact_pii(sf_dir: str):
    """C4-style PII scrub over documents with deterministically injected
    e-mails / IPv4s / phone numbers (the corpus itself has none); the
    oracle injects the identical strings in SQL.  Kernel is fully
    vectorized RE2 (stages/pii.py) — redaction order is part of the
    contract."""
    import pyarrow as pa

    from uk_address_matcher_ray.stages.pii import redact_pii

    def inject(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = []
        for i, t in zip(ids, batch.column("text").to_pylist()):
            s = t or ""
            if i % 3 != 2:
                s += f" contact user{i}@example.com"
            if i % 4 != 3:
                s += f" from 10.{i % 256}.0.1"
            if i % 5 != 4:
                s += f" tel +44 20 7946 {(i * 7) % 10000:04d}"
            texts.append(s)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": pa.array(texts, pa.string()),
            }
        )

    return redact_pii(_docs(sf_dir).map_batches(inject, batch_format="pyarrow"))


def _redact_pii_sql() -> str:
    from uk_address_matcher_ray.stages.pii import (
        EMAIL_RE,
        EMAIL_TOKEN,
        IP_TOKEN,
        IPV4_RE,
        PHONE_RE,
        PHONE_TOKEN,
    )

    # SQL string literals: the patterns contain no single quotes; DuckDB
    # keeps backslashes literal inside '...', matching the Python source.
    return f"""
WITH injected AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 3 <> 2
            THEN ' contact user' || doc_id || '@example.com' ELSE '' END
    || CASE WHEN doc_id % 4 <> 3
            THEN ' from 10.' || (doc_id % 256) || '.0.1' ELSE '' END
    || CASE WHEN doc_id % 5 <> 4
            THEN ' tel +44 20 7946 '
                 || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
            ELSE '' END AS text
  FROM documents
),
r1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
         regexp_replace(text, '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g') AS t1
  FROM injected
),
r2 AS (
  SELECT doc_id, n_emails,
         len(regexp_extract_all(t1, '{IPV4_RE}')) AS n_ips,
         regexp_replace(t1, '{IPV4_RE}', '{IP_TOKEN}', 'g') AS t2
  FROM r1
)
SELECT doc_id,
       regexp_replace(t2, '{PHONE_RE}', '{PHONE_TOKEN}', 'g') AS text_redacted,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(n_ips AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(t2, '{PHONE_RE}')) AS BIGINT) AS n_phones
FROM r2
"""


def _q_doc_lang_counts(sf_dir: str):
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    return (
        ds.groupby("lang")
        .count()
        .map_batches(
            lambda t: t.rename_columns(["lang", "n"]), batch_format="pyarrow"
        )
    )


def _q_events_hourly(sf_dir: str):
    import pyarrow as pa
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def add_window_partial(batch: pa.Table) -> pa.Table:
        """Arrow-native window key + exact integer cents (round-half-even,
        same as Python round()), PRE-AGGREGATED per batch (integer sums are
        associative, so the partial/final split is exact) — only the
        per-batch distinct (user, hour) rows ride the groupby shuffle."""
        import numpy as np
        import pyarrow.compute as pc

        ts_us = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        # numpy // floors (pc.divide truncates toward zero, which would
        # bucket pre-1970 timestamps into the wrong hour)
        hours = pa.array(
            ts_us.to_numpy(zero_copy_only=False) // 3_600_000_000, pa.int64()
        )
        vals = batch.column("value").to_numpy(zero_copy_only=False)
        cents = np.rint(vals * 100.0).astype(np.int64)
        t = pa.table(
            {
                "user_id": batch.column("user_id"),
                "hour_window": hours,
                "cents": pa.array(cents, pa.int64()),
            }
        )
        part = t.group_by(["user_id", "hour_window"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return part.rename_columns(["user_id", "hour_window", "cents", "n"])

    # fan-in-8 tree of Arrow group_by merges (exact: integer sums are
    # associative) — no all-to-all; every intermediate is bounded by the
    # distinct (user, hour) group count. Unlike a token vocabulary that
    # cardinality is NOT corpus-bounded, so beyond the gate the distributed
    # groupby takes over (the tree root must stay driver-sized).
    partials = ds.map_batches(
        add_window_partial, batch_format="pyarrow"
    ).materialize()
    if partials.count() > 2_000_000:
        from ray.data.aggregate import Sum

        agg = partials.groupby(["user_id", "hour_window"]).aggregate(
            Sum("n"), Sum("cents")
        )

        def finish(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "user_id": batch.column("user_id").cast(pa.int64()),
                    "hour_window": batch.column("hour_window").cast(pa.int64()),
                    "n_events": batch.column("sum(n)").cast(pa.int64()),
                    "sum_value_cents": batch.column("sum(cents)").cast(pa.int64()),
                }
            )

        return agg.map_batches(finish, batch_format="pyarrow")
    refs = list(partials.to_arrow_refs())

    empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "hour_window": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )

    @ray.remote
    def merge(*tbls):
        live = [
            t for t in tbls if "user_id" in t.schema.names and t.num_rows > 0
        ]
        if not live:
            return empty
        t = pa.concat_tables(
            [x.cast(empty.schema) for x in live]
        )
        agg = t.group_by(["user_id", "hour_window"]).aggregate(
            [("cents", "sum"), ("n", "sum")]
        )
        return agg.rename_columns(["user_id", "hour_window", "cents", "n"])

    while len(refs) > 1:
        refs = [merge.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
    tbl = ray.get(refs[0]) if refs else empty
    out = pa.table(
        {
            "user_id": tbl.column("user_id").cast(pa.int64()),
            "hour_window": tbl.column("hour_window").cast(pa.int64()),
            "n_events": tbl.column("n").cast(pa.int64()),
            "sum_value_cents": tbl.column("cents").cast(pa.int64()),
        }
    )
    return ray.data.from_arrow(out)


def _q_label_accuracy(sf_dir: str):
    """E1 evaluation vs labels: top-1 per messy record compared to the synth
    truth (m{k} <-> c{k}); returns one row of counts."""
    import pyarrow as pa

    from uk_address_matcher_ray.pipelines.evaluate import accuracy_vs_labels
    from uk_address_matcher_ray.sources import synth

    keys = _custkeys(sf_dir)
    labels = synth.truth_labels(keys)
    counts = accuracy_vs_labels(_predict_ds(sf_dir), labels)
    return pa.table(
        {
            "correct": pa.array([counts["correct"]], pa.int64()),
            "incorrect": pa.array([counts["incorrect"]], pa.int64()),
            "missing": pa.array([counts["missing"]], pa.int64()),
        }
    )


def _q_train_em(sf_dir: str):
    """EM training of m/u weights over the blocked gamma vectors (north-star
    'weights learned via an EM pass implemented as iterative Dataset
    aggregations'); 2 unrolled iterations, fixed-point deterministic sums."""
    from uk_address_matcher_ray.stages.score import predict
    from uk_address_matcher_ray.stages.train import em_train
    from uk_address_matcher_ray.state.model import MatchModel

    cl, cm, _ntf, _messy = _cleaned_sides(sf_dir)
    model = MatchModel()
    pairs = predict(cl, cm, model, {}, threshold=-1e300, salt_threshold=20000)
    _w, _lam, tbl = em_train(pairs, model, iterations=2)
    return tbl


def _q_adjacent_tokens(sf_dir: str):
    """C12/C13 adjacent-record distinguishing tokens + generalised aliases
    (distributed neighbour-window; stages/adjacent.py)."""
    import pyarrow as pa

    from uk_address_matcher_ray.stages.adjacent import (
        derive_adjacent_distinguishing_tokens,
    )
    from uk_address_matcher_ray.util import dataset_from_table

    canon, messy = _synth_tables(sf_dir)
    union = pa.concat_tables([canon, messy]).select(["unique_id", "address_concat"])
    out = derive_adjacent_distinguishing_tokens(dataset_from_table(union))
    return out.select_columns(
        [
            "unique_id",
            "distinguishing_adj_start_tokens",
            "common_adj_start_tokens",
            "distinguishing_adj_token_aliases",
        ]
    )


def _q_tf_build(sf_dir: str):
    """TF-table build pipeline (reference scripts/generate_better_tfs.py):
    distinct (address_concat, postcode) -> address + numeric TF tables."""
    import pyarrow as pa

    from uk_address_matcher_ray.pipelines.tfbuild import (
        build_tf_tables,
        distinct_addresses,
    )
    from uk_address_matcher_ray.util import dataset_from_table

    canon, messy = _synth_tables(sf_dir)
    union = pa.concat_tables([canon, messy])
    tok_tbl, num_tbl = build_tf_tables(distinct_addresses(dataset_from_table(union)))
    return pa.table(
        {
            "kind": pa.array(
                ["address"] * tok_tbl.num_rows + ["numeric"] * num_tbl.num_rows,
                pa.string(),
            ),
            "token": pa.concat_arrays(
                [
                    tok_tbl.column("token").combine_chunks(),
                    num_tbl.column("numeric_token").combine_chunks(),
                ]
            ),
            "rel_freq": pa.concat_arrays(
                [
                    tok_tbl.column("rel_freq").combine_chunks(),
                    num_tbl.column("tf_numeric_token").combine_chunks(),
                ]
            ),
        }
    )


def _q_media_features(sf_dir: str):
    """Multimodal plumbing demo: html payloads as opaque binary media."""
    import pyarrow as pa
    import ray

    from uk_address_matcher_ray.sources.webpages import synth_web_pages
    from uk_address_matcher_ray.stages.multimodal import extract_media_features

    _canon, messy = _synth_tables(sf_dir)
    pages = synth_web_pages(
        [(r["unique_id"], r["address_concat"], r["postcode"]) for r in messy.to_pylist()]
    )
    media = pa.table(
        {
            "media_id": pages.column("url"),
            "kind": pa.array(["image"] * pages.num_rows, pa.string()),
            "payload": pages.column("html"),
        }
    )
    from uk_address_matcher_ray.util import dataset_from_table

    return extract_media_features(dataset_from_table(media)).select_columns(
        ["media_id", "byte_hist"]
    )


def _q_video_frames(sf_dir: str):
    """REAL video frame sampling (multimodal.sample_video_frames): one
    RAWV clip per messy record (16x12 RGB, 6 + k%5 frames @10fps, pixel
    = (k*7 + f*59 + y*31 + x*13 + c*101) % 256), every 2nd frame decoded
    in the task and reduced to its integer mean luma — skinny
    (id, frame_idx, ts_ms, luma) rows; the pixels never leave the task.
    Oracle recomputes every sampled frame's luma from the formula."""
    import numpy as np
    import pyarrow as pa

    from uk_address_matcher_ray.stages.multimodal import (
        encode_rawv,
        sample_video_frames,
    )
    from uk_address_matcher_ray.util import dataset_from_table

    _canon, messy = _synth_tables(sf_dir)

    y = np.arange(12, dtype=np.int64)[None, :, None, None]
    x = np.arange(16, dtype=np.int64)[None, None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, None, :]

    def to_video(batch: pa.Table) -> pa.Table:
        ids = batch.column("unique_id").to_pylist()
        payloads = []
        for uid in ids:
            k = int(uid[1:])
            n = 6 + k % 5
            f = np.arange(n, dtype=np.int64)[:, None, None, None]
            pix = (k * 7 + f * 59 + y * 31 + x * 13 + c * 101) % 256
            payloads.append(encode_rawv(pix.astype(np.uint8), fps=10))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    vids = dataset_from_table(messy).map_batches(to_video, batch_format="pyarrow")
    return sample_video_frames(vids, every_n=2)


VIDEO_FRAMES_SQL = """
WITH ks AS (
    SELECT DISTINCT c_custkey AS k FROM customer WHERE c_custkey % 3 != 0
),
fr AS (
    SELECT k, f.r AS f
    FROM ks, range(11) f(r)
    WHERE f.r < 6 + k % 5 AND f.r % 2 = 0
),
g AS (
    SELECT k, f,
           (299 * ((k * 7 + f * 59 + y.r * 31 + x.r * 13 + 0 * 101) % 256)
            + 587 * ((k * 7 + f * 59 + y.r * 31 + x.r * 13 + 1 * 101) % 256)
            + 114 * ((k * 7 + f * 59 + y.r * 31 + x.r * 13 + 2 * 101) % 256)
           ) // 1000 AS gray
    FROM fr, range(12) y(r), range(16) x(r)
)
SELECT 'm' || CAST(k AS VARCHAR) AS media_id,
       CAST(f AS INT) AS frame_idx,
       CAST(f * 1000 // 10 AS INT) AS ts_ms,
       CAST(SUM(gray) // 192 AS BIGINT) AS luma
FROM g GROUP BY k, f
"""


# audio synth shared by audio_power / audio_resample: one 16-bit PCM mono
# WAV per messy record — sample s(i) = ((k*31 + i*17) % 4096) - 2048,
# zeroed on every third 256-window (designed silence), 1024 + (k%4)*256
# samples @8kHz. Mirrored verbatim by the oracles.
def _audio_synth_wavs(sf_dir: str):
    import struct

    import numpy as np
    import pyarrow as pa

    from uk_address_matcher_ray.util import dataset_from_table

    _canon, messy = _synth_tables(sf_dir)

    def to_wav(batch: pa.Table) -> pa.Table:
        ids = batch.column("unique_id").to_pylist()
        payloads = []
        for uid in ids:
            k = int(uid[1:])
            n = 1024 + (k % 4) * 256
            i = np.arange(n, dtype=np.int64)
            v = ((k * 31 + i * 17) % 4096) - 2048
            v[(i // 256) % 3 == 2] = 0
            pcm = v.astype("<i2").tobytes()
            fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
            body = (
                b"WAVE"
                + b"fmt "
                + struct.pack("<I", len(fmt))
                + fmt
                + b"data"
                + struct.pack("<I", len(pcm))
                + pcm
            )
            payloads.append(b"RIFF" + struct.pack("<I", len(body)) + body)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return dataset_from_table(messy).map_batches(to_wav, batch_format="pyarrow")


def _q_audio_power(sf_dir: str):
    """Windowed audio power + silence detection
    (multimodal.audio_power_windows): the shared synth WAVs decoded raw
    in the task, integer power per full 256-sample window. Oracle
    recomputes power = SUM(s*s)//256 from the sample formula."""
    from uk_address_matcher_ray.stages.multimodal import audio_power_windows

    return audio_power_windows(
        _audio_synth_wavs(sf_dir), window=256, silence_below=1000
    )


def _q_audio_resample(sf_dir: str):
    """Linear audio resample 8kHz -> 5kHz (multimodal.audio_resample):
    channel 0 resampled with resample_linear's IEEE expression contract;
    emits the full resampled sample list so the oracle's line-by-line
    restatement is compared value-for-value."""
    from uk_address_matcher_ray.stages.multimodal import audio_resample

    return audio_resample(_audio_synth_wavs(sf_dir), out_rate=5000)


AUDIO_POWER_SQL = """
WITH ks AS (
    SELECT DISTINCT c_custkey AS k FROM customer WHERE c_custkey % 3 != 0
),
s AS (
    SELECT k, i.r AS i,
           CASE WHEN (i.r // 256) % 3 = 2 THEN 0
                ELSE ((k * 31 + i.r * 17) % 4096) - 2048 END AS v
    FROM ks, range(1792) i(r)
    WHERE i.r < 1024 + (k % 4) * 256
),
w AS (
    SELECT k, i // 256 AS win_idx, CAST(SUM(v * v) // 256 AS BIGINT) AS power
    FROM s GROUP BY 1, 2
)
SELECT 'm' || CAST(k AS VARCHAR) AS media_id,
       CAST(win_idx AS INT) AS win_idx,
       CAST(win_idx * 256 * 1000 // 8000 AS INT) AS start_ms,
       power,
       power < 1000 AS silent
FROM w
"""


def _q_media_resize(sf_dir: str):
    """Bilinear image resize (multimodal.resize_bilinear): media_decode's
    synthesized 16x16 PPMs decoded in the task and resized to 10x7 with
    the documented IEEE-expression contract; emits the resized pixels in
    (y, x, c) order so the oracle's line-by-line restatement of the
    interpolation is compared value-for-value."""
    import numpy as np
    import pyarrow as pa

    from uk_address_matcher_ray.stages.multimodal import (
        _decode_image,
        resize_bilinear,
    )
    from uk_address_matcher_ray.util import dataset_from_table

    _canon, messy = _synth_tables(sf_dir)

    y = np.arange(16, dtype=np.int64)[:, None, None]
    x = np.arange(16, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]

    def resize(batch: pa.Table) -> pa.Table:
        ids = batch.column("unique_id").to_pylist()
        pixels = []
        for uid in ids:
            k = int(uid[1:])
            pix = (k * 7 + y * 31 + x * 13 + c * 101) % 256
            payload = b"P6\n16 16\n255\n" + pix.astype(np.uint8).tobytes()
            small = resize_bilinear(_decode_image(payload), 10, 7)
            pixels.append(small.ravel().astype(np.int32))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "pixels": pa.array(
                    [p.tolist() for p in pixels], pa.list_(pa.int32())
                ),
            }
        )

    return dataset_from_table(messy).map_batches(resize, batch_format="pyarrow")


# image synth for the dHash queries: one 16x16 PPM per messy record —
# pixel(c) = ((k//2)*37 + y*31 + x*13 + c*101 + pert) % 256 with a
# top-left red-patch perturbation on odd k, so (2m, 2m+1) are designed
# near-dup twins. Mirrored verbatim in oracle_extras._DHASH_CTE.
def _dhash_synth_media(sf_dir: str):
    import numpy as np
    import pyarrow as pa

    from uk_address_matcher_ray.util import dataset_from_table

    _canon, messy = _synth_tables(sf_dir)

    y = np.arange(16, dtype=np.int64)[:, None, None]
    x = np.arange(16, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    pert_mask = (y < 2) & (x < 2) & (c == 0)

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch.column("unique_id").to_pylist()
        payloads = []
        for uid in ids:
            k = int(uid[1:])
            pix = (k // 2) * 37 + y * 31 + x * 13 + c * 101
            if k % 2 == 1:
                pix = pix + pert_mask * 120
            pix = pix % 256
            payloads.append(
                b"P6\n16 16\n255\n" + pix.astype(np.uint8).tobytes()
            )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return dataset_from_table(messy).map_batches(to_media, batch_format="pyarrow")


def _q_image_dhash(sf_dir: str):
    """Perceptual image hashing (stages/imagehash.py): decode each
    synthesized PPM in the task, emit the 64-bit integer-exact dHash —
    8 bytes/image leave the stage. Oracle recomputes the hash from the
    pixel formula in pure integer SQL."""
    from uk_address_matcher_ray.stages.imagehash import image_dhash

    return image_dhash(_dhash_synth_media(sf_dir))


def _q_image_near_dup(sf_dir: str):
    """Image near-dup pairs: dHash + the generic banded-Hamming join
    (stages/dedup.hamming_pairs — exact for max_hamming < bands, shared
    with simhash). Oracle brute-forces bit_count(xor) over the
    recomputed hashes."""
    from uk_address_matcher_ray.stages.imagehash import image_near_dup_pairs

    return image_near_dup_pairs(
        _dhash_synth_media(sf_dir), max_hamming=3, bands=4
    )


def _q_duplicate_spans(sf_dir: str):
    """Exact duplicate k-token span detection over the documents table —
    the exact-substring-dedup primitive (boilerplate/licence blocks)."""
    import ray

    from uk_address_matcher_ray.stages.dedup import duplicate_spans

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return duplicate_spans(ds, k=8, min_docs=2)


def _q_remove_duplicate_spans(sf_dir: str):
    """Exact-substring REMOVAL (Lee et al. 2022 apply half): every 8-token
    window shared by >= 2 distinct docs is cut from every doc; kept tokens
    re-join with single spaces. The duplicated-span set rides the hashed
    duplicate_spans detection; the removal pass is row-local against a
    ray.put (hash array, string set) broadcast — zero extra shuffles."""
    import ray

    from uk_address_matcher_ray.stages.dedup import remove_duplicate_spans

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return remove_duplicate_spans(ds, k=8, min_docs=2)


REMOVE_DUPLICATE_SPANS_SQL = """
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
    FROM documents
),
idx AS (
    SELECT doc_id, t, unnest(range(len(t) - 7)) AS i
    FROM toks WHERE len(t) >= 8
),
spans AS (
    SELECT doc_id, i, array_to_string(t[i + 1 : i + 8], ' ') AS span FROM idx
),
dups AS (
    SELECT span FROM spans GROUP BY span
    HAVING count(DISTINCT doc_id) >= 2
),
cover AS (
    SELECT DISTINCT s.doc_id, s.i + u.j AS pos
    FROM spans s
    JOIN dups d USING (span)
    CROSS JOIN (SELECT unnest(range(8)) AS j) u
),
tok_pos AS (
    SELECT doc_id, unnest(t) AS token, unnest(range(len(t))) AS pos
    FROM toks
),
kept AS (
    SELECT tp.doc_id,
           string_agg(tp.token, ' ' ORDER BY tp.pos) AS text,
           count(*) AS n_kept
    FROM tok_pos tp
    LEFT JOIN cover c ON tp.doc_id = c.doc_id AND tp.pos = c.pos
    WHERE c.pos IS NULL
    GROUP BY tp.doc_id
)
SELECT tk.doc_id,
       coalesce(k.text, '') AS text,
       CAST(len(tk.t) - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed
FROM toks tk LEFT JOIN kept k USING (doc_id)
"""


DUPLICATE_SPANS_SQL = """
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
    FROM documents
),
idx AS (
    SELECT doc_id, t, unnest(range(len(t) - 7)) AS i
    FROM toks WHERE len(t) >= 8
),
spans AS (
    SELECT doc_id, array_to_string(t[i + 1 : i + 8], ' ') AS span FROM idx
),
per_doc AS (SELECT span, doc_id, count(*) AS occ FROM spans GROUP BY 1, 2),
agg AS (
    SELECT span, count(*) AS n_docs, sum(occ) AS occurrences
    FROM per_doc GROUP BY 1
)
SELECT span, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(occurrences AS BIGINT) AS occurrences
FROM agg WHERE n_docs >= 2
"""


def _q_embedding_lsh(sf_dir: str):
    """Approximate cosine near-dup via random-hyperplane LSH — the corpus-
    scale embedding dedup path. The synth embeddings are near-orthogonal, so
    the query derives deterministic near-duplicates (integer-hash uniform
    perturbations of every 5th vector, id+1e6 — a formula numpy and DuckDB
    compute bit-identically) and reports the verified pairs at cosine >=
    0.9. Oracle: oracle_extras.embedding_lsh_sql mirrors the full LSH
    (literal hyperplane sign bits -> band-slice collision join -> Hamming
    prefilter -> exact cosine); recall/subset gates additionally live in
    tests/test_embedding_lsh.py."""
    import numpy as np
    import pyarrow as pa
    import ray

    from uk_address_matcher_ray.stages.dedup import embedding_lsh_pairs

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def add_dups(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_pylist()
        vecs = batch.column("embedding").to_pylist()
        out_ids = list(ids)
        out_vecs = [list(map(float, v)) for v in vecs]
        for i, v in zip(ids, vecs):
            if i % 5 == 0:
                a = np.asarray(v, dtype=np.float64)
                jj = np.arange(len(a), dtype=np.int64)
                hh = (
                    (np.int64(i) * len(a) + jj + 1) * np.int64(2654435761)
                ) % np.int64(4294967296)
                u = (hh % np.int64(2001) - np.int64(1000)).astype(
                    np.float64
                ) / 1000.0
                p = a + 0.03 * np.linalg.norm(a) * u
                out_ids.append(int(i) + 1_000_000)
                out_vecs.append([float(x) for x in p])
        return pa.table(
            {
                "vec_id": pa.array(out_ids, pa.int64()),
                "embedding": pa.array(out_vecs, pa.list_(pa.float64())),
            }
        )

    aug = ds.map_batches(add_dups, batch_format="pyarrow")
    out = embedding_lsh_pairs(aug, id_col="vec_id", threshold=0.9)

    def round_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.set_column(
            batch.schema.get_field_index("cosine"),
            "cosine",
            pc.round(batch.column("cosine"), ndigits=6),
        )

    return out.map_batches(round_batch, batch_format="pyarrow")


def _q_media_decode(sf_dir: str):
    """REAL media decode: deterministic 16x16 PPM images synthesized per
    messy record, decoded by the pure-numpy decoder inside the actor pool
    and reduced to 4x4 grid-brightness features (stages/multimodal.py)."""
    import numpy as np
    import pyarrow as pa

    from uk_address_matcher_ray.stages.multimodal import extract_media_features
    from uk_address_matcher_ray.util import dataset_from_table

    _canon, messy = _synth_tables(sf_dir)

    y = np.arange(16, dtype=np.int64)[:, None, None]
    x = np.arange(16, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch.column("unique_id").to_pylist()
        payloads = []
        for uid in ids:
            k = int(uid[1:])
            pix = (k * 7 + y * 31 + x * 13 + c * 101) % 256
            payloads.append(
                b"P6\n16 16\n255\n" + pix.astype(np.uint8).tobytes()
            )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "kind": pa.array(["image"] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    media = dataset_from_table(messy).map_batches(
        to_media, batch_format="pyarrow"
    )
    return extract_media_features(media, use_real_decoder=True).select_columns(
        ["media_id", "features"]
    )


def _q_events_asof(sf_dir: str):
    """Distributed as-of join (stages/joins.py): each purchase event gets
    the user's latest signup at-or-before it — one key-hash exchange, a
    lexsort + maximum.accumulate kernel over complete user timelines.
    Oracle: DuckDB's native ASOF JOIN. Output projects the matched ts and
    the lag (tie-invariant columns; see the module docstring)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from uk_address_matcher_ray.stages.joins import asof_join

    def only(kind):
        def f(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch.column("event_type"), kind))

        return f

    ev = f"{sf_dir}/events.parquet"
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    left = ray.data.read_parquet(ev, columns=cols).map_batches(
        only("purchase"), batch_format="pyarrow"
    )
    right = ray.data.read_parquet(ev, columns=cols).map_batches(
        only("signup"), batch_format="pyarrow"
    )
    joined = asof_join(left, right, key="user_id", ts="ts", right_cols=["ts"])

    def project(batch: pa.Table) -> pa.Table:
        lag = pc.divide(
            pc.cast(
                pc.subtract(
                    batch.column("ts").cast(pa.int64()),
                    batch.column("ts_r").cast(pa.int64()),
                ),
                pa.float64(),
            ),
            1_000_000.0,
        )
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts"),
                "purchase_value": batch.column("value"),
                "signup_ts": batch.column("ts_r"),
                "lag_sec": lag,
            }
        )

    return joined.map_batches(project, batch_format="pyarrow")


def _q_events_asof_chunked(sf_dir: str):
    """Hot-key-safe as-of join (stages/joins.asof_join_chunked): global
    (key, ts, side) range sort + per-block carry-forward + O(blocks)
    driver boundary walk carrying ONE right row — no complete-group
    contract, so a user timeline bigger than a worker's heap streams.
    Same oracle as events_asof_join (outputs identical by construction;
    differential-tested in tests/test_asof_chunked.py)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from uk_address_matcher_ray.stages.joins import asof_join_chunked

    def only(kind):
        def f(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch.column("event_type"), kind))

        return f

    ev = f"{sf_dir}/events.parquet"
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    left = ray.data.read_parquet(ev, columns=cols).map_batches(
        only("purchase"), batch_format="pyarrow"
    )
    right = ray.data.read_parquet(ev, columns=cols).map_batches(
        only("signup"), batch_format="pyarrow"
    )
    joined = asof_join_chunked(
        left, right, key="user_id", ts="ts", right_cols=["ts"]
    )

    def project(batch: pa.Table) -> pa.Table:
        lag = pc.divide(
            pc.cast(
                pc.subtract(
                    batch.column("ts").cast(pa.int64()),
                    batch.column("ts_r").cast(pa.int64()),
                ),
                pa.float64(),
            ),
            1_000_000.0,
        )
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts"),
                "purchase_value": batch.column("value"),
                "signup_ts": batch.column("ts_r"),
                "lag_sec": lag,
            }
        )

    return joined.map_batches(project, batch_format="pyarrow")


SESSION_GAP_US = 6 * 3600 * 1_000_000  # 6 h inactivity closes a session


def _q_user_sessions(sf_dir: str):
    """Gap-based sessionization (stages/sessions.py): per-user activity
    sessions over ALL events (new session when >6h since the previous
    event), one key-hash exchange + a lexsort/reduceat kernel. Oracle:
    DuckDB lag()/running-sum window chain. Money sums ride as integer
    cents (events_hourly convention)."""
    import ray

    from uk_address_matcher_ray.stages.sessions import sessionize

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )
    return sessionize(
        ev,
        key="user_id",
        ts="ts",
        gap=SESSION_GAP_US,
        value="value",
        tiebreak="event_id",
    )


def _q_user_sessions_chunked(sf_dir: str):
    """Hot-key-safe sessionization (stages/sessions.sessionize_chunked):
    global (key, ts) range sort + per-block local sessions + O(blocks)
    driver boundary-carry merge — NO complete-group contract, so a
    single key bigger than a worker's heap still streams. Same oracle
    as user_sessions (outputs identical by construction; differential +
    property tested in tests/test_sessions_chunked.py)."""
    import ray

    from uk_address_matcher_ray.stages.sessions import sessionize_chunked

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )
    return sessionize_chunked(
        ev,
        key="user_id",
        ts="ts",
        gap=SESSION_GAP_US,
        value="value",
        tiebreak="event_id",
    )


_USER_SESSIONS_SQL = f"""
WITH d AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        > {SESSION_GAP_US}
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
    SELECT *, SUM(new_s) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING
    ) AS session_id
    FROM d
)
SELECT user_id,
       CAST(session_id AS BIGINT) AS session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS sum_value_cents
FROM s GROUP BY user_id, session_id
"""


RANGE_JOIN_WINDOW_US = 86_400 * 1_000_000  # +/- 1 day


def _q_events_range(sf_dir: str):
    """Bucketed time-window join (stages/joins.py range_join): purchase x
    error event pairs of the same user within +/-1 day. Right rows land in
    one window-width bucket, left rows replicate to bucket +/-1 — each
    qualifying pair meets exactly once; hot users spread across their time
    buckets (unlike asof's whole-timeline co-location)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from uk_address_matcher_ray.stages.joins import range_join

    def only(kind):
        def f(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch.column("event_type"), kind))

        return f

    ev = f"{sf_dir}/events.parquet"
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    left = ray.data.read_parquet(ev, columns=cols).map_batches(
        only("purchase"), batch_format="pyarrow"
    )
    right = ray.data.read_parquet(ev, columns=cols).map_batches(
        only("error"), batch_format="pyarrow"
    )
    joined = range_join(
        left,
        right,
        key="user_id",
        ts="ts",
        window=RANGE_JOIN_WINDOW_US,
        right_cols=["ts", "event_id", "value"],
    )
    return joined.select_columns(
        ["event_id", "user_id", "ts", "value", "event_id_r", "ts_r", "value_r"]
    )


_EVENTS_RANGE_SQL = f"""
SELECT l.event_id, l.user_id, l.ts, l.value,
       r.event_id AS event_id_r, r.ts AS ts_r, r.value AS value_r
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
JOIN (SELECT * FROM events WHERE event_type = 'error') r
  ON l.user_id = r.user_id
 AND epoch_us(r.ts) BETWEEN epoch_us(l.ts) - {RANGE_JOIN_WINDOW_US}
                        AND epoch_us(l.ts) + {RANGE_JOIN_WINDOW_US}
"""


_EVENTS_ASOF_SQL = """
SELECT l.event_id,
       l.user_id,
       l.ts,
       l.value AS purchase_value,
       r.ts AS signup_ts,
       CAST(epoch_us(l.ts) - epoch_us(r.ts) AS DOUBLE) / 1000000.0 AS lag_sec
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def _q_media_decode_png(sf_dir: str):
    """REAL PNG decode (stdlib-zlib inflate + filter reconstruction,
    functions/png.py): the same deterministic 16x16 pixel formula as
    media_decode, but carried through PNG encode -> distributed decode.
    PNG is lossless, so the oracle is the identical pixel-formula SQL."""
    import numpy as np
    import pyarrow as pa

    from uk_address_matcher_ray.stages.multimodal import extract_media_features
    from uk_address_matcher_ray.util import dataset_from_table

    _canon, messy = _synth_tables(sf_dir)

    y = np.arange(16, dtype=np.int64)[:, None, None]
    x = np.arange(16, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]

    def to_media(batch: pa.Table) -> pa.Table:
        from uk_address_matcher_ray.functions.png import encode_png

        ids = batch.column("unique_id").to_pylist()
        payloads = []
        for uid in ids:
            k = int(uid[1:])
            pix = ((k * 7 + y * 31 + x * 13 + c * 101) % 256).astype(np.uint8)
            payloads.append(encode_png(pix))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "kind": pa.array(["image"] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    media = dataset_from_table(messy).map_batches(
        to_media, batch_format="pyarrow"
    )
    return extract_media_features(media, use_real_decoder=True).select_columns(
        ["media_id", "features"]
    )


def _q_media_decode_tiff(sf_dir: str):
    """REAL uncompressed-TIFF decode (functions/tiff.py, pure struct/numpy):
    same deterministic 16x16 pixel formula as media_decode, carried through
    TIFF encode -> distributed decode. TIFF baseline is lossless, so the
    oracle is the identical pixel-formula SQL."""
    import numpy as np
    import pyarrow as pa

    from uk_address_matcher_ray.stages.multimodal import extract_media_features
    from uk_address_matcher_ray.util import dataset_from_table

    _canon, messy = _synth_tables(sf_dir)

    y = np.arange(16, dtype=np.int64)[:, None, None]
    x = np.arange(16, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]

    def to_media(batch: pa.Table) -> pa.Table:
        from uk_address_matcher_ray.functions.tiff import encode_tiff

        ids = batch.column("unique_id").to_pylist()
        payloads = []
        for uid in ids:
            k = int(uid[1:])
            pix = ((k * 7 + y * 31 + x * 13 + c * 101) % 256).astype(np.uint8)
            # rotate compression/predictor so the REAL TIFF-LZW, PackBits
            # and differencing paths all run distributed (all lossless)
            payloads.append(
                encode_tiff(
                    pix,
                    compression=("none", "lzw", "packbits")[k % 3],
                    predictor=2 if k % 5 == 1 else 1,
                )
            )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "kind": pa.array(["image"] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    media = dataset_from_table(messy).map_batches(
        to_media, batch_format="pyarrow"
    )
    return extract_media_features(media, use_real_decoder=True).select_columns(
        ["media_id", "features"]
    )


def _q_media_decode_gif(sf_dir: str):
    """REAL GIF decode (functions/gif.py, pure numpy LZW): the same
    deterministic 16x16 pixel formula as media_decode, carried through
    GIF encode (real greedy LZW, <=256 colors by construction) ->
    distributed decode. GIF is lossless, so the oracle is the identical
    pixel-formula SQL."""
    import numpy as np
    import pyarrow as pa

    from uk_address_matcher_ray.stages.multimodal import extract_media_features
    from uk_address_matcher_ray.util import dataset_from_table

    _canon, messy = _synth_tables(sf_dir)

    y = np.arange(16, dtype=np.int64)[:, None, None]
    x = np.arange(16, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]

    def to_media(batch: pa.Table) -> pa.Table:
        from uk_address_matcher_ray.functions.gif import encode_gif

        ids = batch.column("unique_id").to_pylist()
        payloads = []
        for n, uid in enumerate(ids):
            k = int(uid[1:])
            pix = ((k * 7 + y * 31 + x * 13 + c * 101) % 256).astype(np.uint8)
            # alternate interlaced frames so the 4-pass deinterlace runs
            # in the distributed path too
            payloads.append(encode_gif(pix, interlace=(k % 2 == 1)))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "kind": pa.array(["image"] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    media = dataset_from_table(messy).map_batches(
        to_media, batch_format="pyarrow"
    )
    return extract_media_features(media, use_real_decoder=True).select_columns(
        ["media_id", "features"]
    )


def _q_media_decode_jpeg(sf_dir: str):
    """REAL baseline-JPEG decode (pure-numpy Huffman+IDCT codec,
    functions/jpeg.py): one 32x32 4:2:0 JPEG per messy record, four 16x16
    constant-color macroblocks (color = (k*7 + by*31 + bx*13 + c*101) % 256),
    restart markers every MCU. Constant integer-YCbCr blocks survive the
    quant-8 round trip bit-exactly (module docstring), so the oracle
    computes the decoded pixels in closed form (YCbCr round trip with the
    codec's floor(x+0.5) rounding) and aggregates the same grid features."""
    import numpy as np
    import pyarrow as pa

    from uk_address_matcher_ray.stages.multimodal import extract_media_features
    from uk_address_matcher_ray.util import dataset_from_table

    _canon, messy = _synth_tables(sf_dir)

    def to_media(batch: pa.Table) -> pa.Table:
        from uk_address_matcher_ray.functions.jpeg import encode_jpeg

        ids = batch.column("unique_id").to_pylist()
        payloads = []
        for uid in ids:
            k = int(uid[1:])
            img = np.zeros((32, 32, 3), dtype=np.uint8)
            for by in range(2):
                for bx in range(2):
                    col = [(k * 7 + by * 31 + bx * 13 + c * 101) % 256 for c in range(3)]
                    img[by * 16 : by * 16 + 16, bx * 16 : bx * 16 + 16] = col
            payloads.append(
                encode_jpeg(img, subsampling="4:2:0", restart_interval=1)
            )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "kind": pa.array(["image"] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    media = dataset_from_table(messy).map_batches(
        to_media, batch_format="pyarrow"
    )
    return extract_media_features(media, use_real_decoder=True).select_columns(
        ["media_id", "features"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "clean_features": _q_clean_features,
        "token_tf": _q_token_tf,
        "numeric_tf": _q_numeric_tf,
        "predict_pairs": _q_predict_pairs,
        "waterfall": _q_waterfall,
        "match_clusters": _q_match_clusters,
        "improve_pairs": _q_improve_pairs,
        "tune_rewards": _q_tune_rewards,
        "match_one": _q_match_one,
        "best_matches": _q_best_matches,
        "best_matches_summary": _q_best_matches_summary,
        "extract_pages": _q_extract_pages,
        "exact_dedup_docs": _q_exact_dedup_docs,
        "duplicate_spans": _q_duplicate_spans,
        "remove_duplicate_spans": _q_remove_duplicate_spans,
        "minhash_pairs": _q_minhash_pairs,
        "minhash_pairs_ab": _q_minhash_pairs_ab,
        "ngram_jaccard_pairs": _q_ngram_jaccard_pairs,
        "near_dedup_docs": _q_near_dedup_docs,
        "simhash_sigs": _q_simhash_sigs,
        "simhash_pairs": _q_simhash_pairs,
        "embedding_near_dup": _q_embedding_near_dup,
        "embedding_lsh_near_dup": _q_embedding_lsh,
        "media_decode_jpeg": _q_media_decode_jpeg,
        "media_decode_png": _q_media_decode_png,
        "media_decode_tiff": _q_media_decode_tiff,
        "media_decode_gif": _q_media_decode_gif,
        "events_asof_join": _q_events_asof,
        "events_asof_join_chunked": _q_events_asof_chunked,
        "events_range_join": _q_events_range,
        "user_sessions": _q_user_sessions,
        "user_sessions_chunked": _q_user_sessions_chunked,
        "events_rolling": _q_events_rolling,
        "chunk_docs": _q_chunk_docs,
        "ccnet_buckets": _q_ccnet_buckets,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "winnow_pairs": _q_winnow_pairs,
        "embedding_pca": _q_embedding_pca,
        "nb_lang_id": _q_nb_lang_id,
        "domain_hits": _q_domain_hits,
        "domain_triangles": _q_domain_triangles,
        "domain_kcore": _q_domain_kcore,
        "funnel_conversions": _q_funnel,
        "temperature_mix": _q_temperature_mix,
        "char_entropy": _q_char_entropy,
        "lexical_diversity": _q_lexical_diversity,
        "sample_exact_n": _q_sample_exact_n,
        "length_pct_rank": _q_pct_rank,
        "profile_documents": _q_profile_documents,
        "length_outliers": _q_length_outliers,
        "fk_coverage": _q_fk_coverage,
        "jl_project": _q_jl_project,
        "lineitem_pricing": _q_lineitem_pricing,
        "late_ship_priority": _q_late_ship_priority,
        "revenue_by_nation": _q_revenue_by_nation,
        "orders_by_month": _q_orders_by_month,
        "top_parts_by_revenue": _q_top_parts,
        "latest_events": _q_latest_events,
        "user_timelines": _q_user_timelines,
        "ac_scan": _q_ac_scan,
        "ann_topk": _q_ann_topk,
        "ivf_topk": _q_ivf_topk,
        "kmeans_clusters": _q_kmeans_clusters,
        "semdedup_docs": _q_semdedup,
        "stratified_sample": _q_stratified_sample,
        "quality_scores": _q_quality_scores,
        "lm_perplexity": _q_lm_perplexity,
        "bpe_merges": _q_bpe_merges,
        "bpe_token_counts": _q_bpe_token_counts,
        "shuffle_shards": _q_shuffle_shards,
        "group_cap_docs": _q_group_cap,
        "token_budget_docs": _q_token_budget,
        "pack_sequences": _q_pack_sequences,
        "length_moments": _q_length_moments,
        "hll_distinct_tokens": _q_hll_tokens,
        "length_quantiles": _q_length_quantiles,
        "extract_html_text": _q_extract_html,
        "normalize_docs": _q_normalize_docs,
        "ngram_topk": _q_ngram_topk,
        "tfidf_topk": _q_tfidf_topk,
        "hash_embed": _q_hash_embed,
        "token_pmi": _q_token_pmi,
        "source_kl": _q_source_kl,
        "cdc_chunks": _q_cdc_chunks,
        "curate_docs": _q_curate_docs,
        "text_stats": _q_text_stats,
        "doc_repetition": _q_doc_repetition,
        "decontaminate_docs": _q_decontaminate,
        "bloom_decontaminate": _q_bloom_decontaminate,
        "line_dedup_docs": _q_line_dedup,
        "redact_pii": _q_redact_pii,
        "parse_urls": _q_parse_urls,
        "domain_doc_stats": _q_domain_stats,
        "extract_links": _q_extract_links,
        "domain_pagerank": _q_domain_pagerank,
        "dsir_weights": _q_dsir_weights,
        "dsir_select": _q_dsir_select,
        "incremental_dedup_docs": _q_incremental_dedup,
        "inverted_index": _q_inverted_index,
        "bm25_topk": _q_bm25_topk,
        "warc_extract_pages": _q_warc_extract,
        "url_dedup_docs": _q_url_dedup,
        "doc_lang_counts": _q_doc_lang_counts,
        "events_hourly": _q_events_hourly,
        "label_accuracy": _q_label_accuracy,
        "train_em": _q_train_em,
        "tf_build": _q_tf_build,
        "adjacent_tokens": _q_adjacent_tokens,
        "media_features": _q_media_features,
        "media_decode": _q_media_decode,
        "image_dhash": _q_image_dhash,
        "image_near_dup": _q_image_near_dup,
        "media_resize": _q_media_resize,
        "video_frames": _q_video_frames,
        "audio_power": _q_audio_power,
        "audio_resample": _q_audio_resample,
    }


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    from uk_address_matcher_ray import oracle, oracle_scoring, oracle_extras, oracle_train
    from uk_address_matcher_ray.pipelines import curate
    from uk_address_matcher_ray.stages import (
        bloom,
        bm25,
        bpe,
        dsir,
        graph,
        hll,
        snapshot,
    )
    from uk_address_matcher_ray.stages import index as index_mod
    from uk_address_matcher_ray.stages import (
        acscan,
        chunking,
        html,
        lm,
        nblang,
        pca,
        winnow,
        cdc,
        funnel,
        hashembed,
        integrity,
        kl,
        moments,
        pmi,
        ngram_topk,
        normalize,
        olap,
        packing,
        profile,
        quantiles,
        sampling,
        sessions,
        shards,
        textstats,
        tfidf,
    )

    union_input = _union_input_sql()
    pairs_sql = _pairs_oracle_sql()
    out = {
        "clean_features": oracle.cleaned_features_sql(union_input),
        "token_tf": oracle.token_tf_table_sql(union_input),
        "numeric_tf": oracle.numeric_tf_table_sql(union_input),
        "predict_pairs": pairs_sql,
        "waterfall": oracle_scoring.waterfall_sql(
            oracle.cleaned_features_sql(union_input),
            oracle.numeric_tf_table_sql(union_input),
            """
WITH sel0 AS (
    SELECT k, row_number() OVER (ORDER BY k) AS rn
    FROM (SELECT DISTINCT c_custkey AS k FROM customer
          WHERE c_custkey % 3 <> 0 ORDER BY k LIMIT 3)
)
SELECT 'c' || k || '|m' || k AS pair_id,
       'c' || k AS uid_l, 'm' || k AS uid_r FROM sel0
UNION ALL
SELECT 'c' || a.k || '|m' || b.k, 'c' || a.k, 'm' || b.k
FROM sel0 a, sel0 b WHERE a.rn = 1 AND b.rn = 2
""",
        ),
        "match_clusters": oracle_scoring.clusters_sql(
            pairs_sql, threshold=CLUSTER_THRESHOLD
        ),
        "best_matches": oracle_extras.best_matches_sql(pairs_sql),
        "best_matches_summary": oracle_extras.best_matches_summary_sql(pairs_sql),
        "extract_pages": oracle_extras.extract_pages_sql(),
        "exact_dedup_docs": oracle_extras.exact_dedup_sql(_DOCS_VARIANTS_SQL),
        "minhash_pairs": oracle_extras.minhash_pairs_sql(
            _DOCS_VARIANTS_SQL, **MINHASH
        ),
        "ngram_jaccard_pairs": oracle_extras.ngram_jaccard_sql(
            _DOCS_VARIANTS_SQL, **NGRAM
        ),
        "minhash_pairs_ab": oracle_extras.minhash_pairs_ab_sql(
            f"SELECT doc_id, substr(text, 1, {DOC_TRUNC}) AS text FROM documents",
            f"SELECT doc_id, substr(substr(text, 1, {DOC_TRUNC}), 1, 300) AS text "
            "FROM documents WHERE doc_id % 3 = 0",
            **MINHASH,
        ),
        "near_dedup_docs": oracle_extras.near_dedup_sql(
            _DOCS_VARIANTS_SQL,
            oracle_extras.ngram_jaccard_sql(_DOCS_VARIANTS_SQL, **NGRAM),
        ),
        "embedding_near_dup": oracle_extras.embedding_near_dup_sql(NEAR_DUP_COS),
        "embedding_lsh_near_dup": oracle_extras.embedding_lsh_sql(threshold=0.9),
        "ann_topk": oracle_extras.ann_topk_sql(k=ANN_K),
        "ivf_topk": oracle_extras.ivf_topk_sql(k=ANN_K),
        "kmeans_clusters": oracle_extras.kmeans_clusters_sql(),
        "semdedup_docs": oracle_extras.semdedup_sql(threshold=NEAR_DUP_COS),
        "stratified_sample": sampling.stratified_sample_sql(MIX_RATES),
        "quality_scores": oracle_extras.quality_classifier_sql(),
        "lm_perplexity": lm.lm_perplexity_sql(),
        "bpe_merges": bpe.bpe_merges_sql(8),
        "bpe_token_counts": bpe.bpe_token_counts_sql(8),
        "shuffle_shards": shards.shuffle_shards_sql(16, seed=0),
        "group_cap_docs": sampling.group_cap_sql(20),
        "token_budget_docs": sampling.token_budget_cap_sql(
            2000, tokens_expr=_TOKENS_LEN_SQL
        ),
        "pack_sequences": packing.pack_sequences_sql(
            PACK_CAPACITY, tokens_expr=_TOKENS_LEN_SQL
        ),
        "length_moments": moments.grouped_moments_sql(
            "length(coalesce(text, ''))", "lang"
        ),
        "hll_distinct_tokens": hll.hll_distinct_tokens_sql(),
        "length_quantiles": quantiles.grouped_quantiles_sql(
            _QUANTILE_QS, "n_chars", "lang"
        ),
        "extract_html_text": html.extract_text_sql(
            _HTML_SYNTH_SQL, "documents"
        ),
        "normalize_docs": normalize.normalize_text_sql(
            _MESSY_SYNTH_SQL, "documents"
        ),
        "ngram_topk": ngram_topk.ngram_topk_sql(5, n=2),
        "tfidf_topk": tfidf.tfidf_topk_sql(k=5),
        "hash_embed": hashembed.hash_embed_sql(dim=16),
        "token_pmi": pmi.token_pmi_sql(window=2, min_count=5, min_pair=2),
        "source_kl": kl.source_kl_sql(min_count=5),
        "cdc_chunks": cdc.cdc_chunks_sql(k=4, divisor=8),
        "curate_docs": curate.curate_docs_sql(oracle_extras.text_stats_sql()),
        "text_stats": oracle_extras.text_stats_sql(),
        "doc_repetition": oracle_extras.repetition_sql(),
        "decontaminate_docs": DECONTAMINATE_SQL,
        "bloom_decontaminate": bloom.bloom_decontaminate_sql(
            _BLOOM_PRED, **_BLOOM_KW
        ),
        "line_dedup_docs": _LINE_DEDUP_SQL,
        "redact_pii": _redact_pii_sql(),
        "parse_urls": _parse_urls_sql(),
        "domain_doc_stats": _domain_stats_sql(),
        "extract_links": graph.extract_links_sql(
            _LINKED_HTML_SQL, "documents"
        ),
        "domain_pagerank": _domain_pagerank_sql(),
        "dsir_weights": dsir.dsir_weights_sql(_DSIR_RAW_SQL, _DSIR_TGT_SQL),
        "dsir_select": dsir.dsir_select_sql(
            _DSIR_RAW_SQL, _DSIR_TGT_SQL, _DSIR_N
        ),
        "incremental_dedup_docs": snapshot.incremental_dedup_sql(
            _DOCS_VARIANTS_SQL,
            f"SELECT doc_id, substr(text, 1, {DOC_TRUNC}) AS text "
            "FROM documents WHERE doc_id % 2 = 0",
        ),
        "inverted_index": index_mod.inverted_index_sql(
            "SELECT unique_id, address_concat AS text "
            f"FROM ({_union_input_sql()})",
            id_col="unique_id",
            min_df=_INDEX_MIN_DF,
            max_df=_INDEX_MAX_DF,
        ),
        "warc_extract_pages": _warc_extract_sql(),
        "bm25_topk": bm25.bm25_topk_sql(
            "SELECT unique_id, address_concat AS text "
            f"FROM ({_union_input_sql()})",
            _BM25_QUERIES,
            _BM25_K,
            id_col="unique_id",
        ),
        "url_dedup_docs": _url_dedup_sql(),
        "doc_lang_counts": "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
        "events_hourly": oracle_extras.events_hourly_sql(),
        "label_accuracy": oracle_extras.label_accuracy_sql(pairs_sql),
        "improve_pairs": oracle_extras.improve_pairs_sql(
            pairs_sql, oracle.cleaned_features_sql(_union_input_sql())
        ),
        "match_one": (
            "SELECT * FROM ("
            + oracle_extras.improve_pairs_sql(
                pairs_sql, oracle.cleaned_features_sql(_union_input_sql())
            )
            + ") WHERE unique_id_r = 'm' || CAST((SELECT min(c_custkey) "
            "FROM customer WHERE c_custkey % 3 <> 0) AS VARCHAR)"
        ),
        "tune_rewards": oracle_extras.tune_rewards_sql(
            oracle_extras.improve_pairs_sql(
                pairs_sql, oracle.cleaned_features_sql(_union_input_sql())
            )
        ),
        "train_em": oracle_train.em_sql(
            oracle.cleaned_features_sql(_union_input_sql()), iterations=2
        ),
        "simhash_sigs": oracle_extras.simhash_sigs_sql(
            "SELECT doc_id, text FROM documents"
        ),
        "simhash_pairs": oracle_extras.simhash_pairs_sql(
            _DOCS_VARIANTS_SQL, max_hamming=3
        ),
        "tf_build": _tf_build_oracle_sql(),
        "media_features": oracle_extras.media_features_sql(dim=16),
        "media_decode": oracle_extras.media_decode_sql(),
        "image_dhash": oracle_extras.image_dhash_sql(),
        "image_near_dup": oracle_extras.image_near_dup_sql(max_hamming=3),
        "media_resize": oracle_extras.media_resize_sql(),
        "video_frames": VIDEO_FRAMES_SQL,
        "audio_power": AUDIO_POWER_SQL,
        "audio_resample": oracle_extras.audio_resample_sql(
            out_rate=5000, in_rate=8000
        ),
        "media_decode_jpeg": oracle_extras.media_decode_jpeg_sql(),
        # PNG is lossless: decoded pixels == the synthesis formula, so the
        # oracle is the same pixel-formula aggregation as media_decode
        "media_decode_png": oracle_extras.media_decode_sql(),
        "media_decode_tiff": oracle_extras.media_decode_sql(),
        "media_decode_gif": oracle_extras.media_decode_sql(),
        "events_asof_join": _EVENTS_ASOF_SQL,
        "events_asof_join_chunked": _EVENTS_ASOF_SQL,
        "events_range_join": _EVENTS_RANGE_SQL,
        "user_sessions": _USER_SESSIONS_SQL,
        "user_sessions_chunked": _USER_SESSIONS_SQL,
        "events_rolling": f"""
SELECT event_id, user_id, ts,
       count(*) OVER w AS roll_n,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS BIGINT)
           AS roll_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN to_microseconds({ROLL_WINDOW_US}) PRECEDING
             AND CURRENT ROW)
""",
        "chunk_docs": chunking.chunk_documents_sql(CHUNK_W, CHUNK_S),
        "ccnet_buckets": lm.ccnet_buckets_sql(),
        "winnow_fingerprints": winnow.winnow_fingerprints_sql(),
        "winnow_pairs": winnow.winnow_pairs_sql(),
        "embedding_pca": pca.embedding_pca_sql(),
        "nb_lang_id": nblang.nb_lang_sql(),
        "domain_hits": _domain_hits_sql(),
        "domain_triangles": _domain_triangles_sql(),
        "domain_kcore": _domain_kcore_sql(),
        "funnel_conversions": funnel.funnel_sql(
            ["view", "click", "purchase"]
        ),
        "temperature_mix": sampling.temperature_mix_sql(total=200),
        "char_entropy": textstats.char_entropy_sql(),
        "lexical_diversity": textstats.lexical_diversity_sql(),
        "sample_exact_n": sampling.sample_exact_n_sql(100),
        "length_pct_rank": quantiles.group_percent_rank_sql(
            "n_chars", "source"
        ),
        "profile_documents": profile.profile_columns_sql(
            ["doc_id", "text", "lang", "source", "n_chars"]
        ),
        "length_outliers": moments.grouped_outliers_sql(
            "n_chars", "source", z=1
        ),
        "fk_coverage": integrity.fk_coverage_sql(
            "lineitem", "part", "l_partkey", "p_partkey"
        ),
        "latest_events": sessions.latest_events_sql(),
        "user_timelines": sessions.user_timelines_sql(),
        "ac_scan": acscan.ac_scan_sql(_AC_PHRASES),
        "jl_project": pca.jl_project_sql(k=8, dim=64),
        "lineitem_pricing": olap.lineitem_pricing_sql(),
        "late_ship_priority": olap.late_ship_priority_counts_sql(),
        "revenue_by_nation": olap.revenue_by_nation_sql(),
        "orders_by_month": olap.orders_by_month_sql(),
        "top_parts_by_revenue": olap.top_parts_by_revenue_sql(k=10),
        "duplicate_spans": DUPLICATE_SPANS_SQL,
        "remove_duplicate_spans": REMOVE_DUPLICATE_SPANS_SQL,
        "adjacent_tokens": oracle_extras.adjacent_tokens_sql(
            f"SELECT unique_id, address_concat FROM ({_union_input_sql()})"
        ),
    }
    return out
