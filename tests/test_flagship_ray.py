"""End-to-end flagship pipeline through Ray Data: synth web pages ->
extraction (byte-identical invariant) -> clean -> block/score -> rescore ->
cluster -> pairwise F1 vs truth clusters (BASELINE.json metric ≥ 0.99)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from uk_address_matcher_ray.pipelines.evaluate import pairwise_f1
from uk_address_matcher_ray.pipelines.match import flagship_pipeline
from uk_address_matcher_ray.sources import synth
from uk_address_matcher_ray.sources.webpages import extract_text, synth_web_pages

KEYS = list(range(1, 150))


def _pages():
    canon = synth.canonical_table(KEYS).to_pylist()
    messy = synth.messy_table(KEYS).to_pylist()
    pages_c = synth_web_pages(
        [(r["unique_id"], r["address_concat"], r["postcode"]) for r in canon]
    )
    pages_m = synth_web_pages(
        [(r["unique_id"], r["address_concat"], r["postcode"]) for r in messy]
    )
    return pages_m, pages_c


def test_render_extract_roundtrip():
    pages_m, _ = _pages()
    for r in pages_m.to_pylist():
        assert extract_text(r["html"]) == r["text"], r["url"]


@pytest.mark.usefixtures("ray_session")
def test_flagship_end_to_end():
    import ray

    pages_m, pages_c = _pages()
    pairs, labels = flagship_pipeline(
        ray.data.from_arrow(pages_m),
        ray.data.from_arrow(pages_c),
        cluster_threshold=5.0,
        salt_threshold=10_000,
    )
    pair_rows = pairs.take_all()
    assert len(pair_rows) > 0

    # node ids in the cluster stage are url-based (unique_id = url); recover k
    def node_key(node: str) -> str:
        # node like 'c_https://hostX.example/c5' or 'm_https://hostX.example/m5'
        return node.split("/")[-1]

    predicted = {}
    for r in labels.take_all():
        predicted[node_key(r["node"])] = r["label"]

    truth = {}
    for k in KEYS:
        truth[f"c{k}"] = f"t{k}"
        if k % 3 != 0:
            truth[f"m{k}"] = f"t{k}"
    # singletons: nodes with no edges keep themselves as label
    for n in truth:
        predicted.setdefault(n, n)

    precision, recall, f1 = pairwise_f1(predicted, truth)
    assert f1 >= 0.99, (precision, recall, f1)


@pytest.mark.usefixtures("ray_session")
def test_flagship_deterministic():
    import ray

    pages_m, pages_c = _pages()
    outs = []
    for _ in range(2):
        pairs, _labels = flagship_pipeline(
            ray.data.from_arrow(pages_m),
            ray.data.from_arrow(pages_c),
            cluster_threshold=5.0,
        )
        rows = sorted(
            (r["unique_id_r"], r["unique_id_l"], r["match_weight"])
            for r in pairs.take_all()
        )
        outs.append(rows)
    assert outs[0] == outs[1]
