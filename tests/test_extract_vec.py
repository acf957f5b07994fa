"""ExtractStage vectorized path vs the per-row spec path: adversarial
pages (no <main>, null html, exotic/semicolon-less entities via the scalar
fallback), verify-text on/off, lang filter on/off, extras passthrough —
outputs (or raised mismatch) must be identical."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from uk_address_matcher_ray.sources.webpages import render_html
from uk_address_matcher_ray.stages.extract import ExtractStage


def _mk_batch(n, weird, seed=3):
    rng = random.Random(seed)
    urls, htmls, texts, lang = [], [], [], []
    for i in range(n):
        t = rng.choice(
            ["1 HIGH ST & CO\nZZ1 9AB", "", "x\n", "a\nb\nc",
             "<&>\n&amp;", "&weird;\n&#390;"]
        )
        if weird and i % 7 == 0:
            htmls.append(b"<html>no main</html>")
            texts.append(t if i % 2 else None)
        elif weird and i % 11 == 0:
            htmls.append(None)
            texts.append(t)
        elif weird and i % 13 == 0:
            htmls.append(b"<html><main>&ampamp;x</main></html>")
            texts.append(None)
        else:
            htmls.append(render_html(t, title=f"u{i}"))
            texts.append(t)
        urls.append(f"https://h{i % 5}.example/u{i}")
        lang.append(rng.choice(["en", "fr", None]))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "side": pa.array([i % 2 for i in range(n)], pa.int8()),
        }
    )


@pytest.mark.parametrize("weird", [False, True])
@pytest.mark.parametrize("verify", [True, False])
@pytest.mark.parametrize("lang_filter", ["en", None])
def test_vec_matches_rows(weird, verify, lang_filter):
    batch = _mk_batch(150, weird)
    st = ExtractStage(verify_text=verify, lang_filter=lang_filter)

    def run(fn):
        try:
            return fn(batch).to_pylist()
        except ValueError as e:
            return ("raise", str(e))

    a = run(st._call_rows)
    b = run(st._call_vec)
    assert a == b


def test_verify_mismatch_raises_same_url():
    batch = pa.table(
        {
            "url": pa.array(["https://x/u1"], pa.string()),
            "html": pa.array([render_html("actual text")], pa.binary()),
            "text": pa.array(["claimed text"], pa.string()),
            "lang": pa.array(["en"], pa.string()),
        }
    )
    st = ExtractStage(verify_text=True)
    for fn in (st._call_rows, st._call_vec):
        with pytest.raises(ValueError, match="u1"):
            fn(batch)
