"""HTML text extraction (stages/html.py): hand-built cases + DuckDB
regexp-mirror parity over synthesized HTML."""

import duckdb
import pyarrow as pa

from uk_address_matcher_ray.stages.html import (
    extract_text,
    extract_text_row,
    extract_text_sql,
)


def test_extract_row_cases():
    text, n_links, link_chars, dens = extract_text_row(
        '<html><head><script type="x">if (a < 1) { s = "</b>"; }</script>'
        "<style>.c{color:red}</style></head>"
        "<body><h1>Title</h1><p>Hello   &amp; welcome</p>"
        '<div>nav: <a href="/a">Home</a> | <a href="/b">About  us</a></div>'
        "<p>Body text here</p></body></html>"
    )
    assert text == "Title\nHello & welcome\nnav: Home | About us\nBody text here"
    assert n_links == 2
    assert link_chars == len("Home") + len("About us")
    assert dens == round(link_chars / len(text), 6)
    # empty / None
    assert extract_text_row(None) == ("", 0, 0, 0.0)
    assert extract_text_row("<p></p>") == ("", 0, 0, 0.0)


def test_entities_and_nested_tags():
    text, _, _, _ = extract_text_row(
        "<p>&lt;tag&gt; &quot;q&quot; &#39;a&#39;&nbsp;&amp;lt;</p>"
    )
    # &amp; decoded LAST: '&amp;lt;' -> '&lt;' (no double decode)
    assert text == '<tag> "q" \'a\' &lt;'
    text, n, lc, _ = extract_text_row('<a href="x"><b>bold  link</b></a> tail')
    assert text == "bold link tail" and n == 1 and lc == len("bold link")


_SYNTH_SQL = (
    "'<html><head><title>T</title><script>if (x < 1) { y = \"</b>\"; }"
    "</script><style>.c{color:red}</style></head><body><p>' || "
    "replace(replace(replace(coalesce(text, ''), ' the ', '</p>' || chr(10) || '<p>'),"
    " ' data ', ' <a href=\"https://ex.com/a\">click here</a> '),"
    " ' batch ', '<br/>')"
    " || '</p><div>footer <a href=\"/f\">home</a></div></body></html>'"
)


def test_matches_duckdb_oracle(ray_session):
    import random

    import ray

    rng = random.Random(4)
    vocab = ["the", "data", "batch", "alpha", "beta", "x&y", "q<r>"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))))
        for i in range(200)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )

    def add_html(batch: pa.Table) -> pa.Table:
        # self-contained: workers can't import the test module
        def synth(text):
            body = (
                (text or "")
                .replace(" the ", "</p>\n<p>")
                .replace(
                    " data ", ' <a href="https://ex.com/a">click here</a> '
                )
                .replace(" batch ", "<br/>")
            )
            return (
                '<html><head><title>T</title><script>if (x < 1) { y = "</b>"; }'
                "</script><style>.c{color:red}</style></head><body><p>"
                + body
                + '</p><div>footer <a href="/f">home</a></div></body></html>'
            )

        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "html": pa.array(
                    [synth(t) for t in batch.column("text").to_pylist()],
                    pa.string(),
                ),
            }
        )

    ds = ray.data.from_arrow(tbl).repartition(5).map_batches(
        add_html, batch_format="pyarrow"
    )
    got = (
        pa.concat_tables(ray.get(extract_text(ds).to_arrow_refs()))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    ora = (
        con.execute(extract_text_sql(_SYNTH_SQL, "documents"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for col in ["text", "n_links", "link_chars", "link_density"]:
        assert got[col].equals(ora[col]), col
