"""Text normalization (stages/normalize.py): hand cases + DuckDB mirror
parity over messy synthesized text."""

import duckdb
import pyarrow as pa

from uk_address_matcher_ray.stages.normalize import (
    normalize_text,
    normalize_text_row,
    normalize_text_sql,
)


def test_row_cases():
    # NFC composition: e + combining acute -> é
    assert normalize_text_row("café") == "café"
    # CRLF / CR -> LF; control stripped; spaces collapsed; trim
    assert normalize_text_row("a\r\nb\rc") == "a\nb\nc"
    assert normalize_text_row(" a\x07b\x00c\t\td ") == "abc d"
    # space adjacent to newline dropped; 3+ newlines -> 2
    assert normalize_text_row("a \n b\n\n\n\nc") == "a\nb\n\nc"
    assert normalize_text_row(None) == ""
    assert normalize_text_row("\x0b\x0c") == ""  # vertical tab/FF stripped


def test_matches_duckdb_oracle(ray_session):
    import random

    import ray

    rng = random.Random(9)
    vocab = ["the", "data", "batch", "plain", "words"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 25))))
        for i in range(200)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )

    def mess(batch: pa.Table) -> pa.Table:
        out = [
            (t or "")
            .replace(" the ", " the\u0301 ")  # decomposed e + U+0301
            .replace(" data ", "\r\ndata\r")
            .replace(" batch ", " ba\x07tch   ")
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": pa.array(out, pa.string()),
            }
        )

    ds = ray.data.from_arrow(tbl).repartition(5).map_batches(
        mess, batch_format="pyarrow"
    )
    got = (
        pa.concat_tables(ray.get(normalize_text(ds).to_arrow_refs()))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    synth = (
        "replace(replace(replace(coalesce(text, ''),"
        " ' the ', ' the' || chr(769) || ' '),"
        " ' data ', chr(13) || chr(10) || 'data' || chr(13)),"
        " ' batch ', ' ba' || chr(7) || 'tch   ')"
    )
    ora = (
        con.execute(normalize_text_sql(synth, "documents"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for col in ["text", "changed", "n_chars"]:
        assert got[col].equals(ora[col]), col
    assert got["changed"].any()  # the synth actually dirtied docs
    # NFC really happened: composed é present, no combining mark survives
    joined = "".join(got["text"])
    assert "é" in joined and "́" not in joined
