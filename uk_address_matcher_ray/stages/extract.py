"""Web-page -> address-record extraction stage (north-rule stage 1).

A stateless actor-pool ``map_batches`` transform over zero-copy Arrow:
parses each page's html, asserts byte-identical text recovery against the
``text`` column when present (the per-row invariant from BASELINE.json
input_hint), and derives the reference's raw address contract
(unique_id=url, address_concat=line 1, postcode=line 2; FIXTURES.md F1/F2).
"""

from __future__ import annotations

import pyarrow as pa

from uk_address_matcher_ray.sources.webpages import extract_text

EXTRACTED_SCHEMA = pa.schema(
    [
        pa.field("unique_id", pa.string()),
        pa.field("address_concat", pa.string()),
        pa.field("postcode", pa.string()),
        pa.field("lang", pa.string()),
    ]
)


class ExtractStage:
    """Callable class for ``map_batches`` (regexes compiled at import; no
    per-batch setup). ``verify_text=True`` enforces the byte-identical
    invariant against the shipped ``text`` column."""

    def __init__(self, verify_text: bool = True, lang_filter: str | None = "en"):
        self.verify_text = verify_text
        self.lang_filter = lang_filter

    _INPUT_COLS = frozenset({"url", "html", "text", "lang"})

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        texts = (
            batch.column("text").to_pylist()
            if "text" in batch.column_names
            else [None] * len(urls)
        )
        langs = (
            batch.column("lang").to_pylist()
            if "lang" in batch.column_names
            else [None] * len(urls)
        )
        out_uid, out_addr, out_pc, out_lang = [], [], [], []
        keep_idx: list = []
        for i, (url, html, text, lang) in enumerate(zip(urls, htmls, texts, langs)):
            if self.lang_filter is not None and lang is not None and lang != self.lang_filter:
                continue
            extracted = extract_text(html)
            if extracted is None:
                extracted = text
            if self.verify_text and text is not None and extracted != text:
                raise ValueError(
                    f"extraction not byte-identical for url={url!r}"
                )
            if extracted is None:
                continue
            lines = extracted.split("\n")
            addr = lines[0] if lines else None
            pc = lines[1] if len(lines) > 1 else None
            out_uid.append(url)
            out_addr.append(addr)
            out_pc.append(pc if pc else None)
            out_lang.append(lang)
            keep_idx.append(i)
        out = pa.table(
            {
                "unique_id": pa.array(out_uid, pa.string()),
                "address_concat": pa.array(out_addr, pa.string()),
                "postcode": pa.array(out_pc, pa.string()),
                "lang": pa.array(out_lang, pa.string()),
            }
        )
        # pass through any extra input columns (e.g. a side tag) aligned to
        # the kept rows, so tagged-union pipelines survive extraction
        extras = [c for c in batch.column_names if c not in self._INPUT_COLS]
        if extras:
            taken = batch.select(extras).take(pa.array(keep_idx, pa.int64()))
            for c in extras:
                out = out.append_column(c, taken.column(c).combine_chunks())
        return out


def extract_addresses(pages_ds, *, verify_text: bool = True, concurrency=None, batch_size: int = 2048):
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return pages_ds.map_batches(
        ExtractStage(verify_text=verify_text), **kwargs
    )
