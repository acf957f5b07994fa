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
        import os

        if os.environ.get("GRAFT_CLEAN_VEC", "1") != "0":
            return self._call_vec(batch)
        return self._call_rows(batch)

    def _call_vec(self, batch: pa.Table) -> pa.Table:
        """Vectorized path: RE2 extraction chain + known-entity unescape
        (sources/webpages.extract_text_vec); rows needing the full HTML5
        entity table fall back to the scalar kernel. Lang filter applies
        BEFORE decode (like the row path, which never touches filtered
        rows' html)."""
        import numpy as np
        import pyarrow.compute as pcmp

        from uk_address_matcher_ray.sources.webpages import extract_text_vec

        n = batch.num_rows
        names = set(batch.column_names)

        def col(name, typ):
            if name not in names:
                return pa.nulls(n, typ)
            c = batch.column(name).cast(typ)
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        lang = col("lang", pa.string())
        if self.lang_filter is not None:
            skip = pcmp.fill_null(
                pcmp.not_equal(lang, self.lang_filter), False
            )
            keep0 = np.flatnonzero(
                ~skip.to_numpy(zero_copy_only=False).astype(bool)
            )
            if len(keep0) < n:
                batch = batch.take(pa.array(keep0, pa.int64()))
                n = batch.num_rows
                lang = col("lang", pa.string())

        html_col = col("html", pa.binary())
        text_col = col("text", pa.string())
        ext, need_py = extract_text_vec(html_col)
        if need_py.any():
            idx = np.flatnonzero(need_py)
            fixed = [
                extract_text(v)
                for v in html_col.take(pa.array(idx, pa.int64())).to_pylist()
            ]
            buf = np.asarray(ext.to_pylist(), dtype=object)
            buf[idx] = fixed
            ext = pa.array(buf, pa.string())
        extracted = pcmp.coalesce(ext, text_col)
        if self.verify_text:
            bad = pcmp.fill_null(
                pcmp.and_(
                    pcmp.is_valid(text_col),
                    pcmp.not_equal(extracted, text_col),
                ),
                False,
            ).to_numpy(zero_copy_only=False)
            if bad.any():
                i = int(np.flatnonzero(bad)[0])
                url = batch.column("url")[i].as_py()
                raise ValueError(
                    f"extraction not byte-identical for url={url!r}"
                )
        keep = np.flatnonzero(
            pcmp.is_valid(extracted).to_numpy(zero_copy_only=False)
        )
        if len(keep) < n:
            batch = batch.take(pa.array(keep, pa.int64()))
            extracted = extracted.take(pa.array(keep, pa.int64()))
            lang = lang.take(pa.array(keep, pa.int64()))
            n = batch.num_rows
        sp = pcmp.split_pattern(extracted, "\n")
        if isinstance(sp, pa.ChunkedArray):
            sp = sp.combine_chunks()
        if sp.offset != 0:
            sp = pa.concat_arrays([sp])
        offs = sp.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = offs[1:] - offs[:-1]
        vals = sp.values
        addr = (
            vals.take(pa.array(offs[:-1], pa.int64()))
            if n
            else pa.array([], pa.string())
        )
        if n:
            has2 = lens > 1
            pos = np.where(has2, offs[:-1] + 1, 0)
            second = vals.take(pa.array(pos, pa.int64()))
            pc_col = pcmp.if_else(
                pa.array(has2), second, pa.scalar(None, pa.string())
            )
            # '' postcode -> None (row path: `pc if pc else None`)
            pc_col = pcmp.if_else(
                pcmp.equal(pc_col, ""), pa.scalar(None, pa.string()), pc_col
            )
        else:
            pc_col = pa.array([], pa.string())
        out = pa.table(
            {
                "unique_id": batch.column("url").cast(pa.string()).combine_chunks(),
                "address_concat": addr,
                "postcode": pc_col,
                "lang": lang,
            }
        )
        extras = [c for c in batch.column_names if c not in self._INPUT_COLS]
        for c in extras:
            out = out.append_column(c, batch.column(c).combine_chunks())
        return out

    def _call_rows(self, batch: pa.Table) -> pa.Table:
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
