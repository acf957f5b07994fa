"""Deterministic Common-Crawl-style web-page synthesis + extraction oracle.

Input contract (BASELINE.json input_hint / FIXTURES.md F1):
(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string).

``render_html`` defines the page format; ``extract_text`` inverts it
byte-identically (asserted in tests/test_extract.py — the per-row invariant
required by the north rule). ``warc_ts`` derives from the row index, never
wall clock, so synthesis is fully deterministic.
"""

from __future__ import annotations

import datetime
import html as html_mod
import re
from typing import List, Optional, Sequence, Tuple

import pyarrow as pa

from uk_address_matcher_ray import schema as sch

_EPOCH = datetime.datetime(2024, 1, 1, 0, 0, 0)

_BR = re.compile(r"<br\s*/?>", re.ASCII)
_TAG = re.compile(r"<[^>]+>", re.ASCII)
_MAIN = re.compile(r"<main>(.*?)</main>", re.DOTALL)


def render_html(text: str, title: str = "page") -> bytes:
    """Canonical page wrapper embedding ``text`` (newlines -> <br/>)."""
    body = html_mod.escape(text, quote=False).replace("\n", "<br/>")
    page = (
        "<html><head><title>"
        + html_mod.escape(title, quote=False)
        + '</title><meta charset="utf-8"/></head><body><nav>home | about</nav>'
        + "<main>"
        + body
        + "</main><footer>© example</footer></body></html>"
    )
    return page.encode("utf-8")


def extract_text(html_bytes: Optional[bytes]) -> Optional[str]:
    """Inverse of render_html: byte-identical text recovery per url."""
    if html_bytes is None:
        return None
    page = html_bytes.decode("utf-8")
    m = _MAIN.search(page)
    if not m:
        return None
    body = _BR.sub("\n", m.group(1))
    body = _TAG.sub("", body)
    return html_mod.unescape(body)


def synth_web_pages(
    address_rows: Sequence[Tuple[str, str, str]],
    host_of=None,
) -> pa.Table:
    """(unique_id, address_concat, postcode) rows -> web-page table.

    text = f"{address_concat}\\n{postcode}" (FIXTURES.md F1 recipe);
    url = https://{host}/{unique_id}. ``host_of(i, uid)`` lets tests create
    hot-hostname skew; defaults to host{i % 97}.
    """
    urls: List[str] = []
    ts: List[datetime.datetime] = []
    htmls: List[bytes] = []
    texts: List[str] = []
    for i, (uid, addr, pc) in enumerate(address_rows):
        host = host_of(i, uid) if host_of else f"host{i % 97}.example"
        url = f"https://{host}/{uid}"
        text = f"{addr or ''}\n{pc or ''}"
        urls.append(url)
        ts.append(_EPOCH + datetime.timedelta(seconds=i))
        htmls.append(render_html(text, title=uid))
        texts.append(text)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
        }
    )


def extract_text_vec(html_col):
    """Vectorized ``extract_text`` over a binary column -> (string array —
    null where html is null or has no <main> block, numpy bool mask of rows
    whose entity unescape needs the Python fallback).

    The RE2 chain mirrors the scalar regexes exactly; HTML5 entity
    unescape is vectorized for the escape set ``render_html`` can emit
    (&lt; &gt; &quot; &#39; &apos; then &amp; LAST — single-pass order, so
    '&amp;lt;' -> '&lt;' like html.unescape). Rows whose '&' count differs
    from their known-entity count (exotic or semicolon-less entities) are
    flagged for the scalar path."""
    import numpy as np
    import pyarrow.compute as pcmp

    s = html_col.cast(pa.string())  # utf-8 validation == .decode("utf-8")
    body = pcmp.struct_field(
        pcmp.extract_regex(s, r"(?s)<main>(?P<b>.*?)</main>"), "b"
    )
    body = pcmp.replace_substring_regex(
        body, pattern=r"<br\s*/?>", replacement="\n"
    )
    body = pcmp.replace_substring_regex(body, pattern=r"<[^>]+>", replacement="")
    total_amp = pcmp.count_substring(body, "&")
    known = pcmp.count_substring_regex(
        body, r"&(amp|lt|gt|quot|apos|#39);"
    )
    need_py = (
        pcmp.fill_null(pcmp.not_equal(total_amp, known), False)
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    )
    for pat, rep in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&apos;", "'"),
        ("&amp;", "&"),  # LAST: single-pass semantics
    ):
        body = pcmp.replace_substring(body, pattern=pat, replacement=rep)
    if isinstance(body, pa.ChunkedArray):
        body = body.combine_chunks()
    return body, need_py
