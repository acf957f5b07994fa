"""HTML -> text extraction with link-density boilerplate signals.

The first transform every web-text pipeline runs: raw crawl HTML ->
visible text (C4 used heuristics over extracted text; CCNet/RefinedWeb
lean on trafilatura-class extractors whose core is exactly this: kill
script/style, break on block tags, strip tags, decode entities,
normalize whitespace) plus the link-density statistics boilerplate
classifiers key on (Kohlschütter et al., boilerpipe).

Everything is regex/string kernels chosen to be RE2-safe so the DuckDB
oracle runs the IDENTICAL patterns (no backreferences, no lookarounds;
``(?is)`` inline flags only), in the IDENTICAL order:

1. drop ``<script>``/``<style>`` elements (two non-greedy dotall
   regexes — content may contain ``<`` / quotes; a backreference-free
   pattern per tag),
2. anchor stats BEFORE stripping: ``n_links`` = count of ``<a>``
   elements, ``link_chars`` = total visible-char count of their inner
   text (tags stripped, entities decoded, whitespace collapsed+trimmed
   — the same normalization the body gets),
3. block-level tags (``<br>``, ``</p>``, ``</div>``, ``</li>``,
   ``</h1..6>``, ``</tr>``) -> newline, so block structure survives as
   line structure,
4. strip every remaining tag,
5. decode the fixed entity set ``&lt; &gt; &quot; &#39; &nbsp; &amp;``
   (``&amp;`` last, standard single-pass order),
6. collapse ``[ \\t\\r]+`` to one space, trim each line, drop empty
   lines, join with ``\\n``.

``link_density = link_chars / max(text_chars, 1)`` — the boilerplate
cut ("drop blocks/docs that are mostly links").

Scale shape: pure row-local ``map_batches`` — zero shuffles, scales as
map parallelism.  Python ``re`` compiles once at module import; the
per-batch cost is C regex over the Arrow-decoded strings.  The
reference engine has no HTML surface; this is LLM-pipeline surface
(brief: web-text ingestion).
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import pyarrow as pa

_SCRIPT_RE = re.compile(r"(?is)<script\b[^>]*>.*?</script>")
_STYLE_RE = re.compile(r"(?is)<style\b[^>]*>.*?</style>")
_ANCHOR_RE = re.compile(r"(?is)<a\b[^>]*>(.*?)</a>")
_BLOCK_RE = re.compile(r"(?i)<(?:br|/p|/div|/li|/h[1-6]|/tr)\b[^>]*>")
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"[ \t\r]+")

# (entity, replacement) in decode order — &amp; last (single-pass standard)
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def _decode_entities(s: str) -> str:
    for ent, rep in ENTITIES:
        s = s.replace(ent, rep)
    return s


def _normalize(s: str) -> str:
    """Steps 4-6 over tag-free-after-strip text: strip tags, decode
    entities, collapse spaces, trim lines, drop empties."""
    s = _TAG_RE.sub("", s)
    s = _decode_entities(s)
    s = _WS_RE.sub(" ", s)
    lines = [ln.strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def extract_text_row(html: Optional[str]) -> Tuple[str, int, int, float]:
    """-> (text, n_links, link_chars, link_density) for one document."""
    s = html or ""
    s = _SCRIPT_RE.sub("", s)
    s = _STYLE_RE.sub("", s)
    anchors = _ANCHOR_RE.findall(s)
    link_chars = sum(len(_normalize(a)) for a in anchors)
    s = _BLOCK_RE.sub("\n", s)
    text = _normalize(s)
    density = round(link_chars / max(len(text), 1), 6)
    return text, len(anchors), link_chars, density


def extract_text(ds, id_col: str = "doc_id", html_col: str = "html"):
    """-> Dataset(id, text, n_links, link_chars, link_density) — one
    zero-shuffle row-local pass."""

    def kernel(batch: pa.Table) -> pa.Table:
        texts, n_links, link_chars, dens = [], [], [], []
        for h in batch.column(html_col).to_pylist():
            t, nl, lc, d = extract_text_row(h)
            texts.append(t)
            n_links.append(nl)
            link_chars.append(lc)
            dens.append(d)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "text": pa.array(texts, pa.string()),
                "n_links": pa.array(n_links, pa.int64()),
                "link_chars": pa.array(link_chars, pa.int64()),
                "link_density": pa.array(dens, pa.float64()),
            }
        )

    return ds.select_columns([id_col, html_col]).map_batches(
        kernel, batch_format="pyarrow"
    )


def extract_text_sql(html_expr: str, source: str, id_col: str = "doc_id") -> str:
    """DuckDB mirror: identical RE2 patterns in identical order.

    ``html_expr``: SQL expression producing the HTML string;
    ``source``: FROM clause body providing ``id_col`` and the expression's
    inputs."""
    ent = "s"
    for e, r in ENTITIES:
        rq = r.replace("'", "''")
        ent = f"replace({ent}, '{e}', '{rq}')"
    norm = (
        "array_to_string(list_filter(list_transform("
        "string_split({x}, chr(10)), ln -> trim(ln)), ln -> ln <> ''), chr(10))"
    )

    def normalize(x: str) -> str:
        stripped = f"regexp_replace({x}, '<[^>]*>', '', 'g')"
        decoded = ent.replace("s", stripped, 1)
        collapsed = (
            f"regexp_replace({decoded}, '[ \\t\\r]+', ' ', 'g')"
        )
        return norm.replace("{x}", collapsed)

    return f"""
WITH raw AS (SELECT {id_col}, {html_expr} AS h FROM {source}),
noscript AS (
  SELECT {id_col},
         regexp_replace(
             regexp_replace(h, '(?is)<script\\b[^>]*>.*?</script>', '', 'g'),
             '(?is)<style\\b[^>]*>.*?</style>', '', 'g') AS h
  FROM raw
),
anch AS (
  SELECT {id_col},
         regexp_extract_all(h, '(?is)<a\\b[^>]*>(.*?)</a>', 1) AS a_raw,
         h
  FROM noscript
),
astat AS (
  SELECT {id_col},
         len(a_raw) AS n_links,
         CAST(coalesce(list_sum(list_transform(a_raw,
             s -> length({normalize('s')}))), 0) AS BIGINT) AS link_chars,
         h
  FROM anch
),
body AS (
  SELECT {id_col}, n_links, link_chars,
         regexp_replace(h,
             '(?i)<(?:br|/p|/div|/li|/h[1-6]|/tr)\\b[^>]*>',
             chr(10), 'g') AS h
  FROM astat
),
fin AS (
  SELECT {id_col}, {normalize('h')} AS text, n_links, link_chars
  FROM body
)
SELECT {id_col}, text, n_links, link_chars,
       round(link_chars / greatest(length(text), 1), 6) AS link_density
FROM fin
"""
