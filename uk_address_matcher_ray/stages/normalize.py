"""Text normalization — the ftfy-lite pass every crawl pipeline runs.

Raw web text arrives with mixed newline conventions, stray control
bytes, decomposed Unicode (e + combining acute instead of é) and
whitespace noise; every downstream op in this engine (tokenizers,
hashes, n-gram dedup, TF tables) is byte-sensitive, so corpora are
normalized FIRST or identical text dedups as different.  Fixed, ordered
kernel chain — each step an RE2-safe pattern or a library call with a
DuckDB twin, so the oracle runs the IDENTICAL sequence:

1. Unicode NFC (``unicodedata.normalize("NFC")`` ≡ DuckDB
   ``nfc_normalize`` — both UAX#15; the corpus-facing subset of Latin
   diacritics agrees between CPython's unicodedata and utf8proc),
2. ``\\r\\n`` / ``\\r`` -> ``\\n``,
3. strip control chars except tab/newline
   (``[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]``),
4. collapse ``[ \\t]+`` to one space,
5. drop the (single, post-collapse) space adjacent to a newline,
6. collapse 3+ newlines to exactly 2 (paragraph break),
7. trim.

Output carries ``changed`` (did normalization touch the doc — the
pipeline metric crawl reports track) and the normalized ``n_chars``.

Scale shape: pure row-local ``map_batches``, zero shuffles; regexes
compiled once per process at import.  The reference engine has no
Unicode surface (its cleaning is address-specific uppercase/punct); this
is LLM-pipeline surface (brief: web-text ingestion).
"""

from __future__ import annotations

import re
import unicodedata
from typing import Optional

import pyarrow as pa

_CRLF_RE = re.compile(r"\r\n?")
_CTRL_RE = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")
_SPACE_RE = re.compile(r"[ \t]+")
_NL_SPACE_RE = re.compile(r" ?\n ?")
_MULTI_NL_RE = re.compile(r"\n{3,}")


def normalize_text_row(text: Optional[str]) -> str:
    s = text or ""
    s = unicodedata.normalize("NFC", s)
    s = _CRLF_RE.sub("\n", s)
    s = _CTRL_RE.sub("", s)
    s = _SPACE_RE.sub(" ", s)
    s = _NL_SPACE_RE.sub("\n", s)
    s = _MULTI_NL_RE.sub("\n\n", s)
    return s.strip()


def normalize_text(ds, id_col: str = "doc_id", text_col: str = "text"):
    """-> Dataset(id, text, changed, n_chars) — one zero-shuffle pass."""

    def kernel(batch: pa.Table) -> pa.Table:
        raw = batch.column(text_col).to_pylist()
        out = [normalize_text_row(t) for t in raw]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "text": pa.array(out, pa.string()),
                "changed": pa.array(
                    [o != (r or "") for o, r in zip(out, raw)]
                ),
                "n_chars": pa.array([len(o) for o in out], pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow"
    )


def normalize_text_sql(
    text_expr: str, source: str, id_col: str = "doc_id"
) -> str:
    """DuckDB mirror: identical steps in identical order.

    Note DuckDB ``length()`` counts codepoints, same as Python ``len``.
    """
    s = f"nfc_normalize(coalesce({text_expr}, ''))"
    s = f"regexp_replace({s}, '\\r\\n?', chr(10), 'g')"
    s = (
        f"regexp_replace({s},"
        " '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g')"
    )
    s = f"regexp_replace({s}, '[ \\t]+', ' ', 'g')"
    s = f"regexp_replace({s}, ' ?\\n ?', chr(10), 'g')"
    s = f"regexp_replace({s}, '\\n{{3,}}', chr(10) || chr(10), 'g')"
    s = f"trim({s}, ' ' || chr(9) || chr(10))"
    return f"""
WITH fin AS (
  SELECT {id_col}, {text_expr} AS raw, {s} AS text FROM {source}
)
SELECT {id_col}, text,
       (text <> coalesce(raw, '')) AS changed,
       CAST(length(text) AS BIGINT) AS n_chars
FROM fin
"""
