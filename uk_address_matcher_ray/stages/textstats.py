"""Text-analysis operators over a documents table (driver brief):
language-ID (stopword heuristic), quality scoring, token counting,
document fingerprinting (rolling hash). All are single map_batches passes;
each has an exact DuckDB SQL mirror for the driver oracle (textstats_sql).
"""

from __future__ import annotations

import re
from typing import List, Optional

import pyarrow as pa

from uk_address_matcher_ray.functions import hashing as H

_WS = re.compile(r"\s+", re.ASCII)  # RE2/DuckDB \s is ASCII
_ALPHA = re.compile(r"[A-Za-z]")
_PUNCT = re.compile(r"[^\w\s]", re.ASCII)

# tiny deterministic stopword lists (top function words)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "pour", "que", "une"],
    "es": ["el", "la", "los", "de", "y", "que", "en", "es", "por", "una"],
}
_LANGS = sorted(STOPWORDS)


def tokens_of(text: Optional[str]) -> List[str]:
    if text is None:
        return []
    return [t for t in _WS.split(text.strip()) if t]


def token_count(text: Optional[str]) -> int:
    return len(tokens_of(text))


def char_stats(text: Optional[str]) -> tuple:
    """(n_chars, alpha_ratio, punct_ratio, mean_token_len) — exact IEEE divisions
    so the DuckDB SQL mirror hashes identically."""
    if not text:
        return 0, 0.0, 0.0, 0.0
    n = len(text)
    toks = tokens_of(text)
    alpha = len(_ALPHA.findall(text))
    punct = len(_PUNCT.findall(text))
    mean_len = sum(len(t) for t in toks) / len(toks) if toks else 0.0
    return n, alpha / n, punct / n, mean_len


def quality_score(text: Optional[str]) -> float:
    """Heuristic [0,1]: alpha-heavy, moderate punctuation, sane token length.
    score = alpha_ratio * (1 - min(punct_ratio*5, 1)) * len_factor."""
    n, alpha_ratio, punct_ratio, mean_len = char_stats(text)
    if n == 0:
        return 0.0
    len_factor = 1.0 if 3.0 <= mean_len <= 10.0 else 0.5
    return alpha_ratio * (1.0 - min(punct_ratio * 5.0, 1.0)) * len_factor


def lang_id(text: Optional[str]) -> str:
    """argmax of stopword hit counts over the language lists; ties and
    zero-hit texts -> 'und'. Deterministic (langs iterated sorted)."""
    toks = [t.lower() for t in tokens_of(text)]
    if not toks:
        return "und"
    best_lang, best_hits = "und", 0
    for lang in _LANGS:
        hits = sum(1 for t in toks if t in STOPWORDS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang


def doc_fingerprint(text: Optional[str]) -> int:
    return H.fingerprint([t.lower() for t in tokens_of(text)])


def text_stats_dataset(ds, id_col: str = "doc_id", text_col: str = "text"):
    """-> Dataset(id, token_count, n_chars, alpha_ratio, punct_ratio,
    mean_token_len, quality, lang_pred, fingerprint)."""

    def stats_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        rows = {
            "token_count": [],
            "n_chars": [],
            "alpha_ratio": [],
            "punct_ratio": [],
            "mean_token_len": [],
            "quality": [],
            "lang_pred": [],
            "fingerprint": [],
        }
        for t in texts:
            n, ar, pr, ml = char_stats(t)
            rows["token_count"].append(token_count(t))
            rows["n_chars"].append(n)
            rows["alpha_ratio"].append(ar)
            rows["punct_ratio"].append(pr)
            rows["mean_token_len"].append(ml)
            rows["quality"].append(quality_score(t))
            rows["lang_pred"].append(lang_id(t))
            rows["fingerprint"].append(doc_fingerprint(t))
        return pa.table(
            {
                id_col: pa.array(ids, batch.schema.field(id_col).type),
                "token_count": pa.array(rows["token_count"], pa.int64()),
                "n_chars": pa.array(rows["n_chars"], pa.int64()),
                "alpha_ratio": pa.array(rows["alpha_ratio"], pa.float64()),
                "punct_ratio": pa.array(rows["punct_ratio"], pa.float64()),
                "mean_token_len": pa.array(rows["mean_token_len"], pa.float64()),
                "quality": pa.array(rows["quality"], pa.float64()),
                "lang_pred": pa.array(rows["lang_pred"], pa.string()),
                "fingerprint": pa.array(rows["fingerprint"], pa.int64()),
            }
        )

    return ds.map_batches(stats_batch, batch_format="pyarrow")
