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


# BPE-ish pre-tokenizer runs (GPT-2-style approximation, RE2-safe — no
# lookarounds): letter runs, digit runs, symbol runs; whitespace is free.
_BPE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\r\n\f\x0b]+")


def bpe_token_count(text: Optional[str]) -> int:
    """Approximate subword token count: one count per letter/digit/symbol
    run (the published BPE pre-tokenizer shape minus the RE2-incompatible
    lookahead). Upper-bounds whitespace tokens, lower-bounds true BPE."""
    if text is None:
        return 0
    return len(_BPE.findall(text))


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


def _stats_row(t: Optional[str]) -> tuple:
    """Scalar reference (and non-ASCII fallback): one row of stats."""
    n, ar, pr, ml = char_stats(t)
    return (
        token_count(t),
        bpe_token_count(t),
        n,
        ar,
        pr,
        ml,
        quality_score(t),
        lang_id(t),
        doc_fingerprint(t),
    )


def text_stats_table(ids, texts, id_field: pa.Field) -> pa.Table:
    """Vectorized kernel: Arrow/RE2 splits + dictionary-level md5 (each
    DISTINCT token hashed once per batch) + numpy segment algebra for the
    rolling fingerprint (fp = sum h_i * B^(n-1-i) mod M — the unrolled
    Horner form, mod applied per term so int64 never overflows).

    Bit-identical to the scalar path on ASCII text (same re.ASCII classes
    as RE2, integer-ratio IEEE divisions); rows containing non-ASCII bytes
    are recomputed with the scalar reference (utf8proc lower/upper can
    disagree with CPython there) — same fallback contract as clean_vec."""
    import numpy as np
    import pyarrow.compute as pc

    n = len(texts)
    texts = pc.fill_null(texts, "")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()

    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False)
    n_bytes = pc.binary_length(texts).to_numpy(zero_copy_only=False)
    ascii_ok = n_chars == n_bytes

    # alpha/punct counts via a 256-entry byte table over the raw string
    # buffer (memcmp speed; RE2 match-counting of [A-Za-z] measured 40x
    # slower). Bytes >= 0x80 misclassify only rows the non-ASCII fallback
    # overwrites below. re.ASCII classes: \w = [0-9A-Za-z_], \s = [ \t-\r].
    byte_off = np.frombuffer(
        texts.buffers()[1], dtype=np.int32, count=texts.offset + n + 1
    )[texts.offset :]
    base = byte_off[0]
    data_buf = texts.buffers()[2]
    buf = (
        np.frombuffer(data_buf, dtype=np.uint8, count=int(byte_off[-1]))[base:]
        if data_buf is not None
        else np.zeros(0, np.uint8)
    )
    # both counters packed in one int64 (punct << 32 | alpha): ONE gather +
    # ONE cumsum over the byte stream; per-row counts can't reach 2^32 and
    # the packed total stays under 2^63 for any batch below 2^31 bytes.
    lut = np.zeros(256, np.int64)
    for b in range(128):
        ch = chr(b)
        if _ALPHA.match(ch):
            lut[b] += 1
        if _PUNCT.match(ch):
            lut[b] += 1 << 32
    csum = np.concatenate(([0], np.cumsum(lut[buf], dtype=np.int64)))
    rel = byte_off.astype(np.int64) - base
    packed = csum[rel[1:]] - csum[rel[:-1]]
    alpha = packed & 0xFFFFFFFF
    punct = packed >> 32

    words_list = pc.split_pattern_regex(texts, pattern="[ \t\r\n\f\x0b]+")
    offsets = words_list.offsets.to_numpy(zero_copy_only=False)
    flat = words_list.values
    parent = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    codes_arr = pc.dictionary_encode(flat.filter(pa.array(keep)))
    parent_w = parent[keep]
    codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    wlen_dict = pc.utf8_length(codes_arr.dictionary).to_numpy(
        zero_copy_only=False
    )
    ntok = np.bincount(parent_w, minlength=n).astype(np.int64)
    sumlen = np.bincount(
        parent_w, weights=wlen_dict[codes] if len(codes) else None, minlength=n
    )

    cpos = n_chars > 0
    alpha_ratio = np.zeros(n, np.float64)
    punct_ratio = np.zeros(n, np.float64)
    alpha_ratio[cpos] = alpha[cpos] / n_chars[cpos]
    punct_ratio[cpos] = punct[cpos] / n_chars[cpos]
    mean_len = np.zeros(n, np.float64)
    tpos = ntok > 0
    mean_len[tpos] = sumlen[tpos] / ntok[tpos]
    len_factor = np.where((mean_len >= 3.0) & (mean_len <= 10.0), 1.0, 0.5)
    quality = np.zeros(n, np.float64)
    q = alpha_ratio * (1.0 - np.minimum(punct_ratio * 5.0, 1.0)) * len_factor
    quality[cpos] = q[cpos]

    # language: stopword membership decided once per DISTINCT token
    ldict = pc.utf8_lower(codes_arr.dictionary).to_pylist()
    hits = np.zeros((n, len(_LANGS)), np.float64)
    for j, lang in enumerate(_LANGS):
        sw = set(STOPWORDS[lang])
        member = np.fromiter((t in sw for t in ldict), bool, len(ldict))
        if len(codes):
            hits[:, j] = np.bincount(
                parent_w, weights=member[codes], minlength=n
            )
    best = hits.argmax(axis=1)  # first max == scalar's strict-greater scan
    mx = hits.max(axis=1) if len(_LANGS) else np.zeros(n)
    langs_arr = np.array(_LANGS + ["und"])
    lang_pred = langs_arr[np.where(mx > 0, best, len(_LANGS))]

    # fingerprint: h60 once per distinct lowercased token, then the
    # polynomial sum per doc (np.add.reduceat over word segments)
    fp = np.zeros(n, np.int64)
    if len(codes):
        M = H.FINGERPRINT_MOD
        hdict = np.fromiter(
            (H.h60(t) % M for t in ldict), np.int64, len(ldict)
        )
        h = hdict[codes]
        doc_start = np.concatenate(([0], np.cumsum(ntok)))[:-1]
        pos_in_doc = np.arange(len(codes), dtype=np.int64) - doc_start[parent_w]
        exp = ntok[parent_w] - 1 - pos_in_doc
        powmod = np.ones(int(ntok.max()), np.int64)
        for k in range(1, len(powmod)):
            powmod[k] = powmod[k - 1] * H.FINGERPRINT_BASE % M
        term = h * powmod[exp] % M
        nz = np.nonzero(tpos)[0]
        fp[nz] = np.add.reduceat(term, doc_start[nz]) % M

    bpe = pc.count_substring_regex(texts, _BPE.pattern).to_numpy(
        zero_copy_only=False
    )

    out = {
        "token_count": ntok,
        "bpe_token_count": bpe,
        "n_chars": n_chars.astype(np.int64),
        "alpha_ratio": alpha_ratio,
        "punct_ratio": punct_ratio,
        "mean_token_len": mean_len,
        "quality": quality,
        "lang_pred": lang_pred.tolist(),
        "fingerprint": fp,
    }
    bad = np.nonzero(~ascii_ok)[0]
    if len(bad):
        out["lang_pred"] = list(out["lang_pred"])
        for col in out:
            if not isinstance(out[col], list):
                out[col] = out[col].tolist()
        bad_texts = texts.take(pa.array(bad)).to_pylist()
        for i, t in zip(bad, bad_texts):
            row = _stats_row(t)
            for col, v in zip(out, row):
                out[col][i] = v
    return pa.table(
        {
            id_field.name: ids,
            "token_count": pa.array(out["token_count"], pa.int64()),
            "bpe_token_count": pa.array(out["bpe_token_count"], pa.int64()),
            "n_chars": pa.array(out["n_chars"], pa.int64()),
            "alpha_ratio": pa.array(out["alpha_ratio"], pa.float64()),
            "punct_ratio": pa.array(out["punct_ratio"], pa.float64()),
            "mean_token_len": pa.array(out["mean_token_len"], pa.float64()),
            "quality": pa.array(out["quality"], pa.float64()),
            "lang_pred": pa.array(out["lang_pred"], pa.string()),
            "fingerprint": pa.array(out["fingerprint"], pa.int64()),
        }
    )


def text_stats_dataset(ds, id_col: str = "doc_id", text_col: str = "text"):
    """-> Dataset(id, token_count, n_chars, alpha_ratio, punct_ratio,
    mean_token_len, quality, lang_pred, fingerprint). Row-local (no
    shuffle); vectorized kernel with scalar fallback per non-ASCII row."""

    def kernel(batch: pa.Table) -> pa.Table:
        return text_stats_table(
            batch.column(id_col),
            batch.column(text_col),
            batch.schema.field(id_col),
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Character-distribution entropy
# ---------------------------------------------------------------------------

def char_entropy(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document Shannon entropy of the character distribution (nats)
    -> Dataset(id, n_chars, entropy).

    The cheap gibberish/compressibility signal: base64 blobs and
    minified payloads sit near ln(alphabet) entropy, repeated-character
    spam near 0, prose in a narrow band between — a standard cut in
    web-corpus quality filtering alongside the length/punct ratios.

    Contract (mirrored by ``char_entropy_sql``): characters are Unicode
    CODEPOINTS of the raw text (no casefold); with counts ``c`` over
    ``n`` total,

        entropy = round(ln(n) - fsum(c * ln(c), by char asc) / n, 6)

    (the algebraic form of -sum p ln p that keeps every ln argument an
    exact integer — the lm.py float regime; the oracle's unordered SUM
    is absorbed by round-6).  Empty/null docs emit no row.

    Scale shape: zero exchanges, one row-local pass; per-doc state is
    the character Counter (alphabet-bounded).
    """
    import math
    from collections import Counter

    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]

    def kernel(batch: pa.Table) -> pa.Table:
        out_id, out_n, out_h = [], [], []
        for did, text in zip(
            batch.column(id_col).to_pylist(),
            batch.column(text_col).to_pylist(),
        ):
            if not text:
                continue
            cnt = Counter(text)
            n = len(text)
            s = math.fsum(
                c * math.log(c) for _, c in sorted(cnt.items())
            )
            out_id.append(did)
            out_n.append(n)
            out_h.append(round(math.log(n) - s / n, 6))
        return pa.table(
            {
                id_col: pa.array(out_id, id_type),
                "n_chars": pa.array(out_n, pa.int64()),
                "entropy": pa.array(out_h, pa.float64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow"
    )


def char_entropy_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror: codepoint unnest via substr, identical ln form."""
    return f"""
WITH chars AS (
    SELECT {id_col}, length({text_col}) AS n,
           substr({text_col}, i, 1) AS ch
    FROM (SELECT {id_col}, {text_col},
                 unnest(range(1, length({text_col}) + 1)) AS i
          FROM {table}
          WHERE {text_col} IS NOT NULL AND length({text_col}) > 0)
),
cc AS (
    SELECT {id_col}, any_value(n) AS n, ch, count(*) AS c
    FROM chars GROUP BY {id_col}, ch
)
SELECT {id_col}, CAST(any_value(n) AS BIGINT) AS n_chars,
       round(ln(any_value(n)) - SUM(c * ln(c)) / any_value(n), 6)
           AS entropy
FROM cc GROUP BY {id_col}
"""


# ---------------------------------------------------------------------------
# Lexical diversity (type-token ratio)
# ---------------------------------------------------------------------------

def lexical_diversity(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document type-token ratio -> Dataset(id, n_tokens,
    n_distinct, ttr) — the lexical-diversity quality cut: keyword-stuffed
    spam and template farms sit at the extremes of distinct/total.

    Contract (mirrored by ``lexical_diversity_sql``): tokens are the
    dedup-family tokenizer's; ``ttr = CAST(n_distinct AS DOUBLE) /
    n_tokens`` — one exact integer division, bit-identical on both
    sides.  Empty/null docs emit no row.

    Scale shape: zero exchanges — one vectorized row-local pass
    (flat_tokens + two Arrow group_bys inside the batch).
    """
    import numpy as np

    from uk_address_matcher_ray.stages.dedup import flat_tokens

    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]

    def kernel(batch: pa.Table) -> pa.Table:
        parents, flat = flat_tokens(batch.column(text_col))
        n = batch.num_rows
        totals = np.bincount(parents, minlength=n).astype(np.int64)
        if len(flat):
            pairs = pa.table(
                {"p": pa.array(parents, pa.int64()), "tok": flat}
            ).group_by(["p", "tok"]).aggregate([("tok", "count")])
            dist = np.bincount(
                pairs.column("p").to_numpy(zero_copy_only=False),
                minlength=n,
            ).astype(np.int64)
        else:
            dist = np.zeros(n, dtype=np.int64)
        keep = totals > 0
        ids = batch.column(id_col).filter(pa.array(keep))
        tot_k = totals[keep]
        dis_k = dist[keep]
        return pa.table(
            {
                id_col: ids.cast(id_type),
                "n_tokens": pa.array(tot_k, pa.int64()),
                "n_distinct": pa.array(dis_k, pa.int64()),
                "ttr": pa.array(
                    dis_k.astype(np.float64) / tot_k, pa.float64()
                ),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow"
    )


def lexical_diversity_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror: identical tokenizer split, one exact division."""
    split = (
        "list_filter(regexp_split_to_array(lower(trim(coalesce("
        f"{text_col}, ''))), '\\s+'), t -> t != '')"
    )
    return f"""
WITH toks AS (
    SELECT {id_col}, unnest({split}) AS tok FROM {table}
)
SELECT {id_col},
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct,
       CAST(count(DISTINCT tok) AS DOUBLE) / count(*) AS ttr
FROM toks GROUP BY {id_col}
"""
