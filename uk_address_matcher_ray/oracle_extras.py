"""DuckDB oracle SQL for the selection, extraction, dedup, similarity,
text-stats and windowed-aggregate queries in __ray_entry__.

Each function mirrors its Ray operator expression-for-expression (hashing via
functions/hashing.py SQL fragments) so the driver's value-hash comparison
holds; where floats could drift (cosines), both sides round identically.
"""

from __future__ import annotations

from uk_address_matcher_ray.functions import hashing as H
from uk_address_matcher_ray.sources import synth
from uk_address_matcher_ray.stages.textstats import STOPWORDS


# ---------------------------------------------------------------------------
# best matches (stages/select.py; analyse_results.py:5-191)
# ---------------------------------------------------------------------------

def best_matches_sql(pairs_sql: str, thresholds=(10, 5, 1)) -> str:
    d_whens = "\n".join(
        f"WHEN distinguishability > {d} THEN '{i:02d}: Distinguishability > {d}'"
        for i, d in enumerate(sorted(set(thresholds) | {0}, reverse=True), start=2)
    )
    next_label = f"{len(set(thresholds) | {0}) + 2:02d}."
    messy = synth.messy_sql("SELECT c_custkey FROM customer")
    return f"""
WITH pairs AS MATERIALIZED ({pairs_sql}),
windowed AS (
    SELECT *,
        match_weight - LEAD(match_weight) OVER (
            PARTITION BY unique_id_r ORDER BY match_weight DESC
        ) AS distinguishability,
        COUNT(*) OVER (PARTITION BY unique_id_r) AS match_count
    FROM pairs
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY unique_id_r ORDER BY match_weight DESC, unique_id_l
    ) = 1
),
categorized AS (
    SELECT *,
        CASE
            WHEN match_count = 1 THEN '01: One match only'
            WHEN distinguishability IS NULL THEN '{next_label}: NaN (last match in group)'
            {d_whens}
            WHEN distinguishability = 0 THEN '{next_label}: Distinguishability = 0'
            ELSE '99: error, uncategorized'
        END AS distinguishability_category
    FROM windowed
),
messy_raw AS ({messy}),
cleaned AS (SELECT * FROM categorized),
l_side AS (
    SELECT unique_id AS cu, original_address_concat, postcode FROM (
        {_cleaned_l_projection_sql()}
    )
)
SELECT
    a.unique_id AS unique_id_r,
    t.unique_id_l,
    a.address_concat AS address_concat_r,
    a.postcode AS postcode_r,
    ls.original_address_concat AS original_address_concat_l,
    ls.postcode AS postcode_l,
    t.match_weight,
    t.distinguishability,
    COALESCE(t.distinguishability_category, '99: No match')
        AS distinguishability_category
FROM messy_raw a
LEFT JOIN cleaned t ON a.unique_id = t.unique_id_r
LEFT JOIN l_side ls ON t.unique_id_l = ls.cu
"""


def _cleaned_l_projection_sql() -> str:
    """Cleaned canonical-side (original_address_concat, postcode) — the pair
    table carries them in the engine; the oracle rejoins from the cleaned
    union."""
    from uk_address_matcher_ray import oracle

    src = "SELECT c_custkey FROM customer"
    union_input = (
        f"SELECT * FROM ({synth.canonical_sql(src)}) "
        f"UNION ALL SELECT * FROM ({synth.messy_sql(src)})"
    )
    return (
        "SELECT unique_id, original_address_concat, postcode FROM ("
        + oracle.cleaned_features_sql(union_input)
        + ") WHERE unique_id LIKE 'c%'"
    )


def best_matches_summary_sql(pairs_sql: str) -> str:
    return f"""
WITH best AS ({best_matches_sql(pairs_sql)})
SELECT distinguishability_category,
    count(*) AS count,
    printf('%.2f%%', 100.0 * count(*) / sum(count(*)) OVER ()) AS percentage
FROM best
GROUP BY distinguishability_category
"""


# ---------------------------------------------------------------------------
# extraction mapping (stages/extract.py over synth pages)
# ---------------------------------------------------------------------------

def extract_pages_sql() -> str:
    messy = synth.messy_sql("SELECT c_custkey FROM customer")
    return f"""
WITH messy AS ({messy})
SELECT
    'https://host' || CAST(CAST(substr(unique_id, 2) AS BIGINT) % 97 AS VARCHAR)
        || '.example/' || unique_id AS unique_id,
    address_concat,
    CASE WHEN postcode = '' THEN NULL ELSE postcode END AS postcode,
    'en' AS lang
FROM messy
"""


def adjacent_tokens_sql(input_sql: str) -> str:
    """C12/C13 oracle (reference cleaning_steps.py:585-721): global window by
    reverse(address_concat), lag/lead common-suffix lengths, start-token
    split, plus the generalised alias flattening. duckdb 1.0 lacks
    correlated range(); the max-i semantics use list_filter +
    list_aggregate('max')."""
    from uk_address_matcher_ray.stages.adjacent import GENERALISED_ALIASES

    alias_whens = " ".join(
        f"WHEN t = '{k}' THEN {v!r}" for k, v in GENERALISED_ALIASES.items()
    )
    alias_expr = (
        "flatten(list_transform(distinguishing_adj_start_tokens, "
        f"t -> CASE {alias_whens} ELSE [t] END))"
    )
    return f"""
WITH input_rows AS ({input_sql}),
tokens AS (
    SELECT
        ['FLAT', 'APARTMENT', 'UNIT'] AS __tokens_to_remove,
        list_filter(regexp_split_to_array(address_concat, '\\s+'),
            x -> not list_contains(__tokens_to_remove, x)) AS __tokens,
        row_number() OVER (ORDER BY reverse(address_concat)) AS row_order,
        *
    FROM input_rows
    WHERE address_concat IS NOT NULL
),
with_neighbors AS (
    SELECT
        lag(__tokens) OVER (ORDER BY row_order) AS __prev_tokens,
        lead(__tokens) OVER (ORDER BY row_order) AS __next_tokens,
        *
    FROM tokens
),
with_suffix_lengths AS (
    SELECT
        len(__tokens) AS __token_count,
        CASE WHEN __prev_tokens IS NOT NULL THEN
            list_aggregate(list_filter(
                range(0, least(len(__tokens), len(__prev_tokens))),
                i -> list_slice(list_reverse(__tokens), 1, i+1) =
                     list_slice(list_reverse(__prev_tokens), 1, i+1)), 'max')
        ELSE 0 END AS prev_common_suffix,
        CASE WHEN __next_tokens IS NOT NULL THEN
            list_aggregate(list_filter(
                range(0, least(len(__tokens), len(__next_tokens))),
                i -> list_slice(list_reverse(__tokens), 1, i+1) =
                     list_slice(list_reverse(__next_tokens), 1, i+1)), 'max')
        ELSE 0 END AS next_common_suffix,
        *
    FROM with_neighbors
),
split AS (
    SELECT unique_id,
        COALESCE(list_filter(__tokens, (token, i) ->
            i < __token_count - greatest(prev_common_suffix, next_common_suffix)),
            ARRAY[]) AS distinguishing_adj_start_tokens,
        COALESCE(list_filter(__tokens, (token, i) ->
            i >= __token_count - greatest(prev_common_suffix, next_common_suffix)),
            ARRAY[]) AS common_adj_start_tokens
    FROM with_suffix_lengths
)
SELECT unique_id, distinguishing_adj_start_tokens, common_adj_start_tokens,
    {alias_expr} AS distinguishing_adj_token_aliases
FROM split
"""


def _html_escape_sql(expr: str) -> str:
    """html.escape(quote=False) mirror: & first, then < and >."""
    return (
        f"replace(replace(replace({expr}, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    )


def media_decode_sql() -> str:
    """Mirror of the media_decode query: the Ray side synthesizes a 16x16
    PPM per messy record (pixel = (k*7 + y*31 + x*13 + c*101) % 256),
    DECODES the bytes with the pure-numpy decoder and reduces 4x4 cells to
    mean-brightness features. The oracle regenerates the pixel values from
    the same formula and aggregates (SUM/48)/255 per cell — one exact
    integer sum per cell, so the doubles are bit-identical
    (multimodal.image_grid_features documents the contract)."""
    return """
WITH ks AS (
    SELECT DISTINCT c_custkey AS k FROM customer WHERE c_custkey % 3 != 0
),
px AS (
    SELECT k, (y.r // 4) * 4 + (x.r // 4) AS cell,
           (k * 7 + y.r * 31 + x.r * 13 + c.r * 101) % 256 AS v
    FROM ks, range(16) y(r), range(16) x(r), range(3) c(r)
),
f AS (
    SELECT k, cell, (CAST(SUM(v) AS DOUBLE) / 48.0) / 255.0 AS fv
    FROM px GROUP BY 1, 2
)
SELECT 'm' || CAST(k AS VARCHAR) AS media_id,
       list(fv ORDER BY cell) AS features
FROM f GROUP BY k
"""


def media_decode_jpeg_sql() -> str:
    """Mirror of media_decode_jpeg: the Ray side encodes a 32x32 4:2:0
    baseline JPEG per messy record (4 constant-color 16x16 macroblocks,
    quant table all 8s, functions/jpeg.py) and DECODES it with the
    pure-numpy codec. Constant integer-YCbCr macroblocks round-trip
    bit-exactly, so the decoded pixel is the closed-form YCbCr round trip
    with the codec's documented floor(x+0.5) rounding; the 16x16-resized
    4x4 grid feature is then one exact integer sum per cell:
    (16*(R'+G'+B') / 48) / 255 — identical doubles to
    multimodal.image_grid_features."""
    return """
WITH ks AS (
    SELECT DISTINCT c_custkey AS k FROM customer WHERE c_custkey % 3 != 0
),
mb AS (
    SELECT k, by.r AS by, bx.r AS bx,
           CAST((k * 7 + by.r * 31 + bx.r * 13 + 0 * 101) % 256 AS DOUBLE) AS r0,
           CAST((k * 7 + by.r * 31 + bx.r * 13 + 1 * 101) % 256 AS DOUBLE) AS g0,
           CAST((k * 7 + by.r * 31 + bx.r * 13 + 2 * 101) % 256 AS DOUBLE) AS b0
    FROM ks, range(2) by(r), range(2) bx(r)
),
ycc AS (
    SELECT k, by, bx,
           floor(0.299 * r0 + 0.587 * g0 + 0.114 * b0 + 0.5) AS y,
           floor(128.0 - 0.168736 * r0 - 0.331264 * g0 + 0.5 * b0 + 0.5) AS cb,
           floor(128.0 + 0.5 * r0 - 0.418688 * g0 - 0.081312 * b0 + 0.5) AS cr
    FROM mb
),
rgb AS (
    SELECT k, by, bx,
           least(255, greatest(0, floor(y + 1.402 * (cr - 128.0) + 0.5))) AS r2,
           least(255, greatest(0, floor(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5))) AS g2,
           least(255, greatest(0, floor(y + 1.772 * (cb - 128.0) + 0.5))) AS b2
    FROM ycc
),
cells AS (
    SELECT k, (by * 2 + gy.r) * 4 + (bx * 2 + gx.r) AS cell,
           (CAST(16 * (r2 + g2 + b2) AS DOUBLE) / 48.0) / 255.0 AS fv
    FROM rgb, range(2) gy(r), range(2) gx(r)
)
SELECT 'm' || CAST(k AS VARCHAR) AS media_id,
       list(fv ORDER BY cell) AS features
FROM cells GROUP BY k
"""


def media_features_sql(dim: int = 16) -> str:
    """Mirror of extract_media_features over the synth messy pages: rebuilds
    the exact page bytes (sources/webpages.render_html, UTF-8 — the © footer
    is 2 bytes) and folds them into a ``dim``-bucket integer histogram via
    hex-string byte extraction."""
    messy = synth.messy_sql("SELECT c_custkey FROM customer")
    title = _html_escape_sql("unique_id")
    text = _html_escape_sql(
        "coalesce(address_concat, '') || chr(10) || coalesce(postcode, '')"
    )
    body = f"replace({text}, chr(10), '<br/>')"
    return f"""
WITH messy AS ({messy}),
ordered AS (
    SELECT unique_id, address_concat, postcode,
        row_number() OVER (ORDER BY CAST(substr(unique_id, 2) AS BIGINT)) - 1 AS i
    FROM messy
),
pages AS (
    SELECT
        'https://host' || CAST(i % 97 AS VARCHAR) || '.example/' || unique_id AS media_id,
        '<html><head><title>' || {title}
        || '</title><meta charset="utf-8"/></head><body><nav>home | about</nav><main>'
        || {body}
        || '</main><footer>© example</footer></body></html>' AS page
    FROM ordered
),
hx AS (
    SELECT media_id, hex(encode(page)) AS h, octet_length(encode(page)) AS n
    FROM pages
),
b AS (SELECT media_id, h, unnest(range(0, n)) AS i FROM hx),
v AS (
    SELECT media_id,
        CAST(('0x' || substr(h, CAST(2 * i + 1 AS BIGINT), 2)) AS INTEGER) % {dim} AS bucket
    FROM b
),
c AS (SELECT media_id, bucket, count(*) AS cnt FROM v GROUP BY media_id, bucket),
packed AS (
    SELECT media_id, list(struct_pack(bucket := bucket, cnt := cnt)) AS pairs
    FROM c GROUP BY media_id
)
SELECT media_id,
    list_transform(range(0, {dim}),
        k -> coalesce(list_extract(list_filter(pairs, p -> p.bucket = k), 1).cnt,
                      CAST(0 AS BIGINT))) AS byte_hist
FROM packed
"""


# ---------------------------------------------------------------------------
# dedup (stages/dedup.py)
# ---------------------------------------------------------------------------

def exact_dedup_sql(docs_sql: str) -> str:
    return f"""
WITH docs AS ({docs_sql})
SELECT min(doc_id) AS doc_id
FROM docs
GROUP BY {H.h60_sql("coalesce(text, '')")}
"""


def ngram_jaccard_sql(
    docs_sql: str, shingle_k: int = 3, jaccard_threshold: float = 0.8
) -> str:
    """Brute-force mirror of stages/dedup.ngram_jaccard_pairs: the engine's
    prefix filter is EXACT (no probabilistic misses), so the oracle needs no
    bucket replay — candidates are every pair sharing >= 1 shingle hash
    (a superset of the qualifying pairs: J >= t > 0 implies a shared
    shingle), verified with the same int/int double division."""
    return f"""
WITH docs AS ({docs_sql}),
toks AS (
    SELECT doc_id,
        list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\\s+'),
                    t -> t != '') AS t
    FROM docs
),
shingled AS MATERIALIZED (
    SELECT doc_id,
        list_sort(list_distinct(list_transform(
            CASE WHEN len(t) <= {shingle_k}
                THEN [array_to_string(t, ' ')]
                ELSE list_transform(range(1, len(t) - {shingle_k} + 2),
                    i -> array_to_string(t[i:i+{shingle_k - 1}], ' '))
            END, s -> {H.h60_sql('s')}))) AS hashes
    FROM toks
    WHERE len(t) > 0
),
ex AS (SELECT doc_id, unnest(hashes) AS h FROM shingled),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
),
raw_pairs AS (
    SELECT id_a, id_b,
        len(list_filter(sa.hashes, x -> list_contains(sb.hashes, x)))
            / (len(sa.hashes) + len(sb.hashes)
               - len(list_filter(sa.hashes, x -> list_contains(sb.hashes, x)))) AS jaccard
    FROM cand
    JOIN shingled sa ON sa.doc_id = cand.id_a
    JOIN shingled sb ON sb.doc_id = cand.id_b
)
SELECT id_a, id_b, jaccard FROM raw_pairs WHERE jaccard >= {jaccard_threshold!r}
"""


def near_dedup_sql(docs_sql: str, pairs_sql: str) -> str:
    """Mirror of stages/dedup.near_dedup_docs: connected components over the
    pair relation via recursive min-label reachability (numeric min ==
    the engine's zero-padded lexicographic min), survivors = min id per
    component plus docs in no pair."""
    return f"""
WITH docs AS ({docs_sql}),
pairs AS MATERIALIZED (SELECT id_a, id_b FROM ({pairs_sql})),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION ALL
    SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach AS (
    WITH RECURSIVE r(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.dst, r.label FROM r JOIN edges e ON r.node = e.src
    )
    SELECT * FROM r
),
lab AS (SELECT node, min(label) AS label FROM reach GROUP BY node)
SELECT d.doc_id
FROM docs d LEFT JOIN lab ON lab.node = d.doc_id
WHERE lab.node IS NULL OR lab.label = d.doc_id
"""


def minhash_pairs_sql(
    docs_sql: str,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
) -> str:
    rows = num_perm // bands
    P = H.MINHASH_P
    A, B = H.minhash_coeffs(num_perm)
    sig_terms = []
    for i in range(num_perm):
        sig_terms.append(
            f"list_aggregate(list_transform(hmod, "
            f"h -> ({A[i]} * h + {B[i]}) % {P}), 'min')"
        )
    sig_list = "[" + ", ".join(sig_terms) + "]"
    band_rows = []
    for b in range(bands):
        chunk = f"array_to_string(list_transform(sig[{b * rows + 1}:{(b + 1) * rows}], x -> CAST(x AS VARCHAR)), '_')"
        band_rows.append(
            f"SELECT doc_id, hashes, '{b}|' || lower(hex({H.h60_sql(chunk)})) AS bucket FROM sigs"
        )
    bands_union = "\nUNION ALL\n".join(band_rows)
    return f"""
WITH docs AS ({docs_sql}),
toks AS (
    SELECT doc_id,
        list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\\s+'),
                    t -> t != '') AS t
    FROM docs
),
shingled AS (
    SELECT doc_id,
        list_sort(list_distinct(list_transform(
            CASE WHEN len(t) <= {shingle_k}
                THEN [array_to_string(t, ' ')]
                ELSE list_transform(range(1, len(t) - {shingle_k} + 2),
                    i -> array_to_string(t[i:i+{shingle_k - 1}], ' '))
            END, s -> {H.h60_sql('s')}))) AS hashes
    FROM toks
    WHERE len(t) > 0
),
sigs AS MATERIALIZED (
    SELECT doc_id, hashes, {sig_list} AS sig
    FROM (SELECT doc_id, hashes, list_transform(hashes, h -> h % {P}) AS hmod
          FROM shingled)
),
bucketed AS MATERIALIZED ({bands_union}),
raw_pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        len(list_filter(a.hashes, x -> list_contains(b.hashes, x)))
            / (len(a.hashes) + len(b.hashes)
               - len(list_filter(a.hashes, x -> list_contains(b.hashes, x)))) AS jaccard
    FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, jaccard FROM raw_pairs WHERE jaccard >= {jaccard_threshold!r}
"""


def minhash_pairs_ab_sql(
    docs_a_sql: str,
    docs_b_sql: str,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
) -> str:
    """Cross-corpus mirror of stages/dedup.minhash_lsh_pairs_ab: the same
    signature/band chain as minhash_pairs_sql over the tagged union of the
    two corpora, with the pair join restricted to side 0 × side 1 (A first,
    no id ordering constraint)."""
    rows = num_perm // bands
    P = H.MINHASH_P
    A, B = H.minhash_coeffs(num_perm)
    sig_terms = []
    for i in range(num_perm):
        sig_terms.append(
            f"list_aggregate(list_transform(hmod, "
            f"h -> ({A[i]} * h + {B[i]}) % {P}), 'min')"
        )
    sig_list = "[" + ", ".join(sig_terms) + "]"
    band_rows = []
    for b in range(bands):
        chunk = f"array_to_string(list_transform(sig[{b * rows + 1}:{(b + 1) * rows}], x -> CAST(x AS VARCHAR)), '_')"
        band_rows.append(
            f"SELECT doc_id, side, hashes, '{b}|' || lower(hex({H.h60_sql(chunk)})) AS bucket FROM sigs"
        )
    bands_union = "\nUNION ALL\n".join(band_rows)
    return f"""
WITH docs AS (
    SELECT doc_id, text, 0 AS side FROM ({docs_a_sql})
    UNION ALL
    SELECT doc_id, text, 1 AS side FROM ({docs_b_sql})
),
toks AS (
    SELECT doc_id, side,
        list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\\s+'),
                    t -> t != '') AS t
    FROM docs
),
shingled AS (
    SELECT doc_id, side,
        list_sort(list_distinct(list_transform(
            CASE WHEN len(t) <= {shingle_k}
                THEN [array_to_string(t, ' ')]
                ELSE list_transform(range(1, len(t) - {shingle_k} + 2),
                    i -> array_to_string(t[i:i+{shingle_k - 1}], ' '))
            END, s -> {H.h60_sql('s')}))) AS hashes
    FROM toks
    WHERE len(t) > 0
),
sigs AS MATERIALIZED (
    SELECT doc_id, side, hashes, {sig_list} AS sig
    FROM (SELECT doc_id, side, hashes, list_transform(hashes, h -> h % {P}) AS hmod
          FROM shingled)
),
bucketed AS MATERIALIZED ({bands_union}),
raw_pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        len(list_filter(a.hashes, x -> list_contains(b.hashes, x)))
            / (len(a.hashes) + len(b.hashes)
               - len(list_filter(a.hashes, x -> list_contains(b.hashes, x)))) AS jaccard
    FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND a.side = 0 AND b.side = 1
)
SELECT id_a, id_b, jaccard FROM raw_pairs WHERE jaccard >= {jaccard_threshold!r}
"""


def _simhash_sigs_cte(docs_sql: str) -> str:
    """CTE chain ending in ``sigs(doc_id, simhash)`` — bit-exact DuckDB mirror
    of functions/hashing.simhash64 over stages/dedup._tokens (token hash =
    (h60(t) << 4) | (h60('s|'||t) & 15) in HUGEINT; 64 per-bit ±1 sums;
    two's-complement fold to int64)."""
    h_expr = (
        f"CAST({H.h60_sql('t')} AS HUGEINT) * 16 + ({H.h60_sql(chr(39) + 's|' + chr(39) + ' || t')} % 16)"
    )
    acc_cols = ", ".join(
        f"sum(CASE WHEN (h // {1 << i}) % 2 = 1 THEN 1 ELSE -1 END) AS acc_{i}"
        for i in range(64)
    )
    sig_terms = " + ".join(
        f"(CASE WHEN acc_{i} > 0 THEN CAST('{1 << i}' AS HUGEINT) ELSE 0 END)"
        for i in range(64)
    )
    return f"""
docs AS ({docs_sql}),
toks AS (
    SELECT doc_id,
        list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\\s+'),
                    t -> t != '') AS ts
    FROM docs
),
tok AS (SELECT doc_id, unnest(ts) AS t FROM toks),
th AS (SELECT doc_id, {h_expr} AS h FROM tok),
accs AS (SELECT doc_id, {acc_cols} FROM th GROUP BY doc_id),
usig AS (SELECT doc_id, {sig_terms} AS us FROM accs),
sigs AS (
    SELECT d.doc_id,
        CAST(coalesce(
            CASE WHEN u.us >= CAST('{1 << 63}' AS HUGEINT)
                 THEN u.us - CAST('{1 << 64}' AS HUGEINT) ELSE u.us END,
            0) AS BIGINT) AS simhash
    FROM docs d LEFT JOIN usig u ON d.doc_id = u.doc_id
)"""


def simhash_sigs_sql(docs_sql: str) -> str:
    return f"WITH {_simhash_sigs_cte(docs_sql)}\nSELECT doc_id, simhash FROM sigs"


def simhash_pairs_sql(docs_sql: str, max_hamming: int = 3, bands: int = 4) -> str:
    """Banded-bucket simhash pairs: Hamming(sig) <= max_hamming, id_a < id_b
    (mirror of stages/dedup.simhash_pairs; bucket string encoding only needs
    to be injective per (band, chunk), not byte-identical)."""
    width = 64 // bands
    band_rows = []
    for b in range(bands):
        chunk = f"(us // {1 << (b * width)}) % {1 << width}"
        band_rows.append(
            f"SELECT doc_id, simhash, '{b}|' || CAST({chunk} AS VARCHAR) AS bucket FROM usigned"
        )
    bands_union = "\nUNION ALL\n".join(band_rows)
    return f"""
WITH {_simhash_sigs_cte(docs_sql)},
usigned AS (
    SELECT doc_id, simhash,
        CASE WHEN simhash < 0 THEN CAST(simhash AS HUGEINT) + CAST('{1 << 64}' AS HUGEINT)
             ELSE CAST(simhash AS HUGEINT) END AS us
    FROM sigs
),
bucketed AS MATERIALIZED ({bands_union}),
raw AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM raw WHERE hamming <= {max_hamming}
"""


def embedding_near_dup_sql(threshold: float) -> str:
    dot = _cosine_sql("a.v", "b.v")
    return f"""
WITH e AS MATERIALIZED (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    round({dot}, 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE {dot} >= {threshold!r}
"""


def _cosine_sql(a: str, b: str) -> str:
    """Cosine in DOUBLE with sequential list_reduce sums (order = list order,
    matching numpy within the rounding applied by both sides)."""
    dot = f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip({a}, {b}), x -> x[1] * x[2])), (p, q) -> p + q)"
    na = f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform({a}, x -> x * x)), (p, q) -> p + q))"
    nb = f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform({b}, x -> x * x)), (p, q) -> p + q))"
    return f"(({dot}) / (({na}) * ({nb})))"


def _dot_sql(a: str, b: str) -> str:
    """Sequential list_reduce dot product (both operands pre-normalized)."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip({a}, {b}), x -> x[1] * x[2])), (p, q) -> p + q)"
    )


def _normalize_sql(x: str) -> str:
    """L2-normalize with the engine's zero-norm guard (norm 0 -> divide by 1)."""
    nrm = (
        f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({x}, t -> t * t)), (p, q) -> p + q))"
    )
    return (
        f"list_transform({x}, t -> t / "
        f"(CASE WHEN ({nrm}) = 0 THEN 1.0 ELSE ({nrm}) END))"
    )


def _kmeans_ctes(num_centroids: int, iters: int, dim: int) -> list:
    """CTE chain mirroring stages/similarity.train_centroids + the final
    nearest-centroid assignment: Lloyd iterations unrolled (assignment =
    ROW_NUMBER over dot DESC / cid ASC, matching numpy argmax's first-max
    tie break; empty clusters keep their previous centroid via LEFT JOIN).
    Ends at ``af(vec_id, v, cid)`` — shared by ivf_topk_sql,
    kmeans_clusters_sql and semdedup_sql."""
    ctes = [
        "e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings)",
        f"norm AS MATERIALIZED (SELECT vec_id, {_normalize_sql('v0')} AS v FROM e)",
        f"idx AS (SELECT unnest(range(1, {dim + 1})) AS i)",
        (
            "c0 AS MATERIALIZED (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS cv "
            f"FROM (SELECT * FROM norm ORDER BY vec_id LIMIT {num_centroids}))"
        ),
    ]
    for it in range(1, iters + 1):
        prev = f"c{it - 1}"
        dot = _dot_sql("n.v", "c.cv")
        ctes.append(
            f"a{it} AS MATERIALIZED (SELECT vec_id, v, cid FROM ("
            f"SELECT n.vec_id, n.v, c.cid, ROW_NUMBER() OVER ("
            f"PARTITION BY n.vec_id ORDER BY {dot} DESC, c.cid) AS rn "
            f"FROM norm n CROSS JOIN {prev} c) t WHERE rn = 1)"
        )
        ctes.append(
            f"m{it} AS (SELECT cid, list(s / n ORDER BY i) AS mv FROM ("
            f"SELECT a.cid, i.i AS i, sum(a.v[i.i]) AS s, count(*) AS n "
            f"FROM a{it} a CROSS JOIN idx i GROUP BY a.cid, i.i) t GROUP BY cid)"
        )
        ctes.append(
            f"c{it} AS MATERIALIZED (SELECT c.cid, CASE WHEN m.mv IS NULL "
            f"THEN c.cv ELSE {_normalize_sql('m.mv')} END AS cv "
            f"FROM {prev} c LEFT JOIN m{it} m USING (cid))"
        )
    cf = f"c{iters}"
    dot_a = _dot_sql("n.v", "c.cv")
    ctes.append(
        f"af AS MATERIALIZED (SELECT vec_id, v, cid FROM ("
        f"SELECT n.vec_id, n.v, c.cid, ROW_NUMBER() OVER ("
        f"PARTITION BY n.vec_id ORDER BY {dot_a} DESC, c.cid) AS rn "
        f"FROM norm n CROSS JOIN {cf} c) t WHERE rn = 1)"
    )
    return ctes


def ivf_topk_sql(
    k: int,
    num_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    dim: int = 64,
    n_queries: int = 5,
) -> str:
    """Exact mirror of stages/similarity.ivf_topk: the shared Lloyd CTE
    chain (_kmeans_ctes), final top-k restricted to each query's nprobe
    probed buckets. Float-sum orders differ from numpy at ~1e-15 — hidden by
    the 6-digit rounding both sides apply (same tolerance as ann_topk); the
    discrete argmax/probe choices only flip on sub-1e-12 dot ties, absent in
    the synth embeddings."""
    ctes = _kmeans_ctes(num_centroids, iters, dim)
    cf = f"c{iters}"
    ctes.append(f"q AS (SELECT * FROM norm ORDER BY vec_id LIMIT {n_queries})")
    dot_q = _dot_sql("q.v", "c.cv")
    ctes.append(
        f"qp AS (SELECT query_id, cid FROM ("
        f"SELECT q.vec_id AS query_id, c.cid, ROW_NUMBER() OVER ("
        f"PARTITION BY q.vec_id ORDER BY {dot_q} DESC, c.cid) AS rn "
        f"FROM q CROSS JOIN {cf} c) t WHERE rn <= {nprobe})"
    )
    dot_s = _dot_sql("q.v", "a.v")
    ctes.append(
        f"scored AS (SELECT qp.query_id, a.vec_id, {dot_s} AS cosine "
        f"FROM qp JOIN af a USING (cid) JOIN q ON q.vec_id = qp.query_id "
        f"WHERE a.vec_id != qp.query_id)"
    )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT query_id, vec_id, round(cosine, 6) AS cosine,
    CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id
    ) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def kmeans_clusters_sql(
    num_centroids: int = 16, iters: int = 3, dim: int = 64
) -> str:
    """Mirror of stages/similarity.kmeans_assign: the shared Lloyd chain's
    final assignment. Discrete output — exact unless a dot tie flips the
    argmax at sub-1e-12, absent in the synth embeddings."""
    body = ",\n".join(_kmeans_ctes(num_centroids, iters, dim))
    return f"""
WITH {body}
SELECT vec_id, cid FROM af
"""


def semdedup_sql(
    threshold: float = 0.9,
    num_centroids: int = 16,
    iters: int = 3,
    dim: int = 64,
) -> str:
    """Mirror of stages/similarity.semdedup: within-cluster max cosine to a
    smaller-id cluster-mate (LEFT JOIN keeps each cluster's lowest id with
    a null max). is_dup compares the UNROUNDED max on both sides — the
    threshold sits far from any synth cosine, so 1e-15 sum-order noise
    cannot flip it (same tolerance argument as ivf_topk_sql)."""
    ctes = _kmeans_ctes(num_centroids, iters, dim)
    dot = _dot_sql("a.v", "b.v")
    ctes.append(
        f"mx AS (SELECT a.vec_id, max({dot}) AS m "
        f"FROM af a JOIN af b ON a.cid = b.cid AND b.vec_id < a.vec_id "
        f"GROUP BY a.vec_id)"
    )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT a.vec_id, a.cid,
    round(mx.m, 6) AS max_cos_smaller,
    COALESCE(mx.m >= {threshold!r}, FALSE) AS is_dup
FROM af a LEFT JOIN mx USING (vec_id)
"""


def quality_classifier_sql(
    dim: int = 16,
    iters: int = 3,
    lr: float = 1.0,
    label_expr: str = "CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END",
) -> str:
    """Mirror of stages/classifier.quality_classifier: identical md5
    hashing-trick buckets, full-batch GD iterations unrolled as CTE chains
    (the Lloyd-unroll pattern of _kmeans_ctes). Float sum orders differ
    from numpy at ~1e-15 — hidden by the 6-digit rounding both sides apply
    to the smooth sigmoid output (no discrete branch to flip)."""
    d1 = dim + 1
    tok_split = (
        "list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))),"
        " '\\s+'), t -> t != '')"
    )
    ctes = [
        f"docs AS (SELECT doc_id, text, {label_expr} AS y FROM documents)",
        f"toks AS (SELECT doc_id, unnest({tok_split}) AS tok FROM docs)",
        (
            "bkt AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8))"
            f" AS UBIGINT) % {dim} AS b FROM toks)"
        ),
        "cnt AS (SELECT doc_id, b, count(*) AS c FROM bkt GROUP BY doc_id, b)",
        "ntok AS (SELECT doc_id, count(*) AS n FROM bkt GROUP BY doc_id)",
        f"dims AS (SELECT unnest(range(0, {dim})) AS i)",
        (
            "feat AS MATERIALIZED (SELECT d.doc_id, any_value(d.y) AS y, "
            "list(CASE WHEN n.n IS NULL THEN 0.0 ELSE coalesce(c.c, 0)"
            " / CAST(n.n AS DOUBLE) END ORDER BY dm.i) || [1.0] AS x "
            "FROM docs d CROSS JOIN dims dm "
            "LEFT JOIN cnt c ON c.doc_id = d.doc_id AND c.b = dm.i "
            "LEFT JOIN ntok n ON n.doc_id = d.doc_id "
            "GROUP BY d.doc_id)"
        ),
        "nn AS (SELECT count(*) AS n FROM feat)",
        f"w0 AS (SELECT [{', '.join(['0.0'] * d1)}]::DOUBLE[] AS w)",
    ]
    for t in range(1, iters + 1):
        dot = _dot_sql("f.x", "w.w")
        ctes.append(
            f"s{t} AS (SELECT f.doc_id, f.y, f.x, "
            f"1.0 / (1.0 + exp(-({dot}))) AS s "
            f"FROM feat f CROSS JOIN w{t - 1} w)"
        )
        ctes.append(
            f"g{t} AS (SELECT list(gs ORDER BY k) AS g FROM ("
            f"SELECT k.k AS k, sum((s.s - s.y) * s.x[k.k])"
            f" / (SELECT n FROM nn) AS gs "
            f"FROM s{t} s CROSS JOIN (SELECT unnest(range(1, {d1 + 1}))"
            f" AS k) k GROUP BY k.k) t)"
        )
        ctes.append(
            f"w{t} AS (SELECT list_transform(range(1, {d1 + 1}), "
            f"k -> w.w[k] - {lr!r} * g.g[k]) AS w "
            f"FROM w{t - 1} w CROSS JOIN g{t} g)"
        )
    dot_f = _dot_sql("f.x", "w.w")
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT f.doc_id,
    round(1.0 / (1.0 + exp(-({dot_f}))), 6) AS quality_score
FROM feat f CROSS JOIN w{iters} w
"""


def ann_topk_sql(k: int, n_queries: int = 5) -> str:
    cos = _cosine_sql("q.v", "e.v")
    return f"""
WITH e AS MATERIALIZED (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
q AS (SELECT * FROM e ORDER BY vec_id LIMIT {n_queries}),
scored AS (
    SELECT q.vec_id AS query_id, e.vec_id AS vec_id, {cos} AS cosine
    FROM q JOIN e ON e.vec_id != q.vec_id
)
SELECT query_id, vec_id, round(cosine, 6) AS cosine,
    CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id
    ) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {k}
"""


# ---------------------------------------------------------------------------
# text stats (stages/textstats.py mirror)
# ---------------------------------------------------------------------------

def text_stats_sql() -> str:
    lang_conds = []
    hits = {}
    for lang in sorted(STOPWORDS):
        words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        hits[lang] = (
            f"len(list_filter(list_transform(toks, t -> lower(t)), "
            f"t -> list_contains([{words}], t)))"
        )
    langs = sorted(STOPWORDS)
    case_parts = []
    for i, lang in enumerate(langs):
        conds = [f"h_{lang} > 0"]
        for other in langs[i + 1 :]:
            conds.append(f"h_{lang} >= h_{other}")
        for prev in langs[:i]:
            conds.append(f"h_{lang} > h_{prev}")
        case_parts.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    lang_case = "CASE " + " ".join(case_parts) + " ELSE 'und' END"
    hit_cols = ", ".join(f"{expr} AS h_{lang}" for lang, expr in hits.items())
    fp = H.fingerprint_sql("list_transform(toks, t -> lower(t))")
    return f"""
WITH base AS (
    SELECT doc_id, coalesce(text, '') AS text,
        list_filter(regexp_split_to_array(trim(coalesce(text, '')), '\\s+'),
                    t -> t != '') AS toks
    FROM documents
),
feats AS (
    SELECT doc_id, text, toks, {hit_cols},
        length(text) AS n_chars,
        len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
        len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
        CASE WHEN len(toks) > 0 THEN
            list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(toks, t -> CAST(length(t) AS BIGINT))),
                (a, b) -> a + b) / len(toks)
            ELSE 0.0 END AS mean_token_len
    FROM base
)
SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS token_count,
    CAST(len(regexp_extract_all(text,
        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\r\\n\\f\\x0b]+')) AS BIGINT)
        AS bpe_token_count,
    CAST(n_chars AS BIGINT) AS n_chars,
    CASE WHEN n_chars = 0 THEN 0.0 ELSE n_alpha / n_chars END AS alpha_ratio,
    CASE WHEN n_chars = 0 THEN 0.0 ELSE n_punct / n_chars END AS punct_ratio,
    mean_token_len,
    CASE WHEN n_chars = 0 THEN 0.0 ELSE
        (n_alpha / n_chars)
        * (1.0 - least((n_punct / n_chars) * 5.0, 1.0))
        * (CASE WHEN mean_token_len >= 3.0 AND mean_token_len <= 10.0
            THEN 1.0 ELSE 0.5 END)
    END AS quality,
    {lang_case} AS lang_pred,
    {fp} AS fingerprint
FROM feats
"""


# ---------------------------------------------------------------------------
# windowed aggregate over events
# ---------------------------------------------------------------------------

def events_hourly_sql() -> str:
    return """
SELECT user_id,
    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour_window,
    count(*) AS n_events,
    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events
GROUP BY user_id, hour_window
"""


# ---------------------------------------------------------------------------
# E1 label evaluation (pipelines/evaluate.py; accuracy_from_labels.py:294-365)
# ---------------------------------------------------------------------------

def label_accuracy_sql(pairs_sql: str) -> str:
    return f"""
WITH pairs AS MATERIALIZED ({pairs_sql}),
top1 AS (
    SELECT unique_id_r, unique_id_l FROM pairs
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY unique_id_r ORDER BY match_weight DESC, unique_id_l
    ) = 1
),
labels AS (
    SELECT 'm' || CAST(c_custkey AS VARCHAR) AS unique_id,
           'c' || CAST(c_custkey AS VARCHAR) AS correct_unique_id
    FROM customer WHERE c_custkey % 3 != 0
)
SELECT
    CAST(sum(CASE WHEN t.unique_id_l = l.correct_unique_id THEN 1 ELSE 0 END) AS BIGINT) AS correct,
    CAST(sum(CASE WHEN t.unique_id_l IS NOT NULL AND t.unique_id_l != l.correct_unique_id THEN 1 ELSE 0 END) AS BIGINT) AS incorrect,
    CAST(sum(CASE WHEN t.unique_id_l IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing
FROM labels l LEFT JOIN top1 t ON l.unique_id = t.unique_id_r
"""


# ---------------------------------------------------------------------------
# Second pass: improve_predictions oracle (stages/rescore.py mirror)
# ---------------------------------------------------------------------------

def improve_pairs_sql(
    pairs_sql: str,
    cleaned_union_sql: str,
    match_weight_threshold: float = -20.0,
    top_n: int = 5,
) -> str:
    """mw_adjustment / final weights of the second pass, mirroring
    rescore_group term-for-term (sums iterate sorted keys in both systems so
    doubles are bit-identical). Output: unique_id_r, unique_id_l,
    mw_adjustment, match_weight_original, match_weight."""
    sep = "chr(31)"
    return f"""
WITH pairs AS MATERIALIZED ({pairs_sql}),
cleaned AS MATERIALIZED ({cleaned_union_sql}),
good AS (SELECT * FROM pairs WHERE match_weight > {match_weight_threshold!r}),
topn AS (
    SELECT * FROM good
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY unique_id_r ORDER BY match_weight DESC, unique_id_l DESC
    ) <= {top_n}
),
with_addr AS (
    SELECT t.unique_id_r, t.unique_id_l, t.match_weight,
        cl.original_address_concat AS orig_l, cl.postcode AS pc_l,
        cm2.original_address_concat AS orig_r, cm2.postcode AS pc_r,
        coalesce(list_transform(cm2.common_end_tokens_hist, e -> e.tok),
                 CAST([] AS VARCHAR[])) AS cet
    FROM topn t
    JOIN cleaned cl ON t.unique_id_l = cl.unique_id
    JOIN cleaned cm2 ON t.unique_id_r = cm2.unique_id
),
r_side AS (
    SELECT DISTINCT unique_id_r,
        regexp_split_to_array(upper(trim(coalesce(orig_r, ''))), '\\s+') AS rt0,
        list_reverse(rt0) AS rv0,
        CASE WHEN len(rv0) > 0 AND list_contains(cet, rv0[1])
            THEN rv0[2:] ELSE rv0 END AS rv1,
        CASE WHEN len(rv1) > 0 AND list_contains(cet, rv1[1])
            THEN rv1[2:] ELSE rv1 END AS rv2,
        array_to_string(list_reverse(rv2), ' ') AS stripped_r,
        regexp_split_to_array(
            trim(concat_ws(' ', stripped_r, pc_r)), '\\s+') AS tokens_r,
        list_transform(range(1, len(tokens_r)),
            i -> tokens_r[i] || {sep} || tokens_r[i+1]) AS bigrams_r
    FROM with_addr
),
l_tok AS (
    SELECT w.*,
        regexp_split_to_array(
            trim(concat_ws(' ', upper(trim(coalesce(orig_l, ''))), pc_l)),
            '\\s+') AS tokens_l
    FROM with_addr w
),
block AS (
    SELECT unique_id_r,
        flatten(array_agg(tokens_l
            ORDER BY match_weight DESC, unique_id_l DESC)) AS flat
    FROM l_tok GROUP BY unique_id_r
),
per_pair AS (
    SELECT l.*, b.flat,
        list_transform(range(1, len(b.flat)),
            i -> b.flat[i] || {sep} || b.flat[i+1]) AS flat_bg,
        r.tokens_r, r.bigrams_r,
        list_transform(range(1, len(l.tokens_l)),
            i -> l.tokens_l[i] || {sep} || l.tokens_l[i+1]) AS bigrams_l
    FROM l_tok l
    JOIN block b USING (unique_id_r)
    JOIN r_side r USING (unique_id_r)
),
calc AS (
    SELECT unique_id_r, unique_id_l, match_weight AS match_weight_original,
        list_sort(list_distinct(flat)) AS dt,
        list_sort(list_distinct(flat_bg)) AS dbg,
        -- overlapping tokens: in messy AND this candidate; 3 * sum 1/c^2
        coalesce(list_aggregate(list_transform(
            list_filter(dt, t -> list_contains(tokens_r, t)
                              AND list_contains(tokens_l, t)),
            t -> 1.0 / (len(list_filter(flat, y -> y = t))
                        * len(list_filter(flat, y -> y = t)))), 'sum'), 0.0)
            AS ov_sum,
        -- tokens elsewhere: distinct flat tokens in messy but not this l
        len(list_filter(dt, t -> list_contains(tokens_r, t)
                             AND NOT list_contains(tokens_l, t)))
            AS n_elsewhere,
        len(list_filter(tokens_l, t -> NOT list_contains(tokens_r, t)))
            AS n_missing,
        -- bigram maps with unigram-coverage filter (filtered variants)
        coalesce(list_aggregate(list_transform(
            list_filter(dbg, bg ->
                list_contains(bigrams_r, bg) AND list_contains(bigrams_l, bg)
                AND NOT (
                    list_contains(tokens_r, split_part(bg, {sep}, 1))
                    AND list_contains(tokens_l, split_part(bg, {sep}, 1))
                    AND len(list_filter(flat, y -> y = split_part(bg, {sep}, 1)))
                        <= len(list_filter(flat_bg, y -> y = bg))
                    AND list_contains(tokens_r, split_part(bg, {sep}, 2))
                    AND list_contains(tokens_l, split_part(bg, {sep}, 2))
                    AND len(list_filter(flat, y -> y = split_part(bg, {sep}, 2)))
                        <= len(list_filter(flat_bg, y -> y = bg))
                )),
            bg -> 1.0 / (len(list_filter(flat_bg, y -> y = bg))
                         * len(list_filter(flat_bg, y -> y = bg)))), 'sum'), 0.0)
            AS ov_bg_sum,
        len(list_filter(dbg, bg ->
            list_contains(bigrams_r, bg) AND NOT list_contains(bigrams_l, bg)
            AND NOT (
                list_contains(tokens_r, split_part(bg, {sep}, 1))
                AND NOT list_contains(tokens_l, split_part(bg, {sep}, 1))
                AND len(list_filter(flat, y -> y = split_part(bg, {sep}, 1)))
                    <= len(list_filter(flat_bg, y -> y = bg))
                AND list_contains(tokens_r, split_part(bg, {sep}, 2))
                AND NOT list_contains(tokens_l, split_part(bg, {sep}, 2))
                AND len(list_filter(flat, y -> y = split_part(bg, {sep}, 2)))
                    <= len(list_filter(flat_bg, y -> y = bg))
            ))) AS n_bg_elsewhere
    FROM per_pair
)
SELECT unique_id_r, unique_id_l,
    ((((3.0 * ov_sum) - (1.5 * n_elsewhere)) - (0.1 * n_missing))
        + (3.0 * ov_bg_sum)) - (1.5 * n_bg_elsewhere) AS mw_adjustment,
    match_weight_original,
    match_weight_original + mw_adjustment AS match_weight
FROM calc
"""


# ---------------------------------------------------------------------------
# Tuning reward objective (pipelines/tune.py mirror; reference
# scripts/improve_parameters_using_gradient_descent.py:383-470)
# ---------------------------------------------------------------------------

def tune_rewards_sql(
    improve_sql: str,
    indeterminate_cap: float = 0.2,
    no_true_penalty: float = -0.2,
) -> str:
    """Per-labelled-record reward over min-max-normalized improved match
    weights: the objective the SPSA multiplier tuner maximizes. Mirrors
    tune.record_rewards expression-for-expression (same normalization
    doubles, same DESC-weight/ASC-id tie-break as the Python sort key)."""
    return f"""
WITH improved AS MATERIALIZED ({improve_sql}),
bounds AS (SELECT min(match_weight) AS mn, max(match_weight) AS mx FROM improved),
labels AS (
    SELECT 'm' || CAST(c_custkey AS VARCHAR) AS unique_id,
           'c' || CAST(c_custkey AS VARCHAR) AS correct_unique_id
    FROM customer WHERE c_custkey % 3 != 0
),
norm AS (
    SELECT i.unique_id_r, i.unique_id_l,
        CASE WHEN b.mx <> b.mn THEN (i.match_weight - b.mn) / (b.mx - b.mn)
             ELSE 0.0 END AS w
    FROM improved i CROSS JOIN bounds b
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY unique_id_r ORDER BY w DESC, unique_id_l ASC) AS rn
    FROM norm
),
per AS (
    SELECT l.unique_id AS unique_id_r, l.correct_unique_id,
        max(CASE WHEN r.rn = 1 THEN r.w END) AS best_w,
        max(CASE WHEN r.rn = 1 THEN r.unique_id_l END) AS best_id,
        max(CASE WHEN r.rn = 2 THEN r.w END) AS second_w,
        max(CASE WHEN r.unique_id_l = l.correct_unique_id THEN r.w END) AS true_w
    FROM labels l JOIN ranked r ON r.unique_id_r = l.unique_id
    GROUP BY l.unique_id, l.correct_unique_id
),
rew AS (
    SELECT unique_id_r,
        CASE WHEN true_w IS NULL THEN {no_true_penalty!r}
             WHEN best_id <> correct_unique_id THEN true_w - best_w
             WHEN second_w IS NULL THEN {indeterminate_cap!r}
             ELSE least(best_w - second_w, {indeterminate_cap!r}) END AS reward
    FROM per
)
SELECT unique_id_r, reward,
    CASE WHEN reward = 0 THEN 'indistinguishable true positive'
         WHEN reward > 0 THEN 'true positive'
         ELSE 'false positive' END AS truth_status
FROM rew
"""


def embedding_lsh_sql(
    threshold: float = 0.9,
    bands: int = 8,
    sig_slack_sd: float = 3.0,
    dim: int = 64,
    seed: int = 0xE5D0_57A1,
) -> str:
    """Exact mirror of stages/dedup.embedding_lsh_pairs over the
    __ray_entry__ augmented input (every vec_id % 5 == 0 gains a
    hash-perturbed near-duplicate at id+1e6; the perturbation is an
    integer-hash uniform so numpy and SQL compute it bit-identically).

    The LSH internals ARE relational: band collision is slice equality
    (the engine's splitmix64 bucket key is a bijection of the slice, so it
    never changes collision sets), salting preserves meet-exactly-once,
    and the Hamming prefilter is integer. Sign bits come from the same
    seeded hyperplane matrix embedded as DOUBLE literals; float-sum orders
    differ from numpy at ~1e-15, far below the sign/threshold margins of
    the synth embeddings (same tolerance argument as ivf_topk_sql)."""
    import numpy as np

    planes = np.random.default_rng(np.random.PCG64(seed)).standard_normal(
        (dim, 64)
    )
    p_flip = float(np.arccos(np.clip(threshold, -1.0, 1.0)) / np.pi)
    max_h = int(
        np.ceil(
            64 * p_flip + sig_slack_sd * np.sqrt(64 * p_flip * (1 - p_flip))
        )
    )
    width = 64 // bands
    wmask = (1 << width) - 1

    sig_terms = []
    for h in range(64):
        lit = "[" + ", ".join(repr(float(x)) for x in planes[:, h]) + "]"
        sig_terms.append(
            f"CASE WHEN list_inner_product(vn, {lit}) >= 0 "
            f"THEN CAST('{1 << h}' AS HUGEINT) ELSE CAST(0 AS HUGEINT) END"
        )
    sig_expr = "(" + "\n + ".join(sig_terms) + ")"

    band_conds = " OR ".join(
        f"((a.sig >> {b * width}) & CAST({wmask} AS UBIGINT)) = "
        f"((b.sig >> {b * width}) & CAST({wmask} AS UBIGINT))"
        for b in range(bands)
    )

    pert_u = (
        f"(CAST((((vec_id * {dim} + j + 1) * 2654435761) % 4294967296) "
        f"% 2001 - 1000 AS DOUBLE) / 1000.0)"
    )
    nrm = (
        "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(v, t -> t * t)), (p, q) -> p + q))"
    )
    return f"""
WITH base AS MATERIALIZED (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
pert AS (
    SELECT vec_id + 1000000 AS vec_id,
        list_transform(range({dim}), j -> v[j + 1] + 0.03 * nrm * {pert_u}) AS v
    FROM (SELECT vec_id, v, {nrm} AS nrm FROM base WHERE vec_id % 5 = 0) s
),
aug AS MATERIALIZED (SELECT * FROM base UNION ALL SELECT * FROM pert),
normed AS MATERIALIZED (SELECT vec_id, {_normalize_sql('v')} AS vn FROM aug),
sigs AS MATERIALIZED (
    SELECT vec_id, vn, CAST({sig_expr} AS UBIGINT) AS sig FROM normed
),
cand AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.vn AS va, b.vn AS vb
    FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
    WHERE bit_count(xor(a.sig, b.sig)) <= {max_h} AND ({band_conds})
)
SELECT id_a, id_b, round(cos, 6) AS cosine
FROM (SELECT id_a, id_b, {_dot_sql('va', 'vb')} AS cos FROM cand) t
WHERE cos >= {threshold!r}
"""


# ---------------------------------------------------------------------------
# Gopher-style repetition stats (stages/repetition.py)
# ---------------------------------------------------------------------------

def repetition_sql() -> str:
    """Mirrors repetition.repetition_stats_table expression-for-expression:
    same explicit whitespace class, same line-strip set, same
    integer-ratio float arithmetic (IEEE division is correctly rounded in
    both engines, so values compare bit-exactly)."""
    from uk_address_matcher_ray.stages.repetition import DEFAULT_THRESHOLDS

    th = DEFAULT_THRESHOLDS
    # RE2 patterns as SQL literals: DuckDB regular strings pass backslash
    # sequences through to RE2 untouched.
    nonws = r"[^ \t\r\n\f\x0b]+"
    strip = "' ' || chr(9) || chr(13) || chr(12) || chr(11)"
    return f"""
WITH base AS (
    SELECT doc_id, coalesce(text, '') AS text,
        regexp_extract_all(coalesce(text, ''), '{nonws}') AS toks
    FROM documents
),
tok AS MATERIALIZED (
    SELECT doc_id, toks, len(toks) AS nw,
        CASE WHEN len(toks) = 0 THEN 0
             ELSE length(list_aggregate(toks, 'string_agg', '')) END AS wchars
    FROM base
),
g2 AS (
    SELECT doc_id,
        unnest(list_transform(range(1, nw), i -> toks[i] || ' ' || toks[i+1])) AS g
    FROM tok WHERE nw >= 2
),
top2 AS (
    SELECT doc_id, max(cnt * (length(g) - 1)) AS topcov
    FROM (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY 1, 2)
    GROUP BY 1
),
g3 AS MATERIALIZED (
    SELECT doc_id, unnest(range(1, nw - 1)) AS s,
        unnest(list_transform(range(1, nw - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
    FROM tok WHERE nw >= 3
),
g3dup AS (
    SELECT doc_id, g
    FROM (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2)
    WHERE c >= 2
),
dupstarts AS (SELECT g3.doc_id, g3.s FROM g3 JOIN g3dup USING (doc_id, g)),
cov AS (
    SELECT DISTINCT doc_id, pos FROM (
        SELECT doc_id, s AS pos FROM dupstarts
        UNION ALL SELECT doc_id, s + 1 FROM dupstarts
        UNION ALL SELECT doc_id, s + 2 FROM dupstarts)
),
covch AS (
    SELECT cov.doc_id, CAST(sum(length(t.toks[cov.pos])) AS BIGINT) AS c
    FROM cov JOIN tok t USING (doc_id) GROUP BY 1
),
ln AS (
    SELECT doc_id, l FROM (
        SELECT doc_id, unnest(string_split(coalesce(text, ''), chr(10))) AS l
        FROM base)
    WHERE trim(l, {strip}) != ''
),
lagg AS (
    SELECT doc_id,
        CAST(sum(cnt) AS BIGINT) AS nl,
        count(*) AS ndist,
        CAST(sum(length(l) * cnt) AS BIGINT) AS lchars,
        CAST(sum(CASE WHEN cnt >= 2 THEN length(l) * cnt ELSE 0 END) AS BIGINT)
            AS dupchars
    FROM (SELECT doc_id, l, count(*) AS cnt FROM ln GROUP BY 1, 2)
    GROUP BY 1
),
stats AS (
    SELECT t.doc_id,
        CAST(t.nw AS BIGINT) AS n_words,
        coalesce(lagg.nl, 0) AS n_lines,
        CASE WHEN coalesce(lagg.nl, 0) = 0 THEN 0.0
             ELSE 1.0 - CAST(lagg.ndist AS DOUBLE) / lagg.nl END AS dup_line_frac,
        CASE WHEN coalesce(lagg.lchars, 0) = 0 THEN 0.0
             ELSE CAST(lagg.dupchars AS DOUBLE) / lagg.lchars END
            AS dup_line_char_frac,
        CASE WHEN t.wchars = 0 OR top2.topcov IS NULL THEN 0.0
             ELSE CAST(top2.topcov AS DOUBLE) / t.wchars END
            AS top_2gram_char_frac,
        CASE WHEN t.wchars = 0 OR covch.c IS NULL THEN 0.0
             ELSE CAST(covch.c AS DOUBLE) / t.wchars END AS dup_3gram_char_frac
    FROM tok t
    LEFT JOIN lagg USING (doc_id)
    LEFT JOIN top2 USING (doc_id)
    LEFT JOIN covch USING (doc_id)
)
SELECT *,
    (dup_line_frac <= {th['dup_line_frac']!r}
     AND dup_line_char_frac <= {th['dup_line_char_frac']!r}
     AND top_2gram_char_frac <= {th['top_2gram_char_frac']!r}
     AND dup_3gram_char_frac <= {th['dup_3gram_char_frac']!r}) AS keep
FROM stats
"""


# ---------------------------------------------------------------------------
# Image perceptual hashing (stages/imagehash.py)
# ---------------------------------------------------------------------------

_DHASH_CTE = """
WITH ks AS (
    SELECT DISTINCT c_custkey AS k FROM customer WHERE c_custkey % 3 != 0
),
gray AS (
    SELECT k, (y.r * 8) // 16 AS cy, (x.r * 9) // 16 AS cx,
           (299 * (((k // 2) * 37 + y.r * 31 + x.r * 13 + 0 * 101
                    + CASE WHEN k % 2 = 1 AND y.r < 2 AND x.r < 2
                           THEN 120 ELSE 0 END) % 256)
            + 587 * (((k // 2) * 37 + y.r * 31 + x.r * 13 + 1 * 101) % 256)
            + 114 * (((k // 2) * 37 + y.r * 31 + x.r * 13 + 2 * 101) % 256)
           ) // 1000 AS g
    FROM ks, range(16) y(r), range(16) x(r)
),
cells AS (
    SELECT k, cy, cx, SUM(g) // COUNT(*) AS m FROM gray GROUP BY 1, 2, 3
),
bits AS (
    SELECT a.k, a.cy * 8 + a.cx AS idx,
           CASE WHEN a.m > b.m THEN 1 ELSE 0 END AS bit
    FROM cells a JOIN cells b ON a.k = b.k AND a.cy = b.cy AND b.cx = a.cx + 1
    WHERE a.cx < 8
),
dh AS (
    SELECT k,
           CAST(SUM(CAST(bit AS HUGEINT) * (1::HUGEINT << idx)) AS UBIGINT)
               AS dhash
    FROM bits GROUP BY k
)
"""


def image_dhash_sql() -> str:
    """Mirror of the image_dhash query: the Ray side synthesizes one 16x16
    PPM per messy record — pixel(c) = ((k//2)*37 + y*31 + x*13 + c*101
    + [k odd & y<2 & x<2 & c=0]*120) % 256 (odd k = even k's image with a
    perturbed top-left red patch, so (2m, 2m+1) are designed near-dups) —
    DECODES it with the pure-numpy decoder and computes the module
    docstring's integer-exact dHash. Every step (luma //1000, index
    cells, mean //, gradient bits, bit sum) is restated here verbatim in
    integer SQL, so the UBIGINT hashes are identical."""
    return (
        _DHASH_CTE
        + """
SELECT 'm' || CAST(k AS VARCHAR) AS media_id, dhash FROM dh
"""
    )


def image_near_dup_sql(max_hamming: int = 3) -> str:
    """Mirror of image_near_dup_pairs: brute-force pair join over the
    recomputed dHashes — exact because the engine's banded join is exact
    for max_hamming < bands (stages/dedup.hamming_pairs pigeonhole
    argument). String ids compare lexicographically on both sides."""
    return (
        _DHASH_CTE
        + f"""
, named AS (
    SELECT 'm' || CAST(k AS VARCHAR) AS mid, dhash FROM dh
)
SELECT least(a.mid, b.mid) AS id_a,
       greatest(a.mid, b.mid) AS id_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
FROM named a JOIN named b ON a.mid < b.mid
WHERE bit_count(xor(a.dhash, b.dhash)) <= {max_hamming}
"""
    )


def media_resize_sql(out_h: int = 10, out_w: int = 7, in_h: int = 16, in_w: int = 16) -> str:
    """Mirror of media_resize: the Ray side synthesizes media_decode's 16x16
    PPM (pixel = (k*7 + y*31 + x*13 + c*101) % 256), DECODES it and resizes
    with multimodal.resize_bilinear. The oracle restates the resize's
    documented expression shape line by line — every op one IEEE double in
    the same association — so the rounded pixels are identical."""

    def pix(yy: str, xx: str) -> str:
        return (
            f"CAST((k * 7 + ({yy}) * 31 + ({xx}) * 13 + c.r * 101) % 256"
            " AS DOUBLE)"
        )

    t1 = f"((1 - fx) * {pix('y0', 'x0')} + fx * {pix('y0', 'x0 + 1')})"
    t2 = f"((1 - fx) * {pix('y0 + 1', 'x0')} + fx * {pix('y0 + 1', 'x0 + 1')})"
    return f"""
WITH ks AS (
    SELECT DISTINCT c_custkey AS k FROM customer WHERE c_custkey % 3 != 0
),
oy AS (
    SELECT t.r AS j,
           LEAST(GREATEST((t.r + 0.5) * ({in_h}.0 / {out_h}.0) - 0.5, 0.0),
                 {in_h - 1}.0) AS syc
    FROM range({out_h}) t(r)
),
oyi AS (
    SELECT j, CAST(LEAST(FLOOR(syc), {in_h - 2}.0) AS BIGINT) AS y0,
           syc - CAST(LEAST(FLOOR(syc), {in_h - 2}.0) AS BIGINT) AS fy
    FROM oy
),
ox AS (
    SELECT t.r AS i,
           LEAST(GREATEST((t.r + 0.5) * ({in_w}.0 / {out_w}.0) - 0.5, 0.0),
                 {in_w - 1}.0) AS sxc
    FROM range({out_w}) t(r)
),
oxi AS (
    SELECT i, CAST(LEAST(FLOOR(sxc), {in_w - 2}.0) AS BIGINT) AS x0,
           sxc - CAST(LEAST(FLOOR(sxc), {in_w - 2}.0) AS BIGINT) AS fx
    FROM ox
),
vals AS (
    SELECT k, j, i, c.r AS c,
           CAST(LEAST(255.0, GREATEST(0.0,
               FLOOR(((1 - fy) * {t1} + fy * {t2}) + 0.5))) AS INT) AS px
    FROM ks, oyi, oxi, range(3) c(r)
)
SELECT 'm' || CAST(k AS VARCHAR) AS media_id,
       list(px ORDER BY j, i, c) AS pixels
FROM vals GROUP BY k
"""


def audio_resample_sql(out_rate: int = 5000, in_rate: int = 8000) -> str:
    """Mirror of audio_resample: the Ray side synthesizes audio_power's
    16-bit PCM WAVs (sample(j) = ((k*31 + j*17) % 4096) - 2048, zeroed on
    every third 256-window, n = 1024 + (k%4)*256 @8kHz), decodes raw and
    resamples channel 0 to out_rate with resample_linear's documented
    IEEE expression contract — restated here line by line."""

    def sample(j: str) -> str:
        return (
            f"CAST(CASE WHEN (({j}) // 256) % 3 = 2 THEN 0"
            f" ELSE ((k * 31 + ({j}) * 17) % 4096) - 2048 END AS DOUBLE)"
        )

    return f"""
WITH ks AS (
    SELECT DISTINCT c_custkey AS k FROM customer WHERE c_custkey % 3 != 0
),
prm AS (
    SELECT k, 1024 + (k % 4) * 256 AS n,
           (1024 + (k % 4) * 256) * {out_rate} // {in_rate} AS out_n
    FROM ks
),
idx AS (
    SELECT k, n, out_n, i.r AS i
    FROM prm, range(2048) i(r) WHERE i.r < out_n
),
sc AS (
    SELECT k, n, i,
           LEAST(GREATEST((i + 0.5) * (CAST(n AS DOUBLE) / out_n) - 0.5,
                          0.0), CAST(n - 1 AS DOUBLE)) AS s
    FROM idx
),
ii AS (
    SELECT k, n, i,
           CAST(LEAST(FLOOR(s), CAST(n - 2 AS DOUBLE)) AS BIGINT) AS i0,
           s - CAST(LEAST(FLOOR(s), CAST(n - 2 AS DOUBLE)) AS BIGINT) AS f
    FROM sc
),
v AS (
    SELECT k, i,
           CAST(FLOOR(((1 - f) * {sample('i0')} + f * {sample('i0 + 1')})
                      + 0.5) AS INT) AS px
    FROM ii
)
SELECT 'm' || CAST(k AS VARCHAR) AS media_id,
       CAST({out_rate} AS INT) AS out_rate,
       list(px ORDER BY i) AS samples
FROM v GROUP BY k
"""
