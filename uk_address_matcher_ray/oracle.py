"""DuckDB oracle SQL for the cleaning chain and TF builders.

Renders the reference's cleaning queue (cleaning_pipelines.py:38-65) as
self-contained DuckDB SQL. Used two ways:

1. tests/test_cleaning_oracle.py runs it next to the Ray engine on the same
   rows and asserts byte-identical output (SURVEY.md §5 differential plan);
2. ``__ray_entry__.oracle_sql()`` embeds it so the driver can cross-check the
   Ray pipelines against DuckDB at sf=0.01.

Fidelity notes (verified empirically; see functions/text.py):

* The reference's ``standarise_num_dash_num`` and ``remove_repeated_tokens``
  regexes are invalid RE2; DuckDB regexp_replace silently no-ops on invalid
  patterns, so both steps are runtime no-ops and are omitted here.
* DuckDB 1.0 cannot aggregate struct histograms (the reference pins 1.2.1),
  so the map<struct,uint64> histograms are emulated as sorted
  list<struct<tok,rel_freq,count>> — exactly the engine's encoding.
* The reference's standalone TF builders (cleaning_pipelines.py:183-239) run
  ``parse_out_numbers`` on relations that lack the ``flat_letter`` column it
  references and would not bind; this engine defines T1/T4/T5 over the full
  cleaning queue instead (documented deviation).
"""

from __future__ import annotations

# C4 nested regex chain (regexes.py:4-160, minus the two invalid-RE2 no-ops;
# move_flat_to_front rewrites '\1 \2' in original order — kept for fidelity).
_FIRST_PASS = (
    "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "regexp_replace(regexp_replace(regexp_replace("
    "address_concat,"
    " '[,.]', ' ', 'g'),"
    " e'\\'', '', 'g'),"
    " '\\s+', ' ', 'g'),"
    " '/', '-', 'g'),"
    " '\\b([A-Za-z])\\s*(\\d+)\\b', '\\1 \\2', 'g'),"
    " '(\\d{1,4})[[:punct:]\\s]([A-Za-z])\\s', '\\1\\2 ', 'g'),"
    " '\\b(FLAT \\d+[A-Z]?)\\s+(.*)', '\\1 \\2', 'g'))"
)

_NUMERIC_RE = "\\b(\\d{1,5}-\\d{1,5}|[A-Za-z]?\\d{1,5}[A-Za-z]?)\\b"


def clean_core_ctes(input_sql: str) -> str:
    """CTE chain c1..c11 mirroring QUEUE_PRE_TF (cleaning_pipelines.py:38-50).

    ``input_sql`` must yield (unique_id, address_concat, postcode [, extras]).
    The final CTE ``c11`` carries: the cleaned columns plus
    address_without_numbers_tokenised.
    """
    return f"""
__in AS ({input_sql}),
c1 AS (
    SELECT * EXCLUDE (address_concat, postcode),
        trim(address_concat) AS address_concat, trim(postcode) AS postcode
    FROM __in
),
c2 AS (  -- canonicalise_postcode BEFORE upper (reference quirk)
    SELECT * EXCLUDE (postcode),
        regexp_replace(postcode,
            '^([A-Z]{{1,2}}\\d[A-Z\\d]?|GIR)\\s*(\\d[A-Z]{{2}})$', '\\1 \\2'
        ) AS postcode
    FROM c1
),
c3 AS (
    SELECT * EXCLUDE (address_concat, postcode),
        upper(address_concat) AS address_concat, upper(postcode) AS postcode
    FROM c2
),
c4 AS (
    SELECT * EXCLUDE (address_concat), {_FIRST_PASS} AS address_concat FROM c3
),
c5 AS (
    SELECT * EXCLUDE (address_concat, __t),
        CASE
            WHEN array_length(__t) >= 2 AND __t[-1] = __t[-2]
                THEN array_to_string(__t[:-2], ' ')
            WHEN array_length(__t) >= 4 AND __t[-4] = __t[-2] AND __t[-3] = __t[-1]
                THEN array_to_string(__t[:-3], ' ')
            ELSE address_concat
        END AS address_concat
    FROM (SELECT *, string_split(address_concat, ' ') AS __t FROM c4)
),
c6 AS (SELECT *, address_concat AS original_address_concat FROM c5),
c7 AS (
    SELECT * EXCLUDE (__fp, __fl, __ll, __fn),
        NULLIF(__fp, '') AS flat_positional,
        NULLIF(COALESCE(NULLIF(__fl, ''), NULLIF(__ll, ''),
            CASE WHEN LENGTH(__fn) <= 4 THEN __fn ELSE NULL END), '') AS flat_letter
    FROM (
        SELECT *,
            regexp_extract(address_concat,
                '\\b(BASEMENT|GROUND FLOOR|FIRST FLOOR|SECOND FLOOR|THIRD FLOOR|TOP FLOOR|GARDEN)\\b',
                1) AS __fp,
            regexp_extract(address_concat, '\\b\\d{{0,4}}([A-Za-z])\\b', 1) AS __fl,
            regexp_extract(address_concat, '^\\s*\\d+([A-Za-z])\\b', 1) AS __ll,
            regexp_extract(address_concat,
                '\\b(FLAT|UNIT|APARTMENT)\\s+(\\S*\\d\\S*)\\s+\\S*\\d\\S*\\b',
                1) AS __fn
        FROM c6
    )
),
c8 AS (
    SELECT * EXCLUDE (address_concat),
        regexp_replace(address_concat, '{_NUMERIC_RE}', '', 'g')
            AS address_without_numbers,
        CASE WHEN flat_letter IS NOT NULL AND flat_letter ~ '^\\d+$'
            THEN regexp_extract_all(address_concat, '{_NUMERIC_RE}')[2:]
            ELSE regexp_extract_all(address_concat, '{_NUMERIC_RE}')
        END AS numeric_tokens
    FROM c7
),
c9 AS (
    SELECT * EXCLUDE (address_without_numbers),
        trim(regexp_replace(address_without_numbers, '\\s+', ' ', 'g'))
            AS address_without_numbers
    FROM c8
),
c10 AS (
    SELECT * EXCLUDE (numeric_tokens),
        regexp_extract_all(array_to_string(numeric_tokens, ' '), '\\d+')[1] AS numeric_token_1,
        regexp_extract_all(array_to_string(numeric_tokens, ' '), '\\d+')[2] AS numeric_token_2,
        regexp_extract_all(array_to_string(numeric_tokens, ' '), '\\d+')[3] AS numeric_token_3
    FROM c9
),
c11 AS (
    SELECT *,
        regexp_split_to_array(trim(address_without_numbers), '\\s+')
            AS address_without_numbers_tokenised
    FROM c10
)
"""


# TF over the cleaned table's own address tokens (T2's internal CTE,
# cleaning_steps.py:376-387, applied to the fully cleaned relation).
ON_THE_FLY_TF_SQL = """
SELECT token, count(*) / sum(count(*)) OVER () AS rel_freq
FROM (SELECT unnest(address_without_numbers_tokenised) AS token FROM c11)
GROUP BY token
"""

# Engine-defined on-the-fly end-token list: final address token per record,
# count >= {min_count} (the reference ships a CSV filtered at count > 3000,
# cleaning_steps.py:495-503).
END_TOKENS_SQL = """
SELECT token FROM (
    SELECT list_extract(address_without_numbers_tokenised,
                        len(address_without_numbers_tokenised)) AS token
    FROM c11
)
WHERE token IS NOT NULL AND token != ''
GROUP BY token HAVING count(*) >= {min_count}
"""

# DuckDB 1.0's list_distinct/histogram lack struct support, so dedup uses
# sorted first-occurrence detection instead.
_HIST = """
    CASE WHEN {arr} IS NULL OR len({arr}) = 0 THEN NULL ELSE
        list_filter(
            list_transform(list_sort({arr}), (x, i) ->
                CASE WHEN i = 1 OR list_sort({arr})[i-1] IS DISTINCT FROM x
                    THEN struct_pack(tok := x.tok, rel_freq := x.rel_freq,
                        count := CAST(len(list_filter({arr}, y -> y = x)) AS BIGINT))
                    ELSE NULL END),
            x -> x IS NOT NULL)
    END
"""


def cleaned_features_sql(
    input_sql: str,
    tf_sql: str | None = None,
    end_tokens_sql: str | None = None,
    end_token_min_count: int = 5,
) -> str:
    """Full cleaning-queue oracle -> schema.CLEANED_SCHEMA columns.

    ``tf_sql`` / ``end_tokens_sql`` may reference the CTE ``c11``; defaults
    are the on-the-fly builders above.
    """
    tf_sql = tf_sql or ON_THE_FLY_TF_SQL
    end_tokens_sql = end_tokens_sql or END_TOKENS_SQL.format(
        min_count=end_token_min_count
    )
    return f"""
WITH
{clean_core_ctes(input_sql)},
__tf AS ({tf_sql}),
__end_tokens AS (
    -- COALESCE: with no qualifying tokens array_agg yields NULL, and
    -- list_contains(NULL, x) would NULL the filter predicate and empty
    -- every token array; the engine's semantics are "move nothing"
    SELECT COALESCE(array_agg(token), CAST([] AS VARCHAR[])) AS toks
    FROM ({end_tokens_sql})
),
__exploded AS (
    SELECT unique_id, unnest(address_without_numbers_tokenised) AS token,
        generate_subscripts(address_without_numbers_tokenised, 1) AS token_order
    FROM c11
),
__with_freq AS (
    SELECT e.*, COALESCE(__tf.rel_freq, 5e-5) AS rel_freq
    FROM __exploded e LEFT JOIN __tf ON e.token = __tf.token
),
__tok_arr AS (
    SELECT unique_id,
        list_transform(
            list_zip(array_agg(token ORDER BY unique_id, token_order ASC),
                     array_agg(rel_freq ORDER BY unique_id, token_order ASC)),
            x -> struct_pack(tok := x[1], rel_freq := x[2])
        ) AS token_rel_freq_arr
    FROM __with_freq GROUP BY unique_id
),
t3 AS (
    SELECT d.* EXCLUDE (address_without_numbers_tokenised), r.token_rel_freq_arr
    FROM c11 d INNER JOIN __tok_arr r ON d.unique_id = r.unique_id
),
p1 AS (
    SELECT * EXCLUDE (token_rel_freq_arr, common_end_tokens, toks),
        common_end_tokens,
        list_filter(token_rel_freq_arr,
            (x, i) -> NOT (i > len(token_rel_freq_arr) - 2
                           AND list_contains(toks, x.tok))
        ) AS token_rel_freq_arr
    FROM (
        SELECT *,
            list_filter(token_rel_freq_arr[-3:],
                x -> list_contains(toks, x.tok)) AS common_end_tokens
        FROM t3 CROSS JOIN __end_tokens
    )
),
p2 AS (
    SELECT *,
        list_any_value(list_filter(token_rel_freq_arr, x -> x.rel_freq < 0.001))
            AS first_unusual_token
    FROM p1
),
p3 AS (
    SELECT * EXCLUDE (numeric_token_1, token_rel_freq_arr, first_unusual_token),
        CASE WHEN numeric_token_1 IS NULL THEN first_unusual_token.tok
             ELSE numeric_token_1 END AS numeric_token_1,
        CASE WHEN numeric_token_1 IS NULL
             THEN list_filter(token_rel_freq_arr,
                 x -> coalesce(x.tok != first_unusual_token.tok, true))
             ELSE token_rel_freq_arr END AS token_rel_freq_arr
    FROM p2
),
p4 AS (
    SELECT *,
        list_transform(list_filter(
            list_select(token_rel_freq_arr,
                list_grade_up(list_transform(token_rel_freq_arr, x -> x.rel_freq))),
            x -> x.rel_freq < 1e-4 AND x.rel_freq >= 5e-5), x -> x.tok)
            AS unusual_tokens_arr,
        list_transform(list_filter(
            list_select(token_rel_freq_arr,
                list_grade_up(list_transform(token_rel_freq_arr, x -> x.rel_freq))),
            x -> x.rel_freq < 5e-5 AND x.rel_freq >= 1e-7), x -> x.tok)
            AS very_unusual_tokens_arr,
        list_transform(list_filter(
            list_select(token_rel_freq_arr,
                list_grade_up(list_transform(token_rel_freq_arr, x -> x.rel_freq))),
            x -> x.rel_freq < 1e-7), x -> x.tok)
            AS extremely_unusual_tokens_arr
    FROM p3
)
SELECT
    CAST(unique_id AS VARCHAR) AS unique_id,
    numeric_token_1, numeric_token_2, numeric_token_3,
    {_HIST.format(arr="token_rel_freq_arr")} AS token_rel_freq_arr_hist,
    {_HIST.format(arr="common_end_tokens")} AS common_end_tokens_hist,
    postcode,
    original_address_concat,
    flat_positional, flat_letter,
    unusual_tokens_arr, very_unusual_tokens_arr, extremely_unusual_tokens_arr,
    address_without_numbers
FROM p4
"""


def token_tf_table_sql(input_sql: str) -> str:
    """T1 get_token_frequeny_table over the full queue (cleaning_steps.py:289-323):
    numeric tokens 1-3 plus address tokens, grouped; ties broken by token."""
    return f"""
WITH
{clean_core_ctes(input_sql)},
toks AS (
    SELECT list_concat(
        array_filter([numeric_token_1, numeric_token_2, numeric_token_3],
                     x -> x IS NOT NULL),
        address_without_numbers_tokenised) AS all_tokens
    FROM c11
),
unnested AS (SELECT unnest(all_tokens) AS token FROM toks),
token_counts AS (
    SELECT token, count(*) AS count,
        count(*) / (SELECT count(*) FROM unnested) AS rel_freq
    FROM unnested GROUP BY token
)
SELECT token, rel_freq FROM token_counts ORDER BY count DESC, token
"""


def numeric_tf_table_sql(input_sql: str) -> str:
    """T4 numeric-token term frequencies over the full queue: unnest
    c8.numeric_tokens, group-count (cleaning_pipelines.py:183-217; see module
    docstring for the flat_letter-binding deviation)."""
    return f"""
WITH
{clean_core_ctes(input_sql)},
unnested AS (SELECT unnest(numeric_tokens) AS numeric_token FROM c8)
SELECT numeric_token,
    count(*) / (SELECT count(*) FROM unnested) AS tf_numeric_token
FROM unnested GROUP BY numeric_token
ORDER BY tf_numeric_token DESC, numeric_token
"""
