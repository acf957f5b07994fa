"""Arrow schemas for the engine's logical tables (SURVEY.md §1).

The cleaned-feature schema mirrors the reference's frozen output
(cleaning_steps.py:451-481, tests/test_data/one_clean_row_downing_street.parquet)
with the map<struct,uint64> histograms re-encoded as sorted
list<struct<tok,rel_freq,count>> (SURVEY.md §1.4).
"""

from __future__ import annotations

import pyarrow as pa

HIST_TYPE = pa.list_(
    pa.struct(
        [
            pa.field("tok", pa.string()),
            pa.field("rel_freq", pa.float64()),
            pa.field("count", pa.int64()),
        ]
    )
)

# Raw address-record contract (readme.md:24-31): extra columns pass through.
ADDRESS_FIELDS = [
    pa.field("unique_id", pa.string()),
    pa.field("address_concat", pa.string()),
    pa.field("postcode", pa.string()),
]

# Common-Crawl-style web-page input (BASELINE.json input_hint).
WEB_PAGE_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# Cleaned/feature table: fixed leading columns in the reference's order;
# any retained extra input columns follow.
CLEANED_FIELDS = [
    pa.field("unique_id", pa.string()),
    pa.field("numeric_token_1", pa.string()),
    pa.field("numeric_token_2", pa.string()),
    pa.field("numeric_token_3", pa.string()),
    pa.field("token_rel_freq_arr_hist", HIST_TYPE),
    pa.field("common_end_tokens_hist", HIST_TYPE),
    pa.field("postcode", pa.string()),
    pa.field("original_address_concat", pa.string()),
    pa.field("flat_positional", pa.string()),
    pa.field("flat_letter", pa.string()),
    pa.field("unusual_tokens_arr", pa.list_(pa.string())),
    pa.field("very_unusual_tokens_arr", pa.list_(pa.string())),
    pa.field("extremely_unusual_tokens_arr", pa.list_(pa.string())),
    pa.field("address_without_numbers", pa.string()),
]

CLEANED_SCHEMA = pa.schema(CLEANED_FIELDS)
CLEANED_COLUMN_NAMES = [f.name for f in CLEANED_FIELDS]
