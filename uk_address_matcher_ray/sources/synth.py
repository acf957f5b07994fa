"""Deterministic labeled address synthesis from the TPC-H ``customer`` table.

Exists in BOTH Python (for Ray pipelines/tests) and SQL (for the driver's
DuckDB oracle) — the two must produce byte-identical tables
(tests/test_synth.py asserts it). Derives a canonical gazetteer row per
customer and a perturbed messy row for 2/3 of customers, so true matches
(m{k} ↔ c{k}) and truth clusters are known.

Everything is keyed on c_custkey modular arithmetic only — no RNG.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import pyarrow as pa

STREETS = [
    "PEPPER ROAD", "HIGH STREET", "STATION ROAD", "CHURCH LANE",
    "MILL LANE", "VICTORIA TERRACE", "QUEENSWAY", "ACACIA AVENUE",
]
CITIES = ["LONDON", "YORK", "LEEDS", "SUDBURY", "BRISTOL", "DERBY"]

# keys >= DISTRICT_SPAN live in a separate "district": street name tokens and
# postcode outward codes carry the district index, so scaled benchmark
# corpora (bench.py replicates the key space by DISTRICT_SPAN offsets) grow
# in SIZE, not match DENSITY — block keys never collide across districts and
# the blocking cross-pair count stays linear in the input. k < DISTRICT_SPAN
# (all driver/oracle paths) is byte-identical to the pre-district synth.
DISTRICT_SPAN = 300_000


def _street(k: int) -> str:
    street = STREETS[k % 8]
    district = k // DISTRICT_SPAN
    if district:
        head, _, rest = street.partition(" ")
        street = f"{head}{district} {rest}"
    return street


def _canonical_parts(k: int) -> Tuple[str, str]:
    n = k % 150 + 1
    letter = chr(65 + k % 5)
    street = _street(k)
    city = CITIES[k % 6]
    flat = f"FLAT {letter} " if k % 4 == 0 else ""
    addr = f"{flat}{n} {street} {city}"
    out = chr(65 + k % 20) + chr(66 + (k // 20) % 6) + str(k % 9 + 1)
    district = k // DISTRICT_SPAN
    if district:
        out = f"{out}Q{district}"
    inw = str((k * 7) % 10) + chr(65 + (k * 3) % 26) + chr(65 + (k * 11) % 26)
    return addr, f"{out} {inw}"


def _messy_parts(k: int) -> Optional[Tuple[str, str]]:
    if k % 3 == 0:
        return None
    addr, pc = _canonical_parts(k)
    n = k % 150 + 1
    street = _street(k)
    city = CITIES[k % 6]
    p = k % 6
    if p == 0:
        return addr.lower(), pc
    if p == 1:
        return f"{n} {street} {city}", pc
    if p == 2:
        return f"{addr} {city}", pc
    if p == 3:
        return addr, pc.replace(" ", "")
    if p == 4:
        return f"{n}, {street}. {city}", pc
    return addr.replace(" ", "  "), pc


def canonical_table(custkeys: List[int]) -> pa.Table:
    rows = [(f"c{k}",) + _canonical_parts(k) for k in sorted(custkeys)]
    return pa.table(
        {
            "unique_id": pa.array([r[0] for r in rows], pa.string()),
            "address_concat": pa.array([r[1] for r in rows], pa.string()),
            "postcode": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def messy_table(custkeys: List[int]) -> pa.Table:
    rows = []
    for k in sorted(custkeys):
        m = _messy_parts(k)
        if m is not None:
            rows.append((f"m{k}", m[0], m[1]))
    return pa.table(
        {
            "unique_id": pa.array([r[0] for r in rows], pa.string()),
            "address_concat": pa.array([r[1] for r in rows], pa.string()),
            "postcode": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def truth_labels(custkeys: List[int]) -> dict:
    """messy unique_id -> canonical unique_id (F6 label shape)."""
    return {f"m{k}": f"c{k}" for k in custkeys if k % 3 != 0}


# ---------------------------------------------------------------------------
# SQL mirror (DuckDB), parameterized by a relation exposing c_custkey.
# ---------------------------------------------------------------------------

_STREETS_SQL = "[" + ", ".join(f"'{s}'" for s in STREETS) + "]"
_CITIES_SQL = "[" + ", ".join(f"'{c}'" for c in CITIES) + "]"

_PARTS_SQL = f"""
SELECT
    k, n, letter, street, city,
    outward || CAST(k % 9 + 1 AS VARCHAR)
        || (CASE WHEN district = 0 THEN '' ELSE 'Q' || CAST(district AS VARCHAR) END)
        || ' '
        || CAST((k * 7) % 10 AS VARCHAR)
        || chr(CAST(65 + (k * 3) % 26 AS INT)) || chr(CAST(65 + (k * 11) % 26 AS INT))
        AS pc,
    (CASE WHEN k % 4 = 0 THEN 'FLAT ' || letter || ' ' ELSE '' END)
        || CAST(n AS VARCHAR) || ' ' || street || ' ' || city
        AS addr
FROM (
    SELECT
        k, n, letter, city, district, outward,
        CASE WHEN district = 0 THEN base_street
             ELSE split_part(base_street, ' ', 1) || CAST(district AS VARCHAR)
                  || ' ' || split_part(base_street, ' ', 2)
        END AS street
    FROM (
        SELECT
            c_custkey AS k,
            c_custkey % 150 + 1 AS n,
            c_custkey // {DISTRICT_SPAN} AS district,
            chr(CAST(65 + c_custkey % 5 AS INT)) AS letter,
            list_extract({_STREETS_SQL}, c_custkey % 8 + 1) AS base_street,
            list_extract({_CITIES_SQL}, c_custkey % 6 + 1) AS city,
            chr(CAST(65 + c_custkey % 20 AS INT))
                || chr(CAST(66 + (c_custkey // 20) % 6 AS INT)) AS outward
        FROM ({{source}})
    )
)
"""


def canonical_sql(source: str = "SELECT c_custkey FROM customer") -> str:
    parts = _PARTS_SQL.format(source=source)
    return f"""
SELECT 'c' || CAST(k AS VARCHAR) AS unique_id, addr AS address_concat, pc AS postcode
FROM ({parts}) ORDER BY k
"""


def messy_sql(source: str = "SELECT c_custkey FROM customer") -> str:
    parts = _PARTS_SQL.format(source=source)
    return f"""
SELECT 'm' || CAST(k AS VARCHAR) AS unique_id,
    CASE k % 6
        WHEN 0 THEN lower(addr)
        WHEN 1 THEN CAST(n AS VARCHAR) || ' ' || street || ' ' || city
        WHEN 2 THEN addr || ' ' || city
        WHEN 3 THEN addr
        WHEN 4 THEN CAST(n AS VARCHAR) || ', ' || street || '. ' || city
        ELSE replace(addr, ' ', '  ')
    END AS address_concat,
    CASE k % 6 WHEN 3 THEN replace(pc, ' ', '') ELSE pc END AS postcode
FROM ({parts})
WHERE k % 3 != 0
ORDER BY k
"""
