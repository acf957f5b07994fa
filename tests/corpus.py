"""Deterministic synthetic address corpus for differential tests.

Covers the cleaning chain's edge cases: flat positions/letters, numeric
ranges, punctuation, slashes, duplicate end tokens, malformed postcodes.
Optionally augmented with the reference's edge-case YAML (read-only from
/root/reference; skipped when absent).
"""

from __future__ import annotations

import random
from pathlib import Path

STREETS = [
    "PEPPERPOT ROAD", "HIGH STREET", "SPITFIRE COURT", "ACACIA AVENUE",
    "STATION ROAD", "CHURCH LANE", "VICTORIA TERRACE", "MILL LANE",
    "QUEENSWAY", "KINGS ROAD",
]
CITIES = ["LONDON", "MANCHESTER", "ST ALBANS", "MILTON KEYNES", "YORK", "LEEDS"]
PREFIXES = [
    "", "FLAT {n}{l} ", "FLAT {l} ", "BASEMENT FLAT ", "GROUND FLOOR FLAT ",
    "FIRST FLOOR ", "TOP FLOOR FLAT {n} ", "UNIT {n} ", "APARTMENT {n} ",
    "GARDEN FLAT ", "{n}{l} ", "THE OLD POST OFFICE ",
]
NOISE = [
    lambda s: s,
    lambda s: s.lower(),
    lambda s: s.replace(" ", ", ", 1),
    lambda s: s + ".",
    lambda s: s.replace("ROAD", "R'OAD") if "ROAD" in s else s + "'S",
    lambda s: "  " + s + "  ",
    lambda s: s.replace(" ", "   ", 2),
    lambda s: s.replace("FLAT", "FLAT/") if "FLAT" in s else s,
    lambda s: s + " " + s.split(" ")[-1],          # duplicate end token
    lambda s: s + " C230",
    lambda s: s + " 15-17",
    lambda s: s + " 23A - 24",
]


def make_postcode(rng: random.Random) -> str:
    style = rng.randrange(6)
    pc = (
        rng.choice("ABCDEFGHKLMNPS")
        + (rng.choice("ABCDEFGH") if rng.random() < 0.5 else "")
        + str(rng.randrange(1, 99))
        + " "
        + str(rng.randrange(0, 9))
        + rng.choice("ABDEFGHJLN")
        + rng.choice("PQRSTUWXYZ")
    )
    if style == 0:
        return pc.replace(" ", "")         # missing space -> canonicalised
    if style == 1:
        return pc.lower()                  # lowercase -> NOT canonicalised
    if style == 2:
        return " " + pc + " "
    if style == 3:
        return ""                          # empty
    return pc


def synth_addresses(n: int = 400, seed: int = 42):
    """-> list of (unique_id, address_concat, postcode) with a few NULLs."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        num = rng.randrange(1, 250)
        letter = rng.choice("ABCDE")
        prefix = rng.choice(PREFIXES).format(n=num, l=letter)
        addr = f"{prefix}{rng.randrange(1, 200)} {rng.choice(STREETS)} {rng.choice(CITIES)}"
        addr = rng.choice(NOISE)(addr)
        pc = make_postcode(rng)
        if i % 97 == 0:
            addr = None
        if i % 89 == 0:
            pc = None
        rows.append((str(i), addr, pc))
    return rows


def reference_edge_case_addresses():
    """Messy+canonical strings from the reference's YAML corpus, if present."""
    path = Path("/root/reference/tests/edge_case_addresses.yaml")
    if not path.exists():
        return []
    import yaml

    data = yaml.safe_load(path.read_text())
    rows = []
    i = 0
    for case in data["addresses"]:
        rows.append((f"y{i}", case["messy_address"][0], case["messy_address"][1]))
        i += 1
        for addr in case["canonical_addresses"]:
            rows.append((f"y{i}", addr[0], addr[1]))
            i += 1
    return rows
