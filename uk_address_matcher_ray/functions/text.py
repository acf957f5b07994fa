"""Scalar text kernels for the address-cleaning chain.

Each function re-expresses one cleaning step of the reference
(RobinL/uk_address_matcher) with byte-identical semantics, verified by a
DuckDB differential oracle in tests/test_cleaning_oracle.py. Citations are
file:line into /root/reference.

Two reference regexes are *deliberate no-ops*: DuckDB's regexp_replace
silently returns its input unchanged when the pattern is invalid RE2
(verified empirically on constant and column inputs). The reference's
``standarise_num_dash_num`` (lookbehind/lookahead, regexes.py:16-39) and
``remove_repeated_tokens`` (backreference, regexes.py:48-71) are therefore
no-ops at runtime and are reproduced here as no-ops.

All regexes use re.ASCII so that \\s, \\w and \\b match RE2's ASCII
semantics (DuckDB uses RE2, which treats those classes as ASCII-only).

Known divergence: Python str.upper() expands 'ß' to 'SS' while DuckDB
maps it to 'ẞ'; UK address corpora are ASCII so this is out of scope
(asserted only over ASCII in the differential tests).
"""

from __future__ import annotations

import re
from typing import List, Optional

A = re.ASCII

# --- C2 canonicalise_postcode (cleaning_steps.py:61-90) -----------------
# Note: the reference applies this BEFORE upper-casing (cleaning_pipelines.py:39-41),
# so lowercase postcodes are not canonicalised; reproduced as-is.
_RE_POSTCODE = re.compile(r"^([A-Z]{1,2}\d[A-Z\d]?|GIR)\s*(\d[A-Z]{2})$", A)

# --- C4 clean_address_string_first_pass (cleaning_steps.py:93-119, regexes.py) ---
_RE_COMMA_PERIOD = re.compile(r"[,.]", A)  # regexes.py:4-5
_RE_APOSTROPHE = re.compile(r"'", A)  # regexes.py:8-9
_RE_MULTI_SPACE = re.compile(r"\s+", A)  # regexes.py:12-13
_RE_FWD_SLASH = re.compile(r"/", A)  # regexes.py:42-44
# regexes.py:16-39 standarise_num_dash_num: invalid RE2 (lookaround) -> no-op
# separate_letter_num (regexes.py:106-129): C230 -> C 230
_RE_LETTER_NUM = re.compile(r"\b([A-Za-z])\s*(\d+)\b", A)
# standarise_num_letter (regexes.py:78-103): '123-A ' -> '123A ' ([[:punct:]] is
# the ASCII punctuation class in RE2)
_PUNCT = r"""!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~"""
_RE_NUM_LETTER = re.compile(r"(\d{1,4})[" + _PUNCT + r"\s]([A-Za-z])\s", A)
# move_flat_to_front (regexes.py:132-153): replaces '\\1 \\2' in original order,
# i.e. a content no-op after whitespace collapse; applied for fidelity.
_RE_FLAT_FRONT = re.compile(r"\b(FLAT \d+[A-Z]?)\s+(.*)", A)
# regexes.py:48-71 remove_repeated_tokens: invalid RE2 (backreference) -> no-op

# --- C7 parse_out_flat_position_and_letter (cleaning_steps.py:122-169) ---
_RE_FLOOR_POS = re.compile(
    r"\b(BASEMENT|GROUND FLOOR|FIRST FLOOR|SECOND FLOOR|THIRD FLOOR|TOP FLOOR|GARDEN)\b",
    A,
)
_RE_FLAT_LETTER = re.compile(r"\b\d{0,4}([A-Za-z])\b", A)
_RE_LEADING_LETTER = re.compile(r"^\s*\d+([A-Za-z])\b", A)
# Reference extracts GROUP 1 of this pattern — the keyword itself — and keeps
# it when len <= 4 ('FLAT'/'UNIT' pass, 'APARTMENT' doesn't). Quirk reproduced;
# verified against DuckDB (cleaning_steps.py:141,153,162-165).
_RE_FLAT_NUMBER = re.compile(r"\b(FLAT|UNIT|APARTMENT)\s+(\S*\d\S*)\s+\S*\d\S*\b", A)

# --- C8 parse_out_numbers (cleaning_steps.py:172-211) -------------------
_RE_NUMERIC_TOKEN = re.compile(r"\b(\d{1,5}-\d{1,5}|[A-Za-z]?\d{1,5}[A-Za-z]?)\b", A)
_RE_ALL_DIGITS = re.compile(r"^\d+$", A)

# --- C10 split_numeric_tokens_to_cols (cleaning_steps.py:231-243) -------
_RE_DIGIT_RUN = re.compile(r"\d+", A)


def trim(s: Optional[str]) -> Optional[str]:
    """DuckDB trim() strips ASCII spaces only (cleaning_steps.py:47-58)."""
    return None if s is None else s.strip(" ")


def canonicalise_postcode(pc: Optional[str]) -> Optional[str]:
    """cleaning_steps.py:61-90 — insert single space in UK-format postcodes."""
    if pc is None:
        return None
    return _RE_POSTCODE.sub(r"\1 \2", pc)


def upper(s: Optional[str]) -> Optional[str]:
    return None if s is None else s.upper()


def clean_address_first_pass(s: Optional[str]) -> Optional[str]:
    """cleaning_steps.py:93-119 — nested regex chain (order matters)."""
    if s is None:
        return None
    s = _RE_COMMA_PERIOD.sub(" ", s)
    s = _RE_APOSTROPHE.sub("", s)
    s = _RE_MULTI_SPACE.sub(" ", s)
    s = _RE_FWD_SLASH.sub("-", s)
    # standarise_num_dash_num: no-op (invalid RE2 in DuckDB)
    s = _RE_LETTER_NUM.sub(r"\1 \2", s)
    s = _RE_NUM_LETTER.sub(r"\1\2 ", s)
    s = _RE_FLAT_FRONT.sub(r"\1 \2", s)
    # remove_repeated_tokens: no-op (invalid RE2 in DuckDB)
    return s.strip(" ")


def remove_duplicate_end_tokens(s: Optional[str]) -> Optional[str]:
    """cleaning_steps.py:260-286.

    DuckDB list slices are end-inclusive: [:-2] drops ONE trailing token,
    [:-3] drops TWO (verified; matches cleaning/tests/test_cleaning_steps.py:85-111).
    Split is on a literal single space (string_split(s, ' ')).
    """
    if s is None:
        return None
    t = s.split(" ")
    if len(t) >= 2 and t[-1] == t[-2]:
        return " ".join(t[:-1])
    if len(t) >= 4 and t[-4] == t[-2] and t[-3] == t[-1]:
        return " ".join(t[:-2])
    return s


def parse_flat_position_and_letter(
    s: Optional[str],
) -> tuple[Optional[str], Optional[str]]:
    """cleaning_steps.py:122-169 -> (flat_positional, flat_letter)."""
    if s is None:
        return None, None
    m = _RE_FLOOR_POS.search(s)
    flat_positional = m.group(1) if m else None

    m = _RE_FLAT_LETTER.search(s)
    letter = m.group(1) if m else ""
    if not letter:
        m = _RE_LEADING_LETTER.search(s)
        letter = m.group(1) if m else ""
    if not letter:
        m = _RE_FLAT_NUMBER.search(s)
        kw = m.group(1) if m else ""
        # CASE WHEN LENGTH(flat_number) <= 4 THEN flat_number (group 1 = keyword)
        letter = kw if m and len(kw) <= 4 else ""
    return flat_positional, (letter or None)


def parse_out_numbers(
    s: Optional[str], flat_letter: Optional[str]
) -> tuple[Optional[str], Optional[List[str]]]:
    """cleaning_steps.py:172-211 -> (address_without_numbers, numeric_tokens)."""
    if s is None:
        return None, None
    without = _RE_NUMERIC_TOKEN.sub("", s)
    toks = _RE_NUMERIC_TOKEN.findall(s)
    if flat_letter is not None and _RE_ALL_DIGITS.match(flat_letter):
        toks = toks[1:]  # DuckDB 1-based slice [2:] skips the first token
    return without, toks


def clean_second_pass(s: Optional[str]) -> Optional[str]:
    """cleaning_steps.py:214-228 — collapse spaces + trim."""
    if s is None:
        return None
    return _RE_MULTI_SPACE.sub(" ", s).strip(" ")


def split_numeric_tokens(
    numeric_tokens: Optional[List[str]],
) -> tuple[Optional[str], Optional[str], Optional[str]]:
    """cleaning_steps.py:231-243 — first three digit-runs of the joined tokens."""
    if numeric_tokens is None:
        return None, None, None
    runs = _RE_DIGIT_RUN.findall(" ".join(numeric_tokens))
    runs += [None, None, None]
    return runs[0], runs[1], runs[2]


def tokenise(s: Optional[str]) -> Optional[List[str]]:
    """cleaning_steps.py:246-257 — regexp_split_to_array(trim(s), '\\s+').

    DuckDB/RE2 split of '' yields [''] (one empty token); reproduced.
    """
    if s is None:
        return None
    return re.split(r"\s+", s.strip(" "), flags=A)


def levenshtein(a: str, b: str) -> int:
    """Edit distance (splink_model.json postcode levels; strings are short)."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def outward_code(pc: Optional[str]) -> Optional[str]:
    """split_part(postcode, ' ', 1) — '' when input is '' (DuckDB semantics)."""
    if pc is None:
        return None
    return pc.split(" ")[0] if pc else ""


def inward_code(pc: Optional[str]) -> Optional[str]:
    """split_part(postcode, ' ', 2) — '' when there is no second part."""
    if pc is None:
        return None
    parts = pc.split(" ")
    return parts[1] if len(parts) > 1 else ""


# ---------------------------------------------------------------------------
# Vectorized (Arrow/RE2) variants of the string-level prefix of the chain.
# RE2 is the SAME engine DuckDB uses, so these are byte-faithful to the
# reference by construction; the scalar functions above remain the semantic
# spec (differential-tested against both).
# ---------------------------------------------------------------------------

def clean_postcode_vec(arr):
    """trim -> canonicalise_postcode -> upper, column-wise."""
    import pyarrow.compute as pc

    a = pc.utf8_trim(arr, " ")
    a = pc.replace_substring_regex(
        a,
        pattern=r"^([A-Z]{1,2}\d[A-Z\d]?|GIR)\s*(\d[A-Z]{2})$",
        replacement=r"\1 \2",
    )
    return pc.utf8_upper(a)


def clean_address_first_pass_vec(arr):
    """trim -> upper -> clean_address_first_pass, column-wise
    (cleaning_steps.py:93-119; the two invalid-RE2 reference steps are
    no-ops, see module docstring)."""
    import pyarrow.compute as pc

    a = pc.utf8_upper(pc.utf8_trim(arr, " "))
    for pat, rep in (
        (r"[,.]", " "),
        (r"'", ""),
        (r"\s+", " "),
        (r"/", "-"),
        (r"\b([A-Za-z])\s*(\d+)\b", r"\1 \2"),
        (r"(\d{1,4})[" + _PUNCT + r"\s]([A-Za-z])\s", r"\1\2 "),
        (r"\b(FLAT \d+[A-Z]?)\s+(.*)", r"\1 \2"),
    ):
        a = pc.replace_substring_regex(a, pattern=pat, replacement=rep)
    return pc.utf8_trim(a, " ")
