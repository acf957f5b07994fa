"""Shared deterministic hashing primitives, mirrored in Python and DuckDB SQL.

Every dedup/fingerprint operator needs hashes that are IDENTICAL in the Ray
engine and in the driver's DuckDB oracle. The base primitive is
``h60(s) = int(md5(s)[:15 hex], 16)`` — 60 bits, fits in int64, identical in
both systems (DuckDB: CAST('0x' || substr(md5(s),1,15) AS UBIGINT)).
"""

from __future__ import annotations

import hashlib
from typing import List

MASK60 = (1 << 60) - 1


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def h60_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def shingles(tokens: List[str], k: int) -> List[str]:
    """k-token shingles (space-joined); whole doc if shorter than k."""
    if len(tokens) <= k:
        return [" ".join(tokens)]
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


MINHASH_P = (1 << 31) - 1  # Mersenne prime: (a*h+b) % P stays below 2^63


def minhash_coeffs(num_perm: int) -> tuple[List[int], List[int]]:
    """Deterministic universal-hash coefficients a_i in [1, P), b_i in [0, P),
    derived from md5 so Python and DuckDB agree with no shared state."""
    A = [(h60(f"minhash_a|{i}") % (MINHASH_P - 1)) + 1 for i in range(num_perm)]
    B = [h60(f"minhash_b|{i}") % MINHASH_P for i in range(num_perm)]
    return A, B


def minhash_signature(shingle_set: List[str], num_perm: int) -> List[int]:
    """min over shingles of (a_i * (h60(s) % P) + b_i) % P, per permutation.

    Each shingle is md5-hashed once; permutations are arithmetic (the
    classic MinHash universal-hash scheme), mirrored exactly in DuckDB SQL
    (oracle_extras.minhash_pairs_sql)."""
    A, B = minhash_coeffs(num_perm)
    hs = [h60(s) % MINHASH_P for s in shingle_set]
    return [min((A[i] * h + B[i]) % MINHASH_P for h in hs) for i in range(num_perm)]


def band_keys(sig: List[int], bands: int) -> List[str]:
    """LSH band buckets: hash of the band's signature slice."""
    rows = len(sig) // bands
    keys = []
    for b in range(bands):
        chunk = sig[b * rows : (b + 1) * rows]
        keys.append(f"{b}|" + format(h60("_".join(map(str, chunk))), "x"))
    return keys


def simhash64(tokens: List[str]) -> int:
    """64-bit simhash over unweighted token hashes (two h60 halves)."""
    acc = [0] * 64
    for t in tokens:
        h = (h60(t) << 4) | (h60("s|" + t) & 0xF)  # 64 bits from two md5s
        for i in range(64):
            acc[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


FINGERPRINT_BASE = 131
FINGERPRINT_MOD = (1 << 31) - 1


def fingerprint(tokens: List[str]) -> int:
    """Polynomial rolling hash over token h60s mod 2^31-1 (base 131)."""
    acc = 0
    for t in tokens:
        acc = (acc * FINGERPRINT_BASE + (h60(t) % FINGERPRINT_MOD)) % FINGERPRINT_MOD
    return acc


def fingerprint_sql(tokens_expr: str) -> str:
    """DuckDB mirror of ``fingerprint`` via list_reduce in HUGEINT space."""
    tok_h = f"list_transform({tokens_expr}, t -> {h60_sql('t')} % {FINGERPRINT_MOD})"
    return (
        f"CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), {tok_h}), "
        f"(a, b) -> (a * {FINGERPRINT_BASE} + b) % {FINGERPRINT_MOD}) AS BIGINT)"
    )
