"""Aho–Corasick multi-pattern scan — count every occurrence of every
blocklist phrase in every document in ONE pass over the text.

The filtering primitive behind phrase blocklists (profanity/PII/SEO-spam
phrase lists run to tens of thousands of entries): a per-phrase scan is
O(|text| · |phrases|); the Aho–Corasick automaton is O(|text| + hits)
regardless of phrase count — which is the difference between feasible
and not at corpus scale.

Contract (mirrored by ``ac_scan_sql``): matching is case-sensitive on
the raw text; occurrences are counted at every end position, so
OVERLAPPING matches count ("aaa" contains "aa" twice) and phrases that
are substrings of other phrases are counted independently (the classic
AC output-link semantics).  Output rows are (id, phrase, n_matches)
for phrases with at least one match.  Empty phrases are rejected (the
engine would count len(text) hits and the SQL mirror len(text)+1 —
degenerate either way).

Engine shape: the automaton is DENSE — an int32 transition table over
compressed byte classes (bytes appearing in no phrase share one class
whose column is all-root, so the table is states × (distinct phrase
bytes + 1)).  Matching is byte-level on UTF-8: a valid UTF-8 phrase
can only match at character boundaries (lead bytes < 0x80 or >= 0xC0
never equal continuation bytes), so byte counts == character-semantics
counts.  Scanning is vectorized LOCKSTEP: rows sorted by length
descending step together — one fancy-gather per text position over the
still-active prefix of lanes — so the per-byte work is numpy, not the
interpreter; a scalar dense-table loop finishes the few longest rows
once fewer than ``_TAIL_LANES`` remain (bounds the Python step count
without a padded matrix).

Scale shape: the automaton is built ONCE PER WORKER PROCESS from the
broadcast phrase list (``ray.put`` ref + per-worker memo — task-based
``map_batches``, no actor-pool spawn latency) and scanning is a
zero-shuffle row-local pass.  Very large phrase sets (dense table over
``_DENSE_MAX_CELLS`` cells) fall back to the sparse dict automaton.
The oracle mirrors the semantics with a position explode — O(n·P) is
fine for the CHECK, the engine is the O(n) path.
"""

from __future__ import annotations

from collections import deque
from typing import List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from uk_address_matcher_ray import util

_TAIL_LANES = 8
_DENSE_MAX_CELLS = 64_000_000  # int32 cells (~256 MB) before sparse fallback


class _Automaton:
    """Classic Aho–Corasick: goto tries, BFS fail links, output lists.

    Built over UTF-8 BYTES (ints 0..255) of each phrase; ``count``
    accepts either str (encoded) or bytes.
    """

    def __init__(self, phrases: Sequence[str]):
        self.goto: List[dict] = [{}]
        self.out: List[List[int]] = [[]]
        self.fail: List[int] = [0]
        self.phrases = list(phrases)
        for pid, p in enumerate(self.phrases):
            s = 0
            for ch in p.encode("utf-8"):
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    self.fail.append(0)
                    nxt = len(self.goto) - 1
                    self.goto[s][ch] = nxt
                s = nxt
            self.out[s].append(pid)
        q = deque()
        for s in self.goto[0].values():
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in self.goto[r].items():
                q.append(s)
                f = self.fail[r]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[s] = self.goto[f].get(ch, 0)
                if self.fail[s] == s:
                    self.fail[s] = 0
                self.out[s] = self.out[s] + self.out[self.fail[s]]

    def count(self, text) -> dict:
        if isinstance(text, str):
            text = text.encode("utf-8")
        counts: dict = {}
        s = 0
        goto, fail, out = self.goto, self.fail, self.out
        for ch in text:
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            for pid in out[s]:
                counts[pid] = counts.get(pid, 0) + 1
        return counts


class _DenseAutomaton:
    """Dense byte-class transition table + CSR output links."""

    def __init__(self, phrases: Sequence[str]):
        base = _Automaton(phrases)
        self.phrases = base.phrases
        n_states = len(base.goto)
        # byte -> class; class 0 = "never in any phrase" (all transitions
        # root-follow to a state whose goto also lacks it -> 0 everywhere)
        lut = np.zeros(256, np.int16)
        seen = sorted({b for p in self.phrases for b in p.encode("utf-8")})
        for i, b in enumerate(seen):
            lut[b] = i + 1
        self.lut = lut
        n_classes = len(seen) + 1
        self.n_classes = n_classes
        self.dense = n_states * n_classes <= _DENSE_MAX_CELLS
        self.scalar = base  # sparse fallback + debug
        if not self.dense:
            return
        table = np.zeros((n_states, n_classes), np.int32)
        # BFS order guarantees fail[s] < bfs(s) resolved first
        order = deque(base.goto[0].values())
        for ch, nxt in base.goto[0].items():
            table[0, lut[ch]] = nxt
        while order:
            r = order.popleft()
            table[r] = table[base.fail[r]]
            for ch, s in base.goto[r].items():
                table[r, lut[ch]] = s
                order.append(s)
        self.table_flat = table.ravel()
        self.table_list = self.table_flat.tolist()  # scalar-tail speed
        self.out_count = np.array(
            [len(o) for o in base.out], np.int64
        )
        self.out_indptr = np.concatenate(
            [[0], np.cumsum(self.out_count)]
        ).astype(np.int64)
        self.out_pids = np.array(
            [pid for o in base.out for pid in o], np.int64
        )
        self.out_lists = base.out
        self.lut_list = lut.tolist()


def _string_buffers(col):
    """(offsets int64 ndarray of n+1 absolute positions, data uint8)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(
        arr.type
    ):
        odt = np.int64
    else:
        odt = np.int32
    off = np.frombuffer(arr.buffers()[1], odt)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    dbuf = arr.buffers()[2]
    data = (
        np.frombuffer(dbuf, np.uint8)
        if dbuf is not None
        else np.empty(0, np.uint8)
    )
    return off, data


def _scan_table(batch: pa.Table, auto: _DenseAutomaton, id_col: str,
                text_col: str) -> pa.Table:
    phrases = auto.phrases
    n_phr = len(phrases)
    id_type = batch.schema.field(id_col).type
    empty = pa.table(
        {
            id_col: pa.array([], id_type),
            "phrase": pa.array([], pa.string()),
            "n_matches": pa.array([], pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    txt = pc.fill_null(batch.column(text_col), "")
    off, data = _string_buffers(txt)
    lens = off[1:] - off[:-1]
    if not auto.dense:
        # sparse fallback: per-row dict automaton (huge phrase sets)
        ids_out, ph_out, n_out = [], [], []
        ids = batch.column(id_col).to_pylist()
        buf = data.tobytes()
        for i in range(len(ids)):
            if lens[i] == 0:
                continue
            for pid, c in sorted(
                auto.scalar.count(buf[off[i] : off[i + 1]]).items()
            ):
                ids_out.append(ids[i])
                ph_out.append(phrases[pid])
                n_out.append(c)
        return pa.table(
            {
                id_col: pa.array(ids_out, id_type),
                "phrase": pa.array(ph_out, pa.string()),
                "n_matches": pa.array(n_out, pa.int64()),
            }
        )

    order = np.argsort(-lens, kind="stable")
    slens = lens[order]
    starts = off[:-1][order]
    neg = -slens  # ascending
    maxlen = int(slens[0]) if len(slens) else 0
    cls_flat = auto.lut[data].astype(np.int64)
    A = auto.n_classes
    Tflat = auto.table_flat
    out_count = auto.out_count
    states = np.zeros(len(order), np.int64)
    hit_rows: list = []
    hit_states: list = []
    pair_rows: list = []  # scalar-tail direct (row, pid) emissions
    pair_pids: list = []
    t = 0
    while t < maxlen:
        k = int(np.searchsorted(neg, -t, side="left"))  # lanes len > t
        if k <= 0:
            break
        if k < _TAIL_LANES:
            # finish the few longest rows with the scalar dense loop
            tl = auto.table_list
            ll = auto.lut_list
            outs = auto.out_lists
            buf = data
            for lane in range(k):
                s = int(states[lane])
                row = int(order[lane])
                seg = buf[starts[lane] + t : starts[lane] + slens[lane]]
                for b in seg.tobytes():
                    s = tl[s * A + ll[b]]
                    for pid in outs[s]:
                        pair_rows.append(row)
                        pair_pids.append(pid)
            break
        idx = starts[:k] + t
        st = Tflat[states[:k] * A + cls_flat[idx]]
        states[:k] = st
        nz = np.nonzero(out_count[st])[0]
        if nz.size:
            hit_rows.append(order[nz])
            hit_states.append(st[nz])
        t += 1

    keys = []
    if hit_rows:
        rows = np.concatenate(hit_rows)
        sts = np.concatenate(hit_states)
        reps = out_count[sts]
        total = int(reps.sum())
        doc_rep = np.repeat(rows, reps)
        seg_ends = np.cumsum(reps)
        pos = (
            np.arange(total, dtype=np.int64)
            - np.repeat(seg_ends - reps, reps)
            + np.repeat(auto.out_indptr[sts], reps)
        )
        keys.append(doc_rep * n_phr + auto.out_pids[pos])
    if pair_rows:
        keys.append(
            np.array(pair_rows, np.int64) * n_phr
            + np.array(pair_pids, np.int64)
        )
    if not keys:
        return empty
    uniq, counts = np.unique(np.concatenate(keys), return_counts=True)
    rows = uniq // n_phr
    pids = uniq % n_phr
    return pa.table(
        {
            id_col: batch.column(id_col).take(pa.array(rows)),
            "phrase": pa.array(phrases, pa.string()).take(pa.array(pids)),
            "n_matches": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


_AUTOMATON_MEMO: dict = {}


def _get_automaton(phrases_ref) -> _DenseAutomaton:
    import ray

    key = (
        phrases_ref.hex()
        if isinstance(phrases_ref, ray.ObjectRef)
        else id(phrases_ref)
    )
    auto = _AUTOMATON_MEMO.get(key)
    if auto is None:
        auto = _DenseAutomaton(util.get_broadcast(phrases_ref))
        if len(_AUTOMATON_MEMO) > 16:
            _AUTOMATON_MEMO.clear()
        _AUTOMATON_MEMO[key] = auto
    return auto


class _ScanStage:
    """Kept callable directly by tests; ``ac_scan`` uses the task path."""

    def __init__(self, phrases_ref, id_col: str, text_col: str):
        self.auto = _DenseAutomaton(util.get_broadcast(phrases_ref))
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _scan_table(batch, self.auto, self.id_col, self.text_col)


def ac_scan(
    ds,
    phrases: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency=None,
):
    """-> Dataset(id, phrase, n_matches) — overlapping occurrences of
    every phrase, one automaton pass per document."""
    import ray

    phrases = list(phrases)
    if any(not p for p in phrases):
        raise ValueError("ac_scan: empty phrases are not allowed")
    phrases_ref = ray.put(phrases)

    def scan(batch: pa.Table) -> pa.Table:
        return _scan_table(
            batch, _get_automaton(phrases_ref), id_col, text_col
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        scan, batch_format="pyarrow", concurrency=concurrency
    )


def ac_scan_sql(
    phrases: Sequence[str],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror: position explode per phrase (overlap-counting)."""
    if any(not p for p in phrases):
        raise ValueError("ac_scan_sql: empty phrases are not allowed")
    branches = []
    for p in phrases:
        lit = util.sql_str(p)
        branches.append(
            f"""SELECT {id_col}, {lit} AS phrase, CAST(count(*) AS BIGINT) AS n_matches
FROM (SELECT {id_col}, {text_col},
             unnest(range(1, length({text_col}) - {len(p)} + 2)) AS i
      FROM {table}
      WHERE {text_col} IS NOT NULL
        AND length({text_col}) >= {len(p)})
WHERE substr({text_col}, i, {len(p)}) = {lit}
GROUP BY {id_col}"""
        )
    return "\nUNION ALL\n".join(branches)
