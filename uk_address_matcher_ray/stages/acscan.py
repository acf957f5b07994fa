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
for phrases with at least one match.

Scale shape: the automaton is built ONCE PER ACTOR in ``__init__``
from the broadcast phrase list (the actor-pool story — goto/fail/output
links are O(total phrase chars) of state); scanning is a zero-shuffle
row-local pass.  The oracle mirrors the semantics with a position
explode — O(n·P) is fine for the CHECK, the engine is the O(n) path.
"""

from __future__ import annotations

from collections import deque
from typing import List, Sequence

import pyarrow as pa

from uk_address_matcher_ray import util


class _Automaton:
    """Classic Aho–Corasick: goto tries, BFS fail links, output lists."""

    def __init__(self, phrases: Sequence[str]):
        self.goto: List[dict] = [{}]
        self.out: List[List[int]] = [[]]
        self.fail: List[int] = [0]
        self.phrases = list(phrases)
        for pid, p in enumerate(self.phrases):
            s = 0
            for ch in p:
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

    def count(self, text: str) -> dict:
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


class _ScanStage:
    def __init__(self, phrases_ref, id_col: str, text_col: str):
        phrases = util.get_broadcast(phrases_ref)
        self.ac = _Automaton(phrases)
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, ph_out, n_out = [], [], []
        phrases = self.ac.phrases
        for did, text in zip(
            batch.column(self.id_col).to_pylist(),
            batch.column(self.text_col).to_pylist(),
        ):
            if not text:
                continue
            for pid, c in sorted(self.ac.count(text).items()):
                ids_out.append(did)
                ph_out.append(phrases[pid])
                n_out.append(c)
        return pa.table(
            {
                self.id_col: pa.array(
                    ids_out, batch.schema.field(self.id_col).type
                ),
                "phrase": pa.array(ph_out, pa.string()),
                "n_matches": pa.array(n_out, pa.int64()),
            }
        )


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

    if concurrency is None:
        # autoscaling pool (multimodal sizing rule)
        concurrency = (1, max(2, int(ray.cluster_resources().get("CPU", 4)) - 2))
    phrases_ref = ray.put(list(phrases))
    return ds.select_columns([id_col, text_col]).map_batches(
        _ScanStage,
        fn_constructor_args=(phrases_ref, id_col, text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def ac_scan_sql(
    phrases: Sequence[str],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror: position explode per phrase (overlap-counting)."""
    branches = []
    for p in phrases:
        esc = p.replace("'", "''")
        branches.append(
            f"""SELECT {id_col}, '{esc}' AS phrase, CAST(count(*) AS BIGINT) AS n_matches
FROM (SELECT {id_col}, {text_col},
             unnest(range(1, length({text_col}) - {len(p)} + 2)) AS i
      FROM {table}
      WHERE {text_col} IS NOT NULL
        AND length({text_col}) >= {len(p)})
WHERE substr({text_col}, i, {len(p)}) = '{esc}'
GROUP BY {id_col}"""
        )
    return "\nUNION ALL\n".join(branches)
