"""URL operators (stages/urls.py): registered-domain reduction, parse
nulls for unparsable urls, domain stats vs brute force, blocklist
filter."""

from __future__ import annotations

import collections

import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.urls import (
    domain_doc_stats,
    filter_blocked_domains,
    parse_urls,
    registered_domain,
)


def test_registered_domain():
    assert registered_domain("www.site1.co.uk") == "site1.co.uk"
    assert registered_domain("a.b.example.com") == "example.com"
    assert registered_domain("example.com") == "example.com"
    assert registered_domain("localhost") == "localhost"
    assert registered_domain("1.2.3.4") == "1.2.3.4"
    assert registered_domain("sub.gov.uk") == "sub.gov.uk"
    assert registered_domain("x.y.sub.ac.uk") == "sub.ac.uk"
    assert registered_domain("") == ""


def _urls():
    return [
        (0, "https://www.a.co.uk/x?q=1"),
        (1, "https://b.a.co.uk/y"),
        (2, "http://c.com/"),
        (3, "not a url"),
        (4, "https://c.com/z?r=2"),
        (5, None),
        (6, "https://d.c.com/w"),
    ]


@pytest.mark.usefixtures("ray_session")
def test_parse_urls_nulls_and_fields():
    import ray

    rows = _urls()
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "url": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    out = {r["doc_id"]: r for r in parse_urls(ray.data.from_arrow(tbl)).take_all()}
    assert out[0]["registered_domain"] == "a.co.uk"
    assert out[0]["query"] == "?q=1" and out[0]["path"] == "/x"
    assert out[2]["query"] == ""  # non-participating group is '' (RE2)
    for col in ("scheme", "host", "registered_domain", "path", "query"):
        assert out[3][col] is None and out[5][col] is None


@pytest.mark.usefixtures("ray_session")
def test_domain_doc_stats_matches_brute_force():
    import ray

    rows = _urls()
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "url": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    got = {
        r["registered_domain"]: (r["n_docs"], r["n_hosts"])
        for r in domain_doc_stats(
            ray.data.from_arrow(tbl).repartition(3)
        ).take_all()
    }
    docs = collections.Counter()
    hosts = collections.defaultdict(set)
    for _, u in rows:
        if u is None or "://" not in u:
            continue
        host = u.split("://")[1].split("/")[0]
        rd = registered_domain(host)
        docs[rd] += 1
        hosts[rd].add(host)
    assert got == {d: (docs[d], len(hosts[d])) for d in docs}
    assert got["a.co.uk"] == (2, 2) and got["c.com"] == (3, 2)


@pytest.mark.usefixtures("ray_session")
def test_filter_blocked_domains():
    import ray

    rows = _urls()
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "url": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    kept = sorted(
        r["doc_id"]
        for r in filter_blocked_domains(
            ds, frozenset({"c.com"})
        ).take_all()
    )
    assert kept == [0, 1]  # c.com docs blocked, unparsed dropped
    kept2 = sorted(
        r["doc_id"]
        for r in filter_blocked_domains(
            ds, frozenset({"c.com"}), keep_unparsed=True
        ).take_all()
    )
    assert kept2 == [0, 1, 3, 5]


def test_url_dedup_keeps_newest_then_min_id():
    import random

    from uk_address_matcher_ray.stages.urls import url_dedup

    rng = random.Random(11)
    rows = [
        (i, f"https://s{rng.randrange(8)}.example.com/p{rng.randrange(5)}",
         rng.randrange(3))
        for i in range(200)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "url": pa.array([r[1] for r in rows], pa.string()),
            "fetch_ts": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    # brute-force winner per url: max ts, tie -> min id
    want = {}
    for i, u, t in rows:
        cur = want.get(u)
        if cur is None or (t, -i) > (cur[1], -cur[0]):
            want[u] = (i, t)
    import ray

    out = url_dedup(ray.data.from_arrow(tbl)).take_all()
    got = {r["url"]: (r["doc_id"], r["fetch_ts"]) for r in out}
    assert len(out) == len(got) == len(want)
    assert got == want
