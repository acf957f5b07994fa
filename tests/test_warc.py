"""WARC source (sources/warc.py): spec-valid round-trips, adversarial
payloads, malformed tails."""

from __future__ import annotations

import pyarrow as pa
import pytest

from uk_address_matcher_ray.sources.warc import (
    parse_warc,
    read_warc_blobs,
    synth_warc,
)


def _rec(t, payload, uri=None, date=None):
    return {
        "warc_type": t,
        "target_uri": uri,
        "warc_date": date,
        "payload": payload,
    }


def test_roundtrip_multi_record():
    blob = synth_warc(
        [
            _rec("warcinfo", b"software: x\r\n"),
            _rec(
                "response",
                b"<html>hi</html>",
                uri="https://a.com/",
                date="2024-01-01T00:00:00Z",
            ),
            _rec("request", b"GET / HTTP/1.1\r\n", uri="https://a.com/"),
        ]
    )
    recs, err = parse_warc(blob)
    assert err is None
    assert [r["warc_type"] for r in recs] == [
        "warcinfo",
        "response",
        "request",
    ]
    assert recs[1]["target_uri"] == "https://a.com/"
    assert recs[1]["payload"] == b"<html>hi</html>"
    assert [r["rec_index"] for r in recs] == [0, 1, 2]


def test_payload_containing_warc_magic_does_not_desync():
    # Content-Length arithmetic, not magic search: a page QUOTING a WARC
    # record must stay one payload
    evil = b"look:\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nfake\r\n\r\nend"
    blob = synth_warc(
        [_rec("response", evil, uri="u1"), _rec("response", b"next", uri="u2")]
    )
    recs, err = parse_warc(blob)
    assert err is None
    assert len(recs) == 2
    assert recs[0]["payload"] == evil
    assert recs[1]["target_uri"] == "u2"


def test_malformed_tails():
    ok = synth_warc([_rec("response", b"abc", uri="u")])
    # truncated block: declared length runs past the end
    recs, err = parse_warc(ok[:-6])
    assert recs == [] and err == "truncated block"
    # bad magic after a valid record keeps the prefix
    recs, err = parse_warc(ok + b"JUNK")
    assert len(recs) == 1 and err.startswith("bad magic")
    # missing Content-Length
    bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
    recs, err = parse_warc(bad)
    assert recs == [] and err == "missing Content-Length"
    # empty / None blobs parse clean
    assert parse_warc(b"") == ([], None)
    assert parse_warc(None) == ([], None)


@pytest.mark.usefixtures("ray_session")
def test_read_warc_blobs_filter_and_errors():
    import ray

    good = synth_warc(
        [
            _rec("warcinfo", b"i\r\n"),
            _rec("response", b"page one", uri="https://a.com/1"),
            _rec("response", b"page two", uri="https://a.com/2"),
        ]
    )
    bad = b"NOT A WARC"
    partial = synth_warc([_rec("response", b"kept", uri="https://b.com/")])[
        :-1
    ]  # valid header, truncated separator
    ds = ray.data.from_arrow(
        pa.table(
            {
                "blob_id": pa.array([1, 2, 3], pa.int64()),
                "warc": pa.array([good, bad, partial], pa.binary()),
            }
        )
    ).repartition(2)
    rows = read_warc_blobs(ds, types=("response",)).take_all()
    by_blob = {}
    for r in rows:
        by_blob.setdefault(r["blob_id"], []).append(r)
    assert [r["target_uri"] for r in by_blob[1]] == [
        "https://a.com/1",
        "https://a.com/2",
    ]
    assert all(r["parse_error"] is None for r in by_blob[1])
    assert by_blob[2][0]["parse_error"].startswith("bad magic")
    assert by_blob[2][0]["rec_index"] == -1
    # blob 3 yielded no complete record: error row only (one byte short
    # means body_end + 4 runs past the blob => truncation, not separator)
    assert by_blob[3][0]["parse_error"] == "truncated block"
