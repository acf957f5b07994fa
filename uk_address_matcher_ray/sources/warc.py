"""WARC (ISO 28500 / WARC-1.0) record source — the Common-Crawl
container format the north-rule input table is extracted from.

From-scratch parser against the public spec: a WARC file is a
concatenation of records, each

    WARC/1.0 CRLF
    <header-name>: <value> CRLF ...
    CRLF
    <Content-Length octets of block>
    CRLF CRLF

The parser walks records by **Content-Length arithmetic only** — it
never searches for the magic inside the stream, so payloads containing
the literal ``WARC/1.0`` (web pages quoting WARC, nested crawls) can
not desynchronize it (tests pin this).  Malformed tails (truncated
block, missing Content-Length) stop the walk for that blob and surface
in ``warc_parse_errors`` rather than raising mid-pipeline.

``read_warc_blobs`` is the Ray-side source: one zero-shuffle
``map_batches`` over a Dataset of WARC blobs (binary column) that
explodes each blob into its records.  At 100 TB the blobs arrive as
object-store-sized chunks (Common Crawl ships ~1 GB warc.gz segments;
gzip members are per-record, so a segment can be split at member
boundaries upstream) — each blob parses independently, so the source
scales embarrassingly and a failed segment re-parses alone.

``synth_warc`` builds spec-valid WARC bytes (warcinfo + response
records) and is shared by the tests and the driver query, whose DuckDB
oracle states the expected parse output CLOSED-FORM from the synth
inputs — the media_decode pixel-formula pattern applied to a container
format.

The reference ingests plain tables (readers at
uk_address_matcher/cleaning/cleaning_pipelines.py); the WARC source is
engine surface the webtext tier adds on top.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import pyarrow as pa

_CRLF = b"\r\n"
_MAGIC = b"WARC/"


def synth_warc(records: List[Dict[str, object]]) -> bytes:
    """Spec-valid WARC bytes.  Each record dict: ``warc_type`` (str),
    ``target_uri`` (str|None), ``warc_date`` (str|None), ``payload``
    (bytes)."""
    out = bytearray()
    for r in records:
        payload: bytes = r["payload"]  # type: ignore[assignment]
        headers = [f"WARC-Type: {r['warc_type']}"]
        if r.get("target_uri") is not None:
            headers.append(f"WARC-Target-URI: {r['target_uri']}")
        if r.get("warc_date") is not None:
            headers.append(f"WARC-Date: {r['warc_date']}")
        headers.append(f"Content-Length: {len(payload)}")
        out += b"WARC/1.0\r\n"
        out += ("\r\n".join(headers)).encode("utf-8") + _CRLF
        out += _CRLF
        out += payload
        out += _CRLF + _CRLF
    return bytes(out)


def parse_warc(blob: Optional[bytes]) -> Tuple[List[dict], Optional[str]]:
    """-> (records, error).  Each record: rec_index, warc_type,
    target_uri, warc_date, payload (bytes).  ``error`` is None for a
    clean parse, else a short reason (records before the fault are
    kept)."""
    records: List[dict] = []
    if not blob:
        return records, None
    pos = 0
    n = len(blob)
    idx = 0
    while pos < n:
        if not blob.startswith(_MAGIC, pos):
            return records, f"bad magic at offset {pos}"
        hdr_end = blob.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            return records, "unterminated header block"
        head = blob[pos:hdr_end].decode("utf-8", errors="replace")
        fields: Dict[str, str] = {}
        for line in head.split("\r\n")[1:]:  # [0] is the version line
            k, _, v = line.partition(":")
            if _:
                fields[k.strip().lower()] = v.strip()
        cl = fields.get("content-length")
        if cl is None or not cl.isdigit():
            return records, "missing Content-Length"
        length = int(cl)
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end + 4 > n:
            return records, "truncated block"
        if blob[body_end : body_end + 4] != _CRLF + _CRLF:
            return records, "missing record separator"
        records.append(
            {
                "rec_index": idx,
                "warc_type": fields.get("warc-type", ""),
                "target_uri": fields.get("warc-target-uri"),
                "warc_date": fields.get("warc-date"),
                "payload": blob[body_start:body_end],
            }
        )
        idx += 1
        pos = body_end + 4
    return records, None


def read_warc_blobs(
    ds,
    blob_col: str = "warc",
    id_col: str = "blob_id",
    types: Optional[Tuple[str, ...]] = None,
):
    """-> Dataset(blob_id, rec_index, warc_type, target_uri, warc_date,
    payload:binary, parse_error) — one row per record (plus one
    error-only row for a blob that failed before yielding records).
    ``types``: keep only these WARC-Type values (e.g. ('response',))."""
    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col] if sch else pa.int64()

    out_schema = pa.schema(
        [
            pa.field(id_col, id_type),
            pa.field("rec_index", pa.int64()),
            pa.field("warc_type", pa.string()),
            pa.field("target_uri", pa.string()),
            pa.field("warc_date", pa.string()),
            pa.field("payload", pa.binary()),
            pa.field("parse_error", pa.string()),
        ]
    )

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        cols: Dict[str, list] = {
            id_col: [],
            "rec_index": [],
            "warc_type": [],
            "target_uri": [],
            "warc_date": [],
            "payload": [],
            "parse_error": [],
        }
        for bid, blob in zip(ids, batch.column(blob_col).to_pylist()):
            recs, err = parse_warc(blob)
            emitted = False
            for r in recs:
                if types is not None and r["warc_type"] not in types:
                    continue
                cols[id_col].append(bid)
                cols["rec_index"].append(r["rec_index"])
                cols["warc_type"].append(r["warc_type"])
                cols["target_uri"].append(r["target_uri"])
                cols["warc_date"].append(r["warc_date"])
                cols["payload"].append(r["payload"])
                cols["parse_error"].append(err)
                emitted = True
            if err is not None and not emitted:
                cols[id_col].append(bid)
                cols["rec_index"].append(-1)
                cols["warc_type"].append("")
                cols["target_uri"].append(None)
                cols["warc_date"].append(None)
                cols["payload"].append(b"")
                cols["parse_error"].append(err)
        return pa.table(
            {f.name: pa.array(cols[f.name], f.type) for f in out_schema},
            schema=out_schema,
        )

    return ds.map_batches(kernel, batch_format="pyarrow")
