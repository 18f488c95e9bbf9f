"""WARC (ISO 28500 Web ARChive) ingestion: the container format the
web-scale extraction story actually starts from (Common-Crawl-style
crawls land as WARC files; the reference demo's per-document S3
object inputs are the serverless analog of one WARC record each —
source/ocr/preprocessing/fn-preprocess/main.py:49-76 reads exactly
one document per invocation from its bucket/key event).

From-scratch stdlib implementation: a byte-exact record writer
(``build_warc``) and a Content-Length-driven parser (``parse_warc``)
— record payloads are sliced by the declared length, NEVER by
scanning for a delimiter, so payload bytes that contain ``WARC/1.0``,
CRLFCRLF, or any other magic are inert (the same binary-safety rule
the PDF extractor learned via the ``/Length``-vs-``endstream`` bug,
core/pdf_extract.py).

Spark surface (``read_warc``): ``spark.read.format("binaryFile")``
gives one row per WARC file — exactly the parallelism a real crawl
corpus has (WARC members are not block-splittable once gzipped;
Common Crawl ships ~1 GB files by the million, so file-granular
partitioning is the scale unit) — and a ``mapInPandas`` splitter
streams each file's records out as rows. No shuffle: scan ->
per-partition split -> downstream extraction, and column pruning
still applies to the metadata columns.

Both WARC layouts are supported: uncompressed, and the standard
member-gzip form (one gzip member per record, members concatenated —
what Common Crawl actually ships; this is why WARC files parallelize
per-file, not per-block). Gzip is stdlib zlib; members are written
deterministically (fixed level, no mtime) and read with a
decompressobj loop over ``unused_data``. ``read_warc`` sniffs the
gzip magic per file, so a glob may mix both layouts.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterable, Iterator

CRLF = b"\r\n"
_WARC_VERSION = b"WARC/1.0"


class WarcFormatError(ValueError):
    pass


def build_warc(records: Iterable[dict]) -> bytes:
    """Serialize records to WARC/1.0 bytes. Each record dict:
    ``warc_type`` (str), ``payload`` (bytes), and optionally
    ``target_uri``, ``warc_date``, ``record_id``, ``content_type``.
    Content-Length is the payload's exact byte length."""
    out = bytearray()
    for i, rec in enumerate(records):
        payload = rec["payload"]
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        headers = [
            (b"WARC-Type", rec["warc_type"].encode()),
            (b"WARC-Record-ID",
             rec.get("record_id", f"<urn:uuid:rec-{i}>").encode()),
            (b"WARC-Date",
             rec.get("warc_date", "2026-01-01T00:00:00Z").encode()),
            (b"Content-Length", str(len(payload)).encode()),
        ]
        if rec.get("target_uri"):
            headers.insert(3, (b"WARC-Target-URI",
                               rec["target_uri"].encode()))
        if rec.get("content_type"):
            headers.append((b"Content-Type",
                            rec["content_type"].encode()))
        out += _WARC_VERSION + CRLF
        for k, v in headers:
            out += k + b": " + v + CRLF
        out += CRLF + payload + CRLF + CRLF
    return bytes(out)


def parse_warc(data: bytes) -> Iterator[dict]:
    """Yield one dict per record: warc_type, record_id, target_uri,
    warc_date, content_type, payload (bytes). Payloads are sliced by
    Content-Length; a record not followed by CRLFCRLF (or EOF) is a
    format error, as is a missing/invalid Content-Length."""
    pos, n = 0, len(data)
    while pos < n:
        # tolerate extra blank lines between records
        while data.startswith(CRLF, pos):
            pos += 2
        if pos >= n:
            return
        if not data.startswith(_WARC_VERSION, pos):
            raise WarcFormatError(
                f"expected {_WARC_VERSION!r} at offset {pos}")
        hdr_end = data.find(CRLF + CRLF, pos)
        if hdr_end < 0:
            raise WarcFormatError("unterminated record header block")
        headers: dict[str, str] = {}
        for line in data[pos + len(_WARC_VERSION) + 2:hdr_end].split(CRLF):
            k, sep, v = line.partition(b":")
            if not sep:
                raise WarcFormatError(f"malformed header line {line!r}")
            headers[k.strip().decode("ascii").lower()] = (
                v.strip().decode("utf-8", "replace"))
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise WarcFormatError("missing/invalid Content-Length") from exc
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end > n:
            raise WarcFormatError("Content-Length runs past EOF")
        tail = data[body_end:body_end + 4]
        if tail not in (CRLF + CRLF, b"") and not (
                tail.startswith(CRLF) and body_end + 2 == n):
            raise WarcFormatError(
                f"record at {pos} not followed by CRLFCRLF")
        yield {
            "warc_type": headers.get("warc-type", ""),
            "record_id": headers.get("warc-record-id", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "content_type": headers.get("content-type", ""),
            "payload": data[body_start:body_end],
        }
        pos = body_end + 4


def build_warc_gz(records: Iterable[dict]) -> bytes:
    """Member-gzip WARC: each record is its own gzip member (the spec
    layout that keeps records independently seekable/splittable at
    the member level). Deterministic bytes: fixed compression level,
    no timestamp/filename in the gzip header (wbits=31 raw-gzip via
    compressobj writes mtime=0)."""
    out = bytearray()
    for rec in records:
        co = zlib.compressobj(level=6, wbits=31)
        out += co.compress(build_warc([rec])) + co.flush()
    return bytes(out)


_GZIP_MAGIC = b"\x1f\x8b"


def _gunzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress concatenated gzip members one at a time."""
    pos, n = 0, len(data)
    while pos < n:
        dec = zlib.decompressobj(wbits=31)
        chunk = dec.decompress(data[pos:])
        if not dec.eof:
            raise WarcFormatError("truncated gzip member")
        yield chunk + dec.flush()
        consumed = (n - pos) - len(dec.unused_data)
        if consumed <= 0:
            raise WarcFormatError("gzip member consumed no bytes")
        pos += consumed


def parse_warc_auto(data: bytes) -> Iterator[dict]:
    """Parse either layout: member-gzip (sniffed by magic) or plain."""
    if data[:2] == _GZIP_MAGIC:
        for member in _gunzip_members(data):
            yield from parse_warc(member)
    else:
        yield from parse_warc(data)


def split_http_response(payload: bytes) -> tuple[int | None, bytes]:
    """Split an ``application/http; msgtype=response`` payload into
    (status_code, body). Returns (None, payload) when the payload is
    not an HTTP response message."""
    if not payload.startswith(b"HTTP/"):
        return None, payload
    sep = payload.find(CRLF + CRLF)
    if sep < 0:
        return None, payload
    status_line = payload[:payload.find(CRLF)]
    parts = status_line.split(b" ")
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, payload
    return status, payload[sep + 4:]


READ_WARC_SCHEMA = ("warc_file string, rec_idx bigint, warc_type string,"
                    " record_id string, target_uri string,"
                    " warc_date string, content_type string,"
                    " http_status int, payload_len bigint, body string")


def read_warc(spark, path: str):
    """WARC files -> one DataFrame row per record. Parallelism is
    file-granular (binaryFile = one row per file; the splitter is a
    narrow mapInPandas — no shuffle). ``body`` is the HTTP response
    body for response records (utf-8, errors replaced), else the raw
    payload; ``payload_len`` is the raw payload byte length."""
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path)

    def split(batches):
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for i, rec in enumerate(parse_warc_auto(bytes(content))):
                    status, body = (
                        split_http_response(rec["payload"])
                        if rec["content_type"].startswith(
                            "application/http")
                        else (None, rec["payload"]))
                    rows.append({
                        "warc_file": path_,
                        "rec_idx": i,
                        "warc_type": rec["warc_type"],
                        "record_id": rec["record_id"],
                        "target_uri": rec["target_uri"],
                        "warc_date": rec["warc_date"],
                        "content_type": rec["content_type"],
                        "http_status": status,
                        "payload_len": len(rec["payload"]),
                        "body": body.decode("utf-8", "replace"),
                    })
            yield pd.DataFrame(
                rows, columns=[c.split()[0] for c in
                               READ_WARC_SCHEMA.split(",")])

    return raw.select("path", "content").mapInPandas(
        split, READ_WARC_SCHEMA)
