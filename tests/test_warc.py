"""WARC source: byte-exact round-trip (including adversarial payloads
containing record magic), format-error rejection, HTTP splitting, and
the Spark read path."""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from textract_demo_spark.sources.warc import (WarcFormatError,
                                              build_warc, parse_warc,
                                              read_warc,
                                              split_http_response)


def _rt(records):
    return list(parse_warc(build_warc(records)))


def test_roundtrip_basic():
    recs = [
        {"warc_type": "warcinfo", "payload": b"software: x\r\n",
         "content_type": "application/warc-fields"},
        {"warc_type": "response", "target_uri": "https://e.org/1",
         "payload": b"HTTP/1.1 200 OK\r\n\r\nhello",
         "content_type": "application/http; msgtype=response"},
        {"warc_type": "resource", "payload": b""},
    ]
    out = _rt(recs)
    assert [r["warc_type"] for r in out] == [
        "warcinfo", "response", "resource"]
    assert out[1]["target_uri"] == "https://e.org/1"
    assert out[2]["payload"] == b""


def test_payload_containing_record_magic_is_inert():
    """Content-Length slicing means embedded 'WARC/1.0' + CRLFCRLF +
    header-looking bytes must NOT split the record (the binary-safety
    rule from the PDF /Length bug)."""
    evil = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"Content-Length: 0\r\n\r\n\r\n\r\n trailing")
    out = _rt([{"warc_type": "resource", "payload": evil},
               {"warc_type": "resource", "payload": b"after"}])
    assert out[0]["payload"] == evil
    assert out[1]["payload"] == b"after"


@settings(max_examples=200, deadline=None)
@given(st.lists(st.binary(max_size=400), min_size=1, max_size=6),
       st.sampled_from(["resource", "response", "metadata"]))
def test_roundtrip_property(payloads, wtype):
    recs = [{"warc_type": wtype, "payload": p,
             "target_uri": f"https://e.org/{i}"}
            for i, p in enumerate(payloads)]
    out = _rt(recs)
    assert len(out) == len(payloads)
    for rec, p, i in zip(out, payloads, range(len(payloads))):
        assert rec["payload"] == p
        assert rec["target_uri"] == f"https://e.org/{i}"


def test_truncated_payload_rejected():
    data = build_warc([{"warc_type": "resource", "payload": b"abcdef"}])
    with pytest.raises(WarcFormatError, match="EOF"):
        list(parse_warc(data[:-8]))


def test_bad_magic_rejected():
    with pytest.raises(WarcFormatError, match="expected"):
        list(parse_warc(b"NOT-A-WARC\r\n\r\n"))


def test_missing_content_length_rejected():
    data = (b"WARC/1.0\r\nWARC-Type: resource\r\n\r\npayload\r\n\r\n")
    with pytest.raises(WarcFormatError, match="Content-Length"):
        list(parse_warc(data))


def test_missing_record_terminator_rejected():
    good = build_warc([{"warc_type": "resource", "payload": b"abc"},
                       {"warc_type": "resource", "payload": b"xyz"}])
    # corrupt the terminator between the records
    bad = good.replace(b"abc\r\n\r\n", b"abc..\r\n", 1)
    with pytest.raises(WarcFormatError):
        list(parse_warc(bad))


def test_split_http_response():
    st_, body = split_http_response(
        b"HTTP/1.1 404 Not Found\r\nX: y\r\n\r\nbody\r\nrest")
    assert st_ == 404 and body == b"body\r\nrest"
    st_, body = split_http_response(b"not http at all")
    assert st_ is None and body == b"not http at all"
    st_, body = split_http_response(b"HTTP/1.1 garbled\r\n\r\nz")
    assert st_ is None


def test_read_warc_spark(spark, tmp_path):
    for shard in range(3):
        recs = [{"warc_type": "warcinfo", "payload": b"software: t\r\n"}]
        for i in range(4):
            recs.append({
                "warc_type": "response",
                "target_uri": f"https://e.org/doc/{shard * 4 + i}",
                "content_type": "application/http; msgtype=response",
                "payload": (b"HTTP/1.1 200 OK\r\n\r\nbody-"
                            + str(shard * 4 + i).encode()),
            })
        (tmp_path / f"s{shard}.warc").write_bytes(build_warc(recs))
    df = read_warc(spark, f"{tmp_path}/*.warc")
    rows = df.collect()
    assert len(rows) == 15  # 3 warcinfo + 12 responses
    resp = [r for r in rows if r["warc_type"] == "response"]
    assert all(r["http_status"] == 200 for r in resp)
    assert sorted(r["body"] for r in resp) == sorted(
        f"body-{i}" for i in range(12))
    # splitter is a narrow op: no shuffle in the plan
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p[:2000]


def test_gzip_member_roundtrip():
    from textract_demo_spark.sources.warc import (build_warc_gz,
                                                  parse_warc_auto)
    recs = [{"warc_type": "resource", "payload": bytes(range(256)) * 3,
             "target_uri": f"https://e.org/{i}"} for i in range(5)]
    out = list(parse_warc_auto(build_warc_gz(recs)))
    assert [r["payload"] for r in out] == [r["payload"] for r in recs]
    assert [r["target_uri"] for r in out] == [
        f"https://e.org/{i}" for i in range(5)]


def test_gzip_build_is_deterministic():
    from textract_demo_spark.sources.warc import build_warc_gz
    recs = [{"warc_type": "resource", "payload": b"abc" * 100}]
    assert build_warc_gz(recs) == build_warc_gz(recs)


def test_gzip_truncated_member_rejected():
    from textract_demo_spark.sources.warc import (build_warc_gz,
                                                  parse_warc_auto)
    data = build_warc_gz([{"warc_type": "resource", "payload": b"xyz"}])
    with pytest.raises(WarcFormatError, match="gzip"):
        list(parse_warc_auto(data[:-5]))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.binary(max_size=300), min_size=1, max_size=4))
def test_gzip_roundtrip_property(payloads):
    from textract_demo_spark.sources.warc import (build_warc_gz,
                                                  parse_warc_auto)
    recs = [{"warc_type": "resource", "payload": p} for p in payloads]
    out = list(parse_warc_auto(build_warc_gz(recs)))
    assert [r["payload"] for r in out] == payloads


def test_read_warc_mixed_layouts(spark, tmp_path):
    from textract_demo_spark.sources.warc import build_warc_gz
    recs = [{"warc_type": "resource", "payload": b"plain-side"}]
    (tmp_path / "a.warc").write_bytes(build_warc(recs))
    recs2 = [{"warc_type": "resource", "payload": b"gz-side"}]
    (tmp_path / "b.warc.gz").write_bytes(build_warc_gz(recs2))
    rows = read_warc(spark, f"{tmp_path}/*.warc*").collect()
    assert sorted(r["body"] for r in rows) == ["gz-side", "plain-side"]
