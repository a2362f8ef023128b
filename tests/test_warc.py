"""From-spec WARC codec + Spark reader (sources/warc_codec.py,
sources/warc.py): Content-Length-driven parsing (payloads containing
CRLFCRLF survive), loud rejection of malformed input, case-insensitive
fields, HTTP envelope stripping, and the distributed explode."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

import pytest

from terra_bonobo_nodes_spark.sources.warc import warc_reader
from terra_bonobo_nodes_spark.sources.warc_codec import (
    header,
    parse_warc_records,
    strip_http_envelope,
    write_warc_records,
)


def _rec(uri, payload, wtype="conversion", ctype="text/plain"):
    return {
        "headers": {
            "WARC-Type": wtype,
            "WARC-Target-URI": uri,
            "WARC-Date": "2026-08-15T00:00:00Z",
            "Content-Type": ctype,
        },
        "payload": payload,
    }


def test_roundtrip_multi_record():
    recs = [
        _rec("http://a.example/1", b"alpha body"),
        _rec("http://a.example/2", b""),
        _rec("http://a.example/3", b"\x00\xff binary \x01"),
    ]
    parsed = parse_warc_records(write_warc_records(recs))
    assert len(parsed) == 3
    for orig, got in zip(recs, parsed):
        assert got["version"] == "WARC/1.0"
        assert got["payload"] == bytes(orig["payload"])
        assert header(got["headers"], "warc-target-uri") == orig["headers"][
            "WARC-Target-URI"
        ]
        assert int(header(got["headers"], "content-length")) == len(orig["payload"])


def test_payload_containing_crlfcrlf_survives():
    # the case delimiter-scanning parsers get wrong: an HTTP envelope
    # inside the payload
    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>x</html>"
    parsed = parse_warc_records(
        write_warc_records(
            [
                _rec("http://a/1", body, "response", "application/http; msgtype=response"),
                _rec("http://a/2", b"after"),
            ]
        )
    )
    assert parsed[0]["payload"] == body
    assert parsed[1]["payload"] == b"after"


def test_strip_http_envelope():
    body = b"HTTP/1.1 200 OK\r\nX: y\r\n\r\n<html>hi</html>"
    assert strip_http_envelope(body) == b"<html>hi</html>"
    with pytest.raises(ValueError):
        strip_http_envelope(b"not http at all")


def test_malformed_inputs_raise_loudly():
    with pytest.raises(ValueError, match="not a WARC record"):
        parse_warc_records(b"GARBAGE\r\n\r\n")
    with pytest.raises(ValueError, match="unsupported WARC version"):
        parse_warc_records(b"WARC/0.18\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
    ok = write_warc_records([_rec("u", b"12345")])
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_records(ok[:-9])  # cut into the payload
    with pytest.raises(ValueError, match="line break"):
        write_warc_records([{"headers": {"X": "a\nb"}, "payload": b""}])


@settings(max_examples=25, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=64), min_size=1, max_size=5))
def test_arbitrary_payload_roundtrip(payloads):
    recs = [_rec(f"http://h/{i}", p) for i, p in enumerate(payloads)]
    parsed = parse_warc_records(write_warc_records(recs))
    assert [r["payload"] for r in parsed] == [bytes(p) for p in payloads]


def test_spark_reader_explodes_and_strips(spark):
    wet = write_warc_records(
        [_rec("http://h/1", "text one".encode()), _rec("http://h/2", b"text two")]
    )
    warc = write_warc_records(
        [
            _rec(
                "http://h/3",
                b"HTTP/1.1 200 OK\r\nA: b\r\n\r\n<html>three</html>",
                "response",
                "application/http; msgtype=response",
            )
        ]
    )
    df = spark.createDataFrame(
        [("f1.warc", bytearray(wet)), ("f2.warc", bytearray(warc))],
        "path string, content binary",
    )
    out = warc_reader(df, keep_cols=["path"], strip_http=True).collect()
    by_uri = {r["target_uri"]: r for r in out}
    assert set(by_uri) == {"http://h/1", "http://h/2", "http://h/3"}
    assert bytes(by_uri["http://h/1"]["payload"]) == b"text one"
    assert by_uri["http://h/1"]["warc_type"] == "conversion"
    assert by_uri["http://h/1"]["path"] == "f1.warc"
    assert bytes(by_uri["http://h/3"]["payload"]) == b"<html>three</html>"
    assert by_uri["http://h/3"]["warc_type"] == "response"


def test_spark_reader_null_content_skipped(spark):
    df = spark.createDataFrame(
        [("f1", None)], "path string, content binary"
    )
    assert warc_reader(df).collect() == []


def test_spark_reader_handles_warc_gz_member_per_record(spark):
    """Common Crawl's member-per-record gzip framing: each record its
    own gzip member, members concatenated — one decompress consumes
    them all."""
    import gzip as _gz

    members = b"".join(
        _gz.compress(write_warc_records([_rec(f"http://h/{i}", f"body {i}".encode())]))
        for i in range(3)
    )
    df = spark.createDataFrame(
        [("f.warc.gz", bytearray(members))], "path string, content binary"
    )
    out = warc_reader(df).collect()
    assert {r["target_uri"] for r in out} == {f"http://h/{i}" for i in range(3)}
    assert {bytes(r["payload"]) for r in out} == {f"body {i}".encode() for i in range(3)}
