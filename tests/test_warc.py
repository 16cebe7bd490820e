"""WARC source (sources/warc.py): record parsing, HTTP splitting, the
composed WARC -> html_to_text documents head, and the lenient
degradation contract — all against an independently-written test-side
WARC writer (plain and per-record-gzip files, warcinfo/request/
response records, truncation and corruption cases)."""

import gzip

from pyspark.sql import functions as F

from mapreduce_task_spark.sources.warc import (
    iter_warc_records,
    split_http_response,
    warc_http_responses,
    warc_records,
    warc_to_documents,
)

# --------------------------------------------------------------------------
# independent writer


def _record(rtype, rid, body: bytes, uri=None, ctype=None, date=None):
    h = [
        b"WARC/1.0",
        b"WARC-Type: " + rtype.encode(),
        b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">",
        b"WARC-Date: " + (date or "2026-08-17T00:00:00Z").encode(),
        b"Content-Length: " + str(len(body)).encode(),
    ]
    if uri:
        h.append(b"WARC-Target-URI: " + uri.encode())
    if ctype:
        h.append(b"Content-Type: " + ctype.encode())
    return b"\r\n".join(h) + b"\r\n\r\n" + body + b"\r\n\r\n"


def _http(status, ctype, body: bytes, reason=b"OK"):
    return (
        b"HTTP/1.1 " + str(status).encode() + b" " + reason + b"\r\n"
        b"Content-Type: " + ctype.encode() + b"\r\n"
        b"Server: test\r\n\r\n" + body
    )


_HTML_A = b"<html><head><title>T</title></head><body><p>alpha page</p></body></html>"
_HTML_B = b"<html><body><div>beta &amp; gamma</div></body></html>"


def _warc_file():
    return (
        _record("warcinfo", "info1", b"software: test-writer\r\n",
                ctype="application/warc-fields")
        + _record("request", "req1", b"GET / HTTP/1.1\r\nHost: a\r\n\r\n",
                  uri="http://a.example/")
        + _record(
            "response", "resp1",
            _http(200, "text/html; charset=utf-8", _HTML_A),
            uri="http://a.example/", ctype="application/http; msgtype=response",
        )
        + _record(
            "response", "resp2",
            _http(404, "text/html", b"<html><body>gone</body></html>"),
            uri="http://a.example/missing",
            ctype="application/http; msgtype=response",
        )
        + _record(
            "response", "resp3",
            _http(200, "image/png", b"\x89PNGnotreally"),
            uri="http://a.example/logo.png",
            ctype="application/http; msgtype=response",
        )
    )


def _warc_gz_file():
    # per-record gzip members, the standard .warc.gz layout
    recs = [
        _record("warcinfo", "ginfo", b"software: test-writer\r\n"),
        _record(
            "response", "gresp",
            _http(200, "text/html", _HTML_B),
            uri="http://b.example/x", ctype="application/http",
        ),
    ]
    return b"".join(gzip.compress(r) for r in recs)


# --------------------------------------------------------------------------
# pure-parser units


def test_iter_warc_records_roundtrip():
    got = list(iter_warc_records(_warc_file()))
    assert [h["warc-type"] for h, _ in got] == [
        "warcinfo", "request", "response", "response", "response",
    ]
    h3, body3 = got[2]
    assert h3["warc-target-uri"] == "http://a.example/"
    status, ctype, body = split_http_response(body3)
    assert (status, ctype) == (200, "text/html; charset=utf-8")
    assert body == _HTML_A


def test_iter_warc_records_lenient_truncation():
    data = _warc_file()
    # cut mid-content-block of the last record
    got = list(iter_warc_records(data[:-20]))
    assert len(got) == 4  # records before the fault survive
    import pytest

    with pytest.raises(ValueError):
        list(iter_warc_records(data[:-20], strict=True))
    with pytest.raises(ValueError):  # nothing parseable at all
        list(iter_warc_records(b"totally not warc data"))


def test_split_http_response_rejects_non_http():
    assert split_http_response(b"not http at all") == (None, None, b"")
    assert split_http_response(b"junk\r\n\r\nbody") == (None, None, b"")


# --------------------------------------------------------------------------
# Spark surface


def _write_fixture(tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "a.warc").write_bytes(_warc_file())
    (d / "b.warc.gz").write_bytes(_warc_gz_file())
    return str(d)


def test_warc_records_both_container_forms(spark, tmp_path):
    recs = warc_records(spark, _write_fixture(tmp_path) + "/*")
    rows = recs.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["warc_type"], []).append(r)
    assert len(by_type["response"]) == 4  # 3 plain + 1 gz
    assert len(by_type["warcinfo"]) == 2
    assert "_error" not in by_type
    ids = {r["record_id"] for r in by_type["response"]}
    assert "<urn:uuid:gresp>" in ids  # the gzip member parsed
    r1 = next(r for r in by_type["response"] if "resp1" in r["record_id"])
    assert r1["content_length"] == len(
        _http(200, "text/html; charset=utf-8", _HTML_A)
    )


def test_warc_http_responses_split(spark, tmp_path):
    http = warc_http_responses(
        warc_records(spark, _write_fixture(tmp_path) + "/*")
    )
    rows = {r["record_id"]: r for r in http.collect()}
    assert len(rows) == 4
    a = rows["<urn:uuid:resp1>"]
    assert a["http_status"] == 200
    assert a["http_content_type"] == "text/html; charset=utf-8"
    assert bytes(a["body"]) == _HTML_A
    assert rows["<urn:uuid:resp2>"]["http_status"] == 404
    assert rows["<urn:uuid:resp3>"]["http_content_type"] == "image/png"


def test_warc_to_documents_composed_head(spark, tmp_path):
    docs = warc_to_documents(spark, _write_fixture(tmp_path) + "/*")
    rows = {r["url"]: r for r in docs.collect()}
    # 200 + text/html only: the 404 page and the PNG are screened out
    assert set(rows) == {"http://a.example/", "http://b.example/x"}
    # the <head> block (title included) strips with the markup
    assert rows["http://a.example/"]["text"] == "alpha page"
    assert rows["http://b.example/x"]["text"] == "beta & gamma"
    assert all(r["doc_id"] is not None for r in rows.values())
    assert len({r["doc_id"] for r in rows.values()}) == 2


def test_warc_corrupt_file_degrades_to_error_row(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "good.warc").write_bytes(_warc_file())
    (d / "bad.warc").write_bytes(b"garbage that is not warc")
    (d / "badgz.warc.gz").write_bytes(b"\x1f\x8b\x08corrupt-not-gzip")
    recs = warc_records(spark, str(d) + "/*")
    errs = recs.filter(F.col("warc_type") == "_error").collect()
    assert len(errs) == 2
    ok = recs.filter(F.col("warc_type") == "response").count()
    assert ok == 3  # the good file is unaffected
