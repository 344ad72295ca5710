"""WARC ingest (sources/warc): ISO 28500 framing, Common Crawl
gzip-member layout, HTTP payload split, truncation valve, malformed
resync, and composition with the HTML→text chain."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from psy_supabase_spark.sources import warc


def _record(
    wtype: str,
    payload: bytes,
    *,
    uri: str = "http://example.com/a",
    rid: str = "<urn:uuid:1>",
    ctype: str = "application/http; msgtype=response",
) -> bytes:
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return hdr + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n\r\n".encode() + body
    )


HTML = b"<html><body><h1>T</h1><p>hello warc world</p></body></html>"


def test_iter_records_and_http_split():
    blob = _record("warcinfo", b"software: test", ctype="application/warc-fields")
    blob += _record("response", _http(HTML))
    blob += _record("request", _http(b"", 0), ctype="application/http; msgtype=request")
    recs = list(warc.iter_warc_records(blob))
    assert [r[0]["warc-type"] for r in recs] == ["warcinfo", "response", "request"]
    status, body = warc.split_http_payload(recs[1][1])
    assert status == 200 and body == HTML
    # non-HTTP payload passes through untouched
    status, body = warc.split_http_payload(b"plain text")
    assert status is None and body == b"plain text"


def test_malformed_record_resyncs():
    good = _record("response", _http(HTML))
    # record claiming more bytes than exist, followed by a good record
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999999\r\n\r\nxx"
    )
    recs = list(warc.iter_warc_records(bad + good))
    assert len(recs) == 1 and recs[0][0]["warc-type"] == "response"
    # garbage prefix before the first magic
    recs = list(warc.iter_warc_records(b"\x00\x01junk" + good))
    assert len(recs) == 1


def test_gunzip_members_multi():
    a = gzip.compress(_record("response", _http(b"one")))
    b = gzip.compress(_record("response", _http(b"two")))
    data = warc.gunzip_members(a + b)
    recs = list(warc.iter_warc_records(data))
    assert [warc.split_http_payload(p)[1] for _f, p in recs] == [b"one", b"two"]


def test_read_warc_end_to_end(spark, tmp_path):
    shard = b"".join(
        [
            _record("warcinfo", b"software: t", ctype="application/warc-fields"),
            _record("response", _http(HTML), uri="http://example.com/page1"),
            _record(
                "request", _http(b"", 0), ctype="application/http; msgtype=request"
            ),
            _record("response", _http(b"x" * 64), uri="http://example.com/page2"),
        ]
    )
    # one plain shard + one gzip-member shard (the Common Crawl layout)
    (tmp_path / "a.warc").write_bytes(shard)
    (tmp_path / "b.warc.gz").write_bytes(
        gzip.compress(_record("response", _http(b"gz body"), uri="http://example.com/gz"))
    )
    df = warc.read_warc(spark, str(tmp_path), max_payload_bytes=32)
    rows = {r.target_uri: r for r in df.collect()}
    assert set(rows) == {
        "http://example.com/page1",
        "http://example.com/page2",
        "http://example.com/gz",
    }
    assert all(r.warc_type == "response" and r.http_status == 200 for r in rows.values())
    # truncation valve: payload cut at 32, true length kept
    big = rows["http://example.com/page2"]
    assert big.truncated and len(big.payload) == 32 and big.n_bytes == 64
    small = rows["http://example.com/gz"]
    assert not small.truncated and bytes(small.payload) == b"gz body"
    # keep-all mode sees every record type
    all_types = {
        r.warc_type
        for r in warc.read_warc(spark, str(tmp_path), record_types=()).collect()
    }
    assert all_types == {"warcinfo", "response", "request"}


def test_warc_to_html_text_composition(spark, tmp_path):
    """The ingest boundary composes with the WET-style extraction chain:
    WARC response bytes → html_to_text → clean text rows."""
    from psy_supabase_spark.functions.html import html_to_text

    (tmp_path / "c.warc.gz").write_bytes(
        gzip.compress(_record("response", _http(HTML)))
    )
    df = warc.read_warc(spark, str(tmp_path))
    out = df.select(
        "target_uri",
        html_to_text(F.col("payload").cast("string")).alias("text"),
    ).collect()
    assert len(out) == 1
    assert "hello warc world" in out[0].text
    assert "<p>" not in out[0].text


def test_read_wet_conversion_records(spark, tmp_path):
    wet = _record(
        "conversion",
        "extracted text body\nsecond line".encode(),
        uri="http://example.com/wet",
        ctype="text/plain",
    )
    (tmp_path / "x.warc.wet.gz").write_bytes(gzip.compress(wet))
    rows = warc.read_wet(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.target_uri == "http://example.com/wet"
    assert r.text == "extracted text body\nsecond line"
    assert not r.truncated
