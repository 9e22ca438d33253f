"""WARC source tests (sources/warc.py)."""

import gzip


def _record(warc_type: str, uri: str, payload: bytes, rid: str = "<urn:uuid:1>") -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: text/plain\r\n\r\n".encode() + body
    )


def test_read_warc_content_length_framing(spark, tmp_path):
    """A payload CONTAINING the record marker must not split the
    record — framing is Content-Length, not marker search."""
    from alaska_etl_spark.sources.warc import read_warc

    tricky = _http(b"this page discusses WARC/1.0\r\n\r\nWARC-Type: fake\r\n")
    data = (
        _record("warcinfo", "", b"software: test\r\n", "<urn:uuid:0>")
        + _record("response", "http://a.example/x", _http(b"hello world"), "<urn:uuid:1>")
        + _record("response", "http://a.example/warc-page", tricky, "<urn:uuid:2>")
    )
    f = tmp_path / "crawl.warc"
    f.write_bytes(data)
    rows = read_warc(spark, str(f)).collect()
    assert [r.warc_type for r in rows] == ["warcinfo", "response", "response"]
    assert all(r.error is None for r in rows)
    by_id = {r.record_id: r for r in rows}
    assert bytes(by_id["<urn:uuid:2>"].payload) == tricky
    assert by_id["<urn:uuid:1>"].target_uri == "http://a.example/x"
    assert by_id["<urn:uuid:1>"].content_length == len(_http(b"hello world"))


def test_read_warc_gzip_and_multiple_files(spark, tmp_path):
    from alaska_etl_spark.sources.warc import read_warc

    (tmp_path / "a.warc").write_bytes(
        _record("response", "http://a/1", _http(b"A"), "<urn:uuid:a>")
    )
    (tmp_path / "b.warc.gz").write_bytes(
        gzip.compress(_record("response", "http://b/1", _http(b"B"), "<urn:uuid:b>"))
    )
    rows = read_warc(spark, str(tmp_path)).collect()
    assert {r.record_id for r in rows} == {"<urn:uuid:a>", "<urn:uuid:b>"}
    assert all(r.error is None for r in rows)


def test_read_warc_truncation_routes_not_throws(spark, tmp_path):
    from alaska_etl_spark.sources.warc import read_warc

    good = _record("response", "http://ok/1", _http(b"fine"), "<urn:uuid:ok>")
    # claim 999 bytes but provide 4: truncated tail
    bad_head = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\nxxxx"
    )
    (tmp_path / "t.warc").write_bytes(good + bad_head)
    rows = read_warc(spark, str(tmp_path / "t.warc")).collect()
    ok = [r for r in rows if r.error is None]
    bad = [r for r in rows if r.error is not None]
    assert len(ok) == 1 and ok[0].record_id == "<urn:uuid:ok>"
    assert len(bad) == 1 and bad[0].error == "truncated payload"
    assert bad[0].offset == len(good)


def test_response_bodies_split_and_binary_safe(spark, tmp_path):
    from alaska_etl_spark.sources.warc import read_warc, response_bodies

    binary_body = bytes(range(256))
    data = (
        _record("request", "http://a/1", b"GET / HTTP/1.1\r\n\r\n", "<urn:uuid:q>")
        + _record("response", "http://a/1", _http(binary_body, 404), "<urn:uuid:r>")
    )
    (tmp_path / "c.warc").write_bytes(data)
    out = response_bodies(read_warc(spark, str(tmp_path / "c.warc"))).collect()
    assert len(out) == 1  # request records filtered out
    r = out[0]
    assert r.http_status == 404
    assert bytes(r.body) == binary_body  # byte-exact through the split
