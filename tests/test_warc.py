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


GOOD = (
    "The quarterly report shows steady improvement across all regional "
    "offices, with customer satisfaction rising for the third consecutive "
    "period and operational costs holding flat despite expansion."
)
SPAM = "buy buy buy buy buy buy buy buy buy buy buy buy buy buy buy buy"


def _warc_file(path, pages):
    """pages: list of (uri, text) → one WARC file of 200-responses."""
    data = b"".join(
        _record("response", uri, _http(text.encode()), f"<urn:uuid:{i}>")
        for i, (uri, text) in enumerate(pages)
    )
    path.write_bytes(data)


def test_stream_warc_gate_end_to_end_and_replay(spark, tmp_path):
    """VERDICT r6 #5: WARC file stream → response_bodies → quality gate
    → idempotent append; new files admit only new content, checkpoint
    loss replays admit nothing (at-least-once source + idempotent
    sink)."""
    from alaska_etl_spark.plans.warehouse import Warehouse
    from alaska_etl_spark.sources.warc import stream_warc
    from alaska_etl_spark.streaming.incremental import stream_warc_gate

    src = tmp_path / "crawl"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    _warc_file(src / "f1.warc", [("http://a/1", GOOD), ("http://a/2", SPAM)])
    stream_warc_gate(stream_warc(spark, str(src)), wh, "docs", ckpt)
    landed = {r.doc_id for r in wh.read("docs").collect()}
    assert landed == {"http://a/1"}  # spam gated out

    # second file: a new page, plus a re-crawl of page 1's exact content
    # under a NEW uri — the fingerprint anti-join must drop it
    _warc_file(
        src / "f2.warc",
        [("http://b/3", GOOD + " Updated with new regional figures."),
         ("http://b/1-mirror", GOOD)],
    )
    stream_warc_gate(stream_warc(spark, str(src)), wh, "docs", ckpt)
    landed = {r.doc_id for r in wh.read("docs").collect()}
    assert landed == {"http://a/1", "http://b/3"}

    # checkpoint loss: every file replays; the idempotent sink admits 0
    import shutil

    shutil.rmtree(ckpt)
    stream_warc_gate(stream_warc(spark, str(src)), wh, "docs", ckpt)
    assert {r.doc_id for r in wh.read("docs").collect()} == landed
    assert wh.read("docs").count() == 2


def test_stream_warc_gate_routes_errors_durably(spark, tmp_path):
    from alaska_etl_spark.plans.warehouse import Warehouse
    from alaska_etl_spark.sources.warc import stream_warc
    from alaska_etl_spark.streaming.incremental import stream_warc_gate

    src = tmp_path / "crawl"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    _warc_file(src / "good.warc", [("http://a/1", GOOD)])
    (src / "bad.warc").write_bytes(b"NOT A WARC FILE AT ALL\r\n\r\n")
    stream_warc_gate(stream_warc(spark, str(src)), wh, "docs", ckpt)

    assert {r.doc_id for r in wh.read("docs").collect()} == {"http://a/1"}
    errs = wh.read("docs_errors").collect()
    assert len(errs) == 1
    assert errs[0].error == "malformed record header"
    assert errs[0].file.endswith("bad.warc")

    # replay after checkpoint loss: the error row must not double-log
    import shutil

    shutil.rmtree(ckpt)
    stream_warc_gate(stream_warc(spark, str(src)), wh, "docs", ckpt)
    assert wh.read("docs_errors").count() == 1


# --- hypothesis round-trip pin for the Content-Length framing (r6 #8) --

from hypothesis import given, settings
from hypothesis import strategies as st

# payloads are adversarial by construction: arbitrary bytes interleaved
# with the record marker, header-terminator sequences, and whole gzip
# members — everything a marker-splitting parser would trip over.
_chunk = st.one_of(
    st.binary(max_size=40),
    st.just(b"WARC/1.0"),
    st.just(b"\r\n\r\n"),
    st.just(b"WARC-Type: response\r\n"),
    st.binary(max_size=20).map(lambda b: gzip.compress(b)),
)
_payload = st.lists(_chunk, max_size=6).map(b"".join)
_uri = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), max_size=30
).map(lambda s: "http://h/" + s)
_rec = st.tuples(
    st.sampled_from(["response", "request", "warcinfo", "metadata"]),
    _uri,
    _payload,
    st.booleans(),  # upper-case header names (parser must be case-insensitive)
)


def _serialize(i, warc_type, uri, payload, upper):
    def h(k):
        return k.upper() if upper else k

    head = (
        f"WARC/1.0\r\n"
        f"{h('WARC-Type')}: {warc_type}\r\n"
        f"{h('WARC-Record-ID')}: <urn:uuid:{i}>\r\n"
        f"{h('WARC-Target-URI')}: {uri}\r\n"
        f"{h('Content-Length')}: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


@given(recs=st.lists(_rec, min_size=1, max_size=8), gz=st.booleans())
@settings(max_examples=200, deadline=None)
def test_parse_warc_roundtrip_property(recs, gz):
    """serialize(records) → parse == records, for payloads containing
    the record marker, CRLF CRLF runs, and gzip members — the
    Content-Length framing cannot be fooled by payload content; whole-
    file gzip inflates transparently."""
    from alaska_etl_spark.sources.warc import _parse_warc_bytes

    data = b"".join(_serialize(i, *r) for i, r in enumerate(recs))
    if gz:
        data = gzip.compress(data)
    rows = list(_parse_warc_bytes("f", data))
    assert len(rows) == len(recs)
    for i, (row, (warc_type, uri, payload, _)) in enumerate(zip(rows, recs)):
        assert row["error"] is None
        assert row["warc_type"] == warc_type
        assert row["record_id"] == f"<urn:uuid:{i}>"
        assert row["target_uri"] == uri
        assert row["content_length"] == len(payload)
        assert row["payload"] == payload


def test_stream_warc_matches_batch_reader(spark, tmp_path):
    """The streaming source parses byte-identically to the batch
    reader: same records, same payloads, same error rows — one parser,
    two discovery mechanisms."""
    from alaska_etl_spark.sources.warc import read_warc, stream_warc
    from alaska_etl_spark.streaming.incremental import run_available_now

    src = tmp_path / "crawl"
    src.mkdir()
    data = (
        _record("warcinfo", "", b"software: t\r\n", "<urn:uuid:0>")
        + _record("response", "http://a/1", _http(b"hello WARC/1.0 inside"), "<urn:uuid:1>")
    )
    (src / "f1.warc").write_bytes(data)
    (src / "bad.warc").write_bytes(b"garbage that is not a record\r\n\r\n")
    gz = gzip.compress(_record("response", "http://a/2", _http(b"zipped"), "<urn:uuid:2>"))
    (src / "f2.warc.gz").write_bytes(gz)

    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    run_available_now(stream_warc(spark, str(src)), str(out), str(ckpt))

    def key(r):
        return (r.file, r.offset, r.warc_type, r.record_id, r.target_uri,
                r.content_length, bytes(r.payload) if r.payload is not None else None,
                r.error)

    batch = sorted(map(key, read_warc(spark, str(src)).collect()))
    stream = sorted(map(key, spark.read.parquet(str(out)).collect()))
    assert stream == batch
    assert any(r[-1] == "malformed record header" for r in stream)
