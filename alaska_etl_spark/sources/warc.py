"""WARC (Web ARChive, ISO 28500) source — the container format web-scale
training corpora actually arrive in (Common Crawl publishes WARC; every
public LLM data pipeline starts by splitting these records). The
reference's ingest surface is CSV/fixed-width/HTML/JSON-API (SURVEY
§2.1); this extends the format breadth the same way the JSONL source
does, with the same explicit-schema + bad-record-routing discipline.

Parsing model — why this shape:

- **Record framing is Content-Length-driven, never marker-split.** A
  WARC payload may legally CONTAIN the bytes ``WARC/1.0`` (an archived
  page about WARC, a crawled WARC file), so splitting on the version
  marker corrupts records; the spec's framing is the ``Content-Length``
  header followed by exactly that many payload bytes and a CRLF CRLF
  trailer. The parser honors it (and the unit tests plant a payload
  containing the marker to pin this).
- **Files parse whole, records emit as rows.** WARC members are not
  line-splittable; the distributed unit is the FILE (Common Crawl keeps
  files ~1 GB for exactly this reason). ``spark.read.format
  ("binaryFile")`` distributes files across executors; an Arrow-batched
  ``mapInPandas`` walks each file's bytes sequentially — per-record
  Python cost amortized across the batch. Memory is proportional to
  the DECOMPRESSED file (binaryFile materializes the file's bytes and
  a gzip member inflates whole in the executor — a ~1 GB gzipped
  Common Crawl file can expand to several GB per task), so executor
  sizing must budget for max-decompressed-file, or files must be
  member-split upstream; see the Gzip note below.
  At 100 TB the parallelism is the file count (100k+ files), which is
  the grain the format itself mandates.
- **Gzip**: whole-file gzip members are detected by magic bytes and
  inflated in the parser (the container has no splittable-codec
  runtime; at cluster scale, per-record-gzip Common Crawl files can
  additionally be member-split upstream).
- **Corruption routes, never throws**: a malformed header or truncated
  payload stops that FILE's parse and emits one ``error`` row carrying
  the byte offset and reason — the remaining files are unaffected (the
  wind.py bad-row contract, at file grain).

HTTP ``response`` records carry an HTTP message as payload;
:func:`response_bodies` splits status line / headers / body at the
first CRLF CRLF per the WARC spec's ``application/http`` content type.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_SCHEMA = (
    "file string, offset bigint, warc_type string, record_id string, "
    "target_uri string, warc_date string, content_length bigint, "
    "payload binary, error string"
)


def _parse_warc_bytes(name: str, data: bytes) -> Iterator[dict]:
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except OSError as e:
            yield {
                "file": name, "offset": 0, "warc_type": None,
                "record_id": None, "target_uri": None, "warc_date": None,
                "content_length": None, "payload": None,
                "error": f"gzip: {e}",
            }
            return
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        start = pos
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0 or not data.startswith(b"WARC/", pos):
            yield {
                "file": name, "offset": start, "warc_type": None,
                "record_id": None, "target_uri": None, "warc_date": None,
                "content_length": None, "payload": None,
                "error": "malformed record header",
            }
            return
        headers: dict[str, str] = {}
        lines = data[pos:head_end].split(b"\r\n")
        for line in lines[1:]:  # lines[0] is the version
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            yield {
                "file": name, "offset": start, "warc_type": None,
                "record_id": None, "target_uri": None, "warc_date": None,
                "content_length": None, "payload": None,
                "error": "missing/invalid Content-Length",
            }
            return
        body_start = head_end + 4
        if body_start + clen > n:
            yield {
                "file": name, "offset": start, "warc_type": None,
                "record_id": None, "target_uri": None, "warc_date": None,
                "content_length": None, "payload": None,
                "error": "truncated payload",
            }
            return
        yield {
            "file": name,
            "offset": start,
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_length": clen,
            "payload": data[body_start : body_start + clen],
            "error": None,
        }
        pos = body_start + clen


def _records_frame(binary: DataFrame) -> DataFrame:
    """Parse a ``(path, content)`` binary-file frame (batch or stream —
    ``mapInPandas`` is stream-capable) into one row per WARC record."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "file", "offset", "warc_type", "record_id", "target_uri",
            "warc_date", "content_length", "payload", "error",
        ]
        for pdf in batches:
            rows = [
                rec
                for name, blob in zip(pdf["path"], pdf["content"])
                for rec in _parse_warc_bytes(name, bytes(blob))
            ]
            yield pd.DataFrame(rows, columns=cols)

    return binary.mapInPandas(parse, RECORD_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC file(s) into one row per record: ``(file, offset,
    warc_type, record_id, target_uri, warc_date, content_length,
    payload, error)``. Rows with non-NULL ``error`` are the quarantine
    channel (one per corrupted file tail). Files distribute across
    executors; each parses sequentially with memory proportional to the
    decompressed file (see the module docstring's sizing note).
    """
    binary = spark.read.format("binaryFile").load(path).select("path", "content")
    return _records_frame(binary)


# binaryFile's schema is fixed by the format; a streaming file source
# requires it stated explicitly.
_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length bigint, content binary"
)


def stream_warc(spark: SparkSession, path: str) -> DataFrame:
    """Streaming form of :func:`read_warc`: a ``binaryFile`` file-source
    stream over a crawl drop directory — each newly arrived WARC file
    becomes one unit of work, parsed into the same record rows as the
    batch reader. File-discovery offsets live in the query's checkpoint,
    so each file is parsed exactly once across restarts; combine with
    the idempotent warehouse sink (``streaming.incremental.
    stream_warc_gate``) for end-to-end replay safety. At crawl scale the
    stream's parallelism is arriving-file count — the same grain the
    batch path distributes on."""
    binary = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .load(path)
        .select("path", "content")
    )
    return _records_frame(binary)


def response_bodies(records: DataFrame) -> DataFrame:
    """Split ``response`` records' HTTP payloads into status + body:
    ``(file, target_uri, warc_date, http_status, body)`` — the frame a
    text-extraction pipeline consumes. Pure codegen on the parsed
    frame: the status code is a regexp over the first line, the body
    starts after the first CRLF CRLF (``instr``/``substring`` byte
    math on the payload decoded latin-1 — a bijective byte↔char map,
    so offsets are exact and binary bodies survive round-trip).
    """
    text = F.decode(F.col("payload"), "ISO-8859-1")
    sep = F.instr(text, "\r\n\r\n")
    return (
        records.filter((F.col("error").isNull()) & (F.col("warc_type") == "response"))
        .select(
            "file",
            "target_uri",
            "warc_date",
            F.regexp_extract(text, r"^HTTP/[0-9.]+ (\d{3})", 1)
            .cast("int")
            .alias("http_status"),
            F.when(
                sep > 0, F.encode(F.substring(text, sep + 4, 2_000_000_000), "ISO-8859-1")
            ).alias("body"),
        )
    )


def warc_text_documents(records: DataFrame) -> DataFrame:
    """Records → the gate-ready documents frame: ``(doc_id, text,
    source, warc_date)``. Successful (status-200, non-empty-body) HTTP
    responses only; the body decodes as UTF-8 with replacement (crawl
    payloads lie about charsets — replacement keeps the row and the
    fingerprint deterministic rather than failing the batch). The
    document id is the target URI — the crawl's natural key; the
    dedup-keep-first protocol downstream orders on it, and the
    fingerprint (computed over scrubbed text by the gate) remains the
    cross-batch dedup key, so re-crawls of one URI with identical
    content collapse while content changes land. Pure codegen on the
    parsed frame; works on batch and streaming records alike."""
    return (
        response_bodies(records)
        .filter((F.col("http_status") == 200) & F.col("body").isNotNull())
        .select(
            F.col("target_uri").alias("doc_id"),
            F.decode(F.col("body"), "UTF-8").alias("text"),
            F.col("file").alias("source"),
            "warc_date",
        )
        .filter(F.length("text") > 0)
    )
