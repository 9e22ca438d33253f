"""JSONL source/sink (sources/jsonl.py): schema'd PERMISSIVE read with
corrupt-record routing, round-trip write, ingest audit."""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from alaska_etl_spark.sources.jsonl import (
    CORRUPT_COL,
    jsonl_roundtrip_audit,
    read_jsonl,
    write_jsonl,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def _write_lines(path, lines):
    path.write_text("\n".join(lines) + "\n")


def test_read_jsonl_routes_corrupt_lines(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    good = [
        {"doc_id": 1, "text": "hello world", "lang": "en"},
        {"doc_id": 2, "text": "bonjour", "lang": "fr"},
    ]
    _write_lines(
        p,
        [json.dumps(good[0]), '{"doc_id": 3, "text": "broken', json.dumps(good[1]), "not json at all"],
    )
    clean, bad = read_jsonl(spark, str(p), SCHEMA)
    rows = {r.doc_id: r for r in clean.collect()}
    assert set(rows) == {1, 2}
    assert rows[1].text == "hello world" and rows[2].lang == "fr"
    assert CORRUPT_COL not in clean.columns
    bad_lines = [r[CORRUPT_COL] for r in bad.collect()]
    assert sorted(bad_lines) == sorted(['{"doc_id": 3, "text": "broken', "not json at all"])


def test_read_jsonl_missing_fields_are_null_not_corrupt(spark, tmp_path):
    p = tmp_path / "sparse.jsonl"
    _write_lines(p, [json.dumps({"doc_id": 5}), json.dumps({"text": "no id"})])
    clean, bad = read_jsonl(spark, str(p), SCHEMA)
    assert bad.count() == 0
    got = clean.orderBy(F.col("doc_id").asc_nulls_last()).collect()
    assert got[0].doc_id == 5 and got[0].text is None
    assert got[1].doc_id is None and got[1].text == "no id"


def test_write_jsonl_roundtrip_gzip_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", "de"), (3, "c", "en")],
        "doc_id bigint, text string, lang string",
    )
    out = tmp_path / "out"
    write_jsonl(df, str(out), partition_by=["lang"])
    # physical layout: lang=... dirs with .gz parts
    langs = {d.name for d in out.iterdir() if d.name.startswith("lang=")}
    assert langs == {"lang=en", "lang=de"}
    gz = [f for f in (out / "lang=en").iterdir() if f.suffix == ".gz"]
    assert gz, "expected gzip parts"
    with gzip.open(gz[0], "rt") as fh:
        json.loads(fh.readline())  # parses as JSON
    back, bad = read_jsonl(spark, str(out), SCHEMA)
    assert bad.count() == 0
    # partition column comes back from the directory layout
    got = {(r.doc_id, r.lang) for r in back.select("doc_id", "lang").collect()}
    assert got == {(1, "en"), (2, "de"), (3, "en")}


def test_jsonl_roundtrip_audit(spark, tmp_path):
    p = tmp_path / "mix.jsonl"
    _write_lines(
        p,
        [json.dumps({"doc_id": i, "text": "t", "lang": "en"}) for i in range(3)]
        + ["oops"],
    )
    r = jsonl_roundtrip_audit(spark, str(p), SCHEMA).collect()[0]
    assert (r.clean_rows, r.bad_rows) == (3, 1)
    assert r.bad_share == 0.25
