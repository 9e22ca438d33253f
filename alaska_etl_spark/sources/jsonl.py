"""JSONL corpus source/sink — the interchange format LLM training-data
pipelines actually exchange (one JSON document per line, usually
gzipped). The reference's ingest surface is CSV/fixed-width/HTML/JSON-API
(SURVEY §2.1); this extends the same schema'd-read + bad-row-routing
discipline (sources/wind.py:30,73) to line-delimited JSON.

Design points, all Spark-native:

- **Schema'd PERMISSIVE read**: an explicit schema (never inference —
  at 100 TB a schema-inference pass is a full extra scan) plus Spark's
  ``columnNameOfCorruptRecord`` channel, so malformed lines become
  routable rows instead of job failures — the q15 sentinel philosophy
  applied to structural corruption.
- **The corrupt-record caveat**: Spark refuses a query that selects
  ONLY the corrupt-record column from a raw-parse relation (the parser
  would have nothing to fail on — see SPARK-21610); the split below
  routes through one ``tracked_persist`` of the parsed frame, which is
  also what keeps the clean/bad split ONE file scan instead of two.
- **Write**: gzip by default (line-splittable formats compress ~5-10×;
  at cluster scale prefer zstd where the codec is available),
  optionally partitioned — the writer is just the DataFrameWriter, no
  wrapping state.

No reference parity: the reference has no JSONL surface; file format
breadth is part of the beyond-reference pipeline story (SURVEY §2.14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from alaska_etl_spark.cache import tracked_persist

#: the corrupt-record routing column (kept un-prefixed with ``_`` so
#: ``df.columns`` round-trips through parquet sinks without escaping)
CORRUPT_COL = "corrupt_record"


def _with_corrupt_field(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType([*schema.fields, StructField(CORRUPT_COL, StringType(), True)])


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    multiline: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON under an explicit schema, returning
    ``(clean, bad)``: ``clean`` carries the schema's columns for every
    structurally valid line (missing fields are NULL — PERMISSIVE
    semantics), ``bad`` carries ``(corrupt_record)`` raw lines for the
    quarantine sink (the wind.split_bad_rows contract).

    One physical scan: the parsed frame is tracked_persist-ed and both
    halves filter it, which simultaneously satisfies Spark's
    corrupt-column restriction (SPARK-21610) and avoids re-reading the
    input for the bad half. Release via cache.release_tracked() once
    both halves are consumed (bench/pipeline discipline).
    """
    full = _with_corrupt_field(schema)
    parsed = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", multiline)
        .json(path)
    )
    parsed = tracked_persist(parsed)
    clean = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    compression: str = "gzip",
    partition_by: list[str] | None = None,
    mode: str = "error",
) -> None:
    """Write a corpus as (compressed) JSONL. Partitioning by a
    low-cardinality column (source, language, split) gives downstream
    readers partition pruning for free; compression is per-file, so
    parallelism is preserved (each task writes its own .gz part)."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def jsonl_roundtrip_audit(
    spark: SparkSession, in_path: str, schema: StructType
) -> DataFrame:
    """One-row ingest audit for a JSONL drop: clean/bad line counts and
    the bad share (4dp, div_half_up) — the load-observability row the
    warehouse audit appends per batch (plans/warehouse.py:186)."""
    from alaska_etl_spark.functions.fixedpoint import div_half_up

    clean, bad = read_jsonl(spark, in_path, schema)
    counts = clean.select(
        F.count(F.lit(1)).cast("bigint").alias("clean_rows")
    ).crossJoin(bad.select(F.count(F.lit(1)).cast("bigint").alias("bad_rows")))
    return counts.select(
        "clean_rows",
        "bad_rows",
        (
            div_half_up("bad_rows", "nullif(clean_rows + bad_rows, 0)", 10000) / 10000.0
        ).alias("bad_share"),
    )
