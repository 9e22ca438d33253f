"""Persisted mergeable-sketch rollups: the continuous-aggregate pattern
(plans/rollup.py) extended to the two aggregates that DON'T decompose
into sum/count partials — COUNT(DISTINCT) and quantiles.

The q87 rollup stores mergeable partials (count/sum/min/max) per hour
so a refresh touches only affected buckets. Distinct counts and
percentiles have no exact bounded partial — their exact state is the
value set / the sorted data. Datasketches gives both a MERGEABLE
bounded-size summary: HLL sketches union losslessly (union of sketches
= sketch of union, the HLL merge theorem), KLL quantile sketches merge
with bounded rank error. So the store writes ONE sketch row per
(bucket, key) — kilobytes — and any time-range query becomes a merge
of pre-built sketches: no rescan of the raw facts, ever.

At 100 TB this is the difference between "distinct users last 90 days"
re-reading 90 days of events and merging 90 sketch rows. Incremental by
construction: a new day appends its sketch row; late data re-sketches
one bucket (the same partition-scoped overwrite as q87).

Estimates are engine-defined (rows-only in the driver gate, like every
sketch here); the exact companions and the error-bound contracts are
pinned in tests/test_sketch_store.py, and qc5 carries the
merged-vs-exact pair so the tolerance is visible in the query surface
itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_sketch_rollup",
    "append_sketch_rollup",
    "merged_distinct_count",
    "merged_quantiles",
]


def _bucketed(df: DataFrame, ts_col: str, id_col: str, val_col: str) -> DataFrame:
    return df.select(
        F.date_trunc("day", F.col(ts_col)).alias("bucket"),
        F.col(id_col).alias("_id"),
        F.col(val_col).cast("double").alias("_v"),
    )


def write_sketch_rollup(
    df: DataFrame,
    path: str,
    *,
    ts_col: str,
    id_col: str,
    val_col: str,
    lg_k: int = 12,
    kll_k: int = 200,
    mode: str = "overwrite",
) -> None:
    """One row per day: an HLL sketch of ``id_col`` (distinct entities)
    and a KLL sketch of ``val_col`` (value distribution), partitioned by
    bucket so late-data refresh overwrites one partition. lg_k=12 →
    ~1.6% HLL RSE at 2–4 KB; kll_k=200 → ~1.7% max rank error."""
    sk = (
        _bucketed(df, ts_col, id_col, val_col)
        .groupBy("bucket")
        .agg(
            F.hll_sketch_agg(F.col("_id"), F.lit(lg_k)).alias("hll_ids"),
            F.kll_sketch_agg_double(F.col("_v"), F.lit(kll_k)).alias("kll_vals"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    sk.write.mode(mode).partitionBy("bucket").parquet(path)


def append_sketch_rollup(df: DataFrame, path: str, **kw) -> None:
    """Sketch a new batch into the store (one row per new day)."""
    write_sketch_rollup(df, path, mode="append", **kw)


def merged_distinct_count(
    spark: SparkSession,
    path: str,
    *,
    start=None,
    end=None,
) -> DataFrame:
    """Distinct-entity estimate over a bucket range by UNIONING the
    stored HLL sketches — the range filter prunes at the partition
    level; the union is one tiny aggregate over ≤ |days| rows.

    The union runs in ONE partition, sorted by bucket (r12): an HLL
    union's estimate is not bit-invariant to how partial unions are
    grouped (sparse→dense promotion paths differ), so letting the scan
    planner's file packing pick the grouping made the merged estimate a
    function of the store's FILE LAYOUT — the same store answered
    differently as ``spark.sql.files.*`` split sizing changed (caught
    by test_incremental_append_equals_one_shot when the r12 scan floor
    landed). Sketch rows are KB-per-bucket; even a decade of daily
    buckets is a few thousand rows, so the single-task merge is the
    100 TB shape anyway."""
    sk = spark.read.parquet(path)
    if start is not None:
        sk = sk.filter(F.col("bucket") >= start)
    if end is not None:
        sk = sk.filter(F.col("bucket") < end)
    sk = sk.coalesce(1).sortWithinPartitions("bucket")
    return sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll_ids")).alias("n_distinct_est"),
        F.sum("n_rows").alias("n_rows"),
    )


def merged_quantiles(
    spark: SparkSession,
    path: str,
    probs: list[float],
    *,
    start=None,
    end=None,
) -> DataFrame:
    """Value quantile estimates over a bucket range by MERGING the
    stored KLL sketches — single sorted partition for the same
    layout-invariance reason as :func:`merged_distinct_count` (KLL
    merge is rank-error-bounded but not grouping-invariant either)."""
    sk = spark.read.parquet(path)
    if start is not None:
        sk = sk.filter(F.col("bucket") >= start)
    if end is not None:
        sk = sk.filter(F.col("bucket") < end)
    sk = sk.coalesce(1).sortWithinPartitions("bucket")
    merged = sk.agg(F.kll_merge_agg_double("kll_vals").alias("_m"))
    return merged.select(
        *[
            F.kll_sketch_get_quantile_double(F.col("_m"), F.lit(p)).alias(
                f"p{int(p * 100):02d}"
            )
            for p in probs
        ]
    )
