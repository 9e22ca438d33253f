"""Salted skew mitigation: two-phase aggregates and replicated joins
must be value-identical to their plain equivalents on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from alaska_etl_spark.operators.skew import salted_aggregate, salted_broadcast_join


def _skewed(spark):
    """99% of rows share one key."""
    return spark.range(2000).select(
        F.when(F.col("id") % 100 < 99, "hot").otherwise(F.concat(F.lit("cold"), F.col("id") % 7)).alias("k"),
        (F.col("id") % 13).cast("double").alias("v"),
    )


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    got = {
        r.k: (r.n, r.total, r.lo, r.hi, round(r.mean, 9))
        for r in salted_aggregate(
            df, ["k"],
            {"n": ("count", "v"), "total": ("sum", "v"), "lo": ("min", "v"),
             "hi": ("max", "v"), "mean": ("avg", "v")},
            n_salts=8,
        ).collect()
    }
    want = {
        r.k: (r.n, r.total, r.lo, r.hi, round(r.mean, 9))
        for r in df.groupBy("k").agg(
            F.count("v").alias("n"), F.sum("v").alias("total"),
            F.min("v").alias("lo"), F.max("v").alias("hi"), F.avg("v").alias("mean"),
        ).collect()
    }
    assert got == want


def test_salted_aggregate_rejects_nondecomposable(spark):
    import pytest

    with pytest.raises(ValueError, match="not decomposable"):
        salted_aggregate(_skewed(spark), ["k"], {"m": ("median", "v")})


def test_salted_broadcast_join_matches_plain(spark):
    big = _skewed(spark)
    dim = spark.createDataFrame(
        [("hot", 1), ("cold0", 2), ("cold3", 3)], "k string, tag bigint"
    )
    got = salted_broadcast_join(big, dim, ["k"], n_salts=4)
    want = big.join(dim, ["k"])
    assert got.count() == want.count()
    g = got.groupBy("k", "tag").count().collect()
    w = want.groupBy("k", "tag").count().collect()
    assert sorted(map(str, g)) == sorted(map(str, w))
    assert "_salt" not in got.columns
