"""Single-pass exact-moment correlation matrix (operators/stats.py)."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from alaska_etl_spark.operators.stats import corr_matrix


def test_perfect_and_anti_correlation(spark):
    rows = [(float(i), float(2 * i), float(-3 * i)) for i in range(1, 50)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = {(r.col_a, r.col_b): r.corr for r in corr_matrix(df, ["x", "y", "z"]).collect()}
    assert got[("x", "y")] == 1.0
    assert got[("x", "z")] == -1.0
    assert got[("y", "z")] == -1.0


def test_matches_numpy_corrcoef(spark):
    # deterministic pseudo-random 2-decimal data
    xs = [round(((i * 97) % 53) / 100 + i * 0.01, 2) for i in range(500)]
    ys = [round(((i * 31) % 89) / 100 - i * 0.005, 2) for i in range(500)]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    [r] = corr_matrix(df, ["x", "y"]).collect()
    want = np.corrcoef(xs, ys)[0, 1]
    assert abs(r.corr - round(want, 4)) <= 1e-4


def test_zero_variance_yields_null_not_error(spark):
    df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0)], "x double, y double")
    [r] = corr_matrix(df, ["x", "y"]).collect()
    assert r.corr is None


def test_single_pass_with_partial_aggregation(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 100 / 100).alias("x"), (F.col("id") % 7 / 7).alias("y")
    )
    out = corr_matrix(df, ["x", "y"])
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "partial_count" in final or "partial_sum" in final
    # the input is aggregated exactly once: one partial/final pair
    assert final.count("HashAggregate") <= 2 or final.count("SortAggregate") <= 2
