"""EWMA and z-score anomalies (operators/timeseries.py)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from alaska_etl_spark.operators.timeseries import ewma, zscore_anomalies


def test_ewma_hand_values(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (2, 1, 20.0), (3, 1, 20.0)], "id bigint, k int, x double"
    )
    out = {r.id: r.ewma for r in ewma(df, ["k"], "id", "x", alpha=0.5).collect()}
    assert out == {1: 10.0, 2: 15.0, 3: 17.5}


def test_ewma_keys_independent_and_ordered_by_ts(spark):
    rows = [(4, 1, 40.0), (3, 1, 30.0), (1, 2, 7.0), (2, 2, 7.0)]
    df = spark.createDataFrame(rows, "id bigint, k int, x double")
    out = {r.id: r.ewma for r in ewma(df, ["k"], "id", "x", alpha=0.5).collect()}
    assert out[3] == 30.0 and out[4] == 35.0  # ts order, not input order
    assert out[1] == 7.0 and out[2] == 7.0


def test_pandas_ewm_matches_explicit_recursion():
    """The oracle (Q92_SQL) replays y_t = a*x_t + (1-a)*y_{t-1} in SQL;
    this pins that pandas ewm(adjust=False) IS that recursion, double
    for double — if a pandas upgrade changes the arithmetic, this fails
    before the driver's hash compare does."""
    rng = np.random.RandomState(11)
    x = np.round(rng.uniform(0, 1000, 500), 2)
    got = pd.Series(x).ewm(alpha=0.3, adjust=False).mean().to_numpy()
    y = np.empty_like(x)
    y[0] = x[0]
    for i in range(1, len(x)):
        y[i] = 0.3 * x[i] + 0.7 * y[i - 1]
    assert (got == y).all()  # bit-exact, not approx


def test_zscore_flags_planted_outlier(spark):
    rows = [(i, "a", 10.0 + (i % 3) * 0.1) for i in range(50)] + [(99, "a", 500.0)]
    df = spark.createDataFrame(rows, "id bigint, k string, x double")
    out = zscore_anomalies(df, ["k"], "x", z_threshold=3.0).collect()
    assert [r.id for r in out] == [99]
    assert out[0].zscore > 3.0


def test_zscore_zero_variance_flags_nothing(spark):
    df = spark.createDataFrame([(1, "a", 5.0), (2, "a", 5.0)], "id bigint, k string, x double")
    assert zscore_anomalies(df, ["k"], "x").count() == 0


def test_zscore_plan_is_codegen(spark):
    df = spark.createDataFrame([(1, "a", 5.0)], "id bigint, k string, x double")
    plan = zscore_anomalies(df, ["k"], "x")._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert bad not in plan
