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


# --- MAD robust anomalies ---------------------------------------------------


def test_mad_flags_all_planted_outliers_where_zscore_masks(spark):
    from alaska_etl_spark.operators.timeseries import mad_anomalies, zscore_anomalies

    # one huge and one modest outlier: the huge one inflates sigma enough
    # to mask the modest one from the moment screen; MAD catches both.
    rows = [(i, "a", 10.0 + (i % 5) * 0.01) for i in range(200)]
    rows += [(900, "a", 1e6), (901, "a", 25.0)]
    df = spark.createDataFrame(rows, "id bigint, k string, x double")
    mad_ids = {r.id for r in mad_anomalies(df, ["k"], "x", z_threshold=3.5).collect()}
    z_ids = {r.id for r in zscore_anomalies(df, ["k"], "x", z_threshold=3.5).collect()}
    assert mad_ids == {900, 901}
    assert z_ids == {900}  # the masking failure mode, demonstrated


def test_mad_zero_mad_flags_nothing(spark):
    from alaska_etl_spark.operators.timeseries import mad_anomalies

    # >half identical values => MAD = 0 => no flags, no division error
    rows = [(i, "a", 5.0) for i in range(10)] + [(99, "a", 1e9)]
    df = spark.createDataFrame(rows, "id bigint, k string, x double")
    assert mad_anomalies(df, ["k"], "x").count() == 0


def test_mad_approx_matches_exact_away_from_threshold(spark):
    from alaska_etl_spark.operators.timeseries import mad_anomalies

    import pyspark.sql.functions as F

    df = spark.range(5000).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("k"),
        (F.col("id") % 97).cast("double").alias("x"),
    )
    exact = {r.id for r in mad_anomalies(df, ["k"], "x", z_threshold=2.0).collect()}
    approx = {
        r.id
        for r in mad_anomalies(
            df, ["k"], "x", z_threshold=2.0, approx_accuracy=10_000
        ).collect()
    }
    # GK at accuracy 1e4 on 5e3 rows is exact: the flag sets must agree
    assert exact == approx


# --- activity bitmap (qc8) -------------------------------------------------

def test_activity_bitmap_mask_and_popcount(spark):
    import datetime as dt

    from alaska_etl_spark.operators.timeseries import activity_bitmap

    rows = [
        (1, dt.datetime(2024, 1, 1, 9)),
        (1, dt.datetime(2024, 1, 1, 17)),   # same day → same bit
        (1, dt.datetime(2024, 1, 3, 12)),
        (1, dt.datetime(2024, 2, 1, 12)),   # new month → new row
        (2, dt.datetime(2024, 1, 31, 23)),  # day 31 → top bit of the month
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp_ntz")
    out = {(r.user_id, r.month.month): r for r in activity_bitmap(df, "user_id", "ts").collect()}
    assert out[(1, 1)].mask == (1 << 0) | (1 << 2)
    assert out[(1, 1)].active_days == 2
    assert out[(1, 2)].mask == 1 << 0
    assert out[(2, 1)].mask == 1 << 30
    assert out[(2, 1)].active_days == 1


def test_activity_bitmap_set_algebra_composes(spark):
    """The point of the bitmask: common active days without re-reading events."""
    import datetime as dt

    from pyspark.sql import functions as F

    from alaska_etl_spark.operators.timeseries import activity_bitmap

    rows = [(1, dt.datetime(2024, 1, d, 9)) for d in (1, 2, 3)] + [
        (2, dt.datetime(2024, 1, d, 9)) for d in (2, 3, 4)
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp_ntz")
    bm = activity_bitmap(df, "user_id", "ts")
    a = bm.filter("user_id = 1").select(F.col("mask").alias("ma"))
    b = bm.filter("user_id = 2").select(F.col("mask").alias("mb"))
    common = a.crossJoin(b).select(F.bit_count(F.col("ma").bitwiseAND(F.col("mb"))).alias("c"))
    assert common.collect()[0].c == 2  # days 2 and 3


# --- sliding exact distinct (qd2) ------------------------------------------

def test_sliding_distinct_window_and_completeness(spark):
    import datetime as dt

    from alaska_etl_spark.operators.timeseries import sliding_distinct

    rows = [
        (1, dt.datetime(2024, 1, 1, 9)),
        (2, dt.datetime(2024, 1, 2, 9)),
        (1, dt.datetime(2024, 1, 8, 9)),   # day 8: u1 again
        (3, dt.datetime(2024, 1, 10, 9)),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp_ntz")
    out = {r.window_end.day: r.distinct_3d for r in
           sliding_distinct(df, "user_id", "ts", window_days=3).collect()}
    # complete windows only (ends day 3 = min+2 … day 10 = max); windows
    # with zero active users (5-7) emit no row — same absence both engines
    assert out == {3: 2, 4: 1, 8: 1, 9: 1, 10: 2}
    # day 3 window [1,3] covers u1@1+u2@2; day 10 window [8,10] u1@8+u3@10;
    # incomplete windows 1-2 and beyond-data 11-12 are dropped


def test_sliding_distinct_same_user_counts_once_per_window(spark):
    import datetime as dt

    from alaska_etl_spark.operators.timeseries import sliding_distinct

    rows = [(7, dt.datetime(2024, 3, d, 12)) for d in (1, 2, 3)]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp_ntz")
    out = sliding_distinct(df, "user_id", "ts", window_days=3).collect()
    assert [(r.window_end.day, r.distinct_3d) for r in out] == [(3, 1)]


def test_seasonal_anomalies_flags_seeded_outlier(spark):
    from datetime import datetime, timedelta

    from alaska_etl_spark.operators.timeseries import seasonal_anomalies

    # 6 Mondays at 09:00 with ~10 events each, except one Monday with 100
    base = datetime(2024, 1, 1, 9, 0, 0)  # a Monday
    rows = []
    eid = 0
    for week in range(6):
        n = 100 if week == 3 else 10
        for i in range(n):
            rows.append((eid, base + timedelta(weeks=week, seconds=i)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp")
    out = seasonal_anomalies(df, "ts").collect()
    assert len(out) == 6
    flagged = [r for r in out if r.anomalous]
    assert len(flagged) == 1
    r = flagged[0]
    assert r.cnt == 100 and r.dow == 1 and r.hod == 9
    # bucket mean = (5*10 + 100)/6 = 25.0
    assert r.bucket_mean == 25.0


def test_seasonal_anomalies_uniform_has_no_flags_and_exact_mean(spark):
    from datetime import datetime, timedelta

    from alaska_etl_spark.operators.timeseries import seasonal_anomalies

    base = datetime(2024, 1, 2, 14, 0, 0)
    rows = [
        (w * 10 + i, base + timedelta(weeks=w, seconds=i))
        for w in range(3)
        for i in range(7)
    ]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp")
    out = seasonal_anomalies(df, "ts").collect()
    assert [r.anomalous for r in out] == [False] * 3
    assert all(r.bucket_mean == 7.0 for r in out)


def test_seasonal_anomalies_single_sample_bucket_cannot_flag(spark):
    from datetime import datetime

    from alaska_etl_spark.operators.timeseries import seasonal_anomalies

    df = spark.createDataFrame(
        [(0, datetime(2024, 1, 1, 5, 0, 0)), (1, datetime(2024, 1, 2, 6, 0, 0))],
        "event_id bigint, ts timestamp",
    )
    out = seasonal_anomalies(df, "ts").collect()
    assert len(out) == 2 and not any(r.anomalous for r in out)


def test_resettable_running_sum_restarts_on_flag(spark):
    from datetime import datetime, timedelta

    from alaska_etl_spark.operators.timeseries import resettable_running_sum
    from pyspark.sql import functions as F

    t0 = datetime(2024, 1, 1)
    rows = [
        # user 1: 1.00, 2.00, ERROR 0.50, 3.00 -> runs 100, 300, 50, 350
        (0, 1, t0 + timedelta(minutes=0), "click", 1.0),
        (1, 1, t0 + timedelta(minutes=1), "view", 2.0),
        (2, 1, t0 + timedelta(minutes=2), "error", 0.5),
        (3, 1, t0 + timedelta(minutes=3), "click", 3.0),
        # user 2: starts WITH an error -> epoch 1 from the first row
        (4, 2, t0, "error", 1.0),
        (5, 2, t0 + timedelta(minutes=1), "view", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"
    )
    out = {
        r.event_id: r
        for r in resettable_running_sum(
            df, "user_id", ["ts", "event_id"], "value", F.col("event_type") == "error"
        ).collect()
    }
    assert [out[i].run_cents for i in range(4)] == [100, 300, 50, 350]
    assert [out[i].epoch for i in range(4)] == [0, 0, 1, 1]
    assert (out[4].epoch, out[4].run_cents) == (1, 100)
    assert (out[5].epoch, out[5].run_cents) == (1, 200)


def test_interval_coverage_merges_overlaps_once(spark):
    from datetime import datetime, timedelta

    from alaska_etl_spark.operators.timeseries import interval_coverage
    from pyspark.sql import functions as F

    t0 = datetime(2024, 1, 1)
    # user 1: [0,10), [5,15) overlap -> one island covering 15s;
    #         [60,70) separate -> second island of 10s
    # user 2: touching intervals [0,10), [10,20) -> ONE island (start not > end)
    rows = [
        (0, 1, t0, 10.0),
        (1, 1, t0 + timedelta(seconds=5), 10.0),
        (2, 1, t0 + timedelta(seconds=60), 10.0),
        (3, 2, t0, 10.0),
        (4, 2, t0 + timedelta(seconds=10), 10.0),
    ]
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, ts timestamp, dur_s double")
    out = {
        r.user_id: r
        for r in interval_coverage(
            df, "user_id", "ts",
            F.round(F.col("dur_s") * 1000000).cast("bigint"),
            tiebreak_col="event_id",
        ).collect()
    }
    assert (out[1].n_intervals, out[1].n_islands, out[1].covered_us) == (3, 2, 25_000_000)
    assert (out[2].n_intervals, out[2].n_islands, out[2].covered_us) == (2, 1, 20_000_000)


def test_cusum_drift_detects_level_shift(spark):
    from datetime import datetime, timedelta

    from alaska_etl_spark.operators.timeseries import cusum_drift

    t0 = datetime(2024, 1, 1)
    # user 1: 4 obs at 1.00 then 4 obs at 9.00 -> mean 5.00; the centered
    # prefix bottoms out after obs 4 and the upward CUSUM peaks at the
    # last obs: S_max = 4 * 4.00 = 16.00 (1600 cents).
    rows = [(i, 1, t0 + timedelta(minutes=i), "v", 1.0) for i in range(4)]
    rows += [(i, 1, t0 + timedelta(minutes=i), "v", 9.0) for i in range(4, 8)]
    # user 2: flat series -> zero drift, zero alarms
    rows += [(i, 2, t0 + timedelta(minutes=i), "v", 5.0) for i in range(10, 14)]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"
    )
    out = {
        r.user_id: r
        for r in cusum_drift(
            df, "user_id", ["ts", "event_id"], "value", threshold_cents=1000
        ).collect()
    }
    r1 = out[1]
    assert r1.n_events == 8
    assert r1.max_drift_up_cents == 1600
    # downward drift mirrors: prefix peaks at 0 (start), dips to -16.00
    assert r1.max_drift_down_cents == 1600
    assert r1.alarms_up >= 1 and r1.alarms_down >= 1
    r2 = out[2]
    assert (r2.max_drift_up_cents, r2.max_drift_down_cents) == (0, 0)
    assert (r2.alarms_up, r2.alarms_down) == (0, 0)


def test_cusum_drift_matches_recursive_reference(spark):
    """Pin the closed window form against the textbook recursion
    S_t = max(0, S_{t-1} + (x_t - mean)) on a pseudo-random series."""
    from datetime import datetime, timedelta

    from alaska_etl_spark.operators.timeseries import cusum_drift

    t0 = datetime(2024, 1, 1)
    vals = [((i * 2654435761) % 997) / 100.0 for i in range(40)]
    rows = [(i, 1, t0 + timedelta(minutes=i), "v", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"
    )
    cents = [round(v * 100) for v in vals]
    n, s = len(cents), sum(cents)
    su = sd = 0
    max_u = max_d = 0
    for c in cents:
        su = max(0, su + n * c - s)
        sd = min(0, sd + n * c - s)
        max_u = max(max_u, su)
        max_d = min(max_d, sd)
    exp_up = (2 * max_u + n) // (2 * n)
    exp_dn = (2 * (-max_d) + n) // (2 * n)
    r = cusum_drift(df, "user_id", ["ts", "event_id"], "value", threshold_cents=10**9).collect()[0]
    assert (r.max_drift_up_cents, r.max_drift_down_cents) == (exp_up, exp_dn)
    assert (r.alarms_up, r.alarms_down) == (0, 0)


def test_time_weighted_avg_holds_value_over_gaps(spark):
    from datetime import datetime, timedelta

    from alaska_etl_spark.operators.timeseries import time_weighted_avg

    t0 = datetime(2024, 1, 1)
    # user 1: value 1.00 held 3s, then 5.00 held 1s, last obs unweighted.
    # TWAP = (100*3000 + 500*1000) / 4000 = 200 cents
    rows = [
        (1, 1, t0, "v", 1.0),
        (2, 1, t0 + timedelta(seconds=3), "v", 5.0),
        (3, 1, t0 + timedelta(seconds=4), "v", 999.0),
        # user 2: single observation -> NULL twap, 0 active
        (4, 2, t0, "v", 7.0),
        # user 3: two obs in the same millisecond -> 0 duration -> NULL
        (5, 3, t0, "v", 1.0),
        (6, 3, t0 + timedelta(microseconds=400), "v", 9.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"
    )
    out = {
        r.user_id: r
        for r in time_weighted_avg(df, "user_id", "ts", "event_id", "value").collect()
    }
    assert (out[1].n_events, out[1].active_ms, out[1].twap_cents) == (3, 4000, 200)
    assert (out[2].n_events, out[2].active_ms, out[2].twap_cents) == (1, 0, None)
    assert (out[3].n_events, out[3].active_ms, out[3].twap_cents) == (2, 0, None)


def test_time_weighted_avg_ignores_input_order(spark):
    from datetime import datetime, timedelta

    from alaska_etl_spark.operators.timeseries import time_weighted_avg

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, 1, t0 + timedelta(seconds=i), "v", float(i % 7))
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"
    )
    a = time_weighted_avg(df, "user_id", "ts", "event_id", "value").collect()
    b = time_weighted_avg(
        df.orderBy(F.col("value").desc()), "user_id", "ts", "event_id", "value"
    ).collect()
    assert a == b
    # equal 1s gaps -> TWAP is the plain mean of the first n-1 values
    cents = [100 * (i % 7) for i in range(19)]
    exp = (2 * sum(c * 1000 for c in cents) + 19000) // (2 * 19000)
    assert a[0].twap_cents == exp


def test_ltob_keeps_endpoints_and_bucket_peaks(spark):
    from datetime import datetime, timedelta

    from alaska_etl_spark.operators.timeseries import ltob_downsample

    t0 = datetime(2024, 1, 1)
    # 9 points, 3 buckets of 3 (rn 1-3, 4-6, 7-9). Flat line except a
    # spike at rn=5 (bucket 1): interior winner of bucket 1 must be the
    # spike; endpoints rn=1 and rn=9 always kept.
    vals = [1.0, 1.0, 1.0, 1.0, 50.0, 1.0, 1.0, 1.0, 1.0]
    rows = [
        (i, 1, t0 + timedelta(seconds=i), "v", v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"
    )
    out = ltob_downsample(df, "user_id", "ts", "event_id", "value", n_buckets=3)
    got = [(r.bucket, r.cents, r.area2) for r in out.collect()]
    # endpoints: (bucket 0, 100, None) and (bucket 2, 100, None)
    assert (0, 100, None) in got and (2, 100, None) in got
    # bucket 1 winner is the spike: area2 = |(1000)*(0) - (2000)*(4900)| = 9.8e6
    assert (1, 5000, 9_800_000) in got
    assert len(got) == 5  # 2 endpoints + 3 bucket winners


def test_ltob_flat_series_ties_break_earliest(spark):
    from datetime import datetime, timedelta

    from alaska_etl_spark.operators.timeseries import ltob_downsample

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, 1, t0 + timedelta(seconds=i), "v", 2.0) for i in range(8)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"
    )
    out = ltob_downsample(df, "user_id", "ts", "event_id", "value", n_buckets=2).collect()
    # all areas 0 -> per bucket the EARLIEST interior point wins
    interior = sorted(
        (r.bucket, r.ts) for r in out if r.area2 is not None
    )
    assert [b for b, _ in interior] == [0, 1]
    assert interior[0][1] == t0 + timedelta(seconds=1)  # rn=2, first interior
    assert interior[1][1] == t0 + timedelta(seconds=4)  # bucket 1 starts at rn=5


def test_ltob_tiny_keys(spark):
    from datetime import datetime, timedelta

    from alaska_etl_spark.operators.timeseries import ltob_downsample

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "v", 1.0),                            # singleton key
        (2, 2, t0, "v", 1.0),
        (3, 2, t0 + timedelta(seconds=1), "v", 2.0),      # 2-point key
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"
    )
    out = ltob_downsample(df, "user_id", "ts", "event_id", "value", n_buckets=4).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r)
    assert len(per_user[1]) == 1 and per_user[1][0].area2 is None
    assert len(per_user[2]) == 2 and all(r.area2 is None for r in per_user[2])


def test_ohlc_bars_first_last_deterministic(spark):
    from datetime import datetime, timedelta

    from alaska_etl_spark.operators.timeseries import ohlc_bars

    t0 = datetime(2024, 1, 1, 9, 0)
    rows = [
        (1, 1, t0, "v", 3.0),                          # open
        (2, 1, t0 + timedelta(hours=1), "v", 9.5),     # high
        (3, 1, t0 + timedelta(hours=2), "v", 0.5),     # low
        (4, 1, t0 + timedelta(hours=3), "v", 4.0),     # close
        # same ts as event 4 but higher id: the TRUE close by tiebreak
        (5, 1, t0 + timedelta(hours=3), "v", 6.0),
        # next day single event
        (6, 1, t0 + timedelta(days=1), "v", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"
    )
    out = {str(r.day)[:10]: r for r in ohlc_bars(df, "user_id", "ts", "event_id", "value").collect()}
    d1 = out["2024-01-01"]
    assert (d1.open_cents, d1.high_cents, d1.low_cents, d1.close_cents) == (
        300, 950, 50, 600
    )
    assert d1.n_events == 5
    d2 = out["2024-01-02"]
    assert (d2.open_cents, d2.close_cents, d2.n_events) == (700, 700, 1)


def test_lag_correlation_detects_planted_lag(spark):
    from datetime import datetime, timedelta

    from alaska_etl_spark.operators.timeseries import lag_correlation

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    # x volume follows a pattern; y repeats it exactly 3 hours later ->
    # corr at lag 3 must be 1.0 over the overlap window
    pattern = [1, 4, 2, 7, 3, 6, 1, 5, 2, 8, 3, 5, 4, 7, 2, 6, 1, 9, 2, 4]
    for h, n in enumerate(pattern):
        for _ in range(n):
            rows.append((eid, 1, t0 + timedelta(hours=h), "x", 0.0)); eid += 1
        for _ in range(n):
            rows.append((eid, 1, t0 + timedelta(hours=h + 3), "y", 0.0)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"
    )
    out = {
        r.lag_hours: r
        for r in lag_correlation(
            df, "ts", F.col("event_type") == "x", F.col("event_type") == "y",
            max_lag_hours=5,
        ).collect()
    }
    assert out[3].corr == 1.0
    assert all(
        out[lag].corr is None or out[lag].corr < 0.999
        for lag in out if lag != 3
    )


def test_lag_correlation_moments_match_python(spark):
    from datetime import datetime, timedelta

    from alaska_etl_spark.operators.timeseries import lag_correlation

    t0 = datetime(2024, 1, 1)
    xs = [(i * 13) % 5 for i in range(30)]
    ys = [(i * 7) % 4 for i in range(30)]
    rows = []
    eid = 0
    for h, (nx, ny) in enumerate(zip(xs, ys)):
        for _ in range(nx):
            rows.append((eid, 1, t0 + timedelta(hours=h), "x", 0.0)); eid += 1
        for _ in range(ny):
            rows.append((eid, 1, t0 + timedelta(hours=h), "y", 0.0)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"
    )
    out = {
        r.lag_hours: r
        for r in lag_correlation(
            df, "ts", F.col("event_type") == "x", F.col("event_type") == "y",
            max_lag_hours=2,
        ).collect()
    }
    import math
    for lag in (0, 1, 2):
        # hours with zero x AND zero y don't appear in the hourly frame;
        # replicate the inner-join-over-present-hours semantics
        present = [h for h in range(30) if xs[h] + ys[h] > 0]
        pairs = [
            (xs[a], ys[b])
            for a in present
            for b in present
            if b == a + lag
        ]
        n = len(pairs)
        sx = sum(p[0] for p in pairs); sy = sum(p[1] for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        sxx = sum(p[0] ** 2 for p in pairs); syy = sum(p[1] ** 2 for p in pairs)
        den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        exp = (n * sxy - sx * sy) / den
        assert out[lag].n_hours == n and abs(out[lag].corr - exp) < 1e-12
