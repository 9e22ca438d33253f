"""Persisted mergeable-sketch rollups (operators/sketch_store.py):
merge-equals-whole (the reason sketches can be stored per bucket at
all), error bounds vs exact, range pruning, and incremental append."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from alaska_etl_spark.operators.sketch_store import (
    append_sketch_rollup,
    merged_distinct_count,
    merged_quantiles,
    write_sketch_rollup,
)


def _events(spark, days=6, users_per_day=300, start=dt.datetime(2024, 3, 1)):
    rows = []
    i = 0
    for d in range(days):
        for u in range(users_per_day):
            # 50% of users overlap between consecutive days
            uid = d * (users_per_day // 2) + u
            rows.append((i, start + dt.timedelta(days=d, minutes=u), uid, float((u * 13) % 500)))
            i += 1
    return spark.createDataFrame(rows, "event_id bigint, ts timestamp_ntz, user_id bigint, value double")


def test_merged_estimate_matches_whole_corpus_within_rse(spark, tmp_path):
    df = _events(spark)
    path = str(tmp_path / "store")
    write_sketch_rollup(df, path, ts_col="ts", id_col="user_id", val_col="value")
    [r] = merged_distinct_count(spark, path).collect()
    exact = df.select("user_id").distinct().count()
    assert abs(r.n_distinct_est - exact) / exact < 0.08  # 5x the 1.6% RSE
    assert r.n_rows == df.count()


def test_range_query_prunes_and_estimates(spark, tmp_path):
    df = _events(spark)
    path = str(tmp_path / "store")
    write_sketch_rollup(df, path, ts_col="ts", id_col="user_id", val_col="value")
    start, end = dt.datetime(2024, 3, 2), dt.datetime(2024, 3, 4)
    [r] = merged_distinct_count(spark, path, start=start, end=end).collect()
    exact = (
        df.filter((F.col("ts") >= F.lit(start)) & (F.col("ts") < F.lit(end)))
        .select("user_id")
        .distinct()
        .count()
    )
    assert abs(r.n_distinct_est - exact) / exact < 0.08


def test_quantile_merge_within_rank_error(spark, tmp_path):
    df = _events(spark)
    path = str(tmp_path / "store")
    write_sketch_rollup(df, path, ts_col="ts", id_col="user_id", val_col="value")
    [r] = merged_quantiles(spark, path, [0.5, 0.9]).collect()
    vals = sorted(x.value for x in df.select("value").collect())
    n = len(vals)
    for est, p in [(r.p50, 0.5), (r.p90, 0.9)]:
        # rank of the estimate must be within ~2% of the target rank
        import bisect

        rank = bisect.bisect_left(vals, est)
        assert abs(rank - p * n) <= 0.02 * n + 1


def test_incremental_append_equals_one_shot(spark, tmp_path):
    df = _events(spark)
    day4 = dt.datetime(2024, 3, 4)
    old = df.filter(F.col("ts") < F.lit(day4))
    new = df.filter(F.col("ts") >= F.lit(day4))
    p_inc = str(tmp_path / "inc")
    write_sketch_rollup(old, p_inc, ts_col="ts", id_col="user_id", val_col="value")
    append_sketch_rollup(new, p_inc, ts_col="ts", id_col="user_id", val_col="value")
    p_one = str(tmp_path / "one")
    write_sketch_rollup(df, p_one, ts_col="ts", id_col="user_id", val_col="value")
    [a] = merged_distinct_count(spark, p_inc).collect()
    [b] = merged_distinct_count(spark, p_one).collect()
    # same per-day buckets -> same sketches -> identical estimates
    assert a.n_distinct_est == b.n_distinct_est and a.n_rows == b.n_rows
