"""The analytics layer — the question the whole warehouse exists to
answer (SURVEY §2.4 J5, §7.1 step 6): join NWS forecasts to USCRN
actuals and measure forecast error as a function of lead time
(reference notebooks/2_nws_update.ipynb:1150-1152: "evaluated against
the historic data… utc_datetime - last_update_nws being a key
parameter").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alaska_etl_spark.operators.asof import asof_join


def forecast_vs_actual(nws: DataFrame, uscrn: DataFrame, *, latest_only: bool = False) -> DataFrame:
    """Equi-join every forecast snapshot row to the matching observation
    on (location, utc_datetime), with the forecast lead time in hours.

    ``latest_only=True`` keeps, per observation, only the most recent
    snapshot issued at or before the observed hour (the as-of variant).

    Scale: both sides are facts → sort-merge join on the composite key;
    partition both tables by ``date(utc_datetime)`` so the join is
    partition-local, and bucket by location to avoid re-shuffling the
    repeatedly-queried key (SURVEY §4 physical choices).
    """
    f = nws.select(
        F.col("location").alias("station_location"),
        "utc_datetime",
        "last_update_nws",
        F.col("temperature_f").cast("double").alias("forecast_temp_f"),
        F.col("surface_wind_mph").cast("double").alias("forecast_wind_mph"),
        F.col("relative_humidity_pct").alias("forecast_rh_pct"),
    )
    a = uscrn.select(
        "station_location",
        "utc_datetime",
        F.col("t_hr_avg").alias("actual_temp_f"),
        F.col("rh_hr_avg").alias("actual_rh_pct"),
    )
    joined = (
        f.join(a, ["station_location", "utc_datetime"])
        .withColumn(
            "lead_hours",
            (
                F.col("utc_datetime").cast("timestamp").cast("long")
                - F.col("last_update_nws").cast("timestamp").cast("long")
            )
            / 3600.0,
        )
        .filter(F.col("lead_hours") >= 0)
    )
    if latest_only:
        from alaska_etl_spark.operators.dedup import dedup_keep_first

        joined = dedup_keep_first(
            joined,
            keys=["station_location", "utc_datetime"],
            order_by=[F.col("last_update_nws").desc()],
        )
    return joined


def lead_time_error(matched: DataFrame, *, bucket_hours: int = 24) -> DataFrame:
    """Forecast error aggregates per (station, lead-time bucket):
    MAE / bias / count for temperature. The headline analytical query."""
    return (
        matched.withColumn(
            "lead_bucket",
            (F.floor(F.col("lead_hours") / bucket_hours) * bucket_hours).cast("long"),
        )
        .groupBy("station_location", "lead_bucket")
        .agg(
            F.round(F.avg(F.abs(F.col("forecast_temp_f") - F.col("actual_temp_f"))), 3).alias("mae_temp_f"),
            F.round(F.avg(F.col("forecast_temp_f") - F.col("actual_temp_f")), 3).alias("bias_temp_f"),
            F.count(F.lit(1)).alias("n_matched"),
        )
    )


def asof_forecast_for_observations(nws: DataFrame, uscrn: DataFrame) -> DataFrame:
    """As-of variant: attach, to each observation, the latest forecast
    *snapshot* issued at or before the observed hour — matching on
    snapshot time rather than requiring an exact forecast-hour hit."""
    snapshots = nws.select(
        F.col("location").alias("station_location"),
        F.col("last_update_nws").alias("snapshot_ts"),
        F.col("utc_datetime").alias("forecast_valid"),
        "temperature_f",
    )
    obs = uscrn.select("station_location", "utc_datetime", "t_hr_avg")
    per_snapshot = snapshots.groupBy("station_location", "snapshot_ts").agg(
        F.round(F.avg("temperature_f"), 3).alias("snapshot_mean_temp_f")
    )
    return asof_join(
        obs,
        per_snapshot,
        on=["station_location"],
        left_ts="utc_datetime",
        right_ts="snapshot_ts",
    )
