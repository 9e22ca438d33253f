"""As-of join: for each left row, the latest right row with
right.ts <= left.ts, per key (SURVEY §2.4 J5).

This is the engine's forecast-accuracy primitive: join each USCRN
observation to the most recent NWS forecast snapshot issued at or before
the observation hour. Spark SQL has no built-in as-of join; we build it
as union → window ``last(ignorenulls)`` — one shuffle on
(key, timestamp), no range explosion, no cross join:

    tag left rows (side=L) and right rows (side=R, carrying payload)
    → union → window per key ordered by (ts, side) → forward-fill the
    last R payload → keep L rows.

This scales as a single sort-based window over the key partition, which
for the weather star is (location) — 23 partitions at reference scale,
arbitrarily many at 100 TB where the key is higher-cardinality. For
skewed keys AQE skew-join doesn't apply (window, not join) — salt by
time-bucket if a single key dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    *,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Return ``left`` with all non-key ``right`` columns attached from
    the as-of match (NULLs when no right row qualifies).

    direction='backward': latest right.ts <= left.ts (default, the
    forecast case). direction='forward': earliest right.ts >= left.ts.
    ``tolerance`` (e.g. "24 hours") bounds the match distance.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)

    right_payload = [c for c in right.columns if c not in on]
    left_cols = left.columns

    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ats"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_rpay"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left_cols if c not in on],
    )
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ats"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols if c not in on],
    )

    if direction == "backward":
        # right rows sort before left rows at equal ts → a forecast issued
        # exactly at the observation hour matches it.
        w2 = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ats").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = r.unionByName(l).withColumn(
            "_mts",
            F.last(F.when(F.col("_side") == 0, F.col("_ats")), ignorenulls=True).over(w2),
        ).withColumn(
            "_mpay",
            F.last(F.when(F.col("_side") == 0, F.col("_rpay")), ignorenulls=True).over(w2),
        )
    else:
        w2 = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ats").asc(), F.col("_side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        filled = r.unionByName(l).withColumn(
            "_mts",
            F.first(F.when(F.col("_side") == 0, F.col("_ats")), ignorenulls=True).over(w2),
        ).withColumn(
            "_mpay",
            F.first(F.when(F.col("_side") == 0, F.col("_rpay")), ignorenulls=True).over(w2),
        )

    out = filled.filter(F.col("_side") == 1)

    match_ok: Column = F.col("_mts").isNotNull()
    if tolerance is not None:
        if direction == "backward":
            match_ok = match_ok & (F.col("_ats") - F.expr(f"INTERVAL {tolerance}") <= F.col("_mts"))
        else:
            match_ok = match_ok & (F.col("_mts") <= F.col("_ats") + F.expr(f"INTERVAL {tolerance}"))

    sel = [F.col(c) for c in on]
    sel += [F.col(f"_l_{c}").alias(c) for c in left_cols if c not in on]
    sel += [
        F.when(match_ok, F.col("_mpay").getField(c)).alias(c) for c in right_payload
    ]
    return out.select(*sel)
