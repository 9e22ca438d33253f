"""Gap-based sessionization: group each key's events into sessions
separated by more than ``gap`` of inactivity (the event-stream
counterpart of the weather star's snapshot grouping; a core
training-data-pipeline op for user/interaction logs).

Batch form (here): the classic two-window plan —
``lag`` marks session starts, a running sum of start markers numbers
the sessions — one shuffle on the key, both windows share the same
(key, ts) sort order so Spark plans a single sort.

Streaming form: ``F.session_window(ts, gap)`` with a watermark gives
the same grouping incrementally; the batch and streaming aggregates
produce identical (key, session_start, n_events) rows for closed
sessions.

Scale: state is one row per open session in streaming; in batch the
shuffle is by key only (sessions never straddle keys), so skew follows
key skew — salt hot keys upstream if one user dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    gap: str = "30 minutes",
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Attach ``session_id`` (1-based per key, in time order) and
    ``session_start`` to every row."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (order_tiebreak or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_start = (
        prev_ts.isNull()
        | (F.col(ts_col).cast("timestamp") > prev_ts.cast("timestamp") + F.expr(f"INTERVAL {gap}"))
    ).cast("bigint")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    out = df.withColumn("session_id", F.sum(is_start).over(wcum))
    wsess = Window.partitionBy(*key_cols, "session_id")
    return out.withColumn("session_start", F.min(ts_col).over(wsess))


def session_stats(
    df: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    gap: str = "30 minutes",
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """One row per session: start, end, event count, duration seconds."""
    s = sessionize(df, key_cols=key_cols, ts_col=ts_col, gap=gap, order_tiebreak=order_tiebreak)
    return s.groupBy(*key_cols, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.max(F.col(ts_col).cast("timestamp")).cast("long")
            - F.min(F.col(ts_col).cast("timestamp")).cast("long")
        ).alias("duration_s"),
    )
