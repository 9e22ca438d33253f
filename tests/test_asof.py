"""As-of join semantics (J5): backward/forward, equal-ts inclusion,
tolerance, null on no match."""

from __future__ import annotations

import datetime as dt

from alaska_etl_spark.operators.asof import asof_join


def _ts(h, m=0):
    return dt.datetime(2023, 6, 1, h, m)


def _frames(spark):
    left = spark.createDataFrame(
        [("a", _ts(10)), ("a", _ts(12)), ("b", _ts(10)), ("c", _ts(10))],
        "k string, lts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [("a", _ts(9), 1.0), ("a", _ts(11), 2.0), ("a", _ts(13), 3.0), ("b", _ts(10), 9.0)],
        "k string, rts timestamp_ntz, payload double",
    )
    return left, right


def test_backward_latest_at_or_before(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts")
    got = {(r.k, r.lts): r.payload for r in out.collect()}
    assert got[("a", _ts(10))] == 1.0   # 9:00 snapshot
    assert got[("a", _ts(12))] == 2.0   # 11:00, not 13:00
    assert got[("b", _ts(10))] == 9.0   # equal ts matches
    assert got[("c", _ts(10))] is None  # no right rows for key


def test_forward_earliest_at_or_after(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts", direction="forward")
    got = {(r.k, r.lts): r.payload for r in out.collect()}
    assert got[("a", _ts(10))] == 2.0
    assert got[("a", _ts(12))] == 3.0
    assert got[("b", _ts(10))] == 9.0


def test_tolerance_bounds_match(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts", tolerance="30 minutes")
    got = {(r.k, r.lts): r.payload for r in out.collect()}
    assert got[("a", _ts(10))] is None  # 9:00 is 1h away > 30min
    assert got[("b", _ts(10))] == 9.0   # exact hit within tolerance


def test_row_count_preserved(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts")
    assert out.count() == left.count()
    assert set(out.columns) == {"k", "lts", "rts", "payload"}
