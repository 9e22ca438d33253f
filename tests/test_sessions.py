"""Gap-based sessionization: boundaries, exact-gap inclusion, per-key
isolation, stats."""

from __future__ import annotations

import datetime as dt

from alaska_etl_spark.operators.sessions import session_stats, sessionize


def _ev(spark):
    base = dt.datetime(2023, 6, 1, 10, 0)
    rows = [
        ("u1", base, 1),
        ("u1", base + dt.timedelta(minutes=10), 2),
        ("u1", base + dt.timedelta(minutes=40), 3),   # exactly 30min after prev → same session
        ("u1", base + dt.timedelta(minutes=100), 4),  # 60min gap → new session
        ("u2", base, 5),                               # other key: own numbering
    ]
    return spark.createDataFrame(rows, "user_id string, ts timestamp_ntz, event_id bigint")


def test_session_boundaries(spark):
    out = sessionize(_ev(spark), key_cols=["user_id"], ts_col="ts", gap="30 minutes",
                     order_tiebreak=["event_id"])
    got = {r.event_id: r.session_id for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_session_stats(spark):
    out = session_stats(_ev(spark), key_cols=["user_id"], ts_col="ts", gap="30 minutes",
                        order_tiebreak=["event_id"])
    rows = {(r.user_id, r.session_id): r for r in out.collect()}
    s1 = rows[("u1", 1)]
    assert s1.n_events == 3
    assert s1.duration_s == 40 * 60
    assert rows[("u1", 2)].n_events == 1
    assert rows[("u1", 2)].duration_s == 0
    assert rows[("u2", 1)].n_events == 1


def test_gap_strictly_greater_splits(spark):
    base = dt.datetime(2023, 6, 1, 10, 0)
    df = spark.createDataFrame(
        [("u", base, 1), ("u", base + dt.timedelta(minutes=30, seconds=1), 2)],
        "user_id string, ts timestamp_ntz, event_id bigint",
    )
    out = sessionize(df, key_cols=["user_id"], ts_col="ts", gap="30 minutes")
    assert sorted(r.session_id for r in out.collect()) == [1, 2]
