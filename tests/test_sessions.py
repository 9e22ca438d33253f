"""Gap-based sessionization: boundaries, exact-gap inclusion, per-key
isolation, stats."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

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


# --- interval concurrency (qc7) --------------------------------------------

def _iv(spark, rows):
    return spark.createDataFrame(rows, "s timestamp_ntz, e timestamp_ntz")


def test_concurrency_touching_intervals_overlap(spark):
    from alaska_etl_spark.operators.sessions import concurrency_by_day

    b = dt.datetime(2023, 6, 1, 10, 0)
    out = concurrency_by_day(
        _iv(spark, [(b, b + dt.timedelta(hours=1)), (b + dt.timedelta(hours=1), b + dt.timedelta(hours=2))]),
        start_col="s", end_col="e",
    ).collect()
    # closed intervals: one ends exactly when the other starts → both open at 11:00
    assert [(r.utc_day, r.max_concurrent) for r in out] == [(dt.datetime(2023, 6, 1), 2)]


def test_concurrency_disjoint_is_one(spark):
    from alaska_etl_spark.operators.sessions import concurrency_by_day

    b = dt.datetime(2023, 6, 1, 10, 0)
    out = concurrency_by_day(
        _iv(spark, [(b, b + dt.timedelta(minutes=5)), (b + dt.timedelta(hours=2), b + dt.timedelta(hours=3))]),
        start_col="s", end_col="e",
    ).collect()
    assert out[0].max_concurrent == 1


def test_concurrency_midnight_spanning_session_counts_on_both_days(spark):
    from alaska_etl_spark.operators.sessions import concurrency_by_day

    s = dt.datetime(2023, 6, 1, 23, 30)
    e = dt.datetime(2023, 6, 2, 0, 30)
    out = concurrency_by_day(_iv(spark, [(s, e)]), start_col="s", end_col="e").collect()
    assert [(r.utc_day.day, r.max_concurrent) for r in out] == [(1, 1), (2, 1)]


def test_concurrency_stacked_peak(spark):
    from alaska_etl_spark.operators.sessions import concurrency_by_day

    b = dt.datetime(2023, 6, 1, 10, 0)
    m = dt.timedelta
    # three overlap in [10:20, 10:30]; a fourth is disjoint later
    out = concurrency_by_day(
        _iv(spark, [(b, b + m(minutes=30)), (b + m(minutes=10), b + m(minutes=40)),
                    (b + m(minutes=20), b + m(minutes=50)), (b + m(hours=5), b + m(hours=6))]),
        start_col="s", end_col="e",
    ).collect()
    assert out[0].max_concurrent == 3


def test_transition_matrix_counts_within_keys_only(spark):
    from datetime import datetime, timedelta

    from alaska_etl_spark.operators.sessions import transition_matrix

    t0 = datetime(2024, 1, 1)
    # user 1: a -> b -> a ; user 2: b -> b. No cross-user a->b from
    # user1's trailing 'a' into user2's leading 'b'.
    rows = [
        (1, 1, t0, "a"),
        (2, 1, t0 + timedelta(minutes=1), "b"),
        (3, 1, t0 + timedelta(minutes=2), "a"),
        (4, 2, t0 + timedelta(minutes=3), "b"),
        (5, 2, t0 + timedelta(minutes=4), "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    )
    out = {
        (r.src, r.dst): r
        for r in transition_matrix(df, "user_id", ["ts", "event_id"], "event_type").collect()
    }
    assert set(out) == {("a", "b"), ("b", "a"), ("b", "b")}
    assert out[("a", "b")].n == 1 and out[("a", "b")].prob == 1.0
    # src b: b->a once, b->b once -> 0.5 each with row_total 2
    assert out[("b", "a")].row_total == 2 and out[("b", "a")].prob == 0.5
    assert out[("b", "b")].prob == 0.5


def test_transition_matrix_rows_sum_to_total(spark):
    from datetime import datetime, timedelta

    from alaska_etl_spark.operators.sessions import transition_matrix

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, i % 7, t0 + timedelta(minutes=i), "s" + str((i * 31) % 4))
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    )
    out = transition_matrix(df, "user_id", ["ts", "event_id"], "event_type").collect()
    total_transitions = sum(r.n for r in out)
    assert total_transitions == 200 - 7  # one fewer transition per user
    by_src = {}
    for r in out:
        by_src.setdefault(r.src, []).append(r)
    for src, rs in by_src.items():
        assert all(r.row_total == sum(x.n for x in rs) for r in rs)


def test_combination_overlap_exact_masks(spark):
    from alaska_etl_spark.operators.sessions import combination_overlap

    rows = [
        (1, "a"), (1, "b"),          # mask 0b011 = 3
        (2, "a"),                     # mask 1
        (3, "a"), (3, "b"), (3, "c"),  # mask 7
        (4, "b"), (4, "b"),           # mask 2 (duplicates collapse)
        (5, "zzz"),                   # non-member only: excluded
        (6, "c"), (6, "zzz"),         # mask 4 (non-member row ignored)
    ]
    df = spark.createDataFrame(rows, "u bigint, t string")
    out = {
        r.mask: r for r in combination_overlap(df, "u", "t", ["a", "b", "c"]).collect()
    }
    assert set(out) == {1, 2, 3, 4, 7}
    assert out[3].combo == "a+b" and out[3].degree == 2 and out[3].n_subjects == 1
    assert out[7].combo == "a+b+c" and out[7].degree == 3
    assert out[4].combo == "c" and out[4].n_subjects == 1
    assert sum(r.n_subjects for r in out.values()) == 5  # user 5 excluded


def test_combination_overlap_degree_totals(spark):
    from alaska_etl_spark.operators.sessions import combination_overlap

    rows = [(u, m) for u in range(20) for m in ["a", "b", "c"][: (u % 3) + 1]]
    df = spark.createDataFrame(rows, "u bigint, t string")
    out = combination_overlap(df, "u", "t", ["a", "b", "c"]).collect()
    assert sum(r.n_subjects for r in out) == 20
    by_degree = {}
    for r in out:
        by_degree[r.degree] = by_degree.get(r.degree, 0) + r.n_subjects
    assert by_degree == {1: 7, 2: 7, 3: 6}


def test_episode_support_window_edges_and_band_crossing(spark):
    from datetime import datetime, timedelta

    from alaska_etl_spark.operators.sessions import episode_support

    t0 = datetime(2024, 1, 1)
    w_us = 60 * 1_000_000  # 1 minute
    rows = [
        # a at :00, b at :59s (inside), c at exactly +60s (inclusive edge),
        # d at +61s (outside)
        (1, 1, t0, "a"),
        (2, 1, t0 + timedelta(seconds=59), "b"),
        (3, 1, t0 + timedelta(seconds=60), "c"),
        (4, 1, t0 + timedelta(seconds=61), "d"),
        # user 2: pair crossing a bucket boundary (buckets are 60s from
        # epoch; :30 and :75 are in different buckets, gap 45s <= 60)
        (5, 2, t0 + timedelta(seconds=30), "x"),
        (6, 2, t0 + timedelta(seconds=75), "y"),
        # user 3: equal timestamps -> no order evidence, no pair
        (7, 3, t0, "p"),
        (8, 3, t0, "q"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    )
    out = {
        (r.src, r.dst): (r.n_occurrences, r.support)
        for r in episode_support(df, "user_id", "ts", "event_type", window_us=w_us).collect()
    }
    assert out[("a", "b")] == (1, 1)
    assert out[("a", "c")] == (1, 1)      # exactly at the window: inclusive
    assert ("a", "d") not in out          # 61s > window
    assert out[("b", "c")] == (1, 1)
    assert out[("x", "y")] == (1, 1)      # crosses the bucket boundary
    assert not any(s in ("p", "q") or d in ("p", "q") for s, d in out)


def test_episode_support_matches_bruteforce(spark):
    from datetime import datetime, timedelta

    from alaska_etl_spark.operators.sessions import episode_support

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, i % 3, t0 + timedelta(seconds=(i * 37) % 500), "s" + str(i % 4))
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    )
    w_us = 90 * 1_000_000
    got = {
        (r.src, r.dst): (r.n_occurrences, r.support)
        for r in episode_support(df, "user_id", "ts", "event_type", window_us=w_us).collect()
    }
    from collections import defaultdict
    occ = defaultdict(int)
    sup = defaultdict(set)
    for i, u, ta, sa in [(i, u, t, s) for i, u, t, s in rows]:
        for j, v, tb, sb in rows:
            if u == v and tb > ta and (tb - ta) <= timedelta(seconds=90):
                occ[(sa, sb)] += 1
                sup[(sa, sb)].add(u)
    exp = {k: (occ[k], len(sup[k])) for k in occ}
    assert got == exp


def test_last_touch_attribution_window_and_ties(spark):
    from alaska_etl_spark.operators.sessions import last_touch_attribution

    rows = [
        # user 1: click at d1, purchase at d3 -> credited to click
        (1, 1, "2024-01-01 10:00:00", "click"),
        (2, 1, "2024-01-03 10:00:00", "purchase"),
        # user 2: view 10 days before purchase -> outside 7d -> (none)
        (3, 2, "2024-01-01 10:00:00", "view"),
        (4, 2, "2024-01-11 10:00:00", "purchase"),
        # user 3: view then click SAME ts as purchase-1s; last touch = click
        (5, 3, "2024-01-02 09:00:00", "view"),
        (6, 3, "2024-01-02 10:00:00", "click"),
        (7, 3, "2024-01-02 10:00:01", "purchase"),
        # user 4: purchase with no prior events at all -> (none)
        (8, 4, "2024-01-05 10:00:00", "purchase"),
        # non-conversion rows never appear in the report
        (9, 5, "2024-01-06 10:00:00", "error"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {r.touch_type: r for r in last_touch_attribution(
        ev, conversion_type="purchase",
        touch_types=["view", "click", "signup"], window_days=7,
    ).collect()}
    assert out["click"].n_conversions == 2   # users 1 and 3
    assert out["(none)"].n_conversions == 2  # users 2 (stale) and 4 (none)
    assert "view" not in out
    assert sum(r.n_conversions for r in out.values()) == 4
    assert out["click"].share_bp == 5000
