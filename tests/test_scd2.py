"""SCD Type-2 dimension history (plans/warehouse.py): version opening
and closing, no spurious versions, partial-batch behavior, and the
partition-pruned current-scan pin."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from alaska_etl_spark.plans.warehouse import Warehouse, scd2_merge

T1 = dt.datetime(2024, 1, 1)
T2 = dt.datetime(2024, 2, 1)
T3 = dt.datetime(2024, 3, 1)


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path))


def _dim(spark, rows):
    return spark.createDataFrame(rows, "station string, name string, tz string")


def test_scd2_open_change_close(spark, wh):
    wh.scd2_upsert(
        _dim(spark, [("A", "Fairbanks", "AKST"), ("B", "Sitka", "AKST")]),
        "dim",
        key_cols=["station"],
        attr_cols=["name", "tz"],
        as_of=T1,
    )
    # change A's name, B unchanged
    wh.scd2_upsert(
        _dim(spark, [("A", "Fairbanks NE", "AKST"), ("B", "Sitka", "AKST")]),
        "dim",
        key_cols=["station"],
        attr_cols=["name", "tz"],
        as_of=T2,
    )
    hist = {
        (r.station, r.name, r.is_current, r.effective_from, r.effective_to)
        for r in wh.scd2_history("dim").collect()
    }
    assert hist == {
        ("A", "Fairbanks", False, T1, T2),
        ("A", "Fairbanks NE", True, T2, None),
        ("B", "Sitka", True, T1, None),  # unchanged: ONE version, original stamp
    }


def test_scd2_partial_batch_keeps_missing_keys_open(spark, wh):
    wh.scd2_upsert(
        _dim(spark, [("A", "a", "x"), ("B", "b", "x")]),
        "dim",
        key_cols=["station"],
        attr_cols=["name", "tz"],
        as_of=T1,
    )
    wh.scd2_upsert(
        _dim(spark, [("A", "a2", "x")]),  # B absent
        "dim",
        key_cols=["station"],
        attr_cols=["name", "tz"],
        as_of=T2,
    )
    cur = {
        (r.station, r.name)
        for r in wh.scd2_history("dim").filter("is_current").collect()
    }
    assert cur == {("A", "a2"), ("B", "b")}


def test_scd2_new_key_and_three_versions(spark, wh):
    for ts, name in ((T1, "v1"), (T2, "v2"), (T3, "v3")):
        wh.scd2_upsert(
            _dim(spark, [("A", name, "x")]),
            "dim",
            key_cols=["station"],
            attr_cols=["name", "tz"],
            as_of=ts,
        )
    rows = sorted(
        wh.scd2_history("dim").collect(), key=lambda r: r.effective_from
    )
    assert [(r.name, r.is_current) for r in rows] == [
        ("v1", False),
        ("v2", False),
        ("v3", True),
    ]
    assert [(r.effective_from, r.effective_to) for r in rows] == [
        (T1, T2),
        (T2, T3),
        (T3, None),
    ]


def test_scd2_idempotent_rerun_no_new_versions(spark, wh):
    batch = _dim(spark, [("A", "a", "x")])
    wh.scd2_upsert(batch, "dim", key_cols=["station"], attr_cols=["name", "tz"], as_of=T1)
    wh.scd2_upsert(batch, "dim", key_cols=["station"], attr_cols=["name", "tz"], as_of=T2)
    assert wh.scd2_history("dim").count() == 1  # unchanged rerun adds nothing


def test_scd2_merge_null_safe_attr_compare(spark):
    cur = spark.createDataFrame(
        [("A", None, T1, None, True)],
        "station string, name string, effective_from timestamp, "
        "effective_to timestamp, is_current boolean",
    )
    batch = spark.createDataFrame([("A", None)], "station string, name string")
    new_cur, closed = scd2_merge(
        cur, batch, key_cols=["station"], attr_cols=["name"], as_of=T2
    )
    assert closed.count() == 0  # NULL == NULL attr: unchanged
    assert new_cur.count() == 1


def test_scd2_current_scan_partition_prunes(spark, wh):
    wh.scd2_upsert(
        _dim(spark, [("A", "a", "x")]),
        "dim",
        key_cols=["station"],
        attr_cols=["name", "tz"],
        as_of=T1,
    )
    q = wh.read("dim").filter(F.col("_scd_state") == "current")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_scd_state" in plan.split("PartitionFilters")[1][:200]
