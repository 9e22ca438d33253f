"""Bucketed co-located joins: the plan-level proof that same-bucketed
tables join with no exchange (the shuffle is paid at write time once,
not per query — SURVEY §4's physical choice for the 100 TB facts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alaska_etl_spark.plans.warehouse import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")
    return Warehouse(spark, str(tmp_path))


def test_bucketed_join_has_no_exchange(spark, wh):
    orders = spark.range(1000).select(
        F.col("id").alias("order_id"), (F.col("id") % 7).alias("status")
    )
    items = spark.range(3000).select(
        (F.col("id") % 1000).alias("order_id"), (F.col("id") * 2).alias("qty")
    )
    wh.save_bucketed(orders, "b_orders", bucket_cols=["order_id"], n_buckets=4,
                     sort_cols=["order_id"])
    wh.save_bucketed(items, "b_items", bucket_cols=["order_id"], n_buckets=4,
                     sort_cols=["order_id"])

    a, b = wh.read_table("b_orders"), wh.read_table("b_items")
    # force sort-merge so the bucket layout (not a broadcast) carries the join
    with_smj = a.hint("merge").join(b, "order_id")
    plan = with_smj._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: neither side shuffles
    assert with_smj.count() == 3000


def test_unbucketed_same_join_shuffles(spark, wh):
    """Control: the identical join over plain parquet DOES exchange —
    the bucket metadata is what removes it."""
    orders = spark.range(1000).select(F.col("id").alias("order_id"))
    items = spark.range(3000).select((F.col("id") % 1000).alias("order_id"))
    p1, p2 = f"{wh.root}/plain_orders", f"{wh.root}/plain_items"
    orders.write.parquet(p1)
    items.write.parquet(p2)
    joined = (
        spark.read.parquet(p1).hint("merge").join(spark.read.parquet(p2), "order_id")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" in plan  # both sides shuffle
