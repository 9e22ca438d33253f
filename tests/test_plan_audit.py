"""Repo-wide physical-plan audit: EVERY registered query planned at
sf0.001 must be free of (a) true cartesian products and (b)
row-at-a-time Python UDFs (`BatchEvalPython`). Broadcast nested-loop
joins are allowed — several operators broadcast a tiny-by-contract
side (cosine query sets, 1-row corpus counts) with a non-equi or empty
condition, which Spark plans as BNLJ over a broadcast; the per-operator
tests pin those shapes individually.

This is the wholesale form of the per-operator plan pins: any future
operator that sneaks in an interpreted Python UDF or an unbounded
cross join fails here before the driver ever sees it.
"""

from __future__ import annotations

import pytest

from alaska_etl_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

#: queries whose construction runs real side-effect jobs (rollup
#: refresh loops, pipeline checkpoints) — planned AND executed cheaply
#: at sf0.001, but worth listing so a hang is attributable.
_HEAVY_BUILD = {"q73_training_pipeline", "q87_continuous_rollup"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_no_row_python_udf(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time Python UDF"
