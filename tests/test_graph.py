"""Fixed-point PageRank (operators/graph.py): hand math, a pure-python
replica, and the bounded-lineage discipline."""

from __future__ import annotations

from pyspark.sql import functions as F

from alaska_etl_spark.operators.graph import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {r.node: r.rank_ppm for r in pagerank(df, **kw).collect()}


def test_two_cycle_is_the_exact_fixpoint(spark):
    # each node passes its whole rank to the other: 150000 + 85% of 1e6
    # is exactly 1e6 again, every iteration, in exact integers
    got = _ranks(spark, [(1, 2), (2, 1)], iters=7)
    assert got == {1: 1_000_000, 2: 1_000_000}


def test_star_center_dominates(spark):
    edges = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
    got = _ranks(spark, edges, iters=5)
    assert got[0] > 2_000_000  # hub concentrates mass
    assert all(got[i] < got[0] for i in range(1, 6))
    assert len(set(got[i] for i in range(1, 6))) == 1  # leaves symmetric


def test_matches_pure_python_replica(spark):
    edges = []
    for i in range(40):
        edges.append((i, (i * 7 + 3) % 40))
        edges.append(((i * 7 + 3) % 40, i))
    edges = sorted(set(edges))
    got = _ranks(spark, edges, iters=5)

    nodes = sorted({s for s, _ in edges})
    out = {n: sum(1 for s, _ in edges if s == n) for n in nodes}
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(5):
        inflow = {n: 0 for n in nodes}
        for s, d in edges:
            inflow[d] += rank[s] // out[s]
        rank = {n: 150_000 + 85 * inflow[n] // 100 for n in nodes}
    assert got == rank


def test_lineage_is_truncated_per_iteration(spark):
    edges = [(i, (i + 1) % 10) for i in range(10)] + [((i + 1) % 10, i) for i in range(10)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = pagerank(df, iters=6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the final plan reads the checkpointed previous round, not 6 stacked
    # join+aggregate rounds (q42's connected-components discipline)
    assert "ExistingRDD" in plan
    assert plan.count("HashAggregate") <= 4
