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


# --- triangle counting ------------------------------------------------------


def _tri(spark, edges):
    from alaska_etl_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {r.node: r.n_triangles for r in triangle_counts(df).collect()}


def test_k4_and_path(spark):
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    path = [(10, 11), (11, 12), (12, 13)]
    got = _tri(spark, k4 + path)
    assert {n: got[n] for n in range(4)} == {0: 3, 1: 3, 2: 3, 3: 3}
    assert {n: got[n] for n in (10, 11, 12, 13)} == {10: 0, 11: 0, 12: 0, 13: 0}


def test_normalizes_directed_and_duplicate_edges(spark):
    # triangle given as a messy directed multigraph
    messy = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 3), (2, 2)]
    got = _tri(spark, messy)
    assert got == {1: 1, 2: 1, 3: 1}


def test_matches_python_replica_with_hub(spark):
    # a hub (node 0) connected to everyone + a pseudo-random sparse layer:
    # exactly the degree-skew the orientation is built for
    edges = [(0, i) for i in range(1, 30)]
    edges += [(i, (i * 11 + 5) % 29 + 1) for i in range(1, 30)]
    got = _tri(spark, edges)

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {n for e in und for n in e}
    count = {n: 0 for n in nodes}
    for a, b in und:
        for c in nodes:
            if c > b and (a, c) in und and (b, c) in und:
                for n in (a, b, c):
                    count[n] += 1
    assert got == count and sum(count.values()) > 0


# --- bounded-hop BFS --------------------------------------------------------


def _bfs(spark, edges, sources, hops):
    from alaska_etl_spark.operators.graph import bfs_distances

    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    s = spark.createDataFrame([(x,) for x in sources], "node bigint")
    return {r.node: r.dist for r in bfs_distances(e, s, max_hops=hops).collect()}


def test_bfs_chain_distances_and_bound(spark):
    # directed chain 0 -> 1 -> ... -> 9, source 0, 4 hops: nodes past
    # the bound are NOT reported
    chain = [(i, i + 1) for i in range(9)]
    got = _bfs(spark, chain, [0], 4)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_bfs_multi_source_takes_minimum(spark):
    chain = [(i, i + 1) for i in range(9)]
    got = _bfs(spark, chain, [0, 6], 3)
    assert got[7] == 1 and got[8] == 2 and got[9] == 3  # from source 6
    assert got[3] == 3  # from source 0
    assert got[6] == 0  # a source even though also reachable at dist 6


def test_bfs_shortcut_wins_over_long_path(spark):
    edges = [(0, 1), (1, 2), (2, 3), (0, 3)]
    got = _bfs(spark, edges, [0], 4)
    assert got[3] == 1
