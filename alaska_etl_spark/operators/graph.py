"""Iterative graph algorithms as DataFrame loops, engine-exact in
fixed-point integers.

PageRank's textbook form is float power iteration — and per-iteration
float sums are summation-order-dependent, so a 32-partition Spark run,
a single-thread oracle, and a rerun after AQE re-plans can all disagree
in the last ulps, compounding per iteration. Integer fixed-point
removes the drift: ranks live in parts-per-``scale`` (default 1e6),
every step is integer division and integer sums (order-independent by
construction), so ANY engine that replays the same arithmetic —
including DuckDB via an unrolled CTE chain emitted from the same spec
(qb6) — reproduces the ranks bit-for-bit, like the splits/layout hash
family.

Scale shape per iteration: one join (ranks ⋈ edges on src — shuffles
only the rank table if edges are pre-partitioned by src; edges are
persisted once) and one hash aggregate on dst with map-side partial
sums. Lineage is truncated every iteration (``localCheckpoint``, or
reliable ``checkpoint`` when a dir is given) — the q42
connected-components discipline, without which the plan doubles per
round.

The dangling-mass convention: nodes with no outgoing edges leak their
rank mass (the simplest standard variant). Undirected graphs (edges
present in both directions) have no dangling nodes, so the demo query
feeds the bipartite customer⇄supplier graph both ways.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "pagerank_sql"]


def pagerank(
    edges: DataFrame,
    *,
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 1_000_000,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-point PageRank over an edge list. Returns (node, rank_ppm)
    where rank_ppm is the integer rank in parts-per-``scale``
    (initial rank = ``scale`` per node; teleport + damped in-flow each
    round, all integer arithmetic):

        rank'(v) = scale·(den−num)/den  +  num · Σ_{u→v} (rank(u) div outdeg(u)) div den
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).persist()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    ew = e.join(outdeg, "src").persist()
    nodes = e.select(F.col("src").alias("node")).distinct()
    ranks = nodes.withColumn("rank_ppm", F.lit(scale).cast("bigint"))
    teleport = scale * (damping_den - damping_num) // damping_den
    if checkpoint_dir is not None:
        e.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    for _ in range(iters):
        contrib = (
            ew.join(ranks, ew.src == ranks.node)
            .select("dst", F.expr("rank_ppm div _d").alias("_c"))
            .groupBy("dst")
            .agg(F.sum("_c").alias("_in"))
        )
        updated = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(f"{damping_num} * coalesce(_in, 0L) div {damping_den}")
                ).alias("rank_ppm"),
            )
        )
        ranks = (
            updated.checkpoint() if checkpoint_dir is not None
            else updated.localCheckpoint()
        )
    return ranks


def pagerank_sql(
    edges_cte: str,
    *,
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 1_000_000,
) -> str:
    """The identical iteration as ANSI SQL: ``iters`` UNROLLED CTE
    levels emitted from the same spec (recursive CTEs can't aggregate
    in the recursive term in most engines; unrolling sidesteps the
    restriction and keeps every level a plain grouped join). The caller
    provides ``edges_cte`` — a SELECT yielding (src, dst)."""
    teleport = scale * (damping_den - damping_num) // damping_den
    parts = [
        f"edges AS ({edges_cte})",
        "outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY src)",
        "ew AS (SELECT e.src, e.dst, o.d FROM edges e JOIN outdeg o ON e.src = o.src)",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank_ppm FROM nodes)",
    ]
    for i in range(1, iters + 1):
        # CAST per level: DuckDB widens sum(BIGINT) to HUGEINT, which
        # pandas reads as float — the values are identical, the TYPE
        # must stay bigint for the hash compare
        parts.append(
            f"r{i} AS (SELECT n.node, "
            f"CAST({teleport} + {damping_num} * coalesce(c.inflow, 0) // {damping_den} AS BIGINT) AS rank_ppm "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT ew.dst, sum(r.rank_ppm // ew.d) AS inflow "
            f"FROM ew JOIN r{i - 1} r ON ew.src = r.node GROUP BY ew.dst"
            f") c ON n.node = c.dst)"
        )
    return "WITH " + ", ".join(parts) + f" SELECT node, rank_ppm FROM r{iters}"
