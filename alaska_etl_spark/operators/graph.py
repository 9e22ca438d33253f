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

from alaska_etl_spark.cache import tracked_persist

__all__ = ["bfs_distances", "bfs_sql", "pagerank", "pagerank_sql", "triangle_counts"]


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
    e = tracked_persist(edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    ew = tracked_persist(e.join(outdeg, "src"))
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


def triangle_counts(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts on an undirected simple graph, via
    DEGREE-ORDERED ORIENTATION (the standard scale trick): orient every
    edge from the (degree, id)-smaller endpoint to the larger, build
    wedges only from each node's OUT-neighbors, and close them against
    oriented edges. Every triangle is then found exactly once, and the
    wedge count is Σ outdeg(v)² where orientation provably caps outdeg
    at O(√|E|) — a skewed hub with a million neighbors contributes
    almost no wedges because nearly all its edges point IN. The naive
    edge³ self-join blows up on exactly those hubs.

    Input edges may be directed/duplicated; they are normalized to
    distinct undirected pairs first. Returns (node, n_triangles) for
    every node with ≥ 1 edge. Three shuffles total: degree count, the
    wedge build (self-join on the wedge apex), the closing semi-join —
    plus the final explode + count. DuckDB oracles it with the brute
    a<b<c triple join (qb7)."""
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    und = tracked_persist(und)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("_deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("_deg").alias("_da"))
    db = deg.select(F.col("node").alias("b"), F.col("_deg").alias("_db"))
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("_da") < F.col("_db"))
                | ((F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("_e")
        )
        .select("_e.u", "_e.v")
    )
    oriented = tracked_persist(oriented)
    w1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = w1.join(w2, "u").filter(F.col("x") < F.col("y"))
    # close the wedge against the normalized undirected table: x < y
    # matches und's a < b normalization directly
    tris = wedges.join(
        und.select(F.col("a").alias("x"), F.col("b").alias("y")), ["x", "y"], "left_semi"
    )
    per_node = (
        tris.select(F.col("u").alias("node"))
        .unionAll(tris.select(F.col("x").alias("node")))
        .unionAll(tris.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nodes = deg.select("node")
    return nodes.join(per_node, "node", "left").select(
        "node", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles")
    )


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    *,
    max_hops: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Hop distances from a source set over a DIRECTED edge list, up to
    ``max_hops`` rounds of frontier relaxation: dist'(v) =
    min(dist(v), min over in-neighbors u of dist(u)+1). Returns
    (node, dist) for every node REACHED within the bound — integer
    distances, so the result is engine-exact and DuckDB replays it as
    an unrolled min-aggregate CTE chain (:func:`bfs_sql`, qb8).

    The same loop discipline as :func:`pagerank` and the q42 connected
    components: one join + one min-aggregate per round over the
    REACHED set only (the frontier's closure, not the whole graph),
    lineage truncated per round. Undirected graphs pass edges in both
    directions."""
    e = tracked_persist(edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")))
    dist = sources.select(F.col(node_col).alias("node")).distinct().withColumn(
        "dist", F.lit(0).cast("bigint")
    )
    if checkpoint_dir is not None:
        e.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    for _ in range(max_hops):
        reached = (
            e.join(dist, e.src == dist.node)
            .select("dst", (F.col("dist") + 1).alias("_nd"))
            .groupBy("dst")
            .agg(F.min("_nd").alias("_nd"))
        )
        merged = (
            dist.join(reached, dist.node == reached.dst, "full_outer")
            .select(
                F.coalesce("node", "dst").alias("node"),
                F.least(
                    F.coalesce("dist", F.lit(1 << 60)),
                    F.coalesce("_nd", F.lit(1 << 60)),
                ).alias("dist"),
            )
        )
        dist = (
            merged.checkpoint() if checkpoint_dir is not None
            else merged.localCheckpoint()
        )
    return dist


def bfs_sql(edges_cte: str, sources_cte: str, *, max_hops: int = 5) -> str:
    """The identical relaxation as ANSI SQL, unrolled (one
    min-aggregate CTE level per hop)."""
    parts = [
        f"edges AS ({edges_cte})",
        f"d0 AS (SELECT DISTINCT node, CAST(0 AS BIGINT) AS dist FROM ({sources_cte}))",
    ]
    for i in range(1, max_hops + 1):
        parts.append(
            f"d{i} AS (SELECT node, min(dist) AS dist FROM ("
            f"SELECT node, dist FROM d{i - 1} "
            f"UNION ALL "
            f"SELECT e.dst AS node, d.dist + 1 AS dist "
            f"FROM edges e JOIN d{i - 1} d ON e.src = d.node"
            f") GROUP BY node)"
        )
    return "WITH " + ", ".join(parts) + f" SELECT node, dist FROM d{max_hops}"


def k_core(
    edges: DataFrame,
    k: int,
    *,
    iters: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """k-core peeling: iteratively delete nodes of degree < ``k`` (with
    their edges) for ``iters`` rounds; return the surviving nodes and
    their degree in the surviving subgraph. The k-core is the classic
    "dense engaged kernel" cut of an interaction graph — spam/bot rings
    and power-user communities survive, one-shot visitors peel away —
    and the peel count itself is the coreness curve's raw material.

    FIXED iteration count, not run-to-convergence: like
    :func:`pagerank`, the loop is replayed verbatim by an unrolled CTE
    chain (:func:`k_core_sql`) emitted from the same spec, so the
    result is engine-exact whether or not round ``iters`` was a
    fixpoint (peeling is monotone — once converged, further rounds are
    identity; callers size ``iters`` ≥ the expected peel depth, and a
    converged run is detectable as degree ≥ k on every output row).

    Expects an edge list that already contains both directions of each
    undirected edge (the qb6 trade-graph convention); self-loops are
    dropped. Each round is one degree aggregate + two semi-joins, with
    the lineage cut per round (checkpoint / localCheckpoint — the q42
    pointer-jumping discipline) so the plan never stacks ``iters``
    joins. Returns (node, degree) ordered by node."""
    e = tracked_persist(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if checkpoint_dir is not None:
        e.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    surv = e
    for _ in range(iters):
        deg = surv.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
        keep = deg.filter(F.col("_d") >= k).select("src")
        pruned = surv.join(keep, "src", "left_semi").join(
            keep.select(F.col("src").alias("dst")), "dst", "left_semi"
        )
        surv = (
            pruned.checkpoint() if checkpoint_dir is not None
            else pruned.localCheckpoint()
        )
    return (
        surv.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        .orderBy("node")
    )


def k_core_sql(edges_cte: str, k: int, *, iters: int = 8) -> str:
    """The DuckDB twin of :func:`k_core`: the same fixed peel unrolled
    as a CTE chain. ``edges_cte`` must yield (src, dst) with both
    directions present; self-loops are dropped here, matching the
    engine."""
    parts = [
        f"e0 AS (SELECT DISTINCT src, dst FROM ({edges_cte}) WHERE src <> dst)"
    ]
    for i in range(iters):
        parts.append(
            f"d{i} AS (SELECT src, count(*) AS c FROM e{i} GROUP BY src)"
        )
        parts.append(f"n{i} AS (SELECT src FROM d{i} WHERE c >= {k})")
        parts.append(
            f"e{i + 1} AS (SELECT e.src, e.dst FROM e{i} e"
            f" JOIN n{i} a ON e.src = a.src"
            f" JOIN n{i} b ON e.dst = b.src)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT src AS node, CAST(count(*) AS BIGINT) AS degree"
        + f" FROM e{iters} GROUP BY src ORDER BY node"
    )
