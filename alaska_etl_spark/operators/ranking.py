"""Distributed global ranking without the single-partition window.

``Window.orderBy(...)`` with no ``partitionBy`` moves every row to ONE
partition (Spark even logs ``WindowExec: No Partition Defined``) — the
textbook reporting form is a scale-killer on a fact table. These
operators compute the identical global ``row_number`` / ``ntile``
result with bounded per-partition state:

1. ``repartitionByRange`` on the order key — each partition holds a
   contiguous, disjoint key range (one exchange, the same one a global
   sort pays; ascending partition ids hold ascending ranges).
2. Per-partition local row numbers from ONE sequential Arrow pass
   (``mapInPandas`` with a running counter — narrow, order-preserving,
   no shuffle).
3. A partition histogram aggregated from the SAME range exchange
   (Spark's ReuseExchange/AQE stage reuse executes the shuffle once, so
   both branches see identical range bounds — pinned in
   tests/test_ranking.py), turned into cumulative offsets with a window
   over ``n_partitions`` rows (dozens of rows, not the data), broadcast
   back, and added to the local numbers.

``global_ntile`` then maps ranks to buckets arithmetically with the
exact ANSI semantics (first ``N mod k`` buckets get one extra row), so
results are bit-identical to ``ntile(k) OVER (ORDER BY ...)`` and any
SQL oracle can verify them.

The order columns must form a total order (append a unique tiebreaker
key — the caller knows which column is unique); otherwise rows that
compare equal may land on either side of a partition boundary and the
rank assignment, while still a valid permutation, is not reproducible.

Reference parity: the reference's only global ordering is a pandas
``sort_values`` on a single-machine frame (e.g.
``notebooks/2_nws_update.ipynb`` analysis cells); this is the
cluster-safe equivalent.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from alaska_etl_spark.cache import tracked_persist
from alaska_etl_spark.functions.localrel import local_df

__all__ = ["global_row_number", "global_ntile", "ntile_from_rank"]

_PID = "_gr_pid"
_LOCAL = "_gr_local"
_OFFSET = "_gr_offset"
_TOTAL = "_gr_total"


def _numbered_with_offsets(
    df: DataFrame,
    order_cols: list[str],
    num_partitions: int | None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Rows + ``_gr_rank`` (global 1-based) + ``_gr_total`` columns."""
    nparts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = df.repartitionByRange(nparts, *order_cols)
    ordered = ranged.sortWithinPartitions(*order_cols)

    fields = list(ordered.schema.fields)
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in fields)
        + f", {_PID} int, {_LOCAL} bigint"
    )

    def _number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Batches arrive in partition order, so a running counter is the
        # partition-local row_number.
        import numpy as np
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        for pdf in batches:
            n = len(pdf)
            pdf = pdf.copy()
            pdf[_PID] = np.int32(pid)
            pdf[_LOCAL] = np.arange(seen + 1, seen + n + 1, dtype=np.int64)
            seen += n
            yield pdf

    # MATERIALIZED: the histogram below must see the SAME partition ids
    # as the numbering pass. The r3 formulation computed it as a second
    # plan branch off the range exchange, relying on ReusedExchange —
    # correct in the static plan, but AQE may coalesce the two branches'
    # shuffle reads DIFFERENTLY (found at sf0.1: offsets shifted and an
    # 11th "decile" appeared). Materializing the numbered output bakes
    # the pids into data; both consumers read one execution.
    #
    # Two durability tiers, same contract as connected_components
    # (dedup.py): default ``persist`` is MEMORY_AND_DISK with lineage
    # recompute on eviction — fine locally, an eviction/recompute hazard
    # on a full fact table at 100 TB; pass ``checkpoint_dir`` (HDFS/S3/
    # GCS on a cluster) for a reliable ``checkpoint()`` whose blocks
    # survive executor loss and never recompute (a recompute after an
    # AQE-replanned exchange could renumber rows mid-query).
    numbered = ordered.mapInPandas(_number, out_schema)
    if checkpoint_dir is not None:
        from alaska_etl_spark.session import checkpoint_dir_scope

        # scoped override: checkpoint() is eager, so the configured dir
        # is restored before this function returns (ADVICE r5)
        with checkpoint_dir_scope(df.sparkSession.sparkContext, checkpoint_dir):
            numbered = numbered.checkpoint()
    else:
        numbered = tracked_persist(numbered)

    counts = numbered.groupBy(_PID).agg(F.count(F.lit(1)).alias("_n"))
    w_prev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        _PID,
        F.coalesce(F.sum("_n").over(w_prev), F.lit(0)).alias(_OFFSET),
        F.sum("_n").over(w_all).alias(_TOTAL),
    )

    return (
        numbered.join(F.broadcast(offsets), _PID)
        .withColumn("_gr_rank", (F.col(_OFFSET) + F.col(_LOCAL)).cast("long"))
        .drop(_PID, _LOCAL, _OFFSET)
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    *,
    rank_col: str = "rank",
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """``row_number() OVER (ORDER BY order_cols)`` at fact scale: one
    range exchange + one narrow Arrow pass; no single-partition window
    over the data. ``order_cols`` must be a total order (include a
    unique tiebreaker). Ascending, NULLS FIRST (Spark's default asc
    ordering) — pre-compute a sort-key column for anything fancier.
    ``checkpoint_dir``: reliable-checkpoint the numbered table instead
    of persisting it (see :func:`_numbered_with_offsets`)."""
    out = _numbered_with_offsets(df, order_cols, num_partitions, checkpoint_dir)
    return out.withColumnRenamed("_gr_rank", rank_col).drop(_TOTAL)


def ntile_from_rank(rank: Column, total: Column, k: int) -> Column:
    """ANSI ntile from a 1-based global rank: the first ``total % k``
    buckets take ``total div k + 1`` rows, the rest ``total div k``."""
    q = (total / k).cast("long")  # floor div: total, k >= 0
    r = total % k
    big = r * (q + 1)  # rows covered by the wide buckets
    return (
        F.when(rank <= big, F.ceil(rank / (q + 1)))
        .otherwise(r + F.ceil((rank - big) / F.when(q > 0, q)))
        .cast("int")
    )


def global_ntile(
    df: DataFrame,
    order_cols: list[str],
    k: int,
    *,
    bucket_col: str = "bucket",
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """``ntile(k) OVER (ORDER BY order_cols)`` without moving the data
    to one partition; bit-identical to the window form (SQL-oracle
    verifiable). Same total-order and ``checkpoint_dir`` contract as
    :func:`global_row_number`."""
    out = _numbered_with_offsets(df, order_cols, num_partitions, checkpoint_dir)
    return out.withColumn(
        bucket_col, ntile_from_rank(F.col("_gr_rank"), F.col(_TOTAL), k)
    ).drop("_gr_rank", _TOTAL)


def rrf_fuse(
    frames: list[tuple[DataFrame, list[str]]],
    id_col: str,
    *,
    k: int = 60,
    top_k: int | None = None,
    scale: int = 10**9,
    num_partitions: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher '09) of
    multiple ranked lists: ``score(d) = Σ_lists 1/(k + rank_l(d))`` —
    the standard way to fuse heterogeneous retrieval/quality signals
    (BM25 + dense cosine, or several curation heuristics) without
    calibrating their score scales; only RANKS enter the sum.

    ``frames`` is a list of ``(df, order_cols)``; each frame is ranked
    ascending by its order columns (pre-negate for descending — the
    :func:`global_row_number` contract), so every ranking is a range
    exchange + narrow Arrow pass, never a single-partition window.
    With ``top_k`` set, each list is truncated to its best ``top_k``
    rows before fusion (the retrieval-fusion convention: absence from
    a list contributes 0, and the fused frame is bounded by
    lists×top_k rows regardless of corpus size).

    Exact arithmetic: each contribution is ``scale div (k + rank)`` —
    a pure BIGINT both engines truncate identically — summed as
    BIGINT, so fused scores are aggregation-order-free and
    oracle-replayable. Returns ``(id, n_lists, rrf_units)``.
    """
    parts = []
    for fr, order_cols in frames:
        r = global_row_number(
            fr, order_cols, rank_col="_r", num_partitions=num_partitions
        )
        if top_k is not None:
            r = r.filter(F.col("_r") <= top_k)
        parts.append(
            r.select(
                F.col(id_col),
                F.expr(
                    f"cast({int(scale)} as bigint) div"
                    f" (cast({int(k)} as bigint) + _r)"
                ).alias("_u"),
            )
        )
    fused = parts[0]
    for p in parts[1:]:
        fused = fused.unionByName(p)
    return fused.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        F.sum("_u").cast("bigint").alias("rrf_units"),
    )


def rank_biased_overlap(
    a: DataFrame,
    b: DataFrame,
    *,
    query_col: str = "query_id",
    item_col: str = "doc_id",
    rank_col: str = "rank",
    p_num: int = 9,
    p_den: int = 10,
    depth: int = 10,
    scale: int = 10**9,
) -> DataFrame:
    """Truncated rank-biased overlap (Webber et al. '10) between two
    rankings of the same query set — the top-weighted agreement metric
    IR evaluation uses where Spearman/kappa (whole-list, unweighted)
    mislead: RBO@d = (1−p)·Σ_{i≤d} p^{i−1}·|A_i ∩ B_i|/i, with prefix
    overlap X_i counted at every depth. Quantifies e.g. how much a
    parameter change (qj4's RRF inputs, BM25's b) actually moves the
    ranking a user sees.

    Exact-integer lane: p is the rational p_num/p_den, so each depth
    term is X_i·(p_den−p_num)·p_num^{i−1} / (i·p_den^i) — numerator and
    denominator are exact BIGINTs (< 2^53 for depth ≤ 16), their one
    double division + plain round() is engine-identical (both engines
    round the same correctly-rounded IEEE quotient; no epsilon nudge is
    applied on either side, ADVICE r7), and the per-depth
    units sum order-free. Prefix overlaps need no window: a matched
    item at ranks (ra, rb) contributes to every depth ≥ max(ra, rb) —
    one ``sequence`` explode (codegen), one broadcast join against the
    depth/power literals, one aggregate.

    Returns ``(query_col, rbo_units, rbo)`` per query in the a-side
    (queries with zero overlap emit 0)."""
    assert p_num < p_den and depth >= 1 and p_den ** depth < 2**53
    ra = a.select(
        F.col(query_col).alias("_q"),
        F.col(item_col).alias("_it"),
        F.col(rank_col).cast("bigint").alias("_ra"),
    ).filter(F.col("_ra") <= depth)
    rb = b.select(
        F.col(query_col).alias("_q"),
        F.col(item_col).alias("_it"),
        F.col(rank_col).cast("bigint").alias("_rb"),
    ).filter(F.col("_rb") <= depth)
    matched = ra.join(rb, ["_q", "_it"]).select(
        "_q", F.greatest("_ra", "_rb").alias("_m")
    )
    contrib = matched.select(
        "_q", F.explode(F.expr(f"sequence(_m, {depth})")).alias("_i")
    )
    x = contrib.groupBy("_q", "_i").agg(
        F.count(F.lit(1)).cast("bigint").alias("_x")
    )
    spark = a.sparkSession
    powers = local_df(
        spark,
        [(i, p_num ** (i - 1), p_den**i) for i in range(1, depth + 1)],
        "_i bigint, _pn bigint, _pd bigint",
    )
    units = (
        x.join(F.broadcast(powers), "_i")
        .select(
            "_q",
            F.round(
                F.lit(scale)
                * (F.col("_x") * F.lit(p_den - p_num) * F.col("_pn")).cast("double")
                / (F.col("_i") * F.col("_pd")).cast("double")
            )
            .cast("long")
            .alias("_u"),
        )
        .groupBy("_q")
        .agg(F.sum("_u").cast("bigint").alias("rbo_units"))
    )
    return (
        ra.select("_q")
        .distinct()
        .join(units, "_q", "left")
        .select(
            F.col("_q").alias(query_col),
            F.coalesce(F.col("rbo_units"), F.lit(0)).cast("bigint").alias("rbo_units"),
            (
                F.coalesce(F.col("rbo_units"), F.lit(0)).cast("double")
                / F.lit(float(scale))
            ).alias("rbo"),
        )
        .orderBy(query_col)
    )
