"""Skyline (Pareto-front) queries: the set of rows no other row
dominates.

The classic OLAP skyline operator (Börzsönyi, Kossmann & Stocker,
ICDE '01 — the "skyline of Manhattan hotels: cheap AND close to the
beach" query): row ``r`` is dominated iff some row ``s`` is at least
as good on every criterion and strictly better on one. The reference
(apsocarras/alaska-etl) computes no preference queries; this extends
its analytics surface (SURVEY §2.14) with the standard multi-criteria
shortlist primitive a catalog/pricing pipeline needs ("cheapest part
at every size level").

Spark-first design — the 2-D skyline never compares rows pairwise:

1. ``groupBy(min_col).agg(max(max_col))`` collapses the input to one
   row per distinct value of the minimized dimension (one shuffle,
   map-side partial aggregation). For a price-like key this frame is
   bounded by the value domain, not the row count.
2. A running ``max`` over the reduced frame, ordered by the minimized
   dimension, finds for each price level the best ``max_col`` among
   all *strictly cheaper* levels. The window is single-partition, but
   over the REDUCED frame only — at 100 TB the distinct-price frame is
   millions of rows where the input is billions, and skylines are
   distributive (the global skyline is a subset of any union of
   partition-local skylines), so a local pre-prune can bound it
   further if the domain ever explodes.
3. The surviving ``(min_col, max_col)`` pairs — the front — are tiny
   by construction (one per ascending "staircase" step), so the join
   back to recover full rows is a broadcast hash join, no shuffle of
   the fact side.

Dominance (minimize ``min_col``, maximize ``max_col``)::

    s dominates r  iff  s.min <= r.min and s.max >= r.max
                        and (s.min < r.min or s.max > r.max)

Ties: duplicate ``(min_col, max_col)`` rows do not dominate each
other — ALL rows equal to a front point are returned (the SQL
semantics; callers wanting one representative dedup afterwards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, min_col: str, max_col: str) -> DataFrame:
    """Rows of ``df`` on the 2-D Pareto front: minimize ``min_col``,
    maximize ``max_col``. Returns the input rows (all columns) that no
    other row dominates; comparisons are exact value equality/order on
    the two criterion columns (no float arithmetic is introduced).
    """
    reduced = df.groupBy(min_col).agg(F.max(max_col).alias("_gmax"))
    w_prev = Window.orderBy(min_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    front = (
        reduced.select(
            F.col(min_col),
            F.col("_gmax"),
            F.max("_gmax").over(w_prev).alias("_prevmax"),
        )
        # survives iff no strictly-cheaper level reaches (or beats) it
        .filter(F.col("_prevmax").isNull() | (F.col("_prevmax") < F.col("_gmax")))
        # fresh column names break the self-join lineage ambiguity
        .select(F.col(min_col).alias("_fmin"), F.col("_gmax").alias("_fmax"))
    )
    return (
        df.join(
            F.broadcast(front),
            on=[
                F.col(min_col) == F.col("_fmin"),
                F.col(max_col) == F.col("_fmax"),
            ],
            how="inner",
        )
        .select(*df.columns)
    )
