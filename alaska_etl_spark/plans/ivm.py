"""Incremental maintenance of a materialized JOIN view (delta
propagation) — the join analogue of the rollup maintenance in
:mod:`~alaska_etl_spark.plans.rollup`.

A materialized inner-join view V = A ⋈ B under append-only sources
updates with the standard delta rule:

    ΔV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

so each refresh touches the (small) deltas against the accumulated
state instead of recomputing the full join — at 100 TB the difference
between a per-batch broadcast join and a per-batch full-table
sort-merge join.

State layout: the view and both source states are plain append-only
parquet directories. The delta sides are broadcast by contract (an
incremental batch is small next to accumulated state — the same
envelope as the warehouse load's staging side); the stored sides are
scanned once per refresh. On a real deployment the two state tables
are written ``bucketBy`` the join key (plans/catalog.py machinery), so
the ΔA ⋈ B_old probe co-locates and the stored side is never
shuffled; the view itself needs no clustering (append-only).

Invariant (pinned in tests/test_ivm.py and oracled end-to-end by q99):
folding ANY partition of the source streams into batches, interleaved
in ANY order, yields a view equal to the one-shot join of everything.
Append-only sources only — updates/deletes need retraction records
(negative multiplicity), which this baseline deliberately omits.

Replay caveat: refresh is additive (like the rollup): a replayed batch
double-joins. The streaming form rides ``foreachBatch`` behind a
checkpoint (exactly-once batch tracking), the batch form is the
caller's idempotence contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["refresh_join_view", "read_view"]


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    if not os.path.isdir(path):
        return None
    return spark.read.parquet(path)


def refresh_join_view(
    spark: SparkSession,
    root: str,
    *,
    on: list[str],
    delta_a: DataFrame | None = None,
    delta_b: DataFrame | None = None,
) -> None:
    """Fold source deltas into the materialized view at ``root``
    (subdirs ``a_state``, ``b_state``, ``view``). Either delta may be
    None/empty. Columns: the view carries ``on`` once plus both sides'
    non-key columns (inner join semantics)."""
    a_path, b_path, v_path = (
        f"{root}/a_state",
        f"{root}/b_state",
        f"{root}/view",
    )
    a_old = _read_or_none(spark, a_path)
    b_old = _read_or_none(spark, b_path)

    parts = []
    if delta_a is not None and b_old is not None:
        parts.append(F.broadcast(delta_a).join(b_old, on))
    if delta_b is not None and a_old is not None:
        parts.append(a_old.join(F.broadcast(delta_b), on))
    if delta_a is not None and delta_b is not None:
        parts.append(F.broadcast(delta_a).join(delta_b, on))

    if parts:
        dv = parts[0]
        for p in parts[1:]:
            dv = dv.unionByName(p)
        dv.write.mode("append").parquet(v_path)

    # state updates AFTER the view delta (ΔA must not see itself in A_old)
    if delta_a is not None:
        delta_a.write.mode("append").parquet(a_path)
    if delta_b is not None:
        delta_b.write.mode("append").parquet(b_path)


def read_view(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(f"{root}/view")
