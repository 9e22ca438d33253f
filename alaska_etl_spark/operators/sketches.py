"""Sketch aggregates: approximate distinct counts (HyperLogLog++) and
approximate quantiles (Greenwald-Khanna) with their exact companions.

The scale rationale: COUNT(DISTINCT x) per group is an Expand-based
two-phase aggregate whose state is the distinct value set — at 100 TB
the state IS the data. The HLL++ sketch (``approx_count_distinct``)
keeps fixed ~kilobyte state per group, merges associatively (map-side
partials combine like any sum), and trades a configured relative error.
Same story for exact percentiles (full sort / large state) vs
Greenwald-Khanna (``percentile_approx``, bounded state).

Sketch outputs are engine-defined → rows-only in the driver gate
(q55_approx_distinct, q57_approx_quantiles); the exact companions are
the oracles (q46_distinct_counts, q38_percentiles), and the error-bound
contract — |approx − exact| / exact within tolerance — is pinned in
tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_counts(df: DataFrame, group_cols: list[str], col: str) -> DataFrame:
    """Exact per-group distinct counts (the oracle companion)."""
    return df.groupBy(*group_cols).agg(F.countDistinct(col).alias("n_distinct"))


def approx_distinct_counts(
    df: DataFrame, group_cols: list[str], col: str, *, rsd: float = 0.02
) -> DataFrame:
    """HLL++ per-group distinct counts at ``rsd`` relative standard
    deviation — fixed-size mergeable state instead of a distinct set."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(col, rsd=rsd).alias("n_distinct_approx")
    )


def approx_quantiles(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    probs: list[float],
    *,
    accuracy: int = 10_000,
) -> DataFrame:
    """Greenwald-Khanna approximate quantiles per group; state is
    O(accuracy), not O(rows)."""
    return df.groupBy(*group_cols).agg(
        F.percentile_approx(col, probs, accuracy).alias("quantiles_approx")
    )
