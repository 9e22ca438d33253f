"""Input-parallelism guard for CPU-heavy narrow pipelines.

Spark sizes scan parallelism by BYTES (one task per
``maxPartitionBytes`` split, one split minimum per file/row group) and
AQE coalesces shuffle reads by bytes too. Both are the right call for
I/O — and systematically wrong for compute-dense rows: a 10 MB
documents file is ONE task, so an explode → per-token scoring → join
pipeline fused into that scan runs on one core no matter how many the
session has (measured: q89's LM scoring spent 10 s single-task at
sf0.1 on 32 cores).

``ensure_min_parallelism`` inserts an explicit hash repartition ONLY
when the current plan's parallelism is below the session's shuffle
parallelism. The explicit partition count matters twice: it spreads the
compute, and ``REPARTITION_BY_NUM`` is exempt from AQE coalescing, so a
downstream Python/codegen-heavy stage keeps its width even when its
shuffle bytes look tiny.

At scale this is a no-op by construction — a fact table's scan already
has ≥ nparts splits, ``getNumPartitions`` sees that (file listing, no
job), and no exchange is added. The guard only fires in the
small-input/compact-file regime, where the shuffle it adds is by
definition small (that's why the scan was narrow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_min_parallelism"]


def ensure_min_parallelism(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition ``df`` by ``cols`` (or round-robin when none) to the
    session's shuffle parallelism — only if its current plan has fewer
    partitions."""
    nparts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover — exotic plans; fail open
        return df
    if current >= nparts:
        return df
    return df.repartition(nparts, *cols) if cols else df.repartition(nparts)
