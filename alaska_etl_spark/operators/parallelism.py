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

import os
import re
import urllib.parse

from pyspark.sql import DataFrame

__all__ = ["ensure_min_parallelism", "plan_scan_partitions"]

# analyzed-plan nodes that preserve the scan's partitioning 1:1 — a
# chain of only these above a file Relation has exactly the scan's
# split count, so the count is computable driver-side from file sizes
_NARROW_NODES = frozenset({"Project", "Filter", "Relation", "SubqueryAlias"})

_BYTE_SUFFIX = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10, "kib": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20, "mib": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30, "gib": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40, "tib": 1 << 40,
}


def _parse_bytes(s: str) -> int:
    m = re.match(r"^(\d+)\s*([kmgt]?i?b?)?$", str(s).strip().lower())
    if not m:
        raise ValueError(f"unparseable byte size {s!r}")
    return int(m.group(1)) * _BYTE_SUFFIX[m.group(2) or ""]


def _pack_splits(sizes: "list[int]", max_pb: int, open_cost: int, min_pn: int) -> int:
    """Spark's FilePartition split math, verbatim (FileSourceScanExec.
    createReadRDD / FilePartition.getFilePartitions): maxSplitBytes =
    min(maxPartitionBytes, max(openCostInBytes, totalBytes div
    minPartitionNum)); files chop into maxSplitBytes ranges; splits
    sort by length desc and pack first-fit, each charged length +
    openCost. Validated split-for-split against
    ``df.rdd.getNumPartitions()`` on every test table at 3 SFs (r13)."""
    total = sum(s + open_cost for s in sizes)
    bpc = total // max(min_pn, 1)
    max_split = min(max_pb, max(open_cost, bpc))
    splits: "list[int]" = []
    for s in sizes:
        off = 0
        while off < s:
            splits.append(min(max_split, s - off))
            off += max_split
    splits.sort(reverse=True)
    parts, cur, has = 0, 0, False
    for sp in splits:
        if has and cur + sp > max_split:
            parts += 1
            cur, has = 0, False
        cur += sp + open_cost
        has = True
    if has:
        parts += 1
    return parts


def plan_scan_partitions(df: DataFrame) -> "int | None":
    """The plan's partition count, WITHOUT an RDD conversion — or None
    when it cannot be derived driver-side (non-narrow plan, non-local
    files, unreadable conf).

    ``df.rdd.getNumPartitions()`` costs ~70-120 ms per call (plan →
    RDD conversion + Python serializer setup; ~1.1 s on a session's
    first use) and this module's guard runs on nearly every operator's
    input — measured seconds per bench run of pure driver time (r13,
    guide §5: the driver should do almost no data work). For the
    narrow-over-file-scan frames the guard actually sees, the split
    count is a pure function of (file lengths, 3 confs) — recomputed
    here exactly and validated against the RDD answer on every test
    table; anything else falls back to the RDD path."""
    try:
        tree = df._jdf.queryExecution().analyzed().treeString()
        for line in tree.splitlines():
            m = re.match(r"^[\s+:|-]*([A-Za-z]+)", line)
            if m and m.group(1) not in _NARROW_NODES:
                return None
        files = df.inputFiles()
        if not files:
            return None
        sizes = []
        for f in files:
            u = urllib.parse.urlparse(f)
            if u.scheme not in ("file", ""):
                return None
            sizes.append(os.path.getsize(urllib.parse.unquote(u.path)))
        conf = df.sparkSession.conf
        max_pb = _parse_bytes(conf.get("spark.sql.files.maxPartitionBytes"))
        open_cost = _parse_bytes(conf.get("spark.sql.files.openCostInBytes"))
        try:
            min_pn = int(conf.get("spark.sql.files.minPartitionNum"))
        except Exception:
            min_pn = df.sparkSession.sparkContext.defaultParallelism
        return _pack_splits(sizes, max_pb, open_cost, min_pn)
    except Exception:  # pragma: no cover — fail open to the RDD path
        return None


def ensure_min_parallelism(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition ``df`` by ``cols`` (or round-robin when none) to the
    session's shuffle parallelism — only if its current plan has fewer
    partitions."""
    nparts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    current = plan_scan_partitions(df)
    if current is None:
        try:
            current = df.rdd.getNumPartitions()
        except Exception:  # pragma: no cover — exotic plans; fail open
            return df
    if current >= nparts:
        return df
    return df.repartition(nparts, *cols) if cols else df.repartition(nparts)
