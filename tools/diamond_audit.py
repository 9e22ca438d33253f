"""Unpersisted-diamond audit over every registered query (guide §2.4).

A "diamond" is a subtree the plan executes more than once because a
frame feeds two consumers without a persist. In `explain("formatted")`
output a CACHED plan re-printed at a second scan site reuses its node
IDs, while genuinely duplicated subtrees are planned twice with
DISTINCT IDs — so duplicated work shows up as several distinct
`Scan parquet` / `Generate` / Python-boundary node IDs whose detail
arguments are identical once expression IDs (`#123`) are stripped.
This renders every registered query's plan at sf0.001 and reports, per
query, hot detail-node groups with more than one distinct ID.

    python tools/diamond_audit.py            # all queries, worst first
    python tools/diamond_audit.py q07 qb0    # subset

Heuristic output, not a gate: anatomized two-pass operators (a gram
pass feeding candidates AND a verify pass) legitimately re-plan the
same scan; the point is a ranked worklist, judged by reading the
operator.
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

HOT = ("Scan parquet", "Generate", "MapInPandas", "ArrowEvalPython",
       "FlatMapGroupsInPandas", "MapInArrow", "BatchEvalPython")

_DETAIL = re.compile(r"^\((\d+)\) (.+?)(?: \[codegen.*)?$")
_EXPR_ID = re.compile(r"#\d+[L]?")


def audit_details(plan: str) -> dict[str, set[str]]:
    """Map normalized hot-node signature -> set of distinct node IDs."""
    groups: dict[str, set[str]] = defaultdict(set)
    cur_id, cur_name, cur_sig = None, None, []

    def flush():
        if cur_id is not None and any(h in cur_name for h in HOT):
            sig = cur_name + " | " + " ".join(cur_sig)
            groups[_EXPR_ID.sub("#", sig)].add(cur_id)

    for line in plan.splitlines():
        m = _DETAIL.match(line)
        if m:
            flush()
            cur_id, cur_name, cur_sig = m.group(1), m.group(2), []
        elif cur_id is not None and line.startswith(
            ("Arguments", "Location", "ReadSchema", "PushedFilters", "Input")
        ):
            cur_sig.append(line.strip())
    flush()
    return groups


def main() -> None:
    from alaska_etl_spark.plans.queries import QUERIES
    from alaska_etl_spark.session import get_spark

    names = sys.argv[1:] or sorted(QUERIES)
    spark = get_spark("diamond-audit", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    rows = []
    for name in names:
        try:
            plan = QUERIES[name](spark, SF_DIR)._jdf.queryExecution().explainString(mode)
        except Exception as e:
            print(f"{name}: EXPLAIN FAILED: {e}")
            continue
        dup = {
            sig: ids
            for sig, ids in audit_details(plan).items()
            if len(ids) > 1
        }
        if dup:
            score = sum(len(v) - 1 for v in dup.values())
            rows.append((score, name, dup))
    # key off (score desc, name) only — comparing the dup dict would
    # raise TypeError on a (score, name) tie (ADVICE r12)
    rows.sort(key=lambda r: (-r[0], r[1]))
    for score, name, dup in rows:
        print(f"== {name}  (extra plans: {score})")
        for sig, ids in sorted(dup.items(), key=lambda kv: -len(kv[1])):
            print(f"   x{len(ids)}  {sig[:160]}")


if __name__ == "__main__":
    main()
