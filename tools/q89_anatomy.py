"""Stage-level attribution for q89_lm_perplexity (VERDICT r5 #3).

Runs q89 once at $SPARK_GRAFT_SF_DIR (default sf0.1) with the UI
enabled, then pulls per-stage wall/executor times from the local REST
API (/api/v1) and prints a table attributing the query's wall-clock to
its stages: tokenize/explode scan, vocab aggregate, the one _w1
exchange + shared sort with both window counts, the per-doc aggregate,
and the final re-attach join. The written-up result lives in SCALE.md
"q89 anatomy".

Usage: python tools/q89_anatomy.py [query_name]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "q89_lm_perplexity"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from alaska_etl_spark.plans.queries import QUERIES
    from alaska_etl_spark.session import get_spark

    spark = get_spark(
        "q89-anatomy",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # shape warm-up (codegen/catalyst), same protocol as bench.py
    QUERIES[name](spark, "/root/testdata/sf0.001").collect()
    from alaska_etl_spark.cache import release_tracked

    release_tracked()
    spark.sparkContext.setJobGroup("anatomy", name)
    t0 = time.perf_counter()
    n = len(QUERIES[name](spark, sf_dir).collect())
    wall = time.perf_counter() - t0

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    )
    jobs = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs"))
    anatomy_stage_ids = {
        s for j in jobs if j.get("jobGroup") == "anatomy" for s in j["stageIds"]
    }

    rows = []
    for s in stages:
        if s["stageId"] not in anatomy_stage_ids:
            continue
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        comp = s.get("completionTime")
        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        span = None
        if sub and comp:
            from datetime import datetime

            span = (
                datetime.strptime(comp, fmt) - datetime.strptime(sub, fmt)
            ).total_seconds()
        rows.append(
            {
                "stage": s["stageId"],
                "tasks": s["numCompleteTasks"],
                "wall_s": round(span, 3) if span is not None else None,
                "exec_run_s": round(s["executorRunTime"] / 1000, 3),
                "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 3),
                "input": s.get("inputBytes", 0),
                "shuffle_read": s.get("shuffleReadBytes", 0),
                "shuffle_write": s.get("shuffleWriteBytes", 0),
                "name": s["name"].split("\n")[0][:70],
            }
        )
    rows.sort(key=lambda r: r["stage"])
    print(f"\n{name} @ {sf_dir}: wall {wall:.3f}s, {n} rows, {len(rows)} stages")
    hdr = f"{'stage':>5} {'tasks':>5} {'wall_s':>7} {'exec_s':>7} {'cpu_s':>7} {'shW(MB)':>8} {'shR(MB)':>8}  name"
    print(hdr)
    for r in rows:
        print(
            f"{r['stage']:>5} {r['tasks']:>5} {str(r['wall_s']):>7} {r['exec_run_s']:>7} "
            f"{r['cpu_s']:>7} {r['shuffle_write']/1e6:>8.1f} {r['shuffle_read']/1e6:>8.1f}  {r['name']}"
        )
    tot_wall = sum(r["wall_s"] or 0 for r in rows)
    print(f"stage wall sum {tot_wall:.3f}s (gaps to {wall:.3f}s = driver/planning/result fetch)")


if __name__ == "__main__":
    main()
