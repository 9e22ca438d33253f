"""Stage-level profile of one query via the Spark event log (guide §1).

No UI in this sandbox, so this is the empirical loop's instrument:
run the named queries (collect or noop sink) in one session with
``spark.eventLog.enabled``, then parse the event log's
SparkListenerStageCompleted records into a per-stage table —
executor run time, shuffle read/write bytes, input bytes, task count —
attributed to the job description active when the stage ran.

    python tools/stage_profile.py q29_minhash_lsh --sink collect

Prints stages sorted by executor run time (the sum over tasks, i.e.
CPU-weighted — wall-clock attribution needs the timeline, but rank by
this and you find the expensive operator).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sink", choices=["collect", "noop"], default="collect")
    ap.add_argument("--runs", type=int, default=2, help="cold then N-1 warm")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="spark-events-")
    from alaska_etl_spark.cache import release_tracked
    from alaska_etl_spark.plans.queries import QUERIES
    from alaska_etl_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "stage-profile",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # plan-shape warm-up (janino/catalyst) at the smallest sf
    for name in args.queries:
        try:
            QUERIES[name](spark, "/root/testdata/sf0.001").collect()
        except Exception:
            pass
    release_tracked()

    def run(name: str, tag: str) -> float:
        sc.setJobDescription(f"{name}|{tag}")
        df = QUERIES[name](spark, args.sf_dir)
        t0 = time.perf_counter()
        if args.sink == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()
        return time.perf_counter() - t0

    walls = {}
    for name in args.queries:
        walls[name] = []
        for i in range(args.runs):
            tag = "cold" if i == 0 else f"warm{i}"
            walls[name].append((tag, run(name, tag)))
        release_tracked()
    sc.setJobDescription(None)
    spark.stop()

    # ---- parse the event log ----------------------------------------
    logs = [
        p
        for p in glob.glob(os.path.join(evdir, "*"))
        + glob.glob(os.path.join(evdir, "*", "events_*"))
        if os.path.isfile(p)
    ]
    job_desc = {}  # jobId -> description
    stage_job = {}  # stageId -> jobId
    stages = {}  # stageId -> metrics
    for path in logs:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    job_desc[jid] = ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    )
                    for sid in ev.get("Stage IDs", []):
                        stage_job[sid] = jid
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    acc = {
                        a["Name"]: a.get("Value", 0)
                        for a in si.get("Accumulables", [])
                    }
                    dur = None
                    if si.get("Submission Time") and si.get("Completion Time"):
                        dur = si["Completion Time"] - si["Submission Time"]
                    stages[sid] = {
                        "name": si.get("Stage Name", ""),
                        "tasks": si.get("Number of Tasks", 0),
                        "wall_ms": dur,
                        "run_ms": acc.get("internal.metrics.executorRunTime", 0),
                        "cpu_ms": acc.get("internal.metrics.executorCpuTime", 0) / 1e6,
                        "in_mb": acc.get("internal.metrics.input.bytesRead", 0) / 2**20,
                        "sh_r_mb": (
                            acc.get("internal.metrics.shuffle.read.localBytesRead", 0)
                            + acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0)
                        )
                        / 2**20,
                        "sh_w_mb": acc.get("internal.metrics.shuffle.write.bytesWritten", 0)
                        / 2**20,
                        "spill_mb": acc.get("internal.metrics.diskBytesSpilled", 0) / 2**20,
                        "desc": job_desc.get(stage_job.get(sid, -1), ""),
                    }

    by_desc: dict[str, list] = {}
    for sid, s in sorted(stages.items()):
        by_desc.setdefault(s["desc"], []).append((sid, s))

    for name in args.queries:
        for tag, wall in walls[name]:
            desc = f"{name}|{tag}"
            rows = by_desc.get(desc, [])
            tot_run = sum(s["run_ms"] for _, s in rows)
            tot_wall = sum(s["wall_ms"] or 0 for _, s in rows)
            print(
                f"\n== {desc}: wall {wall:.3f}s | {len(rows)} stages | "
                f"sum stage-wall {tot_wall / 1e3:.3f}s | sum exec-run {tot_run / 1e3:.1f}s"
            )
            for sid, s in sorted(rows, key=lambda kv: -(kv[1]["wall_ms"] or 0))[:14]:
                print(
                    f"  stage {sid:4d} wall {(s['wall_ms'] or 0) / 1e3:6.3f}s "
                    f"run {s['run_ms'] / 1e3:7.2f}s cpu {s['cpu_ms'] / 1e3:7.2f}s "
                    f"tasks {s['tasks']:3d} in {s['in_mb']:7.1f}M "
                    f"shR {s['sh_r_mb']:6.1f}M shW {s['sh_w_mb']:6.1f}M "
                    f"spill {s['spill_mb']:5.0f}M  {s['name'][:60]}"
                )
    print(f"\nevent logs: {evdir}")


if __name__ == "__main__":
    main()
