"""Per-query A/B timer for the optimization rounds (guide §1).

Times the named queries in ONE session with the bench methodology
(plan-shape warm-up at sf0.001, then cold run = tracked caches released
first, warm run = operator persists alive), repeated --reps times, and
prints per-query min/median for both, plus the job count of one run.

    python tools/ab_time.py q89_lm_perplexity qn3_lift_gains --reps 3
    python tools/ab_time.py q44_bm25 --sink noop     # time compute, not collect

The noop sink computes every column of every row and discards it
(guide §1.4); `collect` (default) is the bench/oracle-symmetric action.
Run on an idle box; this tool is for SAME-SESSION A/B deltas, not for
committed artifacts (bench.py --out BENCH_DETAIL.json is that).
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sink", choices=["collect", "noop"], default="collect")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from alaska_etl_spark.cache import release_tracked
    from alaska_etl_spark.plans.queries import QUERIES
    from alaska_etl_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ab-time", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def run(name: str) -> None:
        df = QUERIES[name](spark, args.sf_dir)
        if args.sink == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()

    warm_dir = "/root/testdata/sf0.001"
    for name in args.queries:
        try:
            QUERIES[name](spark, warm_dir).collect()
        except Exception:
            pass
        release_tracked()

    for name in args.queries:
        colds, warms = [], []
        def _next_job_id():
            jid = sc._jsc.sc().dagScheduler().nextJobId()
            return jid if isinstance(jid, int) else jid.get()

        jobs0 = _next_job_id()
        for _ in range(args.reps):
            sc.setJobDescription(f"{name} cold")
            t0 = time.perf_counter()
            run(name)
            colds.append(time.perf_counter() - t0)
            sc.setJobDescription(f"{name} warm")
            t0 = time.perf_counter()
            run(name)
            warms.append(time.perf_counter() - t0)
            release_tracked()
        jobs1 = _next_job_id()
        sc.setJobDescription(None)
        n_jobs = (jobs1 - jobs0) / (2 * args.reps)
        print(
            f"{name}: cold min {min(colds):.3f} med {statistics.median(colds):.3f} | "
            f"warm min {min(warms):.3f} med {statistics.median(warms):.3f} | "
            f"~{n_jobs:.1f} jobs/run (sink={args.sink}, reps={args.reps})"
        )


if __name__ == "__main__":
    main()
