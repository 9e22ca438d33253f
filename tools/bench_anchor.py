"""Cross-round drift anchor (VERDICT r10 #3): make committed pairs
comparable ACROSS rounds by re-timing the previous round's code in the
CURRENT box-session.

r10 proved committed pairs from different box-sessions differ 15–45%
on UNCHANGED queries (qb0 2.46 → 3.54 s on an identical plan; two r10
pairs 40 min apart agreed with each other but not with r9) — so a
round-over-round ratio of committed numbers measures the box as much
as the code. The fix is an anchor: check out the LAST round's commit
into a scratch `git worktree`, run a handful of its queries on ITS
code in this same session, and compare those times to the numbers that
round actually committed. The ratio is the box-session drift factor;
divide by it before reading anything into cross-round pair deltas.

Protocol: run this FIRST in the paired run's box-session (this →
oracle → bench --out BENCH_DETAIL.json), while the box is still idle —
running it after the bench would trip the idle guard on the bench's
own just-decayed loadavg. Writes ANCHOR.json;
`tools/bench_report.py --write` then renders the drift line inside
the README paired-run block.

Usage: python tools/bench_anchor.py [--force]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Preferred anchors: stable cross-round names spanning the cost classes
# (heavy-lane simjoins — the queries r10's drift showed largest — one
# shuffle-dense aggregate, one MinHash pipeline, one Arrow-boundary
# recursion). The tool keeps whichever exist in the PREVIOUS round's
# committed BENCH_DETAIL.json, so rotations can't break it.
PREFERRED = [
    "qb0_jaccard_simjoin",
    "q36_containment_join",
    "q29_minhash_lsh",
    "q02_region_revenue",
    "q92_ewma",
]

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
names = json.loads(sys.argv[1]); sf_dir = sys.argv[2]; cpus = sys.argv[3]
from alaska_etl_spark.plans.queries import QUERIES
from alaska_etl_spark.session import get_spark
from alaska_etl_spark.cache import release_tracked
spark = get_spark("anchor", master="local[" + cpus + "]")
spark.sparkContext.setLogLevel("ERROR")
for n in names:  # shape warm-up, the bench.py protocol
    try:
        QUERIES[n](spark, "/root/testdata/sf0.001").collect()
    except Exception:
        pass
release_tracked()
out = {}
for n in names:
    t0 = time.perf_counter()
    QUERIES[n](spark, sf_dir).collect()
    out[n] = round(time.perf_counter() - t0, 3)
    release_tracked()
print("ANCHOR_JSON " + json.dumps(out))
"""


def _git(*args: str) -> str:
    return subprocess.check_output(["git", *args], cwd=REPO, text=True).strip()


def main() -> None:
    force = "--force" in sys.argv
    loadavg = [round(x, 2) for x in os.getloadavg()]
    if loadavg[0] >= 1.0 and not force:
        sys.exit(
            f"refusing to anchor on a busy box (loadavg {loadavg[0]} >= 1.0);"
            " the anchor must share the pair's box-session conditions"
            " (--force to override)"
        )
    line = _git("log", "--grep", "^round [0-9]*:", "--format=%H %s", "-1")
    if not line:
        sys.exit("no previous round commit found (git log --grep '^round N:')")
    prev_commit, prev_subject = line.split(" ", 1)
    prev_detail = json.loads(_git("show", f"{prev_commit}:BENCH_DETAIL.json"))
    prev_times = dict(prev_detail.get("queries_cold", {}))
    prev_times.update(prev_detail.get("heavy_cold", {}))
    anchors = [q for q in PREFERRED if q in prev_times]
    if len(anchors) < 3:
        sys.exit(f"only {len(anchors)} preferred anchors exist at {prev_commit[:8]}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    wt = tempfile.mkdtemp(prefix="anchor_prev_")
    try:
        # tempfile.mkdtemp created the dir; git worktree add wants to
        # create it itself
        os.rmdir(wt)
        _git("worktree", "add", "--detach", wt, prev_commit)
        runner = os.path.join(wt, "_anchor_runner.py")
        with open(runner, "w") as f:
            f.write(_RUNNER)
        env = dict(os.environ, PYTHONPATH=wt)
        out = subprocess.check_output(
            [sys.executable, runner, json.dumps(anchors), sf_dir, cpus],
            cwd=wt,
            env=env,
            text=True,
            stderr=subprocess.DEVNULL,
        )
        now = json.loads(
            [ln for ln in out.splitlines() if ln.startswith("ANCHOR_JSON ")][-1][
                len("ANCHOR_JSON ") :
            ]
        )
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt], cwd=REPO, check=False
        )
        shutil.rmtree(wt, ignore_errors=True)

    drifts = {q: round(now[q] / prev_times[q], 3) for q in anchors if prev_times[q] > 0}
    ds = sorted(drifts.values())
    median = ds[len(ds) // 2] if len(ds) % 2 else (ds[len(ds) // 2 - 1] + ds[len(ds) // 2]) / 2
    result = {
        "prev_commit": prev_commit,
        "prev_subject": prev_subject,
        "sf_dir": sf_dir,
        "cpus": int(cpus),
        "loadavg": loadavg,
        "queries": {
            q: {"prev_committed": prev_times[q], "rerun_now": now[q], "drift": drifts.get(q)}
            for q in anchors
        },
        "drift_median": round(median, 3),
    }
    with open(os.path.join(REPO, "ANCHOR.json"), "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {"drift_median": result["drift_median"], "queries": drifts, "prev": prev_commit[:8]}
        )
    )


if __name__ == "__main__":
    main()
