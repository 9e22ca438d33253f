"""Frontier per-batch scan-cost envelope (SCALE.md "Frontier per-batch
scan cost") — r12 edition, now with the Bloom seen-set lane.

Protocol (same as the r11 rows): pre-seed the landed table at N rows
in the exact shape the sink writes (canonical_url key, stored
``_row_hash`` digest, domain column), warm the session, then time ONE
10 000-row micro-batch of entirely NEW URLs through
``stream_domain_quota`` in each configuration:

- ``zero-state``     — headroom from a row-grain landed aggregate,
                       seen-set via the landed anti-join (r10 form +
                       X179 stored hash);
- ``ledger``         — X176 domain×batch-grain headroom, landed
                       anti-join still row-grain;
- ``ledger+bloom``   — r12: the incremental Bloom sidecar splits the
                       batch; an all-new batch touches the landed
                       table ZERO times (headroom from the ledger,
                       seen-check from the filter, append via
                       ``assume_new``).

The decade step (10⁶ → 10⁷) is the measurement; flat-or-sub-linear in
the bloom row is the claim under test. Batches are all-new URLs — the
steady state of a crawl discovering; the maybe-lane fallback (true
re-crawls + fpp·|batch| false positives) pays the old anti-join and is
exercised separately by the --recrawl flag.

Usage:
    python tools/frontier_envelope.py            # 10^6 and 10^7
    python tools/frontier_envelope.py 8          # add the 10^8 decade
    python tools/frontier_envelope.py --recrawl  # maybe-lane batch too
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".frontier_envelope"
)
BATCH = 10_000
MAX_PER_DOMAIN = 10_000_000  # headroom never binds: we time scans, not caps


def _seed(spark, wh, n_rows: int) -> None:
    """Landed table shaped exactly like the sink's output: one row per
    distinct canonical URL across 1 000 domains, stored row hash."""
    from pyspark.sql import functions as F

    from alaska_etl_spark.plans.warehouse import AUDIT_COL, row_hash

    df = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("https://d"), (F.col("id") % 1000).cast("string"),
                F.lit(".com/seed/"), F.col("id").cast("string"),
            ).alias("url"),
        )
        .withColumn("canonical_url", F.col("url"))
        .withColumn(
            "domain",
            F.concat(F.lit("d"), (F.col("doc_id") % 1000).cast("string"), F.lit(".com")),
        )
    )
    df = row_hash(df, ["canonical_url"]).withColumn(AUDIT_COL, F.current_timestamp())
    wh._write_spec(df, wh._spec("quota"), "overwrite")


def _batch_file(path: str, *, recrawl: bool, salt: str = "") -> None:
    import json

    with open(path, "w") as f:
        for i in range(BATCH):
            if recrawl and i % 100 == 0:  # 1% true re-crawls of seeds
                url = f"https://d{i % 1000}.com/seed/{i}"
            else:  # salt keeps the second batch's new URLs disjoint
                url = f"https://n{i % 1000}.net/new/{salt}{i}"
            f.write(
                json.dumps(
                    {"doc_id": 10**12 + (10**10 if salt else 0) + i, "url": url}
                )
                + "\n"
            )


def _run_cell(n_rows: int, mode: str, recrawl: bool) -> float:
    """One configuration in THIS process; returns the batch wall."""
    from alaska_etl_spark.operators.pruning import (
        bloom_params,
        bloom_sidecar_write,
        build_bloom,
    )
    from alaska_etl_spark.plans.warehouse import Warehouse
    from alaska_etl_spark.session import get_spark
    from alaska_etl_spark.streaming.incremental import stream_domain_quota

    spark = get_spark("frontier-envelope")
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.join(OUT, f"n{n_rows}_{mode}")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "src"))
    wh = Warehouse(spark, os.path.join(root, "wh"))
    _seed(spark, wh, n_rows)

    kwargs: dict = {}
    if mode in ("ledger", "ledger+bloom"):
        kwargs["ledger_table"] = "quota_ledger"
    if mode == "ledger+bloom":
        bloom_path = os.path.join(root, "bloom")
        # pre-built sidecar: the rebuild-from-landed scan is the
        # RECOVERY cost, not the steady-state per-batch cost. fpp is
        # the sink default (1e-6): sized so fpp·batch ≈ 0 — a typical
        # all-new batch has NO false positive and skips the landed
        # read entirely (at 1% the ~100 FPs/batch fired the maybe-lane
        # full scan every batch, burying the win — measured r12)
        m_bits, n_hashes = bloom_params(max(n_rows, 1_000_000), 1e-6)
        packed = build_bloom(
            wh.read("quota").select("canonical_url"), "canonical_url",
            m_bits=m_bits, n_hashes=n_hashes,
        )
        bloom_sidecar_write(spark, f"{bloom_path}/base", packed, m_bits, n_hashes)
        kwargs["bloom_path"] = bloom_path
        kwargs["bloom_capacity"] = max(n_rows, 1_000_000)

    # TWO sequential availableNow RUNS of one batch each — the
    # reference's cron model: every run pays one state load (for the
    # bloom lane, base+delta once per run — driver-cached across the
    # run's batches, amortized to zero in a continuous stream), so run
    # 2's wall is the honest recurring-cron cost against an
    # already-populated table. Both walls are reported.
    _batch_file(os.path.join(root, "src", "b1.json"), recrawl=recrawl)
    stream = spark.readStream.schema("doc_id bigint, url string").json(
        os.path.join(root, "src")
    )
    t0 = time.perf_counter()
    stream_domain_quota(
        stream, wh, "quota", os.path.join(root, "ckpt"),
        max_per_domain=MAX_PER_DOMAIN, **kwargs,
    )
    t1 = time.perf_counter() - t0
    _batch_file(os.path.join(root, "src", "b2.json"), recrawl=recrawl, salt="m")
    stream = spark.readStream.schema("doc_id bigint, url string").json(
        os.path.join(root, "src")
    )
    t0 = time.perf_counter()
    stream_domain_quota(
        stream, wh, "quota", os.path.join(root, "ckpt"),
        max_per_domain=MAX_PER_DOMAIN, **kwargs,
    )
    t2 = time.perf_counter() - t0
    per_batch = BATCH - BATCH // 100 if recrawl else BATCH
    n_landed = wh.read("quota").count()
    expect = n_rows + 2 * per_batch
    assert n_landed == expect, (n_landed, expect)  # exactness first
    shutil.rmtree(root, ignore_errors=True)
    return t1, t2


def main() -> None:
    import json
    import subprocess

    if len(sys.argv) > 3 and sys.argv[1] == "--one":
        t1, t2 = _run_cell(int(sys.argv[2]), sys.argv[3], "--recrawl" in sys.argv)
        print("ROW " + json.dumps({"t1": t1, "t2": t2}))
        return

    given = [int(a) for a in sys.argv[1:] if a.isdigit()]
    decades = given or [6, 7]
    recrawl = "--recrawl" in sys.argv[1:]
    modes = ["zero-state", "ledger", "ledger+bloom"]
    print(f"| landed rows | {' | '.join(modes)} |"
          + ("  (batch: 1% re-crawls" if recrawl else "  (batch: all new")
          + "; run1 / run2 walls, one batch per availableNow run)")
    print("|---|" + "---|" * len(modes))
    for d in sorted(set(decades)):
        cells = []
        for mode in modes:
            # per-cell JVM isolation (the scale_stress lesson: shared
            # JVMs accumulate and the LAST cell pays)
            cmd = [sys.executable, os.path.abspath(__file__), "--one",
                   str(10**d), mode]
            if recrawl:
                cmd.append("--recrawl")
            proc = subprocess.run(cmd, capture_output=True, text=True)
            row = None
            for line in proc.stdout.splitlines():
                if line.startswith("ROW "):
                    row = json.loads(line[4:])
            if row is None:
                tail = proc.stderr.strip().splitlines()[-3:]
                cells.append("FAIL: " + " | ".join(t[:120] for t in tail))
            else:
                cells.append(f"{row['t1']:.1f} / {row['t2']:.1f} s")
        print(f"| 10^{d} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
