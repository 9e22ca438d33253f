"""Statistics-conditioned join-strategy hints for corpus-/vocab-grain
aggregates.

The scale bug this guards (found at the round-7 100× stress tier,
commit 4c02b08): Catalyst sizes an AGGREGATE's output from row-count
guesses that ignore array payloads and vocabulary growth, so a
corpus-grain frame (one row per document / one row per distinct gram)
can be estimated under ``spark.sql.autoBroadcastJoinThreshold`` while
its true materialized size is gigabytes — the planner then broadcasts
it and the driver OOMs. The round-7 fix pinned every such frame
``.hint("shuffle_hash")`` unconditionally, which is scale-correct but
costs ~0.5–0.9 s per lost broadcast at sf0.1 (VERDICT r7: qb0
3.15→5.05 s, q36 2.85→4.08 s, q88 1.80→2.66 s).

This module makes the pin CONDITIONAL on a signal Catalyst does NOT
misestimate: the optimized-plan size of the aggregate's INPUT. For a
parquet scan that estimate is the real file length (propagated through
filters by selectivity), and it is a sound upper-bound proxy for the
aggregate's materialized size — a corpus-grain aggregate of a T-byte
scan materializes O(T) bytes (hashed grams ≈ 8 B/token vs ~6 text
chars/token; collect_list arrays ≈ the token bytes themselves), i.e.
within a small constant of T. So:

- input estimate ≤ ``DRIVER_SAFE_SCAN_BYTES`` → the aggregate provably
  fits the driver even if Catalyst's own output guess is garbage; leave
  the hint off and let the planner broadcast (the sf0.1 / 10× regime,
  where the broadcast is worth ~0.5–0.9 s per join).
- estimate above the threshold, or unavailable → pin shuffle_hash
  (the 100× regime; default-safe when unknown).

Threshold: 16 MiB of scan bytes bounds the materialized aggregate at
~3–4× that (≲64 MiB true broadcast) — two orders of magnitude under
the 8 GiB driver, and far above the sf0.1 corpus (0.6 MiB) and the 10×
stress tier (~6 MiB) where the broadcast win is measured. The 100×
tier writes real parquet (~60 MiB), so its scans exceed the threshold
and the pin re-engages — re-verified by ``tools/scale_stress.py
--x100`` per the round-7 done-criterion.

The estimate read is driver-side only (plan analysis, no job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DRIVER_SAFE_SCAN_BYTES = 16 << 20


def estimated_plan_bytes(df: DataFrame) -> "int | None":
    """Catalyst's optimized-plan size estimate for ``df`` in bytes
    (file-length-derived for parquet scans), or None if the plan
    statistics are unreadable — callers must treat None as BIG."""
    try:
        return int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        return None


def input_fits_driver(
    df: DataFrame, *, threshold_bytes: "int | None" = None
) -> bool:
    """True iff aggregates of ``df`` are provably driver-safe to
    broadcast (input plan estimate ≤ threshold). Unknown → False.
    The threshold resolves at CALL time (monkeypatch-testable)."""
    if threshold_bytes is None:
        threshold_bytes = DRIVER_SAFE_SCAN_BYTES
    est = estimated_plan_bytes(df)
    return est is not None and est <= threshold_bytes


def pin_corpus_agg(agg: DataFrame, input_small: bool) -> DataFrame:
    """Apply the corpus-grain-aggregate rule: ``agg`` (an aggregate
    whose grain is the corpus or the vocabulary, about to feed a join)
    is pinned ``shuffle_hash`` unless its input was proven small by
    :func:`input_fits_driver` — never trust Catalyst's own estimate of
    an aggregate output (the round-7 100× broadcast-OOM class)."""
    return agg if input_small else agg.hint("shuffle_hash")


# Upper bound on the ROW COUNT of a distinct-id frame we will force-
# broadcast (pairs-lane semi-join prune). Each row is one id (an 8-byte
# hash or a short string) → 2 M rows is ≲tens of MB materialized, two
# orders of magnitude under the driver, yet far above any pair frame a
# similarity detector emits at its operating point (pairs are RARE).
PAIR_IDS_BROADCAST_MAX = 2_000_000


def broadcast_if_bounded(ids: DataFrame, n_rows_bound: int) -> DataFrame:
    """Broadcast-hint ``ids`` only when a MEASURED row-count bound says
    it is safe (``n_rows_bound`` ≥ the true row count — e.g. 2× the
    materialized pair count for a union of both pair sides). Above the
    bound, return unhinted and let AQE pick the strategy from runtime
    sizes — a caller-supplied match-grain pair frame must never be able
    to force a driver-OOM broadcast (ADVICE r11)."""
    from pyspark.sql import functions as F

    return F.broadcast(ids) if n_rows_bound <= PAIR_IDS_BROADCAST_MAX else ids
