"""Skew mitigation: salted two-phase aggregation and salted broadcast
joins (SURVEY §4 / BASELINE scale notes: "skewed keys → salting or AQE
skew-join").

AQE's skew-join splitting (on in session.py) handles sort-merge join
skew automatically; the two cases it does NOT cover are (a) a hash
aggregate where one group dominates a partition's build side, and
(b) replicated joins against a broadcastable-but-hot dimension. Both
are classic salt territory:

- :func:`salted_aggregate` — phase 1 aggregates on (keys, salt) so the
  hot key's rows spread over ``n_salts`` reducers; phase 2 combines the
  decomposable partials. Exact for sum/count/min/max and avg (carried
  as sum+count until the end).
- :func:`salted_broadcast_join` — replicate the small side ``n_salts``×
  with an explicit salt column and salt the big side uniformly, so a
  hot key's probe rows hit ``n_salts`` distinct hash buckets.

Salts are deterministic (hash of a uniform row id), so results are
reproducible. Note Spark's partial (map-side) aggregation already
de-skews *pre-shuffle* work; salting pays off when the reduce side
itself is the bottleneck — the phase-1/phase-2 split here mirrors
exactly what the reference feared breaking with chunked means
(notebooks/1_uscrn_scrape.ipynb:540) and gets right: sums and counts
compose, means do not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: supported decomposable aggregates: name → (phase1 partials, phase2 combine)
_DECOMPOSABLE = {"sum", "count", "min", "max", "avg"}


def with_salt(df: DataFrame, n_salts: int, *, salt_col: str = "_salt") -> DataFrame:
    """Deterministic uniform salt in [0, n_salts): hash of a per-row id
    (monotonically_increasing_id is partition-deterministic, which is
    enough for load spreading and keeps reruns reproducible)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregate.

    ``aggs`` maps output column → (function, input column) with function
    in {sum, count, min, max, avg}. Equivalent to
    ``df.groupBy(keys).agg(...)`` for any data, but the heavy shuffle
    groups by (keys, salt) first, bounding any one reducer's share of a
    hot key at 1/n_salts.
    """
    for name, (fn, _) in aggs.items():
        if fn not in _DECOMPOSABLE:
            raise ValueError(f"{name}: {fn} is not decomposable")

    partials: list[Column] = []
    finals: list[Column] = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            partials.append(F.count(col).alias(f"_p_{name}"))
            finals.append(F.sum(f"_p_{name}").alias(name))
        elif fn == "sum":
            partials.append(F.sum(col).alias(f"_p_{name}"))
            finals.append(F.sum(f"_p_{name}").alias(name))
        elif fn == "min":
            partials.append(F.min(col).alias(f"_p_{name}"))
            finals.append(F.min(f"_p_{name}").alias(name))
        elif fn == "max":
            partials.append(F.max(col).alias(f"_p_{name}"))
            finals.append(F.max(f"_p_{name}").alias(name))
        elif fn == "avg":
            partials.append(F.sum(col).alias(f"_ps_{name}"))
            partials.append(F.count(col).alias(f"_pc_{name}"))
            finals.append(
                (F.sum(f"_ps_{name}") / F.sum(f"_pc_{name}")).alias(name)
            )
    phase1 = with_salt(df, n_salts).groupBy(*keys, "_salt").agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side to a small side with salt replication:
    small × n_salts rows broadcast; big rows salted uniformly. Output
    equals ``big.join(small, on, how)`` (small's key assumed unique)."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = with_salt(big, n_salts)
    out = big_salted.join(F.broadcast(small_rep), [*on, "_salt"], how)
    return out.drop("_salt")
