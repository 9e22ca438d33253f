"""Item-item co-occurrence mining: which items share audiences?

The classic collaborative-filtering preprocessing step (item-item
cosine over the user-item incidence matrix — Sarwar et al. '01,
Amazon's item-to-item CF): for every item pair, how many users touched
both, and how strong is that overlap once each item's own popularity
is divided out. The reference (apsocarras/alaska-etl) computes no
affinity analytics; this extends the engine's analytics surface with
the co-occurrence family next to the association rules (qb9 —
support/confidence/lift on the SAME incidence grain; cosine here is
the symmetric, popularity-normalized score).

Scale design — the pair fan-out is the hazard, and it is bounded
twice:

1. The incidence matrix is DISTINCT (user, item) — one aggregate
   collapses event multiplicity before any pairing.
2. Whale users are capped: a user with more than ``max_items``
   distinct items contributes ``max_items·(max_items−1)/2`` pairs —
   quadratic — so users beyond the cap are dropped whole (the standard
   CF practice; a user touching everything carries no signal anyway).
   With the cap, pair volume is ≤ users · C(max_items, 2) — linear in
   users.

The pair self-join co-locates on the user key (one shuffle each side);
item totals are an items-sized frame joined back by broadcast.

Exactness: co-counts and totals are BIGINT; the cosine
``co / sqrt(n_a · n_b)`` is ONE float expression over exact integers —
division and sqrt are correctly-rounded IEEE, so any engine evaluating
the identically-parenthesized expression reproduces it bit-for-bit
(the pinned-shape doubles protocol; no libm transcendentals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copurchase_similarity(
    df: DataFrame,
    user_col: str,
    item_col: str,
    *,
    max_items: int = 200,
    min_co: int = 1,
) -> DataFrame:
    """Item-item co-occurrence cosine over distinct (user, item)
    incidence. Returns ``(item_a, item_b, co, n_a, n_b, cosine)`` for
    pairs with ``co >= min_co``; ``item_a < item_b``.
    """
    # NOT persisted (r12, measured): the plan prints base's source-join
    # subtree once per consumer, but base is a distinct (an aggregate)
    # — every copy sits above its Exchange and runtime exchange reuse
    # computes it once; persisting base/kept A/B'd slower on cold
    # (med 2.39 → 2.94 s, exec-run 7.3 → 54.1 s at sf0.1).
    base = df.select(
        F.col(user_col).alias("_u"), F.col(item_col).alias("_i")
    ).distinct()
    sizes = base.groupBy("_u").agg(F.count(F.lit(1)).alias("_deg"))
    kept = base.join(
        sizes.filter(F.col("_deg") <= max_items).select("_u"), on="_u", how="inner"
    )
    a = kept.select(F.col("_u"), F.col("_i").alias("item_a"))
    b = kept.select(F.col("_u"), F.col("_i").alias("item_b"))
    co = (
        a.join(b, on="_u")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
        .filter(F.col("co") >= min_co)
    )
    totals = kept.groupBy(F.col("_i")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    return (
        co.join(
            F.broadcast(totals.select(F.col("_i").alias("item_a"), F.col("_n").alias("n_a"))),
            on="item_a",
        )
        .join(
            F.broadcast(totals.select(F.col("_i").alias("item_b"), F.col("_n").alias("n_b"))),
            on="item_b",
        )
        .select(
            "item_a",
            "item_b",
            "co",
            "n_a",
            "n_b",
            (
                F.col("co")
                / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double"))
            ).alias("cosine"),
        )
    )
