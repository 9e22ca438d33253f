"""Probabilistic record linkage — Fellegi-Sunter match/unmatch weights
(Fellegi & Sunter 1969, the canonical model behind Splink/dedupe.io):
given candidate pairs with per-field AGREEMENT indicators and a match
label, estimate each field's m-probability (P(agree | match)) and
u-probability (P(agree | non-match)) and emit the log₂ likelihood-ratio
weights a linkage scorer sums per pair. The supervised complement of
the repo's candidate GENERATORS (edit-distance join, fuzzy pairs,
normalization fingerprints): those propose pairs, this calibrates how
much each field's agreement is worth.

Exactness discipline: counts are exact BIGINTs with +1/+2 Laplace
smoothing (so no zero probabilities and every ln argument is an exact
integer), probabilities report as half-up basis points, and the weights
follow the PMI fixed-point protocol — one pinned parenthesization of
ln's over exact integers, divided by ln(2), rounded to 1e-8 units that
sum order-free. A DuckDB twin replays every number bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fellegi_sunter_weights"]


def fellegi_sunter_weights(
    pairs: DataFrame,
    label_col: str,
    agreement_cols: "list[str]",
    *,
    scale: int = 10**8,
) -> DataFrame:
    """Per-field m/u probabilities and agreement/disagreement weights
    from labeled candidate pairs.

    ``pairs`` carries one row per candidate pair with boolean
    ``agreement_cols`` (does the field agree?) and a boolean
    ``label_col`` (is the pair a true match?). With Laplace smoothing:

        m = (n_agree_match + 1) / (n_match + 2)
        u = (n_agree_nonmatch + 1) / (n_nonmatch + 2)
        w_agree    = log₂(m / u)
        w_disagree = log₂((1 − m) / (1 − u))

    Every field rides ONE tagged explode + ONE aggregate (the r7
    stage-floor rule); the four smoothed operands are exact BIGINTs, so
    each weight is one pinned ln-parenthesization over integers
    (``(((ln(mn) − ln(md)) − ln(un)) + ln(ud)) / ln(2)``) quantized to
    1e-8 units. Returns (field, n_match, n_nonmatch, n_agree_match,
    n_agree_nonmatch, m_bp, u_bp, w_agree_units, w_disagree_units)
    ordered by field."""
    from alaska_etl_spark.functions.fixedpoint import div_half_up

    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("_f"),
                F.coalesce(F.col(c).cast("boolean"), F.lit(False)).alias("_a"),
                F.col(label_col).cast("boolean").alias("_m"),
            )
            for c in agreement_cols
        ]
    )
    counts = (
        pairs.select(F.explode(entries).alias("_e"))
        .select("_e._f", "_e._a", "_e._m")
        .groupBy("_f")
        .agg(
            F.sum(F.when(F.col("_m"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_match"),
            F.sum(F.when(~F.col("_m"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_nonmatch"),
            F.sum(F.when(F.col("_m") & F.col("_a"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_agree_match"),
            F.sum(F.when(~F.col("_m") & F.col("_a"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_agree_nonmatch"),
        )
    )
    # smoothed integer operands: m = mn/md, u = un/ud, and the
    # disagreement complements are (md − mn)/md, (ud − un)/ud — all
    # exact BIGINTs, so every ln argument is an integer both engines
    # agree on.
    mn = F.col("n_agree_match") + 1
    md = F.col("n_match") + 2
    un = F.col("n_agree_nonmatch") + 1
    ud = F.col("n_nonmatch") + 2
    ln2 = F.log(F.lit(2.0))

    def _w(num_n, num_d, den_n, den_d):
        return (
            F.round(
                F.lit(scale)
                * (
                    (
                        (F.log(num_n.cast("double")) - F.log(num_d.cast("double")))
                        - F.log(den_n.cast("double"))
                    )
                    + F.log(den_d.cast("double"))
                )
                / ln2
            )
            .cast("bigint")
        )

    return counts.select(
        F.col("_f").alias("field"),
        "n_match",
        "n_nonmatch",
        "n_agree_match",
        "n_agree_nonmatch",
        div_half_up("10000 * (n_agree_match + 1)", "n_match + 2").alias("m_bp"),
        div_half_up("10000 * (n_agree_nonmatch + 1)", "n_nonmatch + 2").alias(
            "u_bp"
        ),
        _w(mn, md, un, ud).alias("w_agree_units"),
        _w(md - mn, md, ud - un, ud).alias("w_disagree_units"),
    ).orderBy("field")
