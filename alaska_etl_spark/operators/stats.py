"""Single-pass multivariate statistics from EXACT integer moments.

Pearson correlation (and anything else built from sums/sums-of-products)
is normally summation-order-dependent in floating point — Spark's 32
partitions and DuckDB's single thread add in different orders and
disagree in the last ulps, which is why the q93-style screens round
before comparing. This module removes the problem at the source: the
testdata's numerics carry exactly 2 decimals, so every moment —
n, Σx, Σx², Σxy — is accumulated as an exact integer (cents,
decimal(38,0) so 100 TB of cent-products cannot overflow), and the
float arithmetic happens ONCE, on the driver-visible one-row aggregate:

    corr = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))

Deterministic double ops on exact operands are bit-identical in any
IEEE engine, so DuckDB replays the whole matrix exactly (qb3).

Plan shape: ONE hash aggregate over the fact (map-side partials — the
moments are classic decomposable sums), producing a single row of
d + d·(d+1)/2 + 1 columns; the matrix unfolds from it with a constant
explode. d is the column count (small); rows are never touched twice.
"""

from __future__ import annotations

from itertools import combinations_with_replacement

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ab_test_report", "cuped_adjustment", "psi_drift", "corr_matrix", "corr_matrix_sql", "grouped_linreg", "grouped_linreg_sql"]


def _c(col: str):
    # exact cents as decimal(18,0): the pairwise product is then
    # decimal(37,0) and its sum decimal(38,0) — inside Spark's decimal
    # cap with no precision loss, while int64 cent-products would
    # overflow around 10^18 (a few TB of rows). Columns must be
    # NULL-free (count(*) is the shared n); filter first otherwise.
    return F.round(F.col(col) * 100).cast("decimal(18,0)")


def corr_matrix(df: DataFrame, cols: list[str], *, round_digits: int = 4) -> DataFrame:
    """Pearson correlation for every unordered pair of ``cols``
    (2-decimal numerics), as (col_a, col_b, corr) rows — col_a < col_b
    alphabetically, self-pairs excluded."""
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("_n")]
    for c in cols:
        aggs.append(F.sum(_c(c)).alias(f"_s_{c}"))
    for a, b in combinations_with_replacement(cols, 2):
        aggs.append(F.sum(_c(a) * _c(b)).alias(f"_p_{a}_{b}"))
    m = df.agg(*aggs)

    def _corr(a: str, b: str):
        n = F.col("_n").cast("double")
        sa, sb = F.col(f"_s_{a}").cast("double"), F.col(f"_s_{b}").cast("double")
        sab = F.col(f"_p_{a}_{b}").cast("double")
        saa = F.col(f"_p_{a}_{a}").cast("double")
        sbb = F.col(f"_p_{b}_{b}").cast("double")
        denom = F.sqrt(n * saa - sa * sa) * F.sqrt(n * sbb - sb * sb)
        return F.round((n * sab - sa * sb) / F.when(denom != 0, denom), round_digits)

    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    _corr(a, b).alias("corr"),
                )
                for a, b in combinations_with_replacement(cols, 2)
                if a != b
            ]
        )
    ).alias("_p")
    return m.select(pairs).select("_p.col_a", "_p.col_b", "_p.corr")


def corr_matrix_sql(table: str, cols: list[str], *, round_digits: int = 4) -> str:
    """The identical matrix as ANSI SQL (DuckDB dialect: HUGEINT for the
    exact moment sums), emitted from the same spec."""
    c = {col: f"CAST(round({col} * 100) AS HUGEINT)" for col in cols}
    sums = [f"CAST(count(*) AS HUGEINT) AS n"]
    for col in cols:
        sums.append(f"sum({c[col]}) AS s_{col}")
    for a, b in combinations_with_replacement(cols, 2):
        sums.append(f"sum({c[a]} * {c[b]}) AS p_{a}_{b}")
    rows = []
    for a, b in combinations_with_replacement(cols, 2):
        if a == b:
            continue
        expr = (
            f"round((CAST(n AS DOUBLE) * CAST(p_{a}_{b} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            f" / nullif(sqrt(CAST(n AS DOUBLE) * CAST(p_{a}_{a} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
            f" * sqrt(CAST(n AS DOUBLE) * CAST(p_{b}_{b} AS DOUBLE)"
            f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)), 0), {round_digits})"
        )
        rows.append(f"SELECT '{a}' AS col_a, '{b}' AS col_b, {expr} AS corr FROM m")
    return f"WITH m AS (SELECT {', '.join(sums)} FROM {table}) " + " UNION ALL ".join(rows)


def grouped_linreg(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    *,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group simple linear regression y = a·x + b by the normal
    equations, from the same exact integer moments as
    :func:`corr_matrix` — one hash aggregate per group, closed-form
    slope/intercept/R², float arithmetic only on the exact per-group
    moment row (so any engine reproduces it; qb4):

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n        [in cents]
        R² = corr(x, y)²

    Groups with zero x-variance yield NULL slope/intercept/R². This is
    the million-models shape — one regression per key in a single
    shuffle — not MLlib's one-big-model shape."""
    m = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum(_c(x_col)).alias("_sx"),
        F.sum(_c(y_col)).alias("_sy"),
        F.sum(_c(x_col) * _c(x_col)).alias("_sxx"),
        F.sum(_c(x_col) * _c(y_col)).alias("_sxy"),
        F.sum(_c(y_col) * _c(y_col)).alias("_syy"),
    )
    n = F.col("_n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx, sxy, syy = (
        F.col("_sxx").cast("double"),
        F.col("_sxy").cast("double"),
        F.col("_syy").cast("double"),
    )
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    slope = cov / F.when(vx != 0, vx)
    # slope is cents-per-cent (dimensionless); intercept converts back
    # to the y column's natural units
    intercept = (sy - slope * sx) / n / F.lit(100.0)
    r2 = (cov * cov) / F.when(vx * vy != 0, vx * vy)
    return m.select(
        *group_cols,
        F.round(slope, round_digits).alias("slope"),
        F.round(intercept, round_digits).alias("intercept"),
        F.round(r2, round_digits).alias("r2"),
    )


def grouped_linreg_sql(
    table: str,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    *,
    round_digits: int = 6,
) -> str:
    """The identical per-group regression as ANSI SQL."""
    cx = f"CAST(round({x_col} * 100) AS HUGEINT)"
    cy = f"CAST(round({y_col} * 100) AS HUGEINT)"
    g = ", ".join(group_cols)
    return f"""
WITH m AS (
  SELECT {g},
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum({cx}) AS DOUBLE) AS sx,
         CAST(sum({cy}) AS DOUBLE) AS sy,
         CAST(sum({cx} * {cx}) AS DOUBLE) AS sxx,
         CAST(sum({cx} * {cy}) AS DOUBLE) AS sxy,
         CAST(sum({cy} * {cy}) AS DOUBLE) AS syy
  FROM {table} GROUP BY {g}
)
SELECT {g},
       round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0), {round_digits}) AS slope,
       round((sy - (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0) * sx) / n / 100.0, {round_digits}) AS intercept,
       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0), {round_digits}) AS r2
FROM m
"""


def ab_test_report(
    events: DataFrame,
    user_col: str,
    event_col: str,
    *,
    exposure_event: str,
    conversion_event: str,
    seed: int = 0,
    z_round: int = 4,
) -> DataFrame:
    """Two-variant experiment readout: deterministic 50/50 assignment of
    exposed users (``splits.hash_split`` — same user + seed → same arm,
    on any engine, forever), per-arm conversion, and the two-proportion
    z-statistic — one row: (n_a, conv_a, cvr_a, n_b, conv_b, cvr_b, z,
    significant at |z| > 1.96).

    Engine-exact: counts are integers; the z expression is one fixed
    chain of correctly-rounded double ops from those integers, so any
    engine evaluating the same parse emits the identical double, rounded
    once at the end. Zero-variance denominators NULL out (no division
    guard needed downstream — NULL fails the significance compare).

    Scale shape: two distinct-aggregates over the events table (exposed
    users, converted users — both |users|-bounded), a broadcast-or-
    shuffle left join between them, a 2-row aggregate, then a 1-row
    conditional pivot. Nothing wider than the user dimension moves.
    """
    from alaska_etl_spark.operators.splits import hash_split

    exposed = events.filter(F.col(event_col) == exposure_event).select(
        F.col(user_col).alias("_u")
    ).distinct()
    assigned = hash_split(
        exposed, "_u", weights={"A": 0.5, "B": 0.5}, seed=seed, split_col="_v"
    )
    converted = (
        events.filter(F.col(event_col) == conversion_event)
        .select(F.col(user_col).alias("_u"))
        .distinct()
        .withColumn("_c", F.lit(1))
    )
    per = (
        assigned.join(converted, "_u", "left")
        .groupBy("_v")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.coalesce(F.col("_c"), F.lit(0))).cast("bigint").alias("_conv"),
        )
    )
    one = per.agg(
        F.max(F.when(F.col("_v") == "A", F.col("_n"))).alias("n_a"),
        F.max(F.when(F.col("_v") == "A", F.col("_conv"))).alias("conv_a"),
        F.max(F.when(F.col("_v") == "B", F.col("_n"))).alias("n_b"),
        F.max(F.when(F.col("_v") == "B", F.col("_conv"))).alias("conv_b"),
    )
    p1 = F.col("conv_a") / F.col("n_a")
    p2 = F.col("conv_b") / F.col("n_b")
    p = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(p * (F.lit(1.0) - p) * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b")))
    z = F.round((p1 - p2) / F.when(se != 0, se), z_round)
    # sample-ratio-mismatch guard: chi-square of the arm sizes against
    # the designed 50/50 — a skewed split means broken assignment and a
    # readout that must not be trusted, whatever z says. Integer counts
    # feed one fixed float chain (E = (n_a+n_b)/2, df=1, crit 3.84).
    e = (F.col("n_a") + F.col("n_b")) / F.lit(2.0)
    srm = F.round(
        (F.col("n_a") - e) * (F.col("n_a") - e) / e
        + (F.col("n_b") - e) * (F.col("n_b") - e) / e,
        4,
    )
    return one.select(
        "n_a",
        "conv_a",
        F.round(p1, 6).alias("cvr_a"),
        "n_b",
        "conv_b",
        F.round(p2, 6).alias("cvr_b"),
        z.alias("z"),
        (F.abs(z) > 1.96).alias("significant"),
        srm.alias("srm_chi2"),
        (srm > 3.84).alias("srm_suspect"),
    )


def cuped_adjustment(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    val_col: str,
    *,
    cutoff: str,
    seed: int = 0,
) -> DataFrame:
    """CUPED variance reduction for the A/B readout: per-user pre-period
    value (before ``cutoff``) as the covariate, θ = cov(pre, post)/
    var(pre) from EXACT integer-cent moments, and per-arm adjusted means
    ȳ_v − θ·(x̄_v − x̄). One row: (theta, mean_a_raw, mean_b_raw,
    mean_a_adj, mean_b_adj, var_reduction_pct = 100·ρ²).

    The exact-moment discipline (corr_matrix/grouped_linreg) extended to
    experiment analytics: every sum is a BIGINT of cents or cent
    products, so θ's numerator/denominator are exact integers and the
    float work is a fixed chain any engine reproduces bit-for-bit.
    (Cent-product sums overflow int64 around 10^7 users × 10^5-cent
    users — switch the moment columns to DECIMAL(38,0) there; the
    expression shape is unchanged.)

    Scale shape: one user-grain aggregate over events (the only
    corpus-sized work), a 1-row global moment aggregate, a 2-row arm
    aggregate, and a driver-free 1-row join of the two.
    """
    from alaska_etl_spark.operators.splits import hash_split

    cents = F.round(F.col(val_col) * 100).cast("bigint")
    pre_c = F.when(F.col(ts_col) < F.lit(cutoff).cast("timestamp_ntz"), cents).otherwise(F.lit(0))
    post_c = F.when(F.col(ts_col) >= F.lit(cutoff).cast("timestamp_ntz"), cents).otherwise(F.lit(0))
    pu = events.groupBy(F.col(user_col).alias("_u")).agg(
        F.sum(pre_c).cast("bigint").alias("_x"),
        F.sum(post_c).cast("bigint").alias("_y"),
    )
    pu = hash_split(pu, "_u", weights={"A": 0.5, "B": 0.5}, seed=seed, split_col="_v")

    g = pu.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").cast("bigint").alias("sx"),
        F.sum("_y").cast("bigint").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("bigint").alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("bigint").alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).cast("bigint").alias("syy"),
    )
    arms = pu.groupBy("_v").agg(
        F.count(F.lit(1)).alias("nv"),
        F.sum("_x").cast("bigint").alias("sxv"),
        F.sum("_y").cast("bigint").alias("syv"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("_v") == "A", F.col("nv"))).alias("n_a"),
        F.max(F.when(F.col("_v") == "A", F.col("sxv"))).alias("sx_a"),
        F.max(F.when(F.col("_v") == "A", F.col("syv"))).alias("sy_a"),
        F.max(F.when(F.col("_v") == "B", F.col("nv"))).alias("n_b"),
        F.max(F.when(F.col("_v") == "B", F.col("sxv"))).alias("sx_b"),
        F.max(F.when(F.col("_v") == "B", F.col("syv"))).alias("sy_b"),
    )
    j = g.join(wide)
    tn = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    td = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    theta = tn / F.when(td != 0, td)
    xbar = F.col("sx") / F.col("n")
    yd = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    rho2 = (tn.cast("double") * tn.cast("double")) / F.when(
        (td != 0) & (yd != 0), td.cast("double") * yd.cast("double")
    )

    def _mean_adj(sy_v, sx_v, n_v):
        return (
            F.col(sy_v) / F.col(n_v)
            - theta * (F.col(sx_v) / F.col(n_v) - xbar)
        ) / F.lit(100.0)

    return j.select(
        F.round(theta, 6).alias("theta"),
        F.round(F.col("sy_a") / F.col("n_a") / F.lit(100.0), 4).alias("mean_a_raw"),
        F.round(F.col("sy_b") / F.col("n_b") / F.lit(100.0), 4).alias("mean_b_raw"),
        F.round(_mean_adj("sy_a", "sx_a", "n_a"), 4).alias("mean_a_adj"),
        F.round(_mean_adj("sy_b", "sx_b", "n_b"), 4).alias("mean_b_adj"),
        F.round(F.lit(100.0) * rho2, 2).alias("var_reduction_pct"),
    )


def psi_drift(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    *,
    cutoff: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between the value distributions before
    and after ``cutoff`` — the standard dataset-drift score an ML
    pipeline gates retraining/ingest on (PSI < 0.1 stable, > 0.25
    shifted). One row: (n_ref, n_cur, psi, drifted).

    Engine-exact protocol: bin edges are fixed-width over the GLOBAL
    integer-cent min/max, so bin assignment is pure integer arithmetic
    ((c − min)·k div (max − min + 1)); proportions are Laplace-smoothed
    ((count + 1)/(N + k), all bins contribute, no log-of-zero); each
    bin's (p_cur − p_ref)·ln(p_cur/p_ref) term is fixed-pointed to
    1e-8 units and SUMMED AS BIGINT — the PSI total is therefore
    independent of aggregation order (the BM25 trick) and replays
    bit-for-bit in any engine.

    Scale shape: one min/max aggregate + one binned count aggregate over
    the corpus (both map-side combined), then k-row arithmetic. The
    all-bins frame comes from a k-row range, not the data, so empty
    bins still contribute their smoothed terms.
    """
    cents = F.round(F.col(val_col) * 100).cast("bigint")
    cut = F.lit(cutoff).cast("timestamp_ntz")
    spark = df.sparkSession
    base = df.select(
        cents.alias("_c"), (F.col(ts_col) < cut).alias("_ref")
    )
    mm = base.agg(F.min("_c").alias("_lo"), F.max("_c").alias("_hi"))
    binned = (
        base.join(F.broadcast(mm))
        .withColumn(
            "bin",
            F.expr(f"(_c - _lo) * {n_bins} div (_hi - _lo + 1)").cast("int"),
        )
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("_ref"), 1).otherwise(0)).cast("bigint").alias("c_ref"),
            F.sum(F.when(~F.col("_ref"), 1).otherwise(0)).cast("bigint").alias("c_cur"),
        )
    )
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    full = (
        bins.join(binned, "bin", "left")
        .select(
            "bin",
            F.coalesce(F.col("c_ref"), F.lit(0)).alias("c_ref"),
            F.coalesce(F.col("c_cur"), F.lit(0)).alias("c_cur"),
        )
        .join(
            F.broadcast(
                binned.agg(
                    F.sum("c_ref").cast("bigint").alias("n_ref"),
                    F.sum("c_cur").cast("bigint").alias("n_cur"),
                )
            )
        )
    )
    p_ref = (F.col("c_ref") + 1) / (F.col("n_ref") + n_bins)
    p_cur = (F.col("c_cur") + 1) / (F.col("n_cur") + n_bins)
    term_micro = F.round((p_cur - p_ref) * F.log(p_cur / p_ref) * F.lit(1e8), 0).cast(
        "bigint"
    )
    out = full.agg(
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
        F.sum(term_micro).cast("bigint").alias("_pm"),
    )
    psi = F.round(F.col("_pm") / 1e8, 6)
    return out.select(
        "n_ref", "n_cur", psi.alias("psi"), (psi > 0.25).alias("drifted")
    )


def spearman_corr(
    df: DataFrame, x_col: str, y_col: str, *, round_digits: int = 6
) -> DataFrame:
    """Spearman rank correlation with midrank tie handling — the
    monotone-association statistic Pearson (qb3) can't give you, in
    the same engine-exact discipline: DOUBLED midranks ``R = 2·rank +
    ties − 1`` are pure integers (the qg7 AUC trick), all five Σ terms
    are exact BIGINT aggregates, and the only float arithmetic is one
    pinned-shape expression over those integers — ``num / (sqrt(dx) ·
    sqrt(dy))`` — whose every operation (*, −, /, sqrt) is
    IEEE-determined, so engines agree bit-for-bit at ANY n (unlike
    ln/exp there is no libm surface; doubling cancels out of the
    ratio).

    ρ = (n·ΣRxRy − ΣRx·ΣRy) / √(n·ΣRx²−(ΣRx)²) √(n·ΣRy²−(ΣRy)²),
    NULL when either margin is constant (zero variance). Σ-term
    overflow: ΣRxRy ≤ 4n³ needs n ≤ ~1.3e6 in BIGINT; the n·Σ
    combinations happen in DOUBLE (deterministic rounding, not
    overflow). Scale shape: two rank windows over the input frame
    (global sorts — fine for the ≤ hundreds-of-millions-row frames a
    correlation diagnostic runs on; the ranking.global_ranks
    range-exchange tier substitutes beyond), one map-side-combined
    aggregate. Returns one row ``(n, rho)``.
    """
    from pyspark.sql import Window

    rx = (
        2 * F.rank().over(Window.orderBy(F.col(x_col)))
        + F.count(F.lit(1)).over(Window.partitionBy(F.col(x_col)))
        - 1
    ).cast("bigint")
    ry = (
        2 * F.rank().over(Window.orderBy(F.col(y_col)))
        + F.count(F.lit(1)).over(Window.partitionBy(F.col(y_col)))
        - 1
    ).cast("bigint")
    ranked = df.select(rx.alias("_rx"), ry.alias("_ry"))
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_rx").cast("bigint").alias("_sx"),
        F.sum("_ry").cast("bigint").alias("_sy"),
        F.sum(F.col("_rx") * F.col("_ry")).cast("bigint").alias("_sxy"),
        F.sum(F.col("_rx") * F.col("_rx")).cast("bigint").alias("_sxx"),
        F.sum(F.col("_ry") * F.col("_ry")).cast("bigint").alias("_syy"),
    )
    # pinned shape — the oracle SQL mirrors it token for token
    rho = F.expr(
        "(CAST(n AS DOUBLE) * CAST(_sxy AS DOUBLE) - CAST(_sx AS DOUBLE) * CAST(_sy AS DOUBLE))"
        " / (sqrt(nullif(CAST(n AS DOUBLE) * CAST(_sxx AS DOUBLE) - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE), 0.0D))"
        "    * sqrt(nullif(CAST(n AS DOUBLE) * CAST(_syy AS DOUBLE) - CAST(_sy AS DOUBLE) * CAST(_sy AS DOUBLE), 0.0D)))"
    )
    return agg.select("n", F.round(rho, round_digits).alias("rho"))


def benford_audit(df: DataFrame, val_col: str, *, scale: int = 10**9) -> DataFrame:
    """First-digit (Benford's law) audit of a positive amount column —
    the classic fabricated-data / unit-mixing screen for financial
    facts: per digit d ∈ 1..9, the observed count, Benford's expected
    share ``log₁₀(1 + 1/d)``, and the χ² contribution.

    Engine-exact protocol: the first digit comes from the BIGINT cent
    value's decimal string (integer formatting is identical across
    engines — no float formatting, no log₁₀ of the value); expected
    shares quantize ``(ln(d+1) − ln(d)) / ln(10)`` — ln of exact small
    integers, the qg5/qf8 libm-residual class — to 1e-9 BIGINT units
    once per digit; each χ² term is then ONE pinned-shape IEEE
    expression over exact integers, emitted at 6dp. All nine digits
    appear even at zero observed count (the PSI all-bins discipline:
    a digit Benford expects 30% of rows to hit contributes its full
    χ² distance when absent).

    Scale shape: one 9-group map-side-combined aggregate over the
    fact column + a broadcast of the 1-row total against the 9-row
    digit frame. Returns ``(digit, observed, expected_share,
    chi2_term)`` ordered by digit.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    cents = F.round(F.col(val_col) * 100).cast("bigint")
    obs = (
        df.select(cents.alias("_c"))
        .filter(F.col("_c") > 0)
        .select(F.substring(F.col("_c").cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
    )
    total = obs.agg(F.sum("observed").cast("bigint").alias("_n"))
    digits = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    p_units = (
        F.round(
            F.lit(scale)
            * (F.log(F.col("digit") + 1) - F.log(F.col("digit")))
            / F.log(F.lit(10.0))
        )
        .cast("bigint")
        .alias("_p")
    )
    joined = (
        digits.select("digit", p_units)
        .join(obs, "digit", "left")
        .select(
            "digit",
            F.coalesce(F.col("observed"), F.lit(0)).cast("bigint").alias("observed"),
            "_p",
        )
        .crossJoin(F.broadcast(total))
    )
    # pinned shape: (obs*scale - n*p)^2 / (n*p) / scale, all inputs BIGINT
    term = F.expr(
        f"round(CAST(observed * {scale} - _n * _p AS DOUBLE)"
        f" * CAST(observed * {scale} - _n * _p AS DOUBLE)"
        f" / CAST(_n * _p AS DOUBLE) / CAST({scale} AS DOUBLE), 6)"
    )
    return joined.select(
        "digit",
        "observed",
        (F.col("_p") / float(scale)).alias("expected_share"),
        term.alias("chi2_term"),
    ).orderBy("digit")


def diff_in_diff(
    df: DataFrame,
    unit_col: str,
    ts_col: str,
    val_col: str,
    *,
    cutoff: str,
    treat_frac: float = 0.5,
    seed: int = 0,
    scale: int = 10**4,
) -> DataFrame:
    """Difference-in-differences estimate over an event stream: units
    are deterministically hash-assigned to treatment
    (``splits.hash_bucket`` — the engine/SQL-twin split arithmetic
    every experiment here uses), periods split at ``cutoff``, and the
    DID estimate is ``(ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)``
    — the standard parallel-trends causal readout when a pre period
    exists (the panel-data sibling of qe1's AB test and q45's CUPED).

    Exactness: cell sums are integer cents, each of the four cell
    means is the shared div_half_up emit at 1e-4, and the DID combines
    those four ALREADY-QUANTIZED means (a 1e-4-grid subtraction —
    exact in doubles, engine-identical; combining raw rationals
    instead would need a 4-denominator common multiple that overflows
    BIGINT at corpus scale for no extra information). Empty cells emit
    NULL means and a NULL estimate — a missing pre-period is a design
    failure the row should show, not mask.

    Scale shape: ONE map-side-combined 4-cell aggregate over the
    events (group keys are two booleans), then 1-row arithmetic.
    Returns one row ``(n_treat_pre, n_treat_post, n_ctrl_pre,
    n_ctrl_post, mean_treat_pre, mean_treat_post, mean_ctrl_pre,
    mean_ctrl_post, did)``.
    """
    from alaska_etl_spark.functions.fixedpoint import div_half_up_signed
    from alaska_etl_spark.operators.splits import hash_bucket

    treat = hash_bucket(F.col(unit_col), seed=seed) < int(round(treat_frac * 10**6))
    post = F.col(ts_col) >= F.lit(cutoff).cast("timestamp_ntz")
    cents = F.round(F.col(val_col) * 100).cast("bigint")
    cells = df.select(
        treat.alias("_t"), post.alias("_p"), cents.alias("_c")
    ).agg(
        *[
            F.sum(F.when((F.col("_t") == t) & (F.col("_p") == p), 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{n}")
            for t, p, n in [
                (True, False, "treat_pre"),
                (True, True, "treat_post"),
                (False, False, "ctrl_pre"),
                (False, True, "ctrl_post"),
            ]
        ],
        *[
            F.sum(F.when((F.col("_t") == t) & (F.col("_p") == p), F.col("_c")).otherwise(0))
            .cast("bigint")
            .alias(f"s_{n}")
            for t, p, n in [
                (True, False, "treat_pre"),
                (True, True, "treat_post"),
                (False, False, "ctrl_pre"),
                (False, True, "ctrl_post"),
            ]
        ],
    )
    def mean(n):
        # cents → currency units: scale/100 fixed-point then /scale.
        # Sign-aware: cell sums go negative when the value column does
        # (refunds, deltas) — abs-then-resign keeps Spark div / DuckDB
        # // agreement (ADVICE r6).
        return div_half_up_signed(
            f"s_{n}", f"nullif(100 * n_{n}, 0)", scale
        ) / float(scale)

    out = cells.select(
        "n_treat_pre",
        "n_treat_post",
        "n_ctrl_pre",
        "n_ctrl_post",
        mean("treat_pre").alias("mean_treat_pre"),
        mean("treat_post").alias("mean_treat_post"),
        mean("ctrl_pre").alias("mean_ctrl_pre"),
        mean("ctrl_post").alias("mean_ctrl_post"),
    )
    did = (
        (F.col("mean_treat_post") - F.col("mean_treat_pre"))
        - (F.col("mean_ctrl_post") - F.col("mean_ctrl_pre"))
    )
    return out.select("*", F.round(did, 4).alias("did"))


def cohens_kappa(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two
    categorical assignments (Cohen '60): the standard way to read "the
    heuristic agrees with the recorded label" net of what marginal
    class frequencies alone would produce. Complements the accuracy /
    AUC / chi² evaluation row (qg7/qg8) with the inter-rater form.

    Multiplying through by n² keeps it exact: with agreement count A,
    total n, and marginal product mass P = Σ_c row_c·col_c,

        kappa = (n·A − P) / (n² − P)

    — both sides pure BIGINT; the single final BIGINT÷BIGINT division
    is correctly rounded IEEE in any engine (the pinned-shape doubles
    oracle class, no libm). n² < 2^63 bounds n at ~3e9 rows.

    One shuffle: the (label, pred) confusion matrix; everything after
    runs on class-count-sized frames. Returns one row:
    ``(n, n_agree, num, den, kappa)`` with kappa NULL when den = 0
    (degenerate single-class margins).
    """
    conf = (
        df.groupBy(
            F.col(label_col).alias("_l"), F.col(pred_col).alias("_p")
        ).agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    )
    tot = conf.agg(
        F.sum("_c").cast("bigint").alias("n"),
        F.sum(F.when(F.col("_l") == F.col("_p"), F.col("_c")).otherwise(0))
        .cast("bigint")
        .alias("n_agree"),
    )
    mr = conf.groupBy(F.col("_l").alias("_cls")).agg(
        F.sum("_c").cast("bigint").alias("_mr")
    )
    mc = conf.groupBy(F.col("_p").alias("_cls")).agg(
        F.sum("_c").cast("bigint").alias("_mc")
    )
    pe = (
        mr.join(mc, on="_cls", how="inner")
        .agg(F.coalesce(F.sum(F.col("_mr") * F.col("_mc")), F.lit(0)).alias("_pe"))
    )
    return (
        tot.crossJoin(pe)
        .select(
            "n",
            "n_agree",
            (F.col("n") * F.col("n_agree") - F.col("_pe"))
            .cast("bigint")
            .alias("num"),
            (F.col("n") * F.col("n") - F.col("_pe")).cast("bigint").alias("den"),
        )
        .select(
            "n",
            "n_agree",
            "num",
            "den",
            F.when(F.col("den") != 0, F.col("num") / F.col("den")).alias("kappa"),
        )
    )


def km_survival(
    df: DataFrame, duration_col: str, event_col: str
) -> DataFrame:
    """Kaplan-Meier survival estimator (Kaplan & Meier '58) over
    right-censored integer durations: at each event time t,
    ``S(t) = Π_{t'≤t} (1 − d_t'/n_t')`` with d = events and n = at-risk
    count. The churn/retention curve in its censoring-correct form —
    unlike qc3's cohort retention, users still active at the horizon
    (censored) shrink the risk set without counting as churned.

    Grain economics: one aggregate collapses subjects to the
    per-duration frame (≤ |distinct durations| rows — days, not
    users); the at-risk reverse cumulative sum, the event filter, and
    the product all run over that tiny frame.

    Exactness protocol: the product is emitted in LOG space —
    ``ln((n−d)/n)`` per event time, quantized to 1e-9 nats (BIGINT)
    BEFORE the cumulative sum, so the running total is
    aggregation-order-free and engine-replayable (the PSI/JS libm
    discipline; S(t) = exp(lnano/1e9) for human reading). When the
    risk set is exhausted (d = n), survival is exactly 0 and
    ``survival_lnano`` is NULL from that time on (ln 0 undefined).

    Returns per event time: ``(t, n_risk, d_events, survival_lnano)``.
    """
    from pyspark.sql import Window

    per_t = df.groupBy(F.col(duration_col).alias("t")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_end"),
        F.sum(F.col(event_col).cast("bigint")).cast("bigint").alias("d_events"),
    )
    w_ge = Window.orderBy("t").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    at_risk = per_t.select(
        "t",
        "d_events",
        F.sum("_n_end").over(w_ge).cast("bigint").alias("n_risk"),
    ).filter(F.col("d_events") > 0)
    term = F.when(
        F.col("n_risk") > F.col("d_events"),
        F.round(
            F.log(
                (F.col("n_risk") - F.col("d_events")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * F.lit(1e9)
        ).cast("bigint"),
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    scored = at_risk.select(
        "t",
        "n_risk",
        "d_events",
        term.alias("_term"),
        F.max(
            F.when(F.col("n_risk") == F.col("d_events"), 1).otherwise(0)
        )
        .over(w_cum)
        .alias("_dead"),
    )
    return scored.select(
        "t",
        "n_risk",
        "d_events",
        F.when(
            F.col("_dead") == 0, F.sum("_term").over(w_cum).cast("bigint")
        ).alias("survival_lnano"),
    )


def grouped_weighted_median(
    df: DataFrame,
    group_cols: list[str],
    val_cents: str,
    weight_col: str,
) -> DataFrame:
    """Exact lower weighted median per group: the smallest value v such
    that the weight at or below v reaches half the group's total —
    quantity-weighted "typical price" where the unweighted median
    (q38's percentile family) over-counts small lots. Pure window
    algebra: one exchange on the group key, one sort by value inside
    it, a running weight sum, then ``min(v | 2·cumw >= totw)`` — all
    BIGINT (integer weights, cent values; no interpolation, so the
    answer is always an observed value and engine-exact).

    ``val_cents`` / ``weight_col`` are SQL expressions evaluating to
    BIGINT. Returns ``(group_cols..., total_weight, n_rows,
    weighted_median_cents)``.
    """
    from pyspark.sql import Window

    base = df.select(
        *[F.col(c) for c in group_cols],
        F.expr(val_cents).cast("bigint").alias("_v"),
        F.expr(weight_col).cast("bigint").alias("_w"),
    )
    w_run = (
        Window.partitionBy(*group_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = (
        Window.partitionBy(*group_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    scored = base.select(
        *group_cols,
        "_v",
        "_w",
        F.sum("_w").over(w_run).cast("bigint").alias("_cw"),
        F.sum("_w").over(w_all).cast("bigint").alias("_tw"),
    )
    return (
        scored.groupBy(*group_cols)
        .agg(
            F.max("_tw").cast("bigint").alias("total_weight"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min(F.when(2 * F.col("_cw") >= F.col("_tw"), F.col("_v")))
            .cast("bigint")
            .alias("weighted_median_cents"),
        )
    )


def conformal_threshold(
    df: DataFrame,
    group_cols: list[str],
    score_cents: str,
    tiebreak_col: str,
    *,
    alpha_num: int = 1,
    alpha_den: int = 10,
) -> DataFrame:
    """Split-conformal calibration threshold per group (Vovk et al.;
    Angelopoulos & Bates '21 tutorial form): the k-th smallest
    calibration score with ``k = ceil((n+1)·(1−α))`` — the cutoff
    that guarantees ≥ 1−α marginal coverage for future scores drawn
    from the same distribution. The ML-ops primitive behind
    distribution-free prediction intervals and selective answering.

    α is a rational ``alpha_num/alpha_den`` so k is EXACT integer
    arithmetic: ``k = ceil((den−num)·(n+1)/den)``, clamped to n (the
    k > n case means the coverage goal is unattainable at this n; the
    max score is emitted and ``attainable`` is false).

    One exchange + one sort per group (rank window over (score, tie));
    the k-th VALUE is tie-order-independent because equal scores share
    the emitted value. Returns ``(group_cols..., n, k,
    threshold_cents, attainable)``.
    """
    from pyspark.sql import Window

    num, den = int(alpha_num), int(alpha_den)
    keep = den - num
    base = df.select(
        *[F.col(c) for c in group_cols],
        F.expr(score_cents).cast("bigint").alias("_v"),
        F.col(tiebreak_col).alias("_tb"),
    )
    w = Window.partitionBy(*group_cols).orderBy("_v", "_tb")
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    scored = base.select(
        *group_cols,
        "_v",
        F.row_number().over(w).cast("bigint").alias("_rn"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("_n"),
    )
    k_raw = F.expr(f"({keep} * (_n + 1) + {den} - 1) div {den}")
    return (
        scored.withColumn("_k", F.least(k_raw, F.col("_n")))
        .filter(F.col("_rn") == F.col("_k"))
        .select(
            *group_cols,
            F.col("_n").alias("n"),
            F.col("_k").alias("k"),
            F.col("_v").alias("threshold_cents"),
            (k_raw <= F.col("_n")).alias("attainable"),
        )
    )


def anova_oneway(
    df: DataFrame, group_col: str, val_cents: str
) -> DataFrame:
    """One-way ANOVA F statistic from exact integer moments: does the
    group factor explain variance beyond noise — the k-group
    generalization of qe1's two-sample z-test, in the same
    engine-exact moments discipline (corr matrix / OLS / CUPED).

    With per-group cents moments ``(n_g, s_g, ss_g)`` and totals
    ``(n, s, ss)``, multiplying the textbook sums of squares through
    by the group sizes keeps every term BIGINT-exact as long as each
    per-group product stays in range; this implementation computes

        SSB·n·Π = Σ_g (n·s_g − n_g·s)² / (n_g) …

    avoided: instead each group's contribution is accumulated as the
    RATIONAL pair ``((n·s_g − n_g·s)², n_g·n²)`` reduced to one float
    term per group AFTER exact integer numerators — the one division
    per group and the final F are correctly-rounded IEEE over exact
    integers (the pinned-shape doubles class: ÷ and the two final
    quotients only, no libm). Bound: |n·s_g| < 2^63 ⇒ n·|cents|_sum
    per group < 9.2e18 (~1e9 rows of 1e5-cent values at 1e4 groups).

    Returns one row: ``(k_groups, n, ssb_x, ssw_x, f_stat)`` where
    ssb/ssw are emitted ×1e6 round-half-up for stable comparison and
    ``f_stat = (ssb/(k−1))/(ssw/(n−k))``; NULL when degenerate
    (k < 2 or n ≤ k).
    """
    per_g = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_ng"),
        F.sum(F.expr(val_cents)).cast("bigint").alias("_sg"),
        F.sum(F.expr(val_cents) * F.expr(val_cents)).cast("bigint").alias("_ssg"),
    )
    tot = per_g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("_ng").cast("bigint").alias("n"),
        F.sum("_sg").cast("bigint").alias("s"),
        F.sum("_ssg").cast("bigint").alias("ss"),
    )
    # per-group term of SSB (about the grand mean), exact numerator:
    #   n_g·(mean_g − mean)² = (n·s_g − n_g·s)² / (n_g·n²)
    joined = per_g.crossJoin(F.broadcast(tot))
    # exact BIGINT, then square in DOUBLE: |n·s_g − n_g·s| must stay
    # < 2^53 for the double to be exact (documented bound); the square
    # and divide are single correctly-rounded ops — engine-identical
    num = (F.col("n") * F.col("_sg") - F.col("_ng") * F.col("s")).cast("double")
    ssb_terms = joined.select(
        F.col("k"),
        F.col("n"),
        F.col("s"),
        F.col("ss"),
        (
            (num * num)
            / (
                F.col("_ng").cast("double")
                * F.col("n").cast("double")
                * F.col("n").cast("double")
            )
        ).alias("_t"),
        # within-group SS, exact integer: ss_g − s_g²/n_g, scaled by n_g
        ((F.col("_ng") * F.col("_ssg") - F.col("_sg") * F.col("_sg")).cast("double")
         / F.col("_ng").cast("double")).alias("_w"),
    )
    agg = ssb_terms.groupBy("k", "n").agg(
        F.sum(F.round(F.col("_t") * 100).cast("bigint")).cast("bigint").alias("_ssb_x"),
        F.sum(F.round(F.col("_w") * 100).cast("bigint")).cast("bigint").alias("_ssw_x"),
    )
    f = (
        (F.col("_ssb_x").cast("double") / (F.col("k") - 1).cast("double"))
        / (F.col("_ssw_x").cast("double") / (F.col("n") - F.col("k")).cast("double"))
    )
    return agg.select(
        F.col("k").alias("k_groups"),
        "n",
        F.col("_ssb_x").alias("ssb_x100"),
        F.col("_ssw_x").alias("ssw_x100"),
        F.when((F.col("k") > 1) & (F.col("n") > F.col("k")) & (F.col("_ssw_x") > 0), f).alias(
            "f_stat"
        ),
    )


def uplift_deciles(
    df: DataFrame,
    id_col: str,
    score_col: str,
    treated_col: str,
    outcome_col: str,
    *,
    k: int = 10,
) -> DataFrame:
    """Uplift evaluation by score decile (Qini/uplift curve,
    Radcliffe '07): rank subjects by a targeting score, split each
    decile by treatment assignment, and report the treated-minus-
    control response gap per decile plus the cumulative Qini statistic
    — the standard readout for "does the model rank the persuadable
    first". Completes the causal family: qe1/qh8/q45 estimate AVERAGE
    effects; this evaluates a TARGETING RANKING.

    Deciles come from the q84 global-ranking machinery (range
    exchange + narrow Arrow pass — never a single-partition window
    over subjects). Per-decile counts are exact BIGINTs; the two float
    emits are pinned-shape IEEE over exact integers (one divide each
    side of a subtract for ``uplift``; one divide + subtract for
    ``qini_cum = Σconv_t − Σconv_c·Σn_t/Σn_c``) — no libm,
    engine-identical.

    Returns per decile: ``(decile, n_t, conv_t, n_c, conv_c, uplift,
    qini_cum)``; uplift/qini are NULL while a side has no subjects.
    """
    from pyspark.sql import Window

    from alaska_etl_spark.operators.ranking import global_ntile

    base = df.select(
        F.col(id_col).alias("_id"),
        (-F.col(score_col)).alias("_negscore"),
        F.col(treated_col).cast("int").alias("_t"),
        F.col(outcome_col).cast("int").alias("_y"),
    )
    ranked = global_ntile(base, ["_negscore", "_id"], k, bucket_col="decile")
    per = ranked.groupBy("decile").agg(
        F.sum("_t").cast("bigint").alias("n_t"),
        F.sum(F.col("_t") * F.col("_y")).cast("bigint").alias("conv_t"),
        F.sum(1 - F.col("_t")).cast("bigint").alias("n_c"),
        F.sum((1 - F.col("_t")) * F.col("_y")).cast("bigint").alias("conv_c"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "decile",
        "n_t",
        "conv_t",
        "n_c",
        "conv_c",
        F.sum("n_t").over(w).cast("bigint").alias("_cnt"),
        F.sum("conv_t").over(w).cast("bigint").alias("_cct"),
        F.sum("n_c").over(w).cast("bigint").alias("_cnc"),
        F.sum("conv_c").over(w).cast("bigint").alias("_ccc"),
    )
    uplift = (
        F.col("conv_t").cast("double") / F.col("n_t").cast("double")
        - F.col("conv_c").cast("double") / F.col("n_c").cast("double")
    )
    qini = (
        F.col("_cct").cast("double")
        - (F.col("_ccc") * F.col("_cnt")).cast("double") / F.col("_cnc").cast("double")
    )
    return cum.select(
        "decile",
        "n_t",
        "conv_t",
        "n_c",
        "conv_c",
        F.when((F.col("n_t") > 0) & (F.col("n_c") > 0), uplift).alias("uplift"),
        F.when(F.col("_cnc") > 0, qini).alias("qini_cum"),
    )


def categorical_mutual_info(
    df: DataFrame, pairs: "list[tuple[str, str]]", *, scale: int = 10**8
) -> DataFrame:
    """Exact mutual information (and marginal entropies) between pairs
    of categorical columns — the dependence strength the FD audit's
    boolean `holds` can't express (a 99%-functional o_custkey→status
    and pure noise both report holds=false; MI separates them), and the
    number a feature-redundancy screen ranks columns by.

    Per pair, MI = Σ_cells (n_xy/n)·ln(n·n_xy/(n_x·n_y)) in nats. The
    float protocol is the PMI/qg5 per-term ln discipline: every ln
    argument is an exact BIGINT count, the per-cell expression keeps
    ONE pinned parenthesization, each cell's term is rounded
    half-to-even by F.round to 1e-8 units (absorbing last-ulp libm
    drift), and the BIGINT units sum order-free. Entropies get the
    same treatment over the margin frames, so normalized variants are
    one engine-identical double division away for the caller.

    Scale shape (the r7 stage-floor lesson): ALL pairs ride ONE
    pair-tagged explode + ONE hash aggregate to the (pair, x, y) cell
    frame; margins and totals re-aggregate THAT reduced frame (bounded
    by category cardinality, not rows). NULL categories count as their
    own level on both engines: values are coalesced to a NUL-prefixed
    sentinel BEFORE the cell aggregate, so the margin joins (which are
    null-unsafe equi-joins) never drop a NULL-level cell from the MI
    sum — without the sentinel, a NULL cell is counted in n_rows and
    both entropies but silently excluded from mi_nats.

    Returns (subject, object, n_rows, n_cells, mi_nats, h_subject_nats,
    h_object_nats) ordered by (subject, object)."""
    entries = F.array(
        *[
            F.struct(
                F.lit(x).alias("_sub"),
                F.lit(y).alias("_obj"),
                F.coalesce(F.col(x).cast("string"), F.lit("\x00null")).alias("_x"),
                F.coalesce(F.col(y).cast("string"), F.lit("\x00null")).alias("_y"),
            )
            for x, y in pairs
        ]
    )
    cells = (
        df.select(F.explode(entries).alias("_e"))
        .select("_e._sub", "_e._obj", "_e._x", "_e._y")
        .groupBy("_sub", "_obj", "_x", "_y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_nxy"))
    )
    from alaska_etl_spark.cache import tracked_persist

    cells = tracked_persist(cells)
    mx = cells.groupBy("_sub", "_obj", "_x").agg(
        F.sum("_nxy").cast("bigint").alias("_nx")
    )
    my = cells.groupBy("_sub", "_obj", "_y").agg(
        F.sum("_nxy").cast("bigint").alias("_ny")
    )
    tot = cells.groupBy("_sub", "_obj").agg(
        F.sum("_nxy").cast("bigint").alias("_n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    )
    term = (
        F.col("_nxy").cast("double")
        / F.col("_n")
        * (
            (
                (F.log(F.col("_nxy")) - F.log(F.col("_nx")))
                - F.log(F.col("_ny"))
            )
            + F.log(F.col("_n"))
        )
    )
    mi = (
        cells.join(mx, ["_sub", "_obj", "_x"])
        .join(my, ["_sub", "_obj", "_y"])
        .join(F.broadcast(tot.select("_sub", "_obj", "_n")), ["_sub", "_obj"])
        .select(
            "_sub",
            "_obj",
            F.round(F.lit(scale) * term).cast("long").alias("_u"),
        )
        .groupBy("_sub", "_obj")
        .agg(F.sum("_u").cast("bigint").alias("_mi_u"))
    )

    def _entropy(margin: DataFrame, cnt: str, alias: str) -> DataFrame:
        t = (
            F.col(cnt).cast("double")
            / F.col("_n")
            * (F.log(F.col(cnt)) - F.log(F.col("_n")))
        )
        return (
            margin.join(F.broadcast(tot.select("_sub", "_obj", "_n")), ["_sub", "_obj"])
            .select(
                "_sub",
                "_obj",
                F.round(F.lit(-scale) * t).cast("long").alias("_u"),
            )
            .groupBy("_sub", "_obj")
            .agg(F.sum("_u").cast("bigint").alias(alias))
        )

    hx = _entropy(mx, "_nx", "_hx_u")
    hy = _entropy(my, "_ny", "_hy_u")
    s = float(scale)
    return (
        tot.join(mi, ["_sub", "_obj"])
        .join(hx, ["_sub", "_obj"])
        .join(hy, ["_sub", "_obj"])
        .select(
            F.col("_sub").alias("subject"),
            F.col("_obj").alias("object"),
            F.col("_n").alias("n_rows"),
            "n_cells",
            (F.col("_mi_u").cast("double") / s).alias("mi_nats"),
            (F.col("_hx_u").cast("double") / s).alias("h_subject_nats"),
            (F.col("_hy_u").cast("double") / s).alias("h_object_nats"),
        )
        .orderBy("subject", "object")
    )


def histogram_profile(
    df: DataFrame, cols: "list[str]", *, nbins: int = 10
) -> DataFrame:
    """Equi-width histograms for numeric columns — the distribution
    view the column profile (n/null/distinct/min/max) lacks: skew,
    spikes, and empty ranges show here before they show as a skewed
    shuffle. One pass: ALL columns ride one tagged explode + one hash
    aggregate (the r7 stage-floor rule), then min/max margins come
    from the same reduced frame.

    Cross-engine exactness without a float protocol: bins are
    ``least(nbins−1, floor(((v − mn) · nbins) / (mx − mn)))`` with one
    pinned parenthesization — subtraction, multiplication, and
    division are correctly-rounded IEEE (no libm), so identical
    doubles give identical bins on any engine. Degenerate mx = mn puts
    every row in bin 0. NULLs are excluded (profile reports them).

    Two scans of the raw column values (min/max, then binning) — at
    100 TB both are the SAME parquet scan; the alternative single-pass
    t-digest trades exactness for one pass and belongs to the sketch
    family. Returns (column_name, bin, lo, hi, n) ordered by
    (column_name, bin); empty bins are absent (sparse)."""
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("_c"), F.col(c).cast("double").alias("_v")
            )
            for c in cols
        ]
    )
    vals = (
        df.select(F.explode(entries).alias("_e"))
        .select("_e._c", "_e._v")
        .filter(F.col("_v").isNotNull())
    )
    ranges = vals.groupBy("_c").agg(
        F.min("_v").alias("_mn"), F.max("_v").alias("_mx")
    )
    v, mn, mx = F.col("_v"), F.col("_mn"), F.col("_mx")
    raw_bin = F.floor(((v - mn) * F.lit(float(nbins))) / (mx - mn))
    bin_ = (
        F.when(mx == mn, F.lit(0))
        .otherwise(F.least(F.lit(nbins - 1), raw_bin))
        .cast("int")
    )
    width = (mx - mn) / F.lit(float(nbins))
    return (
        vals.join(F.broadcast(ranges), "_c")
        .groupBy(F.col("_c").alias("column_name"), bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.first("_mn").alias("_mn"),
            F.first("_mx").alias("_mx"),
        )
        .select(
            "column_name",
            "bin",
            (F.col("_mn") + F.col("bin") * (F.col("_mx") - F.col("_mn")) / F.lit(float(nbins))).alias("lo"),
            (F.col("_mn") + (F.col("bin") + 1) * (F.col("_mx") - F.col("_mn")) / F.lit(float(nbins))).alias("hi"),
            "n",
        )
        .orderBy("column_name", "bin")
    )


def winsorize_report(
    df: DataFrame,
    group_cols: "list[str]",
    col: str,
    *,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    scale: int = 100,
) -> DataFrame:
    """Winsorization impact report: per group, the exact p_lo/p_hi
    clip bounds (value-domain exact quantiles —
    :func:`~alaska_etl_spark.operators.sketches.decimal_quantiles`,
    whose state is bounded by the value domain, never the row count),
    how much mass clipping would touch, and the mean before/after —
    the robust-preprocessing decision table ("does tail-clipping move
    this feature enough to matter?") that an outlier screen
    (z/MAD flags) doesn't quantify.

    Exact-integer protocol: values quantize once to ``scale`` units
    (round·cast BIGINT — the fixed-precision-data contract of
    decimal_quantiles), clip bounds come back as the same integers,
    clamp/compare/sum stay BIGINT, and each mean is ONE double
    division. NULLs excluded, as every SQL quantile does.

    Returns (group…, n, lo, hi, n_clip_lo, n_clip_hi, clip_bp,
    mean_before, mean_after) ordered by group."""
    from alaska_etl_spark.functions.fixedpoint import div_half_up
    from alaska_etl_spark.operators.hints import input_fits_driver, pin_corpus_agg
    from alaska_etl_spark.operators.sketches import decimal_quantiles

    small = input_fits_driver(df)
    q = decimal_quantiles(df, group_cols, col, [p_lo, p_hi], scale=scale)
    qc = F.round(F.col("value") * scale).cast("bigint")
    lo = pin_corpus_agg(
        q.filter(F.col("prob") == p_lo).select(*group_cols, qc.alias("_lo")), small
    )
    hi = pin_corpus_agg(
        q.filter(F.col("prob") == p_hi).select(*group_cols, qc.alias("_hi")), small
    )
    cents = df.filter(F.col(col).isNotNull()).select(
        *group_cols, F.round(F.col(col) * scale).cast("bigint").alias("_c")
    )
    clamped = F.greatest(F.col("_lo"), F.least(F.col("_hi"), F.col("_c")))
    s = float(scale)
    return (
        cents.join(lo, group_cols)
        .join(hi, group_cols)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.first("_lo").alias("_l"),
            F.first("_hi").alias("_h"),
            F.sum(F.when(F.col("_c") < F.col("_lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clip_lo"),
            F.sum(F.when(F.col("_c") > F.col("_hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clip_hi"),
            F.sum("_c").cast("bigint").alias("_sb"),
            F.sum(clamped).cast("bigint").alias("_sa"),
        )
        .select(
            *group_cols,
            "n",
            (F.col("_l").cast("double") / s).alias("lo"),
            (F.col("_h").cast("double") / s).alias("hi"),
            "n_clip_lo",
            "n_clip_hi",
            div_half_up("10000 * (n_clip_lo + n_clip_hi)", "n").alias("clip_bp"),
            (F.col("_sb").cast("double") / (F.col("n") * s)).alias("mean_before"),
            (F.col("_sa").cast("double") / (F.col("n") * s)).alias("mean_after"),
        )
        .orderBy(*group_cols)
    )


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    a_name: str,
    b_name: str,
    value_col: str,
    *,
    scale: int = 1,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic —
    max|CDF_a − CDF_b| — the distribution-parity check a split
    validation runs on numeric features (PSI bins coarsely and needs a
    bin count; KS is binless and is THE classical two-sample test).

    Exact-integer protocol to the last step: values quantize to
    ``scale`` units; per distinct value the two cumulative counts CA,
    CB are BIGINT window sums over the DISTINCT-value frame (the
    midrank/AUC reduced-frame discipline — the window never sees the
    data, only its value domain); the CDF gap at a value is
    |CA·n_b − CB·n_a| as a BIGINT (common denominator n_a·n_b), so the
    max is an integer comparison and ``ks`` is ONE final double
    division. Caller owns n_a·n_b < 2⁶³ (3·10⁹ rows a side).

    One row: (n_a, n_b, ks_num, ks)."""
    from pyspark.sql import Window

    base = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isin(a_name, b_name)
    ).select(
        (F.col(group_col) == a_name).alias("_a"),
        F.round(F.col(value_col) * scale).cast("bigint").alias("_v"),
    )
    counts = base.groupBy("_v").agg(
        F.sum(F.when(F.col("_a"), 1).otherwise(0)).cast("bigint").alias("_ca"),
        F.sum(F.when(~F.col("_a"), 1).otherwise(0)).cast("bigint").alias("_cb"),
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        F.sum("_ca").over(w).cast("bigint").alias("_CA"),
        F.sum("_cb").over(w).cast("bigint").alias("_CB"),
    )
    return (
        cum.crossJoin(
            F.broadcast(
                base.agg(
                    F.sum(F.when(F.col("_a"), 1).otherwise(0))
                    .cast("bigint")
                    .alias("n_a"),
                    F.sum(F.when(~F.col("_a"), 1).otherwise(0))
                    .cast("bigint")
                    .alias("n_b"),
                )
            )
        )
        .select(
            "n_a",
            "n_b",
            F.abs(F.col("_CA") * F.col("n_b") - F.col("_CB") * F.col("n_a"))
            .cast("bigint")
            .alias("_d"),
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("_d").cast("bigint").alias("ks_num"))
        .select(
            "n_a",
            "n_b",
            "ks_num",
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.col("ks_num").cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double"),
            ).alias("ks"),
        )
    )


def contingency_effect_sizes(
    df: DataFrame, pairs: "list[tuple[str, str]]", *, scale: int = 10**8
) -> DataFrame:
    """Pearson chi-squared and Cramér's V between pairs of categorical
    columns — the EFFECT-SIZE companion to
    :func:`categorical_mutual_info`: MI measures dependence in nats
    (scale-dependent), V normalizes to [0, 1] so a 3-level and a
    300-level pair rank on one axis; chi² itself is the significance
    screen's raw statistic.

    Per OBSERVED cell, the chi² contribution is (o−e)²/e − e =
    (n·n_xy − n_x·n_y)²/(n·n_x·n_y) − n_x·n_y/n; the UNOBSERVED cells
    (o = 0, e > 0) contribute Σ e over the full r×c grid minus the
    observed e's — and since Σ_grid e = n, the whole statistic folds to
    Σ_observed[(d/n_x)·(d/n_y)/n − n_x·n_y/n] + n with d = n·n_xy −
    n_x·n_y exact BIGINT (caller envelope: n·n_xy < 2⁶³); zero cells
    never materialize. One pinned double parenthesization per observed
    cell, rounded half away from zero (F.round / DuckDB round — the
    mode both engines share) to 1e-8 units, plus the exact n·scale —
    the categorical-MI float protocol: identical expression structure
    on both engines, order-free BIGINT unit sums. V = sqrt(chi²/(n·min(r−1, c−1))) is one engine-identical
    double expression over the exact unit sum; dof = (r−1)(c−1).

    NULL categories count as their own level (the NUL-sentinel
    coalesce, same as MI). ALL pairs ride ONE tagged explode + ONE cell
    aggregate; margins re-aggregate the reduced cell frame. Returns
    (subject, object, n_rows, n_cells, n_levels_subject,
    n_levels_object, dof, chi2, cramers_v) ordered."""
    from alaska_etl_spark.cache import tracked_persist

    entries = F.array(
        *[
            F.struct(
                F.lit(x).alias("_sub"),
                F.lit(y).alias("_obj"),
                F.coalesce(F.col(x).cast("string"), F.lit("\x00null")).alias("_x"),
                F.coalesce(F.col(y).cast("string"), F.lit("\x00null")).alias("_y"),
            )
            for x, y in pairs
        ]
    )
    cells = (
        df.select(F.explode(entries).alias("_e"))
        .select("_e._sub", "_e._obj", "_e._x", "_e._y")
        .groupBy("_sub", "_obj", "_x", "_y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_nxy"))
    )
    cells = tracked_persist(cells)
    mx = cells.groupBy("_sub", "_obj", "_x").agg(
        F.sum("_nxy").cast("bigint").alias("_nx")
    )
    my = cells.groupBy("_sub", "_obj", "_y").agg(
        F.sum("_nxy").cast("bigint").alias("_ny")
    )
    tot = cells.groupBy("_sub", "_obj").agg(
        F.sum("_nxy").cast("bigint").alias("_n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    )
    levels = (
        mx.groupBy("_sub", "_obj")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_rx"))
        .join(
            my.groupBy("_sub", "_obj").agg(
                F.count(F.lit(1)).cast("bigint").alias("_ry")
            ),
            ["_sub", "_obj"],
        )
    )
    d = F.col("_n") * F.col("_nxy") - F.col("_nx") * F.col("_ny")  # BIGINT
    term = (
        (d.cast("double") / F.col("_nx"))
        * (d.cast("double") / F.col("_ny"))
        / F.col("_n")
        - (F.col("_nx") * F.col("_ny")).cast("double") / F.col("_n")
    )
    chi = (
        cells.join(mx, ["_sub", "_obj", "_x"])
        .join(my, ["_sub", "_obj", "_y"])
        .join(F.broadcast(tot.select("_sub", "_obj", "_n")), ["_sub", "_obj"])
        .select(
            "_sub",
            "_obj",
            F.round(F.lit(scale) * term).cast("long").alias("_u"),
        )
        .groupBy("_sub", "_obj")
        .agg(F.sum("_u").cast("bigint").alias("_chi_obs_u"))
    )
    s = float(scale)
    mindof = F.least(F.col("_rx") - 1, F.col("_ry") - 1)
    return (
        tot.join(chi, ["_sub", "_obj"])
        .join(F.broadcast(levels), ["_sub", "_obj"])
        .withColumn("_chi_u", F.col("_chi_obs_u") + F.col("_n") * F.lit(scale))
        .select(
            F.col("_sub").alias("subject"),
            F.col("_obj").alias("object"),
            F.col("_n").alias("n_rows"),
            "n_cells",
            F.col("_rx").alias("n_levels_subject"),
            F.col("_ry").alias("n_levels_object"),
            ((F.col("_rx") - 1) * (F.col("_ry") - 1)).cast("bigint").alias("dof"),
            (F.col("_chi_u").cast("double") / s).alias("chi2"),
            F.when(
                mindof > 0,
                F.sqrt(
                    (F.col("_chi_u").cast("double") / s)
                    / (F.col("_n") * mindof).cast("double")
                ),
            ).alias("cramers_v"),
        )
        .orderBy("subject", "object")
    )


#: cumulative Poisson(1) CDF literals for the deterministic bootstrap —
#: embedded identically in the SQL twin (the qo0 analytic-literal
#: stance); resample weights clamp at 9 (P ≈ 1e-7 at n→∞ per row-draw).
_POISSON1_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
    "0.999405815182418",
    "0.9999167588507119",
    "0.9999897508033253",
    "0.9999988805191155",
)


def poisson_bootstrap_ci(
    df: DataFrame,
    id_col: str,
    val_col: str,
    *,
    b: int = 100,
    unit_scale: int = 100,
    lo_bp: int = 250,
    hi_bp: int = 9750,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic Poisson bootstrap confidence interval for the mean
    — the at-scale bootstrap (per-row resample weights ~ Poisson(1),
    the streaming/MapReduce classic) made REPRODUCIBLE: the weight of
    row i in resample r comes from ``xxhash64(id, r)`` mapped to a
    uniform and inverted through Poisson(1) CDF literals, so there is
    no RNG anywhere, both engines draw the identical resamples, and the
    CI is an exact artifact of (data, b) — rerunnable byte-for-byte on
    any engine (``new Date()``-class nondeterminism is exactly what the
    repo bans).

    One ×b explode + one (resample) aggregate: values quantize to
    BIGINT units (the cents stance), each resample's mean is ONE double
    division of two exact BIGINTs, and the CI bounds are order
    statistics of the b means (ceil-index convention:
    idx = ⌈q·b⌉, 1-based) picked by a window over the b-ROW frame (the
    k-row discipline — b is a constant, never data). NULL ``val_col``
    rows are dropped up front so the CI and the point estimate describe
    the same population (a NULL row must not carry resample weight).
    Returns one row:
    (n_rows, mean_units, ci_lo_mean_units, ci_hi_mean_units, b).

    Scale shape: work is b·|rows| map-side with a b-row reduce — at
    100 TB pick b to taste and the explode pipelines inside the scan;
    there is no resample materialization and no driver-side data."""
    from pyspark.sql import Window

    if hash_fn == "md5":
        # engine-portable lane (the q29/q30 md5-lane stance): DuckDB
        # replays conv(substr(md5(...))) bit-for-bit; id and r render
        # to the same decimal strings on both engines
        from alaska_etl_spark.operators.dedup import md5_hash60

        u = md5_hash60(
            F.concat_ws("_", F.col(id_col), F.col("_r"))
        ) / F.lit(float(1 << 60))
    else:
        u = (
            F.pmod(F.xxhash64(F.col(id_col), F.col("_r")), F.lit(1 << 53))
            / F.lit(float(1 << 53))
        )
    w = F.lit(9)
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(float(_POISSON1_CDF[k])), F.lit(k)).otherwise(w)
    df = df.filter(F.col(val_col).isNotNull())
    drawn = (
        df.select(
            F.col(id_col).alias(id_col),
            F.round(F.col(val_col) * F.lit(unit_scale)).cast("bigint").alias("_v"),
        )
        .select("*", F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("_r"))
        .select("_r", w.alias("_w"), "_v")
    )
    means = drawn.groupBy("_r").agg(
        F.sum(F.col("_w") * F.col("_v")).cast("bigint").alias("_wv"),
        F.sum("_w").cast("bigint").alias("_wn"),
    ).select(
        "_r",
        (F.col("_wv").cast("double") / F.col("_wn")).alias("_mean"),
    )
    wr = Window.orderBy(F.col("_mean").asc(), F.col("_r").asc())
    ranked = means.select("_mean", F.row_number().over(wr).alias("_rk"))
    idx_lo = max(1, -(-lo_bp * b // 10**4))  # ceil
    idx_hi = max(1, -(-hi_bp * b // 10**4))
    base = df.agg(
        F.count(val_col).cast("bigint").alias("n_rows"),
        F.coalesce(F.sum(F.round(F.col(val_col) * F.lit(unit_scale)).cast("bigint")), F.lit(0))
        .cast("bigint")
        .alias("_sv"),
    )
    return (
        base.crossJoin(
            ranked.filter(F.col("_rk") == idx_lo).select(
                F.col("_mean").alias("ci_lo_mean_units")
            )
        )
        .crossJoin(
            ranked.filter(F.col("_rk") == idx_hi).select(
                F.col("_mean").alias("ci_hi_mean_units")
            )
        )
        .select(
            "n_rows",
            (F.col("_sv").cast("double") / F.col("n_rows")).alias("mean_units"),
            "ci_lo_mean_units",
            "ci_hi_mean_units",
            F.lit(b).cast("bigint").alias("b"),
        )
    )


def eta_squared(
    df: DataFrame,
    group_col: str,
    val_col: str,
    *,
    unit_scale: int = 100,
) -> DataFrame:
    """One-way ANOVA effect size η² = SS_between / SS_total for a
    numeric column against a categorical one — the third axis of the
    association triptych (corr_matrix: num~num; categorical MI /
    Cramér's V: cat~cat; this: num~cat), i.e. "how much of the value's
    variance does the grouping explain", the feature-screening number
    a mixed-type dataset card needs.

    Exact-integer protocol, CENTERED: values quantize to BIGINT units
    and shift by the global integer mean m = S div n before any
    squaring — the raw Σ(S_g²/n_g) form needs 128-bit QUOTIENTS, and
    an integer division whose quotient exceeds 2⁶³ silently wraps on
    the Spark decimal ``div`` (measured: negative SS_between at sf0.001
    — caught by the cross-engine gate). After centering, every
    division is variance-scale: D_g² div n_g and (Σd)² div n, all
    < 2⁶³ for any realistic corpus, while the SUMS (Σd² and the
    per-group squares) ride exact decimal(38,0)/HUGEINT. Floor-div at
    cent² resolution is a relative error ≤1e-15 here, identical on
    both engines. Envelope: |Σ units| < 2⁶³ (≈10¹⁷ currency units), and
    Σ units must be NON-NEGATIVE (Spark's decimal ``div`` truncates
    toward zero while SQL ``//`` floors — they agree only where the
    dividend is non-negative, which covers the squares by construction
    and the mean via this documented input constraint).

    NULL groups count as their own level (sentinel, the MI stance);
    NULL values are excluded. Returns one row: (n_rows, n_groups,
    ss_between_units, ss_total_units, eta_sq)."""
    units = F.round(F.col(val_col) * F.lit(unit_scale)).cast("bigint")
    raw = df.select(
        F.coalesce(F.col(group_col).cast("string"), F.lit("\x00null")).alias("_g"),
        units.alias("_v"),
    ).filter(F.col("_v").isNotNull())
    m = raw.agg(
        F.expr("sum(_v) div count(1)").cast("bigint").alias("_m"),
    )
    base = raw.crossJoin(F.broadcast(m)).select(
        "_g", (F.col("_v") - F.col("_m")).cast("bigint").alias("_d")
    )
    per_g = base.groupBy("_g").agg(
        F.sum("_d").cast("bigint").alias("_dg"),
        F.count(F.lit(1)).cast("bigint").alias("_ng"),
    )
    terms = per_g.agg(
        F.sum(
            F.expr("(cast(_dg as decimal(38,0)) * _dg) div _ng")
        ).cast("bigint").alias("_braw"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
    )
    tot = base.agg(
        F.sum("_d").cast("bigint").alias("_sd"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.expr("cast(sum(cast(_d as decimal(38,0)) * _d) as decimal(38,0))")
        .alias("_sdd"),
    )
    corr = F.expr("(cast(_sd as decimal(38,0)) * _sd) div n_rows")
    return (
        tot.crossJoin(terms)
        .select(
            "n_rows",
            "n_groups",
            (F.col("_braw") - corr).cast("decimal(38,0)").alias("_ssb"),
            (F.col("_sdd") - corr).cast("decimal(38,0)").alias("_sst"),
        )
        .select(
            "n_rows",
            "n_groups",
            F.col("_ssb").cast("double").alias("ss_between_units"),
            F.col("_sst").cast("double").alias("ss_total_units"),
            F.when(
                F.col("_sst") != 0,
                F.col("_ssb").cast("double") / F.col("_sst").cast("double"),
            ).alias("eta_sq"),
        )
    )


def split_conformal(
    df: DataFrame,
    id_col: str,
    group_col: str,
    val_col: str,
    *,
    alpha_bp: int = 1000,
    unit_scale: int = 100,
    seed: int = 0,
) -> DataFrame:
    """Split-conformal prediction interval — distribution-free
    uncertainty with finite-sample coverage: deterministically split by
    the id hash (``hash_split``: same id + seed → same split on any
    engine), fit the simplest predictor on TRAIN (per-group mean,
    half-up units), take absolute residuals on CALIB, and the interval
    half-width q̂ is the ⌈(n_c+1)·(1−α)⌉-th smallest calibration
    residual — guaranteed ≥(1−α) coverage for exchangeable data. The
    EVAL split then reports the empirical coverage, so the guarantee is
    measured, not asserted.

    Everything is exact integers: values and predictions in BIGINT
    units, residuals integer absolute differences, and q̂ an order
    statistic read off the residual VALUE-COUNT table (one window
    cumsum over distinct residuals — never a data-wide sort). Rows
    whose group never appears in TRAIN have no prediction and are
    excluded from calib/eval (reported via the count columns). Returns
    one row: (n_train, n_calib, n_eval, alpha_bp, q_hat_units,
    n_covered, coverage_bp)."""
    from pyspark.sql import Window

    from alaska_etl_spark.cache import tracked_persist
    from alaska_etl_spark.functions.fixedpoint import div_half_up
    from alaska_etl_spark.operators.splits import hash_split

    units = F.round(F.col(val_col) * F.lit(unit_scale)).cast("bigint")
    base = hash_split(
        df.select(
            F.col(id_col).alias("_id"),
            F.coalesce(F.col(group_col).cast("string"), F.lit("\x00null")).alias("_g"),
            units.alias("_v"),
        ).filter(F.col("_v").isNotNull()),
        "_id",
        weights={"train": 0.5, "calib": 0.25, "eval": 0.25},
        seed=seed,
        split_col="_sp",
    )
    base = tracked_persist(base)
    pred = (
        base.filter(F.col("_sp") == "train")
        .groupBy("_g")
        .agg(
            F.sum("_v").cast("bigint").alias("_sg"),
            F.count(F.lit(1)).cast("bigint").alias("_ng"),
        )
        .select("_g", div_half_up("_sg", "_ng").alias("_pred"))
    )
    scored = base.filter(F.col("_sp") != "train").join(pred, "_g").select(
        "_sp", F.abs(F.col("_v") - F.col("_pred")).cast("bigint").alias("_r")
    )
    scored = tracked_persist(scored)
    calib = scored.filter(F.col("_sp") == "calib")
    counts = calib.groupBy("_r").agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    wc = Window.orderBy("_r").rowsBetween(Window.unboundedPreceding, 0)
    n_c = calib.agg(F.count(F.lit(1)).cast("bigint").alias("n_calib"))
    # idx = ceil((n_c + 1) * (1 - alpha)) = ((n_c + 1) * (10^4 - alpha_bp)
    #       + 10^4 - 1) div 10^4, clamped to n_c
    qhat = (
        counts.withColumn("_cum", F.sum("_c").over(wc).cast("bigint"))
        .crossJoin(F.broadcast(n_c))
        .withColumn(
            "_idx",
            F.least(
                F.expr(
                    f"((n_calib + 1) * ({10**4} - {alpha_bp}) + {10**4} - 1)"
                    f" div {10**4}"
                ),
                F.col("n_calib"),
            ),
        )
        .filter(F.col("_cum") >= F.col("_idx"))
        .agg(F.min("_r").cast("bigint").alias("q_hat_units"))
    )
    ev = scored.filter(F.col("_sp") == "eval")
    out = (
        base.agg(
            F.coalesce(
                F.sum(F.when(F.col("_sp") == "train", 1).otherwise(0)), F.lit(0)
            )
            .cast("bigint")
            .alias("n_train")
        )
        .crossJoin(F.broadcast(n_c))
        .crossJoin(F.broadcast(qhat))
        .crossJoin(
            F.broadcast(
                ev.crossJoin(F.broadcast(qhat.select(F.col("q_hat_units").alias("_q"))))
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_eval"),
                    F.sum(F.when(F.col("_r") <= F.col("_q"), 1).otherwise(0))
                    .cast("bigint")
                    .alias("n_covered"),
                )
            )
        )
    )
    return out.select(
        "n_train",
        "n_calib",
        "n_eval",
        F.lit(alpha_bp).cast("bigint").alias("alpha_bp"),
        "q_hat_units",
        "n_covered",
        div_half_up("10000 * n_covered", "nullif(n_eval, 0)").alias("coverage_bp"),
    )
