"""Single-pass exact-moment correlation matrix (operators/stats.py)."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from alaska_etl_spark.operators.stats import corr_matrix


def test_perfect_and_anti_correlation(spark):
    rows = [(float(i), float(2 * i), float(-3 * i)) for i in range(1, 50)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = {(r.col_a, r.col_b): r.corr for r in corr_matrix(df, ["x", "y", "z"]).collect()}
    assert got[("x", "y")] == 1.0
    assert got[("x", "z")] == -1.0
    assert got[("y", "z")] == -1.0


def test_matches_numpy_corrcoef(spark):
    # deterministic pseudo-random 2-decimal data
    xs = [round(((i * 97) % 53) / 100 + i * 0.01, 2) for i in range(500)]
    ys = [round(((i * 31) % 89) / 100 - i * 0.005, 2) for i in range(500)]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    [r] = corr_matrix(df, ["x", "y"]).collect()
    want = np.corrcoef(xs, ys)[0, 1]
    assert abs(r.corr - round(want, 4)) <= 1e-4


def test_zero_variance_yields_null_not_error(spark):
    df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0)], "x double, y double")
    [r] = corr_matrix(df, ["x", "y"]).collect()
    assert r.corr is None


def test_single_pass_with_partial_aggregation(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 100 / 100).alias("x"), (F.col("id") % 7 / 7).alias("y")
    )
    out = corr_matrix(df, ["x", "y"])
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "partial_count" in final or "partial_sum" in final
    # the input is aggregated exactly once: one partial/final pair
    assert final.count("HashAggregate") <= 2 or final.count("SortAggregate") <= 2


# --- grouped OLS ------------------------------------------------------------


def test_linreg_recovers_known_line(spark):
    from alaska_etl_spark.operators.stats import grouped_linreg

    # y = 2.5x + 7 exactly, two groups with different lines
    rows = [("a", float(i), round(2.5 * i + 7, 2)) for i in range(1, 40)]
    rows += [("b", float(i), round(-1.25 * i + 3, 2)) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in grouped_linreg(df, ["g"], "x", "y").collect()}
    assert got["a"].slope == 2.5 and got["a"].intercept == 7.0 and got["a"].r2 == 1.0
    assert got["b"].slope == -1.25 and got["b"].intercept == 3.0 and got["b"].r2 == 1.0


def test_linreg_matches_numpy_polyfit(spark):
    from alaska_etl_spark.operators.stats import grouped_linreg

    xs = [round((i * 13 % 41) / 4 + 1, 2) for i in range(300)]
    ys = [round(0.8 * x + 2 + ((i * 7) % 11 - 5) / 10, 2) for i, x in enumerate(xs)]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, x double, y double"
    )
    [r] = grouped_linreg(df, ["g"], "x", "y").collect()
    slope, intercept = np.polyfit(xs, ys, 1)
    assert abs(r.slope - slope) < 1e-4 and abs(r.intercept - intercept) < 1e-4


def test_linreg_zero_x_variance_is_null(spark):
    from alaska_etl_spark.operators.stats import grouped_linreg

    df = spark.createDataFrame(
        [("g", 2.0, 1.0), ("g", 2.0, 9.0)], "g string, x double, y double"
    )
    [r] = grouped_linreg(df, ["g"], "x", "y").collect()
    assert r.slope is None and r.intercept is None and r.r2 is None


def test_ab_test_report_detects_planted_effect(spark):
    """Arm with a planted 5x conversion lift comes out significant; the
    same data with symmetric conversion does not."""
    from alaska_etl_spark.operators.splits import hash_split
    from alaska_etl_spark.operators.stats import ab_test_report

    users = list(range(400))
    base = spark.createDataFrame([(u,) for u in users], "user_id bigint")
    arms = {r.user_id: r.v for r in hash_split(
        base, "user_id", weights={"A": 0.5, "B": 0.5}, split_col="v").collect()}

    rows = [(u, "view") for u in users]
    # planted effect: A converts at ~60%, B at ~10% (deterministic picks)
    rows += [(u, "purchase") for u in users if arms[u] == "A" and u % 5 != 0]
    rows += [(u, "purchase") for u in users if arms[u] == "B" and u % 10 == 0]
    ev = spark.createDataFrame(rows, "user_id bigint, event_type string")
    out = ab_test_report(
        ev, "user_id", "event_type",
        exposure_event="view", conversion_event="purchase",
    ).collect()[0]
    assert out.n_a + out.n_b == 400
    assert out.cvr_a > out.cvr_b
    assert out.significant and out.z > 1.96

    # symmetric conversion (same deterministic rule in both arms)
    rows2 = [(u, "view") for u in users] + [
        (u, "purchase") for u in users if u % 5 == 0
    ]
    ev2 = spark.createDataFrame(rows2, "user_id bigint, event_type string")
    out2 = ab_test_report(
        ev2, "user_id", "event_type",
        exposure_event="view", conversion_event="purchase",
    ).collect()[0]
    assert not out2.significant


def test_cuped_reduces_variance_with_correlated_covariate(spark):
    """With strongly pre/post-correlated users, CUPED reports a large
    variance reduction and pulls the two arms' adjusted means together
    when the raw gap was driven by covariate imbalance."""
    import datetime as dt

    from alaska_etl_spark.operators.stats import cuped_adjustment

    pre_day = dt.datetime(2024, 1, 5)
    post_day = dt.datetime(2024, 1, 20)
    rows = []
    for u in range(200):
        base = 10.0 + (u % 17)  # user-level propensity
        rows.append((u, pre_day, base))            # pre-period spend
        rows.append((u, post_day, base + 1.0))     # post ≈ pre + 1 (ρ≈1)
    ev = spark.createDataFrame(rows, "user_id bigint, ts timestamp_ntz, value double")
    out = cuped_adjustment(
        ev, "user_id", "ts", "value", cutoff="2024-01-16"
    ).collect()[0]
    assert out.var_reduction_pct > 95.0
    assert abs(out.theta - 1.0) < 0.05
    # adjusted means converge to the true common effect (~ x̄ + 1)
    assert abs(out.mean_a_adj - out.mean_b_adj) < abs(
        out.mean_a_raw - out.mean_b_raw
    ) + 1e-9


def test_ab_test_srm_guard_flags_skewed_assignment(spark):
    """A 300/100 split trips the sample-ratio-mismatch guard; the
    balanced hash split in the planted-effect test does not (checked
    there implicitly — here explicitly on a constructed skew)."""
    from alaska_etl_spark.operators.stats import ab_test_report
    from alaska_etl_spark.operators.splits import hash_split

    users = list(range(1200))
    base = spark.createDataFrame([(u,) for u in users], "user_id bigint")
    arms = {r.user_id: r.v for r in hash_split(
        base, "user_id", weights={"A": 0.5, "B": 0.5}, split_col="v").collect()}
    # drop 2/3 of B's exposures: broken logging on one arm
    a_users = [u for u in users if arms[u] == "A"]
    b_users = [u for u in users if arms[u] == "B"][:: 3]
    rows = [(u, "view") for u in a_users + b_users]
    rows += [(u, "purchase") for u in (a_users + b_users) if u % 4 == 0]
    ev = spark.createDataFrame(rows, "user_id bigint, event_type string")
    out = ab_test_report(
        ev, "user_id", "event_type",
        exposure_event="view", conversion_event="purchase",
    ).collect()[0]
    assert out.srm_suspect and out.srm_chi2 > 3.84

    balanced = spark.createDataFrame(
        [(u, "view") for u in users], "user_id bigint, event_type string"
    )
    out2 = ab_test_report(
        balanced, "user_id", "event_type",
        exposure_event="view", conversion_event="purchase",
    ).collect()[0]
    assert not out2.srm_suspect


def test_psi_drift_detects_shift_and_accepts_stability(spark):
    import datetime as dt

    from alaska_etl_spark.operators.stats import psi_drift

    pre, post = dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 20)
    # stable: identical distributions either side of the cutoff
    stable = [(pre, float(10 + (i % 20))) for i in range(400)] + [
        (post, float(10 + (i % 20))) for i in range(400)
    ]
    df = spark.createDataFrame(stable, "ts timestamp_ntz, value double")
    out = psi_drift(df, "ts", "value", cutoff="2024-01-16").collect()[0]
    assert out.n_ref == 400 and out.n_cur == 400
    assert out.psi < 0.01 and not out.drifted

    # shifted: the current period moves to a disjoint value band
    shifted = [(pre, float(10 + (i % 20))) for i in range(400)] + [
        (post, float(60 + (i % 20))) for i in range(400)
    ]
    df2 = spark.createDataFrame(shifted, "ts timestamp_ntz, value double")
    out2 = psi_drift(df2, "ts", "value", cutoff="2024-01-16").collect()[0]
    assert out2.psi > 1.0 and out2.drifted


def test_spearman_perfect_monotone_and_inverse(spark):
    from alaska_etl_spark.operators.stats import spearman_corr

    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0), (3.0, 25.0), (4.0, 100.0)], "x double, y double"
    )
    r = spearman_corr(df, "x", "y").collect()[0]
    assert (r.n, r.rho) == (4, 1.0)  # any monotone map is rho=1
    df2 = spark.createDataFrame(
        [(1.0, 100.0), (2.0, 25.0), (3.0, 20.0), (4.0, 10.0)], "x double, y double"
    )
    assert spearman_corr(df2, "x", "y").collect()[0].rho == -1.0


def test_spearman_ties_match_scipy_formula_replica(spark):
    import math
    import random

    from alaska_etl_spark.operators.stats import spearman_corr

    rng = random.Random(13)
    rows = [(float(rng.randint(0, 8)), float(rng.randint(0, 8))) for _ in range(150)]
    r = spearman_corr(spark.createDataFrame(rows, "x double, y double"), "x", "y").collect()[0]

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            mr = (i + j) / 2 + 1
            for t in range(i, j + 1):
                ranks[order[t]] = mr
            i = j + 1
        return ranks

    xs, ys = [a for a, _ in rows], [b for _, b in rows]
    rx, ry = midranks(xs), midranks(ys)
    n = len(rows)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(sum((a - mx) ** 2 for a in rx)) * math.sqrt(
        sum((b - my) ** 2 for b in ry)
    )
    assert abs(r.rho - num / den) < 2e-6


def test_spearman_constant_margin_is_null(spark):
    from alaska_etl_spark.operators.stats import spearman_corr

    df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0)], "x double, y double")
    assert spearman_corr(df, "x", "y").collect()[0].rho is None


def test_benford_audit_replica_and_all_digits(spark):
    import math
    import random

    from alaska_etl_spark.operators.stats import benford_audit

    rng = random.Random(17)
    # log-uniform values ARE Benford-ish; also include zeros/negatives to
    # check filtering
    vals = [10 ** rng.uniform(0, 4) for _ in range(400)] + [0.0, -5.0]
    df = spark.createDataFrame([(v,) for v in vals], "amount double")
    out = benford_audit(df, "amount").collect()
    assert [r.digit for r in out] == list(range(1, 10))
    # replica
    cents = [round(v * 100) for v in vals if round(v * 100) > 0]
    n = len(cents)
    from collections import Counter

    obs = Counter(int(str(c)[0]) for c in cents)
    for r in out:
        assert r.observed == obs.get(r.digit, 0)
        p_units = round(
            1e9 * (math.log(r.digit + 1) - math.log(r.digit)) / math.log(10.0)
        )
        assert r.expected_share == p_units / 1e9
        diff = r.observed * 10**9 - n * p_units
        want = round(float(diff) * float(diff) / float(n * p_units) / 1e9, 6)
        assert r.chi2_term == want
    # a Benford-ish sample: digit 1 most common, 9 least
    assert obs[1] > obs[9]


def test_benford_audit_missing_digit_contributes_full_distance(spark):
    from alaska_etl_spark.operators.stats import benford_audit

    # all values start with digit 5 -> digits 1-4, 6-9 observed 0 but present
    df = spark.createDataFrame([(5.0,), (55.5,), (500.0,)], "amount double")
    out = {r.digit: r for r in benford_audit(df, "amount").collect()}
    assert out[5].observed == 3
    assert all(out[d].observed == 0 for d in range(1, 10) if d != 5)
    assert all(out[d].chi2_term > 0 for d in range(1, 10) if d != 5)


def test_diff_in_diff_recovers_seeded_effect(spark):
    from datetime import datetime

    from alaska_etl_spark.operators.splits import hash_bucket
    from alaska_etl_spark.operators.stats import diff_in_diff
    from pyspark.sql import functions as F

    # build panel data whose treated units get +5.0 post-cutoff; the
    # treatment flag must match the operator's own hash assignment
    pre, post = datetime(2024, 1, 10), datetime(2024, 1, 20)
    units = spark.createDataFrame([(u,) for u in range(40)], "u bigint")
    is_t = {
        r.u: r.t
        for r in units.select(
            "u", (hash_bucket(F.col("u")) < 500000).alias("t")
        ).collect()
    }
    rows = []
    eid = 0
    for u in range(40):
        for ts, bump in ((pre, 0.0), (post, 5.0 if is_t[u] else 0.0)):
            rows.append((eid, ts, u, 10.0 + bump))
            eid += 1
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id bigint, value double")
    r = diff_in_diff(df, "user_id", "ts", "value", cutoff="2024-01-16 00:00:00").collect()[0]
    n_t = sum(is_t.values())
    assert (r.n_treat_pre, r.n_treat_post) == (n_t, n_t)
    assert (r.n_ctrl_pre, r.n_ctrl_post) == (40 - n_t, 40 - n_t)
    assert r.mean_treat_pre == 10.0 and r.mean_treat_post == 15.0
    assert r.mean_ctrl_pre == 10.0 and r.mean_ctrl_post == 10.0
    assert r.did == 5.0


def test_diff_in_diff_empty_cell_is_null(spark):
    from datetime import datetime

    from alaska_etl_spark.operators.stats import diff_in_diff

    # only post-period data: pre cells empty -> NULL means and NULL did
    rows = [(0, datetime(2024, 1, 20), 1, 3.0), (1, datetime(2024, 1, 21), 2, 4.0)]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id bigint, value double")
    r = diff_in_diff(df, "user_id", "ts", "value", cutoff="2024-01-16 00:00:00").collect()[0]
    assert r.n_treat_pre == 0 and r.n_ctrl_pre == 0
    assert r.mean_treat_pre is None and r.did is None


def test_cohens_kappa_textbook_binary(spark):
    from alaska_etl_spark.operators.stats import cohens_kappa

    # classic 2x2: a=20 both-yes, b=5 yes/no, c=10 no/yes, d=15 both-no
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5 + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "label string, pred string")
    r = cohens_kappa(df, "label", "pred").collect()[0]
    n, a = 50, 35
    pe = 25 * 30 + 25 * 20  # row_y*col_y + row_n*col_n
    assert (r.n, r.n_agree) == (n, a)
    assert (r.num, r.den) == (n * a - pe, n * n - pe)
    assert r.kappa == (n * a - pe) / (n * n - pe)


def test_cohens_kappa_perfect_and_degenerate(spark):
    from alaska_etl_spark.operators.stats import cohens_kappa

    perfect = spark.createDataFrame(
        [("a", "a")] * 3 + [("b", "b")] * 2, "label string, pred string"
    )
    assert cohens_kappa(perfect, "label", "pred").collect()[0].kappa == 1.0
    # single class on both sides: pe = n^2 -> den 0 -> NULL kappa
    degen = spark.createDataFrame([("a", "a")] * 4, "label string, pred string")
    r = cohens_kappa(degen, "label", "pred").collect()[0]
    assert r.den == 0 and r.kappa is None


def test_cohens_kappa_disjoint_label_sets(spark):
    from alaska_etl_spark.operators.stats import cohens_kappa

    # predictions never overlap labels: agreement 0, pe 0 -> kappa 0
    df = spark.createDataFrame(
        [("a", "x"), ("b", "y"), ("a", "y")], "label string, pred string"
    )
    r = cohens_kappa(df, "label", "pred").collect()[0]
    assert (r.n_agree, r.num, r.den) == (0, 0, 9)
    assert r.kappa == 0.0


def test_km_survival_textbook_with_censoring(spark):
    import math

    from alaska_etl_spark.operators.stats import km_survival

    # durations/events: t=1 d=2 of n=10; censored at 2 (x1); t=3 d=1 of
    # n=7; censored at 4 (x1); t=5 d=2 of n=5
    rows = (
        [(1, 1)] * 2 + [(2, 0)] + [(3, 1)] + [(4, 0)] + [(5, 1)] * 2
        + [(6, 0)] * 3
    )
    df = spark.createDataFrame(rows, "dur bigint, ev int")
    out = {r.t: r for r in km_survival(df, "dur", "ev").collect()}
    assert set(out) == {1, 3, 5}
    assert (out[1].n_risk, out[1].d_events) == (10, 2)
    assert (out[3].n_risk, out[3].d_events) == (7, 1)
    assert (out[5].n_risk, out[5].d_events) == (5, 2)
    t1 = round(math.log(8 / 10) * 1e9)
    t3 = round(math.log(6 / 7) * 1e9)
    t5 = round(math.log(3 / 5) * 1e9)
    assert out[1].survival_lnano == t1
    assert out[3].survival_lnano == t1 + t3
    assert out[5].survival_lnano == t1 + t3 + t5


def test_km_survival_risk_set_exhausted_goes_null(spark):
    from alaska_etl_spark.operators.stats import km_survival

    # everyone churns at t=2: survival hits exactly 0 -> NULL lnano
    rows = [(1, 1), (2, 1), (2, 1)]
    df = spark.createDataFrame(rows, "dur bigint, ev int")
    out = {r.t: r for r in km_survival(df, "dur", "ev").collect()}
    assert out[1].survival_lnano is not None
    assert (out[2].n_risk, out[2].d_events) == (2, 2)
    assert out[2].survival_lnano is None


def test_grouped_weighted_median_exact(spark):
    from alaska_etl_spark.operators.stats import grouped_weighted_median

    # group g: values 100(w3), 200(w1), 300(w2): tw=6, half=3 ->
    # first value whose cumw*2 >= 6 is 100 (cumw 3)
    rows = [("g", 100, 3), ("g", 200, 1), ("g", 300, 2),
            ("h", 10, 1), ("h", 20, 9)]
    df = spark.createDataFrame(rows, "grp string, v bigint, w bigint")
    out = {r.grp: r for r in grouped_weighted_median(df, ["grp"], "v", "w").collect()}
    assert (out["g"].total_weight, out["g"].weighted_median_cents) == (6, 100)
    # group h: half of 10 is 5; cumw at 10 is 1 (<5) -> median 20
    assert out["h"].weighted_median_cents == 20


def test_grouped_weighted_median_matches_bruteforce(spark):
    from alaska_etl_spark.operators.stats import grouped_weighted_median

    rows = [
        ("g", int((i * 37) % 11) * 10, (i * 13) % 5 + 1) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "grp string, v bigint, w bigint")
    expanded = sorted(v for _, v, w in rows for _ in range(w))
    tw = len(expanded)
    # lower weighted median: smallest v with cum >= tw/2
    cum = 0
    exp = None
    for v in expanded:
        cum += 1
        if 2 * cum >= tw:
            exp = v
            break
    r = grouped_weighted_median(df, ["grp"], "v", "w").collect()[0]
    assert r.weighted_median_cents == exp and r.total_weight == tw


def test_conformal_threshold_exact_order_statistic(spark):
    from alaska_etl_spark.operators.stats import conformal_threshold

    # n=9, alpha=0.1: k = ceil(0.9*10) = 9 -> max value (attainable: 9<=9)
    rows = [("g", i, (i * 7) % 100) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "grp string, id bigint, v bigint")
    r = conformal_threshold(df, ["grp"], "v", "id").collect()[0]
    assert (r.n, r.k) == (9, 9)
    assert r.threshold_cents == max(v for _, _, v in rows)
    assert bool(r.attainable)
    # n=4, alpha=0.5 -> k = ceil(0.5*5) = 3 -> 3rd smallest
    rows2 = [("g", i, v) for i, v in enumerate([40, 10, 30, 20])]
    df2 = spark.createDataFrame(rows2, "grp string, id bigint, v bigint")
    r2 = conformal_threshold(df2, ["grp"], "v", "id", alpha_num=1, alpha_den=2).collect()[0]
    assert (r2.n, r2.k, r2.threshold_cents) == (4, 3, 30)


def test_conformal_threshold_unattainable_small_n(spark):
    from alaska_etl_spark.operators.stats import conformal_threshold

    # n=3, alpha=0.1: k = ceil(0.9*4) = 4 > n -> clamp to max, flagged
    rows = [("g", i, v) for i, v in enumerate([5, 1, 3])]
    df = spark.createDataFrame(rows, "grp string, id bigint, v bigint")
    r = conformal_threshold(df, ["grp"], "v", "id").collect()[0]
    assert (r.n, r.k, r.threshold_cents) == (3, 3, 5)
    assert not bool(r.attainable)


def test_conformal_threshold_ties_share_value(spark):
    from alaska_etl_spark.operators.stats import conformal_threshold

    rows = [("g", i, 7) for i in range(10)]
    df = spark.createDataFrame(rows, "grp string, id bigint, v bigint")
    r = conformal_threshold(df, ["grp"], "v", "id").collect()[0]
    assert r.threshold_cents == 7


def test_anova_oneway_matches_textbook(spark):
    from alaska_etl_spark.operators.stats import anova_oneway

    # groups with clearly different means
    data = {"a": [1, 2, 3], "b": [10, 11, 12], "c": [5, 5, 5]}
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "grp string, v bigint")
    r = anova_oneway(df, "grp", "v").collect()[0]
    vals = [v for vs in data.values() for v in vs]
    mean = sum(vals) / len(vals)
    ssb = sum(len(vs) * (sum(vs) / len(vs) - mean) ** 2 for vs in data.values())
    ssw = sum((v - sum(vs) / len(vs)) ** 2 for vs in data.values() for v in vs)
    assert (r.k_groups, r.n) == (3, 9)
    assert abs(r.ssb_x100 / 100 - ssb) <= 0.02
    assert abs(r.ssw_x100 / 100 - ssw) <= 0.02
    f_exp = (ssb / 2) / (ssw / 6)
    assert abs(r.f_stat - f_exp) < 1e-3


def test_anova_oneway_degenerate_cases(spark):
    from alaska_etl_spark.operators.stats import anova_oneway

    # single group -> NULL F
    df1 = spark.createDataFrame([("a", v) for v in (1, 2, 3)], "grp string, v bigint")
    assert anova_oneway(df1, "grp", "v").collect()[0].f_stat is None
    # zero within-group variance -> ssw 0 -> NULL F (infinite separation)
    df2 = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 9), ("b", 9)], "grp string, v bigint"
    )
    r = anova_oneway(df2, "grp", "v").collect()[0]
    assert r.ssw_x100 == 0 and r.f_stat is None


def test_uplift_deciles_hand_computed(spark):
    from alaska_etl_spark.operators.stats import uplift_deciles

    # 20 subjects, 2 deciles of 10; scores descending by id so decile 1
    # is ids 1-10. Treatment: even ids; outcome: ids 1-5 and 11-12.
    rows = [
        (i, float(100 - i), 1 if i % 2 == 0 else 0,
         1 if (i <= 5 or i in (11, 12)) else 0)
        for i in range(1, 21)
    ]
    df = spark.createDataFrame(rows, "id bigint, score double, t int, y int")
    out = {r.decile: r for r in uplift_deciles(df, "id", "score", "t", "y", k=2).collect()}
    d1 = out[1]
    # decile 1 = ids 1-10: treated evens {2,4,6,8,10}, conv {2,4}; control odds, conv {1,3,5}
    assert (d1.n_t, d1.conv_t, d1.n_c, d1.conv_c) == (5, 2, 5, 3)
    assert d1.uplift == 2 / 5 - 3 / 5
    assert d1.qini_cum == 2.0 - (3 * 5) / 5
    d2 = out[2]
    # decile 2 = ids 11-20: treated conv {12}, control conv {11}
    assert (d2.n_t, d2.conv_t, d2.n_c, d2.conv_c) == (5, 1, 5, 1)
    assert d2.qini_cum == 3.0 - (4 * 10) / 10


def test_uplift_deciles_one_sided_decile_null(spark):
    from alaska_etl_spark.operators.stats import uplift_deciles

    # all subjects treated: control side empty -> NULL uplift, NULL qini
    rows = [(i, float(i), 1, i % 2) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "id bigint, score double, t int, y int")
    out = uplift_deciles(df, "id", "score", "t", "y", k=2).collect()
    assert all(r.uplift is None and r.qini_cum is None for r in out)


def test_categorical_mutual_info_dependence_extremes(spark):
    """Perfect dependence: MI == H(X) == H(Y); independence: MI == 0
    exactly in the fixed-point units (uniform 2x2 has rational terms).
    NULL counts as its own level."""
    import math

    from alaska_etl_spark.operators.stats import categorical_mutual_info

    # y == x (perfect copy), 2 levels x 2 rows each
    dep = spark.createDataFrame(
        [("a", "a"), ("a", "a"), ("b", "b"), ("b", "b")], "x string, y string"
    )
    r = categorical_mutual_info(dep, [("x", "y")]).collect()[0]
    assert r.n_rows == 4 and r.n_cells == 2
    assert abs(r.mi_nats - math.log(2)) < 1e-6
    assert abs(r.h_subject_nats - math.log(2)) < 1e-6
    assert r.mi_nats == r.h_subject_nats == r.h_object_nats

    # independent uniform 2x2: every cell term ln(4*1/(2*2)) = ln 1 = 0
    ind = spark.createDataFrame(
        [("a", "u"), ("a", "v"), ("b", "u"), ("b", "v")], "x string, y string"
    )
    r2 = categorical_mutual_info(ind, [("x", "y")]).collect()[0]
    assert r2.mi_nats == 0.0 and r2.n_cells == 4

    # NULL level participates IN THE MI SUM, not just the counts: x
    # determines y perfectly here (a->u, NULL->v), so MI == H(X) ==
    # -(1/3 ln 1/3 + 2/3 ln 2/3). Before the sentinel coalesce the
    # null-unsafe margin joins dropped the NULL cells and reported
    # mi_nats = 0.3662 instead (the r8 ADVICE bug).
    withnull = spark.createDataFrame(
        [("a", "u"), (None, "v"), (None, "v")], "x string, y string"
    )
    r3 = categorical_mutual_info(withnull, [("x", "y")]).collect()[0]
    assert r3.n_cells == 2 and r3.n_rows == 3
    h = -(1 / 3 * math.log(1 / 3) + 2 / 3 * math.log(2 / 3))
    assert abs(r3.mi_nats - h) < 1e-6
    assert r3.mi_nats == r3.h_subject_nats
    assert abs(r3.h_object_nats - h) < 1e-6


def test_histogram_profile_bins_and_edges(spark):
    from alaska_etl_spark.operators.stats import histogram_profile

    rows = [(float(v), 5.0) for v in range(11)]  # a: 0..10, b constant
    rows.append((None, None))
    df = spark.createDataFrame(rows, "a double, b double")
    out = histogram_profile(df, ["a", "b"], nbins=10)
    got = {(r.column_name, r.bin): r for r in out.collect()}
    # a: 0..9 land in bins 0..9; v=10 (the max) clamps into bin 9
    assert got[("a", 9)].n == 2
    assert all(got[("a", i)].n == 1 for i in range(9))
    assert got[("a", 0)].lo == 0.0 and got[("a", 9)].hi == 10.0
    # constant column: everything in bin 0, NULLs excluded
    assert got[("b", 0)].n == 11
    assert ("b", 1) not in got


def test_winsorize_report_hand_case(spark):
    from alaska_etl_spark.operators.stats import winsorize_report

    # group g: values 1..100 (cents exact); p01 -> 1, p99 -> 99
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 101)], "grp string, v double"
    )
    r = winsorize_report(df, ["grp"], "v", p_lo=0.01, p_hi=0.99).collect()[0]
    assert (r.n, r.lo, r.hi) == (100, 1.0, 99.0)
    assert (r.n_clip_lo, r.n_clip_hi) == (0, 1)  # only 100 > 99
    assert r.clip_bp == 100  # 1/100 in bp
    assert abs(r.mean_before - 50.5) < 1e-9
    assert abs(r.mean_after - 50.49) < 1e-9  # 100 clipped to 99


def test_ks_two_sample_exact(spark):
    from alaska_etl_spark.operators.stats import ks_two_sample

    # a: 1,2,3,4  b: 3,4,5,6 -> max CDF gap at value 2: |2/4 - 0/4| = .5
    rows = [("a", v) for v in (1.0, 2.0, 3.0, 4.0)] + [
        ("b", v) for v in (3.0, 4.0, 5.0, 6.0)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_two_sample(df, "g", "a", "b", "v").collect()[0]
    assert (r.n_a, r.n_b) == (4, 4)
    assert r.ks_num == 8  # |2*4 - 0*4|
    assert r.ks == 0.5
    # identical samples -> ks 0
    same = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)], "g string, v double"
    )
    assert ks_two_sample(same, "g", "a", "b", "v").collect()[0].ks == 0.0
