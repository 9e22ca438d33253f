"""Round-9 corpus-audit operators: inverted-index build forecast
(X151), boilerplate stop-grams (X152), normalization-fingerprint dedup
(X153), containment span localization (X154), source overlap matrix
(X155), and RFM segmentation (X156). Each test pins exact values on a
hand-computable corpus — the same discipline as the driver's DuckDB
oracles, which cover the sf-scale behavior."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from alaska_etl_spark.operators.dedup import (
    normalized_dedup_report,
    normalized_fingerprint,
    source_overlap_matrix,
)
from alaska_etl_spark.operators.sessions import rfm_segments
from alaska_etl_spark.operators.simjoin import containment_spans
from alaska_etl_spark.operators.skew import index_build_forecast
from alaska_etl_spark.operators.text import boilerplate_grams


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


# ---------------------------------------------------------------------------
# X151 index_build_forecast
# ---------------------------------------------------------------------------


def test_index_forecast_exact_counts(spark):
    # bigrams (n=2): doc 1 "a b c" -> {"a b","b c"}; doc 2 "a b d" ->
    # {"a b","b d"}; doc 3 "x" -> {"x"}  (short doc = whole-token gram)
    df = _docs(spark, [(1, "a b c", "s"), (2, "a b d", "s"), (3, "x", "s")])
    row = index_build_forecast(df, "doc_id", "text", n=2).head(1)[0]
    assert row["n_docs"] == 3
    assert row["vocab_size"] == 4          # "a b","b c","b d","x"
    assert row["n_postings"] == 5
    assert row["max_df"] == 2              # "a b"
    assert row["singleton_grams"] == 3
    assert row["candidate_pairs"] == 1     # only "a b": 2*1/2
    assert row["top_gram_share_bp"] == 10000


def test_index_forecast_no_collisions_null_share(spark):
    df = _docs(spark, [(1, "p q", "s"), (2, "r s", "s")])
    row = index_build_forecast(df, "doc_id", "text", n=2).head(1)[0]
    assert row["candidate_pairs"] == 0
    assert row["top_gram_share_bp"] is None  # 0/0 -> NULL, both engines


# ---------------------------------------------------------------------------
# X152 boilerplate_grams
# ---------------------------------------------------------------------------


def test_boilerplate_threshold_and_top_gram(spark):
    # source s1: 4 docs, every one starts with the same bigram
    # "copyright foo" (df=4 = 100%); "alpha beta" df=1.
    rows = [
        (1, "copyright foo alpha", "s1"),
        (2, "copyright foo beta", "s1"),
        (3, "copyright foo gamma", "s1"),
        (4, "copyright foo alpha beta", "s1"),
    ]
    out = boilerplate_grams(
        _docs(spark, rows), "doc_id", "text", "source", n=2, min_share_bp=5000
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 4
    # grams: copyright-foo df=4, foo-alpha df=2 (docs 1 and 4), foo-beta,
    # foo-gamma, alpha-beta df=1 → vocab 5; boiler at ≥50% of 4 docs =
    # df≥2: copyright-foo AND foo-alpha
    assert r["vocab_size"] == 5
    assert r["boiler_grams"] == 2
    assert r["top_gram"] == "copyright foo"
    assert r["top_gram_df"] == 4
    # postings 4+2+1+1+1 = 9; boiler mass (4+2)/9 → half-up 6667 bp
    assert r["boiler_posting_bp"] == 6667


def test_boilerplate_integer_threshold_edge(spark):
    # df=1 of n_docs=2 at min_share_bp=5000: 1*10000 >= 5000*2 holds
    # (>= is inclusive — the cross-multiplication has no float slack)
    rows = [(1, "a b", "s"), (2, "c d", "s")]
    r = boilerplate_grams(
        _docs(spark, rows), "doc_id", "text", "source", n=2, min_share_bp=5000
    ).head(1)[0]
    assert r["boiler_grams"] == 2


# ---------------------------------------------------------------------------
# X153 normalized_fingerprint / normalized_dedup_report
# ---------------------------------------------------------------------------


def test_normalized_fingerprint_collapses_noise(spark):
    df = spark.createDataFrame(
        [("Hello,  World! 42",), ("hello world 7",), ("different",)],
        "text string",
    )
    got = [r[0] for r in df.select(normalized_fingerprint("text")).collect()]
    assert got[0] == got[1] == "hello world 0"
    assert got[2] == "different"


def test_normalized_dedup_report_gain(spark):
    rows = [
        (1, "The cat.", "s1"),
        (2, "the cat", "s1"),      # norm-dup of 1, not exact-dup
        (3, "the cat", "s1"),      # exact dup of 2
        (4, "a dog", "s1"),
        (5, "bird", "s2"),
    ]
    out = {
        r["source"]: r
        for r in normalized_dedup_report(
            _docs(spark, rows), "doc_id", "text", "source"
        ).collect()
    }
    s1 = out["s1"]
    assert s1["n_docs"] == 4
    assert s1["n_exact_distinct"] == 3
    assert s1["n_norm_distinct"] == 2      # {"the cat", "a dog"}
    assert s1["exact_dupes"] == 1
    assert s1["norm_dupes"] == 2
    assert s1["norm_gain"] == 1
    assert s1["norm_savings_bp"] == 5000
    assert out["s2"]["norm_dupes"] == 0


def test_normalized_dedup_report_corpus_wide(spark):
    rows = [(1, "x y", "a"), (2, "X Y!", "b")]
    r = normalized_dedup_report(_docs(spark, rows), "doc_id", "text").head(1)[0]
    assert r["n_docs"] == 2 and r["n_norm_distinct"] == 1


# ---------------------------------------------------------------------------
# X154 containment_spans
# ---------------------------------------------------------------------------


def test_containment_spans_localizes_quote(spark):
    # src 1 = tokens 4..8 of dst 2 (a verbatim quote); bigrams, tau=1/1
    # (full containment). src shingle seq: 4 bigrams at positions 1-4;
    # in dst they first occur at positions 4-7 of its bigram sequence.
    quote = "q1 q2 q3 q4 q5"
    rows = [
        (1, quote, "s"),
        (2, "w1 w2 w3 " + quote + " w4 w5", "s"),
    ]
    out = containment_spans(
        _docs(spark, rows), "doc_id", "text",
        n=2, threshold_num=1, threshold_den=1,
    ).collect()
    by = {(r["src_id"], r["dst_id"]): r for r in out}
    assert (1, 2) in by
    r = by[(1, 2)]
    assert r["n_shared"] == 4
    assert (r["src_first"], r["src_last"]) == (1, 4)
    assert (r["dst_first"], r["dst_last"]) == (4, 7)
    # the reverse direction fails tau=1 (dst has grams src lacks)
    assert (2, 1) not in by


def test_containment_spans_accepts_precomputed_pairs(spark):
    # r10: a caller who already paid for the containment join can feed
    # its pair frame; the span pass alone must produce the identical
    # frame the self-detecting path does.
    from alaska_etl_spark.operators.simjoin import containment_join

    quote = "q1 q2 q3 q4 q5"
    rows = [
        (1, quote, "s"),
        (2, "w1 w2 w3 " + quote + " w4 w5", "s"),
        (3, "u1 u2 u3 u4", "s"),
    ]
    docs = _docs(spark, rows)
    kw = dict(n=2, threshold_num=1, threshold_den=1)
    full = containment_spans(docs, "doc_id", "text", **kw).collect()
    pre = containment_join(docs, "doc_id", "text", **kw)
    given = containment_spans(docs, "doc_id", "text", pairs=pre, **kw).collect()
    key = lambda r: (r["src_id"], r["dst_id"])  # noqa: E731
    assert sorted(map(tuple, full), key=None) == sorted(map(tuple, given), key=None)
    assert {key(r) for r in full} == {(1, 2)}


# ---------------------------------------------------------------------------
# X155 source_overlap_matrix
# ---------------------------------------------------------------------------


def test_source_overlap_matrix_directional(spark):
    rows = [
        (1, "alpha beta", "a"),
        (2, "gamma", "a"),
        (3, "Alpha,  Beta!", "b"),   # normalized twin of 1
        (4, "delta", "c"),           # no overlap with anyone
    ]
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap_matrix(
            _docs(spark, rows), "doc_id", "text", "source"
        ).collect()
    }
    assert set(out) == {("a", "b"), ("b", "a")}
    assert out[("a", "b")]["n_distinct_a"] == 2
    assert out[("a", "b")]["n_shared"] == 1
    assert out[("a", "b")]["coverage_bp"] == 5000
    assert out[("b", "a")]["coverage_bp"] == 10000


def test_source_overlap_raw_mode_misses_normalized_twin(spark):
    rows = [(1, "alpha beta", "a"), (2, "Alpha,  Beta!", "b")]
    out = source_overlap_matrix(
        _docs(spark, rows), "doc_id", "text", "source", normalized=False
    ).collect()
    assert out == []


# ---------------------------------------------------------------------------
# X156 rfm_segments
# ---------------------------------------------------------------------------


def test_rfm_segments_buckets_and_units(spark):
    ts = lambda d: datetime(2026, 1, d)  # noqa: E731
    rows = [
        # user 1: recent, frequent, big spender -> (1,1,1)
        (1, ts(10), 5.00), (1, ts(10), 5.00), (1, ts(10), 2.50),
        # user 2: old, single, small -> (2,2,2) with k=2
        (2, ts(1), 0.99),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    out = {
        (r["r_bucket"], r["f_bucket"], r["m_bucket"]): r
        for r in rfm_segments(ev, "user_id", "ts", "value", buckets=2).collect()
    }
    assert set(out) == {(1, 1, 1), (2, 2, 2)}
    best = out[(1, 1, 1)]
    assert best["n_users"] == 1
    assert best["total_events"] == 3
    assert best["total_value_units"] == 1250   # exact cents
    assert out[(2, 2, 2)]["total_value_units"] == 99


# ---------------------------------------------------------------------------
# X157 k_core / X158 contingency_effect_sizes / X159 layout_skipping_audit
# ---------------------------------------------------------------------------


def test_k_core_peels_pendant_chain(spark):
    from alaska_etl_spark.operators.graph import k_core

    # triangle 1-2-3 plus pendant path 3-4-5: 2-core = the triangle
    und = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und],
        "src long, dst long",
    )
    out = {r["node"]: r["degree"] for r in k_core(edges, 2, iters=4).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_k_core_sql_twin_matches(spark):
    import duckdb

    from alaska_etl_spark.operators.graph import k_core, k_core_sql

    und = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (4, 6), (5, 6)]
    sym = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "src long, dst long")
    eng = [(r["node"], r["degree"]) for r in k_core(edges, 2, iters=5).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", sym)
    got = con.execute(k_core_sql("SELECT src, dst FROM e", 2, iters=5)).fetchall()
    assert eng == [tuple(r) for r in got]


def test_contingency_perfect_dependence(spark):
    from alaska_etl_spark.operators.stats import contingency_effect_sizes

    # x determines y exactly, 2x2, balanced -> chi2 = n, V = 1
    rows = [("a", "u"), ("a", "u"), ("b", "v"), ("b", "v")] * 5
    df = spark.createDataFrame(rows, "x string, y string")
    r = contingency_effect_sizes(df, [("x", "y")]).head(1)[0]
    assert r["n_rows"] == 20 and r["n_cells"] == 2
    assert r["dof"] == 1
    assert abs(r["chi2"] - 20.0) < 1e-6
    assert abs(r["cramers_v"] - 1.0) < 1e-6


def test_contingency_independence_and_nulls(spark):
    from alaska_etl_spark.operators.stats import contingency_effect_sizes

    # perfectly independent 2x2 -> chi2 = 0; NULL is its own level
    rows = [("a", "u"), ("a", "v"), ("b", "u"), ("b", "v")] * 3
    df = spark.createDataFrame(rows, "x string, y string")
    r = contingency_effect_sizes(df, [("x", "y")]).head(1)[0]
    assert abs(r["chi2"]) < 1e-6 and abs(r["cramers_v"]) < 1e-6
    rows2 = [("a", "u"), (None, "v"), (None, "v")]
    df2 = spark.createDataFrame(rows2, "x string, y string")
    r2 = contingency_effect_sizes(df2, [("x", "y")]).head(1)[0]
    assert r2["n_levels_subject"] == 2  # 'a' and the NULL level
    assert r2["n_cells"] == 2


def test_layout_audit_clustered_beats_shuffled(spark):
    from pyspark.sql import functions as F

    from alaska_etl_spark.operators.layout import layout_skipping_audit

    # probe values 0..9 cycling by row id, written as 10 buckets:
    # clustered-on-v -> each value in exactly 1 file; natural row order
    # -> every file holds one full 0..9 cycle, so every value is in
    # every file
    rows = [(i, i % 10) for i in range(100)]
    df = spark.createDataFrame(rows, "rid long, v long")
    out = {
        r["layout"]: r
        for r in layout_skipping_audit(
            df,
            {"clustered": F.col("v"), "interleaved": F.col("rid")},
            "v",
            n_buckets=10,
        ).collect()
    }
    assert out["clustered"]["files_touched_total"] == 10   # 1 per value
    assert out["clustered"]["avg_files_x100"] == 100
    assert out["clustered"]["skip_bp"] == 9000
    assert out["interleaved"]["files_touched_total"] == 100  # all files
    assert out["interleaved"]["skip_bp"] == 0


# ---------------------------------------------------------------------------
# X160 fellegi_sunter_weights
# ---------------------------------------------------------------------------


def test_fellegi_sunter_weights_exact(spark):
    from alaska_etl_spark.operators.linkage import fellegi_sunter_weights

    import math

    # 8 matches (all agree), 8 non-matches (none agree):
    # m = 9/10, u = 1/10 -> w_agree = log2(9), w_disagree = log2(1/9)
    rows = [(True, True)] * 8 + [(False, False)] * 8
    df = spark.createDataFrame(rows, "is_match boolean, agree_f boolean")
    r = fellegi_sunter_weights(df, "is_match", ["agree_f"]).head(1)[0]
    assert r["n_match"] == 8 and r["n_nonmatch"] == 8
    assert r["m_bp"] == 9000 and r["u_bp"] == 1000
    assert r["w_agree_units"] == round(10**8 * math.log2(9))
    assert r["w_disagree_units"] == round(10**8 * math.log2(1 / 9))


# ---------------------------------------------------------------------------
# X161 poisson_bootstrap_ci
# ---------------------------------------------------------------------------


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from alaska_etl_spark.operators.stats import poisson_bootstrap_ci

    rows = [(i, float(v)) for i, v in enumerate([10, 11, 9, 10, 12, 8, 10, 11, 9, 10] * 10)]
    df = spark.createDataFrame(rows, "rid long, v double")
    r1 = poisson_bootstrap_ci(df, "rid", "v", b=50).head(1)[0]
    r2 = poisson_bootstrap_ci(df, "rid", "v", b=50).head(1)[0]
    assert r1 == r2  # no RNG anywhere
    assert r1["n_rows"] == 100
    assert abs(r1["mean_units"] - 1000.0) < 1e-9
    # a tight, symmetric-ish sample: the CI must bracket the mean
    assert r1["ci_lo_mean_units"] <= r1["mean_units"] <= r1["ci_hi_mean_units"]
    # and be non-degenerate but narrow for this low-variance sample
    width = r1["ci_hi_mean_units"] - r1["ci_lo_mean_units"]
    assert 0 < width < 200


def test_bootstrap_ci_hash_lanes_agree_in_shape(spark):
    from alaska_etl_spark.operators.stats import poisson_bootstrap_ci

    rows = [(i, float(i % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, "rid long, v double")
    a = poisson_bootstrap_ci(df, "rid", "v", b=40, hash_fn="md5").head(1)[0]
    x = poisson_bootstrap_ci(df, "rid", "v", b=40).head(1)[0]
    # different hash lanes draw different resamples but the same data
    # statistics and both bracket the mean
    assert a["n_rows"] == x["n_rows"] == 50
    assert a["mean_units"] == x["mean_units"]
    for r in (a, x):
        assert r["ci_lo_mean_units"] <= r["mean_units"] <= r["ci_hi_mean_units"]


# ---------------------------------------------------------------------------
# X162 eta_squared / X163 split_conformal
# ---------------------------------------------------------------------------


def test_eta_squared_extremes(spark):
    from alaska_etl_spark.operators.stats import eta_squared

    # groups fully determine the value -> eta^2 = 1
    rows = [("a", 10.0)] * 5 + [("b", 20.0)] * 5
    df = spark.createDataFrame(rows, "g string, v double")
    r = eta_squared(df, "g", "v").head(1)[0]
    assert r["n_groups"] == 2 and abs(r["eta_sq"] - 1.0) < 1e-12
    # identical distribution in every group -> eta^2 = 0
    rows = [("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = eta_squared(df, "g", "v").head(1)[0]
    assert abs(r["eta_sq"]) < 1e-12
    # constant value -> SS_total = 0 -> NULL eta (0/0 convention)
    rows = [("a", 5.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    assert eta_squared(df, "g", "v").head(1)[0]["eta_sq"] is None


def test_split_conformal_exact_shape(spark):
    from alaska_etl_spark.operators.stats import split_conformal

    rows = [(i, "g" + str(i % 2), float(100 + (i % 2) * 50 + (i % 5))) for i in range(400)]
    df = spark.createDataFrame(rows, "rid long, g string, v double")
    r = split_conformal(df, "rid", "g", "v", alpha_bp=1000).head(1)[0]
    assert r["n_train"] + r["n_calib"] + r["n_eval"] == 400
    # per-group spread is 4 units of 100ths = 400; q_hat must be within it
    assert 0 <= r["q_hat_units"] <= 400
    # finite-sample guarantee holds on exchangeable synthetic data:
    # empirical coverage should be near (1 - alpha); allow slack for
    # the small eval split
    assert r["coverage_bp"] >= 8000
    # deterministic: same inputs -> same row
    assert split_conformal(df, "rid", "g", "v", alpha_bp=1000).head(1)[0] == r


# ---------------------------------------------------------------------------
# X164 mase_report / X165 sequence_predictability
# ---------------------------------------------------------------------------


def test_mase_perfect_and_naive_forecasts(spark):
    from datetime import datetime

    from alaska_etl_spark.operators.timeseries import mase_report

    ts = lambda i: datetime(2026, 1, 1, i)  # noqa: E731
    # key 'p': forecast == value -> MASE 0; key 'n': forecast == lag-1
    # value -> MASE exactly 1 (same n after the first row drops out of
    # neither sum: sae counts all rows, naive counts n-1 — construct so
    # the first row's forecast error is also 0)
    rows = [("p", ts(i), float(i), float(i)) for i in range(5)]
    rows += [("n", ts(0), 10.0, 10.0)] + [
        ("n", ts(i), float(10 + i), float(10 + i - 1)) for i in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "k string, t timestamp, v double, f double")
    out = {r["k"]: r for r in mase_report(df, "k", "t", "v", "f").collect()}
    assert out["p"]["mase"] == 0.0
    # naive forecast: sae = 4 (unit diffs x4 in cents: 100 each -> 400),
    # snae = 400 over 4 naive steps; n_err = 5, n_naive = 4:
    # mase = (400*4)/(400*5) = 0.8
    assert abs(out["n"]["mase"] - 0.8) < 1e-12
    # single-point series -> NULL mase
    one = spark.createDataFrame(
        [("s", ts(0), 1.0, 2.0)], "k string, t timestamp, v double, f double"
    )
    assert mase_report(one, "k", "t", "v", "f").head(1)[0]["mase"] is None


def test_sequence_predictability_extremes(spark):
    from datetime import datetime

    from alaska_etl_spark.operators.sessions import sequence_predictability

    ts = lambda i: datetime(2026, 1, 1, 0, i)  # noqa: E731
    # deterministic cycle a->b->a->b: H(next|cur) = 0, info gain = H(next)
    rows = [(1, ts(i), "a" if i % 2 == 0 else "b") for i in range(10)]
    df = spark.createDataFrame(rows, "u long, t timestamp, s string")
    r = sequence_predictability(df, "u", ["t"], "s").head(1)[0]
    assert r["n_transitions"] == 9 and r["n_states"] == 2
    assert r["h_cond_units"] == 0
    assert r["info_gain_units"] == r["h_next_units"] > 0
    # memoryless uniform alternation-free: every src goes to both dsts
    # equally -> H(next|cur) == H(next), info gain ~ 0
    rows = [(1, ts(i), s) for i, s in enumerate("aabb" * 5)]
    df = spark.createDataFrame(rows, "u long, t timestamp, s string")
    r = sequence_predictability(df, "u", ["t"], "s").head(1)[0]
    assert abs(r["info_gain_units"]) < 0.02 * 10**9  # near-zero gain


def test_excise_spans_hand_computed(spark):
    # r10 X172: spans in shingle coordinates; n=2 means shingle span
    # [4, 6] covers tokens 4..7; union of overlapping spans; full-doc
    # excision yields '' with n_removed = n_tokens.
    from alaska_etl_spark.operators.simjoin import excise_spans

    docs = spark.createDataFrame(
        [
            (1, "A b c QUOTE1 quote2 quote3 quote4 d e"),
            (2, "x y z"),                # unaffected: not in output
            (3, "q1 q2 q3 q4"),
        ],
        "doc_id bigint, text string",
    )
    spans = spark.createDataFrame(
        [(1, 4, 5), (1, 5, 6), (3, 1, 3)],  # doc 1: overlapping spans
        "dst_id bigint, dst_first bigint, dst_last bigint",
    )
    out = {r["doc_id"]: r for r in
           excise_spans(docs, "doc_id", "text", spans, n=2).collect()}
    assert set(out) == {1, 3}
    assert out[1]["n_tokens"] == 9 and out[1]["n_removed"] == 4
    assert out[1]["text_clean"] == "a b c d e"  # normalized stream
    assert out[3]["n_removed"] == 4 and out[3]["text_clean"] == ""
