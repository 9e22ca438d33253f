"""Property-based tests (hypothesis): the distributed operators agree
with straightforward single-process reference implementations on
arbitrary inputs — the strongest form of SURVEY §5's oracle strategy."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from alaska_etl_spark.operators.asof import asof_join
from alaska_etl_spark.operators.dedup import dedup_keep_first
from alaska_etl_spark.operators.sessions import sessionize

_SETTINGS = dict(
    max_examples=12,  # each example spins Spark jobs; keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_ts = st.integers(min_value=0, max_value=500).map(
    lambda m: dt.datetime(2023, 1, 1) + dt.timedelta(minutes=m)
)
_key = st.sampled_from(["a", "b", "c"])


@given(
    rows=st.lists(st.tuples(_key, _ts, st.integers(0, 10_000)), min_size=1, max_size=40)
)
@settings(**_SETTINGS)
def test_dedup_keep_first_matches_sorted_first(spark, rows):
    df = spark.createDataFrame(
        [(k, t, i) for i, (k, t, _) in enumerate(rows)],
        "k string, ts timestamp_ntz, uid bigint",
    )
    got = {
        r.k: (r.ts, r.uid)
        for r in dedup_keep_first(df, keys=["k"], order_by=["ts", "uid"]).collect()
    }
    want = {}
    for uid, (k, t, _) in enumerate(rows):
        if k not in want or (t, uid) < want[k]:
            want[k] = (t, uid)
    assert got == want


@given(
    left=st.lists(st.tuples(_key, _ts), min_size=1, max_size=25),
    right=st.lists(st.tuples(_key, _ts, st.integers(0, 99)), min_size=0, max_size=25),
)
@settings(**_SETTINGS)
def test_asof_backward_matches_bruteforce(spark, left, right):
    # deduplicate right on (key, ts): the as-of contract assumes one
    # payload per (key, ts); ties there are a separate dedup concern
    rmap = {}
    for k, t, p in right:
        rmap[(k, t)] = p
    right_rows = [(k, t, p) for (k, t), p in rmap.items()]

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k string, lts timestamp_ntz, uid bigint"
    )
    rdf = spark.createDataFrame(right_rows or [], "k string, rts timestamp_ntz, payload bigint")
    out = asof_join(ldf, rdf, on=["k"], left_ts="lts", right_ts="rts")
    got = {r.uid: r.payload for r in out.collect()}

    for uid, (k, t) in enumerate(left):
        cands = [(rt, p) for (rk, rt, p) in right_rows if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[uid] == want, (uid, k, t)


@given(
    rows=st.lists(st.tuples(_key, _ts), min_size=1, max_size=30),
    gap_minutes=st.integers(min_value=1, max_value=60),
)
@settings(**_SETTINGS)
def test_sessionize_matches_linear_scan(spark, rows, gap_minutes):
    df = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(rows)],
        "k string, ts timestamp_ntz, uid bigint",
    )
    out = sessionize(
        df, key_cols=["k"], ts_col="ts", gap=f"{gap_minutes} minutes", order_tiebreak=["uid"]
    )
    got = {r.uid: r.session_id for r in out.collect()}

    by_key: dict[str, list] = {}
    for uid, (k, t) in enumerate(rows):
        by_key.setdefault(k, []).append((t, uid))
    want = {}
    for k, evs in by_key.items():
        sid, prev = 0, None
        for t, uid in sorted(evs):
            if prev is None or (t - prev) > dt.timedelta(minutes=gap_minutes):
                sid += 1
            want[uid] = sid
            prev = t
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 3),                      # user key
            st.integers(0, 72).map(
                lambda h: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=17 * h)
            ),                                      # spans 3 days of hour buckets
            st.integers(-5000, 5000).map(lambda c: c / 100.0),  # 2-dec value
        ),
        min_size=1,
        max_size=30,
    ),
    cuts=st.lists(st.integers(0, 29), min_size=0, max_size=3),
)
@settings(**_SETTINGS)
def test_rollup_refresh_order_free(spark, tmp_path_factory, rows, cuts):
    """ANY batching of ANY event stream folded through refresh_rollup
    equals the one-shot rollup: partial-aggregate merge is associative
    and day-partition rewrites lose nothing."""
    from alaska_etl_spark.plans.rollup import finalize, hourly_partials, refresh_rollup

    schema = "user_id bigint, ts timestamp_ntz, value double"
    path = str(tmp_path_factory.mktemp("rollup_prop") / "r")
    bounds = sorted({c for c in cuts if c < len(rows)})
    pieces, prev = [], 0
    for b in bounds + [len(rows)]:
        if b > prev:
            pieces.append(rows[prev:b])
            prev = b
    if prev < len(rows):
        pieces.append(rows[prev:])
    for piece in pieces:
        refresh_rollup(
            spark, spark.createDataFrame(piece, schema), path,
            key_cols=["user_id"], ts_col="ts", val_col="value",
        )
    got = sorted(
        (r.bucket, r.user_id, r.n, r.avg_val, r.min_val, r.max_val, r.sum_val)
        for r in finalize(spark.read.parquet(path)).collect()
    )
    want = sorted(
        (r.bucket, r.user_id, r.n, r.avg_val, r.min_val, r.max_val, r.sum_val)
        for r in finalize(
            hourly_partials(
                spark.createDataFrame(rows, schema),
                key_cols=["user_id"], ts_col="ts", val_col="value",
            )
        ).collect()
    )
    assert got == want


@given(
    n=st.integers(min_value=1, max_value=60),
    k=st.integers(min_value=1, max_value=12),
    parts=st.integers(min_value=1, max_value=9),
)
@settings(**_SETTINGS)
def test_global_ntile_matches_window_any_shape(spark, n, k, parts):
    """Distributed ntile == single-partition window ntile for arbitrary
    (N, k, partition-count) — including k > N and one-partition
    degenerate layouts."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from alaska_etl_spark.operators.ranking import global_ntile

    df = spark.range(n).select(
        F.col("id").alias("key"), (F.col("id") * 131 % 17).alias("v")
    )
    got = {
        r.key: r.bucket
        for r in global_ntile(df, ["v", "key"], k, num_partitions=parts).collect()
    }
    w = Window.orderBy("v", "key")
    want = {
        r.key: r.b for r in df.withColumn("b", F.ntile(k).over(w)).collect()
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["g1", "g2", "g3"]), st.integers(0, 1 << 40)),
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[1],
    ),
    quota=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=1 << 20),
)
@settings(**_SETTINGS)
def test_stratified_sample_quota_exact_and_subset(spark, rows, quota, seed):
    """Counts are min(quota, |stratum|) exactly, and a larger quota's
    sample contains the smaller one (nested under the same seed)."""
    from alaska_etl_spark.operators.splits import stratified_sample

    df = spark.createDataFrame(rows, "grp string, key bigint")
    small = {
        r.key for r in stratified_sample(df, ["grp"], "key", quota, seed=seed).collect()
    }
    big = {
        r.key
        for r in stratified_sample(df, ["grp"], "key", quota + 3, seed=seed).collect()
    }
    sizes = {}
    for g, _ in rows:
        sizes[g] = sizes.get(g, 0) + 1
    got_sizes = {}
    for r in stratified_sample(df, ["grp"], "key", quota, seed=seed).collect():
        got_sizes[r.grp] = got_sizes.get(r.grp, 0) + 1
    assert got_sizes == {g: min(quota, c) for g, c in sizes.items() if min(quota, c) > 0}
    assert small <= big


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=24), min_size=2, max_size=10
    )
)
@settings(**_SETTINGS)
def test_cosine_simjoin_bounds_and_symmetric_ids(spark, texts):
    """Every emitted cosine is in (0, 1] and id_a < id_b; identical
    texts always score 1.0."""
    from alaska_etl_spark.operators.simjoin import cosine_similarity_join

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = cosine_similarity_join(df, "doc_id", "text", n=2, threshold=0.0).collect()
    for r in out:
        assert r.id_a < r.id_b
        assert 0.0 < r.cosine <= 1.0
    got = {(r.id_a, r.id_b): r.cosine for r in out}
    for i, a in enumerate(texts):
        for j, b in enumerate(texts):
            if i < j and a.split() == b.split() and a.split():
                assert got[(i, j)] == 1.0


@given(
    intervals=st.lists(
        st.tuples(st.integers(0, 3000), st.integers(0, 600)), min_size=1, max_size=30
    )
)
@settings(**_SETTINGS)
def test_concurrency_matches_bruteforce(spark, intervals):
    """concurrency_by_day == O(n·m) per-day closed-interval counting."""
    from collections import defaultdict

    from alaska_etl_spark.operators.sessions import concurrency_by_day

    base = dt.datetime(2023, 5, 1)
    rows = [
        (base + dt.timedelta(minutes=s), base + dt.timedelta(minutes=s + d))
        for s, d in intervals
    ]
    df = spark.createDataFrame(rows, "s timestamp_ntz, e timestamp_ntz")
    got = {
        r.utc_day.date(): r.max_concurrent
        for r in concurrency_by_day(df, start_col="s", end_col="e").collect()
    }

    # reference: per day, evaluate concurrency at every boundary instant
    want: dict = {}
    by_day = defaultdict(list)
    for s, e in rows:
        d = s.date()
        while d <= e.date():
            day0 = dt.datetime(d.year, d.month, d.day)
            day1 = day0 + dt.timedelta(days=1) - dt.timedelta(microseconds=1)
            by_day[d].append((max(s, day0), min(e, day1)))
            d += dt.timedelta(days=1)
    for d, ivs in by_day.items():
        instants = {t for iv in ivs for t in iv}
        want[d] = max(sum(1 for a, b in ivs if a <= t <= b) for t in instants)
    assert got == want


@given(
    base=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 99)), min_size=0, max_size=12),
    feed=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 99), st.sampled_from(["I", "U", "D"])),
        min_size=0,
        max_size=15,
    ),
    cut=st.integers(0, 15),
)
@settings(**_SETTINGS)
def test_apply_changelog_chunked_equals_whole(spark, base, feed, cut):
    """Applying feed[:cut] then feed[cut:] == applying the whole feed —
    the property that makes per-batch CDC ingestion correct; both equal
    a dict replay."""
    from alaska_etl_spark.plans.warehouse import apply_changelog

    bmap = {}
    for k, v in base:
        bmap[k] = v
    base_rows = list(bmap.items())
    bdf = spark.createDataFrame(base_rows, "k bigint, v bigint")
    fdf = [(k, v, op, i + 1) for i, (k, v, op) in enumerate(feed)]
    schema = "k bigint, v bigint, op string, seq bigint"

    whole = apply_changelog(bdf, spark.createDataFrame(fdf, schema), ["k"])
    mid = apply_changelog(bdf, spark.createDataFrame(fdf[:cut], schema), ["k"])
    chunked = apply_changelog(mid, spark.createDataFrame(fdf[cut:], schema), ["k"])

    want = dict(bmap)
    for k, v, op in feed:
        if op == "D":
            want.pop(k, None)
        else:
            want[k] = v
    assert {r.k: r.v for r in whole.collect()} == want
    assert {r.k: r.v for r in chunked.collect()} == want


_BM25_WORDS = ["aa", "bb", "cc", "dd", "ee"]


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_BM25_WORDS), min_size=0, max_size=8),
        min_size=1,
        max_size=10,
    ),
    query=st.lists(st.sampled_from(_BM25_WORDS + ["zz"]), min_size=1, max_size=4),
)
@settings(**_SETTINGS)
def test_bm25_matches_python_replica(spark, docs, query):
    """bm25_topk == plain-Python Okapi BM25 (micro-int protocol and
    tie-breaks included) on random tiny corpora, incl. out-of-vocab
    query terms and empty documents."""
    import math

    from alaska_etl_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id bigint, text string",
    )
    qs = spark.createDataFrame([(0, " ".join(query))], "query_id int, query_text string")
    got = [
        (r.doc_id, r.score_micro, r.rank)
        for r in bm25_topk(df, qs, "doc_id", "text", k=4)
        .orderBy("rank")
        .collect()
    ]

    k1, b = 1.2, 0.75
    lens = {i: len(w) for i, w in enumerate(docs) if w}
    n = len(lens)
    if n == 0:
        assert got == []
        return
    avgdl = sum(lens.values()) / n
    dfreq: dict = {}
    for w in docs:
        for t in set(w):
            dfreq[t] = dfreq.get(t, 0) + 1

    def score(d):
        s = 0
        for t in set(query):
            tf = docs[d].count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            c = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * lens[d] / avgdl)
            )
            s += int(round(c * 1000000.0))
        return s

    ranked = sorted(
        ((score(d), d) for d in lens if score(d) > 0), key=lambda x: (-x[0], x[1])
    )[:4]
    want = [(d, sm, r) for r, (sm, d) in enumerate(ranked, 1)]
    assert got == want


@given(
    strings=st.lists(
        st.text(min_size=0, max_size=30), min_size=1, max_size=16, unique=True
    )
)
@settings(**_SETTINGS)
def test_md5_hash_lanes_cross_engine(spark, strings):
    """dedup.md5_hash31 / md5_hash60 (the oracle-replayable hash lane
    behind q29/q30) are 64-bit-equal between Spark and DuckDB on
    arbitrary unicode — future hash-lane work cannot silently diverge
    the engines (VERDICT r4 next-round #8)."""
    import duckdb

    from alaska_etl_spark.operators.dedup import md5_hash31, md5_hash60
    from alaska_etl_spark.plans.queries import _dk_h31, _dk_h60

    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {
        r.s: (r.h31, r.h60)
        for r in df.select(
            "s", md5_hash31("s").alias("h31"), md5_hash60("s").alias("h60")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in strings])
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"SELECT s, {_dk_h31('s')} AS h31, {_dk_h60('s')} AS h60 FROM t"
        ).fetchall()
    }
    con.close()
    assert got == want


# --- fixed-point round-half-up (functions/fixedpoint.py) ----------------

from fractions import Fraction

from alaska_etl_spark.functions.fixedpoint import div_half_up_py


@given(
    num=st.integers(min_value=0, max_value=10**12),
    den=st.integers(min_value=1, max_value=10**12),
    scale=st.sampled_from([1, 10, 100, 1000, 10000, 1000000]),
)
@settings(max_examples=300, deadline=None)
def test_div_half_up_matches_fraction(num, den, scale):
    """(2*scale*num + den) div (2*den) IS round-half-up of
    scale*num/den — pinned against exact Fraction arithmetic (the
    definition, not a re-derivation). Pure-integer; the Spark Column
    form emits literally this arithmetic over BIGINT, exercised
    end-to-end by every avg/jaccard/margin oracle."""
    exact = Fraction(scale * num, den)
    floor = exact.numerator // exact.denominator
    frac = exact - floor
    want = floor + (1 if frac >= Fraction(1, 2) else 0)
    assert div_half_up_py(num, den, scale) == want


def test_div_half_up_column_matches_python(spark):
    """The Column form and the Python replica agree on a boundary-heavy
    grid (halves land exactly on .5 multiples: den=2*num etc.)."""
    from alaska_etl_spark.functions.fixedpoint import div_half_up

    rows = [
        (n, d, s)
        for n in [0, 1, 2, 3, 5, 7, 50, 999, 10**9]
        for d in [1, 2, 3, 4, 7, 100, 10**9]
        for s in [1, 100, 10000]
    ]
    df = spark.createDataFrame(rows, "num bigint, den bigint, scale bigint")
    got = {
        (r.num, r.den, r.scale): r.v
        for r in df.select(
            "num", "den", "scale",
            *[div_half_up("num", "den", s).alias(f"v{s}") for s in [1, 100, 10000]],
        )
        .selectExpr("num", "den", "scale",
                    "CASE scale WHEN 1 THEN v1 WHEN 100 THEN v100 ELSE v10000 END AS v")
        .collect()
    }
    for n, d, s in rows:
        assert got[(n, d, s)] == div_half_up_py(n, d, s), (n, d, s)


@given(
    num=st.integers(min_value=-(10**12), max_value=10**12),
    den=st.integers(min_value=1, max_value=10**12),
    scale=st.sampled_from([1, 10, 100, 1000, 10000, 1000000]),
)
@settings(max_examples=300, deadline=None)
def test_div_half_up_signed_matches_fraction(num, den, scale):
    """The sign-aware variant IS round-half-away-from-zero of
    scale*num/den (abs-then-resign), pinned against Fraction — the
    negative-dividend contract the plain helper excludes (ADVICE r6:
    TWAP/DID sums can go negative)."""
    from alaska_etl_spark.functions.fixedpoint import div_half_up_signed_py

    exact = Fraction(scale * abs(num), den)
    floor = exact.numerator // exact.denominator
    frac = exact - floor
    mag = floor + (1 if frac >= Fraction(1, 2) else 0)
    want = -mag if num < 0 else mag
    assert div_half_up_signed_py(num, den, scale) == want


def test_div_half_up_signed_cross_engine(spark):
    """Spark Column form == DuckDB SQL twin == Python replica on a
    sign-boundary grid (exact halves on both sides of zero) — the
    truncate-vs-floor divergence the signed form exists to close."""
    import duckdb

    from alaska_etl_spark.functions.fixedpoint import (
        div_half_up_signed,
        div_half_up_signed_py,
        sql_div_half_up_signed,
    )

    rows = [
        (n, d)
        for n in [-(10**9), -999, -7, -5, -3, -2, -1, 0, 1, 2, 3, 5, 7, 999, 10**9]
        for d in [1, 2, 3, 4, 7, 100, 10**9]
    ]
    df = spark.createDataFrame(rows, "num bigint, den bigint")
    got_spark = {
        (r.num, r.den): (r.v1, r.v100)
        for r in df.select(
            "num",
            "den",
            div_half_up_signed("num", "den", 1).alias("v1"),
            div_half_up_signed("num", "den", 100).alias("v100"),
        ).collect()
    }
    con = duckdb.connect()
    frag1 = sql_div_half_up_signed("num", "den", 1)
    frag100 = sql_div_half_up_signed("num", "den", 100)
    values = ", ".join(
        f"(CAST({n} AS BIGINT), CAST({d} AS BIGINT))" for n, d in rows
    )
    got_duck = {
        (n, d): (int(v1), int(v100))
        for n, d, v1, v100 in con.execute(
            f"SELECT num, den, {frag1}, {frag100} "
            f"FROM (VALUES {values}) AS t(num, den)"
        ).fetchall()
    }
    con.close()
    for n, d in rows:
        want = (div_half_up_signed_py(n, d, 1), div_half_up_signed_py(n, d, 100))
        assert got_spark[(n, d)] == want, (n, d)
        assert got_duck[(n, d)] == want, (n, d)


# --- PPJoin positional filter soundness (simjoin, round 6) ---------------

_VOCAB = ["aa", "bb", "cc", "dd", "ee"]  # tiny vocab -> hot shingles,
# the regime where the positional filter prunes hardest and any
# unsoundness (a dropped true pair) would surface immediately


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12).map(" ".join),
        min_size=2,
        max_size=8,
    ),
    tau=st.sampled_from([(1, 2), (7, 10), (9, 10)]),
)
@settings(**_SETTINGS)
def test_jaccard_join_ppjoin_filter_matches_brute_force(spark, docs, tau):
    from alaska_etl_spark.operators.simjoin import jaccard_similarity_join

    num, den = tau
    rows = [(str(i), t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r.id_a, r.id_b)
        for r in jaccard_similarity_join(
            df, "doc_id", "text", n=1, threshold_num=num, threshold_den=den
        ).collect()
    }
    want = set()
    sh = {i: set(t.split()) for i, t in rows if t.split()}
    for a in sh:
        for b in sh:
            if a < b and den * len(sh[a] & sh[b]) >= num * len(sh[a] | sh[b]):
                want.add((a, b))
    assert got == want


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12).map(" ".join),
        min_size=2,
        max_size=8,
    ),
    tau=st.sampled_from([(1, 2), (3, 4), (9, 10)]),
)
@settings(**_SETTINGS)
def test_containment_join_positional_filter_matches_brute_force(spark, docs, tau):
    from alaska_etl_spark.operators.simjoin import containment_join

    num, den = tau
    rows = [(str(i), t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r.src_id, r.dst_id)
        for r in containment_join(
            df, "doc_id", "text", n=1, threshold_num=num, threshold_den=den
        ).collect()
    }
    want = set()
    sh = {i: set(t.split()) for i, t in rows if t.split()}
    for a in sh:
        for b in sh:
            if a != b and den * len(sh[a] & sh[b]) >= num * len(sh[a]):
                want.add((a, b))
    assert got == want


@given(
    st.lists(
        st.one_of(
            st.floats(-1.0, 1.0, allow_nan=False, width=32),
            # exact half-ties at 6dp — where np.round (half-to-even)
            # diverges from SQL round (half-away-from-zero)
            st.integers(-2 * 10**6, 2 * 10**6).map(lambda k: (2 * k + 1) / 2e6),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_np_round_half_away_matches_duckdb_round(xs):
    import duckdb
    import numpy as np

    from alaska_etl_spark.operators.similarity import _np_round_half_away

    got = _np_round_half_away(np.asarray(xs, dtype=np.float64), 6)
    con = duckdb.connect()
    want = [
        con.execute("SELECT round(CAST(? AS DOUBLE), 6)", [x]).fetchone()[0]
        for x in xs
    ]
    assert list(got) == want


@given(
    rows=st.lists(
        st.tuples(st.integers(-6, 6), st.booleans()), min_size=2, max_size=60
    )
)
@settings(**_SETTINGS)
def test_roc_auc_matches_pairwise_bruteforce(spark, rows):
    from fractions import Fraction

    from alaska_etl_spark.operators.classifier import roc_auc

    df = spark.createDataFrame(rows, "s bigint, pos boolean")
    r = roc_auc(df, "s", "pos").collect()[0]
    pos = [s for s, p in rows if p]
    neg = [s for s, p in rows if not p]
    assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
    if not pos or not neg:
        assert r.auc is None
        return
    u2 = sum(2 for sp in pos for sn in neg if sp > sn) + sum(
        1 for sp in pos for sn in neg if sp == sn
    )
    f = Fraction(u2, 2 * len(pos) * len(neg))
    units = (2 * 10**6 * f.numerator + f.denominator) // (2 * f.denominator)
    assert r.auc == units / 1e6


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)), min_size=2, max_size=50
    )
)
@settings(**_SETTINGS)
def test_spearman_midranks_match_bruteforce(spark, rows):
    import math

    from alaska_etl_spark.operators.stats import spearman_corr

    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in rows], "x double, y double"
    )
    r = spearman_corr(df, "x", "y").collect()[0]
    xs = [a for a, _ in rows]
    ys = [b for _, b in rows]
    if len(set(xs)) == 1 or len(set(ys)) == 1:
        assert r.rho is None
        return

    # doubled midrank = 2*rank_min + ties - 1 where rank_min = 1 + #smaller
    rx = [2 * (1 + sum(1 for o in xs if o < v)) + sum(1 for o in xs if o == v) - 1 for v in xs]
    ry = [2 * (1 + sum(1 for o in ys if o < v)) + sum(1 for o in ys if o == v) - 1 for v in ys]
    n = len(rows)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    want = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    assert r.rho == round(want, 6)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=0,
        max_size=40,
    ),
    k=st.integers(1, 4),
)
@settings(**_SETTINGS)
def test_k_core_matches_reference_peel(spark, edges, k):
    from alaska_etl_spark.operators.graph import k_core

    und = {(a, b) for a, b in edges if a != b}
    sym = sorted(und | {(b, a) for a, b in und})
    # reference: peel to convergence in plain python
    adj = {}
    for a, b in sym:
        adj.setdefault(a, set()).add(b)
    nodes = set(adj)
    while True:
        drop = {n for n in nodes if len(adj[n] & nodes) < k}
        if not drop:
            break
        nodes -= drop
    want = {n: len(adj[n] & nodes) for n in sorted(nodes)}
    if not sym:
        return
    df = spark.createDataFrame(sym, "src long, dst long")
    # iters = |nodes| always converges (each round removes >=1 node or stops)
    got = {
        r["node"]: r["degree"]
        for r in k_core(df, k, iters=max(len(set(adj)), 1)).collect()
    }
    assert got == want


@given(
    texts=st.lists(
        st.text(
            alphabet="aB c.,!7\t", min_size=0, max_size=30
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_normalized_fingerprint_idempotent_and_invariant(spark, texts):
    from pyspark.sql import functions as F

    from alaska_etl_spark.operators.dedup import normalized_fingerprint

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    out = df.select(
        normalized_fingerprint("t").alias("f1"),
        normalized_fingerprint(F.upper("t")).alias("f_case"),
        normalized_fingerprint(F.concat(F.lit("  "), F.col("t"), F.lit("!!"))).alias(
            "f_noise"
        ),
    ).collect()
    for r in out:
        # case- and punctuation/whitespace-noise-invariant
        assert r["f1"] == r["f_case"] == r["f_noise"]
    # idempotent: normalizing a fingerprint is the fingerprint
    out2 = df.select(
        normalized_fingerprint(normalized_fingerprint("t")).alias("f2"),
        normalized_fingerprint("t").alias("f1"),
    ).collect()
    for r in out2:
        assert r["f1"] == r["f2"]


# --- r10 URL canonicalization: Python replica + idempotence -----------------

_TRACKING = ("gclid", "fbclid", "msclkid", "igshid", "mc_eid")


def _py_pct(s):
    """Replica of operators.urls._pct_normalize: uppercase %XX hex,
    decode unreserved octets, malformed % verbatim."""
    import re

    parts = s.split("%")
    out = [parts[0]]
    for p in parts[1:]:
        if not re.match(r"^[0-9A-Fa-f]{2}", p):
            out.append("%" + p)
            continue
        hx = p[:2].upper()
        code = int(hx, 16)
        if (
            48 <= code <= 57
            or 65 <= code <= 90
            or 97 <= code <= 122
            or code in (45, 46, 95, 126)
        ):
            out.append(chr(code) + p[2:])
        else:
            out.append("%" + hx + p[2:])
    return "".join(out)


def _py_norm_path(rawpath):
    """Replica of operators.urls._norm_path: the dot-segment /
    duplicate-slash string fold with the trailing-slash rule."""
    import re

    acc = ""
    for x in rawpath.split("/"):
        if x in ("", "."):
            continue
        if x == "..":
            acc = re.sub(r"/[^/]*$", "", acc)
        else:
            acc = acc + "/" + x
    if acc == "":
        return "/"
    trailing = re.search(r"/(\.\.?)?$", rawpath) is not None
    return acc + ("/" if trailing else "")


def _py_canonical(url):
    """Single-process replica of operators.urls.canonical_url."""
    import re

    if url is None or not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", url):
        return None
    scheme = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", url).group(1).lower()
    auth = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", url).group(1)
    auth = auth.split("@")[-1]
    if "[" in auth:  # IPv6 literal authority: bad-row side
        return None
    hp = auth.split(":")
    # r12 _norm_host replica: pct-normalize, lowercase AFTER the
    # decode, strip trailing root-label dots
    host = re.sub(r"\.+$", "", _py_pct(hp[0]).lower())
    port = hp[1] if len(hp) > 1 else ""
    default = (scheme == "http" and port == "80") or (
        scheme == "https" and port == "443"
    )
    portpart = "" if (port == "" or default) else ":" + port
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", url)
    path = _py_norm_path(_py_pct(m.group(1)))
    qm = re.match(r"^[^#?]*\?([^#]*)", url)
    rawq = _py_pct(qm.group(1)) if qm else ""
    keep = sorted(
        p
        for p in rawq.split("&")
        if p != "" and p[:4] != "utm_" and p.split("=")[0] not in _TRACKING
    )
    qpart = "?" + "&".join(keep) if keep else ""
    return scheme + "://" + host + portpart + path + qpart


_urlpart = st.one_of(
    st.text(alphabet="abcXY09._-~%", min_size=0, max_size=6),
    # r11: dot-segments, duplicate slashes, percent-encoded unreserved
    # (%7e ~, %2E ., %41 A), reserved-stays-encoded (%2F), malformed %
    st.sampled_from([".", "..", "", "%7e", "%2E", "%41", "%2F", "%zz", "a%", "%2e%2e"]),
)


@given(
    scheme=st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"]),
    user=st.sampled_from(["", "u:p@", "U@"]),
    host=st.one_of(
        st.lists(
            # r12 host axis: percent-encoded unreserved (%41 A, %53 S),
            # non-unreserved stays encoded (%C3), malformed %, and
            # trailing-dot labels (the "" tail via the final sample)
            st.sampled_from(["A", "b", "Cd", "e0", "%41", "%53x", "%C3%A9", "%zz"]),
            min_size=1,
            max_size=4,
        ).map(".".join),
        st.sampled_from(["[::1]", "[2001:db8::1]"]),  # IPv6 -> NULL route
        st.sampled_from(["example.com.", "a.b..", "%73ite.com."]),
    ),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.lists(_urlpart, min_size=0, max_size=4).map(
        lambda segs: "".join("/" + s for s in segs)
    ),
    params=st.lists(
        st.sampled_from(
            ["a=1", "b=2", "z", "utm_src=x", "fbclid=Q", "gclid=1", "a=0", "",
             "%61=1", "c=%31", "d=%2F"]
        ),
        min_size=0,
        max_size=5,
    ),
    frag=st.sampled_from(["", "#f", "#a?b=1"]),
)
@settings(**_SETTINGS)
def test_canonical_url_matches_python_and_is_idempotent(
    spark, scheme, user, host, port, path, params, frag
):
    from alaska_etl_spark.operators.urls import canonical_url

    url = f"{scheme}://{user}{host}{port}{path}"
    if params:
        url += "?" + "&".join(params)
    url += frag
    df = spark.createDataFrame([(url,)], "url string")
    got = df.select(canonical_url("url").alias("c")).collect()[0]["c"]
    assert got == _py_canonical(url)
    # idempotence: the canonical form is its own canonical form
    df2 = spark.createDataFrame([(got,)], "url string")
    again = df2.select(canonical_url("url").alias("c")).collect()[0]["c"]
    assert again == got


# --- r10 longest shared runs vs brute force ----------------------------------


def _py_longest_runs(texts, n, min_run):
    """Brute-force reference: max shared verbatim token run per pair."""
    toks = {i: t.lower().split() for i, t in texts.items()}
    out = {}
    ids = sorted(toks)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = toks[ids[x]], toks[ids[y]]
            best = 0
            runs = 0
            for i in range(len(a)):
                for j in range(len(b)):
                    # maximal run starting at (i, j)
                    if i > 0 and j > 0 and a[i - 1] == b[j - 1]:
                        continue
                    L = 0
                    while i + L < len(a) and j + L < len(b) and a[i + L] == b[j + L]:
                        L += 1
                    if L >= min_run:
                        runs += 1
                        best = max(best, L)
            if best >= min_run:
                out[(ids[x], ids[y])] = best
    return out


@given(
    texts=st.lists(
        st.lists(st.sampled_from("pqrs"), min_size=0, max_size=10).map(" ".join),
        min_size=2,
        max_size=5,
    )
)
@settings(**_SETTINGS)
def test_longest_shared_runs_matches_brute_force(spark, texts):
    """Hot 4-token alphabet → dense accidental runs; every pair's
    longest verbatim run must equal the O(n²·m²) reference (max_pair_df
    high enough that the rare-gram block proposes every sharing pair —
    the exactness claim is about the verify, recall is the generator's
    documented contract)."""
    from alaska_etl_spark.operators.simjoin import longest_shared_runs

    n, min_run = 2, 2
    rows = [(str(i), t) for i, t in enumerate(texts)]
    got = {
        (r["id_a"], r["id_b"]): r["longest_run_tokens"]
        for r in longest_shared_runs(
            spark.createDataFrame(rows, "doc_id string, text string"),
            "doc_id",
            "text",
            n=n,
            min_run_tokens=min_run,
            max_pair_df=100,
        ).collect()
    }
    want = _py_longest_runs(dict(rows), n, min_run)
    assert got == want


# --- r11 intra-document repeat runs vs brute force ---------------------------


def _py_repeat_runs(text, min_run):
    """Brute-force reference: longest maximal repeated token run WITHIN
    one document (pairs of start positions i < j, left-maximality as in
    _py_longest_runs with a == b)."""
    a = text.lower().split()
    best = 0
    for i in range(len(a)):
        for j in range(i + 1, len(a)):
            if i > 0 and a[i - 1] == a[j - 1]:
                continue
            L = 0
            while j + L < len(a) and a[i + L] == a[j + L]:
                L += 1
            if L >= min_run:
                best = max(best, L)
    return best if best >= min_run else None


@given(
    texts=st.lists(
        st.lists(st.sampled_from("pq"), min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=4,
    )
)
@settings(**_SETTINGS)
def test_longest_repeat_runs_matches_brute_force(spark, texts):
    """2-token alphabet → dense periodic/overlapping self-repeats; the
    per-document longest intra-run must equal the O(m⁴) reference (no
    generator, no recall boundary — the self-pairing is exhaustive)."""
    from alaska_etl_spark.operators.simjoin import longest_repeat_runs

    n, min_run = 2, 2
    rows = [(str(i), t) for i, t in enumerate(texts)]
    got = {
        r["doc_id"]: r["longest_run_tokens"]
        for r in longest_repeat_runs(
            spark.createDataFrame(rows, "doc_id string, text string"),
            "doc_id",
            "text",
            n=n,
            min_run_tokens=min_run,
        ).collect()
    }
    want = {
        i: L for i, t in rows if (L := _py_repeat_runs(t, min_run)) is not None
    }
    assert got == want


# --- r11 line-grain dedup vs brute force -------------------------------------


def _py_line_dedup(docs, min_docs):
    """Single-process replica of operators.dedup.line_dedup."""
    from collections import defaultdict

    hot_docs = defaultdict(set)
    for i, t in docs:
        for ln in (t or "").split("\n"):
            k = ln.strip()
            if k != "":
                hot_docs[k].add(i)
    hot = {k for k, ids in hot_docs.items() if len(ids) >= min_docs}
    out = {}
    for i, t in docs:
        lines = (t or "").split("\n")
        kept = [ln for ln in lines if ln.strip() == "" or ln.strip() not in hot]
        removed = len(lines) - len(kept)
        out[i] = (len(lines), removed, "\n".join(kept))
    return out


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["x y", "  x y ", "z", "", "  ", "q r s"]),
            min_size=0,
            max_size=5,
        ).map("\n".join),
        min_size=1,
        max_size=5,
    ),
    min_docs=st.sampled_from([2, 3]),
)
@settings(**_SETTINGS)
def test_line_dedup_matches_brute_force(spark, docs, min_docs):
    """Tiny line alphabet → dense cross-doc collisions; trimmed-key
    hotness, blank-line preservation, every-occurrence removal and the
    in-order reassembly must all equal the reference."""
    from alaska_etl_spark.operators.dedup import line_dedup

    rows = [(i, t) for i, t in enumerate(docs)]
    got = {
        r["doc_id"]: (r["n_lines"], r["n_removed"], r["cleaned_text"])
        for r in line_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
            min_docs=min_docs,
        ).collect()
    }
    assert got == _py_line_dedup(rows, min_docs)


# --- r11 robots precedence vs reference --------------------------------------


def _py_robots_verdict(path, rules):
    """RFC 9309 §2.2.2/§2.2.3 reference: rules = [(kind, rpath)];
    empty paths match nothing; rule paths percent-normalize (and
    dot-segment fold in the plain lane) before matching; wildcard
    rules (* / trailing $) match via anchored-regex translation;
    most-octets pattern wins, allow wins ties, no match = allow."""
    import re

    best = None  # (octets, allow)
    for kind, rp in rules:
        if rp == "":
            continue
        rpn = _py_pct(rp)
        if "*" in rp or "$" in rp:
            anchor = rpn.endswith("$")
            body = rpn[:-1] if anchor else rpn
            rx = (
                "^"
                + ".*".join(re.escape(p) for p in body.split("*"))
                + ("$" if anchor else "")
            )
            ok = re.search(rx, path) is not None
            plen = len(rpn.encode())
        else:
            rpn = _py_norm_path(rpn)
            ok = path.startswith(rpn)
            plen = len(rpn.encode())
        if ok:
            cand = (plen, kind == "allow")
            if best is None or cand > best:
                best = cand
    return best[1] if best is not None else True


@given(
    rules=st.lists(
        st.tuples(
            st.sampled_from(["allow", "disallow"]),
            st.sampled_from(
                [
                    "/a",
                    "/a/",
                    "/a/b",
                    "/ab",
                    "/b",
                    "",
                    "/a*",
                    "/a$",
                    "/a/b$",
                    "/*c",
                    "/a*b*c",
                    "/a%7Eb",
                    "/a/./b",
                    "//a//b",
                    "/x/../a",
                ]
            ),
        ),
        min_size=0,
        max_size=6,
    ),
    paths=st.lists(
        st.sampled_from(
            ["/a", "/a/b", "/a/bc", "/ab", "/abc", "/b/x", "/c", "/a~b", "/a/xc"]
        ),
        min_size=1,
        max_size=5,
        unique=True,
    ),
)
@settings(**dict(_SETTINGS, max_examples=25))
def test_robots_check_matches_reference(spark, rules, paths):
    from alaska_etl_spark.operators.urls import robots_check

    rules_df = spark.createDataFrame(
        [("a.com", k, p, ("*" in p) or ("$" in p)) for k, p in rules],
        "host string, rule_kind string, path string, is_wildcard boolean",
    )
    urls = spark.createDataFrame(
        [(i, f"https://a.com{p}") for i, p in enumerate(paths)],
        "id long, url string",
    )
    got = {
        r["id"]: r["allowed"]
        for r in robots_check(urls, "id", "url", rules_df).collect()
    }
    want = {i: _py_robots_verdict(p, rules) for i, p in enumerate(paths)}
    assert got == want


# --- r11 robots group resolution vs reference ---------------------------------


def _py_parse_robots(body, agent):
    """Reference for parse_robots: RFC 9309 group semantics with the
    operator's declared boundaries (exact-token-or-star UA matching)."""
    import re

    groups = []  # list of (set_of_agents, [(kind, path)])
    cur_agents, cur_rules, in_ua_run = None, None, False
    for raw in body.split("\n"):
        line = re.sub(r"#.*$", "", raw).strip()
        m = re.match(r"^([A-Za-z-]+)\s*:(.*)$", line)
        if not m:
            continue
        key, val = m.group(1).lower(), m.group(2).strip()
        if key == "user-agent":
            if not in_ua_run:
                cur_agents, cur_rules = set(), []
                groups.append((cur_agents, cur_rules))
            cur_agents.add(val.lower())
            in_ua_run = True
        elif key in ("allow", "disallow", "crawl-delay"):
            # any group-member directive (crawl-delay included — the
            # de-facto group extension) ends a User-agent run
            if key != "crawl-delay" and cur_rules is not None:
                cur_rules.append((key, val))
            in_ua_run = False
    target = agent.lower()
    named = [g for g in groups if target in g[0]]
    use = named if (target != "*" and named) else [
        g for g in groups if "*" in g[0]
    ]
    out = set()
    for _, rules in use:
        for kind, path in rules:
            out.add((kind, path, ("*" in path) or ("$" in path)))
    return out


@given(
    lines=st.lists(
        st.sampled_from(
            [
                "User-agent: *",
                "User-agent: botA",
                "User-agent: botB",
                "Disallow: /x",
                "Disallow: /x/y",
                "Allow: /x/ok",
                "Disallow:",
                "Disallow: /w*",
                "# comment",
                "",
                "Sitemap: https://a.com/s.xml",
                "Crawl-delay: 2",
                "Disallow: /z   # tail",
            ]
        ),
        min_size=0,
        max_size=10,
    ),
    agent=st.sampled_from(["botA", "botB", "nobody", "*"]),
)
@settings(**dict(_SETTINGS, max_examples=30))
def test_parse_robots_matches_reference(spark, lines, agent):
    """Arbitrary interleavings of UA runs, rules, comments and noise:
    group formation, same-UA merging and exact-beats-star resolution
    must equal the reference."""
    from alaska_etl_spark.operators.urls import parse_robots

    body = "\n".join(lines)
    df = spark.createDataFrame([("a.com", body)], "host string, body string")
    got = {
        (r["rule_kind"], r["path"], r["is_wildcard"])
        for r in parse_robots(df, "host", "body", agent=agent).collect()
    }
    assert got == _py_parse_robots(body, agent)


def test_parse_robots_empty_named_group_is_unrestricted(spark):
    """r11 verdict falsifying example, pinned explicitly: a named UA
    group with ZERO rules still claims the agent (RFC 9309 §2.2.1) —
    the * group's rules must NOT leak in. The r11 operator derived
    named-hosts from rule rows, so the empty group fell through to *."""
    from alaska_etl_spark.operators.urls import parse_robots

    body = "User-agent: *\nDisallow: /x\nUser-agent: botA"
    df = spark.createDataFrame([("a.com", body)], "host string, body string")
    assert parse_robots(df, "host", "body", agent="botA").collect() == []
    # the * agent (and an unnamed one) still sees the star rules
    got = {
        (r["rule_kind"], r["path"])
        for r in parse_robots(df, "host", "body", agent="nobody").collect()
    }
    assert got == {("disallow", "/x")}


def _py_robots_directives(body, agent):
    """Reference for robots_directives: Sitemap records are
    host-global; Crawl-delay values resolve through the same §2.2.1
    group resolution as rules (exact-agent groups beat *, group
    grain)."""
    import re

    groups = []  # (set_of_agents, [delay_values])
    sitemaps = set()
    cur_agents, cur_delays, in_ua_run = None, None, False
    for raw in body.split("\n"):
        line = re.sub(r"#.*$", "", raw).strip()
        m = re.match(r"^([A-Za-z-]+)\s*:(.*)$", line)
        if not m:
            continue
        key, val = m.group(1).lower(), m.group(2).strip()
        if key == "sitemap":
            sitemaps.add(val)
        elif key == "user-agent":
            if not in_ua_run:
                cur_agents, cur_delays = set(), []
                groups.append((cur_agents, cur_delays))
            cur_agents.add(val.lower())
            in_ua_run = True
        elif key in ("allow", "disallow", "crawl-delay"):
            if key == "crawl-delay" and cur_delays is not None:
                cur_delays.append(val)
            in_ua_run = False
    target = agent.lower()
    named = [g for g in groups if target in g[0]]
    use = named if (target != "*" and named) else [
        g for g in groups if "*" in g[0]
    ]
    out = {("sitemap", s) for s in sitemaps}
    for _, delays in use:
        out |= {("crawl-delay", v) for v in delays}
    return out


@given(
    lines=st.lists(
        st.sampled_from(
            [
                "User-agent: *",
                "User-agent: botA",
                "Crawl-delay: 2",
                "Crawl-delay: 10",
                "Disallow: /x",
                "Sitemap: https://a.com/s.xml",
                "Sitemap: https://a.com/t.xml",
                "# comment",
                "",
            ]
        ),
        min_size=0,
        max_size=8,
    ),
    agent=st.sampled_from(["botA", "nobody", "*"]),
)
@settings(**dict(_SETTINGS, max_examples=20))
def test_robots_directives_matches_reference(spark, lines, agent):
    from alaska_etl_spark.operators.urls import robots_directives

    body = "\n".join(lines)
    df = spark.createDataFrame([("a.com", body)], "host string, body string")
    got = {
        (r["directive"], r["value"])
        for r in robots_directives(df, "host", "body", agent=agent).collect()
    }
    assert got == _py_robots_directives(body, agent)
