"""Deterministic split/sample/mix: stability, proportions, nesting,
group consistency, and cross-engine parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from alaska_etl_spark.operators.splits import (
    hash_bucket,
    hash_bucket_sql,
    hash_sample,
    hash_split,
    mix_sources,
)


@pytest.fixture()
def ids(spark):
    return spark.range(0, 20000).withColumnRenamed("id", "doc_id")


def test_split_deterministic_and_proportional(ids):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = hash_split(ids, "doc_id", weights=w, seed=3)
    s2 = hash_split(ids.repartition(7), "doc_id", weights=w, seed=3)
    c1 = {r.split: r["count"] for r in s1.groupBy("split").count().collect()}
    c2 = {r.split: r["count"] for r in s2.groupBy("split").count().collect()}
    assert c1 == c2  # partitioning-independent
    assert abs(c1["train"] / 20000 - 0.8) < 0.02
    assert abs(c1["val"] / 20000 - 0.1) < 0.01
    assert abs(c1["test"] / 20000 - 0.1) < 0.01


def test_split_rejects_bad_weights(ids):
    with pytest.raises(ValueError):
        hash_split(ids, "doc_id", weights={"a": 0.5, "b": 0.2})


def test_sample_nested_and_independent(ids):
    small = {r.doc_id for r in hash_sample(ids, "doc_id", 0.1, seed=5).collect()}
    big = {r.doc_id for r in hash_sample(ids, "doc_id", 0.2, seed=5).collect()}
    assert small <= big  # same seed: nested
    assert abs(len(big) / 20000 - 0.2) < 0.02
    other = {r.doc_id for r in hash_sample(ids, "doc_id", 0.1, seed=6).collect()}
    overlap = len(small & other) / len(small)
    assert abs(overlap - 0.1) < 0.05  # different seed: ~independent


def test_bucket_sql_identical_in_duckdb(ids):
    got = {(r.doc_id, r.b) for r in ids.select("doc_id", hash_bucket("doc_id", seed=11).alias("b")).limit(2000).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT range AS doc_id FROM range(0, 20000)")
    sql = f"SELECT doc_id, {hash_bucket_sql('doc_id', seed=11)} AS b FROM t WHERE doc_id < 2000"
    want = set(map(tuple, con.execute(sql).fetchall()))
    got2k = {(d, b) for d, b in got if d < 2000}
    assert got2k == want


def test_group_consistent_split(spark):
    """Assigning on a group key keeps whole dup-families on one side."""
    members = spark.createDataFrame(
        [(i, i // 4) for i in range(4000)], "doc_id bigint, group_id bigint"
    )
    groups = members.select("group_id").distinct()
    gsplit = hash_split(groups, "group_id", weights={"train": 0.5, "test": 0.5}, seed=1)
    joined = members.join(gsplit, "group_id")
    per_group = joined.groupBy("group_id").agg(F.countDistinct("split").alias("n"))
    assert per_group.filter("n > 1").count() == 0


def test_mix_sources_tags_and_rates(spark):
    a = spark.range(0, 10000).withColumnRenamed("id", "doc_id")
    b = spark.range(10000, 20000).withColumnRenamed("id", "doc_id")
    mixed = mix_sources([(a, 1.0), (b, 0.25)], "doc_id", seed=2)
    counts = {r.source_idx: r["count"] for r in mixed.groupBy("source_idx").count().collect()}
    assert counts[0] == 10000
    assert abs(counts[1] / 10000 - 0.25) < 0.02


def test_pack_sequences_offsets_contiguous(spark):
    """Within a shard, offsets are an exclusive prefix sum of lengths in
    the deterministic hash order; seq_idx = offset div budget."""
    from alaska_etl_spark.operators.splits import pack_sequences

    df = spark.createDataFrame(
        [(i, 100 + (i * 37) % 400) for i in range(500)], "doc_id bigint, n bigint"
    )
    out = pack_sequences(df, "doc_id", "n", budget=1000, n_shards=4, seed=9)
    rows = out.orderBy("shard", "start_offset").collect()
    lens = {r.doc_id: 100 + (r.doc_id * 37) % 400 for r in df.collect()}
    by_shard: dict[int, int] = {}
    for r in rows:
        expect = by_shard.get(r.shard, 0)
        assert r.start_offset == expect, (r.doc_id, r.shard)
        assert r.seq_idx == r.start_offset // 1000
        by_shard[r.shard] = expect + lens[r.doc_id]
    # deterministic under repartitioning
    again = {
        (r.doc_id, r.shard, r.start_offset)
        for r in pack_sequences(df.repartition(13), "doc_id", "n", budget=1000, n_shards=4, seed=9).collect()
    }
    assert again == {(r.doc_id, r.shard, r.start_offset) for r in rows}


def test_pack_sequences_rejects_bad_budget(spark):
    from alaska_etl_spark.operators.splits import pack_sequences

    df = spark.range(5).withColumnRenamed("id", "doc_id").withColumn("n", F.lit(10))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "n", budget=0)


def test_split_sample_mix_are_narrow(spark):
    """Split/sample/mix must be pure projections and filters: zero
    Exchange anywhere in their plans."""
    from alaska_etl_spark.operators.splits import hash_sample, hash_split, mix_sources

    ids = spark.range(1000).withColumnRenamed("id", "doc_id")
    for df in (
        hash_split(ids, "doc_id", weights={"a": 0.5, "b": 0.5}),
        hash_sample(ids, "doc_id", 0.3),
        mix_sources([(ids, 1.0), (ids, 0.5)], "doc_id"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_pack_sequences_single_exchange(spark):
    """Packing pays exactly one shuffle: the shard-keyed window."""
    from alaska_etl_spark.operators.splits import pack_sequences

    ids = spark.range(1000).selectExpr("id AS doc_id", "id % 7 + 1 AS n")
    plan = (
        pack_sequences(ids, "doc_id", "n", budget=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_stratified_sample_exact_quotas(spark):
    from alaska_etl_spark.operators.splits import stratified_sample

    df = spark.range(1000).selectExpr(
        "id AS key", "CAST(id % 3 AS STRING) AS grp"
    )
    out = stratified_sample(df, ["grp"], "key", 25)
    counts = {r.grp: r.n for r in out.groupBy("grp").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"0": 25, "1": 25, "2": 25}


def test_stratified_sample_small_stratum_keeps_all(spark):
    from alaska_etl_spark.operators.splits import stratified_sample

    df = spark.range(10).selectExpr("id AS key", "'only' AS grp")
    assert stratified_sample(df, ["grp"], "key", 25).count() == 10


def test_stratified_sample_deterministic_and_seed_sensitive(spark):
    from alaska_etl_spark.operators.splits import stratified_sample

    df = spark.range(500).selectExpr("id AS key", "CAST(id % 2 AS STRING) AS grp")
    a = {r.key for r in stratified_sample(df, ["grp"], "key", 50).collect()}
    b = {r.key for r in stratified_sample(df.repartition(7), ["grp"], "key", 50).collect()}
    c = {r.key for r in stratified_sample(df, ["grp"], "key", 50, seed=9).collect()}
    assert a == b          # partitioning-independent
    assert a != c          # seed changes the draw


# --- Efraimidis-Spirakis weighted sampling ----------------------------------


def test_weighted_sample_deterministic_and_partition_independent(spark):
    from alaska_etl_spark.operators.splits import weighted_sample

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7 + 1).cast("double").alias("w")
    )
    a = {r.id for r in weighted_sample(df, "id", "w", 50, seed=3).collect()}
    b = {
        r.id
        for r in weighted_sample(df.repartition(13), "id", "w", 50, seed=3).collect()
    }
    assert a == b and len(a) == 50


def test_weighted_sample_prefers_heavy_rows(spark):
    from alaska_etl_spark.operators.splits import weighted_sample

    # half the keys carry 20x the weight; across seeds they must win the
    # large majority of the sample slots.
    df = spark.range(2000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, 20.0).otherwise(1.0).alias("w"),
    )
    heavy_share = []
    for seed in range(5):
        got = weighted_sample(df, "id", "w", 200, seed=seed).collect()
        heavy_share.append(sum(1 for r in got if r.id % 2 == 0) / len(got))
    assert sum(heavy_share) / len(heavy_share) > 0.85


def test_weighted_sample_excludes_nonpositive_and_null(spark):
    from alaska_etl_spark.operators.splits import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)], "id bigint, w double"
    )
    got = {r.id for r in weighted_sample(df, "id", "w", 10).collect()}
    assert got == {1, 5}


def test_weighted_sample_plan_is_topk_not_global_sort(spark):
    from alaska_etl_spark.operators.splits import weighted_sample

    df = spark.range(10_000).select(F.col("id"), F.lit(1.0).alias("w"))
    out = weighted_sample(df, "id", "w", 10)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# --- temperature-based source rebalancing -----------------------------------


def _skewed(spark):
    # source a: 2500 rows, b: 400, c: 100
    return spark.range(3000).select(
        F.col("id"),
        F.when(F.col("id") < 2500, "a").when(F.col("id") < 2900, "b").otherwise("c").alias("src"),
    )


def test_temperature_flattens_toward_sqrt(spark):
    from alaska_etl_spark.operators.splits import temperature_sample

    out = temperature_sample(_skewed(spark), "src", "id", alpha=0.5, seed=1)
    kept = {r.src: r.n for r in out.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    # expected kept_i = sqrt(n_min * n_i): a->500, b->200, c->100
    assert kept["c"] == 100  # smallest source keeps everything
    assert abs(kept["a"] - 500) < 60  # hash-uniform, ~binomial(2500, 0.2)
    assert abs(kept["b"] - 200) < 40
    # the 25x skew flattened to ~5x
    assert 3.5 < kept["a"] / kept["c"] < 6.5


def test_temperature_alpha_one_is_identity(spark):
    from alaska_etl_spark.operators.splits import temperature_sample

    df = _skewed(spark)
    assert temperature_sample(df, "src", "id", alpha=1.0).count() == df.count()


def test_temperature_sample_is_deterministic_and_nested(spark):
    from alaska_etl_spark.operators.splits import temperature_sample

    df = _skewed(spark)
    a = {r.id for r in temperature_sample(df, "src", "id", alpha=0.5, seed=9).collect()}
    b = {
        r.id
        for r in temperature_sample(df.repartition(17), "src", "id", alpha=0.5, seed=9).collect()
    }
    assert a == b


# --- mix entropy / KL (qc9) ------------------------------------------------

def test_mix_entropy_uniform_is_ln_k(spark):
    import math

    from alaska_etl_spark.operators.splits import mix_entropy

    df = spark.createDataFrame(
        [(s, i) for s in ("a", "b", "c", "d") for i in range(5)], "source string, x bigint"
    )
    rows = mix_entropy(df, "source").collect()
    assert len(rows) == 4
    for r in rows:
        assert r.share == 0.25
        assert r.entropy_total == round(math.log(4), 6)
        assert r.kl_vs_uniform == 0.0


def test_mix_entropy_degenerate_single_source(spark):
    from alaska_etl_spark.operators.splits import mix_entropy

    df = spark.createDataFrame([("only", 1)], "source string, x bigint")
    r = mix_entropy(df, "source").collect()[0]
    assert (r.share, r.entropy_total, r.kl_vs_uniform) == (1.0, 0.0, 0.0)


def test_mix_entropy_weighted_matches_manual(spark):
    import math

    from alaska_etl_spark.operators.splits import mix_entropy

    df = spark.createDataFrame([("a", 30), ("b", 10)], "source string, n bigint")
    rows = {r.source: r for r in mix_entropy(df, "source", weight_col="n").collect()}
    assert rows["a"].share == 0.75
    h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert rows["a"].entropy_total == round(h, 6)
    kl = 0.75 * math.log(0.75 * 2) + 0.25 * math.log(0.25 * 2)
    assert rows["b"].kl_vs_uniform == round(kl, 6)


# --- top-p coverage (qd0) --------------------------------------------------

def test_top_p_keeps_prefix_plus_crossing_group(spark):
    from alaska_etl_spark.operators.splits import top_p_coverage

    df = spark.createDataFrame(
        [("en", "web", 50), ("en", "books", 30), ("en", "code", 15), ("en", "chat", 5)],
        "lang string, source string, n bigint",
    )
    out = top_p_coverage(df, strata_cols=["lang"], group_col="source", weight_col="n", p=0.9)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    # cum shares: .5, .8, .95 (crosses 0.9 → kept), chat would start at .95 ≥ .9 → cut
    assert [r.source for r in rows] == ["web", "books", "code"]
    assert rows[-1].cum_share == 0.95


def test_top_p_tie_breaks_by_group_name(spark):
    from alaska_etl_spark.operators.splits import top_p_coverage

    df = spark.createDataFrame(
        [("en", "zz", 10), ("en", "aa", 10)], "lang string, source string, n bigint"
    )
    rows = sorted(
        top_p_coverage(df, strata_cols=["lang"], group_col="source", weight_col="n", p=0.6).collect(),
        key=lambda r: r.rank,
    )
    # equal weights → name ascending; p=0.6 keeps aa (cum .5 < .6 starts) and zz crosses
    assert [r.source for r in rows] == ["aa", "zz"]


def test_top_p_strata_are_independent(spark):
    from alaska_etl_spark.operators.splits import top_p_coverage

    df = spark.createDataFrame(
        [("en", "web", 99), ("en", "books", 1), ("de", "news", 1)],
        "lang string, source string, n bigint",
    )
    out = top_p_coverage(df, strata_cols=["lang"], group_col="source", weight_col="n", p=0.5)
    got = {(r.lang, r.source) for r in out.collect()}
    assert got == {("en", "web"), ("de", "news")}


def test_split_leakage_reports_only_cross_split_near_dups(spark):
    from alaska_etl_spark.operators.splits import hash_split, split_leakage

    texts = {
        0: "alpha beta gamma delta",
        1: "alpha beta gamma epsilon",   # near-dup of 0 (J = 3/5)
        2: "zeta eta theta iota",
        3: "zeta eta theta iota",        # exact dup of 2
        4: "totally different words here",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    arms = {r.doc_id: r.s for r in hash_split(
        df, "doc_id", weights={"train": 0.9, "val": 0.1}, split_col="s").collect()}
    out = split_leakage(
        df, "doc_id", "text", weights={"train": 0.9, "val": 0.1},
        tau_num=1, tau_den=2,
    ).collect()
    got = {(r.id_a, r.id_b) for r in out}
    # expected: near-dup pairs (0,1) and (2,3) IF their splits differ
    want = {
        p for p in [(0, 1), (2, 3)]
        if arms[p[0]] != arms[p[1]]
    }
    assert got == want
    for r in out:
        assert r.split_a != r.split_b
        assert r.jaccard >= 0.5


def test_target_encode_oof_excludes_own_fold(spark):
    from alaska_etl_spark.operators.splits import hash_bucket, target_encode_oof
    from pyspark.sql import functions as F

    # build rows whose folds we can read back, then verify the OOF
    # arithmetic exactly in Python
    rows = [(i, "A" if i % 2 == 0 else "B", float(i + 1)) for i in range(40)]
    df = spark.createDataFrame(rows, "id bigint, cat string, y double")
    folds = {
        r.id: r.f
        for r in df.select("id", (hash_bucket("id", seed=7) % 3).alias("f")).collect()
    }
    out = {r.id: r for r in target_encode_oof(
        df, "id", "cat", "y", n_folds=3, seed=7, smoothing=5
    ).collect()}
    assert len(out) == 40
    cents = {i: round((i + 1) * 100) for i, _, _ in rows}
    gs, gn = sum(cents.values()), len(rows)
    for i, cat, _ in rows:
        mine = [j for j, c, _ in rows if c == cat]
        oof = [j for j in mine if folds[j] != folds[i]]
        num = sum(cents[j] for j in oof) * gn + 5 * gs
        den = (len(oof) + 5) * gn
        exp = ((2 * 10000 * num + den) // (2 * den)) / 10000.0
        assert out[i].enc == exp, f"id {i}"
        assert out[i].n_oof == len(oof)


def test_target_encode_oof_singleton_category_gets_prior(spark):
    from alaska_etl_spark.operators.splits import target_encode_oof

    rows = [(1, "solo", 100.0)] + [(i, "big", 10.0) for i in range(2, 12)]
    df = spark.createDataFrame(rows, "id bigint, cat string, y double")
    out = {r.id: r for r in target_encode_oof(
        df, "id", "cat", "y", n_folds=5, seed=7, smoothing=10
    ).collect()}
    # the solo row's category has no other fold mass -> pure prior G_s/G_n
    gs = 10000 + 10 * 1000
    gn = 11
    exp = ((2 * 10000 * (10 * gs) + 10 * gn) // (2 * 10 * gn)) / 10000.0
    assert out[1].n_oof == 0 and out[1].enc == exp


def test_token_waterfill_exact_budget(spark):
    from alaska_etl_spark.operators.splits import token_waterfill

    counts = spark.createDataFrame(
        [("s1", 10), ("s2", 20), ("s3", 100), ("s4", 200)],
        "source string, n bigint",
    )
    # total 330, budget = 330*3 div 5 = 198; s1,s2 full (30);
    # remaining 168 over 2 -> level 84, remainder 0
    out = {r.source: r for r in token_waterfill(
        counts, "source", "n", budget_num=3, budget_den=5
    ).collect()}
    assert out["s1"].tokens_allocated == 10 and not out["s1"].capped
    assert out["s2"].tokens_allocated == 20 and not out["s2"].capped
    assert out["s3"].tokens_allocated == 84 and out["s3"].capped
    assert out["s4"].tokens_allocated == 84 and out["s4"].capped
    assert sum(r.tokens_allocated for r in out.values()) == 198

    # remainder distribution: budget = 330 div 2 = 165; full 30,
    # remaining 135 over 2 -> level 67 r 1 -> s3 gets 68 (smaller capped)
    out2 = {r.source: r for r in token_waterfill(
        counts, "source", "n", budget_num=1, budget_den=2
    ).collect()}
    assert out2["s3"].tokens_allocated == 68
    assert out2["s4"].tokens_allocated == 67
    assert sum(r.tokens_allocated for r in out2.values()) == 165

    # budget >= total: everyone full, nobody capped
    out3 = token_waterfill(counts, "source", "n", budget_num=2, budget_den=1).collect()
    assert all(r.tokens_allocated == r.tokens_available and not r.capped for r in out3)


def test_dsir_weights_semantics(spark):
    # r11 X180: raw docs made of target-heavy grams score positive,
    # raw-only grams score negative; target docs and zero-token docs
    # emit no row; both hash lanes agree on sign/order.
    from alaska_etl_spark.operators.splits import dsir_weights

    rows = [
        (1, "good tokens good tokens", True),
        (2, "good tokens good tokens", True),
        (3, "good tokens good stuff", False),   # target-like raw doc
        (4, "junk noise junk noise", False),     # raw-only grams
        (5, "", False),                           # zero-token: no row
    ]
    df = spark.createDataFrame(rows, "id bigint, text string, tgt boolean")
    for lane in ("xxhash64", "md5"):
        got = {
            r["id"]: r["weight_units"]
            for r in dsir_weights(df, "id", "text", "tgt", n=2, hash_fn=lane).collect()
        }
        assert set(got) == {3, 4}
        assert got[3] > got[4]
        assert got[3] > 0 > got[4]
