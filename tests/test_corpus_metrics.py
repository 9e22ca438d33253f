"""Round-7 corpus-metric operators: n-gram diversity, Zipf slope, ANN
recall evaluation, LSH blocking quality."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


def test_ngram_diversity_counts(spark):
    from alaska_etl_spark.operators.text import ngram_diversity

    df = _docs(
        spark,
        [
            ("a", "x y x y"),          # 4 unigrams (2 distinct), 3 bigrams (2), 2 trigrams (2)
            ("a", "z"),                # 1 unigram, no bi/trigrams (short doc)
            ("b", "p p p"),            # 3 unigrams (1), 2 bigrams (1), 1 trigram (1)
        ],
    )
    out = {
        (r.source, r.n): (r.total_grams, r.distinct_grams, r.distinct_bp)
        for r in ngram_diversity(df, "source", "text").collect()
    }
    assert out[("a", 1)] == (5, 3, 6000)
    assert out[("a", 2)] == (3, 2, 6667)   # 'x y','y x','x y' → 2/3
    assert out[("a", 3)] == (2, 2, 10000)  # 'x y x','y x y'
    assert out[("b", 1)] == (3, 1, 3333)
    assert out[("b", 2)] == (2, 1, 5000)
    assert out[("b", 3)] == (1, 1, 10000)


def test_zipf_slope_matches_numpy_fit(spark):
    import numpy as np

    from alaska_etl_spark.operators.text import zipf_slope

    # freqs 8,4,2,1 over ranks 1..4 → clean log-log line
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    row = zipf_slope(_docs(spark, [("s", text)]), "source", "text").collect()[0]
    assert row.n_types == 4
    x = np.log(np.arange(1, 5))
    y = np.log(np.array([8.0, 4.0, 2.0, 1.0]))
    slope, intercept = np.polyfit(x, y, 1)
    assert math.isclose(row.slope, slope, abs_tol=1e-6)
    assert math.isclose(row.intercept, intercept, abs_tol=1e-6)


def test_zipf_degenerate_group_emits_null(spark):
    from alaska_etl_spark.operators.text import zipf_slope

    row = zipf_slope(_docs(spark, [("s", "a a a")]), "source", "text").collect()[0]
    assert row.n_types == 1
    assert row.slope is None and row.intercept is None


def test_ann_recall_exhaustive_probe_is_perfect(spark):
    from alaska_etl_spark.operators.similarity import ann_recall

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    out = ann_recall(emb, q, k=5, ncells=8, nprobe=8).collect()
    assert len(out) == 5
    # probing every cell makes the candidate set the whole corpus: the
    # approximate top-k equals the exact top-k up to score-rounding
    # ties, which this corpus doesn't produce
    assert all(r.recall_bp == 10000 for r in out)
    assert all(r.n_truth == 5 and r.n_hit == 5 for r in out)


def test_ann_recall_bounded_and_monotone_in_nprobe(spark):
    from alaska_etl_spark.operators.similarity import ann_recall

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    r1 = {r.query_id: r.recall_bp for r in ann_recall(emb, q, k=5, ncells=8, nprobe=1).collect()}
    r4 = {r.query_id: r.recall_bp for r in ann_recall(emb, q, k=5, ncells=8, nprobe=4).collect()}
    assert all(0 <= v <= 10000 for v in r1.values())
    # more probes can only add candidates → per-query recall is monotone
    assert all(r4[k] >= r1[k] for k in r1)


def test_blocking_quality_hits_equal_verified_lsh_pairs(spark):
    from alaska_etl_spark.operators.dedup import (
        blocking_quality,
        minhash_near_dup_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    row = blocking_quality(
        docs, "doc_id", "text", n=3, num_hashes=64, bands=16,
        threshold_num=1, threshold_den=2,
    ).collect()[0]
    # truth ∩ candidates IS the verified LSH pair set: same shingles,
    # same bands, same threshold
    lsh = minhash_near_dup_pairs(
        docs, "doc_id", "text", n=3, num_hashes=64, bands=16,
        jaccard_threshold=0.5,
    ).count()
    assert row.n_hit == lsh
    assert row.n_hit <= row.n_true
    assert row.n_candidates <= row.n_universe_pairs
    assert 0 <= row.completeness_bp <= 10000
    assert 0 <= row.reduction_bp <= 10000


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "query_id int, doc_id bigint, rank int")


def test_rbo_identical_and_disjoint(spark):
    from alaska_etl_spark.operators.ranking import rank_biased_overlap

    same = [(1, d, r) for r, d in enumerate(range(100, 110), start=1)]
    other = [(1, d, r) for r, d in enumerate(range(200, 210), start=1)]
    a = _ranking(spark, same)
    # identical rankings → truncated RBO@10 = (1-p)·Σ p^(i-1) = 1 - p^10
    out = rank_biased_overlap(a, _ranking(spark, same)).collect()[0]
    expect_units = sum(
        round(1e9 * (i * 1 * 9 ** (i - 1)) / (i * 10**i)) for i in range(1, 11)
    )
    assert out.rbo_units == expect_units
    assert abs(out.rbo - (1 - 0.9**10)) < 1e-6
    # disjoint rankings → 0 (query still present)
    out = rank_biased_overlap(a, _ranking(spark, other)).collect()[0]
    assert out.rbo_units == 0 and out.rbo == 0.0


def test_rbo_matches_python_reference(spark):
    from alaska_etl_spark.operators.ranking import rank_biased_overlap

    a_items = [5, 3, 9, 1, 7]
    b_items = [3, 5, 1, 9, 8]
    a = _ranking(spark, [(1, d, r) for r, d in enumerate(a_items, 1)])
    b = _ranking(spark, [(1, d, r) for r, d in enumerate(b_items, 1)])
    out = rank_biased_overlap(a, b, depth=5).collect()[0]
    units = 0
    for i in range(1, 6):
        x = len(set(a_items[:i]) & set(b_items[:i]))
        units += round(1e9 * (x * 1 * 9 ** (i - 1)) / (i * 10**i))
    assert out.rbo_units == units


def test_cdc_chunks_duplicate_and_unique(spark):
    from alaska_etl_spark.operators.dedup import cdc_chunk_stats

    text = " ".join(f"tok{i}" for i in range(200))
    df = spark.createDataFrame(
        [
            (1, "dup", text),
            (2, "dup", text),          # exact twin: every chunk repeats
            (3, "uniq", " ".join(f"only{i}" for i in range(150))),
        ],
        "doc_id bigint, source string, text string",
    )
    out = {r.source: r for r in cdc_chunk_stats(df, "doc_id", "text", "source").collect()}
    d = out["dup"]
    assert d.n_dup_chunks == d.n_chunks and d.dup_token_bp == 10000
    assert d.total_tokens == 400 and d.dup_tokens == 400
    u = out["uniq"]
    assert u.n_dup_chunks == 0 and u.dup_tokens == 0 and u.dup_token_bp == 0
    assert u.total_tokens == 150


def test_cdc_boundaries_are_content_defined(spark):
    """Prefix insertion shifts positions but not content boundaries:
    the tail chunks of the shifted doc re-align and dedup against the
    original."""
    from alaska_etl_spark.operators.dedup import cdc_chunk_stats

    base = " ".join(f"w{i}" for i in range(300))
    df = spark.createDataFrame(
        [(1, "s", base), (2, "s", "inserted prefix words " + base)],
        "doc_id bigint, source string, text string",
    )
    r = cdc_chunk_stats(df, "doc_id", "text", "source").collect()[0]
    # everything after each doc's first boundary chunks identically →
    # a large majority of token mass deduplicates despite the shift
    assert r.dup_tokens > r.total_tokens * 0.8


def test_ann_ndcg_perfect_under_exhaustive_probe(spark):
    from alaska_etl_spark.operators.similarity import ann_ndcg

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    out = ann_ndcg(emb, q, k=5, ncells=8, nprobe=8).collect()
    assert len(out) == 5
    # exhaustive probing returns the ideal list → DCG == IDCG exactly
    assert all(r.dcg_units == r.idcg_units and r.ndcg == 1.0 for r in out)


def test_ann_ndcg_bounded_and_no_better_than_ideal(spark):
    from alaska_etl_spark.operators.similarity import ann_ndcg

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    out = ann_ndcg(emb, q, k=5, ncells=8, nprobe=1).collect()
    # a probe-limited list can only lose relevance mass vs the ideal
    assert all(r.dcg_units <= r.idcg_units for r in out)
    assert all(r.ndcg is None or 0.0 <= r.ndcg <= 1.0 for r in out)


def test_tokenizer_fertility_hand_counts(spark):
    from alaska_etl_spark.plans.queries import qm7_tokenizer_fertility

    # direct operator math on a hand frame via the same expressions
    from alaska_etl_spark.operators.text import bpe_ish_token_count, token_count

    df = spark.createDataFrame([("s", "ab c1 d!e")], "source string, text string")
    row = df.select(
        token_count("text").alias("w"), bpe_ish_token_count("text").alias("t")
    ).collect()[0]
    assert row.w == 3            # whitespace words
    assert row.t == 6            # ab | c | 1 | d | ! | e


def test_langid_confusion_semantics(spark):
    from alaska_etl_spark.operators.text import lang_id

    df = spark.createDataFrame(
        [
            ("en", "the report and the findings for the quarter"),
            ("de", "der bericht und die ergebnisse für das quartal"),
            ("zh", "这 是 中文 文本 没有 标记"),  # no markers → und
        ],
        "lang string, text string",
    )
    out = {r.lang: r.p for r in df.select("lang", lang_id("text").alias("p")).collect()}
    assert out["en"] == "en"
    assert out["de"] == "de"
    assert out["zh"] == "und"


def test_mixture_report_dedup_attribution_and_shares(spark):
    from alaska_etl_spark.operators.splits import mixture_report

    good = (
        "The quarterly report shows steady improvement across all regional "
        "offices with satisfaction rising for the third consecutive period."
    )
    other = (
        "Operational costs held flat despite the expansion of the northern "
        "monitoring stations during the last winter measurement campaign."
    )
    df = spark.createDataFrame(
        [
            ("a", good),
            ("b", good),     # cross-source exact duplicate → attributed to 'a'
            ("b", other),
        ],
        "source string, text string",
    )
    out = {r.source: r for r in mixture_report(df, "source", "text").collect()}
    assert out["a"].n_docs == 1 and out["b"].n_docs == 2
    assert out["a"].n_unique_docs == 1
    assert out["b"].n_unique_docs == 1   # the duplicate went to 'a'
    assert out["a"].unique_tokens > 0 and out["b"].unique_tokens > 0
    # weights are shares of quality-weighted unique tokens → sum ≈ 1
    assert abs(out["a"].weight_bp + out["b"].weight_bp - 10000) <= 1
    assert 0 <= out["a"].quality_bp <= 10000
