"""All-pairs sparse cosine similarity join (operators/simjoin.py):
hand-computed scores, max_df pruning monotonicity, and the
inverted-index plan shape (no cross join)."""

from __future__ import annotations

import math

from alaska_etl_spark.operators.simjoin import cosine_similarity_join, ngram_tf


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_hand_computed_cosine(spark):
    # unigrams (n=1) for hand math: a={x:2, y:1}, b={x:1, y:1}
    df = _docs(spark, [("a", "x x y"), ("b", "x y")])
    out = cosine_similarity_join(df, "doc_id", "text", n=1, threshold=0.0)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    want = round(3 / math.sqrt(5 * 2), 4)  # (2*1 + 1*1) / (sqrt(5)*sqrt(2))
    assert (r.id_a, r.id_b) == ("a", "b")
    assert r.cosine == want


def test_identical_docs_score_one_and_disjoint_never_pair(spark):
    df = _docs(
        spark,
        [
            ("a", "the quick brown fox jumps"),
            ("b", "the quick brown fox jumps"),
            ("c", "entirely different words here now"),
        ],
    )
    out = cosine_similarity_join(df, "doc_id", "text", n=3, threshold=0.0)
    got = {(r.id_a, r.id_b): r.cosine for r in out.collect()}
    # disjoint docs never meet in the inverted index — no (a,c)/(b,c) row
    assert set(got) == {("a", "b")}
    assert got[("a", "b")] == 1.0


def test_short_doc_whole_text_gram(spark):
    # both docs shorter than n: each contributes one whole-text gram
    df = _docs(spark, [("a", "hi there"), ("b", "hi there"), ("c", "bye")])
    out = cosine_similarity_join(df, "doc_id", "text", n=3, threshold=0.0)
    got = {(r.id_a, r.id_b): r.cosine for r in out.collect()}
    assert got == {("a", "b"): 1.0}


def test_max_df_prunes_hot_grams_scores_only_shrink(spark):
    # 'x' appears in all 4 docs (df=4); 'y z w' only in a and b.
    rows = [
        ("a", "x y z w"),
        ("b", "x y z w"),
        ("c", "x p q r"),
        ("d", "x s t u"),
    ]
    df = _docs(spark, rows)
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_similarity_join(df, "doc_id", "text", n=1, threshold=0.0).collect()
    }
    pruned = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_similarity_join(
            df, "doc_id", "text", n=1, threshold=0.0, max_df=3
        ).collect()
    }
    # hot gram dropped: every surviving pair's score <= exact score
    assert set(pruned) <= set(exact)
    for pair, score in pruned.items():
        assert score <= exact[pair]
    # (a,b) still found — their similarity mass is in rare grams
    assert ("a", "b") in pruned


def test_ngram_tf_counts_multiplicity(spark):
    df = _docs(spark, [("a", "x x x")])
    rows = {(r._g, r._tf) for r in ngram_tf(df, "doc_id", "text", n=1).collect()}
    assert rows == {("x", 3)}


def test_no_cartesian_in_plan(spark):
    df = _docs(spark, [("a", "x y"), ("b", "y z"), ("c", "p q")])
    out = cosine_similarity_join(df, "doc_id", "text", n=1, threshold=0.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
