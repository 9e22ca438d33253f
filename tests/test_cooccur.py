"""Item-item co-occurrence similarity tests."""

import math

from alaska_etl_spark.operators.cooccur import copurchase_similarity


def test_copurchase_counts_and_cosine(spark):
    rows = [
        (1, "A"), (1, "B"), (1, "B"),   # duplicate incidence collapses
        (2, "A"), (2, "B"),
        (3, "A"), (3, "C"),
        (4, "B"),
    ]
    df = spark.createDataFrame(rows, "u bigint, i string")
    out = {
        (r.item_a, r.item_b): r
        for r in copurchase_similarity(df, "u", "i").collect()
    }
    ab = out[("A", "B")]
    assert (ab.co, ab.n_a, ab.n_b) == (2, 3, 3)
    assert ab.cosine == 2 / math.sqrt(9.0)
    ac = out[("A", "C")]
    assert (ac.co, ac.n_a, ac.n_b) == (1, 3, 1)
    assert ("B", "C") not in out  # never co-occur


def test_copurchase_whale_cap_drops_user(spark):
    rows = [(1, f"i{k}") for k in range(5)] + [(2, "i0"), (2, "i1")]
    df = spark.createDataFrame(rows, "u bigint, i string")
    out = {
        (r.item_a, r.item_b): r
        for r in copurchase_similarity(df, "u", "i", max_items=3).collect()
    }
    # user 1 (5 items) is dropped whole: only user 2's single pair remains
    assert set(out) == {("i0", "i1")}
    r = out[("i0", "i1")]
    # totals count only kept users
    assert (r.co, r.n_a, r.n_b) == (1, 1, 1) and r.cosine == 1.0


def test_copurchase_min_co_threshold(spark):
    rows = [(u, i) for u in (1, 2, 3) for i in ("x", "y")] + [(1, "z")]
    df = spark.createDataFrame(rows, "u bigint, i string")
    out = copurchase_similarity(df, "u", "i", min_co=2).collect()
    assert {(r.item_a, r.item_b) for r in out} == {("x", "y")}
    assert out[0].co == 3
