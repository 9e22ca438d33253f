"""Bloom-filter join pruning (operators/pruning.py): the no-false-
negative contract, the false-positive budget, result identity with the
exact semi join, and the narrow (pre-shuffle) plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from alaska_etl_spark.operators.pruning import (
    bloom_params,
    bloom_prune,
    bloom_pruned_semi_join,
    build_bloom,
)


def test_no_false_negatives_ever(spark):
    keys = spark.range(0, 2000, 3).select(F.col("id").alias("k"))  # every 3rd
    fact = spark.range(2000).select(F.col("id").alias("k"))
    m, h = bloom_params(700, 0.01)
    packed = build_bloom(keys, "k", m_bits=m, n_hashes=h)
    pruned = {r.k for r in bloom_prune(fact, packed, "k", m_bits=m, n_hashes=h).collect()}
    truth = {r.k for r in keys.collect()}
    assert truth <= pruned  # superset: pruning never loses a match


def test_false_positive_rate_near_theory(spark):
    fpp = 0.01
    keys = spark.range(5000).select(F.col("id").alias("k"))
    probe = spark.range(100_000, 200_000).select(F.col("id").alias("k"))  # disjoint
    m, h = bloom_params(5000, fpp)
    packed = build_bloom(keys, "k", m_bits=m, n_hashes=h)
    n_pass = bloom_prune(probe, packed, "k", m_bits=m, n_hashes=h).count()
    assert n_pass / 100_000 < 3 * fpp  # generous: xxhash64 isn't pathological


def test_pruned_semi_join_identical_to_exact(spark):
    li = spark.range(10_000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(0, 97, 5).select(F.col("id").alias("k"))
    got = {
        (r.k, r.v) for r in bloom_pruned_semi_join(li, dim, "k", fpp=0.05).collect()
    }
    want = {(r.k, r.v) for r in li.join(dim, ["k"], "left_semi").collect()}
    assert got == want


def test_prune_is_narrow_no_exchange(spark):
    # the whole point: the filter runs before any shuffle
    fact = spark.range(10_000).select(F.col("id").alias("k"))
    m, h = bloom_params(100, 0.01)
    packed = build_bloom(spark.range(100).select(F.col("id").alias("k")), "k", m_bits=m, n_hashes=h)
    plan = (
        bloom_prune(fact, packed, "k", m_bits=m, n_hashes=h)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan  # the membership test is Arrow-batched


def test_bloom_params_sane():
    m, h = bloom_params(1_000_000, 0.01)
    assert 9_000_000 < m < 10_500_000  # ~9.6 bits/key at 1% fpp
    assert h in (6, 7)
