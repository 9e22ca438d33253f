"""The conditional corpus-grain-aggregate pin (operators/hints.py;
VERDICT r7 #2): the round-7 100× broadcast-OOM fix pinned every
corpus-/vocab-grain aggregate ``shuffle_hash`` unconditionally, costing
~0.5–0.9 s per lost broadcast at sf0.1. The conditional form keeps the
scale-safety default (pin when big or UNKNOWN) while letting Catalyst
broadcast when the aggregate's INPUT — whose plan estimate derives from
real file bytes, not the aggregate-output row-count guesses the planner
gets wrong — provably fits the driver.

Both directions are pinned here: small input → the simjoin plans
broadcast again (the win-back); threshold forced to 0 → every verify
join is shuffled (the 100× regime stays reachable, re-verified at real
scale by tools/scale_stress.py --x100)."""

from __future__ import annotations

import pytest

from alaska_etl_spark.operators import hints
from alaska_etl_spark.operators.hints import (
    estimated_plan_bytes,
    input_fits_driver,
    pin_corpus_agg,
)
from alaska_etl_spark.operators.simjoin import jaccard_similarity_join


@pytest.fixture()
def docs(spark, tmp_path):
    # parquet round-trip, not a bare createDataFrame: RDD-backed local
    # frames report Long.MaxValue stats (treated as BIG — the safe
    # direction), while the production inputs are parquet scans whose
    # Catalyst estimate is the real file length. The fixture must live
    # in the regime the win-back targets.
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "entirely different text with no overlap at all"),
        (4, "the quick brown fox jumps over the lazy dog"),
    ]
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(p)
    return spark.read.parquet(p)


def test_rdd_backed_frame_counts_as_big(spark):
    """A frame with unknown stats (Long.MaxValue) must take the pinned
    path — unknown is BIG by contract."""
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    assert not input_fits_driver(df)


def test_estimated_plan_bytes_reads_catalyst_stats(docs):
    est = estimated_plan_bytes(docs)
    assert est is not None and 0 < est < hints.DRIVER_SAFE_SCAN_BYTES


def test_input_fits_driver_directions(docs):
    assert input_fits_driver(docs)
    assert not input_fits_driver(docs, threshold_bytes=0)


def test_pin_corpus_agg_small_input_allows_broadcast(docs):
    from pyspark.sql import functions as F

    agg = docs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    joined_free = docs.join(pin_corpus_agg(agg, True), "doc_id")
    joined_pinned = docs.join(pin_corpus_agg(agg, False), "doc_id")
    free_plan = joined_free._jdf.queryExecution().executedPlan().toString()
    pinned_plan = joined_pinned._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" not in free_plan
    assert "BroadcastHashJoin" in free_plan
    assert "ShuffledHashJoin" in pinned_plan


def test_simjoin_broadcasts_on_small_input_and_answers_match(docs, monkeypatch):
    """Same operator, same answer, two physical regimes."""
    out_small = jaccard_similarity_join(
        docs, "doc_id", "text", n=3, threshold_num=1, threshold_den=2
    )
    plan_small = out_small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_small
    rows_small = sorted(map(tuple, out_small.collect()))

    monkeypatch.setattr(hints, "DRIVER_SAFE_SCAN_BYTES", 0)
    out_big = jaccard_similarity_join(
        docs, "doc_id", "text", n=3, threshold_num=1, threshold_den=2
    )
    plan_big = out_big._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan_big
    rows_big = sorted(map(tuple, out_big.collect()))

    assert rows_small == rows_big
    assert rows_small, "fixture must produce at least the exact-dup pair"
