"""Grid-blocked haversine kNN join (operators/geo.py): equality with
the brute-force distance join, antimeridian wrap, and the equi-join
plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from alaska_etl_spark.operators.geo import haversine_km, knn_join, pseudo_coords


def _brute(spark, left, right, k, radius):
    d = F.round(
        haversine_km(F.col("l.lat"), F.col("l.lon"), F.col("r.lat"), F.col("r.lon")),
        3,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lid").orderBy("distance_km", "rid")
    return (
        left.alias("l")
        .crossJoin(right.alias("r"))
        .select("lid", "rid", d.alias("distance_km"))
        .filter(F.col("distance_km") <= radius)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def test_blocked_equals_brute_force_on_pseudo_coords(spark):
    lat, lon = pseudo_coords("id")
    left = spark.range(400).select(F.col("id").alias("lid"), lat.alias("lat"), lon.alias("lon"))
    lat2, lon2 = pseudo_coords(F.col("id") + 7)
    right = spark.range(150).select(F.col("id").alias("rid"), lat2.alias("lat"), lon2.alias("lon"))
    got = {
        (r.lid, r.rid, r.distance_km, r.rank)
        for r in knn_join(
            left, right, left_id="lid", right_id="rid", k=3, radius_km=500.0
        ).collect()
    }
    want = {
        (r.lid, r.rid, r.distance_km, r.rank)
        for r in _brute(spark, left, right, 3, 500.0).collect()
    }
    assert got == want and got  # identical and non-trivial


def test_antimeridian_pairs_found(spark):
    left = spark.createDataFrame([(1, 10.0, 179.9)], "lid bigint, lat double, lon double")
    right = spark.createDataFrame(
        [(2, 10.0, -179.9), (3, 10.0, 0.0)], "rid bigint, lat double, lon double"
    )
    rows = knn_join(
        left, right, left_id="lid", right_id="rid", k=5, radius_km=100.0
    ).collect()
    # 0.2 deg lon at lat 10 is ~21.9 km: the wrap pair must be found
    assert [(r.rid, r.rank) for r in rows] == [(2, 1)]
    assert 20 < rows[0].distance_km < 25


def test_radius_excludes_and_k_caps(spark):
    left = spark.createDataFrame([(1, 0.0, 0.0)], "lid bigint, lat double, lon double")
    right = spark.createDataFrame(
        [(i, 0.0, 0.1 * i) for i in range(1, 8)], "rid bigint, lat double, lon double"
    )
    rows = knn_join(
        left, right, left_id="lid", right_id="rid", k=3, radius_km=50.0
    ).collect()
    # 0.1 deg ~ 11.1 km: rids 1..4 are inside 50 km, k caps at 3, nearest first
    assert [(r.rid, r.rank) for r in sorted(rows, key=lambda r: r.rank)] == [
        (1, 1),
        (2, 2),
        (3, 3),
    ]


def test_plan_is_equijoin_not_cartesian(spark):
    lat, lon = pseudo_coords("id")
    left = spark.range(100).select(F.col("id").alias("lid"), lat.alias("lat"), lon.alias("lon"))
    right = spark.range(50).select(F.col("id").alias("rid"), lat.alias("lat"), lon.alias("lon"))
    out = knn_join(left, right, left_id="lid", right_id="rid", k=2, radius_km=100.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
