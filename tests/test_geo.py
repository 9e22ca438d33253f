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


def test_radius_pairs_equals_bruteforce(spark):
    from pyspark.sql import functions as F

    from alaska_etl_spark.operators.geo import haversine_km, pseudo_coords, radius_pairs

    lat, lon = pseudo_coords(F.col("id"))
    pts = spark.range(1, 2000).select("id", lat.alias("lat"), lon.alias("lon"))
    got = {
        (r.id_a, r.id_b)
        for r in radius_pairs(pts, "id", radius_km=400.0).collect()
    }
    a = pts.select(F.col("id").alias("ia"), F.col("lat").alias("la"), F.col("lon").alias("qa"))
    b = pts.select(F.col("id").alias("ib"), F.col("lat").alias("lb"), F.col("lon").alias("qb"))
    brute = {
        (r.ia, r.ib)
        for r in a.crossJoin(b)
        .filter(F.col("ia") < F.col("ib"))
        .withColumn(
            "d",
            F.round(haversine_km(F.col("la"), F.col("qa"), F.col("lb"), F.col("qb")), 3),
        )
        .filter(F.col("d") <= 400.0)
        .collect()
    }
    assert got == brute and len(got) > 0


def test_geo_clusters_chain_merges_transitively(spark):
    """A chain of points each within eps of the NEXT (but far from the
    rest) must collapse to ONE component — the transitivity CC buys."""
    from alaska_etl_spark.operators.dedup import dup_groups
    from alaska_etl_spark.operators.geo import radius_pairs

    # 1° lat ≈ 111 km: a 6-point chain at 0.9° spacing (within 111 km
    # pairs only adjacent); one isolated point far away
    rows = [(i, float(i) * 0.9, 10.0) for i in range(6)] + [(99, 40.0, 120.0)]
    pts = spark.createDataFrame(rows, "id bigint, lat double, lon double")
    pairs = radius_pairs(pts, "id", radius_km=111.0).select("id_a", "id_b")
    out = dup_groups(pairs).collect()
    assert len(out) == 1  # the chain; the isolate has no edges
    assert out[0].member_count == 6 and out[0].keep_id == 0
