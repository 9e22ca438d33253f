"""Skyline (Pareto front) operator tests."""

from alaska_etl_spark.operators.pareto import skyline_2d


def test_skyline_staircase_with_ties(spark):
    # minimize price, maximize size
    rows = [
        (1, 1.0, 5),   # front (cheapest, size 5)
        (2, 1.0, 3),   # dominated by 1 (same price, smaller)
        (3, 2.0, 5),   # dominated by 1 (pricier, same size)
        (4, 2.0, 8),   # front (pricier but larger)
        (5, 2.0, 8),   # duplicate of 4 -> also on the front
        (6, 3.0, 8),   # dominated by 4
        (7, 4.0, 9),   # front
        (8, 5.0, 1),   # dominated
    ]
    df = spark.createDataFrame(rows, "id bigint, price double, size int")
    got = sorted(r.id for r in skyline_2d(df, "price", "size").collect())
    assert got == [1, 4, 5, 7]


def test_skyline_matches_bruteforce_dominance(spark):
    """Pin the staircase plan against the O(n^2) dominance definition
    on a pseudo-random point set with heavy value collisions."""
    pts = [
        (i, float((i * 2654435761) % 13), int((i * 40503) % 11))
        for i in range(200)
    ]
    df = spark.createDataFrame(pts, "id bigint, price double, size int")

    def dominated(r, s):
        return (
            s[1] <= r[1]
            and s[2] >= r[2]
            and (s[1] < r[1] or s[2] > r[2])
        )

    expected = sorted(
        r[0]
        for r in pts
        if not any(dominated(r, s) for s in pts if s[0] != r[0])
    )
    got = sorted(r.id for r in skyline_2d(df, "price", "size").collect())
    assert got == expected


def test_skyline_single_row_and_all_equal(spark):
    df1 = spark.createDataFrame([(1, 2.0, 3)], "id bigint, price double, size int")
    assert [r.id for r in skyline_2d(df1, "price", "size").collect()] == [1]
    # all rows identical on both criteria: none dominates -> all survive
    df2 = spark.createDataFrame(
        [(i, 2.0, 3) for i in range(4)], "id bigint, price double, size int"
    )
    assert sorted(r.id for r in skyline_2d(df2, "price", "size").collect()) == [0, 1, 2, 3]
