"""ensure_min_parallelism: widens narrow inputs, no-op on wide ones."""
from pyspark.sql import functions as F

from alaska_etl_spark.operators.parallelism import ensure_min_parallelism


def test_narrow_input_widened_to_shuffle_parallelism(spark):
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = spark.createDataFrame([(i,) for i in range(100)], "id bigint").coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = ensure_min_parallelism(df, "id")
    assert out.rdd.getNumPartitions() == nparts
    # values survive the repartition
    assert out.agg(F.sum("id")).collect()[0][0] == sum(range(100))


def test_wide_input_is_left_alone(spark):
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = spark.createDataFrame([(i,) for i in range(100)], "id bigint").repartition(
        nparts + 4
    )
    out = ensure_min_parallelism(df, "id")
    assert out is df  # no new plan node at all


def test_no_columns_round_robin(spark):
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = spark.createDataFrame([(i,) for i in range(10)], "id bigint").coalesce(1)
    out = ensure_min_parallelism(df)
    assert out.rdd.getNumPartitions() == nparts
    assert out.count() == 10
