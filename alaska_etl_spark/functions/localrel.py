"""Pure-JVM literal DataFrames for small driver-side row lists.

``spark.createDataFrame(rows)`` on a plain Python list builds a
Python-RDD-backed frame: every scan of it launches ``defaultParallelism``
tasks (32 on this box) and each task round-trips a Python worker just to
unpickle a handful of rows — measured ~250 ms executor-run per task,
~8 exec-s per scan, with near-zero CPU (guide §4: the JVM↔Python
boundary). The q23 stage profile attributed four such
``Scan ExistingRDD`` stages (~34 exec-s) to 13-row decode frames.

``local_df`` builds the same rows as a Catalyst literal instead:
``Range(0,1,1 split) → Generate inline(array(structs...))`` — one JVM
task, no Python workers, and the whole relation is visible to the
optimizer (broadcast builds fold it directly). Use it for every small
driver-side constant table (decode maps, query lists, rule tables,
centroid snapshots); keep ``createDataFrame`` for genuinely large or
streaming-sourced local data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = ["local_df"]


def _as_struct_type(spark: SparkSession, schema) -> StructType:
    if isinstance(schema, StructType):
        return schema
    # DDL string ("a int, b string") → StructType, via the public API
    return spark.createDataFrame([], schema).schema


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Literal relation for a small list of tuples/Rows.

    Semantics match ``spark.createDataFrame(rows, schema)`` for plain
    scalar/array/struct values (each value goes through ``F.lit`` +
    ``cast`` to the declared field type); the plan is pure JVM codegen
    with a single split.
    """
    st = _as_struct_type(spark, schema)
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], st)
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(tuple(r), st.fields)
            ]
        )
        for r in rows
    ]
    return spark.range(0, 1, 1, 1).select(F.inline(F.array(*structs)))
