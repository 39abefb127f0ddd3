"""Bucketed-table support: co-located joins without a shuffle.

At 100 TB the dominant cost of fact-fact joins (lineitem ⋈ orders) is
the shuffle.  Writing both tables bucketed by the join key into the
warehouse lets every subsequent join/aggregation on that key run
shuffle-free: Spark matches bucket files 1:1 across tables.

`bucketize` materializes parquet tables bucketed+sorted by key;
`bucketed_join` reads them back and joins — tests assert the physical
plan contains NO Exchange on the join path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def bucketize(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Write df as a bucketed, sorted managed table (overwriting)."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
