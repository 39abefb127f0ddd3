"""Partitioned sinks + partition-pruned scans.

At 100 TB, output tables are laid out `partitionBy` their query
dimension (date, type, tenant...) so downstream readers scan only the
partitions a filter selects — Spark turns the filter into
PartitionFilters (directory pruning), never touching the other files.
Tests assert the pruning appears in the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, *cols: str) -> None:
    df.write.mode("overwrite").partitionBy(*cols).parquet(path)


def read_partition(
    spark: SparkSession, path: str, col: str, value: str
) -> DataFrame:
    from pyspark.sql import functions as F

    return spark.read.parquet(path).filter(F.col(col) == value)
