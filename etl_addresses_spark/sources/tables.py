"""Loaders for the driver's deterministic parquet tables.

Tables (per /root/repo/TESTDATA.md): region nation customer supplier
part orders lineitem events documents embeddings, one parquet file per
table under /root/testdata/sf{0.001,0.01,0.1}/.

Parquet is read with its embedded schema (no inference cost); column
pruning and predicate pushdown reach the scan because every downstream
query goes through the DataFrame API. At 100 TB each "file" becomes a
partitioned directory — `load_table` takes any path Spark can read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Small dimension tables that should be broadcast in joins.
BROADCAST_TABLES = {"region", "nation", "supplier"}


def ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs every query depends on, set defensively because the
    driver may call us with a SparkSession it built itself:
    UTC session timezone (fuzzy-date epoch math and all oracle
    timestamp comparisons assume it) and nanos-as-long parquet reads
    (events.parquet stores TIMESTAMP(NANOS), which the vectorized
    reader otherwise rejects).  Both are session-level SQL confs, safe
    to set at call time."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) parquet read as raw nanos (see session.py);
        # truncate to microseconds — same truncation DuckDB applies when
        # it compares TIMESTAMP_NS at microsecond precision.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql can reference it."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
