"""Sixth relational batch: skew-safe aggregation patterns + the raw
SQL interface surface.

`skew_salted_distinct` is the 100 TB exact-distinct shape: a plain
`count(DISTINCT k)` per group shuffles every (group, k) pair into one
reducer per group — a straggler when one group holds half the table.
Salting by `hash(k) % n` splits each group's distinct set across n
reducers (each distinct k lands in exactly one salt bucket, so partial
distinct counts ADD exactly), then a second tiny shuffle merges n
partial counts per group.  AQE cannot rewrite this one — it is a
logical transformation, not a runtime split.

`sql_grouping_sets` runs through `spark.sql(...)` over registered temp
views — the engine's raw-SQL entry point — and exercises GROUPING SETS
+ grouping_id, the generalization of the rollup/cube queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_addresses_spark.sources.tables import load_table

N_SALTS = 16


def skew_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct parts/suppliers per return flag via salted
    two-stage aggregation (salt = key mod N_SALTS, deterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    partial = (
        li.groupBy(
            "l_returnflag",
            (F.col("l_partkey") % N_SALTS).alias("_salt"),
        )
        .agg(F.countDistinct("l_partkey").alias("d_parts"))
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(F.sum("d_parts").alias("distinct_parts"))
    )


SKEW_SALTED_DISTINCT_SQL = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts
FROM lineitem GROUP BY l_returnflag
"""


def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the raw spark.sql interface over temp views."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
          grouping_id(l_returnflag, l_linestatus) AS gid,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          count(*) AS n
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    ).withColumn("gid", F.col("gid").cast("long"))


SQL_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


QUERIES6 = {
    "skew_salted_distinct": (skew_salted_distinct, SKEW_SALTED_DISTINCT_SQL),
    "sql_grouping_sets": (sql_grouping_sets, SQL_GROUPING_SETS_SQL),
}
