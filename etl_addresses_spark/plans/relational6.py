"""Sixth relational batch: skew-safe aggregation patterns + the raw
SQL interface surface.

`skew_salted_distinct` is the 100 TB exact-distinct shape for
aggregates the planner CANNOT auto-rewrite.  (Plain `count(DISTINCT)`
Spark already expands into a partial-dedup exchange — no salting
needed.)  The naive materialization `size(collect_set(k))` however
concentrates each group's ENTIRE key set in one reducer's memory — an
OOM straggler when one group holds half the table.  Salting by
`k % n` splits each group's set across n disjoint buckets (each
distinct k lands in exactly one salt, so bucket sizes ADD exactly),
bounding any reducer's state to 1/n of a group; a second tiny shuffle
sums the n partial sizes.  A logical transformation AQE cannot make.

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
    """Exact distinct parts per return flag via salted set
    materialization: per-(group, salt) collect_set sizes, summed per
    group.  Salt = key mod N_SALTS -> buckets are disjoint and sizes
    add exactly; no reducer ever holds a group's full key set."""
    li = load_table(spark, sf_dir, "lineitem")
    partial = (
        li.groupBy(
            "l_returnflag",
            (F.col("l_partkey") % N_SALTS).alias("_salt"),
        )
        .agg(F.size(F.collect_set("l_partkey")).cast("long").alias("d_parts"))
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
