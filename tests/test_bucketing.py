from __future__ import annotations

import pytest
from conftest import SF_SMALL

from pyspark.sql import functions as F

from etl_addresses_spark.sources.bucketing import bucketed_join, bucketize
from etl_addresses_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # disable AQE's auto-broadcast so the test observes the bucketed
    # sort-merge path (broadcast would trivially avoid the shuffle too)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    bucketize(
        load_table(spark, SF_SMALL, "lineitem"), "b_lineitem", "l_orderkey"
    )
    bucketize(load_table(spark, SF_SMALL, "orders"), "b_orders", "o_orderkey")
    yield
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    joined = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey", "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"


def test_bucketed_join_correct(spark, bucketed_tables):
    joined = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey", "o_orderkey")
    plain = load_table(spark, SF_SMALL, "lineitem").join(
        load_table(spark, SF_SMALL, "orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    assert joined.count() == plain.count()


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    agg = (
        spark.table("b_lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed agg must not shuffle:\n{plan}"


def test_bucketed_join_colocated_registry_row(spark, ddb):
    """The registry row's bucketed round-trip must be a value-level
    identity with the plain-parquet SQL join."""
    from conftest import assert_frames_match

    from etl_addresses_spark.sources.bucketing import (
        BUCKETED_JOIN_SQL,
        bucketed_join_colocated,
    )

    assert_frames_match(
        bucketed_join_colocated(spark, SF_SMALL), ddb.sql(BUCKETED_JOIN_SQL)
    )
