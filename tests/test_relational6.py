from __future__ import annotations

import pytest
from conftest import SF_ORACLE, assert_frames_match

from pyspark.sql import functions as F

from etl_addresses_spark.plans.relational6 import QUERIES6, skew_salted_distinct
from etl_addresses_spark.sources.tables import load_table


@pytest.mark.parametrize("name", sorted(QUERIES6))
def test_relational6_oracle(name, spark, ddb):
    fn, sql = QUERIES6[name]
    assert_frames_match(fn(spark, SF_ORACLE), ddb.sql(sql))


def test_salted_distinct_equals_plain(spark):
    got = {
        r.l_returnflag: r.distinct_parts
        for r in skew_salted_distinct(spark, SF_ORACLE).collect()
    }
    plain = {
        r.l_returnflag: r.d
        for r in load_table(spark, SF_ORACLE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("d"))
        .collect()
    }
    assert got == plain


def test_salted_distinct_two_stage_plan(spark):
    # the whole point: the per-group key set never converges on a
    # single reducer — sets build per (group, salt) with map-side
    # partials, and only tiny partial sizes cross the second exchange
    plan = (
        skew_salted_distinct(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_collect_set" in plan
    assert "partial_sum" in plan
    assert plan.count("+- Exchange") == 2
