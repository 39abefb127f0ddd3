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


def test_cohort_retention_day_zero_is_total(spark):
    from etl_addresses_spark.plans.relational6 import cohort_retention

    rows = cohort_retention(spark, SF_ORACLE).collect()
    assert rows
    day0 = [r for r in rows if r.age_days == 0]
    # every user is active on their first day, so age-0 retention == 1
    assert day0 and all(r.retention == 1.0 and r.n_active == r.cohort_size for r in day0)
    assert all(0.0 < r.retention <= 1.0 for r in rows)
