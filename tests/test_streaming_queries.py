from __future__ import annotations

import pytest
from conftest import SF_ORACLE, assert_frames_match

from etl_addresses_spark.plans.streaming_queries import STREAMING_QUERIES


@pytest.mark.parametrize("name", sorted(STREAMING_QUERIES))
def test_streaming_oracle(name, spark, ddb):
    fn, sql = STREAMING_QUERIES[name]
    assert_frames_match(fn(spark, SF_ORACLE), ddb.sql(sql))


def test_left_join_nulls_only_behind_watermark(spark):
    # matched rows must equal the inner-join query's rows; null rows
    # may only exist for purchases the final watermark has passed
    import pyspark.sql.functions as F

    from etl_addresses_spark.plans.streaming_queries import (
        stream_purchase_view_join,
        stream_purchase_view_left_join,
    )
    from etl_addresses_spark.sources.tables import load_table

    left = stream_purchase_view_left_join(spark, SF_ORACLE).cache()
    inner = stream_purchase_view_join(spark, SF_ORACLE)
    matched = left.filter(F.col("view_event_id").isNotNull())
    assert matched.count() == inner.count()
    ev = load_table(spark, SF_ORACLE, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    nulls = left.filter(F.col("view_event_id").isNull()).collect()
    import datetime

    wm = max_ts - datetime.timedelta(minutes=40)
    for r in nulls:
        assert r.purchase_ts <= wm.strftime("%Y-%m-%d %H:%M:%S") + ".9999", (
            f"null row {r.purchase_event_id} at {r.purchase_ts} is newer "
            f"than the final watermark {wm}"
        )
    left.unpersist()
