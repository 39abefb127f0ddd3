from __future__ import annotations

import pytest
from conftest import SF_ORACLE, assert_frames_match

from etl_addresses_spark.plans.streaming_queries import STREAMING_QUERIES


@pytest.mark.parametrize("name", sorted(STREAMING_QUERIES))
def test_streaming_oracle(name, spark, ddb):
    fn, sql = STREAMING_QUERIES[name]
    assert_frames_match(fn(spark, SF_ORACLE), ddb.sql(sql))
