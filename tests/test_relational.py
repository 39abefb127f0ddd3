from __future__ import annotations

import pytest
from conftest import SF_ORACLE, assert_frames_match

from etl_addresses_spark.plans.relational import QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_relational_oracle(name, spark, ddb):
    fn, sql = QUERIES[name]
    assert_frames_match(fn(spark, SF_ORACLE), ddb.sql(sql))
