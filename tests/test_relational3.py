from __future__ import annotations

import pytest
from conftest import SF_ORACLE, assert_frames_match

from etl_addresses_spark.plans.relational3 import QUERIES3


@pytest.mark.parametrize("name", sorted(QUERIES3))
def test_relational3_oracle(name, spark, ddb):
    fn, sql = QUERIES3[name]
    assert_frames_match(fn(spark, SF_ORACLE), ddb.sql(sql))
