from __future__ import annotations

import pytest
from conftest import SF_ORACLE, assert_frames_match

from etl_addresses_spark.plans.relational2 import QUERIES2


@pytest.mark.parametrize("name", sorted(QUERIES2))
def test_relational2_oracle(name, spark, ddb):
    fn, sql = QUERIES2[name]
    assert_frames_match(fn(spark, SF_ORACLE), ddb.sql(sql))
