from __future__ import annotations

import pytest
from conftest import SF_ORACLE, assert_frames_match

from etl_addresses_spark.plans.relational4 import QUERIES4


@pytest.mark.parametrize("name", sorted(QUERIES4))
def test_relational4_oracle(name, spark, ddb):
    fn, sql = QUERIES4[name]
    assert_frames_match(fn(spark, SF_ORACLE), ddb.sql(sql))
