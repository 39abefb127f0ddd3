from __future__ import annotations

import pytest
from conftest import SF_ORACLE, assert_frames_match

from etl_addresses_spark.plans.relational5 import QUERIES5


@pytest.mark.parametrize("name", sorted(QUERIES5))
def test_relational5_oracle(name, spark, ddb):
    fn, sql = QUERIES5[name]
    assert_frames_match(fn(spark, SF_ORACLE), ddb.sql(sql))
