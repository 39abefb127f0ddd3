from __future__ import annotations

import pytest
from conftest import SF_ORACLE, assert_frames_match

from etl_addresses_spark.plans.relational3 import QUERIES3


@pytest.mark.parametrize("name", sorted(QUERIES3))
def test_relational3_oracle(name, spark, ddb):
    fn, sql = QUERIES3[name]
    assert_frames_match(fn(spark, SF_ORACLE), ddb.sql(sql))


def test_fuzzy_blocked_agrees_with_all_pairs_within_threshold(spark):
    """Losslessness of the length-band blocking: wherever the global
    argmin lies within FUZZY_MAX_DIST, the blocked tier must return
    exactly the all-pairs tier's row (on this fixture every supplier's
    min distance is 5 <= 6, so the two results are identical)."""
    from etl_addresses_spark.plans.relational3 import (
        FUZZY_MAX_DIST,
        fuzzy_name_match,
        fuzzy_name_match_blocked,
    )

    full = {
        r.s_suppkey: tuple(r)
        for r in fuzzy_name_match(spark, SF_ORACLE).collect()
    }
    blocked = {
        r.s_suppkey: tuple(r)
        for r in fuzzy_name_match_blocked(spark, SF_ORACLE).collect()
    }
    assert blocked
    for k, row in blocked.items():
        assert row == full[k]
    # every all-pairs winner within the threshold must appear
    for k, row in full.items():
        if row[4] <= FUZZY_MAX_DIST:
            assert k in blocked
