from __future__ import annotations

import pytest
from conftest import SF_ORACLE, assert_frames_match

from etl_addresses_spark.plans.relational3 import QUERIES3


@pytest.mark.parametrize("name", sorted(QUERIES3))
def test_relational3_oracle(name, spark, ddb):
    fn, sql = QUERIES3[name]
    assert_frames_match(fn(spark, SF_ORACLE), ddb.sql(sql))


def test_fuzzy_blocked_agrees_with_all_pairs_within_threshold(spark):
    """Losslessness of the tiered dispatcher vs the definitional
    all-pairs argmin ON THE SAME (hash-sampled) frames: wherever the
    global argmin lies within FUZZY_MAX_DIST, the dispatcher must
    return exactly the all-pairs row (on this fixture every supplier's
    min distance is 5 <= 6, so the two results are identical).  Both
    sides consume the `fuzzy_name_match` sample so the property holds
    on exactly the subset the registered validation row checks."""
    from etl_addresses_spark.plans.relational3 import (
        FUZZY_ALLPAIRS_C_CAP,
        FUZZY_ALLPAIRS_S_CAP,
        FUZZY_MAX_DIST,
        _hash_sample,
        fuzzy_match_allpairs_for,
        fuzzy_match_auto_for,
    )
    from etl_addresses_spark.sources.tables import load_table

    s = _hash_sample(
        load_table(spark, SF_ORACLE, "supplier").select("s_suppkey", "s_name"),
        "s_suppkey",
        FUZZY_ALLPAIRS_S_CAP,
    )
    c = _hash_sample(
        load_table(spark, SF_ORACLE, "customer").select("c_custkey", "c_name"),
        "c_custkey",
        FUZZY_ALLPAIRS_C_CAP,
    )
    full = {
        r.s_suppkey: tuple(r)
        for r in fuzzy_match_allpairs_for(s, c).collect()
    }
    assert full  # the sample must not be empty
    blocked = {
        r.s_suppkey: tuple(r)
        for r in fuzzy_match_auto_for(s, c).collect()
    }
    assert blocked
    for k, row in blocked.items():
        assert row == full[k]
    # every all-pairs winner within the threshold must appear
    for k, row in full.items():
        if row[4] <= FUZZY_MAX_DIST:
            assert k in blocked
