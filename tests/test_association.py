"""Association analytics: oracle parity + the contingency-count
invariants chi2 guarantees by construction."""

from __future__ import annotations

from conftest import SF_ORACLE, assert_frames_match

from etl_addresses_spark.operators.association import (
    CHI2_TOKEN_SQL,
    CHI2_TOPK,
    FREQUENT_PAIRS_SQL,
    PAIR_MIN_SUPPORT,
    PAIR_TOPK,
    chi2_token_assoc,
    frequent_item_pairs,
)


def test_frequent_pairs_oracle(spark, ddb):
    assert_frames_match(
        frequent_item_pairs(spark, SF_ORACLE), ddb.sql(FREQUENT_PAIRS_SQL)
    )


def test_chi2_oracle(spark, ddb):
    assert_frames_match(
        chi2_token_assoc(spark, SF_ORACLE), ddb.sql(CHI2_TOKEN_SQL)
    )


def test_frequent_pairs_invariants(spark):
    rows = frequent_item_pairs(spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= PAIR_TOPK
    for r in rows:
        assert r.part_a < r.part_b
        assert r.support >= PAIR_MIN_SUPPORT
    sups = [r.support for r in rows]
    assert sups == sorted(sups, reverse=True)


def test_chi2_invariants(spark):
    rows = chi2_token_assoc(spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= CHI2_TOPK
    for r in rows:
        # a scored token appears in at least one document, chi2 is a
        # finite non-negative statistic
        assert r.n11 + r.n01 >= 1
        assert r.chi2 >= 0.0 and r.chi2 == r.chi2  # not NaN
    scores = [r.chi2 for r in rows]
    assert scores == sorted(scores, reverse=True)
