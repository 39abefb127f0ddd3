from __future__ import annotations

from conftest import SF_ORACLE, assert_frames_match

from etl_addresses_spark.plans import flagship


def test_flagship_matches_oracle_grid(spark, ddb):
    sdf = flagship.spatiotemporal_join(spark, SF_ORACLE, strategy="grid")
    assert_frames_match(sdf, ddb.sql(flagship.ORACLE_SQL))


def test_flagship_matches_oracle_broadcast(spark, ddb):
    sdf = flagship.spatiotemporal_join(spark, SF_ORACLE, strategy="broadcast")
    assert_frames_match(sdf, ddb.sql(flagship.ORACLE_SQL))


def test_flagship_has_matches_and_errors(spark):
    sdf = flagship.spatiotemporal_join(spark, SF_ORACLE).cache()
    total = sdf.count()
    errors = sdf.filter("error IS NOT NULL").count()
    matched = sdf.filter("streetId IS NOT NULL").count()
    assert total > 0
    assert matched > 0, "fixtures should produce matched addresses"
    assert errors > 0, "fixtures should exercise the no-match error branch"
    assert matched + errors == total
