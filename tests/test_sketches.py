from __future__ import annotations

from conftest import SF_ORACLE

from etl_addresses_spark.operators import sketches


def test_hll_error_bounds(spark):
    rows = sketches.hll_distinct_parts(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_parts - r.exact_parts) / r.exact_parts < 0.05
        assert abs(r.approx_supps_hllpp - r.exact_supps) / r.exact_supps < 0.05


def test_hll_union_mergeability(spark):
    merged = sketches.hll_mergeable_union(spark, SF_ORACLE).collect()[0]
    from pyspark.sql import functions as F

    from etl_addresses_spark.sources.tables import load_table

    exact = (
        load_table(spark, SF_ORACLE, "lineitem")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()[0]
        .n
    )
    assert abs(merged.approx_global_parts - exact) / exact < 0.05


def test_approx_quantiles_within_tolerance(spark):
    for r in sketches.approx_quantiles_orders(spark, SF_ORACLE).collect():
        for approx, exact in [
            (r.approx_p50, r.exact_p50),
            (r.approx_p90, r.exact_p90),
        ]:
            assert abs(approx - exact) / exact < 0.05


def test_simhash_near_pairs_find_injected_dups(spark):
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in sketches.simhash_near_pairs(spark, SF_ORACLE).collect()
    }
    assert pairs
    # exact copies (doc_id % 4 == 0 -> +20000000) must appear at hamming 0
    exact_copy_pairs = [(a, b) for (a, b), h in pairs.items() if h == 0]
    assert exact_copy_pairs
    # precision sanity: hamming never exceeds the verify threshold
    assert max(pairs.values()) <= 10
