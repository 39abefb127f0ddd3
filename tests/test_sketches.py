from __future__ import annotations

from conftest import SF_ORACLE

from etl_addresses_spark.operators import sketches


def test_hll_error_bounds(spark):
    rows = sketches.hll_distinct_parts(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        # bounds evaluated in-query; violations also hash-mismatch
        # against the DuckDB oracle
        assert r.hll_parts_within_5pct
        assert r.hllpp_supps_within_5pct
        assert r.exact_parts > 0 and r.exact_supps > 0


def test_hll_union_mergeability(spark):
    merged = sketches.hll_mergeable_union(spark, SF_ORACLE).collect()[0]
    assert merged.hll_union_within_5pct
    assert merged.exact_global_parts > 0


def test_approx_quantiles_within_tolerance(spark):
    rows = sketches.approx_quantiles_orders(spark, SF_ORACLE).collect()
    assert rows, "expected one row per order status"
    for r in rows:
        # the rank-error contract is evaluated in-query; a violation
        # would also hash-mismatch against the DuckDB oracle
        assert r.approx_within_bounds
        assert r.p50_disc <= r.p90_disc


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


def test_stats_correlation_matches_numpy(spark):
    import numpy as np

    from etl_addresses_spark.operators.sketches import (
        _CORR_COLS,
        stats_correlation,
    )
    from etl_addresses_spark.sources.tables import load_table

    rows = {
        (r.col_x, r.col_y): r.corr
        for r in stats_correlation(spark, SF_ORACLE).collect()
    }
    assert len(rows) == 6
    pdf = (
        load_table(spark, SF_ORACLE, "lineitem")
        .select(*_CORR_COLS)
        .toPandas()
    )
    m = np.corrcoef(pdf.to_numpy().T)
    idx = {c: i for i, c in enumerate(_CORR_COLS)}
    for (a, b), v in rows.items():
        assert abs(v - m[idx[a], idx[b]]) < 1e-9, (a, b, v, m[idx[a], idx[b]])
    # a correlation is always in [-1, 1]
    assert all(-1.0 <= v <= 1.0 for v in rows.values())


def test_stats_correlation_double_agrees_and_is_order_insensitive(spark):
    """The double-path twin must (a) agree with the exact-decimal tier
    far inside its 6-digit publication precision and (b) produce the
    SAME published values under a different partitioning — the
    order-dependence it trades away must stay below the contract."""
    from etl_addresses_spark.operators.sketches import (
        stats_correlation,
        stats_correlation_double,
    )

    dec = {
        (r.col_x, r.col_y): r.corr
        for r in stats_correlation(spark, SF_ORACLE).collect()
    }
    dbl = {
        (r.col_x, r.col_y): r.corr
        for r in stats_correlation_double(spark, SF_ORACLE).collect()
    }
    assert dec.keys() == dbl.keys() and len(dbl) == 6
    for k, v in dbl.items():
        assert abs(v - dec[k]) <= 5e-7, (k, v, dec[k])

    # same computation over a deliberately different partitioning:
    # double sums associate differently, published values must not move.
    import etl_addresses_spark.sources.tables as tables

    orig = tables.load_table

    def skewed(s, sf_dir, name):
        df = orig(s, sf_dir, name)
        return df.repartition(7) if name == "lineitem" else df

    tables_load = tables.load_table
    tables.load_table = skewed
    try:
        dbl7 = {
            (r.col_x, r.col_y): r.corr
            for r in stats_correlation_double(spark, SF_ORACLE).collect()
        }
    finally:
        tables.load_table = tables_load
    assert dbl7 == dbl
