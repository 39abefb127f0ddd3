"""Focused pins for the round-15 optimization internals.

- the first moments (sum of cents) now ride the same 21-bit limb
  machinery as the second moments (r14 verdict item 2: a plain long
  sum of extendedprice cents wraps int64 at ~9e11 worst-case rows,
  inside the 100 TB envelope).  Pin (a) the recombination exactness on
  the fixture, (b) the stated ~4.39e12-row overflow envelope
  analytically, and (c) the runtime guard raising loudly past it.
"""

from __future__ import annotations

from conftest import SF_ORACLE

from pyspark.sql import functions as F


def test_first_moment_limb_recombination_exact(spark):
    """limb_recomb over limb sums of the RAW cents (first moment) must
    equal the plain exact sum cast to double on the fixture."""
    from etl_addresses_spark.operators.sketches import (
        limb_recomb,
        limb_sum_aggs,
    )
    from etl_addresses_spark.sources.tables import load_table

    li = load_table(spark, SF_ORACLE, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    m = li.agg(
        *limb_sum_aggs(cents, "s"),
        F.sum(cents.cast("decimal(38,0)")).alias("exact"),
    )
    row = m.selectExpr(f"{limb_recomb('s')} as recombined", "exact").collect()[0]
    assert row.recombined == float(row.exact)


def test_limb_sum_envelope_bound_analytic():
    """Every limb partial is <= _LIMB_MASK per row, so int64 holds any
    limb sum to LIMB_SUM_MAX_ROWS rows — the documented envelope.  The
    bound must cover 100 TB-class lineitem (~6e11 rows) with margin,
    and be tight: one more row at max limb value must overflow."""
    from etl_addresses_spark.operators.sketches import (
        _LIMB_MASK,
        LIMB_SUM_MAX_ROWS,
    )

    assert LIMB_SUM_MAX_ROWS * _LIMB_MASK <= 2**63 - 1 + _LIMB_MASK
    assert LIMB_SUM_MAX_ROWS * _LIMB_MASK >= 2**63 - _LIMB_MASK
    assert LIMB_SUM_MAX_ROWS > 4e12  # ~7x margin over 100 TB lineitem


def test_limb_guard_raises_past_envelope(spark):
    """The assert_true guard must publish the value unchanged inside
    the envelope and RAISE (not wrap) past it."""
    import pytest

    from etl_addresses_spark.operators.sketches import (
        LIMB_SUM_MAX_ROWS,
        limb_guard,
    )

    ok = spark.createDataFrame([(100,)], "n long").selectExpr(
        limb_guard("1.5d") + " as v"
    )
    assert ok.collect()[0].v == 1.5
    bad = spark.createDataFrame(
        [(LIMB_SUM_MAX_ROWS + 1,)], "n long"
    ).selectExpr(limb_guard("1.5d") + " as v")
    with pytest.raises(Exception, match="limb sums exact only"):
        bad.collect()


def test_stats_first_moments_are_limb_split(spark):
    """Plan pin: stats_correlation / stats_regression_group aggregate
    ONLY limb partials (plus the count).  The limb split of the first
    moments raises the partial_sum count (corr 35 -> 38 measure sums,
    regression 8 -> 10); a regression to plain first-moment long sums
    drops below these floors."""
    from etl_addresses_spark.operators.sketches import stats_correlation
    from etl_addresses_spark.plans.relational7 import stats_regression_group

    for fn, n_measure_sums in (
        (stats_correlation, 38),
        (stats_regression_group, 10),
    ):
        df = fn(spark, SF_ORACLE)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert plan.count("partial_sum") >= n_measure_sums, (
            fn.__name__,
            plan.count("partial_sum"),
        )
