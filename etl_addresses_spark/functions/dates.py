"""Fuzzy-date normalization as native column expressions.

The reference's `fuzzy-dates` dependency converts a fuzzy date string
into an [earliest, latest] ISO pair (/root/reference/addresses.js:67-71;
dependency pinned at package-lock.json:532-538):

    "1854"       -> ["1854-01-01", "1854-12-31"]
    "1854-03"    -> ["1854-03-01", "1854-03-31"]
    "1854-03-02" -> ["1854-03-02", "1854-03-02"]

The join predicate then works in epoch milliseconds
(`new Date(x).getTime()`, addresses.js:67-73). Invalid/missing dates
produce NaN in the reference, which makes the containment predicate
false; here they produce NULL, which Spark's filter likewise drops —
null-safe-false parity (SURVEY.md §7 risk (b)).

Everything is CASE + to_timestamp + last_day: pure Catalyst
expressions, whole-stage-codegen friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _ts(col: Column) -> Column:
    # Session timezone is pinned to UTC (session.py), so this matches the
    # reference's Date.parse of ISO date-only strings (UTC midnight).
    # try_to_timestamp, not to_timestamp: Spark 4 runs with
    # spark.sql.ansi.enabled=true, where to_timestamp RAISES on a
    # malformed string.  The reference's Date.parse yields NaN and the
    # containment predicate goes false; try_to_timestamp's NULL gives
    # the same null-safe-false behavior on dirty data.
    return F.try_to_timestamp(col, F.lit("yyyy-MM-dd"))


def fuzzy_date_earliest(col: Column) -> Column:
    """Earliest instant of a fuzzy date (index [0] of fuzzy-dates.convert)."""
    return (
        F.when(col.isNull(), F.lit(None).cast("timestamp"))
        .when(F.length(col) == 4, _ts(F.concat(col, F.lit("-01-01"))))
        .when(F.length(col) == 7, _ts(F.concat(col, F.lit("-01"))))
        .otherwise(_ts(col))
    )


def fuzzy_date_latest(col: Column) -> Column:
    """Latest instant of a fuzzy date (index [1] of fuzzy-dates.convert).

    Date-only resolution (midnight of the last day), matching the
    reference's `new Date("1854-12-31").getTime()`.
    """
    return (
        F.when(col.isNull(), F.lit(None).cast("timestamp"))
        .when(F.length(col) == 4, _ts(F.concat(col, F.lit("-12-31"))))
        .when(
            F.length(col) == 7,
            F.to_timestamp(F.last_day(_ts(F.concat(col, F.lit("-01"))))),
        )
        .otherwise(_ts(col))
    )


def epoch_ms(ts: Column) -> Column:
    """Epoch milliseconds as BIGINT (parity with JS Date.getTime())."""
    return F.unix_millis(ts)


def fuzzy_earliest_ms(col: Column) -> Column:
    return epoch_ms(fuzzy_date_earliest(col))


def fuzzy_latest_ms(col: Column) -> Column:
    return epoch_ms(fuzzy_date_latest(col))


# DuckDB renderings of the same normalization, used by oracle SQL.
# `{c}` is substituted with the column expression.
DUCKDB_EARLIEST_MS = (
    "CASE WHEN {c} IS NULL THEN NULL "
    "WHEN length({c}) = 4 THEN epoch_ms(strptime({c} || '-01-01', '%Y-%m-%d')) "
    "WHEN length({c}) = 7 THEN epoch_ms(strptime({c} || '-01', '%Y-%m-%d')) "
    "ELSE epoch_ms(strptime({c}, '%Y-%m-%d')) END"
)
DUCKDB_LATEST_MS = (
    "CASE WHEN {c} IS NULL THEN NULL "
    "WHEN length({c}) = 4 THEN epoch_ms(strptime({c} || '-12-31', '%Y-%m-%d')) "
    "WHEN length({c}) = 7 THEN epoch_ms(CAST(last_day(CAST(strptime({c} || '-01', '%Y-%m-%d') AS DATE)) AS TIMESTAMP)) "
    "ELSE epoch_ms(strptime({c}, '%Y-%m-%d')) END"
)
