"""Round-5 additions, batch analytics genre gaps.

Three query families the registry did not yet cover:

* clickstream PATH analysis (`sessions_path_topk`) — the ordered
  event-type sequence per session as a first-class value, the genre
  behind MATCH_RECOGNIZE / funnel-path products.  Reference parity
  note: the reference pipeline (addresses.js) has no events concept;
  this is part of the mandated large-scale-pipeline extension surface,
  like funnel_conversion / cohort_retention before it.
* grouped closed-form OLS (`stats_regression_group`) — per-group
  slope/intercept from exact integer moment sums, the regression twin
  of stats_correlation's bit-reproducibility contract.
* the IN-REGIME PassJoin row (`fuzzy_title_match_passjoin`) — the
  segment-pigeonhole fuzzy join exercised on a string column whose
  lengths actually spread (document title prefixes, 14-28 chars,
  d=2), unlike the uniform-length supplier/customer fixture where
  the r5 SCALE.md analysis showed the algorithm out of regime.

All three are ANSI-expressible and fully hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_addresses_spark.sources.tables import load_table

# --- clickstream path analysis ------------------------------------------

PATH_MAX_STEPS = 8
PATH_TOPK = 20


def sessions_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PATH_TOPK} event-type PATHS across sessions: each session
    (same 30-minute-gap rule as events_sessionize) is collapsed to the
    ordered '->'-joined sequence of its first {PATH_MAX_STEPS} event
    types, then paths are ranked by how many sessions follow them.

    Scale shape: the per-session path is ONE collect_list aggregation
    (map-side combinable into per-partition partial lists only after
    the session shuffle — the same single shuffle the sessionize agg
    already pays), ordered deterministically by sort_array over
    (ts, event_id, type) structs rather than relying on collect_list
    arrival order, which is partition-nondeterministic.  The final
    rank is a count-distinct-free groupBy on the path string (orders
    of magnitude fewer rows than events) + a global top-k
    (TakeOrderedAndProject, no full sort).  No UDFs; the
    sequence slicing is transform/slice/array_join JVM HOFs.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    ws = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tagged = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.sum(is_new).over(ws).alias("session_seq"),
    )
    ordered = F.sort_array(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    path = F.array_join(
        F.slice(
            F.transform(ordered, lambda x: x["event_type"]), 1, PATH_MAX_STEPS
        ),
        "->",
    )
    paths = tagged.groupBy("user_id", "session_seq").agg(path.alias("path"))
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(PATH_TOPK)
    )


SESSIONS_PATH_TOPK_SQL = f"""
WITH gaps AS (
  SELECT user_id, event_id, ts, event_type,
    epoch_us(ts) - epoch_us(lag(ts) OVER (
      PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
),
tagged AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END AS is_new
  FROM gaps
),
sess AS (
  SELECT user_id, event_id, ts, event_type,
    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM tagged
),
ranked AS (
  SELECT user_id, session_seq, event_type,
    row_number() OVER (PARTITION BY user_id, session_seq
                       ORDER BY ts, event_id) AS rn
  FROM sess
),
paths AS (
  SELECT user_id, session_seq,
    string_agg(event_type, '->' ORDER BY rn) AS path
  FROM ranked WHERE rn <= {PATH_MAX_STEPS}
  GROUP BY user_id, session_seq
)
SELECT path, count(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path ASC LIMIT {PATH_TOPK}
"""


# --- grouped closed-form OLS --------------------------------------------


def stats_regression_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary least squares (y = l_extendedprice on
    x = l_quantity, grouped by return flag x line status) from EXACT
    integer moment sums — the regression member of the
    stats_correlation family, same bit-reproducibility contract:

      slope     = (n.Sxy - Sx.Sy) / (n.Sxx - Sx.Sx)
      intercept = (Sy - slope * Sx) / n

    Both measures are quantized to exact integer cents and the moment
    sums accumulate as int64 limb sums (the machinery and its
    preconditions live next to stats_correlation in
    operators/sketches.py — associative, order-independent, RUN-TO-RUN
    bit-stable regardless of partitioning, and pure codegen long sums
    instead of the earlier per-row double->DECIMAL(38,12) casts +
    BigDecimal accumulation).  The closed form is then evaluated in
    double with the same association in both engines; slope is
    invariant under the common ×100 scaling of x and y, intercept
    scales by 100 and is divided back identically on both sides.  The
    published values (6-digit rounding contract) are UNCHANGED row for
    row vs the decimal formulation at sf0.001/0.01/0.1 — the exact
    sums differ from the decimal ones only by the ~1e-13-relative
    double-product rounding noise the decimal casts used to keep,
    five orders of magnitude below the publication precision.  One
    scan, map-side-combinable sums, a 4-row reduce — at 100 TB this
    costs one pass like any groupBy-sum.  (Spark's
    regr_slope/regr_intercept aggregates would accumulate in double
    and lose even run-to-run bit-stability; deliberately not used.)
    """
    from etl_addresses_spark.operators.sketches import (
        limb_guard,
        limb_recomb,
        limb_sum_aggs,
    )

    li = load_table(spark, sf_dir, "lineitem")
    u = F.round(F.col("l_quantity") * 100).cast("long")
    v = F.round(F.col("l_extendedprice") * 100).cast("long")
    # r15: the FIRST moments (sx, sy) ride the limb machinery too — a
    # plain long sum of extendedprice cents wraps int64 at ~9e11
    # worst-case rows, inside the 100 TB envelope; the limb path is
    # exact to ~4.39e12 rows and limb_guard raises loudly past that
    # (r14 verdict item 2; envelope stated at the machinery comment in
    # operators/sketches.py).
    m = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *limb_sum_aggs(u, "sx", limbs=2),
        *limb_sum_aggs(v, "sy", limbs=2),
        *limb_sum_aggs(u * u, "sxx"),
        *limb_sum_aggs(u * v, "sxy"),
    )
    slope = (
        f"(cast(n as double) * {limb_recomb('sxy')}"
        f" - {limb_recomb('sx', limbs=2)} * {limb_recomb('sy', limbs=2)})"
        f" / (cast(n as double) * {limb_recomb('sxx')}"
        f" - {limb_recomb('sx', limbs=2)} * {limb_recomb('sx', limbs=2)})"
    )
    return m.selectExpr(
        "l_returnflag",
        "l_linestatus",
        "n",
        limb_guard(f"round({slope}, 6)") + " as slope",
        limb_guard(
            f"round(({limb_recomb('sy', limbs=2)} - ({slope}) * {limb_recomb('sx', limbs=2)})"
            " / cast(n as double) / 100e0, 6)"
        )
        + " as intercept",
    )


def _stats_regression_group_sql() -> str:
    from etl_addresses_spark.operators.sketches import (
        limb_recomb,
        limb_sum_sql,
    )

    u = "CAST(round(l_quantity*100) AS BIGINT)"
    v = "CAST(round(l_extendedprice*100) AS BIGINT)"
    sums = ", ".join(
        limb_sum_sql(u, "sx", limbs=2)
        + limb_sum_sql(v, "sy", limbs=2)
        + limb_sum_sql(f"{u} * {u}", "sxx")
        + limb_sum_sql(f"{u} * {v}", "sxy")
    )
    # identical expression text to the Spark side minus the overflow
    # guard (DuckDB sum(BIGINT) promotes to HUGEINT)
    slope = (
        f"(cast(n as double) * {limb_recomb('sxy')}"
        f" - {limb_recomb('sx', limbs=2)} * {limb_recomb('sy', limbs=2)})"
        f" / (cast(n as double) * {limb_recomb('sxx')}"
        f" - {limb_recomb('sx', limbs=2)} * {limb_recomb('sx', limbs=2)})"
    )
    return f"""
WITH m AS (
  SELECT l_returnflag, l_linestatus, count(*) AS n,
    {sums}
  FROM lineitem GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus, n,
  round({slope}, 6) AS slope,
  round(({limb_recomb('sy', limbs=2)} - ({slope}) * {limb_recomb('sx', limbs=2)})
    / cast(n as double) / 100e0, 6) AS intercept
FROM m
"""


STATS_REGRESSION_GROUP_SQL = _stats_regression_group_sql()


# --- the in-regime PassJoin row -----------------------------------------

TITLE_WORDS = 4
TITLE_MAX_DIST = 2


def fuzzy_title_match_passjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PassJoin fuzzy match IN ITS PRUNING REGIME: best edit-distance-
    <= {TITLE_MAX_DIST} match between document 'titles' (the first
    {TITLE_WORDS} words of each text, 14-28 chars at every sf — a
    genuinely heterogeneous length distribution) across the even/odd
    doc_id halves of the corpus.

    Why this row exists: `fuzzy_name_match_passjoin` proves the
    segment-pigeonhole algorithm on the supplier/customer fixture,
    but there d=6 against ~18-char names violates the regime rule
    median_len/(d+1) >= 3 (SCALE.md round 5) — segments degrade to
    1-2 chars and candidates balloon past the length-band tier.  Here
    d={TITLE_MAX_DIST} against median ~21 chars gives 7-char segments:
    an exact-substring hit on a 7-gram is rare, so candidate volume
    collapses versus the quadratic all-pairs (measured in
    tools/stress_fuzzy.py).  Same three-part shape as the name tiers:
    HOF-generated segment/window keys, equi-join, banded-levenshtein
    verify + min(struct) argmin.  The derived title is
    split/slice/array_join — JVM-side, no UDF.
    """
    from etl_addresses_spark.plans.relational3 import fuzzy_match_passjoin_for

    docs = load_table(spark, sf_dir, "documents")
    title = F.array_join(
        F.slice(F.split(F.col("text"), " "), 1, TITLE_WORDS), " "
    )
    evens = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("s_suppkey"), title.alias("s_name")
    )
    odds = docs.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("c_custkey"), title.alias("c_name")
    )
    out = fuzzy_match_passjoin_for(evens, odds, d=TITLE_MAX_DIST)
    return out.select(
        F.col("s_suppkey").alias("even_doc"),
        F.col("s_name").alias("even_title"),
        F.col("c_custkey").alias("odd_doc"),
        F.col("c_name").alias("odd_title"),
        "dist",
    )


FUZZY_TITLE_PASSJOIN_SQL = f"""
WITH t AS (
  SELECT doc_id,
    array_to_string(list_slice(string_split(text, ' '), 1, {TITLE_WORDS}), ' ')
      AS title
  FROM documents
),
e AS (SELECT doc_id AS even_doc, title AS even_title FROM t WHERE doc_id % 2 = 0),
o AS (SELECT doc_id AS odd_doc, title AS odd_title FROM t WHERE doc_id % 2 = 1)
SELECT even_doc, even_title, odd_doc, odd_title, dist FROM (
  SELECT e.even_doc, e.even_title, o.odd_doc, o.odd_title,
    CAST(levenshtein(even_title, odd_title) AS BIGINT) AS dist,
    row_number() OVER (PARTITION BY even_doc
                       ORDER BY levenshtein(even_title, odd_title) ASC,
                                odd_doc ASC) AS rn
  FROM e CROSS JOIN o
  WHERE levenshtein(even_title, odd_title) <= {TITLE_MAX_DIST})
WHERE rn = 1
"""


QUERIES7 = {
    "sessions_path_topk": (sessions_path_topk, SESSIONS_PATH_TOPK_SQL),
    "stats_regression_group": (stats_regression_group, STATS_REGRESSION_GROUP_SQL),
    "fuzzy_title_match_passjoin": (
        fuzzy_title_match_passjoin,
        FUZZY_TITLE_PASSJOIN_SQL,
    ),
}
