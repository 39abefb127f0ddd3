"""Sixth relational batch: skew-safe aggregation patterns + the raw
SQL interface surface.

`skew_salted_distinct` is the 100 TB exact-distinct shape for
aggregates the planner CANNOT auto-rewrite.  (Plain `count(DISTINCT)`
Spark already expands into a partial-dedup exchange — no salting
needed.)  The naive materialization `size(collect_set(k))` however
concentrates each group's ENTIRE key set in one reducer's memory — an
OOM straggler when one group holds half the table.  Salting by
`k % n` splits each group's set across n disjoint buckets (each
distinct k lands in exactly one salt, so bucket sizes ADD exactly),
bounding any reducer's state to 1/n of a group; a second tiny shuffle
sums the n partial sizes.  A logical transformation AQE cannot make.

`sql_grouping_sets` runs through `spark.sql(...)` over registered temp
views — the engine's raw-SQL entry point — and exercises GROUPING SETS
+ grouping_id, the generalization of the rollup/cube queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_addresses_spark.sources.tables import load_table

N_SALTS = 16


def skew_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct parts per return flag via salted set
    materialization: per-(group, salt) collect_set sizes, summed per
    group.  Salt = key mod N_SALTS -> buckets are disjoint and sizes
    add exactly; no reducer ever holds a group's full key set."""
    li = load_table(spark, sf_dir, "lineitem")
    partial = (
        li.groupBy(
            "l_returnflag",
            (F.col("l_partkey") % N_SALTS).alias("_salt"),
        )
        .agg(F.size(F.collect_set("l_partkey")).cast("long").alias("d_parts"))
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(F.sum("d_parts").alias("distinct_parts"))
    )


SKEW_SALTED_DISTINCT_SQL = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts
FROM lineitem GROUP BY l_returnflag
"""


def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the raw spark.sql interface over temp views."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
          grouping_id(l_returnflag, l_linestatus) AS gid,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          count(*) AS n
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    ).withColumn("gid", F.col("gid").cast("long"))


SQL_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def window_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per-user rolling 1-hour event-value sum.
    Unlike a ROWS frame, the window is defined by event-time distance —
    the shape behind rate limiting / rolling quotas.  Numeric range on
    epoch micros keeps Spark and DuckDB frame semantics identical."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        us.alias("ts_us"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("rolling_1h_value"),
        F.count(F.lit(1)).over(w).alias("rolling_1h_events"),
    )


WINDOW_RANGE_TIME_SQL = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS rolling_1h_value,
  count(*) OVER w AS rolling_1h_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: per user, the first view -> first
    subsequent cart -> first subsequent purchase, then per-stage user
    counts.  One window pass per stage boundary, no self-joins — the
    standard product-analytics funnel at event-log scale."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
    )
    carts = e.filter(F.col("event_type") == "cart").select(
        "user_id", F.col("ts").alias("cart_ts")
    )
    first_cart = (
        per_user.join(carts, "user_id", "left")
        .filter(F.col("cart_ts") >= F.col("first_view"))
        .groupBy("user_id", "first_view")
        .agg(F.min("cart_ts").alias("first_cart"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    first_purchase = (
        first_cart.join(purchases, "user_id", "left")
        .filter(F.col("p_ts") >= F.col("first_cart"))
        .groupBy("user_id", "first_view", "first_cart")
        .agg(F.min("p_ts").alias("first_purchase"))
    )
    base = (
        per_user.filter(F.col("first_view").isNotNull())
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("1_view").alias("stage"), "n")
    )
    stage2 = first_cart.agg(F.countDistinct("user_id").alias("n")).select(
        F.lit("2_view_cart").alias("stage"), "n"
    )
    stage3 = first_purchase.agg(
        F.countDistinct("user_id").alias("n")
    ).select(F.lit("3_view_cart_purchase").alias("stage"), "n")
    return base.unionByName(stage2).unionByName(stage3)


FUNNEL_CONVERSION_SQL = """
WITH per_user AS (
  SELECT user_id,
    min(CASE WHEN event_type = 'view' THEN ts END) AS first_view
  FROM events GROUP BY user_id
),
first_cart AS (
  SELECT e.user_id, p.first_view, min(e.ts) AS first_cart
  FROM events e JOIN per_user p ON e.user_id = p.user_id
  WHERE e.event_type = 'cart' AND e.ts >= p.first_view
  GROUP BY e.user_id, p.first_view
),
first_purchase AS (
  SELECT e.user_id, min(e.ts) AS first_purchase
  FROM events e JOIN first_cart c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.first_cart
  GROUP BY e.user_id
)
SELECT '1_view' AS stage, count(*) AS n FROM per_user
WHERE first_view IS NOT NULL
UNION ALL
SELECT '2_view_cart', count(DISTINCT user_id) FROM first_cart
UNION ALL
SELECT '3_view_cart_purchase', count(DISTINCT user_id) FROM first_purchase
"""


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (adapted — no partsupp table in the fixture schema):
    suppliers who shipped more than half of a part's total 1996 volume,
    for parts with material volume.  Two grouped decimal sums share one
    scan-stage aggregation pattern; the part-total side joins back on
    the part key."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate") == 1996
    )
    per_sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq")
    )
    per_p = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("tq")
    )
    s = load_table(spark, sf_dir, "supplier")
    dominant = per_sp.join(per_p, "l_partkey").filter(
        (F.col("tq").cast("double") >= 50.0)
        & (F.col("sq").cast("double") > 0.5 * F.col("tq").cast("double"))
    )
    return (
        dominant.join(F.broadcast(s), dominant.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
    )


Q20_SQL = """
WITH li AS (
  SELECT * FROM lineitem WHERE year(l_shipdate) = 1996
),
per_sp AS (
  SELECT l_suppkey, l_partkey,
    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
  FROM li GROUP BY 1, 2
),
per_p AS (
  SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS tq
  FROM li GROUP BY 1
)
SELECT s_suppkey, s_name, count(*) AS n_dominated_parts
FROM per_sp
JOIN per_p USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE CAST(tq AS DOUBLE) >= 50.0e0
  AND CAST(sq AS DOUBLE) > 0.5e0 * CAST(tq AS DOUBLE)
GROUP BY s_suppkey, s_name
"""


def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a base rollup
    (orders before 1997) merged with a delta batch (1997 onward) by
    COMBINING PARTIAL STATES — sums add, counts add, avg re-derives
    from merged sum/count — instead of rescanning history.  At 100 TB
    this is the difference between a daily job over one day's delta and
    one over five years of history.  The oracle aggregates the full
    table directly, proving merged-partial == recomputed-from-scratch."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("timestamp")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sum_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )

    base = rollup(o.filter(F.col("o_orderdate") < cutoff))
    delta = rollup(o.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("sum_price").alias("sum_price"),
            F.sum("n_orders").alias("n_orders"),
        )
    )
    return merged.select(
        "o_orderstatus",
        F.col("sum_price").cast("double").alias("sum_price"),
        "n_orders",
        (F.col("sum_price").cast("double") / F.col("n_orders")).alias(
            "avg_price"
        ),
    )


INCREMENTAL_AGG_SQL = """
SELECT o_orderstatus,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
  count(*) AS n_orders,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
FROM orders GROUP BY o_orderstatus
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort-retention triangle over events: users cohorted by
    first-activity day, activity counted per (cohort, days-since) --
    daily grain because the synthetic event log spans one month.

    Plan: one shuffle keys the first-event aggregate on user_id; the
    activity join reuses that same user_id partitioning (no extra
    exchange); per-(cohort, age) distinct-user counts are a bounded
    two-level aggregate; cohort sizes are a tiny per-day frame that
    BROADCASTS back for the ratio.  The ratio divides explicit
    doubles.  At 100 TB the only wide ops are user_id hash
    shuffles -- no window over the full event log, no driver state.
    Day arithmetic is a calendar-date diff, exact in both engines.
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    j = e.join(first, "user_id")
    base = j.select(
        "user_id",
        F.date_format("first_ts", "yyyy-MM-dd").alias("cohort_day"),
        F.datediff(F.col("ts").cast("date"), F.col("first_ts").cast("date")).alias(
            "age_days"
        ),
    )
    active = base.groupBy("cohort_day", "age_days").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    sizes = first.groupBy(
        F.date_format("first_ts", "yyyy-MM-dd").alias("cohort_day")
    ).agg(F.count(F.lit(1)).alias("cohort_size"))
    return active.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        "age_days",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size").cast("double")).alias(
            "retention"
        ),
    )


COHORT_RETENTION_SQL = """
WITH first AS (
  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
),
base AS (
  SELECT e.user_id,
         strftime(f.first_ts, '%Y-%m-%d') AS cohort_day,
         date_diff('day', CAST(f.first_ts AS DATE), CAST(e.ts AS DATE))
           AS age_days
  FROM events e JOIN first f ON e.user_id = f.user_id
),
active AS (
  SELECT cohort_day, age_days, count(DISTINCT user_id) AS n_active
  FROM base GROUP BY cohort_day, age_days
),
sizes AS (
  SELECT strftime(first_ts, '%Y-%m-%d') AS cohort_day, count(*) AS cohort_size
  FROM first GROUP BY 1
)
SELECT a.cohort_day, age_days, n_active, cohort_size,
       CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE) AS retention
FROM active a JOIN sizes s ON a.cohort_day = s.cohort_day
"""



def window_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF gap-fill (last-observation-carried-forward): every event
    carries the user's most recent purchase value — the canonical
    time-series forward-fill (sensor readings, price marks, feature
    snapshots for training data).  `last(..., ignorenulls=True)` over a
    ROWS running frame; (ts, event_id) ordering makes the pick unique,
    and the filled value is copied (never computed), so cross-engine
    equality is exact.  One shuffle on user_id; per-partition state is
    a single carried value — scales to any history length."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy(us, F.col("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        us.alias("ts_us"),
        "event_type",
        F.last(purchase_val, ignorenulls=True).over(w).alias(
            "last_purchase_value"
        ),
    )


WINDOW_LOCF_SQL = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS last_purchase_value
FROM events
"""


QUERIES6 = {
    "skew_salted_distinct": (skew_salted_distinct, SKEW_SALTED_DISTINCT_SQL),
    "q20_dominant_suppliers": (q20_dominant_suppliers, Q20_SQL),
    "sql_grouping_sets": (sql_grouping_sets, SQL_GROUPING_SETS_SQL),
    "window_range_time": (window_range_time, WINDOW_RANGE_TIME_SQL),
    "funnel_conversion": (funnel_conversion, FUNNEL_CONVERSION_SQL),
    "incremental_agg_merge": (incremental_agg_merge, INCREMENTAL_AGG_SQL),
    "cohort_retention": (cohort_retention, COHORT_RETENTION_SQL),
    "window_locf_fill": (window_locf_fill, WINDOW_LOCF_SQL),
}


def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling: per (event_type, hour) OHLC bars over the
    event value stream — open/close via min_by/max_by on a unique
    monotone key (epoch micros scaled + event_id, DECIMAL so it never
    overflows at any corpus size), high/low as plain min/max, volume as
    an exact decimal sum.  Open/close are COPIED values and the key is
    collision-free, so every output is engine-exact.

    One hash aggregation with map-side combine — the canonical
    downsample-to-bars step that turns a raw event firehose into
    model-ready time-series features at any scale."""
    e = load_table(spark, sf_dir, "events")
    key = (
        F.expr("CAST(unix_micros(ts) AS DECIMAL(38,0)) * 1000000")
        + F.col("event_id").cast("decimal(38,0)")
    )
    hour = F.expr("unix_micros(date_trunc('hour', ts))")
    return (
        e.select(
            "event_type",
            hour.alias("hour_us"),
            "value",
            key.alias("k"),
        )
        .groupBy("event_type", "hour_us")
        .agg(
            F.min_by("value", F.col("k")).alias("open"),
            F.max_by("value", F.col("k")).alias("close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("volume"),
        )
    )


EVENTS_OHLC_SQL = """
SELECT event_type,
  epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_us,
  arg_min(value, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DECIMAL(38,0)) * 1000000
                 + CAST(event_id AS DECIMAL(38,0))) AS open,
  arg_max(value, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DECIMAL(38,0)) * 1000000
                 + CAST(event_id AS DECIMAL(38,0))) AS close,
  max(value) AS high,
  min(value) AS low,
  count(*) AS n_events,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
FROM events
GROUP BY 1, 2
"""

QUERIES6["events_ohlc_bars"] = (events_ohlc_bars, EVENTS_OHLC_SQL)


# --- snapshot reconciliation diff ----------------------------------------


def table_diff_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (anti-entropy table diff): given two
    snapshots of a keyed table, emit one row per divergent key with
    status added / removed / changed — the verification pass any
    incremental-sync or CDC pipeline needs.

    The "next" snapshot is derived deterministically from orders so
    the row is oracle-checkable: keys %97==0 deleted, then of the
    survivors %31==0 get o_totalprice bumped by 1.00, and %53==0 are
    re-inserted under key+10^7 (simulating new arrivals).

    Scale shape: each side reduces to (key, fingerprint) — the
    fingerprint is md5 over explicitly-formatted columns (decimal
    string for the price, strftime for the date), so wide rows never
    travel; the diff is ONE full-outer hash join on the key with
    status decided from null-ness + fingerprint inequality, and
    unchanged keys (the overwhelming majority in practice) are
    filtered before any further processing.  Explicit formatting
    matters: float->string rendering is engine-specific, so
    fingerprints are computed only over columns with a pinned textual
    form (the cross-engine row-hash rule)."""
    o = load_table(spark, sf_dir, "orders")

    def fp(df: DataFrame) -> DataFrame:
        return df.select(
            F.col("o_orderkey").alias("key"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("o_orderstatus"),
                    F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
                    F.date_format("o_orderdate", "yyyy-MM-dd"),
                    F.col("o_orderpriority"),
                )
            ).alias("fp"),
        )

    cur = fp(o)
    survivors = o.filter(F.col("o_orderkey") % 97 != 0)
    updated = survivors.withColumn(
        "o_totalprice",
        F.when(
            # decimal literal, NOT F.lit(1.0): a double literal would
            # promote the whole column to DOUBLE while the DuckDB
            # oracle's `+ 1.0` stays DECIMAL — the fingerprint would
            # then rely on 2-decimal values round-tripping through
            # binary double exactly (r5 advice)
            F.col("o_orderkey") % 31 == 0,
            F.col("o_totalprice") + F.lit("1.00").cast("decimal(18,2)"),
        ).otherwise(F.col("o_totalprice")),
    )
    inserted = survivors.filter(F.col("o_orderkey") % 53 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
    )
    nxt = fp(updated.unionByName(inserted))
    diff = cur.alias("a").join(
        nxt.alias("b"), F.col("a.key") == F.col("b.key"), "full_outer"
    )
    return (
        diff.select(
            F.coalesce(F.col("a.key"), F.col("b.key")).alias("o_orderkey"),
            F.when(F.col("a.key").isNull(), F.lit("added"))
            .when(F.col("b.key").isNull(), F.lit("removed"))
            .when(F.col("a.fp") != F.col("b.fp"), F.lit("changed"))
            .alias("status"),
        )
        .filter(F.col("status").isNotNull())
    )


TABLE_DIFF_SQL = """
WITH cur AS (
  SELECT o_orderkey AS key,
         md5(concat_ws('|', o_orderstatus,
                       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                       strftime(o_orderdate, '%Y-%m-%d'),
                       o_orderpriority)) AS fp
  FROM orders
),
survivors AS (SELECT * FROM orders WHERE o_orderkey % 97 != 0),
nxt_rows AS (
  SELECT o_orderkey,
         o_orderstatus,
         CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM survivors
  UNION ALL
  SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice,
         o_orderdate, o_orderpriority
  FROM survivors WHERE o_orderkey % 53 = 0
),
nxt AS (
  SELECT o_orderkey AS key,
         md5(concat_ws('|', o_orderstatus,
                       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                       strftime(o_orderdate, '%Y-%m-%d'),
                       o_orderpriority)) AS fp
  FROM nxt_rows
)
SELECT coalesce(a.key, b.key) AS o_orderkey,
       CASE WHEN a.key IS NULL THEN 'added'
            WHEN b.key IS NULL THEN 'removed'
            WHEN a.fp != b.fp THEN 'changed' END AS status
FROM cur a FULL OUTER JOIN nxt b ON a.key = b.key
WHERE (CASE WHEN a.key IS NULL THEN 'added'
            WHEN b.key IS NULL THEN 'removed'
            WHEN a.fp != b.fp THEN 'changed' END) IS NOT NULL
"""

QUERIES6["table_diff_snapshots"] = (table_diff_snapshots, TABLE_DIFF_SQL)
