"""Standard relational operator surface with DuckDB oracles.

The reference implements only one join (SURVEY.md §2.3); the driver's
oracle suite expects the engine to expose the full relational surface —
equi/semi/anti/outer joins, hash aggregation, rollup, windows, set ops,
sorts/limits, scalar string/date/math/json functions — over the
TPC-H-ish tables.  Each query here is a (Spark callable, DuckDB SQL)
pair producing bit-identical results.

Float determinism pattern: Spark and DuckDB may sum doubles in
different orders, so every SUM/AVG over a double column casts to
DECIMAL first (exact, order-independent) and casts the final value back
to double — both engines then emit the identical IEEE double.  Products
of doubles are computed double-side in the same association order on
both engines, which is deterministic, then cast to decimal for the sum.

Every ORDER BY ... LIMIT query carries a unique tie-break key so the
selected row set is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_addresses_spark.sources.tables import load_table


def _dec_sum(col, scale: str = "decimal(18,2)"):
    return F.sum(col.cast(scale)).cast("double")


# --- A. aggregation ------------------------------------------------------


def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan -> filter -> hash agg (map-side partial
    combine; only 4 groups so the shuffle is tiny at any scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity")).alias("sum_qty"),
            _dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dec_sum(disc_price, "decimal(18,4)").alias("sum_disc_price"),
            _dec_sum(charge, "decimal(18,6)").alias("sum_charge"),
            (_dec_sum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
            (_dec_sum(F.col("l_extendedprice")) / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            (_dec_sum(F.col("l_discount")) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


AGG_PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (grouping sets)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        _dec_sum(F.col("l_quantity")).alias("sum_qty"),
    )


AGG_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


AGG_DISTINCT_COUNTS_SQL = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


def agg_pivot_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot expressed as conditional aggregation (portable shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_linestatus") == "O", qty)).cast("double").alias("qty_o"),
        F.sum(F.when(F.col("l_linestatus") == "F", qty)).cast("double").alias("qty_f"),
    )


AGG_PIVOT_CASE_SQL = """
SELECT l_returnflag,
  CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o,
  CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f
FROM lineitem GROUP BY l_returnflag
"""


# --- B. joins ------------------------------------------------------------


def join_topk_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: dim filter -> 3-way equi-join -> agg -> top-k.
    customer is broadcast (small dim); lineitem/orders join shuffles on
    orderkey.  Deterministic LIMIT via (revenue desc, orderkey) order."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(_dec_sum(revenue, "decimal(18,4)").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


JOIN_TOPK_ORDER_REVENUE_SQL = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def join_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with two broadcast dims, agg by nation."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_dec_sum(revenue, "decimal(18,4)").alias("revenue"))
    )


JOIN_REGION_VOLUME_SQL = """
SELECT n_name,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def join_semi_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS): orders with any high-quantity lineitem."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


JOIN_SEMI_ORDERS_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
"""


def join_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS): customers who never ordered."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


JOIN_ANTI_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def join_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + agg: order count/value per customer incl. zero.

    The aggregate is pushed BELOW the join: orders collapse to one row
    per o_custkey first (map-side partial agg does most of it), then
    customers left-join the already-aggregated side.  Same result as
    join-then-group (c_custkey is the customer key, so the post-join
    grouping was per-customer anyway), but the join probes |customers|
    x |distinct custkeys| instead of fanning every order row through
    the join — the shape that survives a 100x orders scale-up.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("_n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_s"),
    )
    return c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce(F.col("_n"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("_s").cast("double"), F.lit(0.0)).alias("total_spent"),
    )


JOIN_OUTER_ORDER_COUNTS_SQL = """
SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders,
  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


# --- C. windows ----------------------------------------------------------


def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per market segment (rank per group)."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "rnk", "c_custkey", "c_name", "c_acctbal")
    )


WINDOW_TOPK_PER_GROUP_SQL = """
SELECT c_mktsegment, rnk, c_custkey, c_name, c_acctbal FROM (
  SELECT *, row_number() OVER (
    PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
  FROM customer)
WHERE rnk <= 3
"""


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order total (cumulative window sum; decimal
    accumulation so the prefix sums are order-exact)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


WINDOW_RUNNING_TOTAL_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
"""


def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): per-user microsecond gap between consecutive events."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    )


WINDOW_LAG_DELTA_SQL = """
SELECT user_id, event_id,
  epoch_us(ts) - epoch_us(lag(ts) OVER (
    PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
FROM events
"""


# --- D. set operations ---------------------------------------------------


def set_union_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    early = o.filter(F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    late = o.filter(F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01")))
    return (
        early.select("o_custkey")
        .union(late.select("o_custkey"))
        .distinct()
        .select(F.col("o_custkey").alias("custkey"))
    )


SET_UNION_BUYERS_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
UNION
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
"""


def set_intersect_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    early = o.filter(F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    late = o.filter(F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01")))
    return (
        early.select("o_custkey")
        .intersect(late.select("o_custkey"))
        .select(F.col("o_custkey").alias("custkey"))
    )


SET_INTERSECT_BUYERS_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
"""


def set_except_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    early = o.filter(F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    late = o.filter(F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01")))
    # subtract == EXCEPT DISTINCT (exceptAll would keep keys whose early
    # multiplicity exceeds their late multiplicity).
    return (
        early.select("o_custkey")
        .subtract(late.select("o_custkey"))
        .select(F.col("o_custkey").alias("custkey"))
    )


SET_EXCEPT_BUYERS_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
"""


# --- E. sorts / limits ---------------------------------------------------


def sort_limit_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 (TakeOrderedAndProject — no full sort at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
        )
        .limit(20)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


SORT_LIMIT_GLOBAL_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 20
"""


# --- F. scalar functions -------------------------------------------------


def scalar_string_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar surface in one projection."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper(F.col("o_orderpriority")).alias("prio_upper"),
        F.substring(F.col("o_orderpriority"), 1, 1).alias("prio_code"),
        F.length(F.col("o_orderstatus")).cast("long").alias("status_len"),
        # F.concat (null-propagating) mirrors the oracle's `||`;
        # concat_ws would skip a NULL side and diverge.
        F.concat(
            F.col("o_orderstatus"), F.lit("-"), F.col("o_orderpriority")
        ).alias("status_prio"),
        F.replace(
            F.col("o_orderpriority"), F.lit("-"), F.lit("_")
        ).alias("prio_snake"),
        F.year(F.col("o_orderdate")).cast("long").alias("o_year"),
        F.month(F.col("o_orderdate")).cast("long").alias("o_month"),
        F.dayofmonth(F.col("o_orderdate")).cast("long").alias("o_day"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
        F.abs(F.col("o_orderkey") - 1000).alias("key_absdiff"),
        F.round(F.col("o_totalprice"), 0).cast("double").alias("price_rounded"),
        F.regexp_extract(F.col("o_orderpriority"), "^(\\d+)-", 1).alias("prio_num"),
    )


SCALAR_STRING_DATE_SQL = """
SELECT o_orderkey,
  upper(o_orderpriority) AS prio_upper,
  substring(o_orderpriority, 1, 1) AS prio_code,
  length(o_orderstatus) AS status_len,
  o_orderstatus || '-' || o_orderpriority AS status_prio,
  replace(o_orderpriority, '-', '_') AS prio_snake,
  year(o_orderdate) AS o_year,
  month(o_orderdate) AS o_month,
  day(o_orderdate) AS o_day,
  o_orderkey % 7 AS key_mod,
  abs(o_orderkey - 1000) AS key_absdiff,
  CAST(round(o_totalprice, 0) AS DOUBLE) AS price_rounded,
  coalesce(regexp_extract(o_orderpriority, '^(\\d+)-', 1), '') AS prio_num
FROM orders
"""


def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events props payload."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"),
    )


SCALAR_JSON_EXTRACT_SQL = """
SELECT event_id, user_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events WHERE event_type = 'purchase'
"""


# --- G. events: sessionization + tumbling windows ------------------------


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (lag + conditional cumsum), the batch
    equivalent of a session window: session breaks when the gap from the
    previous event of the same user exceeds 30 minutes."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    ws = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sessions = e.select(
        "user_id", "event_id", "ts", F.sum(is_new).over(ws).alias("session_seq")
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.unix_micros(F.col("ts"))).alias("start_us"),
        F.max(F.unix_micros(F.col("ts"))).alias("end_us"),
    )


EVENTS_SESSIONIZE_SQL = """
WITH gaps AS (
  SELECT user_id, event_id, ts,
    epoch_us(ts) - epoch_us(lag(ts) OVER (
      PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
),
tagged AS (
  SELECT user_id, event_id, ts,
    CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END AS is_new
  FROM gaps
),
sess AS (
  SELECT user_id, event_id, ts,
    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM tagged
)
SELECT user_id, session_seq, count(*) AS n_events,
       min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
FROM sess GROUP BY user_id, session_seq
"""


def events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute event-time windows (batch shape of the
    streaming groupBy(window(...)) aggregation)."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.expr("unix_micros(ts) div 300000000")
    return e.groupBy(
        bucket.alias("window_id"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        _dec_sum(F.col("value")).alias("sum_value"),
    )


EVENTS_WINDOW_AGG_SQL = """
SELECT epoch_us(ts) // 300000000 AS window_id, event_type, count(*) AS n,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


QUERIES = {
    "agg_pricing_summary": (agg_pricing_summary, AGG_PRICING_SUMMARY_SQL),
    "agg_rollup": (agg_rollup, AGG_ROLLUP_SQL),
    "agg_distinct_counts": (agg_distinct_counts, AGG_DISTINCT_COUNTS_SQL),
    "agg_pivot_case": (agg_pivot_case, AGG_PIVOT_CASE_SQL),
    "join_topk_order_revenue": (join_topk_order_revenue, JOIN_TOPK_ORDER_REVENUE_SQL),
    "join_region_volume": (join_region_volume, JOIN_REGION_VOLUME_SQL),
    "join_semi_orders": (join_semi_orders, JOIN_SEMI_ORDERS_SQL),
    "join_anti_customers": (join_anti_customers, JOIN_ANTI_CUSTOMERS_SQL),
    "join_outer_order_counts": (join_outer_order_counts, JOIN_OUTER_ORDER_COUNTS_SQL),
    "window_topk_per_group": (window_topk_per_group, WINDOW_TOPK_PER_GROUP_SQL),
    "window_running_total": (window_running_total, WINDOW_RUNNING_TOTAL_SQL),
    "window_lag_delta": (window_lag_delta, WINDOW_LAG_DELTA_SQL),
    "set_union_buyers": (set_union_buyers, SET_UNION_BUYERS_SQL),
    "set_intersect_buyers": (set_intersect_buyers, SET_INTERSECT_BUYERS_SQL),
    "set_except_buyers": (set_except_buyers, SET_EXCEPT_BUYERS_SQL),
    "sort_limit_global": (sort_limit_global, SORT_LIMIT_GLOBAL_SQL),
    "scalar_string_date": (scalar_string_date, SCALAR_STRING_DATE_SQL),
    "scalar_json_extract": (scalar_json_extract, SCALAR_JSON_EXTRACT_SQL),
    "events_sessionize": (events_sessionize, EVENTS_SESSIONIZE_SQL),
    "events_window_agg": (events_window_agg, EVENTS_WINDOW_AGG_SQL),
}
