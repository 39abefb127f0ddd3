"""Second batch of oracle-checked relational operators: cube/grouping,
exact percentiles, unpivot, higher-order array functions, the as-of
join (which Spark has no native operator for), and per-group top terms.
Same determinism rules as plans/relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_addresses_spark.sources.tables import load_table


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets with grouping_id disambiguation (a rollup row
    with NULL keys is distinguishable from a NULL data value)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping_id().alias("gid"),
    )


AGG_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       GROUPING(l_returnflag, l_linestatus) AS gid
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`, verified bit-identical).  At 100 TB you would use
    approx_percentile; the exact form is the correctness baseline."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50_price"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90_price"),
        F.expr("percentile(l_quantity, 0.25)").alias("p25_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


AGG_PERCENTILES_SQL = """
SELECT l_returnflag,
  quantile_cont(l_extendedprice, 0.5) AS p50_price,
  quantile_cont(l_extendedprice, 0.9) AS p90_price,
  quantile_cont(l_quantity, 0.25) AS p25_qty,
  min(l_extendedprice) AS min_price,
  max(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag
"""


def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long unpivot (stack) of three lineitem measures."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, "
            "'discount', l_discount) AS (measure, value)"
        ),
    )


UNPIVOT_MEASURES_SQL = """
SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
"""


def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the tokenized documents:
    filter/transform/slice/sort/contains — the Catalyst lambda surface."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    w = F.col("w")
    return toks.select(
        "doc_id",
        F.size(w).cast("long").alias("n"),
        F.size(F.filter(w, lambda t: F.length(t) > 5)).cast("long").alias("n_long"),
        F.concat_ws("|", F.slice(F.array_sort(w), 1, 3)).alias("first3_sorted"),
        F.array_contains(w, "spark").alias("has_spark"),
        F.size(F.array_distinct(F.transform(w, F.upper))).cast("long").alias("n_upper_distinct"),
    )


SCALAR_ARRAY_FUNCS_SQL = """
SELECT doc_id,
  len(string_split(text, ' ')) AS n,
  len(list_filter(string_split(text, ' '), t -> length(t) > 5)) AS n_long,
  array_to_string(list_sort(string_split(text, ' '))[1:3], '|') AS first3_sorted,
  list_contains(string_split(text, ' '), 'spark') AS has_spark,
  len(list_distinct(list_transform(string_split(text, ' '), t -> upper(t)))) AS n_upper_distinct
FROM documents
"""


def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (no native Spark operator): for every purchase event,
    the most recent STRICTLY PRIOR view event of the same user.

    Composition: union-tag both sides, one window pass ordered by
    (ts, view-before-purchase) carrying the running last view via
    last_value(ignoreNulls) — a single shuffle on user_id, no range
    cross join, the scalable pattern for time-series alignment.
    Ties (equal ts) order views before purchases so a same-instant view
    is visible to the purchase, and event_id breaks exact ties
    deterministically."""
    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts"),
        F.col("event_id"),
        F.lit(0).alias("kind"),  # views sort before co-timestamped purchases
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts"), F.col("event_id"), F.lit(1).alias("kind")
    )
    tagged = views.unionByName(purchases)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    last_view_id = F.last(
        F.when(F.col("kind") == 0, F.col("event_id")), ignorenulls=True
    ).over(w)
    last_view_ts = F.last(
        F.when(F.col("kind") == 0, F.unix_micros(F.col("ts"))), ignorenulls=True
    ).over(w)
    return (
        tagged.withColumn("view_event_id", last_view_id)
        .withColumn("view_ts_us", last_view_ts)
        .filter(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("purchase_event_id"),
            "user_id",
            F.unix_micros(F.col("ts")).alias("purchase_ts_us"),
            "view_event_id",
            "view_ts_us",
        )
    )


ASOF_JOIN_EVENTS_SQL = """
WITH tagged AS (
  SELECT user_id, ts, event_id, 0 AS kind FROM events WHERE event_type = 'view'
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS kind FROM events WHERE event_type = 'purchase'
),
marked AS (
  SELECT *,
    last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, kind, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS view_event_id,
    last_value(CASE WHEN kind = 0 THEN epoch_us(ts) END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, kind, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS view_ts_us
  FROM tagged
)
SELECT event_id AS purchase_event_id, user_id, epoch_us(ts) AS purchase_ts_us,
       view_event_id, view_ts_us
FROM marked WHERE kind = 1
"""


def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tokens per document by frequency (explode -> count ->
    rank), deterministic tie-break on the token itself."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    counts = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("tok"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "tok", "cnt")
    )


TEXT_TOP_TERMS_SQL = """
SELECT doc_id, rnk, tok, cnt FROM (
  SELECT doc_id, tok, cnt,
    row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, tok ASC) AS rnk
  FROM (
    SELECT doc_id, tok, count(*) AS cnt
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY doc_id, tok
  )
)
WHERE rnk <= 3
"""


QUERIES2 = {
    "agg_cube": (agg_cube, AGG_CUBE_SQL),
    "agg_percentiles": (agg_percentiles, AGG_PERCENTILES_SQL),
    "unpivot_measures": (unpivot_measures, UNPIVOT_MEASURES_SQL),
    "scalar_array_funcs": (scalar_array_funcs, SCALAR_ARRAY_FUNCS_SQL),
    "asof_join_events": (asof_join_events, ASOF_JOIN_EVENTS_SQL),
    "text_top_terms": (text_top_terms, TEXT_TOP_TERMS_SQL),
}
