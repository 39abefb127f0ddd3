"""Fifth batch: the remaining TPC-H query shapes, adapted to the driver
schema (no partsupp / l_shipmode / l_commitdate / c_phone — each query
keeps the original's *plan shape* while substituting available columns).
Same determinism rules as plans/relational.py: decimal-cast sums for
float parity, `e0` literals in oracle SQL, long casts for int32-ish
Spark outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_addresses_spark.sources.tables import load_table


def _dec_sum(col, scale: str = "decimal(18,4)"):
    return F.sum(col.cast(scale)).cast("double")


def q2_min_cost_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: join back to the row achieving a per-group minimum
    (cheapest part per brand).  The aggregate side is tiny -> broadcast."""
    p = load_table(spark, sf_dir, "part")
    mins = p.groupBy(F.col("p_brand").alias("mb")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        p.join(
            F.broadcast(mins),
            (p.p_brand == F.col("mb")) & (p.p_retailprice == F.col("min_price")),
        )
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
    )


Q2_SQL = """
SELECT p_brand, p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice = (SELECT min(p_retailprice) FROM part p2
                       WHERE p2.p_brand = part.p_brand)
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: yearly market share of one supplier nation within one
    customer region (conditional-sum ratio per year)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .groupBy(F.year("l_shipdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_1",
                        vol.cast("decimal(18,4)"),
                    )
                ).cast("double")
                / F.sum(vol.cast("decimal(18,4)")).cast("double")
            ).alias("mkt_share")
        )
    )


Q8_SQL = """
SELECT year(l_shipdate) AS o_year,
  CAST(sum(CASE WHEN n2.n_name = 'NATION_1'
                THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) END) AS DOUBLE)
  / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
  AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
WHERE r_name = 'AFRICA'
GROUP BY 1
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: groups whose aggregate exceeds a fraction of the global
    total (scalar subquery -> broadcast cross join of a 1-row aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    scoped = li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey).join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    )
    per_part = scoped.groupBy("l_partkey").agg(
        _dec_sum(F.col("l_extendedprice")).alias("part_value")
    )
    total = scoped.agg(
        (_dec_sum(F.col("l_extendedprice")) * 0.001).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


Q11_SQL = """
SELECT l_partkey,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS part_value
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_regionkey = 0
GROUP BY l_partkey
HAVING CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) >
  (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) * 0.001e0
   FROM lineitem
   JOIN supplier ON l_suppkey = s_suppkey
   JOIN nation ON s_nationkey = n_nationkey
   WHERE n_regionkey = 0)
"""


def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional counts of high/low priority orders among
    late shipments, per line status."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return late.groupBy("l_linestatus").agg(
        F.count(F.when(high, 1)).alias("high_line_count"),
        F.count(F.when(~high, 1)).alias("low_line_count"),
    )


Q12_SQL = """
SELECT l_linestatus,
  count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
    AS high_line_count,
  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
    AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate
GROUP BY l_linestatus
"""


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of per-customer order counts (left outer
    join preserving zero-order customers, then a second aggregation)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: revenue-per-supplier view over a date window, then the
    supplier(s) achieving the maximum (scalar-max join-back).  Revenue is
    a decimal sum cast to double, so max-equality is exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-07-01")))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue == F.col("max_rev"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
      AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-07-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per part attribute triple.
    The part<->supplier bridge is lineitem (schema has no partsupp)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#3")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#3'
GROUP BY p_brand, p_type, p_size
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: rows below a per-group threshold derived from the same
    table (0.2 * per-part average quantity), then a global sum / 7.
    The average is built as decimal-sum / count so both engines agree
    bit-for-bit before the multiply."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    scoped = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    thresholds = scoped.groupBy(F.col("l_partkey").alias("tk")).agg(
        (
            0.2
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            )
        ).alias("qty_threshold")
    )
    return (
        scoped.join(thresholds, scoped.l_partkey == F.col("tk"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (_dec_sum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly")
        )
    )


Q17_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0e0
  AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.2e0 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE))
    FROM lineitem l2
    JOIN part p2 ON l2.l_partkey = p2.p_partkey
    WHERE p2.p_brand = 'Brand#1' AND l2.l_partkey = lineitem.l_partkey)
"""


def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers that were the ONLY late supplier on a
    multi-supplier finished order.  The reference formulation is
    EXISTS / NOT EXISTS (kept in the oracle SQL); the Spark plan uses an
    equivalent per-order aggregate — one shuffle on orderkey instead of
    two correlated probes, which is the scalable formulation."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    lines = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate")).alias("is_late"),
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    culprit = (
        lines.filter(F.col("is_late"))
        .join(
            per_order.filter(
                (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
            ),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        culprit.join(F.broadcast(s), culprit.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM (
  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
  FROM lineitem l1
  JOIN orders ON l1.l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
    AND EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_shipdate > o3.o_orderdate)
) culprit
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: customers above a global-average balance with no
    URGENT orders (scalar subquery + anti join), rolled up per market
    segment.  (Plain "no orders" is empty at every test SF — the
    generator gives all customers orders — so the anti-join side is the
    urgent subset to keep the check non-vacuous.)"""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_bal")
    )
    rich = c.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        _dec_sum(F.col("c_acctbal")).alias("totacctbal"),
    )


Q22_SQL = """
SELECT c_mktsegment, count(*) AS numcust,
  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                          / CAST(count(*) AS DOUBLE)
                   FROM customer WHERE c_acctbal > 0.0e0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


QUERIES5 = {
    "q2_min_cost_part": (q2_min_cost_part, Q2_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q11_important_parts": (q11_important_parts, Q11_SQL),
    "q12_priority_by_status": (q12_priority_by_status, Q12_SQL),
    "q13_order_distribution": (q13_order_distribution, Q13_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q16_supplier_variety": (q16_supplier_variety, Q16_SQL),
    "q17_small_quantity_revenue": (q17_small_quantity_revenue, Q17_SQL),
    "q21_sole_late_supplier": (q21_sole_late_supplier, Q21_SQL),
    "q22_idle_customers": (q22_idle_customers, Q22_SQL),
}
