"""r15 probe: does localCheckpoint preserve outputPartitioning in
Spark 4.1.2 (with AQE on, the session defaults)?  And does a .cache()
of a repartitioned frame expose its partitioning to consumers?

Decides the implementation route for the r14 verdict item 4
(dedup_incremental_lsh shared doc_id exchange retry).
"""
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_addresses_spark.session import get_spark  # noqa: E402

spark = get_spark("r15-probe-ckpt")
spark.sparkContext.setLogLevel("ERROR")


def fmt(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


base = spark.range(0, 1_000_000).select(
    (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
)

print("=== A) groupBy on localCheckpoint(repartition(k)) ===")
ck = base.repartition(16, "k").localCheckpoint(eager=True)
plan = fmt(ck.groupBy("k").agg(F.sum("v").alias("s")))
print("Exchanges:", plan.count("Exchange"),
      "| scan partitioning line:",
      [l for l in plan.splitlines() if "ExistingRDD" in l and "Arguments" in l][:1])

print("=== B) groupBy on cache(repartition(k)) ===")
ca = base.repartition(16, "k").cache()
ca.count()
plan = fmt(ca.groupBy("k").agg(F.sum("v").alias("s")))
print("Exchanges:", plan.count("Exchange"))
print([l for l in plan.splitlines() if "Exchange" in l][:4])

print("=== C) groupBy on subset key: cache(repartition(k)).groupBy(k, v%10) ===")
plan = fmt(ca.groupBy("k", (F.col("v") % 10).alias("m")).agg(F.count("*").alias("c")))
print("Exchanges:", plan.count("Exchange"))
print([l for l in plan.splitlines() if "Exchange" in l][:4])

print("=== conf ===")
for key in [
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
]:
    try:
        print(key, "=", spark.conf.get(key))
    except Exception as e:
        print(key, "unreadable:", e)
