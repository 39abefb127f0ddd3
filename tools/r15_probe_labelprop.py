"""r15 probe: what does ONE labelprop round's votes-join plan look like?

Replicates graph_communities_labelprop up to round 1's `labels` frame
and prints the FORMATTED plan of the round-1 votes aggregation, so the
claims in the r14 verdict item 3 ("the static neighbor side re-exchanges
every round"?) are settled by a plan read instead of argued.  Also times
each loop round as its own labelled job.

Usage: python tools/r15_probe_labelprop.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_addresses_spark.ckpt import CheckpointChain  # noqa: E402
from etl_addresses_spark.functions.sizing import (  # noqa: E402
    cpu_partitions,
    loop_partitions,
)
from etl_addresses_spark.operators.graph import LPA_ITERS  # noqa: E402
from etl_addresses_spark.session import (  # noqa: E402
    get_spark,
    scoped_shuffle_partitions,
)
from etl_addresses_spark.sources.tables import load_table  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark("r15-probe-lpa")
spark.sparkContext.setLogLevel("ERROR")


def fmt(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


li_scan = load_table(spark, SF, "lineitem").select(
    F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p")
)
n_cpu = cpu_partitions(li_scan)
per_order = li_scan.groupBy("ok").agg(
    F.sort_array(F.collect_set("p")).alias("ps")
)
pair_expr = F.expr(
    "explode(flatten(transform(ps, (x, i) -> "
    "transform(slice(ps, i + 2, size(ps) - i - 1), "
    "y -> struct(x AS u, y AS v)))))"
)
edges = (
    per_order.select(pair_expr.alias("e"))
    .select(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
    .distinct()
)
nbr = (
    edges.select(F.col("u").alias("v_"), F.col("v").alias("w"))
    .unionAll(edges.select(F.col("v").alias("v_"), F.col("u").alias("w")))
    .repartition(n_cpu, "w")
    .cache()
)
labels = nbr.select(F.col("v_").alias("node")).distinct().select(
    "node", F.col("node").alias("lab")
)
chain = CheckpointChain()
t0 = time.perf_counter()
n_nbr = nbr.count()
print(f"== edge build + cache materialize: {time.perf_counter()-t0:.3f}s "
      f"n_nbr={n_nbr} n_cpu={n_cpu} loop_width={loop_partitions(n_nbr)}")

with scoped_shuffle_partitions(spark, loop_partitions(n_nbr)):
    for k in range(LPA_ITERS):
        votes = (
            nbr.join(labels, nbr.w == labels.node)
            .groupBy("v_", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        nxt = (
            votes.groupBy(F.col("v_").alias("node"))
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("nc"), F.col("lab"))
                ).alias("m")
            )
            .select("node", F.col("m.lab").alias("lab"))
        )
        if k == 1:
            print(f"===== ROUND {k} argmax plan (pre-checkpoint) =====")
            print(fmt(nxt))
        t0 = time.perf_counter()
        labels = chain.step(nxt, "labels")
        print(f"== round {k} checkpoint job: {time.perf_counter()-t0:.3f}s")

out = labels.groupBy(F.col("lab").alias("community")).agg(
    F.count(F.lit(1)).alias("size")
)
t0 = time.perf_counter()
out.write.format("noop").mode("overwrite").save()
print(f"== final agg: {time.perf_counter()-t0:.3f}s")
