"""r15 probe: per-phase timing + round-k plan for graph_bfs_distances.

Replicates the operator with per-job timing so the 5.33 s driver
reading decomposes into edge-build / seed / per-hop / final-union
parts, and prints hop 3's pre-checkpoint plan (the one with the widest
visited union) to check the r14-verdict planning-cost hypothesis.

Usage: python tools/r15_probe_bfs.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_addresses_spark.ckpt import CheckpointChain  # noqa: E402
from etl_addresses_spark.functions.sizing import (  # noqa: E402
    cpu_partitions,
    loop_partitions,
)
from etl_addresses_spark.operators.graph import BFS_HOPS, BFS_SEEDS  # noqa: E402
from etl_addresses_spark.session import (  # noqa: E402
    get_spark,
    scoped_shuffle_partitions,
)
from etl_addresses_spark.sources.tables import load_table  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark("r15-probe-bfs")
spark.sparkContext.setLogLevel("ERROR")


def fmt(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


T0 = time.perf_counter()
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
    .repartition(n_cpu, "v_")
    .cache()
)
seeds = (
    nbr.select(F.col("v_").alias("node"))
    .distinct()
    .orderBy("node")
    .limit(BFS_SEEDS)
)
chain = CheckpointChain()
t0 = time.perf_counter()
frontier = chain.step(
    seeds.select("node", F.lit(0).cast("long").alias("dist")), "f0"
)
print(f"== plan+seed job (includes cache materialize): "
      f"{time.perf_counter()-t0:.3f}s  (total so far "
      f"{time.perf_counter()-T0:.3f}s)")
frontiers = [frontier]
t0 = time.perf_counter()
n_nbr = nbr.count()
print(f"== nbr.count gate: {time.perf_counter()-t0:.3f}s n_nbr={n_nbr} "
      f"loop_width={loop_partitions(n_nbr)}")
with scoped_shuffle_partitions(spark, loop_partitions(n_nbr)):
    for k in range(1, BFS_HOPS + 1):
        reached = (
            nbr.join(frontier, nbr.v_ == frontier.node)
            .select(F.col("w").alias("node"))
            .distinct()
        )
        visited = frontiers[0].select("node")
        for f in frontiers[1:]:
            visited = visited.unionAll(f.select("node"))
        nxt = reached.join(visited, "node", "left_anti").select(
            "node", F.lit(k).cast("long").alias("dist")
        )
        if k == BFS_HOPS - 1:
            print(f"===== HOP {k} plan (pre-checkpoint) =====")
            print(fmt(nxt))
        t0 = time.perf_counter()
        frontier = chain.step(nxt, f"f{k}")
        fn = frontier.count()
        print(f"== hop {k}: checkpoint {time.perf_counter()-t0:.3f}s "
              f"frontier_rows={fn}")
        frontiers.append(frontier)
out = frontiers[0]
for f in frontiers[1:]:
    out = out.unionAll(f)
t0 = time.perf_counter()
out.write.format("noop").mode("overwrite").save()
print(f"== final union noop: {time.perf_counter()-t0:.3f}s")
print(f"== TOTAL: {time.perf_counter()-T0:.3f}s")
