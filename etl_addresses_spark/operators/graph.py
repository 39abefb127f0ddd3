"""Iterative graph analytics over the emitted relation edges.

PageRank done the Spark-iterative way (GraphX's Pregel loop expressed
in DataFrames):

* edges are repartitioned ONCE by src and cached — every iteration's
  rank-join shuffles only the (node, rank) side to the edges'
  partitioning, never the (much larger) edge set.
* per-iteration contributions are summed as DECIMAL(38,18), which is
  order-independent across shuffle partitions, so ranks are
  bit-deterministic run-to-run (a plain double sum is not).
* dangling mass (nodes with no out-edges) is redistributed uniformly —
  the standard correction that keeps the rank vector summing to 1.
* `localCheckpoint` truncates lineage each iteration; without it the
  plan doubles per round and the job dies of planning time long before
  it dies of data size.

Fixed-iteration float recursion is not ANSI-SQL-expressible -> the
registry entry is a rows-only check; pytest validates against a dense
NumPy power iteration on the same (small) graph and asserts the
mass-conservation invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAMPING = 0.85
PR_ITERS = 10

_DEC = "decimal(38,18)"


def pagerank(edges: DataFrame, iters: int = PR_ITERS, damping: float = DAMPING) -> DataFrame:
    """PageRank over (from_id, to_id) edges; returns (node, rank)."""
    e = (
        edges.select(
            F.col("from_id").alias("src"), F.col("to_id").alias("dst")
        )
        .distinct()
        .repartition("src")
        .cache()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n_nodes = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg")).cache()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(iters):
        with_deg = ranks.join(out_deg, ranks.node == out_deg.src, "left")
        # mass from dangling nodes (no out-edges) spreads uniformly.
        # It rides the SAME job as the rank update: a 1-row aggregate
        # broadcast into the select, instead of a per-iteration
        # driver-side collect() — one Spark job per iteration total
        # (the eager localCheckpoint below is the only action).
        dangling_df = (
            with_deg.filter(F.col("out_deg").isNull())
            .agg(
                F.coalesce(
                    F.sum(F.col("rank").cast(_DEC)), F.lit(0).cast(_DEC)
                )
                .cast("double")
                .alias("dangling")
            )
        )
        contribs = (
            with_deg.filter(F.col("out_deg").isNotNull())
            .select(
                F.col("node").alias("c_src"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
            .join(e, F.col("c_src") == e.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("contrib").cast(_DEC)).cast("double").alias("recv"))
        )
        # Same float association as the former driver-side arithmetic:
        # ((1-d)/n + (d*dangling)/n) + d*recv.
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling_df))
            .select(
                "node",
                (
                    (
                        F.lit((1.0 - damping) / n_nodes)
                        + (F.lit(damping) * F.col("dangling"))
                        / F.lit(float(n_nodes))
                    )
                    + F.lit(damping) * F.coalesce(F.col("recv"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def pagerank_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry surface: PageRank over the transform-step relation
    edges (address->street `st:in`, id->houseNumber `st:sameAs`)."""
    from etl_addresses_spark.plans.transform import transform_relations

    edges = transform_relations(spark, sf_dir)
    return pagerank(edges.select("from_id", "to_id"))
