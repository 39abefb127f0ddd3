"""Approximate sketch operators (the cardinality/quantile path at 100 TB).

Exact distinct counts and percentiles shuffle full key sets; sketches
shuffle constant-size state and merge associatively — the only viable
shape for distinct-users-per-day over a petabyte.  Spark ships Apache
DataSketches HLL (hll_sketch_agg / hll_union) and a KLL-style
approx_percentile; both are registered rows-only (approximate values
are engine-specific) with pytest error-bound and mergeability checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_addresses_spark.sources.tables import load_table


def hll_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct part/supplier estimates per return flag, alongside
    the exact counts (the sketch error is asserted in pytest)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").alias(
            "approx_parts"
        ),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_supps_hllpp"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
    )


def hll_mergeable_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch mergeability: per-group HLL sketches unioned into a global
    estimate WITHOUT touching the raw data again — the property that
    makes sketches pre-aggregable in a rollup cube."""
    li = load_table(spark, sf_dir, "lineitem")
    per_group = li.groupBy("l_returnflag").agg(
        F.expr("hll_sketch_agg(l_partkey)").alias("sketch")
    )
    return per_group.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sketch))").alias(
            "approx_global_parts"
        )
    )


def approx_quantiles_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile with bounded accuracy vs the exact values.

    Scalar double columns only (no arrays): the driver's canonicalizer
    hashes row values and cannot sort list-valued cells.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr(
            "approx_percentile(o_totalprice, 0.5, 10000)"
        ).alias("approx_p50"),
        F.expr(
            "approx_percentile(o_totalprice, 0.9, 10000)"
        ).alias("approx_p90"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("exact_p90"),
    )


def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit fingerprint into 4
    16-bit bands (any exact band match -> candidate: catches all pairs
    with hamming distance <= 3 by pigeonhole, most up to ~10), then
    verify with bit_count(xor) <= 10.  Candidates are band-local —
    never all-pairs."""
    from etl_addresses_spark.operators.dedup import simhash_fingerprints

    fp = simhash_fingerprints(spark, sf_dir)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.expr(f"(simhash >> {16 * b}) & 65535").alias("bits"),
            )
            for b in range(4)
        ]
    )
    banded = fp.select(
        "doc_id", F.col("simhash"), F.explode(bands).alias("bb")
    ).select("doc_id", "simhash", "bb.band", "bb.bits")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bits") == F.col("b.bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= 10)
        .select("doc_a", "doc_b", "hamming")
    )
