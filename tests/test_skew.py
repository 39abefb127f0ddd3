from __future__ import annotations

from pyspark.sql import functions as F

from etl_addresses_spark.operators.skew import salted_join


def _skewed_frames(spark):
    # 50% of the fact rows share one key — the pathological case
    large = spark.range(20000).select(
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id") % 100).alias(
            "k"
        ),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
    )
    return large, small


def test_salted_inner_join_matches_plain(spark):
    large, small = _skewed_frames(spark)
    plain = large.join(small, "k").select("k", "payload", "dim_val")
    salted = salted_join(large, small, "k", n_salts=8).select(
        "k", "payload", "dim_val"
    )
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_left_join_matches_plain(spark):
    large, small = _skewed_frames(spark)
    # keys >= 100 never match -> exercises the null-extension branch
    large = large.withColumn(
        "k", F.when(F.col("payload") % 7 == 0, F.col("k") + 1000).otherwise(F.col("k"))
    )
    plain = large.join(small, "k", "left").select("k", "payload", "dim_val")
    salted = salted_join(large, small, "k", n_salts=8, how="left").select(
        "k", "payload", "dim_val"
    )
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
