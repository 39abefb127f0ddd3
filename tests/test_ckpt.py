"""Checkpoint-block lifecycle (etl_addresses_spark/ckpt.py).

The contract under test: `localCheckpoint(eager=True)` blocks are NOT
released by `spark.catalog.clearCache()` (the r5 bench repeat-growth
mechanism), the ckpt helpers DO release them, and the CheckpointChain
slot discipline never frees blocks a later iterate still needs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_addresses_spark.ckpt import (
    CheckpointChain,
    checkpoint_rdd,
    free_all_persistent_rdds,
    unpersist_checkpoint,
)


def _persistent_ids(spark) -> set[int]:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keys())


def test_clearcache_does_not_release_checkpoints(spark):
    before = _persistent_ids(spark)
    df = spark.range(1000).localCheckpoint(eager=True)
    mine = _persistent_ids(spark) - before
    assert mine, "eager localCheckpoint must register persistent blocks"
    spark.catalog.clearCache()
    assert mine <= _persistent_ids(spark), (
        "clearCache must NOT free checkpoint blocks (if it ever starts "
        "to, the ckpt.py hygiene layer is redundant)"
    )
    assert unpersist_checkpoint(df)
    assert not (mine & _persistent_ids(spark))


def test_checkpoint_rdd_none_for_plain_frames(spark):
    assert checkpoint_rdd(spark.range(10)) is None
    assert not unpersist_checkpoint(spark.range(10))


def test_chain_frees_superseded_keeps_final(spark):
    before = _persistent_ids(spark)
    chain = CheckpointChain()
    state = chain.step(spark.range(100).withColumn("v", F.lit(0)), "state")
    for k in range(1, 4):
        state = chain.step(state.withColumn("v", F.col("v") + k), "state")
    live = _persistent_ids(spark) - before
    assert len(live) == 1, f"only the final iterate should stay: {live}"
    # the survivor is evaluable and correct (0+1+2+3)
    assert state.agg(F.min("v"), F.max("v")).first() == (6, 6)
    chain.release("state")
    assert not (_persistent_ids(spark) - before)


def test_chain_two_slots_are_independent(spark):
    before = _persistent_ids(spark)
    chain = CheckpointChain()
    aux = chain.step(spark.range(50).withColumnRenamed("id", "k"), "aux")
    state = chain.step(spark.range(50).withColumn("d", F.lit(0)), "state")
    for k in range(1, 3):
        # each round reads BOTH the aux table and the prior state —
        # stepping "state" must never free "aux"
        state = chain.step(
            state.join(aux, state.id == aux.k).select(
                "id", (F.col("d") + 1).alias("d")
            ),
            "state",
        )
    assert state.count() == 50
    assert state.agg(F.max("d")).first()[0] == 2
    live = _persistent_ids(spark) - before
    assert len(live) == 2  # final state + aux
    chain.release("aux")
    chain.release("state")
    assert not (_persistent_ids(spark) - before)


def test_free_all_persistent_rdds(spark):
    keep = [
        spark.range(10).localCheckpoint(eager=True),
        spark.range(10).localCheckpoint(eager=True),
    ]
    assert free_all_persistent_rdds(spark) >= 2
    del keep
    assert not _persistent_ids(spark)
    spark.catalog.clearCache()
