from __future__ import annotations

from conftest import SF_ORACLE

from pyspark.sql import functions as F

from etl_addresses_spark.sources.tables import load_table
from etl_addresses_spark.streaming import event_stream


def test_windowed_counts_stream_equals_batch(spark):
    stream = event_stream.read_events_stream(spark, SF_ORACLE)
    out = event_stream.run_to_memory(
        event_stream.windowed_counts(stream), "win_counts"
    )
    batch = (
        load_table(spark, SF_ORACLE, "events")
        .groupBy(
            F.window("ts", "5 minutes").start.alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
    )
    s = {tuple(r) for r in out.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b


def test_session_windows_counts(spark):
    stream = event_stream.read_events_stream(spark, SF_ORACLE)
    out = event_stream.run_to_memory(
        event_stream.session_windows(stream), "sess_win"
    )
    rows = out.collect()
    assert rows
    # every event lands in exactly one session
    total = sum(r.n_events for r in rows)
    assert total == load_table(spark, SF_ORACLE, "events").count()


def test_stateful_user_totals(spark):
    stream = event_stream.read_events_stream(spark, SF_ORACLE)
    out = event_stream.run_to_memory(
        event_stream.stateful_user_totals(stream), "stateful_totals", mode="update"
    )
    # last update per user == full batch aggregate
    got = {r.user_id: r.n_events for r in out.collect()}
    batch = {
        r.user_id: r.n
        for r in load_table(spark, SF_ORACLE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == batch


def test_stream_stream_join_matches_batch(spark):
    stream = event_stream.read_events_stream(spark, SF_ORACLE)
    out = event_stream.run_to_memory(
        event_stream.purchases_with_recent_views(stream), "ss_join", mode="append"
    )
    e = load_table(spark, SF_ORACLE, "events")
    views = e.filter("event_type = 'view'").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_event_id"),
    )
    purchases = e.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_event_id"),
    )
    batch = purchases.join(
        views,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
    )
    assert out.count() == batch.count()
    assert out.count() > 0


def test_dedup_stream_first_arrival_per_key(spark):
    stream = event_stream.read_events_stream(spark, SF_ORACLE)
    out = event_stream.run_to_memory(
        event_stream.dedup_stream(stream), "dedup_stream", mode="append"
    )
    # one surviving row per (user_id, event_type) pair, matching batch distinct
    got = {(r.user_id, r.event_type) for r in out.collect()}
    batch = {
        (r.user_id, r.event_type)
        for r in load_table(spark, SF_ORACLE, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert got == batch
    assert out.count() == len(batch), "exactly one row per key must survive"


def test_stateful_totals_on_rocksdb_state_store(spark):
    # Same stateful query, RocksDB state store provider: results must be
    # identical to the default HDFS-backed provider.
    old = {
        k: spark.conf.get(k, None) for k in event_stream.ROCKSDB_STATE_CONF
    }
    for k, v in event_stream.ROCKSDB_STATE_CONF.items():
        spark.conf.set(k, v)
    try:
        stream = event_stream.read_events_stream(spark, SF_ORACLE)
        out = event_stream.run_to_memory(
            event_stream.stateful_user_totals(stream),
            "stateful_totals_rocksdb",
            mode="update",
        )
        got = {r.user_id: r.n_events for r in out.collect()}
        batch = {
            r.user_id: r.n
            for r in load_table(spark, SF_ORACLE, "events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == batch
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_checkpoint_restart_no_duplicates(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    stream = event_stream.read_events_stream(spark, SF_ORACLE)
    counts = event_stream.windowed_counts(stream)
    first = event_stream.run_with_checkpoint(counts, out, ckpt).count()
    # restart against the same checkpoint: no new input -> no new rows
    stream2 = event_stream.read_events_stream(spark, SF_ORACLE)
    counts2 = event_stream.windowed_counts(stream2)
    second = event_stream.run_with_checkpoint(counts2, out, ckpt).count()
    assert first > 0
    assert second == first, "restart must not duplicate checkpointed output"
