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
