"""Unit tests for the shared events.ts normalizer — the single
definition both the batch loader and the streaming reader use
(round-2 regression: the two paths diverged on the parquet
timestamp unit).  Each physical-type branch is constructed
explicitly so none of them is dead code."""
from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_addresses_spark.sources.tables import (
    ensure_session_confs,
    normalize_events_ts,
)

_DT = datetime.datetime(2024, 1, 2, 3, 4, 5)


def test_normalize_passthrough_timestamp(spark):
    ensure_session_confs(spark)
    schema = T.StructType([T.StructField("ts", T.TimestampType())])
    df = spark.createDataFrame([(_DT,)], schema)
    out = normalize_events_ts(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert out.collect()[0].ts == _DT


def test_normalize_ntz_branch_value_preserving(spark):
    # explicit NTZ schema (the conf disables INFERENCE, not the type)
    ensure_session_confs(spark)
    schema = T.StructType([T.StructField("ts", T.TimestampNTZType())])
    df = spark.createDataFrame([(_DT,)], schema)
    out = normalize_events_ts(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    # UTC session: the naive->instant cast preserves the wall-clock value
    assert out.collect()[0].ts == _DT


def test_normalize_raw_nanos_branch(spark):
    ensure_session_confs(spark)
    nanos = int(_DT.replace(tzinfo=datetime.timezone.utc).timestamp()) * 10**9 + 123_456_789
    df = spark.createDataFrame([(nanos,)], "ts long")
    out = normalize_events_ts(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    got = out.select(F.unix_micros("ts").alias("us")).collect()[0].us
    assert got == nanos // 1000  # truncated, not rounded


def test_batch_and_stream_agree_on_ts(spark):
    # end-to-end: the two readers must yield identical micros for the
    # same driver parquet, whatever its physical type
    from etl_addresses_spark.sources.tables import load_table
    from etl_addresses_spark.streaming.event_stream import (
        read_events_stream,
        run_to_memory,
    )

    sf = "/root/testdata/sf0.001"
    batch = {
        r.event_id: r.us
        for r in load_table(spark, sf, "events")
        .select("event_id", F.unix_micros("ts").alias("us"))
        .collect()
    }
    streamed = run_to_memory(
        read_events_stream(spark, sf).select(
            "event_id", F.unix_micros("ts").alias("us")
        ),
        "q_ts_agree",
        mode="append",
    )
    got = {r.event_id: r.us for r in streamed.collect()}
    assert got == batch
