"""Optional-connector gates (Delta / Iceberg / Kafka).

The table formats and the Kafka source each need jars that are not in
this environment; every accessor probes availability at call time and
raises a single well-formed error instead of an opaque classpath
failure mid-job.  The query shapes elsewhere in the engine are
format-agnostic — swapping `parquet` for `delta`/`iceberg` or the file
source for Kafka changes only these constructors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ConnectorUnavailable(RuntimeError):
    pass


def _probe_format(spark: SparkSession, fmt: str, sample_path: str) -> bool:
    try:
        spark.read.format(fmt).load(sample_path)
        return True
    except Exception as exc:  # noqa: BLE001 — classify below
        msg = str(exc)
        if "ClassNotFoundException" in msg or "Failed to find" in msg or (
            "DATA_SOURCE_NOT_FOUND" in msg
        ):
            return False
        return True  # format resolved; the path itself was the problem


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Format-dispatching reader.  parquet/orc/json/csv are built in;
    delta/iceberg require their runtime jars."""
    if fmt in ("delta", "iceberg") and not _probe_format(spark, fmt, path):
        raise ConnectorUnavailable(
            f"{fmt} runtime jars are not on the classpath; add the "
            f"{fmt} package to spark.jars.packages to read {path!r}"
        )
    return spark.read.format(fmt).load(path)


def read_kafka_stream(
    spark: SparkSession, bootstrap: str, topic: str
) -> DataFrame:
    """Kafka source constructor (gated; spark-sql-kafka jars absent in
    this environment)."""
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("subscribe", topic)
            .load()
        )
    except Exception as exc:  # noqa: BLE001
        raise ConnectorUnavailable(
            "kafka source requires the spark-sql-kafka package on the "
            "classpath"
        ) from exc
