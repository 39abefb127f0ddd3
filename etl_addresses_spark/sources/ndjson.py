"""NDJSON Space/Time object streams (S1/S2/S3 in SURVEY.md §2.1).

The reference reads `<dir>/<dataset>/<step>/<dataset>.objects.ndjson`
(objectsStream, /root/reference/addresses.js:36-42) with line-split +
blank-line tolerance + JSON.parse.  Spark's JSON datasource IS
newline-delimited JSON and skips whitespace-only lines, so the scan is
a schema'd `spark.read.json`; FAILFAST surfaces corrupt records the
way a JSON.parse throw would abort the reference's stream.

Schemas are declared per dataset shape (never inferred — inference
would scan 100 TB twice and can mistype sparse fields).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_DATA_SCHEMA = T.StructType(
    [
        T.StructField("sheetId", T.IntegerType()),
        T.StructField("layerId", T.IntegerType()),
        T.StructField("mapId", T.IntegerType()),
        T.StructField("number", T.StringType()),
        T.StructField("borough", T.StringType()),
    ]
)


def _object_schema(geometry_type: T.DataType, with_data: bool) -> T.StructType:
    fields = [
        T.StructField("id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("validSince", T.StringType()),
        T.StructField("validUntil", T.StringType()),
        T.StructField(
            "geometry",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    T.StructField("coordinates", geometry_type),
                ]
            ),
        ),
    ]
    if with_data:
        fields.insert(5, T.StructField("data", _DATA_SCHEMA))
    return T.StructType(fields)


# LineString coordinates: array of [lon, lat] pairs; Point: [lon, lat].
STREETS_SCHEMA = _object_schema(
    T.ArrayType(T.ArrayType(T.DoubleType())), with_data=False
)
HOUSE_NUMBERS_SCHEMA = _object_schema(T.ArrayType(T.DoubleType()), with_data=True)


# Schema of the inferred.ndjson step handoff (FIXTURES.md §A3).
# Declared explicitly because the JSON sink drops null-valued keys: an
# all-matched (or all-unmatched) file would otherwise lose columns under
# inference and break the transform step's projections.
INFERRED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("houseNumberId", T.StringType()),
        T.StructField("streetId", T.StringType()),
        T.StructField("validSince", T.StringType()),
        T.StructField("validUntil", T.StringType()),
        T.StructField("streetName", T.StringType()),
        T.StructField(
            "addressData",
            T.StructType(
                _DATA_SCHEMA.fields
            ),
        ),
        T.StructField("lineLength", T.IntegerType()),
        T.StructField(
            "addressGeometry",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    T.StructField("coordinates", T.ArrayType(T.DoubleType())),
                ]
            ),
        ),
        T.StructField("error", T.StringType()),
    ]
)


def objects_path(base_dir: str, dataset: str, step: str) -> str:
    """getDir parity: <base>/<dataset>/<step>/<dataset>.objects.ndjson."""
    return os.path.join(base_dir, dataset, step, f"{dataset}.objects.ndjson")


def load_objects(
    spark: SparkSession,
    base_dir: str,
    dataset: str,
    step: str,
    schema: T.StructType,
    strict: bool = True,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
        .json(objects_path(base_dir, dataset, step))
    )


def write_ndjson(df: DataFrame, path: str) -> None:
    """S2: newline-delimited JSON sink (restartable step boundary)."""
    df.write.mode("overwrite").json(path)
