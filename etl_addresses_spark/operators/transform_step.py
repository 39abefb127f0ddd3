"""Transform step: fan each inferred address out to typed records.

Parity with /root/reference/addresses.js `transform` (lines 164-234):
a matched address becomes FOUR records — one `object` (the new
st:Address with houseNumberId/streetId merged into its data payload,
addresses.js:171-185), two `relation` edges (`st:in` houseNumber->street
and `st:sameAs` address->houseNumber, :187-201), one `log` (:203-213) —
and an unmatched address becomes ONE error `log` (:215-224).

Spark-first shape: three declarative DataFrames instead of a
heterogeneous tagged stream; the host's sequential per-record writer
(S4, :229-233) becomes three filtered JSON writes whose task-level
atomicity replaces stop-on-error sequencing.  A `tagged` union is also
provided for strict single-stream parity.

Invariant (tested): rows(objects) + rows(relations) + rows(logs)
= 4 * matched + 1 * unmatched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_addresses_spark.operators.spatial_join import ERROR_MESSAGE

def _matched() -> "F.Column":
    return F.col("streetId").isNotNull()


def objects_df(inferred: DataFrame) -> DataFrame:
    """The new st:Address objects (addresses.js:171-185).

    `data` = addressData + houseNumberId + streetId (Object.assign at
    addresses.js:180-183) via withField — no struct rebuild."""
    return inferred.filter(_matched()).select(
        F.col("id"),
        F.col("name"),
        F.lit("st:Address").alias("type"),
        F.col("validSince"),
        F.col("validUntil"),
        F.col("addressData")
        .withField("houseNumberId", F.col("houseNumberId"))
        .withField("streetId", F.col("streetId"))
        .alias("data"),
        F.col("addressGeometry").alias("geometry"),
    )


def relations_df(inferred: DataFrame) -> DataFrame:
    """The two graph edges per match (addresses.js:187-201).

    `from`/`to` are aliased from_id/to_id (SQL keyword safety); the
    NDJSON sink renames them back to the host contract."""
    matched = inferred.filter(_matched())
    st_in = matched.select(
        F.col("houseNumberId").alias("from_id"),
        F.col("streetId").alias("to_id"),
        F.lit("st:in").alias("type"),
    )
    same_as = matched.select(
        F.col("id").alias("from_id"),
        F.col("houseNumberId").alias("to_id"),
        F.lit("st:sameAs").alias("type"),
    )
    return st_in.unionByName(same_as)


def logs_df(inferred: DataFrame) -> DataFrame:
    """Success and error log records (addresses.js:203-224)."""
    return inferred.select(
        F.when(~_matched(), F.lit(ERROR_MESSAGE)).alias("error"),
        F.col("houseNumberId"),
        F.col("streetId"),
        F.col("streetName"),
        F.col("addressData"),
        F.col("lineLength"),
        F.col("addressGeometry").alias("geometry"),
    )


def tagged_union(inferred: DataFrame) -> DataFrame:
    """Single-stream parity shape: type discriminator + JSON payload
    (the reference's heterogeneous record stream, addresses.js:229)."""
    objs = objects_df(inferred).select(
        F.lit("object").alias("rec_type"), F.to_json(F.struct("*")).alias("obj")
    )
    rels = relations_df(inferred).select(
        F.lit("relation").alias("rec_type"), F.to_json(F.struct("*")).alias("obj")
    )
    logs = logs_df(inferred).select(
        F.lit("log").alias("rec_type"), F.to_json(F.struct("*")).alias("obj")
    )
    return objs.unionByName(rels).unionByName(logs)


def write_outputs(inferred: DataFrame, out_dir: str) -> None:
    """S4 typed record writer: .objects/.relations/.log NDJSON outputs
    (one directory per record type; Spark JSON sink IS ndjson)."""
    inferred = inferred.cache()
    try:
        objects_df(inferred).write.mode("overwrite").json(
            os.path.join(out_dir, "objects")
        )
        relations_df(inferred).withColumnsRenamed(
            {"from_id": "from", "to_id": "to"}
        ).write.mode("overwrite").json(os.path.join(out_dir, "relations"))
        logs_df(inferred).write.mode("overwrite").json(os.path.join(out_dir, "logs"))
        write_dataset_metadata(out_dir)
    finally:
        inferred.unpersist()


DATASET_METADATA = {
    # S5 parity: the dataset descriptor the host tool consumes
    # (/root/reference/addresses.dataset.json:1-80) — id/title/license,
    # the JSON Schema of the data payload, and the flattenPaths
    # projection hints (the select(col("data.*")) equivalents).
    "id": "addresses",
    "title": "Addresses",
    "license": "CC0",
    "flattenPaths": [
        "$.data.sheetId",
        "$.data.layerId",
        "$.data.mapId",
        "$.data.number",
        "$.data.borough",
        "$.data.houseNumberId",
        "$.data.streetId",
    ],
    "schema": {
        "type": "object",
        "additionalProperties": False,
        "required": [
            "sheetId",
            "layerId",
            "mapId",
            "number",
            "borough",
            "houseNumberId",
            "streetId",
        ],
        "properties": {
            "sheetId": {"type": "integer"},
            "layerId": {"type": "integer"},
            "mapId": {"type": "integer"},
            "number": {"type": "string"},
            "borough": {"type": "string"},
            "houseNumberId": {"type": "string"},
            "streetId": {"type": "string"},
        },
    },
}


def write_dataset_metadata(out_dir: str) -> str:
    """Emit the dataset descriptor alongside the typed outputs (S5)."""
    import json

    path = os.path.join(out_dir, "addresses.dataset.json")
    os.makedirs(out_dir, exist_ok=True)
    with open(path, "w") as fh:
        json.dump(DATASET_METADATA, fh, indent=2)
    return path


# --- schema validation (Q1) ----------------------------------------------

# Required data-payload fields per addresses.dataset.json:36-79
# (draft-04 JSON Schema, additionalProperties: false).  Struct typing
# already enforces "no additional properties"; this checks the
# `required` clause at row level.
REQUIRED_DATA_FIELDS = [
    "sheetId",
    "layerId",
    "mapId",
    "number",
    "borough",
    "houseNumberId",
    "streetId",
]


def validate_objects(objects: DataFrame) -> DataFrame:
    """Rows violating the dataset schema contract, with a reason column.

    Empty result == valid output (the host tool's validation step)."""
    checks = [
        F.when(F.col(f"data.{f}").isNull(), F.lit(f"missing required data.{f}"))
        for f in REQUIRED_DATA_FIELDS
    ]
    checks.append(
        F.when(F.col("type") != "st:Address", F.lit("type must be st:Address"))
    )
    reasons = F.array_compact(F.array(*checks))
    return (
        objects.withColumn("violations", reasons)
        .filter(F.size("violations") > 0)
        .select("id", "violations")
    )
