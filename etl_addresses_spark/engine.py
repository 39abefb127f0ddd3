"""Step registry: the engine's equivalent of the reference's
`module.exports.steps = [infer, transform]` contract
(/root/reference/addresses.js:238-241).

Each step has the uniform signature (spark, dirs) -> None where `dirs`
mirrors the host tool's directory contract:

    dirs["base"]     — root containing <dataset>/<step>/... inputs
    dirs["current"]  — this step's output dir
    dirs["previous"] — the previous step's output dir

Steps communicate ONLY through the filesystem (restartable, re-runnable
— the reference's dirs.previous/dirs.current handoff), so each can run
in its own Spark job/cluster at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from etl_addresses_spark.config import DATASET_HOUSE_NUMBERS, DATASET_STREETS
from etl_addresses_spark.operators.spatial_join import infer_addresses
from etl_addresses_spark.operators.transform_step import write_outputs
from etl_addresses_spark.sources.ndjson import (
    HOUSE_NUMBERS_SCHEMA,
    INFERRED_SCHEMA,
    STREETS_SCHEMA,
    load_objects,
    write_ndjson,
)

INFERRED_DIRNAME = "inferred"


def infer(spark: SparkSession, dirs: dict) -> None:
    """Step 1 (addresses.js:124-161): spatio-temporal join; writes the
    `inferred` NDJSON handoff into dirs['current']."""
    streets = load_objects(
        spark, dirs["base"], DATASET_STREETS, "transform", STREETS_SCHEMA
    )
    house_numbers = load_objects(
        spark, dirs["base"], DATASET_HOUSE_NUMBERS, "transform", HOUSE_NUMBERS_SCHEMA
    )
    # Empty-input assertion parity (addresses.js:139-141): the reference
    # asserts on the EXPLODED segment list, so degenerate geometries
    # (single-vertex / null coordinate arrays) must also trip it.
    from etl_addresses_spark.functions.geo import explode_segments

    if not explode_segments(streets.filter(streets.geometry.isNotNull())).head(1):
        raise RuntimeError("No streets with geometries found - this is very wrong!")
    inferred = infer_addresses(house_numbers, streets)
    write_ndjson(inferred, os.path.join(dirs["current"], INFERRED_DIRNAME))


def transform(spark: SparkSession, dirs: dict) -> None:
    """Step 2 (addresses.js:164-234): fan the inferred records out into
    objects/relations/logs sinks."""
    inferred = spark.read.schema(INFERRED_SCHEMA).json(
        os.path.join(dirs["previous"], INFERRED_DIRNAME)
    )
    write_outputs(inferred, dirs["current"])


steps = [infer, transform]


def run_pipeline(spark: SparkSession, base_dir: str, out_dir: str) -> None:
    """Run all steps in order with filesystem handoff between them."""
    prev = None
    for i, step in enumerate(steps):
        current = os.path.join(out_dir, f"step{i}_{step.__name__}")
        os.makedirs(current, exist_ok=True)
        step(spark, {"base": base_dir, "current": current, "previous": prev})
        prev = current
