from __future__ import annotations

import json
import os

from conftest import SF_ORACLE, assert_frames_match

from etl_addresses_spark.operators.spatial_join import infer_addresses
from etl_addresses_spark.operators.transform_step import (
    logs_df,
    objects_df,
    relations_df,
    tagged_union,
    validate_objects,
    write_outputs,
)
from etl_addresses_spark.plans import transform
from etl_addresses_spark.sources.fixtures import house_numbers_df, streets_df


def _inferred(spark):
    return infer_addresses(
        house_numbers_df(spark, SF_ORACLE), streets_df(spark, SF_ORACLE)
    ).cache()


def test_record_count_invariant(spark):
    inferred = _inferred(spark)
    matched = inferred.filter("streetId IS NOT NULL").count()
    unmatched = inferred.filter("error IS NOT NULL").count()
    n_obj = objects_df(inferred).count()
    n_rel = relations_df(inferred).count()
    n_log = logs_df(inferred).count()
    # addresses.js:171-224 — 4 records per match, 1 per miss
    assert n_obj == matched
    assert n_rel == 2 * matched
    assert n_log == matched + unmatched
    assert n_obj + n_rel + n_log == 4 * matched + 1 * unmatched
    assert tagged_union(inferred).count() == 4 * matched + unmatched


def test_objects_validate_against_dataset_schema(spark):
    inferred = _inferred(spark)
    violations = validate_objects(objects_df(inferred))
    assert violations.count() == 0


def test_oracles_match(spark, ddb):
    assert_frames_match(
        transform.transform_objects(spark, SF_ORACLE),
        ddb.sql(transform.OBJECTS_ORACLE),
    )
    assert_frames_match(
        transform.transform_relations(spark, SF_ORACLE),
        ddb.sql(transform.RELATIONS_ORACLE),
    )
    assert_frames_match(
        transform.transform_logs(spark, SF_ORACLE),
        ddb.sql(transform.LOGS_ORACLE),
    )


def test_write_outputs_ndjson(spark, tmp_path):
    inferred = _inferred(spark)
    out = str(tmp_path / "out")
    write_outputs(inferred, out)
    for sub in ["objects", "relations", "logs"]:
        files = [
            f
            for f in os.listdir(os.path.join(out, sub))
            if f.endswith(".json")
        ]
        assert files, f"no ndjson part files for {sub}"
    # relations keep the host contract field names `from`/`to`
    rel_file = next(
        f
        for f in os.listdir(os.path.join(out, "relations"))
        if f.endswith(".json")
    )
    with open(os.path.join(out, "relations", rel_file)) as fh:
        first = json.loads(fh.readline())
    assert set(first) == {"from", "to", "type"}


def test_relation_degrees_oracle(spark, ddb):
    assert_frames_match(
        transform.relation_degrees(spark, SF_ORACLE),
        ddb.sql(transform.DEGREES_ORACLE),
    )


def test_dataset_metadata_emitted(spark, tmp_path):
    import json as _json

    from etl_addresses_spark.operators.transform_step import (
        REQUIRED_DATA_FIELDS,
        write_outputs,
    )

    inferred = _inferred(spark)
    out = str(tmp_path / "meta_out")
    write_outputs(inferred, out)
    with open(os.path.join(out, "addresses.dataset.json")) as fh:
        meta = _json.load(fh)
    assert meta["schema"]["required"] == REQUIRED_DATA_FIELDS
    assert meta["schema"]["additionalProperties"] is False
    assert len(meta["flattenPaths"]) == 7
