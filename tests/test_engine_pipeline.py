"""End-to-end two-step pipeline over real NDJSON files on disk —
S1 scan (incl. blank-line tolerance), infer, inferred.ndjson handoff,
transform, typed sinks (the full reference CLI lifecycle)."""

from __future__ import annotations

import json
import os

import pytest

from etl_addresses_spark import engine
from etl_addresses_spark.sources import ndjson


def _write_ndjson_file(path, rows, blank_lines=False):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        for i, row in enumerate(rows):
            fh.write(json.dumps(row) + "\n")
            if blank_lines and i == 0:
                fh.write("\n")  # blank line the scan must tolerate


@pytest.fixture(scope="module")
def pipeline_dirs(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("spacetime"))
    streets = [
        {
            "id": "main",
            "type": "st:Street",
            "name": "Main St",
            "validSince": "1850",
            "validUntil": "1860",
            "geometry": {
                "type": "LineString",
                "coordinates": [[0.0, 0.0], [0.01, 0.0]],
            },
        }
    ]
    hns = [
        {
            "id": "hn1",
            "type": "st:Address",
            "validSince": "1855",
            "validUntil": "1855",
            "data": {
                "sheetId": 1,
                "layerId": 2,
                "mapId": 3,
                "number": "7",
                "borough": "B",
            },
            "geometry": {"type": "Point", "coordinates": [0.005, 0.0001]},
        },
        {
            "id": "hn_lost",
            "type": "st:Address",
            "validSince": "1855",
            "validUntil": "1855",
            "data": {
                "sheetId": 9,
                "layerId": 9,
                "mapId": 9,
                "number": "9",
                "borough": "B",
            },
            "geometry": {"type": "Point", "coordinates": [0.5, 0.5]},
        },
    ]
    _write_ndjson_file(
        ndjson.objects_path(base, "nyc-streets", "transform"), streets
    )
    _write_ndjson_file(
        ndjson.objects_path(base, "building-inspector", "transform"),
        hns,
        blank_lines=True,
    )
    out = str(tmp_path_factory.mktemp("out"))
    engine.run_pipeline(spark, base, out)
    return out


def _read_dir(path):
    rows = []
    for f in os.listdir(path):
        if f.endswith(".json"):
            with open(os.path.join(path, f)) as fh:
                rows += [json.loads(line) for line in fh if line.strip()]
    return rows


def test_pipeline_outputs(pipeline_dirs):
    objects = _read_dir(os.path.join(pipeline_dirs, "step1_transform", "objects"))
    relations = _read_dir(
        os.path.join(pipeline_dirs, "step1_transform", "relations")
    )
    logs = _read_dir(os.path.join(pipeline_dirs, "step1_transform", "logs"))
    assert len(objects) == 1  # one matched
    assert len(relations) == 2
    assert len(logs) == 2  # one success + one error
    obj = objects[0]
    assert obj["name"] == "7 Main St"
    assert obj["data"]["houseNumberId"] == "building-inspector/hn1"
    assert obj["data"]["streetId"] == "nyc-streets/main"
    rel_types = sorted(r["type"] for r in relations)
    assert rel_types == ["st:in", "st:sameAs"]
    assert {"from", "to", "type"} <= set(relations[0])
    errors = [l for l in logs if "error" in l and l.get("error")]
    assert len(errors) == 1
    assert errors[0]["houseNumberId"] == "building-inspector/hn_lost"


def test_empty_street_input_raises(spark, tmp_path):
    base = str(tmp_path / "base")
    _write_ndjson_file(ndjson.objects_path(base, "nyc-streets", "transform"), [])
    _write_ndjson_file(
        ndjson.objects_path(base, "building-inspector", "transform"), []
    )
    with pytest.raises(RuntimeError, match="No streets with geometries"):
        engine.infer(
            spark, {"base": base, "current": str(tmp_path / "o"), "previous": None}
        )
