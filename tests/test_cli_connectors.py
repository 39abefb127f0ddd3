from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
from conftest import SF_SMALL

from etl_addresses_spark.sources.connectors import (
    ConnectorUnavailable,
    read_kafka_stream,
    read_table,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_run_pipeline(tmp_path):
    base = tmp_path / "base"
    for ds, rows in {
        "nyc-streets": [
            {
                "id": "s",
                "type": "st:Street",
                "name": "S",
                "validSince": "1850",
                "validUntil": "1860",
                "geometry": {
                    "type": "LineString",
                    "coordinates": [[0.0, 0.0], [0.01, 0.0]],
                },
            }
        ],
        "building-inspector": [
            {
                "id": "h",
                "type": "st:Address",
                "validSince": "1855",
                "validUntil": "1855",
                "data": {
                    "sheetId": 1,
                    "layerId": 1,
                    "mapId": 1,
                    "number": "5",
                    "borough": "B",
                },
                "geometry": {"type": "Point", "coordinates": [0.005, 0.0]},
            }
        ],
    }.items():
        d = base / ds / "transform"
        d.mkdir(parents=True)
        with open(d / f"{ds}.objects.ndjson", "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
    out = tmp_path / "out"
    res = subprocess.run(
        [sys.executable, "-m", "etl_addresses_spark", "run", "--base", str(base), "--out", str(out)],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4", "SPARK_GRAFT_DRIVER_MEM": "4g"},
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert (out / "step1_transform" / "objects").exists()


def test_read_table_parquet(spark):
    df = read_table(spark, f"{SF_SMALL}/region.parquet", "parquet")
    assert df.count() == 5


def test_delta_gated(spark, tmp_path):
    with pytest.raises(ConnectorUnavailable, match="delta"):
        read_table(spark, str(tmp_path / "t"), "delta")


def test_kafka_gated(spark):
    with pytest.raises(ConnectorUnavailable, match="kafka"):
        read_kafka_stream(spark, "localhost:9092", "t")
