from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_addresses_spark.session import get_spark  # noqa: E402
from etl_addresses_spark.sources.tables import TABLES  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    s = get_spark("etl_addresses_spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/{name}.parquet')"
        )
    yield con
    con.close()


def assert_frames_match(spark_df, duck_rel, sort_cols=None):
    """Order-insensitive comparison mirroring the driver's check:
    same row count, same column names, same values."""
    import math

    sdf = spark_df.toPandas()
    ddf = duck_rel.df()
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"columns differ: {sorted(sdf.columns)} vs {sorted(ddf.columns)}"
    )
    cols = sorted(sdf.columns)
    sdf = sdf[cols]
    ddf = ddf[cols]
    assert len(sdf) == len(ddf), f"row counts differ: {len(sdf)} vs {len(ddf)}"

    import numpy as np
    import pandas as pd

    def norm(v):
        if v is None:
            return None
        try:
            if pd.isna(v):
                return None
        except (TypeError, ValueError):
            pass
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, (float, np.floating)):
            f = round(float(v), 9)
            if math.isnan(f):
                return None
            return int(f) if f.is_integer() else f
        return v

    srows = sorted(
        [tuple(norm(v) for v in row) for row in sdf.itertuples(index=False)],
        key=repr,
    )
    drows = sorted(
        [tuple(norm(v) for v in row) for row in ddf.itertuples(index=False)],
        key=repr,
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b
    ]
    assert not mismatches, f"first mismatching rows: {mismatches[:5]}"
