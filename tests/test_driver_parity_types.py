"""Round-4 root-cause guards for the round-3 driver hash mismatches.

`anomaly_zscore_events` and `vocab_oov_rate` were driver-red in round 3
with rows+schema matching, yet matched exactly under local fetchall
re-runs.  Root cause (proven by tools/type_audit.py): their DuckDB
oracles emitted HUGEINT columns (DuckDB sum(BIGINT) -> int128).
`fetchall()` converts HUGEINT to Python int (hiding the bug locally),
but a pandas fetch converts it to float64 and Arrow to decimal128 —
so any driver that hashes a non-fetchall path reprs `3.0` /
`Decimal('3')` against Spark's `3`.  `pipeline_curate_stats` had the
same latent defect without a driver row yet.

Guards:
  1. a registry-wide oracle output-type audit — no oracle may bind to
     HUGEINT/DECIMAL/any type outside the driver-safe set;
  2. pinned driver-style value hashes at sf0.01 for the three fixed
     queries, computed exactly the way tools/driver_sim.py hashes
     (sorted-column tuples, repr, sha256), checked for BOTH the
     fetchall and the pandas fetch path.
"""
from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from etl_addresses_spark.registry import REGISTRY
from etl_addresses_spark.sources.tables import TABLES

SF001 = "/root/testdata/sf0.01"

DUCK_SAFE = {
    "BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "DOUBLE", "FLOAT", "VARCHAR", "DATE", "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE", "TIMESTAMP_NS", "TIMESTAMP_MS",
}

# (query, sha256-prefix of the driver-style value hash at sf0.01)
PINNED = {
    "vocab_oov_rate": "4ee124fe85bd70fc",
    "anomaly_zscore_events": "d535dc8ca99bb0d5",
    "pipeline_curate_stats": "f907989881580d2a",
}


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        v = round(v, 9)
        return int(v) if v.is_integer() else v
    return v


def _value_hash(rows):
    h = hashlib.sha256()
    for r in sorted(repr(tuple(r)) for r in rows):
        h.update(r.encode())
    return h.hexdigest()[:16]


def _sorted_cols_hash(cols, rows):
    order = [list(cols).index(c) for c in sorted(cols)]
    return _value_hash(
        [tuple(_norm(r[i]) for i in order) for r in rows]
    )


@pytest.fixture(scope="module")
def ddb01():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF001}/{name}.parquet')"
        )
    yield con
    con.close()


def test_no_oracle_emits_driver_hostile_types(ddb01):
    """Binding-only (.types) sweep of every registered oracle: any
    HUGEINT/DECIMAL/other exotic output column is a latent driver
    hash mismatch regardless of value equality."""
    offenders = {}
    for name, entry in REGISTRY.items():
        if entry.oracle is None:
            continue
        rel = ddb01.sql(entry.oracle)
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t) not in DUCK_SAFE
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"driver-hostile oracle output types: {offenders}"


@pytest.mark.parametrize("name", sorted(PINNED))
def test_driver_style_hash_pin(spark, ddb01, name):
    entry = REGISTRY[name]
    sdf = entry.query(spark, SF001)
    sh = _sorted_cols_hash(sdf.columns, sdf.collect())
    assert sh == PINNED[name], f"Spark-side hash drifted for {name}"

    cur = ddb01.execute(entry.oracle)
    cols = [d[0] for d in cur.description]
    dh = _sorted_cols_hash(cols, cur.fetchall())
    assert dh == PINNED[name], f"DuckDB fetchall hash drifted for {name}"

    # The fetch path that broke the round-3 driver rows: pandas
    # converts HUGEINT to float64.  With BIGINT-pure oracles this
    # path must now agree too.
    pdf = ddb01.execute(entry.oracle).df()
    ph = _sorted_cols_hash(
        list(pdf.columns), list(pdf.itertuples(index=False, name=None))
    )
    assert ph == PINNED[name], f"DuckDB pandas-path hash drifted for {name}"
