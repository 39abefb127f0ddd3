"""Run a subset of registry queries against their DuckDB oracles.

Usage: python tools/check_queries.py [SF_DIR] name [name ...]
Same canonicalization as tools/driver_sim.py (STRICT=1 for bit floats).
"""
import hashlib
import math
import os
import sys

sys.path.insert(0, "/root/repo")
import duckdb

import __spark_entry__ as mod
from etl_addresses_spark.session import get_spark

args = sys.argv[1:]
SF = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
names = args

spark = get_spark("check-queries")
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )

STRICT = os.environ.get("STRICT", "0") == "1"


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        if not STRICT:
            v = round(v, 9)
            return int(v) if v.is_integer() else v
        return v
    return v


def value_hash(rows):
    h = hashlib.sha256()
    for r in sorted(repr(tuple(r)) for r in rows):
        h.update(r.encode())
    return h.hexdigest()[:16]


qs, os_ = mod.queries(), mod.oracle_sql()
ok = True
for name in names:
    fn = qs[name]
    sdf = fn(spark, SF)
    spark_rows = [tuple(norm(v) for v in row) for row in sdf.collect()]
    if name in os_:
        res = con.execute(os_[name])
        dcols_raw = [d[0] for d in res.description]
        drows = [tuple(norm(v) for v in row) for row in res.fetchall()]
        scols, dcols = sorted(sdf.columns), sorted(dcols_raw)
        sidx = [sdf.columns.index(c) for c in scols]
        didx = [dcols_raw.index(c) for c in dcols]
        sh = value_hash([tuple(r[i] for i in sidx) for r in spark_rows])
        dh = value_hash([tuple(r[i] for i in didx) for r in drows])
        status = (
            "MATCH"
            if (len(spark_rows) == len(drows) and scols == dcols and sh == dh)
            else "MISMATCH"
        )
        if status != "MATCH":
            ok = False
        print(
            f"{name}: spark={len(spark_rows)} duck={len(drows)} "
            f"cols_eq={scols == dcols} hash {sh} vs {dh} -> {status}"
        )
    else:
        print(f"{name}: rows-only check, rows={len(spark_rows)}")
print("RESULT:", "ALL MATCH" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
