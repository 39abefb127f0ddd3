"""Shuffle-weighted triage of never-laddered registry rows (r12
verdict item 4).

The coverage ledger can say WHICH rows have no scale-ladder evidence
but not which of them carry enough shuffle to be worth laddering —
and the r10 tail-ladder found real superlinear defects hiding in
exactly such rows.  This tool runs every never-laddered row ONCE at
sf0.1, captures its per-query Spark REST deltas (shuffle read/write,
input bytes, wall), and emits a ranking by total shuffle bytes.
Shuffle BYTES are deterministic plan properties (unlike wall time),
so the ranking is host-noise-free; wall is recorded for context only.

Usage:
    python tools/shuffle_triage.py               # all never-laddered rows
    ONLY=a,b,c python tools/shuffle_triage.py    # subset
Writes tools/evidence/r13_shuffle_triage.json (override with OUT).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

os.environ["SPARK_GRAFT_UI"] = "1"

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from coverage_ledger import load_ladder_evidence  # noqa: E402

from etl_addresses_spark.ckpt import free_all_persistent_rdds  # noqa: E402
from etl_addresses_spark.registry import REGISTRY  # noqa: E402
from etl_addresses_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _rest_totals(app_url: str) -> dict[str, int]:
    with urllib.request.urlopen(f"{app_url}/stages", timeout=10) as r:
        stages = json.load(r)
    tot = {"shuffle_read": 0, "shuffle_write": 0, "input_bytes": 0}
    for s in stages:
        tot["shuffle_read"] += s.get("shuffleReadBytes", 0)
        tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        tot["input_bytes"] += s.get("inputBytes", 0)
    return tot


def main() -> None:
    ladder = load_ladder_evidence()
    if os.environ.get("ONLY"):
        names = [n.strip() for n in os.environ["ONLY"].split(",")]
    else:
        names = [n for n in REGISTRY if n not in ladder]
    spark = get_spark("shuffle-triage")
    spark.sparkContext.setLogLevel("ERROR")
    app_url = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}"
    )
    import gc

    rows: dict[str, dict] = {}
    for name in names:
        spark.catalog.clearCache()
        free_all_persistent_rdds(spark)
        gc.collect()
        before = _rest_totals(app_url)
        t0 = time.perf_counter()
        try:
            REGISTRY[name].query(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            err = None
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            err = f"{type(exc).__name__}: {exc}"[:200]
        wall = round(time.perf_counter() - t0, 2)
        after = _rest_totals(app_url)
        delta = {k: after[k] - before[k] for k in after}
        rows[name] = {"sec": wall, **delta, "err": err}
        print(
            f"{name}: {wall}s shuffle_w={delta['shuffle_write']}"
            f" shuffle_r={delta['shuffle_read']}",
            file=sys.stderr,
        )
    ranked = sorted(
        rows.items(),
        key=lambda kv: kv[1]["shuffle_read"] + kv[1]["shuffle_write"],
        reverse=True,
    )
    out = {
        "sf_dir": SF_DIR,
        "n_triaged": len(rows),
        "ranking": [
            {
                "name": n,
                **r,
                "shuffle_total": r["shuffle_read"] + r["shuffle_write"],
            }
            for n, r in ranked
        ],
    }
    path = os.environ.get(
        "OUT", "/root/repo/tools/evidence/r13_shuffle_triage.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"top10": [n for n, _ in ranked[:10]]}))


if __name__ == "__main__":
    main()
