"""Escalation-residue census for the grid-kNN strict-parity plan
(r7 verdict item 4): the grid tier's worst case is every point
escalating to the ranked broadcast cross join, so the thing to
MEASURE at 10x is the residue fraction — if it grows with scale the
O(points x segments) fallback term eventually dominates; if it stays
a small constant fraction the plan survives.

The candidate set comes from the SAME code path the production plan
runs (`spatial_join._grid_knn_local`), so the census can never drift
from the plan it claims to measure.

Usage: python tools/knn_residue.py [--out PATH] [sf_dir ...]
Writes tools/evidence/knn_residue_last_run.json unless --out is given
(round evidence should be copied/named explicitly so later reruns
never overwrite earlier rounds' artifacts).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_addresses_spark.operators import spatial_join as sj  # noqa: E402
from etl_addresses_spark.plans.flagship import (  # noqa: E402
    house_numbers_df,
    streets_df,
)
from etl_addresses_spark.session import get_spark  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def residue(spark, sf_dir: str) -> dict:
    hn = sj._prepare_house_numbers(house_numbers_df(spark, sf_dir))
    segs = sj._prepare_segments(streets_df(spark, sf_dir))
    from etl_addresses_spark.config import GRID_CELL_DEG, KNN_FANOUT

    # the production candidate pipeline, cached: the census reads it
    # twice (pair count + per-point safe count)
    local = sj._grid_knn_local(hn, segs).cache()
    try:
        boxdist2, _ = sj._knn_pair_metrics(local)
        safe2 = (2.0 * GRID_CELL_DEG) ** 2
        # per-point count of provably-complete local candidates (the
        # same _nsafe the plan computes); a point is SAFE when the
        # count reaches KNN_FANOUT
        per_point = (
            local.withColumn("_is_safe", (boxdist2 < F.lit(safe2)).cast("int"))
            .groupBy("houseNumberId")
            .agg(F.sum("_is_safe").alias("nsafe"))
        )
        n_points = hn.count()
        n_segs = segs.count()
        n_safe = per_point.filter(F.col("nsafe") >= KNN_FANOUT).count()
        local_pairs = local.count()
    finally:
        local.unpersist()
    n_escalated = n_points - n_safe
    return {
        "sf_dir": sf_dir,
        "points": n_points,
        "segments": n_segs,
        "escalated_points": n_escalated,
        "escalated_fraction": round(n_escalated / n_points, 6) if n_points else None,
        "escalation_pair_cost": n_escalated * n_segs,
        "local_pair_cost": local_pairs,
    }


def main() -> None:
    args = sys.argv[1:]
    path = os.path.join(REPO, "tools", "evidence", "knn_residue_last_run.json")
    if "--out" in args:
        i = args.index("--out")
        if i + 1 >= len(args):
            raise SystemExit("usage: knn_residue.py [--out PATH] [sf_dir ...]")
        path = args[i + 1]
        del args[i : i + 2]
    dirs = args or [
        "/root/testdata/sf0.1",
        "/tmp/spark_graft_scaled_10x_sf0.1",
    ]
    spark = get_spark("knn-residue")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"queries": [residue(spark, d) for d in dirs if os.path.isdir(d)]}
    rs = out["queries"]
    if len(rs) == 2:
        # A 0-escalation baseline is itself the strongest scale signal
        # the census can emit — say so explicitly instead of silently
        # dropping the key (r8 advice): a missing ratio must always
        # mean "not a 2-dir run", never "zero residue".
        if rs[0]["escalation_pair_cost"]:
            out["pair_cost_ratio"] = round(
                rs[1]["escalation_pair_cost"] / rs[0]["escalation_pair_cost"], 2
            )
        else:
            out["pair_cost_ratio"] = None
            out["pair_cost_ratio_note"] = (
                "baseline escalation_pair_cost is 0 (no escalated points"
                " at the base fixture); scaled cost is "
                f"{rs[1]['escalation_pair_cost']}"
            )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
