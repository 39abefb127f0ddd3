"""Escalation-residue census for the grid-kNN strict-parity plan
(r7 verdict item 4): the grid tier's worst case is every point
escalating to the ranked broadcast cross join, so the thing to
MEASURE at 10x is the residue fraction — if it grows with scale the
O(points x segments) fallback term eventually dominates; if it stays
a small constant fraction the plan survives.

Usage: python tools/knn_residue.py [sf_dir ...]
Writes tools/evidence/r8_knn_residue.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

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
    from etl_addresses_spark.functions.geo import point_neighbor_cells

    seg_cells = segs.withColumn(
        "cell",
        F.explode(
            sj.segment_cells(
                F.col("seg_lat1"),
                F.col("seg_lon1"),
                F.col("seg_lat2"),
                F.col("seg_lon2"),
            )
        ),
    )
    probes = hn.withColumn(
        "cell", F.explode(point_neighbor_cells(F.col("pt_lat"), F.col("pt_lon")))
    )
    local = (
        probes.join(seg_cells, "cell")
        .drop("cell")
        .dropDuplicates(["houseNumberId", "streetId", "seg_index"])
    )
    boxdist2, _ = sj._knn_pair_metrics(local)
    safe2 = (2.0 * GRID_CELL_DEG) ** 2
    # per-point count of provably-complete local candidates (the same
    # _nsafe the plan computes); a point is SAFE when >= KNN_FANOUT
    per_point = (
        local.withColumn("_is_safe", (boxdist2 < F.lit(safe2)).cast("int"))
        .groupBy("houseNumberId")
        .agg(F.sum("_is_safe").alias("nsafe"))
    )
    n_points = hn.count()
    n_segs = segs.count()
    n_safe = per_point.filter(F.col("nsafe") >= KNN_FANOUT).count()
    n_escalated = n_points - n_safe
    return {
        "sf_dir": sf_dir,
        "points": n_points,
        "segments": n_segs,
        "escalated_points": n_escalated,
        "escalated_fraction": round(n_escalated / n_points, 6) if n_points else None,
        "escalation_pair_cost": n_escalated * n_segs,
        "local_pair_cost": local.count(),
    }


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/spark_graft_scaled_10x_sf0.1",
    ]
    spark = get_spark("knn-residue")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"queries": [residue(spark, d) for d in dirs if os.path.isdir(d)]}
    rs = out["queries"]
    if len(rs) == 2 and rs[0]["escalation_pair_cost"]:
        out["pair_cost_ratio"] = round(
            rs[1]["escalation_pair_cost"] / rs[0]["escalation_pair_cost"], 2
        )
    path = "/root/repo/tools/evidence/r8_knn_residue.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
