"""The flagship operator: spatio-temporal nearest-neighbor join.

Semantics (parity with /root/reference/addresses.js `infer`,
lines 44-161): for every house-number Point of type 'st:Address' with
non-null geometry, find the nearest street segment whose cross-track
distance (rounded to integer meters) is < 25 m and whose fuzzy-date
validity interval, widened by ±15 flat years (ms math), contains the
house number's interval; emit a matched address record, or an error
record when no candidate survives (left-outer semantics,
addresses.js:88-114).

Physical strategy — Spark-first, no R-tree (addresses.js:61-63,151-153
replaced):

* **grid** (default, the 100 TB path): every segment is assigned each
  grid cell its ε-expanded bbox touches (ε ≥ the 25 m cutoff), every
  point its single containing cell, then a plain equi-join on cell id —
  a shuffle hash join Catalyst/AQE already knows how to optimize, and
  broadcast automatically when the segment side is small.  Because
  ε ≥ cutoff, every segment within 25 m of a point lands in that
  point's cell, so the candidate set is a superset of all surviving
  matches and the final argmin answer is EXACT (candidates are only
  ever filtered afterwards; see SURVEY.md §4.3).
* **broadcast**: broadcast nested-loop cross join (correct at any
  scale where the segment side fits in memory; used for parity tests).

The argmin (addresses.js:83-90) is a `min(struct(...))` aggregation —
lexicographic struct ordering gives min-by-(distance, streetId,
seg_index) with a DETERMINISTIC tie-break (the reference's tie-break is
index-order-dependent, SURVEY.md §5), and a groupBy aggregation gets
map-side partial aggregation, unlike a window sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_addresses_spark.config import (
    DATASET_HOUSE_NUMBERS,
    DATASET_STREETS,
    MAX_DISTANCE_M,
    MS_THRESHOLD,
    YEAR_THRESHOLD,
)
from etl_addresses_spark.functions.dates import fuzzy_earliest_ms, fuzzy_latest_ms
from etl_addresses_spark.functions.geo import (
    BBOX_EPS_DEG,
    crosstrack_m_rounded,
    explode_segments,
    point_cell,
    segment_cells,
)
from etl_addresses_spark.functions.ids import full_id, internal_id

ERROR_MESSAGE = (
    f"Can't find street within {MAX_DISTANCE_M} meters and {YEAR_THRESHOLD} years"
)


def _prepare_house_numbers(house_numbers: DataFrame) -> DataFrame:
    """P1/P2 filters + probe-side derived columns (addresses.js:50-52,67-68)."""
    hn = house_numbers.filter(
        (F.col("type") == "st:Address") & F.col("geometry").isNotNull()
    )
    return hn.select(
        internal_id(F.col("id")).alias("hn_internal_id"),
        full_id(DATASET_HOUSE_NUMBERS, F.col("id")).alias("houseNumberId"),
        F.col("validSince").alias("hn_validSince"),
        F.col("validUntil").alias("hn_validUntil"),
        F.col("data").alias("addressData"),
        F.col("geometry").alias("addressGeometry"),
        F.col("geometry.coordinates").getItem(0).alias("pt_lon"),
        F.col("geometry.coordinates").getItem(1).alias("pt_lat"),
        fuzzy_earliest_ms(F.col("validSince")).alias("addr_since_ms"),
        fuzzy_latest_ms(F.col("validUntil")).alias("addr_until_ms"),
    )


def _prepare_segments(streets: DataFrame) -> DataFrame:
    """P3 filter + F9 segment explode + build-side derived columns
    (addresses.js:125-137), properties minus geometry (P6)."""
    segs = explode_segments(streets.filter(F.col("geometry").isNotNull()))
    return segs.select(
        full_id(DATASET_STREETS, F.col("id")).alias("streetId"),
        F.col("name").alias("streetName"),
        F.col("seg_index"),
        F.col("seg_lon1"),
        F.col("seg_lat1"),
        F.col("seg_lon2"),
        F.col("seg_lat2"),
        (fuzzy_earliest_ms(F.col("validSince")) - F.lit(MS_THRESHOLD)).alias(
            "seg_since_ms"
        ),
        (fuzzy_latest_ms(F.col("validUntil")) + F.lit(MS_THRESHOLD)).alias(
            "seg_until_ms"
        ),
    )


def _bbox_refine(cand: DataFrame) -> DataFrame:
    """Exact candidate predicate: the point lies inside the segment's
    ε-expanded bbox (the reference R-tree's `search` probe,
    addresses.js:61).  Applied after the (coarser) grid-cell prefilter
    so both physical strategies implement identical logical semantics.

    Deliberate deviation from the reference (documented, SURVEY.md §4.3
    edge note): the reference ALSO feeds the 10 index-nearest segments
    as candidates (addresses.js:62).  Because `turf.crosstrack` measures
    distance to the segment's INFINITE great circle, that fallback can
    "match" a far-away collinear segment (e.g. the same street row one
    grid column over, hundreds of meters away, crosstrack ≈ 0).  We
    exclude those degenerate matches: a candidate must be spatially near
    the point (within ε ≈ 45-55 m), not merely near its great circle.
    """
    eps = F.lit(BBOX_EPS_DEG)
    return cand.filter(
        (F.col("pt_lon") >= F.least(F.col("seg_lon1"), F.col("seg_lon2")) - eps)
        & (F.col("pt_lon") <= F.greatest(F.col("seg_lon1"), F.col("seg_lon2")) + eps)
        & (F.col("pt_lat") >= F.least(F.col("seg_lat1"), F.col("seg_lat2")) - eps)
        & (F.col("pt_lat") <= F.greatest(F.col("seg_lat1"), F.col("seg_lat2")) + eps)
    )


def _candidates(hn: DataFrame, segs: DataFrame, strategy: str) -> DataFrame:
    if strategy == "grid":
        seg_cells = segs.withColumn(
            "cell",
            F.explode(
                segment_cells(
                    F.col("seg_lat1"),
                    F.col("seg_lon1"),
                    F.col("seg_lat2"),
                    F.col("seg_lon2"),
                )
            ),
        )
        hn_cells = hn.withColumn("cell", point_cell(F.col("pt_lat"), F.col("pt_lon")))
        # Equi-join on cell id: Catalyst picks broadcast-hash when the
        # segment side is small, shuffle-hash/sort-merge otherwise; AQE
        # splits skewed cells (dense urban areas) at runtime.
        return _bbox_refine(hn_cells.join(seg_cells, "cell").drop("cell"))
    if strategy == "broadcast":
        return _bbox_refine(hn.crossJoin(F.broadcast(segs)))
    if strategy == "reference_knn":
        return _reference_knn_candidates(hn, segs)
    if strategy == "reference_knn_grid":
        return _reference_knn_candidates_grid(hn, segs)
    raise ValueError(f"unknown strategy {strategy!r}")


def _reference_knn_candidates(hn: DataFrame, segs: DataFrame) -> DataFrame:
    """STRICT reference-parity candidate semantics (addresses.js:61-63):
    `search` (exact bbox containment, no ε) ∪ `nearest(10)` (the 10
    nearest segments by planar point-to-bbox distance — what an R-tree
    kNN compares).  Unlike the default bbox semantics this can match a
    FAR-AWAY collinear segment whose infinite great circle passes within
    25 m of the point, exactly as the reference does.

    Physical shape is a ranked broadcast cross join — a validation mode,
    deliberately not the scale path (the rank is O(points x segments));
    the deterministic (boxdist, streetId, seg_index) tie-break stands in
    for the reference's index-insertion order."""
    from pyspark.sql import Window as W

    from etl_addresses_spark.config import KNN_FANOUT

    pairs = hn.crossJoin(F.broadcast(segs))
    boxdist2, bbox_hit = _knn_pair_metrics(pairs)
    w = W.partitionBy("houseNumberId").orderBy(
        boxdist2.asc(), F.col("streetId").asc(), F.col("seg_index").asc()
    )
    return (
        pairs.withColumn("_knn_rank", F.row_number().over(w))
        .filter(bbox_hit | (F.col("_knn_rank") <= KNN_FANOUT))
        .drop("_knn_rank")
    )


def _knn_pair_metrics(pairs: DataFrame):
    """(boxdist², exact-bbox-hit) shared by both kNN strategies —
    identical expressions so the grid variant provably computes the
    same ordering the cross-join validation mode does."""
    minx = F.least(F.col("seg_lon1"), F.col("seg_lon2"))
    maxx = F.greatest(F.col("seg_lon1"), F.col("seg_lon2"))
    miny = F.least(F.col("seg_lat1"), F.col("seg_lat2"))
    maxy = F.greatest(F.col("seg_lat1"), F.col("seg_lat2"))
    dx = F.greatest(minx - F.col("pt_lon"), F.col("pt_lon") - maxx, F.lit(0.0))
    dy = F.greatest(miny - F.col("pt_lat"), F.col("pt_lat") - maxy, F.lit(0.0))
    boxdist2 = dx * dx + dy * dy
    bbox_hit = (
        (F.col("pt_lon") >= minx)
        & (F.col("pt_lon") <= maxx)
        & (F.col("pt_lat") >= miny)
        & (F.col("pt_lat") <= maxy)
    )
    return boxdist2, bbox_hit


def _grid_knn_local(hn: DataFrame, segs: DataFrame) -> DataFrame:
    """The grid-kNN's deduped block-local candidate set — ONE row per
    (point, segment) whose segment is indexed in the point's 5x5 cell
    neighborhood.  Shared by `_reference_knn_candidates_grid` and the
    escalation-residue census (tools/knn_residue.py) so the census
    always measures exactly the production candidate pipeline.

    The repartition on houseNumberId makes ONE exchange serve both
    the dedup (HashPartitioning on a subset satisfies the 3-key
    ClusteredDistribution) and the per-point rank/nsafe windows
    downstream — without it the plan shuffles the wide candidate rows
    twice (measured 8.9 -> 5.3 s alone at sf0.1; 48.6 -> 27.2 s at
    10x).  Skew bound: one partition key = one point's candidates,
    capped by its 25-cell neighborhood's segment count."""
    from etl_addresses_spark.functions.geo import point_neighbor_cells

    seg_cells = segs.withColumn(
        "cell",
        F.explode(
            segment_cells(
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
    # A segment indexed in several block cells would appear per cell:
    # dedup to one candidate row per (point, segment) before ranking.
    return (
        probes.join(seg_cells, "cell")
        .drop("cell")
        .repartition("houseNumberId")
        .dropDuplicates(["houseNumberId", "streetId", "seg_index"])
    )


def _reference_knn_candidates_grid(hn: DataFrame, segs: DataFrame) -> DataFrame:
    """Grid-prefiltered STRICT reference-parity kNN — same output as
    `_reference_knn_candidates`, scale-safe physical plan.

    Each point probes its 5x5 grid-cell neighborhood (equi-join on cell
    id, 25x probe fan-out — no cross join).  A segment NOT indexed in
    that block has planar bbox distance >= 2·GRID_CELL_DEG from the
    point (geo.point_neighbor_cells), so when a point sees >= KNN_FANOUT
    local candidates STRICTLY inside that radius, its block-local
    (boxdist, streetId, seg_index) top-k is provably the global top-k —
    and exact bbox-containment hits are always block-local (a containing
    bbox overlaps the point's own cell).  The rare points that don't
    reach the bound (sparse regions, block edges) fall back to the
    ranked broadcast cross join — but only for that residue, so the
    O(points x segments) term is bounded by a small escalation set
    instead of the whole input."""
    from pyspark.sql import Window as W

    from etl_addresses_spark.config import GRID_CELL_DEG, KNN_FANOUT

    local = _grid_knn_local(hn, segs)
    boxdist2, bbox_hit = _knn_pair_metrics(local)
    w = W.partitionBy("houseNumberId")
    worder = w.orderBy(
        boxdist2.asc(), F.col("streetId").asc(), F.col("seg_index").asc()
    )
    safe2 = F.lit((2.0 * GRID_CELL_DEG) ** 2)
    ranked = (
        local.withColumn("_bbox_hit", bbox_hit)
        .withColumn("_boxdist2", boxdist2)
        .withColumn("_rank", F.row_number().over(worder))
        .withColumn(
            "_nsafe",
            F.sum(F.when(F.col("_boxdist2") < safe2, 1).otherwise(0)).over(w),
        )
    )
    safe_rows = ranked.filter(F.col("_nsafe") >= KNN_FANOUT)
    out_local = safe_rows.filter(
        F.col("_bbox_hit") | (F.col("_rank") <= KNN_FANOUT)
    ).drop("_bbox_hit", "_boxdist2", "_rank", "_nsafe")
    # Escalation residue: points without KNN_FANOUT provably-complete
    # local candidates (includes points with zero local candidates).
    escalated = hn.join(
        safe_rows.select("houseNumberId").distinct(), "houseNumberId", "left_anti"
    )
    return out_local.unionByName(_reference_knn_candidates(escalated, segs))


def infer_addresses(
    house_numbers: DataFrame,
    streets: DataFrame,
    strategy: str = "grid",
) -> DataFrame:
    """Full infer step: returns the `inferred` DataFrame — one row per
    surviving house number, matched columns or `error` populated
    (schema parity with FIXTURES.md §A3, addresses.js:95-114)."""
    hn = _prepare_house_numbers(house_numbers)
    segs = _prepare_segments(streets)

    cand = _candidates(hn, segs, strategy)

    # Cheap-before-expensive predicate cascade (addresses.js:66-82):
    # temporal containment (long compares) before spherical trig.
    cand = cand.filter(
        (F.col("seg_since_ms") <= F.col("addr_since_ms"))
        & (F.col("seg_until_ms") >= F.col("addr_until_ms"))
    )
    # Pushdown barrier: without it Catalyst folds the distance filter
    # into the join condition ahead of the cheap bbox conjuncts, and the
    # trig evaluates for every cell-co-resident pair instead of only
    # bbox+temporal survivors (Catalyst doesn't cost-order conjuncts).
    # A nondeterministic column blocks predicate pushdown through the
    # projection; it is dropped immediately after.
    cand = cand.withColumn("_pushdown_barrier", F.monotonically_increasing_id())
    cand = cand.withColumn(
        "distance",
        crosstrack_m_rounded(
            F.col("seg_lat1"),
            F.col("seg_lon1"),
            F.col("seg_lat2"),
            F.col("seg_lon2"),
            F.col("pt_lat"),
            F.col("pt_lon"),
        ),
    ).filter(F.col("distance") < MAX_DISTANCE_M).drop("_pushdown_barrier")

    # Argmin with deterministic tie-break: lexicographic min of
    # (distance, streetId, seg_index, payload...) — map-side combinable.
    best = (
        cand.groupBy("houseNumberId")
        .agg(
            F.min(
                F.struct(
                    F.col("distance"),
                    F.col("streetId"),
                    F.col("seg_index"),
                    F.col("streetName"),
                )
            ).alias("best")
        )
        .select(
            F.col("houseNumberId"),
            F.col("best.distance").alias("lineLength"),
            F.col("best.streetId").alias("streetId"),
            F.col("best.streetName").alias("streetName"),
        )
    )

    # Left-outer: unmatched house numbers become error records
    # (addresses.js:88,107-114).
    joined = hn.join(best, "houseNumberId", "left")
    matched = F.col("streetId").isNotNull()
    return joined.select(
        F.when(matched, F.col("hn_internal_id")).alias("id"),
        # concat (not concat_ws): propagates NULL like the oracle's
        # `number || ' ' || streetName`.  A NULL house number yields a
        # NULL name on both sides — chosen over the reference's literal
        # "undefined <street>" rendering of a JS undefined.
        F.when(
            matched,
            F.concat(
                F.col("addressData.number"), F.lit(" "), F.col("streetName")
            ),
        ).alias("name"),
        F.col("houseNumberId"),
        F.col("streetId"),
        F.when(matched, F.col("hn_validSince")).alias("validSince"),
        F.when(matched, F.col("hn_validUntil")).alias("validUntil"),
        F.col("streetName"),
        F.col("addressData"),
        F.col("lineLength"),
        F.col("addressGeometry"),
        F.when(~matched, F.lit(ERROR_MESSAGE)).alias("error"),
    )


def infer_addresses_observed(
    house_numbers: DataFrame,
    streets: DataFrame,
    strategy: str = "grid",
):
    """infer_addresses plus an Observation — the A1 progress counter
    (addresses.js:49-59) done the Spark way: metrics collected by the
    executors during the job, no side-effect logging in the data path.

    Returns (inferred_df, observation); after an action,
    `observation.get` holds processed/matched/unmatched counts."""
    from pyspark.sql import Observation

    obs = Observation("infer_addresses")
    inferred = infer_addresses(house_numbers, streets, strategy=strategy)
    observed = inferred.observe(
        obs,
        F.count(F.lit(1)).alias("processed"),
        F.count("streetId").alias("matched"),
        F.count("error").alias("unmatched"),
    )
    return observed, obs


def inferred_flat(inferred: DataFrame) -> DataFrame:
    """Flat projection of the inferred output for the DuckDB oracle
    (nested structs/geometry unfolded into scalar columns)."""
    return inferred.select(
        "id",
        "name",
        "houseNumberId",
        "streetId",
        "validSince",
        "validUntil",
        "streetName",
        "lineLength",
        "error",
        F.col("addressData.sheetId").alias("sheetId"),
        F.col("addressData.layerId").alias("layerId"),
        F.col("addressData.mapId").alias("mapId"),
        F.col("addressData.number").alias("number"),
        F.col("addressData.borough").alias("borough"),
    )
