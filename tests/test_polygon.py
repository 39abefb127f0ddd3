from __future__ import annotations

from conftest import SF_ORACLE, assert_frames_match

from pyspark.sql import functions as F

from etl_addresses_spark.operators import polygon


def test_st_contains_matches_oracle(spark, ddb):
    sdf = polygon.st_contains_join(spark, SF_ORACLE)
    assert_frames_match(sdf, ddb.sql(polygon.ST_CONTAINS_SQL))


def test_st_contains_nonempty_and_star_concavity(spark):
    out = polygon.st_contains_join(spark, SF_ORACLE).cache()
    assert out.count() > 0, "fixture points should land inside some polygons"
    # concavity: the star's bbox must contain points that the star rejects,
    # otherwise the ray-cast is degenerate bbox containment
    pts = polygon.house_numbers_df(spark, SF_ORACLE).filter(
        (F.col("type") == "st:Address") & F.col("geometry").isNotNull()
    ).select(
        F.col("id").alias("point_id"),
        F.col("geometry.coordinates").getItem(0).alias("px"),
        F.col("geometry.coordinates").getItem(1).alias("py"),
    )
    polys = polygon.star_polygons(spark, SF_ORACLE)
    in_bbox = pts.join(
        F.broadcast(polys),
        (F.col("px") >= F.col("xmin")) & (F.col("px") <= F.col("xmax"))
        & (F.col("py") >= F.col("ymin")) & (F.col("py") <= F.col("ymax")),
    ).select("point_id", "poly_id")
    assert in_bbox.count() > out.count(), "star must reject some bbox candidates"


def test_point_known_inside_and_outside(spark):
    # polygon 0: center (-74.298, 40.55), rx=0.008, ry=0.04. The center is
    # inside; a bbox corner (outside the star arms) is not.
    polys = polygon.star_polygons(spark, SF_ORACLE).filter("poly_id = 0")
    center = polys.select(
        polygon._crossings(F.lit(-74.298), F.lit(40.55)).alias("c")
    ).head().c
    corner = polys.select(
        polygon._crossings(F.lit(-74.298 + 0.0079), F.lit(40.55 + 0.0399)).alias("c")
    ).head().c
    assert center % 2 == 1
    assert corner % 2 == 0
