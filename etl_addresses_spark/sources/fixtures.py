"""Deterministic geo fixtures for the flagship spatio-temporal join.

The reference joins `nyc-streets` LineStrings against
`building-inspector` house-number Points (/root/reference/addresses.js).
The driver's testdata has no geo tables, so we DERIVE streets and house
numbers deterministically from `supplier` and `customer` with pure
arithmetic that is expressed IDENTICALLY in Spark column expressions and
in DuckDB SQL — both engines compute the same IEEE doubles, making the
whole flagship join oracle-checkable end-to-end (row hash at sf0.01).

Derivation (i = s_suppkey, j = c_custkey, n = count(supplier)):

streets (one per supplier):
    row     = i % 50;   col = floor(i / 50.0)
    lat     = 40.5  + row * 0.01          -- rows ~1.1 km apart
    lon0    = -74.3 + col * 0.01
    midlat  = lat + (i % 3) * 0.0001      -- bend => distinct segment circles
    coords  = [(lon0, lat), (lon0+0.002, midlat), (lon0+0.004, lat)]
              -- 3 vertices => 2 segments after explode (F9 coverage)
    id      = 'nyc-streets/st'||i if i%7==0 else 'st'||i   (F3 coverage)
    name    = s_name
    validSince = NULL            if i%11==0        (null-date => never matches)
               | (1800+i%100)||'-06' if i%5==0     (month-granular fuzzy date)
               | 1800+i%100                        (year-granular)
    validUntil = 1840+i%100

house_numbers (one per customer; attached street istar = j % n):
    pt_lat  = street_lat(istar) + ((j % 31) - 15) * 0.00002   -- ±33 m offsets:
              some beyond the 25 m cutoff => unmatched spatial coverage
    pt_lon  = street_lon0(istar) + 0.001 + (j % 5) * 0.0005
    type    = 'st:Dataset' if j%25==0 else 'st:Address'       (P1 coverage)
    geometry NULL if j%40==7                                  (P2 coverage)
    ya      = 1800 + (istar % 100) + ((j % 60) - 20)          -- ±20y around the
              street interval => temporal-miss coverage at the ±15y threshold
    validSince = NULL if j%37==3 | ya||'-03' if j%6==0 | ya
    validUntil = ya + (j % 3)
    id      = 'building-inspector/hn'||j if j%10==0 else 'hn'||j
    data    = struct(sheetId=j%100, layerId=j%10, mapId=j%1000,
                     number=str(j), borough=5-way CASE)

DuckDB notes: bare decimal literals are DECIMAL not DOUBLE — every
fractional literal in the SQL uses the `e0` exponent form so both
engines do pure double arithmetic in the same association order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_addresses_spark.sources.tables import load_table

BOROUGHS = ["Manhattan", "Brooklyn", "Queens", "Bronx", "Staten Island"]


def streets_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Street table in Space/Time object shape (FIXTURES.md §A1)."""
    s = load_table(spark, sf_dir, "supplier")
    i = F.col("s_suppkey")
    lat = F.lit(40.5) + (i % 50) * F.lit(0.01)
    lon0 = F.lit(-74.3) + F.floor(i / F.lit(50.0)) * F.lit(0.01)
    midlat = F.lit(40.5) + (i % 50) * F.lit(0.01) + (i % 3) * F.lit(0.0001)
    year = (F.lit(1800) + (i % 100)).cast("string")
    return s.select(
        F.when(i % 7 == 0, F.concat(F.lit("nyc-streets/st"), i.cast("string")))
        .otherwise(F.concat(F.lit("st"), i.cast("string")))
        .alias("id"),
        F.lit("st:Street").alias("type"),
        F.col("s_name").alias("name"),
        F.when(i % 11 == 0, F.lit(None).cast("string"))
        .when(i % 5 == 0, F.concat(year, F.lit("-06")))
        .otherwise(year)
        .alias("validSince"),
        (F.lit(1840) + (i % 100)).cast("string").alias("validUntil"),
        F.struct(
            F.lit("LineString").alias("type"),
            F.array(
                F.array(lon0, lat),
                F.array(lon0 + F.lit(0.002), midlat),
                F.array(lon0 + F.lit(0.004), lat),
            ).alias("coordinates"),
        ).alias("geometry"),
    )


def house_numbers_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """House-number table in Space/Time object shape (FIXTURES.md §A2)."""
    c = load_table(spark, sf_dir, "customer")
    n_sup = load_table(spark, sf_dir, "supplier").agg(F.count("*").alias("n_sup"))
    df = c.crossJoin(F.broadcast(n_sup))
    j = F.col("c_custkey")
    istar = j % F.col("n_sup")
    pt_lat = (
        F.lit(40.5)
        + (istar % 50) * F.lit(0.01)
        + ((j % 31) - 15) * F.lit(0.00002)
    )
    pt_lon = (
        F.lit(-74.3)
        + F.floor(istar / F.lit(50.0)) * F.lit(0.01)
        + F.lit(0.001)
        + (j % 5) * F.lit(0.0005)
    )
    ya = F.lit(1800) + (istar % 100) + ((j % 60) - 20)
    borough = (
        F.when(j % 5 == 0, BOROUGHS[0])
        .when(j % 5 == 1, BOROUGHS[1])
        .when(j % 5 == 2, BOROUGHS[2])
        .when(j % 5 == 3, BOROUGHS[3])
        .otherwise(BOROUGHS[4])
    )
    return df.select(
        F.when(
            j % 10 == 0, F.concat(F.lit("building-inspector/hn"), j.cast("string"))
        )
        .otherwise(F.concat(F.lit("hn"), j.cast("string")))
        .alias("id"),
        F.when(j % 25 == 0, F.lit("st:Dataset"))
        .otherwise(F.lit("st:Address"))
        .alias("type"),
        F.when(j % 37 == 3, F.lit(None).cast("string"))
        .when(j % 6 == 0, F.concat(ya.cast("string"), F.lit("-03")))
        .otherwise(ya.cast("string"))
        .alias("validSince"),
        (ya + (j % 3)).cast("string").alias("validUntil"),
        F.struct(
            (j % 100).cast("int").alias("sheetId"),
            (j % 10).cast("int").alias("layerId"),
            (j % 1000).cast("int").alias("mapId"),
            j.cast("string").alias("number"),
            borough.alias("borough"),
        ).alias("data"),
        F.when(j % 40 == 7, F.lit(None).cast("struct<type:string,coordinates:array<double>>"))
        .otherwise(
            F.struct(
                F.lit("Point").alias("type"),
                F.array(pt_lon, pt_lat).alias("coordinates"),
            )
        )
        .alias("geometry"),
    )


# --- DuckDB CTEs producing the identical fixture rows --------------------

# Streets with precomputed endpoint coordinates (the 3 fixture vertices),
# plus the two exploded segments — the oracle constructs segments directly
# because the fixture geometry is known to have exactly 3 vertices.
DUCKDB_FIXTURE_CTES = """
nsup AS (SELECT count(*) AS n FROM supplier),
fx_streets AS (
  SELECT
    s_suppkey AS i,
    CASE WHEN s_suppkey % 7 = 0 THEN 'nyc-streets/st' || CAST(s_suppkey AS VARCHAR)
         ELSE 'st' || CAST(s_suppkey AS VARCHAR) END AS id,
    s_name AS name,
    CASE WHEN s_suppkey % 11 = 0 THEN NULL
         WHEN s_suppkey % 5 = 0 THEN CAST(1800 + (s_suppkey % 100) AS VARCHAR) || '-06'
         ELSE CAST(1800 + (s_suppkey % 100) AS VARCHAR) END AS validSince,
    CAST(1840 + (s_suppkey % 100) AS VARCHAR) AS validUntil,
    40.5e0 + (s_suppkey % 50) * 0.01e0 AS lat,
    -74.3e0 + floor(s_suppkey / 50.0e0) * 0.01e0 AS lon0,
    40.5e0 + (s_suppkey % 50) * 0.01e0 + (s_suppkey % 3) * 0.0001e0 AS midlat
  FROM supplier
),
fx_segments AS (
  SELECT i, id, name, validSince, validUntil, 0 AS seg_index,
         lon0 AS x1, lat AS y1, lon0 + 0.002e0 AS x2, midlat AS y2
  FROM fx_streets
  UNION ALL
  SELECT i, id, name, validSince, validUntil, 1 AS seg_index,
         lon0 + 0.002e0 AS x1, midlat AS y1, lon0 + 0.004e0 AS x2, lat AS y2
  FROM fx_streets
),
fx_hn AS (
  SELECT
    c_custkey AS j,
    (c_custkey % n.n) AS istar,
    CASE WHEN c_custkey % 10 = 0 THEN 'building-inspector/hn' || CAST(c_custkey AS VARCHAR)
         ELSE 'hn' || CAST(c_custkey AS VARCHAR) END AS id,
    CASE WHEN c_custkey % 25 = 0 THEN 'st:Dataset' ELSE 'st:Address' END AS type,
    CASE WHEN c_custkey % 37 = 3 THEN NULL
         WHEN c_custkey % 6 = 0 THEN CAST(1800 + ((c_custkey % n.n) % 100) + ((c_custkey % 60) - 20) AS VARCHAR) || '-03'
         ELSE CAST(1800 + ((c_custkey % n.n) % 100) + ((c_custkey % 60) - 20) AS VARCHAR) END AS validSince,
    CAST(1800 + ((c_custkey % n.n) % 100) + ((c_custkey % 60) - 20) + (c_custkey % 3) AS VARCHAR) AS validUntil,
    CAST(c_custkey % 100 AS INTEGER) AS sheetId,
    CAST(c_custkey % 10 AS INTEGER) AS layerId,
    CAST(c_custkey % 1000 AS INTEGER) AS mapId,
    CAST(c_custkey AS VARCHAR) AS number,
    CASE WHEN c_custkey % 5 = 0 THEN 'Manhattan'
         WHEN c_custkey % 5 = 1 THEN 'Brooklyn'
         WHEN c_custkey % 5 = 2 THEN 'Queens'
         WHEN c_custkey % 5 = 3 THEN 'Bronx'
         ELSE 'Staten Island' END AS borough,
    (c_custkey % 40 = 7) AS geom_is_null,
    40.5e0 + ((c_custkey % n.n) % 50) * 0.01e0 + ((c_custkey % 31) - 15) * 0.00002e0 AS pt_lat,
    -74.3e0 + floor((c_custkey % n.n) / 50.0e0) * 0.01e0 + 0.001e0 + (c_custkey % 5) * 0.0005e0 AS pt_lon
  FROM customer, nsup n
)
"""
