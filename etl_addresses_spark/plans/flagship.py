"""Flagship spatio-temporal join as a driver-checkable query.

`spatiotemporal_join(spark, sf_dir)` runs the full reference pipeline
(/root/reference/addresses.js `infer`) over the deterministic geo
fixtures derived from supplier/customer (sources/fixtures.py) and
returns the flat inferred output; `ORACLE_SQL` computes the identical
result in DuckDB over the same parquet tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_addresses_spark.config import MAX_DISTANCE_M, MS_THRESHOLD
from etl_addresses_spark.functions.dates import DUCKDB_EARLIEST_MS, DUCKDB_LATEST_MS
from etl_addresses_spark.functions.geo import duckdb_crosstrack_m
from etl_addresses_spark.operators.spatial_join import infer_addresses, inferred_flat
from etl_addresses_spark.sources.fixtures import (
    DUCKDB_FIXTURE_CTES,
    house_numbers_df,
    streets_df,
)


def spatiotemporal_join(
    spark: SparkSession, sf_dir: str, strategy: str = "grid"
) -> DataFrame:
    inferred = infer_addresses(
        house_numbers_df(spark, sf_dir), streets_df(spark, sf_dir), strategy=strategy
    )
    return inferred_flat(inferred)


_SEG_SINCE = DUCKDB_EARLIEST_MS.format(c="validSince")
_SEG_UNTIL = DUCKDB_LATEST_MS.format(c="validUntil")
_HN_SINCE = DUCKDB_EARLIEST_MS.format(c="validSince")
_HN_UNTIL = DUCKDB_LATEST_MS.format(c="validUntil")
_DIST = duckdb_crosstrack_m("s.y1", "s.x1", "s.y2", "s.x2", "h.pt_lat", "h.pt_lon")

# All CTEs up to and including `inferred` — reused by the transform-step
# oracles (plans/transform.py) so every downstream record type is checked
# against the same join result.
INFERRED_CTES = f"""
WITH {DUCKDB_FIXTURE_CTES.strip()},
seg AS (
  SELECT
    CASE WHEN contains(id, '/') THEN id ELSE 'nyc-streets/' || id END AS streetId,
    name AS streetName,
    seg_index, x1, y1, x2, y2,
    ({_SEG_SINCE}) - {MS_THRESHOLD} AS seg_since_ms,
    ({_SEG_UNTIL}) + {MS_THRESHOLD} AS seg_until_ms
  FROM fx_segments
),
hn AS (
  SELECT
    CASE WHEN contains(id, '/') THEN split_part(id, '/', 2) ELSE id END AS hn_internal_id,
    CASE WHEN contains(id, '/') THEN id ELSE 'building-inspector/' || id END AS houseNumberId,
    validSince, validUntil, sheetId, layerId, mapId, number, borough,
    pt_lat, pt_lon,
    ({_HN_SINCE}) AS addr_since_ms,
    ({_HN_UNTIL}) AS addr_until_ms
  FROM fx_hn
  WHERE type = 'st:Address' AND NOT geom_is_null
),
cand AS (
  SELECT h.houseNumberId, s.streetId, s.streetName, s.seg_index,
         {_DIST} AS distance
  FROM hn h JOIN seg s
    ON h.pt_lon >= least(s.x1, s.x2) - 0.0005e0
   AND h.pt_lon <= greatest(s.x1, s.x2) + 0.0005e0
   AND h.pt_lat >= least(s.y1, s.y2) - 0.0005e0
   AND h.pt_lat <= greatest(s.y1, s.y2) + 0.0005e0
   AND s.seg_since_ms <= h.addr_since_ms AND s.seg_until_ms >= h.addr_until_ms
),
best AS (
  SELECT houseNumberId, distance AS lineLength, streetId, streetName
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY houseNumberId
      ORDER BY distance, streetId, seg_index
    ) AS rn
    FROM cand
    WHERE distance < {MAX_DISTANCE_M}
  )
  WHERE rn = 1
),
inferred AS (
  SELECT
    CASE WHEN b.streetId IS NOT NULL THEN h.hn_internal_id END AS id,
    CASE WHEN b.streetId IS NOT NULL THEN h.number || ' ' || b.streetName END AS name,
    h.houseNumberId AS houseNumberId,
    b.streetId AS streetId,
    CASE WHEN b.streetId IS NOT NULL THEN h.validSince END AS validSince,
    CASE WHEN b.streetId IS NOT NULL THEN h.validUntil END AS validUntil,
    b.streetName AS streetName,
    b.lineLength AS lineLength,
    CASE WHEN b.streetId IS NULL
         THEN 'Can''t find street within {MAX_DISTANCE_M} meters and 15 years'
    END AS error,
    h.sheetId AS sheetId,
    h.layerId AS layerId,
    h.mapId AS mapId,
    h.number AS number,
    h.borough AS borough
  FROM hn h
  LEFT JOIN best b USING (houseNumberId)
)
"""

ORACLE_SQL = INFERRED_CTES + "\nSELECT * FROM inferred"
