"""Engine constants, mirroring the reference's tunables.

Reference sites: /root/reference/addresses.js:12-13 (YEAR_THRESHOLD,
MAX_DISTANCE), :47 (MS_THRESHOLD uses flat 365-day years, NOT calendar
years), :15-18 (dataset names), :62 (kNN fan-out).
"""

YEAR_THRESHOLD = 15
MAX_DISTANCE_M = 25
# 15 flat 365-day years in epoch milliseconds — addresses.js:47 computes
# YEAR_THRESHOLD * 365 * 24 * 60 * 60 * 1000; exact parity requires flat
# ms math, not add_months/calendar arithmetic.
MS_THRESHOLD = YEAR_THRESHOLD * 365 * 24 * 60 * 60 * 1000
KNN_FANOUT = 10

DATASET_STREETS = "nyc-streets"
DATASET_HOUSE_NUMBERS = "building-inspector"

# Mean Earth radius in km used by the cross-track / haversine math
# (turf-crosstrack dependency of the reference, addresses.js:7,76).
EARTH_RADIUS_KM = 6371.0

# Grid-cell size in degrees for the scale-tier spatial candidate join:
# ~1.1 km at the equator, comfortably larger than MAX_DISTANCE_M so a
# one-cell ε-expansion of each segment bbox guarantees every point finds
# all segments within MAX_DISTANCE_M in its own cell (see
# operators/spatial_join.py).
GRID_CELL_DEG = 0.01
