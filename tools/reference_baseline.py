"""Single-node reference-style baseline for the flagship join.

The reference (/root/reference/addresses.js) is a single-threaded
pipeline: build an in-memory spatial index over street segments, then
probe per house number (bbox search + temporal filter + cross-track
distance + argmin).  This script reimplements that algorithm shape in
single-threaded Python (grid-bucket index standing in for the R-tree)
over the same synthetic inputs as tools/stress_spatial.py and times it
against the Spark engine — the "matches-or-beats single-node
throughput" evidence.

    python tools/reference_baseline.py [n_points [n_streets]]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R_KM = 6371.0
CELL = 0.01
EPS = 0.0005
MS_THRESHOLD = 15 * 365 * 24 * 60 * 60 * 1000
MAX_DIST = 25


def crosstrack_m(y1, x1, y2, x2, py, px):
    rad = math.radians
    dphi = rad(py) - rad(y1)
    dlon = rad(px) - rad(x1)
    a = (
        math.sin(dphi / 2) ** 2
        + math.cos(rad(y1)) * math.cos(rad(py)) * math.sin(dlon / 2) ** 2
    )
    d13 = 2 * math.asin(math.sqrt(a))

    def bearing(aY, aX, bY, bX):
        dl = rad(bX) - rad(aX)
        return math.atan2(
            math.sin(dl) * math.cos(rad(bY)),
            math.cos(rad(aY)) * math.sin(rad(bY))
            - math.sin(rad(aY)) * math.cos(rad(bY)) * math.cos(dl),
        )

    b13 = bearing(y1, x1, py, px)
    b12 = bearing(y1, x1, y2, x2)
    return round(abs(math.asin(math.sin(d13) * math.sin(b13 - b12)) * R_KM) * 1000)


def year_ms(y: int, end: bool) -> int:
    import datetime as dt

    d = dt.datetime(y, 12, 31, tzinfo=dt.timezone.utc) if end else dt.datetime(
        y, 1, 1, tzinfo=dt.timezone.utc
    )
    return int(d.timestamp() * 1000)


def gen_streets(m):
    for i in range(m):
        lat = 40.0 + (i % 500) * 0.01
        lon0 = -75.0 + (i // 500) * 0.01
        midlat = lat + (i % 3) * 0.0001
        y = 1800 + (i % 100)
        verts = [(lon0, lat), (lon0 + 0.002, midlat), (lon0 + 0.004, lat)]
        for k in range(2):
            (ax, ay), (bx, by) = verts[k], verts[k + 1]
            yield (
                i,
                ax,
                ay,
                bx,
                by,
                year_ms(y, False) - MS_THRESHOLD,
                year_ms(y + 40, True) + MS_THRESHOLD,
            )


def gen_points(n, m):
    for j in range(n):
        i = j % m
        lat = 40.0 + (i % 500) * 0.01 + ((j % 31) - 15) * 0.00002
        lon = -75.0 + (i // 500) * 0.01 + 0.001 + (j % 5) * 0.0005
        ya = 1800 + (i % 100) + ((j % 60) - 20)
        yield j, lon, lat, year_ms(ya, False), year_ms(ya, True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

    t0 = time.perf_counter()
    # build side: grid-bucket index over ε-expanded segment bboxes
    index: dict[tuple[int, int], list] = {}
    for seg in gen_streets(m):
        _, ax, ay, bx, by, _, _ = seg
        minx, maxx = min(ax, bx) - EPS, max(ax, bx) + EPS
        miny, maxy = min(ay, by) - EPS, max(ay, by) + EPS
        for cx in range(int(minx // CELL), int(maxx // CELL) + 1):
            for cy in range(int(miny // CELL), int(maxy // CELL) + 1):
                index.setdefault((cx, cy), []).append(seg)
    build_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    matched = unmatched = 0
    for j, px, py, since, until in gen_points(n, m):
        cell = (int(px // CELL), int(py // CELL))
        best = None
        for sid, ax, ay, bx, by, slo, shi in index.get(cell, ()):
            if not (
                min(ax, bx) - EPS <= px <= max(ax, bx) + EPS
                and min(ay, by) - EPS <= py <= max(ay, by) + EPS
            ):
                continue
            if not (slo <= since and shi >= until):
                continue
            d = crosstrack_m(ay, ax, by, bx, py, px)
            if d < MAX_DIST and (best is None or d < best[0]):
                best = (d, sid)
        if best is None:
            unmatched += 1
        else:
            matched += 1
    probe_sec = time.perf_counter() - t0
    total = build_sec + probe_sec
    print(
        f"python-single-thread points={n:,} streets={m:,} "
        f"build={build_sec:.1f}s probe={probe_sec:.1f}s total={total:.1f}s "
        f"pts/sec={n / total:,.0f} matched={matched:,} unmatched={unmatched:,}"
    )


if __name__ == "__main__":
    main()
