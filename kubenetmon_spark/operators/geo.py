"""Cartesian geo predicates: ClickHouse ``pointInPolygon``.

Exact integer formulation: the crossing-number test usually divides to
find the ray intersection; cross-multiplying turns every comparison into
a sign test on t = (bx-ax)*(y-ay) - (x-ax)*(by-ay) — pure int64
arithmetic, so any engine computes identical booleans (points exactly ON
an edge get the half-open rule's deterministic answer, the same one in
every engine). ClickHouse's const-polygon fast path builds a grid index;
at Spark scale the predicate is a fixed expression chain over the
polygon's edges — codegen folds it into the scan, no join, no shuffle,
cost O(vertices) per row.

Coordinates must be integers (fixed-point your lon/lat first); |coord| *
|coord| must fit int64 — 1e9-scaled degrees are safe.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def point_in_polygon(
    x: Column | str,
    y: Column | str,
    polygon: list[tuple[int, int]],
) -> Column:
    """Boolean column: is (x, y) inside ``polygon`` (closed implicitly;
    vertices in order, either winding)? Crossing-number parity with the
    half-open vertex rule — each edge contributes when it spans y
    strictly on one side, so rays through vertices are counted once."""
    if len(polygon) < 3:
        raise ValueError("polygon needs at least 3 vertices")
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    crossings = []
    n = len(polygon)
    for i in range(n):
        ax, ay = polygon[i]
        bx, by = polygon[(i + 1) % n]
        if ay == by:
            continue  # horizontal edge never crosses a horizontal ray
        spans = (F.lit(ay) > yc) != (F.lit(by) > yc)
        t = (F.lit(bx - ax)) * (yc - F.lit(ay)) - (xc - F.lit(ax)) * F.lit(
            by - ay
        )
        # x < intersection  <=>  sign(t) == sign(by - ay)
        crosses = (t > 0) == F.lit(by > ay)
        crossings.append(spans & crosses)
    # boolean XOR as != (Columns have no ^ operator; inputs never null)
    return reduce(lambda a, b: a != b, crossings)


EARTH_RADIUS_M = 6371008.8  # IUGG mean radius, meters


def great_circle_distance_m(
    lat1: Column | str,
    lon1: Column | str,
    lat2: Column | str,
    lon2: Column | str,
) -> Column:
    """ClickHouse ``greatCircleDistance`` analogue: haversine distance in
    meters on a sphere of mean radius 6371008.8 m (ClickHouse uses its
    own sphere constant and an ellipsoid-corrected ``geoDistance``
    variant; the formula here is the textbook haversine, and callers
    comparing across engines should round to whole meters — the final
    double differs from another engine's libm by ulps at most).

    Pure built-in trig (radians/sin/cos/asin/sqrt) — codegen, no UDF,
    no shuffle: a per-row projection that composes with any scan.
    """
    la1, lo1 = F.radians(F.col(lat1) if isinstance(lat1, str) else lat1), \
        F.radians(F.col(lon1) if isinstance(lon1, str) else lon1)
    la2, lo2 = F.radians(F.col(lat2) if isinstance(lat2, str) else lat2), \
        F.radians(F.col(lon2) if isinstance(lon2, str) else lon2)
    sa, so = F.sin((la2 - la1) / 2), F.sin((lo2 - lo1) / 2)
    # sa * sa, not pow(sa, 2): pow is a libm call not guaranteed to be
    # the exact product, and the oracle squares by multiplication too
    h = sa * sa + F.cos(la1) * F.cos(la2) * so * so
    return F.lit(2 * EARTH_RADIUS_M) * F.asin(F.least(F.sqrt(h), F.lit(1.0)))
