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
