"""Tests for exact integer pointInPolygon (operators/geo.py) against an
independent float ray-casting reference and known geometric facts."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from kubenetmon_spark.operators.geo import point_in_polygon

HEX = [(501, 51), (901, 301), (901, 701), (501, 951), (101, 701), (101, 301)]


def _ref_inside(x, y, poly):
    # independent float formulation (classic ray casting)
    inside = False
    n = len(poly)
    for i in range(n):
        ax, ay = poly[i]
        bx, by = poly[(i + 1) % n]
        if (ay > y) != (by > y):
            xint = ax + (y - ay) * (bx - ax) / (by - ay)
            if x < xint:
                inside = not inside
    return inside


class TestPointInPolygon:
    def _run(self, spark, pts, poly):
        df = spark.createDataFrame(pts, ["x", "y"])
        return [
            r.inside
            for r in df.withColumn("inside", point_in_polygon("x", "y", poly))
            .orderBy("x", "y")
            .collect()
        ]

    def test_matches_float_reference_random(self, spark):
        rng = random.Random(103)
        pts = sorted({(rng.randrange(0, 1000), rng.randrange(0, 1000)) for _ in range(500)})
        got = self._run(spark, pts, HEX)
        want = [_ref_inside(x, y, HEX) for x, y in pts]
        assert got == want

    def test_known_points(self, spark):
        pts = [(500, 500), (0, 0), (999, 999), (102, 302), (900, 500)]
        got = dict(zip(pts, [None] * 5))
        df_res = self._run(spark, sorted(pts), HEX)
        res = dict(zip(sorted(pts), df_res))
        assert res[(500, 500)] is True  # centroid
        assert res[(0, 0)] is False
        assert res[(999, 999)] is False
        assert res[(900, 500)] is True  # near right edge, inside

    def test_winding_direction_irrelevant(self, spark):
        rng = random.Random(107)
        pts = sorted({(rng.randrange(0, 1000), rng.randrange(0, 1000)) for _ in range(200)})
        cw = self._run(spark, pts, HEX)
        ccw = self._run(spark, pts, list(reversed(HEX)))
        assert cw == ccw

    def test_concave_polygon(self, spark):
        # arrowhead: concave at (500, 500)
        poly = [(101, 101), (901, 101), (501, 901), (501, 501)]
        rng = random.Random(109)
        pts = sorted({(rng.randrange(0, 1000), rng.randrange(0, 1000)) for _ in range(300)})
        got = self._run(spark, pts, poly)
        want = [_ref_inside(x, y, poly) for x, y in pts]
        assert got == want

    def test_too_few_vertices_raises(self, spark):
        with pytest.raises(ValueError):
            point_in_polygon("x", "y", [(0, 0), (1, 1)])
