"""Convex-hull aggregate (operators/hull.py): geometry unit vectors, the
degenerate cases the oracle formulation shares, and the two-level
(hull-of-hulls) losslessness pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lyft_presto_spark.operators.hull import (
    _hull_metrics,
    convex_hull_agg,
    monotone_chain,
)


class TestMonotoneChain:
    def test_square_with_interior_point(self):
        hull = monotone_chain([0, 4, 4, 0, 2], [0, 0, 4, 4, 2])
        assert set(hull) == {(0, 0), (4, 0), (4, 4), (0, 4)}
        area, perim, nvert = _hull_metrics(hull)
        assert (area, perim, nvert) == (16.0, 16.0, 4)

    def test_collinear_boundary_points_are_kept(self):
        # (2, 0) sits on the bottom edge: kept as a vertex (matches the
        # oracle's interior-collinear edge split).
        hull = monotone_chain([0, 2, 4, 4, 0], [0, 0, 0, 4, 4])
        assert (2, 0) in hull
        area, perim, nvert = _hull_metrics(hull)
        assert area == 16.0
        assert nvert == 5

    def test_degenerate_point_and_segment(self):
        assert _hull_metrics(monotone_chain([1], [2])) == (0.0, 0.0, 1)
        # Segment: out-and-back cycle, area 0, perimeter 2 x length.
        area, perim, nvert = _hull_metrics(monotone_chain([0, 3], [0, 4]))
        assert (area, perim, nvert) == (0.0, 10.0, 2)
        # All-collinear: interior collinear points stay, traversed both ways.
        area, perim, nvert = _hull_metrics(monotone_chain([0, 1, 3], [0, 1, 3]))
        assert area == 0.0
        assert perim == pytest.approx(2 * (3**2 + 3**2) ** 0.5)
        assert nvert == 4  # a, mid, b, mid

    def test_duplicates_dedup(self):
        hull = monotone_chain([0, 0, 4, 4], [0, 0, 0, 4])
        assert len(hull) == 3


class TestConvexHullAgg:
    def test_hull_of_hulls_is_lossless(self, spark):
        """The mapInPandas pre-reduction must not change the result: compare
        against the same aggregate computed over a single partition."""
        import random

        rng = random.Random(7)
        rows = [(i % 3, float(rng.randint(0, 1000)), float(rng.randint(0, 1000))) for i in range(600)]
        df = spark.createDataFrame(rows, "grp bigint, x double, y double")
        many = {tuple(r) for r in convex_hull_agg(df.repartition(13), "grp", "x", "y").collect()}
        one = {tuple(r) for r in convex_hull_agg(df.coalesce(1), "grp", "x", "y").collect()}
        assert many == one
        assert len(many) == 3

    def test_known_square_group(self, spark):
        df = spark.createDataFrame(
            [(1, 0.0, 0.0), (1, 4.0, 0.0), (1, 4.0, 4.0), (1, 0.0, 4.0), (1, 2.0, 2.0)],
            "grp bigint, x double, y double",
        )
        row = convex_hull_agg(df, "grp", "x", "y").collect()[0]
        assert row.hull_area == 16.0
        assert row.hull_perimeter == 16.0
        assert row.hull_vertices == 4
        assert (row.env_xmin, row.env_ymax) == (0.0, 4.0)
        assert row.n_points == 5

    def test_distinct_fast_path_matches_recount(self, spark):
        """points_are_distinct=True must give the same n_points as the
        recount path when the input really is distinct — across many
        partitions (partial counts merge through the single shuffle)."""
        rows = [(i % 2, float(i), float(i * i % 97)) for i in range(200)]
        df = spark.createDataFrame(rows, "grp bigint, x double, y double").repartition(9)
        fast = {tuple(r) for r in convex_hull_agg(df, "grp", "x", "y", points_are_distinct=True).collect()}
        slow = {tuple(r) for r in convex_hull_agg(df, "grp", "x", "y").collect()}
        assert fast == slow

    def test_recount_path_dedups_cross_partition(self, spark):
        """Default path: a point duplicated across partitions counts once."""
        rows = [(1, 0.0, 0.0), (1, 4.0, 0.0), (1, 4.0, 4.0), (1, 0.0, 0.0)]
        df = spark.createDataFrame(rows, "grp bigint, x double, y double").repartition(4)
        row = convex_hull_agg(df, "grp", "x", "y").collect()[0]
        assert row.n_points == 3

    def test_no_collect_in_plan(self, spark):
        # Sanity: the aggregate is a plan, not a driver-side computation —
        # building it must not trigger any job.
        df = spark.createDataFrame([(1, 0.0, 0.0)], "grp bigint, x double, y double")
        out = convex_hull_agg(df, "grp", "x", "y")
        assert "hull_area" in out.columns
