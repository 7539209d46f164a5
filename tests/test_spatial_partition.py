"""Data-adaptive spatial partitioning (operators/spatial_partition.py) — the
spatial_partitioning/KdbTree analog (KdbTree.java:272,
SpatialPartitioningAggregateFunction.java:29): split semantics, codegen
expression fidelity, candidate completeness, and the bounded-occupancy
property the fixed grid lacks on clustered data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lyft_presto_spark.operators.spatial_partition import (
    build_kdb_tree,
    learn_partitioning,
)

INF = float("inf")


def _grid_points(n: int) -> list[tuple[float, float]]:
    return [(float(i % n), float(i // n)) for i in range(n * n)]


def _clustered_points() -> list[tuple[float, float]]:
    """Three dense urban clusters + sparse rural background: the shape a
    fixed-width grid handles badly (one cell swallows a whole cluster)."""
    pts = []
    for cx, cy, k in ((2.0, 2.0, 400), (2.5, 2.2, 300), (50.0, 40.0, 300)):
        pts += [
            (cx + (i * 7 % 97) / 1000.0, cy + (i * 13 % 89) / 1000.0)
            for i in range(k)
        ]
    pts += [(float(i * 17 % 360) - 180.0, float(i * 23 % 160) - 80.0) for i in range(100)]
    return pts


class TestBuildKdbTree:
    def test_leaves_partition_the_plane(self):
        part = build_kdb_tree(_grid_points(10), max_items_per_node=10)
        # Outer border is infinite and leaf rectangles tile: every probe point
        # (on- and off-sample) lands in exactly one leaf under the half-open
        # (xmin, xmax] convention the descent uses.
        probes = [(x / 3.0 - 5, y / 3.0 - 5) for x in range(40) for y in range(40)]
        for p in probes:
            hits = [
                lf
                for lf in part.leaves
                if lf.xmin < p[0] <= lf.xmax and lf.ymin < p[1] <= lf.ymax
            ]
            assert len(hits) == 1
            assert part.leaf_id_for_point(*p) == hits[0].leaf_id

    def test_max_items_per_leaf_honored(self):
        pts = _clustered_points()
        part = build_kdb_tree(pts, max_items_per_node=50)
        from collections import Counter

        occupancy = Counter(part.leaf_id_for_point(*p) for p in pts)
        assert max(occupancy.values()) <= 50

    def test_duplicate_coordinates_dont_loop(self):
        # All-identical points can never split: single leaf, no recursion.
        part = build_kdb_tree([(1.0, 2.0)] * 500, max_items_per_node=10)
        assert len(part.leaves) == 1
        assert part.leaf_id_for_point(1.0, 2.0) == 0

    def test_one_axis_constant(self):
        # x constant: splits must fall back to y (KdbTree trySplit fallback).
        pts = [(5.0, float(i)) for i in range(100)]
        part = build_kdb_tree(pts, max_items_per_node=10)
        assert len(part.leaves) > 1
        ids = {part.leaf_id_for_point(*p) for p in pts}
        assert len(ids) == len(part.leaves)


class TestCompiledExpressions:
    def test_leaf_id_expr_matches_python_descent(self, spark):
        pts = _clustered_points()
        part = build_kdb_tree(pts, max_items_per_node=40)
        probe = pts[::7] + [(-179.9, -79.9), (179.9, 79.9), (2.25, 2.15)]
        df = spark.createDataFrame(probe, "x double, y double")
        got = (
            df.select("x", "y", part.leaf_id_expr(F.col("x"), F.col("y")).alias("leaf"))
            .collect()
        )
        for r in got:
            assert r.leaf == part.leaf_id_for_point(r.x, r.y), (r.x, r.y)

    def test_covering_contains_every_member_points_leaf(self, spark):
        """Candidate completeness: if a point is strictly inside a zone
        envelope, the point's leaf is among the zone's covering leaves —
        the invariant that makes the leaf equi-join lossless."""
        pts = _clustered_points()
        part = build_kdb_tree(pts, max_items_per_node=40)
        zones = [(2.0, 2.0, 1.0, 0.8), (50.2, 40.1, 0.5, 0.5), (0.0, 0.0, 60.0, 50.0)]
        zdf = spark.createDataFrame(zones, "cx double, cy double, hw double, hh double")
        rows = zdf.select(
            "cx",
            "cy",
            "hw",
            "hh",
            part.covering_leaf_ids_expr(
                F.col("cx") - F.col("hw"),
                F.col("cy") - F.col("hh"),
                F.col("cx") + F.col("hw"),
                F.col("cy") + F.col("hh"),
            ).alias("leaves"),
        ).collect()
        for r in rows:
            cover = set(r.leaves)
            for p in pts:
                if abs(p[0] - r.cx) < r.hw and abs(p[1] - r.cy) < r.hh:
                    assert part.leaf_id_for_point(*p) in cover

    def test_expressions_are_codegen_no_udf(self, spark):
        part = build_kdb_tree(_clustered_points(), max_items_per_node=40)
        df = spark.range(10).select(
            (F.col("id") * 1.0).alias("x"), (F.col("id") * 2.0).alias("y")
        )
        out = df.select(
            part.leaf_id_expr(F.col("x"), F.col("y")).alias("leaf"),
            part.covering_leaf_ids_expr(
                F.col("x"), F.col("y"), F.col("x") + 1, F.col("y") + 1
            ).alias("cover"),
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestAdaptiveVsFixedGrid:
    def test_bounded_occupancy_on_clustered_data(self):
        """The headline property: on clustered geodata the learned leaves
        bound per-partition candidate counts where a fixed 10-degree grid
        concentrates the clusters into one cell."""
        import math
        from collections import Counter

        pts = _clustered_points()
        fixed = Counter(
            (math.floor(x / 10.0), math.floor(y / 10.0)) for x, y in pts
        )
        part = build_kdb_tree(pts, max_items_per_node=64)
        learned = Counter(part.leaf_id_for_point(*p) for p in pts)
        # Two co-located clusters (700 points) share one fixed cell; learned
        # leaves stay at or under the split threshold.
        assert max(fixed.values()) >= 700
        assert max(learned.values()) <= 64


class TestLearnPartitioning:
    def test_learn_is_deterministic_and_bounded(self, spark):
        df = spark.range(2000).select(
            F.col("id").alias("k"),
            ((F.col("id") * 7919) % 360 - 180.0).cast("double").alias("x"),
            ((F.col("id") * 104729) % 160 - 80.0).cast("double").alias("y"),
        )
        a = learn_partitioning(df, "x", "y", sample_key="k", sample_mod=5, max_items_per_node=32)
        b = learn_partitioning(df, "x", "y", sample_key="k", sample_mod=5, max_items_per_node=32)
        assert a.leaves == b.leaves  # deterministic hash-sample, same tree

    def test_empty_sample_raises(self, spark):
        df = spark.range(0).select(
            F.col("id").alias("k"),
            F.col("id").cast("double").alias("x"),
            F.col("id").cast("double").alias("y"),
        )
        with pytest.raises(ValueError, match="empty sample"):
            learn_partitioning(df, "x", "y", sample_key="k")


class TestPartitionCount:
    def test_partition_count_bounds_leaves(self, spark):
        """Leaf count must track partition_count, not sample size — the tree
        compiles into a plan-side expression, so leaves are a bounded knob."""
        df = spark.range(20000).select(
            F.col("id").alias("k"),
            ((F.col("id") * 7919) % 3600 / 10.0 - 180.0).cast("double").alias("x"),
            ((F.col("id") * 104729) % 1600 / 10.0 - 80.0).cast("double").alias("y"),
        )
        part = learn_partitioning(
            df, "x", "y", sample_key="k", sample_mod=1, max_sample=8192, partition_count=32
        )
        # Median splits round leaves to at most ~2x the requested count.
        assert 16 <= len(part.leaves) <= 64


class TestKdbProperties:
    """Property-based invariants over random point sets (pure Python — no
    Spark session, so these run in milliseconds)."""

    def test_random_point_sets_partition_and_bound(self):
        from hypothesis import given, settings, strategies as st

        coord = st.integers(min_value=-1000, max_value=1000)
        pts_strategy = st.lists(
            st.tuples(coord, coord), min_size=1, max_size=300
        )

        @settings(max_examples=60, deadline=None)
        @given(pts_strategy, st.integers(min_value=1, max_value=40))
        def prop(raw, max_items):
            pts = [(float(x), float(y)) for x, y in raw]
            part = build_kdb_tree(pts, max_items_per_node=max_items)
            # 1. Every input point descends to exactly one leaf whose
            #    rectangle contains it under the half-open convention.
            from collections import Counter

            occ = Counter()
            for p in pts:
                lid = part.leaf_id_for_point(*p)
                lf = part.leaves[lid]
                assert lf.xmin < p[0] <= lf.xmax or (
                    lf.xmin == float("-inf") and p[0] <= lf.xmax
                )
                assert lf.ymin < p[1] <= lf.ymax or (
                    lf.ymin == float("-inf") and p[1] <= lf.ymax
                )
                occ[lid] += 1
            # 2. Occupancy bound holds wherever a split was possible. A leaf
            #    may only exceed max_items when BOTH axes are unsplittable —
            #    the median-up values all equal (KdbTree.trySplit's skip-
            #    duplicates rule), exactly the reference's fallback-to-leaf.
            def unsplittable(vals):
                s = sorted(vals)
                mid = (len(s) - 1) // 2
                return all(v == s[mid] for v in s[mid:])

            for lid, cnt in occ.items():
                if cnt > max_items:
                    members = [
                        p for p in pts if part.leaf_id_for_point(*p) == lid
                    ]
                    assert unsplittable([m[0] for m in members])
                    assert unsplittable([m[1] for m in members])

        prop()

    def test_leaf_ids_are_dense(self):
        part = build_kdb_tree(_clustered_points(), max_items_per_node=25)
        assert sorted(lf.leaf_id for lf in part.leaves) == list(range(len(part.leaves)))
