"""Property-based guards for the r5 geometry kernels.

The pure-Python kernels (Sutherland-Hodgman clip, monotone-chain hull,
Douglas-Peucker simplify) are tested directly with hypothesis — hundreds
of examples with no Spark round-trip. The codegen DE-9IM matrix is tested
against the direct envelope primitives over a seeded random batch
evaluated in ONE Spark job (per-example Spark calls would take minutes).
"""

from __future__ import annotations

import math
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lyft_presto_spark.functions import geo as G
from lyft_presto_spark.operators.geo_scalar import (
    _clip_one,
    _hull_one,
    _simplify_one,
)


def _ring(*pts):
    return [{"x": float(x), "y": float(y)} for x, y in pts]


def _area(ring) -> float:
    xy = [(p["x"], p["y"]) for p in ring]
    return (
        abs(
            sum(
                xy[i][0] * xy[(i + 1) % len(xy)][1]
                - xy[(i + 1) % len(xy)][0] * xy[i][1]
                for i in range(len(xy))
            )
        )
        / 2
    )


# Random convex polygon: hull of random integer points (integer coords keep
# every orientation test exact, so properties can assert equalities).
@st.composite
def convex_polygons(draw):
    pts = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=-20, max_value=20),
                st.integers(min_value=-20, max_value=20),
            ),
            min_size=3,
            max_size=10,
            unique=True,
        )
    )
    hull = _hull_one(_ring(*pts))
    if hull is None or len(hull) < 4 or _area(hull) == 0:
        # degenerate draw (collinear) — resample via filter
        return draw(convex_polygons())
    return hull


class TestClipProperties:
    @settings(max_examples=150, deadline=None)
    @given(convex_polygons(), convex_polygons())
    def test_intersection_bounded_and_commutative(self, a, b):
        ab = _clip_one(a, b)
        ba = _clip_one(b, a)
        area_ab = _area(ab) if ab else 0.0
        area_ba = _area(ba) if ba else 0.0
        # A∩B = B∩A for convex pairs (vertex order may differ; area equal)
        assert area_ab == pytest.approx(area_ba, abs=1e-9)
        assert area_ab <= min(_area(a), _area(b)) + 1e-9

    @settings(max_examples=100, deadline=None)
    @given(convex_polygons())
    def test_self_intersection_is_identity(self, a):
        assert _area(_clip_one(a, a)) == pytest.approx(_area(a), abs=1e-9)

    @settings(max_examples=100, deadline=None)
    @given(convex_polygons(), convex_polygons())
    def test_intersection_inside_clip(self, a, b):
        # every output vertex lies inside-or-on both inputs (convex check
        # via the clip itself: clipping the result by either input is a
        # no-op on area)
        ab = _clip_one(a, b)
        if not ab or _area(ab) == 0:
            return
        assert _area(_clip_one(ab, a)) == pytest.approx(_area(ab), abs=1e-9)
        assert _area(_clip_one(ab, b)) == pytest.approx(_area(ab), abs=1e-9)


class TestHullProperties:
    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=-30, max_value=30),
                st.integers(min_value=-30, max_value=30),
            ),
            min_size=1,
            max_size=25,
        )
    )
    def test_idempotent_and_contains_points(self, pts):
        ring = _ring(*pts)
        hull = _hull_one(ring)
        again = _hull_one(hull)
        assert _area(hull) == pytest.approx(_area(again), abs=1e-9)
        if len(hull) >= 4:  # proper polygon: clipping any input point set's
            # hull by itself must not lose area, and every input point must
            # be inside-or-on (checked via bbox + support function)
            xs = [p["x"] for p in hull]
            ys = [p["y"] for p in hull]
            for p in ring:
                assert min(xs) <= p["x"] <= max(xs)
                assert min(ys) <= p["y"] <= max(ys)


class TestSimplifyProperties:
    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=-30, max_value=30),
                st.integers(min_value=-30, max_value=30),
            ),
            min_size=2,
            max_size=20,
        ),
        st.floats(min_value=0.0, max_value=10.0, allow_nan=False),
    )
    def test_subset_endpoints_monotone(self, pts, tol):
        line = _ring(*pts)
        out = _simplify_one(line, tol)
        keys = {(p["x"], p["y"]) for p in line}
        assert all((p["x"], p["y"]) in keys for p in out)  # subset of input
        assert out[0] == line[0] and out[-1] == line[-1]  # endpoints kept
        bigger = _simplify_one(line, tol + 1.0)
        assert len(bigger) <= len(out)  # monotone in tolerance


def test_relate_agrees_with_direct_predicates_batch(spark):
    """200 seeded random envelope pairs, ONE Spark job: the DE-9IM-derived
    predicates must agree with the direct envelope primitives, and the
    matrix must be transpose-symmetric."""
    rng = random.Random(20260814)
    rows = []
    for i in range(200):
        x0, y0 = rng.randint(-10, 10), rng.randint(-10, 10)
        x1, y1 = rng.randint(-10, 10), rng.randint(-10, 10)
        w0, h0 = rng.randint(1, 8), rng.randint(1, 8)
        w1, h1 = rng.randint(1, 8), rng.randint(1, 8)
        rows.append((i, float(x0), float(y0), float(x0 + w0), float(y0 + h0),
                     float(x1), float(y1), float(x1 + w1), float(y1 + h1)))
    df = spark.createDataFrame(
        rows, ["id", "ax0", "ay0", "ax1", "ay1", "bx0", "by0", "bx1", "by1"]
    )
    env_a = G.st_envelope(F.col("ax0"), F.col("ay0"), F.col("ax1"), F.col("ay1"))
    env_b = G.st_envelope(F.col("bx0"), F.col("by0"), F.col("bx1"), F.col("by1"))
    staged = df.select(
        "id",
        G.st_relate_envelopes(env_a, env_b).alias("ab"),
        G.st_relate_envelopes(env_b, env_a).alias("ba"),
        G.st_intersects_envelopes(env_a, env_b).alias("direct_intersects"),
        G.st_overlaps_envelopes(env_a, env_b).alias("direct_overlaps"),
        G.st_disjoint_envelopes(env_a, env_b).alias("direct_disjoint"),
    )
    out = staged.select(
        "id", "ab", "ba",
        (~G.st_relate_matches(F.col("ab"), "FF*FF****")).alias("rel_intersects"),
        G.st_relate_matches(F.col("ab"), "T*T***T**").alias("rel_overlaps"),
        "direct_intersects", "direct_overlaps", "direct_disjoint",
    ).collect()
    t = [0, 3, 6, 1, 4, 7, 2, 5, 8]
    for r in out:
        assert r.rel_intersects == r.direct_intersects, r
        assert r.rel_overlaps == r.direct_overlaps, r
        assert r.rel_intersects == (not r.direct_disjoint), r
        assert r.ba == "".join(r.ab[i] for i in t), r


def test_spherical_excess_matches_lhuilier_batch(spark):
    """Seeded random spherical triangles, one job: the excess-sum formula
    must match l'Huilier's theorem computed in plain Python."""
    rng = random.Random(99)
    rows = []
    for i in range(100):
        lon0, lat0 = rng.uniform(-150, 150), rng.uniform(-55, 55)
        d, e = rng.uniform(0.5, 10), rng.uniform(0.5, 10)
        rows.append((i, lon0, lat0, d, e))
    df = spark.createDataFrame(rows, ["id", "lon0", "lat0", "d", "e"])
    v1 = G.st_point(F.col("lon0"), F.col("lat0"))
    v2 = G.st_point(F.col("lon0") + F.col("d"), F.col("lat0"))
    v3 = G.st_point(F.col("lon0"), F.col("lat0") + F.col("e"))
    got = {
        r.id: r.ex
        for r in df.select(
            "id", G.st_spherical_excess(F.array(v1, v2, v3, v1)).alias("ex")
        ).collect()
    }

    def angle(p, q):
        (l1, f1), (l2, f2) = p, q
        f1, f2 = math.radians(f1), math.radians(f2)
        dl = math.radians(l2 - l1)
        h = math.sin((f2 - f1) / 2) ** 2 + math.cos(f1) * math.cos(f2) * math.sin(dl / 2) ** 2
        return 2 * math.asin(math.sqrt(h))

    for i, lon0, lat0, d, e in rows:
        p1, p2, p3 = (lon0, lat0), (lon0 + d, lat0), (lon0, lat0 + e)
        a, b, c = angle(p2, p3), angle(p1, p3), angle(p1, p2)
        s = (a + b + c) / 2
        ex = 4 * math.atan(
            math.sqrt(
                max(
                    0.0,
                    math.tan(s / 2)
                    * math.tan((s - a) / 2)
                    * math.tan((s - b) / 2)
                    * math.tan((s - c) / 2),
                )
            )
        )
        assert got[i] == pytest.approx(ex, rel=1e-9), (i, lon0, lat0, d, e)


def test_polygon_pair_predicates_rect_batch(spark):
    """150 seeded random INTEGER rectangle pairs, ONE Spark job: the
    composed polygon-pair predicates (edge crossing + vertex containment +
    convex-centroid + mutual covering) must agree with exact interval
    arithmetic, which for axis-aligned rectangles decides every OGC
    relation in closed form. Integer coordinates keep all orientation
    tests exact, so agreement is equality, not approximation."""
    rng = random.Random(20260814)
    rows = []
    for i in range(150):
        ax0, ay0 = rng.randint(-8, 8), rng.randint(-8, 8)
        aw, ah = rng.randint(1, 6), rng.randint(1, 6)
        # Bias toward contact: half the pairs start from A's corners/edges.
        if rng.random() < 0.5:
            bx0 = ax0 + rng.choice([-3, 0, aw - 1, aw, aw + 1])
            by0 = ay0 + rng.choice([-3, 0, ah - 1, ah, ah + 1])
        else:
            bx0, by0 = rng.randint(-8, 8), rng.randint(-8, 8)
        bw, bh = rng.randint(1, 6), rng.randint(1, 6)
        rows.append(
            (i, float(ax0), float(ay0), float(ax0 + aw), float(ay0 + ah),
             float(bx0), float(by0), float(bx0 + bw), float(by0 + bh))
        )
    df = spark.createDataFrame(
        rows, ["id", "ax0", "ay0", "ax1", "ay1", "bx0", "by0", "bx1", "by1"]
    )

    def rect(x0, y0, x1, y1):
        c = lambda n: F.col(n)  # noqa: E731
        return F.array(
            G.st_point(c(x0), c(y0)), G.st_point(c(x1), c(y0)),
            G.st_point(c(x1), c(y1)), G.st_point(c(x0), c(y1)),
            G.st_point(c(x0), c(y0)),
        )

    ra = rect("ax0", "ay0", "ax1", "ay1")
    rb = rect("bx0", "by0", "bx1", "by1")
    staged = df.select(
        "id", "ax0", "ay0", "ax1", "ay1", "bx0", "by0", "bx1", "by1",
        ra.alias("ra"), rb.alias("rb"),
    ).select(
        "*",
        G.st_covers_polygon(F.col("ra"), F.col("rb")).alias("cab"),
        G.st_covers_polygon(F.col("rb"), F.col("ra")).alias("cba"),
    )
    out = staged.select(
        "id", "ax0", "ay0", "ax1", "ay1", "bx0", "by0", "bx1", "by1",
        "cab", "cba",
        G.st_intersects_polygons(F.col("ra"), F.col("rb")).alias("ints"),
        G.st_touches_polygons(F.col("ra"), F.col("rb")).alias("tch"),
        G.st_polygon_pair_interiors_intersect(
            F.col("ra"), F.col("rb"), covers=(F.col("cab"), F.col("cba"))
        ).alias("ii"),
    ).collect()
    for r in out:
        want_ints = (
            r.ax0 <= r.bx1 and r.bx0 <= r.ax1
            and r.ay0 <= r.by1 and r.by0 <= r.ay1
        )
        want_ii = (
            r.ax0 < r.bx1 and r.bx0 < r.ax1
            and r.ay0 < r.by1 and r.by0 < r.ay1
        )
        want_cab = (
            r.ax0 <= r.bx0 and r.bx1 <= r.ax1
            and r.ay0 <= r.by0 and r.by1 <= r.ay1
        )
        want_cba = (
            r.bx0 <= r.ax0 and r.ax1 <= r.bx1
            and r.by0 <= r.ay0 and r.ay1 <= r.by1
        )
        assert r.ints == want_ints, r
        assert r.ii == want_ii, r
        assert r.cab == want_cab, r
        assert r.cba == want_cba, r
        assert r.tch == (want_ints and not want_ii), r
