"""General polygon boolean ops (operators/polygon_overlay.py + the
geo_scalar UDF surface) — reference stUnion/stIntersection/stDifference/
stSymDifference (GeoFunctions.java:675,1019,1089,1099), polygon case.

The oracle strategy is layered independence:
- closed-form axis-aligned cases (areas derivable by hand),
- the Sutherland-Hodgman convex clipper (an independent algorithm already
  in-repo) on random convex pairs,
- algebraic identities (|A∩B| + |A∪B| = |A| + |B|, etc.) on random pairs
  the closed forms can't cover.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lyft_presto_spark.operators.geo_scalar import _clip_one
from lyft_presto_spark.operators.hull import monotone_chain
from lyft_presto_spark.operators.polygon_overlay import (
    erode_polygon,
    intersection_any,
    intersection_pieces,
    overlay,
    polygon_area,
)


def ring(*pts):
    return [{"x": float(x), "y": float(y)} for x, y in pts]


SQ1 = [ring((0, 0), (2, 0), (2, 2), (0, 2))]  # area 4
SQ2 = [ring((1, 1), (3, 1), (3, 3), (1, 3))]  # area 4, overlap 1
L = [ring((0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3))]  # area 5


def area(a, b, op):
    return polygon_area(overlay(a, b, op))


class TestClosedForm:
    def test_overlapping_squares(self):
        assert area(SQ1, SQ2, "intersection") == pytest.approx(1.0)
        assert area(SQ1, SQ2, "union") == pytest.approx(7.0)
        assert area(SQ1, SQ2, "difference") == pytest.approx(3.0)
        assert area(SQ1, SQ2, "symdifference") == pytest.approx(6.0)
        assert len(overlay(SQ1, SQ2, "symdifference")) == 2  # two parts

    def test_disjoint(self):
        far = [ring((10, 10), (11, 10), (11, 11), (10, 11))]
        assert overlay(SQ1, far, "intersection") == []
        u = overlay(SQ1, far, "union")
        assert len(u) == 2 and polygon_area(u) == pytest.approx(5.0)

    def test_containment_and_hole_creation(self):
        big = [ring((0, 0), (10, 0), (10, 10), (0, 10))]
        inner = [ring((2, 2), (4, 2), (4, 4), (2, 4))]
        assert area(big, inner, "intersection") == pytest.approx(4.0)
        assert area(big, inner, "union") == pytest.approx(100.0)
        d = overlay(big, inner, "difference")
        assert polygon_area(d) == pytest.approx(96.0)
        assert len(d) == 1 and len(d[0]) == 2  # outer + the created hole

    def test_identical_and_adjacent(self):
        assert area(SQ1, SQ1, "intersection") == pytest.approx(4.0)
        assert overlay(SQ1, SQ1, "symdifference") == []
        adj = [ring((2, 0), (4, 0), (4, 2), (2, 2))]
        # edge-adjacency: area-geometry contract drops the shared-edge line
        assert overlay(SQ1, adj, "intersection") == []
        u = overlay(SQ1, adj, "union")
        assert len(u) == 1 and polygon_area(u) == pytest.approx(8.0)

    def test_nonconvex_L(self):
        s = [ring((0.5, 0.5), (2.5, 0.5), (2.5, 2.5), (0.5, 2.5))]
        assert area(L, s, "intersection") == pytest.approx(1.75)
        assert area(L, s, "union") == pytest.approx(5 + 4 - 1.75)

    def test_union_creates_hole(self):
        # U-shape (area 7) + cap (area 3): union 10 with one interior ring
        u_shape = [ring((0, 0), (3, 0), (3, 3), (2, 3), (2, 1), (1, 1), (1, 3), (0, 3))]
        cap = [ring((0, 3), (3, 3), (3, 4), (0, 4))]
        u = overlay(u_shape, cap, "union")
        assert polygon_area(u) == pytest.approx(10.0)
        assert len(u) == 1 and len(u[0]) == 2

    def test_point_touch_pinch(self):
        t1 = [ring((0, 0), (2, 0), (1, 1))]
        t2 = [ring((1, 1), (0, 2), (2, 2))]
        assert overlay(t1, t2, "intersection") == []
        u = overlay(t1, t2, "union")
        assert len(u) == 2 and polygon_area(u) == pytest.approx(2.0)

    def test_holed_inputs(self):
        A = [ring((0, 0), (10, 0), (10, 10), (0, 10)), ring((4, 4), (4, 6), (6, 6), (6, 4))]
        B = [ring((-1, 4.5), (11, 4.5), (11, 5.5), (-1, 5.5))]
        assert area(A, B, "intersection") == pytest.approx(8.0)
        assert area(A, B, "union") == pytest.approx(100.0)
        d = overlay(A, B, "difference")
        assert polygon_area(d) == pytest.approx(88.0) and len(d) == 2

    def test_union_plugs_hole(self):
        A = [ring((0, 0), (10, 0), (10, 10), (0, 10)), ring((4, 4), (4, 6), (6, 6), (6, 4))]
        plug = [ring((3, 3), (7, 3), (7, 7), (3, 7))]
        u = overlay(A, plug, "union")
        assert polygon_area(u) == pytest.approx(100.0)
        assert [len(p) for p in u] == [1]  # hole gone

    def test_null_and_degenerate(self):
        assert overlay(None, SQ1, "union") is None
        assert overlay(SQ1, None, "intersection") is None
        # degenerate operand (zero-area ring) acts as the empty region
        sliver = [ring((0, 0), (5, 0), (0, 0))]
        assert overlay(SQ1, sliver, "intersection") == []
        assert area(SQ1, sliver, "union") == pytest.approx(4.0)
        with pytest.raises(ValueError):
            overlay(SQ1, SQ2, "nope")

    def test_output_orientation(self):
        d = overlay(
            [ring((0, 0), (10, 0), (10, 10), (0, 10))],
            [ring((2, 2), (4, 2), (4, 4), (2, 4))],
            "difference",
        )
        for rings in d:
            for i, r in enumerate(rings):
                pts = [(p["x"], p["y"]) for p in r]
                assert pts[0] == pts[-1]  # closed
                pts = pts[:-1]
                s = sum(
                    pts[i][0] * pts[(i + 1) % len(pts)][1]
                    - pts[(i + 1) % len(pts)][0] * pts[i][1]
                    for i in range(len(pts))
                )
                assert (s > 0) == (i == 0)  # outer CCW, holes CW


def _rand_convex(rnd, n, cx, cy, r):
    pts = [(cx + rnd.uniform(-r, r), cy + rnd.uniform(-r, r)) for _ in range(n)]
    h = monotone_chain([p[0] for p in pts], [p[1] for p in pts])
    return [{"x": x, "y": y} for x, y in h]


def _shoelace(ps):
    ps = [(p["x"], p["y"]) for p in ps]
    if len(ps) >= 2 and ps[0] == ps[-1]:
        ps = ps[:-1]
    return (
        abs(
            sum(
                ps[i][0] * ps[(i + 1) % len(ps)][1] - ps[(i + 1) % len(ps)][0] * ps[i][1]
                for i in range(len(ps))
            )
        )
        / 2
    )


class TestCrossCheckAndIdentities:
    @given(seed=st.integers(0, 10_000))
    @settings(max_examples=60, deadline=None)
    def test_convex_matches_sutherland_hodgman(self, seed):
        rnd = random.Random(seed)
        a = _rand_convex(rnd, 8, 0, 0, 3)
        b = _rand_convex(rnd, 8, rnd.uniform(-2, 2), rnd.uniform(-2, 2), 3)
        if len(a) < 4 or len(b) < 4:  # open hulls with <3 distinct corners
            return
        got = area([a], [b], "intersection")
        clip = _clip_one(a, b)
        exp = _shoelace(clip) if clip else 0.0
        assert got == pytest.approx(exp, abs=1e-7)

    @given(seed=st.integers(0, 10_000))
    @settings(max_examples=40, deadline=None)
    def test_area_identities(self, seed):
        rnd = random.Random(seed)
        # holed non-convex A vs random rectangle B — outside the convex
        # clipper's reach, so identities are the oracle here
        hx, hy = rnd.uniform(1, 6), rnd.uniform(1, 6)
        A = [
            ring((0, 0), (8, 0), (8, 8), (0, 8)),
            ring((hx, hy), (hx, hy + 1.5), (hx + 1.5, hy + 1.5), (hx + 1.5, hy)),
        ]
        x1, y1 = rnd.uniform(-2, 7), rnd.uniform(-2, 7)
        w, h = rnd.uniform(0.5, 6), rnd.uniform(0.5, 6)
        B = [ring((x1, y1), (x1 + w, y1), (x1 + w, y1 + h), (x1, y1 + h))]
        a_area, b_area = 64 - 2.25, w * h
        inter = area(A, B, "intersection")
        union = area(A, B, "union")
        diff = area(A, B, "difference")
        sym = area(A, B, "symdifference")
        assert inter + union == pytest.approx(a_area + b_area, abs=1e-8)
        assert diff == pytest.approx(a_area - inter, abs=1e-8)
        assert sym == pytest.approx(union - inter, abs=1e-8)
        # commutativity
        assert area(B, A, "intersection") == pytest.approx(inter, abs=1e-8)
        assert area(B, A, "union") == pytest.approx(union, abs=1e-8)


class TestSparkSurface:
    def test_udf_surface(self, spark):
        from lyft_presto_spark.functions.geo import st_multipolygon_area
        from lyft_presto_spark.operators import geo_scalar as GS

        df = spark.createDataFrame(
            [(SQ1, SQ2), (SQ1, None)],
            "a: array<array<struct<x:double,y:double>>>, b: array<array<struct<x:double,y:double>>>",
        )
        out = df.select(
            st_multipolygon_area(GS.st_intersection_geom(F.col("a"), F.col("b"))).alias("i"),
            st_multipolygon_area(GS.st_union_geom(F.col("a"), F.col("b"))).alias("u"),
            st_multipolygon_area(GS.st_difference_geom(F.col("a"), F.col("b"))).alias("d"),
            st_multipolygon_area(GS.st_sym_difference_geom(F.col("a"), F.col("b"))).alias("s"),
            GS.st_union_geom(F.col("a"), F.col("b")).alias("geom"),
        ).collect()
        r = out[0]
        assert (r.i, r.u, r.d, r.s) == (1.0, 7.0, 3.0, 6.0)
        # representation: closed rings of structs
        assert r.geom[0][0][0] == r.geom[0][0][-1]
        r2 = out[1]
        assert r2.i is None and r2.geom is None


class TestRelatePolygons:
    """Full DE-9IM from the arrangement (relate_polygons) vs the published
    matrices for known topologies, plus holed-polygon cases."""

    def test_known_matrices(self):
        from lyft_presto_spark.operators.polygon_overlay import relate_polygons

        A = [ring((0, 0), (4, 0), (4, 4), (0, 4))]
        cases = [
            ([ring((1, 1), (3, 1), (3, 3), (1, 3))], "212FF1FF2"),  # contains
            ([ring((3, 3), (5, 3), (5, 5), (3, 5))], "212101212"),  # overlaps
            ([ring((4, 4), (6, 4), (6, 6), (4, 6))], "FF2F01212"),  # corner
            ([ring((4, 0), (6, 0), (6, 2), (4, 2))], "FF2F11212"),  # edge
            ([ring((5, 5), (7, 5), (7, 7), (5, 7))], "FF2FF1212"),  # disjoint
            ([ring((0, 0), (0, 4), (4, 4), (4, 0))], "2FFF1FFF2"),  # equals
        ]
        for b, exp in cases:
            assert relate_polygons(A, b) == exp
            # within/containment transpose: relate(B, A) is the transpose
            got_t = relate_polygons(b, A)
            exp_t = "".join(exp[3 * (i % 3) + i // 3] for i in range(9))
            assert got_t == exp_t

    def test_holed_topologies(self):
        from lyft_presto_spark.operators.polygon_overlay import relate_polygons

        Ah = [
            ring((0, 0), (10, 0), (10, 10), (0, 10)),
            ring((3, 3), (3, 7), (7, 7), (7, 3)),
        ]
        # B inside the hole: topologically disjoint
        assert relate_polygons(Ah, [ring((4, 4), (6, 4), (6, 6), (4, 6))]) == "FF2FF1212"
        # B exactly fills the hole: boundary-to-boundary contact only
        assert relate_polygons(Ah, [ring((3, 3), (7, 3), (7, 7), (3, 7))]) == "FF2F112F2"
        # B overlaps the hole edge into the solid part
        m = relate_polygons(Ah, [ring((2, 4), (5, 4), (5, 6), (2, 6))])
        assert m[0] == "2" and m[4] in "01"

    def test_degenerate_and_null(self):
        from lyft_presto_spark.operators.polygon_overlay import relate_polygons

        A = [ring((0, 0), (4, 0), (4, 4), (0, 4))]
        assert relate_polygons(None, A) is None
        assert relate_polygons(A, [ring((0, 0), (5, 0), (0, 0))]) is None

    def test_predicate_consistency_random(self):
        import random

        from lyft_presto_spark.operators.polygon_overlay import (
            overlay,
            polygon_area,
            relate_polygons,
        )

        rnd = random.Random(3)
        for _ in range(120):
            x0, y0 = rnd.randint(0, 6), rnd.randint(0, 6)
            s = rnd.randint(1, 4)
            A = [ring((0, 0), (4, 0), (4, 4), (0, 4))]
            B = [ring((x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s))]
            m = relate_polygons(A, B)
            inter = polygon_area(overlay(A, B, "intersection"))
            # II cell agrees with the boolean op's area
            assert (m[0] == "2") == (inter > 0)
            # disjoint pattern FF*FF**** iff no contact at all
            disjoint = m[0] == "F" and m[1] == "F" and m[3] == "F" and m[4] == "F"
            union = overlay(A, B, "union")
            touches_or_more = len(union) == 1 or inter > 0
            if disjoint:
                assert not inter > 0


class TestRelateLinePolygon:
    """Mixed-dimension DE-9IM (relate_line_polygon) vs published matrices."""

    P = [ring((0, 0), (4, 0), (4, 4), (0, 4))]

    def test_known_matrices(self):
        from lyft_presto_spark.operators.polygon_overlay import relate_line_polygon

        cases = [
            (ring((-1, 2), (5, 2)), "101FF0212"),   # crossing through
            (ring((1, 1), (3, 3)), "1FF0FF212"),    # fully inside
            (ring((0, 0), (4, 0)), "F1FF0F212"),    # along a boundary edge
            (ring((4, 4), (6, 6)), "FF1F00212"),    # endpoint corner touch
            (ring((5, 5), (7, 7)), "FF1FF0212"),    # disjoint
            (ring((2, 2), (4, 2)), "1FF00F212"),    # inside to boundary
            # closed surrounding ring: empty line boundary (stBoundary)
            (ring((-1, -1), (5, -1), (5, 5), (-1, 5), (-1, -1)), "FF1FFF212"),
        ]
        for line, exp in cases:
            assert relate_line_polygon(line, self.P) == exp

    def test_holed_topologies(self):
        from lyft_presto_spark.operators.polygon_overlay import relate_line_polygon

        Ph = [
            ring((0, 0), (10, 0), (10, 10), (0, 10)),
            ring((3, 3), (3, 7), (7, 7), (7, 3)),
        ]
        # line inside the hole is exterior to the polygon
        assert relate_line_polygon(ring((4, 4), (6, 6)), Ph) == "FF1FF0212"
        # line crossing solid-hole-solid: interior, crossing nodes, exterior
        assert relate_line_polygon(ring((1, 5), (9, 5)), Ph) == "1010FF212"

    def test_null_and_degenerate(self):
        from lyft_presto_spark.operators.polygon_overlay import relate_line_polygon

        assert relate_line_polygon(None, self.P) is None
        assert relate_line_polygon(ring((1, 1)), self.P) is None
        assert relate_line_polygon(ring((1, 1), (2, 2)), None) is None


class TestRelateLines:
    """Line/line DE-9IM (relate_lines) vs published matrices."""

    A = ring((0, 0), (4, 0))

    def test_known_matrices(self):
        from lyft_presto_spark.operators.polygon_overlay import relate_lines

        cases = [
            (ring((2, -2), (2, 2)), "0F1FF0102"),  # proper crossing
            (ring((1, 0), (3, 0)), "101FF0FF2"),   # collinear contained
            (ring((0, 0), (4, 0)), "1FFF0FFF2"),   # equal
            (ring((4, 0), (6, 0)), "FF1F00102"),   # endpoint touch
            (ring((6, 0), (8, 0)), "FF1FF0102"),   # disjoint
            (ring((2, 0), (2, 3)), "F01FF0102"),   # T-junction
        ]
        for b, exp in cases:
            assert relate_lines(self.A, b) == exp
            # transpose symmetry
            exp_t = "".join(exp[3 * (i % 3) + i // 3] for i in range(9))
            assert relate_lines(b, self.A) == exp_t

    def test_closed_ring_operand(self):
        from lyft_presto_spark.operators.polygon_overlay import relate_lines

        sq = ring((0, 0), (4, 0), (4, 4), (0, 4), (0, 0))
        # closed ring: empty boundary row; crossing line meets at a node
        assert relate_lines(sq, ring((2, -2), (2, 2))) == "0F1FFF102"

    def test_null_and_degenerate(self):
        from lyft_presto_spark.operators.polygon_overlay import relate_lines

        assert relate_lines(None, self.A) is None
        assert relate_lines(self.A, ring((1, 1))) is None


class TestClipLineToPolygon:
    """ST_Intersection(line, polygon) — clip_line_to_polygon."""

    P = [ring((0, 0), (4, 0), (4, 4), (0, 4))]

    def _len(self, ml):
        import math

        return sum(
            math.hypot(s[i + 1]["x"] - s[i]["x"], s[i + 1]["y"] - s[i]["y"])
            for s in ml
            for i in range(len(s) - 1)
        )

    def test_basic_cases(self):
        import math

        from lyft_presto_spark.operators.polygon_overlay import clip_line_to_polygon

        r = clip_line_to_polygon(ring((-1, 2), (5, 2)), self.P)
        assert len(r) == 1 and self._len(r) == pytest.approx(4.0)
        r = clip_line_to_polygon(ring((1, 1), (3, 3)), self.P)
        assert self._len(r) == pytest.approx(math.sqrt(8))
        assert clip_line_to_polygon(ring((5, 5), (7, 7)), self.P) == []
        # boundary-collinear piece kept (closed-region semantics)
        r = clip_line_to_polygon(ring((0, 0), (4, 0)), self.P)
        assert self._len(r) == pytest.approx(4.0)
        # zigzag: two parts
        r = clip_line_to_polygon(ring((1, -1), (1, 5), (3, -1)), self.P)
        assert len(r) == 2
        assert self._len(r) == pytest.approx(4 + math.hypot(4 / 3, 4))

    def test_holed(self):
        from lyft_presto_spark.operators.polygon_overlay import clip_line_to_polygon

        Ph = [
            ring((0, 0), (10, 0), (10, 10), (0, 10)),
            ring((3, 3), (3, 7), (7, 7), (7, 3)),
        ]
        r = clip_line_to_polygon(ring((1, 5), (9, 5)), Ph)
        assert len(r) == 2 and self._len(r) == pytest.approx(4.0)

    def test_null(self):
        from lyft_presto_spark.operators.polygon_overlay import clip_line_to_polygon

        assert clip_line_to_polygon(None, self.P) is None
        assert clip_line_to_polygon(ring((1, 1), (2, 2)), None) is None


class TestRelateAnyDispatcher:
    """Generic relate dispatch (relate_any) incl. transposes and multi-*
    rejection."""

    def test_dispatch_and_transpose(self):
        from lyft_presto_spark.operators.polygon_overlay import (
            _transpose_de9im,
            relate_any,
        )

        def G(tag, **kw):
            base = {"tag": tag, "point": None, "line": None, "polygon": None}
            base.update(kw)
            return base

        P = G("ST_Polygon", polygon=[ring((0, 0), (4, 0), (4, 4), (0, 4))])
        L = G("ST_LineString", line=ring((-1, 2), (5, 2)))
        p_in = G("ST_Point", point={"x": 2.0, "y": 2.0})
        assert relate_any(p_in, p_in) == "0FFFFFFF2"
        assert relate_any(p_in, P) == "0FFFFF212"
        assert relate_any(P, p_in) == _transpose_de9im("0FFFFF212")
        assert relate_any(L, P) == "101FF0212"
        assert relate_any(P, L) == _transpose_de9im("101FF0212")
        # line vs point: on-interior / at-endpoint / off
        p_onl = G("ST_Point", point={"x": 0.0, "y": 2.0})
        p_end = G("ST_Point", point={"x": -1.0, "y": 2.0})
        p_off = G("ST_Point", point={"x": 9.0, "y": 9.0})
        assert relate_any(L, p_onl) == "0F1FF0FF2"
        assert relate_any(L, p_end) == "FF10F0FF2"
        assert relate_any(L, p_off) == "FF1FF00F2"
        assert relate_any(p_onl, L) == _transpose_de9im("0F1FF0FF2")
        # multi-* operands: documented NULL
        assert relate_any(G("ST_MultiPoint"), P) is None
        assert relate_any(None, P) is None


class TestBufferLine:
    """stBuffer for LINESTRINGs (buffer_line): stadium fold through the
    overlay, cap convention shared with st_buffer_point."""

    def test_straight_closed_form(self):
        import math

        from lyft_presto_spark.operators.polygon_overlay import (
            buffer_line,
            polygon_area,
        )

        m, r = 8, 0.5
        for L, pts in [(4.0, ring((0, 0), (4, 0))), (5.0, ring((0, 0), (3, 4)))]:
            b = buffer_line(pts, r, m)
            exp = 2 * r * L + m * r * r * math.sin(math.pi / m)
            assert polygon_area([b]) == pytest.approx(exp, abs=1e-9)
            assert b[0][0] == b[0][-1]  # closed ring

    def test_right_angle_vs_independent_clip(self):
        import math

        from lyft_presto_spark.operators.polygon_overlay import (
            buffer_line,
            polygon_area,
        )

        m, r = 8, 0.5

        def stadium_pts(a, b):
            th = math.atan2(b[1] - a[1], b[0] - a[0])
            out = []
            for k in range(m + 1):
                ang = th - math.pi / 2 + math.pi * k / m
                out.append({"x": b[0] + r * math.cos(ang), "y": b[1] + r * math.sin(ang)})
            for k in range(m + 1):
                ang = th + math.pi / 2 + math.pi * k / m
                out.append({"x": a[0] + r * math.cos(ang), "y": a[1] + r * math.sin(ang)})
            return out

        b = buffer_line(ring((0, 0), (3, 0), (3, 2)), r, m)
        s1, s2 = stadium_pts((0, 0), (3, 0)), stadium_pts((3, 0), (3, 2))
        inter = _clip_one(s1, s2)  # both stadiums convex: independent S-H
        exp = _shoelace(s1) + _shoelace(s2) - (_shoelace(inter) if inter else 0.0)
        assert polygon_area([b]) == pytest.approx(exp, abs=1e-7)

    def test_closed_ring_creates_hole(self):
        from lyft_presto_spark.operators.polygon_overlay import (
            buffer_line,
            polygon_area,
        )

        b = buffer_line(ring((0, 0), (4, 0), (4, 4), (0, 4), (0, 0)), 0.5, 8)
        assert len(b) == 2  # annulus: outer + inner hole
        # outer rounded square minus inner square: 25 - 4*(0.25) + 2m-gon
        # corner caps - hole 9
        import math

        exp = 25 - 1 + 8 * 0.25 * math.sin(math.pi / 8) - 9
        assert polygon_area([b]) == pytest.approx(exp, abs=1e-9)

    def test_null_and_degenerate(self):
        from lyft_presto_spark.operators.polygon_overlay import buffer_line

        assert buffer_line(None, 0.5) is None
        assert buffer_line(ring((1, 1)), 0.5) is None
        assert buffer_line(ring((0, 0), (1, 0)), 0.0) is None
        assert buffer_line(ring((0, 0), (1, 0)), -1.0) is None


class TestMatrixVsCodegenPredicates:
    """Cross-validation of two INDEPENDENT implementations: the DE-9IM
    matrix from the overlay arrangement (relate_polygons, exact rational)
    vs the pure-codegen composed polygon-pair predicates
    (st_intersects_polygons & co., witness-based). Every boolean the
    matrix implies must agree with the composed predicate on random and
    exact-contact integer squares."""

    def test_matrix_implies_predicates(self, spark):
        import random

        from pyspark.sql import functions as F

        from lyft_presto_spark.functions import geo as G
        from lyft_presto_spark.operators.polygon_overlay import relate_polygons

        rnd = random.Random(17)
        rows = []
        for _ in range(250):
            rows.append(
                (
                    float(rnd.randint(0, 6)), float(rnd.randint(0, 6)),
                    float(rnd.randint(1, 4)),
                    float(rnd.randint(0, 6)), float(rnd.randint(0, 6)),
                    float(rnd.randint(1, 4)),
                )
            )
        df = spark.createDataFrame(
            rows, "ax double, ay double, asz double, bx double, by double, bsz double"
        )

        def sq_ring(x, y, s):
            return F.array(
                G.st_point(x, y), G.st_point(x + s, y),
                G.st_point(x + s, y + s), G.st_point(x, y + s), G.st_point(x, y),
            )

        ra = sq_ring(F.col("ax"), F.col("ay"), F.col("asz"))
        rb = sq_ring(F.col("bx"), F.col("by"), F.col("bsz"))
        staged = df.select(
            "*",
            G.st_covers_polygon(ra, rb).alias("cab"),
            G.st_covers_polygon(rb, ra).alias("cba"),
        ).select(
            "*",
            G.st_intersects_polygons(
                sq_ring(F.col("ax"), F.col("ay"), F.col("asz")),
                sq_ring(F.col("bx"), F.col("by"), F.col("bsz")),
            ).alias("ints"),
        )
        got = staged.collect()
        for r in got:
            A = [[{"x": r.ax, "y": r.ay}, {"x": r.ax + r.asz, "y": r.ay},
                  {"x": r.ax + r.asz, "y": r.ay + r.asz}, {"x": r.ax, "y": r.ay + r.asz}]]
            B = [[{"x": r.bx, "y": r.by}, {"x": r.bx + r.bsz, "y": r.by},
                  {"x": r.bx + r.bsz, "y": r.by + r.bsz}, {"x": r.bx, "y": r.by + r.bsz}]]
            m = relate_polygons(A, B)
            mx_intersects = any(m[i] != "F" for i in (0, 1, 3, 4))
            mx_covers_ab = m[6] == "F" and m[7] == "F"  # EI and EB empty
            mx_covers_ba = m[2] == "F" and m[5] == "F"  # IE and BE empty
            ctx = (r.ax, r.ay, r.asz, r.bx, r.by, r.bsz, m)
            assert mx_intersects == r.ints, ctx
            assert mx_covers_ab == r.cab, ctx
            assert mx_covers_ba == r.cba, ctx


class TestBufferPolygon:
    """stBuffer(polygon, +r) — buffer_polygon (Minkowski dilation)."""

    def test_rectangle_closed_form(self):
        import math

        from lyft_presto_spark.operators.polygon_overlay import (
            buffer_polygon,
            polygon_area,
        )

        m, r = 8, 0.5
        for w, h in [(4, 2), (3, 3), (5, 1)]:
            P = [ring((0, 0), (w, 0), (w, h), (0, h))]
            b = buffer_polygon(P, r, m)
            exp = w * h + 2 * r * (w + h) + m * r * r * math.sin(math.pi / m)
            assert polygon_area([b]) == pytest.approx(exp, abs=1e-9)
            assert len(b) == 1

    def test_hole_erosion(self):
        import math

        from lyft_presto_spark.operators.polygon_overlay import (
            buffer_polygon,
            polygon_area,
        )

        m, r = 8, 0.5
        # 4x4 hole erodes to a SHARP-cornered 3x3 (erosion by a disc
        # keeps reflex corners sharp); outer dilates with rounded corners
        Pw = [
            ring((0, 0), (10, 0), (10, 10), (0, 10)),
            ring((3, 3), (3, 7), (7, 7), (7, 3)),
        ]
        b = buffer_polygon(Pw, r, m)
        exp = (100 + 2 * r * (10 + 10) + m * r * r * math.sin(math.pi / m)) - 9
        assert len(b) == 2
        assert polygon_area([b]) == pytest.approx(exp, abs=1e-9)
        # a hole narrower than 2r vanishes
        Pn = [
            ring((0, 0), (10, 0), (10, 10), (0, 10)),
            ring((5, 5), (5, 5.6), (5.6, 5.6), (5.6, 5)),
        ]
        assert len(buffer_polygon(Pn, r, m)) == 1

    def test_null_and_degenerate(self):
        from lyft_presto_spark.operators.polygon_overlay import buffer_polygon

        assert buffer_polygon(None, 0.5) is None
        assert buffer_polygon([ring((0, 0), (4, 0), (4, 4), (0, 4))], 0.0) is None
        assert buffer_polygon([ring((0, 0), (1, 0), (0, 0))], 0.5) == []


class TestUnionMany:
    """geometry_union over arrays (union_many)."""

    def test_strip_and_disjoint(self):
        from lyft_presto_spark.operators.polygon_overlay import (
            polygon_area,
            union_many,
        )

        sq = lambda x, y, s: [ring((x, y), (x + s, y), (x + s, y + s), (x, y + s))]  # noqa: E731
        r = union_many([sq(0, 0, 2), sq(1, 0, 2), sq(2, 0, 2)])
        assert len(r) == 1 and polygon_area(r) == pytest.approx(8.0)
        r = union_many([sq(0, 0, 1), sq(5, 5, 1), sq(9, 0, 1)])
        assert len(r) == 3 and polygon_area(r) == pytest.approx(3.0)
        # a later member bridges two earlier disjoint components
        r = union_many([sq(0, 0, 2), sq(4, 0, 2), sq(1.5, 0.5, 3)])
        assert len(r) == 1 and polygon_area(r) == pytest.approx(15.5)

    def test_hole_and_null_members(self):
        from lyft_presto_spark.operators.polygon_overlay import (
            polygon_area,
            union_many,
        )

        U = [ring((0, 0), (3, 0), (3, 3), (2, 3), (2, 1), (1, 1), (1, 3), (0, 3))]
        cap = [ring((0, 3), (3, 3), (3, 4), (0, 4))]
        r = union_many([U, cap])
        assert polygon_area(r) == pytest.approx(10.0)
        assert [len(p) for p in r] == [2]  # one part, one hole
        assert union_many(None) is None
        assert union_many([U, None]) is None  # reference null-member contract


class TestDistancePairs:
    """Generic ST_Distance codegen kernels vs closed forms."""

    def test_distance_kernels(self, spark):
        import math

        from pyspark.sql import functions as F

        from lyft_presto_spark.functions import geo as G

        rows = [(3.0, 0.0), (3.0, 4.0), (0.5, 0.5), (1.0, 0.0), (2.0, 5.0)]
        df = spark.createDataFrame(rows, "gx double, gy double")

        def sq_ring(x, y):
            return F.array(
                G.st_point(x, y), G.st_point(x + 1, y),
                G.st_point(x + 1, y + 1), G.st_point(x, y + 1), G.st_point(x, y),
            )

        lit = F.lit
        out = df.select(
            "gx", "gy",
            G.st_distance_polygons(sq_ring(lit(0.0), lit(0.0)), sq_ring(F.col("gx"), F.col("gy"))).alias("d"),
        ).collect()
        for r in out:
            exp = math.hypot(max(r.gx - 1, 0), max(r.gy - 1, 0))
            assert r.d == pytest.approx(exp, abs=1e-12), (r.gx, r.gy)
        # point to diagonal segment with clamped projection: point beyond
        # the segment end measures to the endpoint
        got = (
            spark.range(1)
            .select(
                G.st_distance_point_line(
                    G.st_point(lit(5.0), lit(5.0)),
                    F.array(G.st_point(lit(0.0), lit(0.0)), G.st_point(lit(1.0), lit(0.0))),
                ).alias("d")
            )
            .collect()[0]
            .d
        )
        assert got == pytest.approx(math.hypot(4, 5), abs=1e-12)


class TestIntersectionPieces:
    """Mixed-dimension ST_Intersection: the lower-dimensional pieces the
    area-only overlay drops (reference: GeoFunctions.java:1019
    stIntersection returns LINESTRING/POINT/GEOMETRYCOLLECTION for
    touching operands)."""

    @staticmethod
    def _sq(x0, y0, s):
        return [ring((x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s))]

    def test_edge_adjacent_shared_edge(self):
        r = intersection_pieces(self._sq(0, 0, 2), self._sq(2, 0, 2))
        assert r["polys"] == [] and r["points"] == []
        assert r["lines"] == [[{"x": 2.0, "y": 0.0}, {"x": 2.0, "y": 2.0}]]

    def test_partial_shared_edge(self):
        r = intersection_pieces(self._sq(0, 0, 4), [ring((4, 1), (6, 1), (6, 3), (4, 3))])
        assert r["lines"] == [[{"x": 4.0, "y": 1.0}, {"x": 4.0, "y": 3.0}]]

    def test_corner_touch_point(self):
        r = intersection_pieces(self._sq(0, 0, 2), self._sq(2, 2, 2))
        assert r["polys"] == [] and r["lines"] == []
        assert r["points"] == [{"x": 2.0, "y": 2.0}]

    def test_vertex_on_edge_touch(self):
        # triangle apex resting on the square's top edge from outside
        tri = [ring((2, 4), (3, 6), (1, 6))]
        r = intersection_pieces(self._sq(0, 0, 4), tri)
        assert r["points"] == [{"x": 2.0, "y": 4.0}]
        assert r["polys"] == [] and r["lines"] == []

    def test_overlap_has_no_lower_pieces(self):
        r = intersection_pieces(SQ1, SQ2)
        assert polygon_area(r["polys"]) == pytest.approx(1.0)
        assert r["lines"] == [] and r["points"] == []

    def test_same_side_shared_edge_is_face_boundary(self):
        # B inside A sharing part of A's left edge: the shared segment is
        # 2D face boundary, NOT a 1D piece
        b = [ring((0, 0.5), (1, 0.5), (1, 1.5), (0, 1.5))]
        r = intersection_pieces(self._sq(0, 0, 2), b)
        assert polygon_area(r["polys"]) == pytest.approx(1.0)
        assert r["lines"] == [] and r["points"] == []

    def test_mixed_all_dimensions(self):
        # A = [0,6]x[0,2]; B dips a tab into A (2D), rests a foot on the
        # top edge (1D), and pinches down to one vertex at (5,2) (0D)
        a = [ring((0, 0), (6, 0), (6, 2), (0, 2))]
        b = [ring((0, 1), (1, 1), (1, 2.5), (2, 2.5), (2, 2), (3, 2),
                  (3, 2.5), (4, 2.5), (5, 2), (6, 2.5), (6, 4), (0, 4))]
        r = intersection_pieces(a, b)
        assert polygon_area(r["polys"]) == pytest.approx(1.0)
        assert r["lines"] == [[{"x": 2.0, "y": 2.0}, {"x": 3.0, "y": 2.0}]]
        assert r["points"] == [{"x": 5.0, "y": 2.0}]

    def test_fills_hole_shared_ring(self):
        # B exactly fills A's hole: contact is the full hole ring (closed
        # 1D piece), no area, no points
        holed = self._sq(0, 0, 4) + [ring((1, 1), (1, 3), (3, 3), (3, 1))]
        r = intersection_pieces(holed, self._sq(1, 1, 2))
        assert r["polys"] == [] and r["points"] == []
        assert len(r["lines"]) == 1
        path = r["lines"][0]
        assert path[0] == path[-1] and len(path) == 5  # closed square ring

    def test_disjoint_and_null(self):
        r = intersection_pieces(self._sq(0, 0, 1), self._sq(5, 5, 1))
        assert r == {"polys": [], "lines": [], "points": []}
        assert intersection_pieces(None, self._sq(0, 0, 1)) is None

    def test_collinear_subsegments_merge(self):
        # an unrelated crossing splits the shared edge; the chain walk
        # must merge the collinear pieces back into one linestring
        b = [ring((2, 0), (4, 0), (4, 2), (2, 2))]
        a = [ring((0, 0), (2, 0), (2, 0.5), (1.5, 1.0), (2, 1.5), (2, 2), (0, 2))]
        r = intersection_pieces(a, b)
        # shared segments: x=2 for y in [0,0.5] and y in [1.5,2]
        assert len(r["lines"]) == 2
        for path in r["lines"]:
            assert len(path) == 2


class TestIntersectionPiecesProperty:
    """Hypothesis: integer axis-aligned rectangle pairs have a closed-form
    mixed-dimension intersection — 2D iff both extents overlap openly, 1D
    iff exactly one extent degenerates to a shared edge segment, 0D iff
    both degenerate to a corner. The arrangement must reproduce it."""

    @given(
        st.tuples(*[st.integers(-8, 8) for _ in range(4)]),
        st.tuples(*[st.integers(1, 6) for _ in range(4)]),
    )
    @settings(max_examples=120, deadline=None)
    def test_rect_pairs_closed_form(self, origins, sizes):
        ax, ay, bx, by = origins
        aw, ah, bw, bh = sizes
        A = [ring((ax, ay), (ax + aw, ay), (ax + aw, ay + ah), (ax, ay + ah))]
        B = [ring((bx, by), (bx + bw, by), (bx + bw, by + bh), (bx, by + bh))]
        ox = min(ax + aw, bx + bw) - max(ax, bx)  # x-extent overlap (signed)
        oy = min(ay + ah, by + bh) - max(ay, by)
        r = intersection_pieces(A, B)
        if ox > 0 and oy > 0:
            assert polygon_area(r["polys"]) == pytest.approx(ox * oy)
            assert r["lines"] == [] and r["points"] == []
        elif ox < 0 or oy < 0:
            assert r == {"polys": [], "lines": [], "points": []}
        elif (ox == 0) != (oy == 0):
            # shared edge segment of positive length, or a corner touch
            seg = oy if ox == 0 else ox
            assert r["polys"] == []
            if seg > 0:
                assert len(r["lines"]) == 1 and r["points"] == []
                p0, p1 = r["lines"][0][0], r["lines"][0][-1]
                length = abs(p1["x"] - p0["x"]) + abs(p1["y"] - p0["y"])
                assert length == pytest.approx(seg)
            else:  # seg == 0: edge meets corner exactly
                assert r["lines"] == [] and len(r["points"]) == 1
        else:  # ox == oy == 0: corner-to-corner touch
            assert r["polys"] == [] and r["lines"] == []
            assert len(r["points"]) == 1


class TestIntersectionAnyDispatcher:
    """Generic mixed-dimension ST_Intersection over the tagged union
    (polygon_overlay.intersection_any) — every simple pair family."""

    @staticmethod
    def _p(x, y):
        return {"tag": "ST_Point", "point": {"x": float(x), "y": float(y)}}

    @staticmethod
    def _l(*pts):
        return {"tag": "ST_LineString",
                "line": [{"x": float(a), "y": float(b)} for a, b in pts]}

    @staticmethod
    def _poly(*pts):
        r = [{"x": float(a), "y": float(b)} for a, b in [*pts, pts[0]]]
        return {"tag": "ST_Polygon", "polygon": [r]}

    def test_point_pairs(self):
        assert intersection_any(self._p(1, 2), self._p(1, 2))["points"] == [
            {"x": 1.0, "y": 2.0}
        ]
        assert intersection_any(self._p(1, 2), self._p(1, 3)) == {
            "polys": [], "lines": [], "points": []
        }

    def test_point_line_and_point_polygon(self):
        on = intersection_any(self._p(1, 0), self._l((0, 0), (2, 0)))
        assert on["points"] == [{"x": 1.0, "y": 0.0}]
        sq = self._poly((0, 0), (2, 0), (2, 2), (0, 2))
        assert intersection_any(self._p(1, 1), sq)["points"] == [{"x": 1.0, "y": 1.0}]
        assert intersection_any(self._p(5, 5), sq)["points"] == []
        # mirrored order dispatches the same kernel
        assert intersection_any(sq, self._p(1, 1))["points"] == [{"x": 1.0, "y": 1.0}]

    def test_line_line_overlap_crossing_touch(self):
        ov = intersection_any(self._l((0, 0), (3, 0)), self._l((1, 0), (5, 0)))
        assert ov["lines"] == [[{"x": 1.0, "y": 0.0}, {"x": 3.0, "y": 0.0}]]
        x = intersection_any(self._l((0, 0), (2, 2)), self._l((0, 2), (2, 0)))
        assert x["points"] == [{"x": 1.0, "y": 1.0}] and x["lines"] == []
        # overlap AND a separate crossing in one pair
        mixed = intersection_any(
            self._l((0, 0), (4, 0)), self._l((1, 0), (2, 0), (3, -1), (3, 1))
        )
        assert mixed["lines"] == [[{"x": 1.0, "y": 0.0}, {"x": 2.0, "y": 0.0}]]
        assert mixed["points"] == [{"x": 3.0, "y": 0.0}]

    def test_line_polygon_chord_and_touch(self):
        sq = self._poly((0, 0), (2, 0), (2, 2), (0, 2))
        chord = intersection_any(self._l((-1, 1), (3, 1)), sq)
        assert chord["lines"] == [[{"x": 0.0, "y": 1.0}, {"x": 2.0, "y": 1.0}]]
        # vertex resting on the boundary from outside -> isolated point
        touch = intersection_any(self._l((-1, 3), (1, 2), (3, 3)), sq)
        assert touch["lines"] == [] and touch["points"] == [{"x": 1.0, "y": 2.0}]

    def test_polygon_pair_routes_to_pieces(self):
        a = self._poly((0, 0), (2, 0), (2, 2), (0, 2))
        b = self._poly((2, 0), (4, 0), (4, 2), (2, 2))
        r = intersection_any(a, b)
        assert r["lines"] == [[{"x": 2.0, "y": 0.0}, {"x": 2.0, "y": 2.0}]]

    def test_unsupported_and_null(self):
        assert intersection_any(None, self._p(0, 0)) is None
        assert intersection_any({"tag": "ST_MultiPoint"}, self._p(0, 0)) is None
        assert intersection_any({"tag": None}, self._p(0, 0)) is None


class TestErodePolygon:
    """Negative-distance ST_Buffer: P erode D = P \\ (boundary + D)."""

    def test_rectangle_exact(self):
        sq = [ring((0, 0), (10, 0), (10, 10), (0, 10))]
        r = erode_polygon(sq, 2.0)
        assert len(r) == 1 and polygon_area(r) == pytest.approx(36.0)

    def test_hole_grows_by_cap_closed_form(self):
        import math
        holed = [ring((0, 0), (10, 0), (10, 10), (0, 10)),
                 ring((4, 4), (4, 6), (6, 6), (6, 4))]
        r = erode_polygon(holed, 1.0)
        exp = 64 - (4 + 8 + 8 * math.sin(math.pi / 8))
        assert polygon_area(r) == pytest.approx(exp, abs=1e-9)
        assert len(r) == 1 and len(r[0]) == 2  # outer + grown hole

    def test_neck_splits_to_multipolygon(self):
        db = [ring((0, 0), (6, 0), (6, 2), (10, 2), (10, 0), (16, 0),
                   (16, 6), (10, 6), (10, 4), (6, 4), (6, 6), (0, 6))]
        r = erode_polygon(db, 1.5)
        assert len(r) == 2
        assert 18.0 <= polygon_area(r) <= 19.0  # two 3x3 + reflex-cap surplus

    def test_vanish_and_null(self):
        sq = [ring((0, 0), (2, 0), (2, 2), (0, 2))]
        assert erode_polygon(sq, 1.2) == []
        assert erode_polygon(None, 1.0) is None
        assert erode_polygon(sq, 0.0) is None
        assert erode_polygon(sq, -1.0) is None

    def test_dilate_then_erode_recovers_rectangle(self):
        from lyft_presto_spark.operators.polygon_overlay import buffer_polygon
        sq = [ring((0, 0), (8, 0), (8, 6), (0, 6))]
        fat = buffer_polygon(sq, 1.0)
        back = erode_polygon(fat, 1.0)
        # closing identity on a convex polygon: erosion undoes dilation
        # up to the polygonal-cap convention at the corners
        assert len(back) == 1
        assert polygon_area(back) == pytest.approx(48.0, abs=0.25)


class TestCollectionRelate:
    """Pairwise-member decomposition for collection operands (BEYOND
    parity — the reference throws here; VERDICT r7 next-round #7). The
    exterior-column cells must combine as max-of-min, not plain max:
    E(B) is the INTERSECTION of member exteriors."""

    @staticmethod
    def _sq(x0, y0, s):
        return {"tag": "ST_Polygon", "point": None, "line": None,
                "polygon": [[{"x": float(x0), "y": float(y0)},
                             {"x": float(x0 + s), "y": float(y0)},
                             {"x": float(x0 + s), "y": float(y0 + s)},
                             {"x": float(x0), "y": float(y0 + s)}]]}

    @staticmethod
    def _pt(x, y):
        return {"tag": "ST_Point", "point": {"x": float(x), "y": float(y)},
                "line": None, "polygon": None}

    @staticmethod
    def _ln(*pts):
        return {"tag": "ST_LineString", "point": None,
                "line": [{"x": float(x), "y": float(y)} for x, y in pts],
                "polygon": None}

    def test_single_member_collections_match_simple_pair(self):
        from lyft_presto_spark.operators.polygon_overlay import (
            relate_any, relate_collections)

        a, b = self._sq(0, 0, 4), self._sq(2, 2, 4)
        assert relate_collections([a], [b]) == relate_any(a, b)

    def test_exterior_cells_are_max_of_min_not_max(self):
        # A = {square, far point}; B = {square inside A, the same point}.
        # EVERY member of B is covered by A, so EI/EB must be F — but the
        # pair (point-of-A vs square-of-B) alone has EI=2: plain cellwise
        # max would wrongly report 2.
        from lyft_presto_spark.operators.polygon_overlay import relate_collections

        A = [self._sq(0, 0, 4), self._pt(10, 10)]
        B = [self._sq(1, 1, 2), self._pt(10, 10)]
        m = relate_collections(A, B)
        assert m == "212FF1FF2"
        assert m[6] == "F" and m[7] == "F"  # EI, EB

    def test_touch_mix_matrix(self):
        from lyft_presto_spark.operators.polygon_overlay import relate_collections

        A = [self._sq(0, 0, 4), self._pt(10, 10)]
        B = [self._sq(4, 0, 4), self._ln((10, 10), (12, 12))]
        assert relate_collections(A, B) == "F02F11212"

    def test_non_simple_member_and_empty_yield_null(self):
        from lyft_presto_spark.operators.polygon_overlay import relate_collections

        multi = {"tag": "ST_MultiPolygon", "point": None, "line": None,
                 "polygon": None}
        A = [self._sq(0, 0, 4)]
        assert relate_collections(A, [multi]) is None
        assert relate_collections(A, []) is None
        assert relate_collections(None, A) is None

    def test_intersection_union_of_pairs_with_point_dedup(self):
        from lyft_presto_spark.operators.polygon_overlay import (
            intersection_collections)

        # two A-members touching the same B-corner from different sides:
        # the touch point appears in two pair results, deduped to one
        A = [self._sq(0, 0, 2), self._sq(2, 2, 2)]
        B = [self._sq(2, 0, 2)]  # shares edges x=2 (with A1) and y=2 (A2)
        r = intersection_collections(A, B)
        assert r["polys"] == []
        assert len(r["lines"]) == 2
        assert r["points"] == []  # corner (2,2) covered by both edges

    def test_intersection_mixed_dimensions(self):
        from lyft_presto_spark.operators.polygon_overlay import (
            intersection_collections)

        A = [self._sq(0, 0, 4), self._pt(10, 10)]
        B = [self._sq(4, 0, 4), self._ln((10, 10), (12, 12))]
        r = intersection_collections(A, B)
        assert r["polys"] == [] and len(r["lines"]) == 1
        assert r["points"] == [{"x": 10.0, "y": 10.0}]


class TestRatExactness:
    """The lazy-normalizing rational (r9 perf rewrite) must be value-exact
    against fractions.Fraction over every operation the overlay uses —
    including hash/eq consistency across unreduced twins and plain ints."""

    def test_rat_matches_fraction_over_random_expressions(self):
        import random
        from fractions import Fraction as F

        from lyft_presto_spark.operators.polygon_overlay import Rat

        rng = random.Random(20260815)
        for _ in range(300):
            fa = rng.randint(-50, 50) / (2 ** rng.randint(0, 6))
            fb = rng.randint(-50, 50) / (2 ** rng.randint(0, 6)) or 0.25
            ra, rb = Rat(fa), Rat(fb)
            xa, xb = F(fa), F(fb)
            for op in ("add", "sub", "mul", "div", "neg", "abs"):
                if op == "add":
                    got, want = ra + rb, xa + xb
                elif op == "sub":
                    got, want = ra - rb, xa - xb
                elif op == "mul":
                    got, want = ra * rb, xa * xb
                elif op == "div":
                    if rb.n == 0:
                        continue
                    got, want = ra / rb, xa / xb
                elif op == "neg":
                    got, want = -ra, -xa
                else:
                    got, want = abs(ra), abs(xa)
                assert got.n * want.denominator == want.numerator * got.d, (
                    fa, fb, op,
                )
            # comparisons agree with Fraction in all directions
            assert (ra < rb) == (xa < xb)
            assert (ra <= rb) == (xa <= xb)
            assert (ra == rb) == (xa == xb)
            assert (ra > rb) == (xa > xb)
            assert (ra >= rb) == (xa >= xb)
            # int mixing (the overlay compares orientations against 0)
            assert (ra > 0) == (xa > 0)
            assert (ra == 0) == (xa == 0)
            assert float(ra) == float(xa)

    def test_rat_hash_eq_consistency(self):
        from lyft_presto_spark.operators.polygon_overlay import Rat

        # unreduced twins are equal and hash equal (set/dict dedup relies
        # on this after growth-free same-den arithmetic)
        a = Rat(1.5) + Rat(0.5)  # 4/2, unreduced
        b = Rat(2.0)  # 2/1
        assert a == b and hash(a) == hash(b)
        assert a == 2 and hash(a) == hash(2)  # numeric-tower hash contract
        third = Rat(1) / Rat(3)
        assert hash(third) == hash(Rat(2) / Rat(6))
        # dict key identity across representations
        d = {(a, a): "x"}
        assert (b, b) in d

    def test_rat_float_comparisons_are_symmetric_and_nan_safe(self):
        # ADVICE r9: floats are lifted at the boundary, so the tower must
        # be SYMMETRIC — == does not secretly accept floats that < rejects,
        # and NaN never raises (falls back to identity → False, matching
        # Fraction-vs-NaN semantics).
        import pytest

        from lyft_presto_spark.operators.polygon_overlay import Rat

        half = Rat(1) / Rat(2)
        assert (half == 0.5) is False  # no float eq → no hash/eq break
        assert (0.5 == half) is False
        assert (half == float("nan")) is False  # no ValueError
        assert half != float("nan")
        with pytest.raises(TypeError):
            half < 0.5  # ordering rejects floats, same as before
        # bool stays inside the int tower, like Fraction
        assert Rat(1) == True  # noqa: E712
        assert Rat(0) == False  # noqa: E712

    def test_rat_bit_guard_reduces_large_denominators(self):
        from lyft_presto_spark.operators.polygon_overlay import (
            _RAT_DEN_BITS,
            Rat,
        )

        big = Rat._mk(3 * (1 << 300), 2 * (1 << 300))  # guard fires in _mk
        assert big.d.bit_length() <= _RAT_DEN_BITS
        assert big == Rat._mk(3, 2)


class TestOverlayAlgebraRandomized:
    """Measure-theoretic identities over random rectilinear polygon pairs —
    a 500-case net under the r9 Rat rewrite, far wider than the fixture
    shapes: area(A) + area(B) == area(A|B) + area(A&B), diff == A - inter,
    sym == union - inter, plus op-level consistency of overlay() vs
    overlay_all(). Dyadic half-grid coordinates (the float-exact domain)."""

    @staticmethod
    def _rand_rect(rng):
        x0 = rng.randrange(-8, 8) / 2.0
        y0 = rng.randrange(-8, 8) / 2.0
        w = rng.randrange(1, 9) / 2.0
        h = rng.randrange(1, 9) / 2.0
        return [[
            {"x": x0, "y": y0}, {"x": x0 + w, "y": y0},
            {"x": x0 + w, "y": y0 + h}, {"x": x0, "y": y0 + h},
            {"x": x0, "y": y0},
        ]]

    @staticmethod
    def _rand_lshape(rng):
        # axis-aligned L: a rectangle minus a corner notch (vertices on the
        # half grid; always simple, CCW)
        x0 = rng.randrange(-6, 6) / 2.0
        y0 = rng.randrange(-6, 6) / 2.0
        w = rng.randrange(2, 9) / 2.0
        h = rng.randrange(2, 9) / 2.0
        nw = rng.randrange(1, max(2, int(w * 2))) / 2.0
        nh = rng.randrange(1, max(2, int(h * 2))) / 2.0
        nw, nh = min(nw, w - 0.5), min(nh, h - 0.5)
        return [[
            {"x": x0, "y": y0}, {"x": x0 + w, "y": y0},
            {"x": x0 + w, "y": y0 + h - nh}, {"x": x0 + w - nw, "y": y0 + h - nh},
            {"x": x0 + w - nw, "y": y0 + h}, {"x": x0, "y": y0 + h},
            {"x": x0, "y": y0},
        ]]

    def test_inclusion_exclusion_over_random_pairs(self):
        import random

        from lyft_presto_spark.operators.polygon_overlay import (
            overlay_all,
            polygon_area,
        )

        rng = random.Random(99)
        for case in range(500):
            mk_a = self._rand_rect if case % 2 == 0 else self._rand_lshape
            mk_b = self._rand_rect if case % 3 == 0 else self._rand_lshape
            a, b = mk_a(rng), mk_b(rng)
            r = overlay_all(a, b)
            ar = polygon_area([a])
            br = polygon_area([b])
            ai = polygon_area(r["intersection"])
            au = polygon_area(r["union"])
            ad = polygon_area(r["difference"])
            ays = polygon_area(r["symdifference"])
            # half-grid rectilinear areas are exact multiples of 0.25: the
            # identities must hold to float exactness (tiny eps for the
            # float summation of the shoelace helper only)
            eps = 1e-9
            assert abs((ar + br) - (au + ai)) < eps, (case, a, b)
            assert abs(ad - (ar - ai)) < eps, (case, a, b)
            assert abs(ays - (au - ai)) < eps, (case, a, b)
            assert -eps < ai <= min(ar, br) + eps
            assert max(ar, br) - eps <= au <= ar + br + eps

    def test_overlay_single_op_matches_overlay_all(self):
        import random

        from lyft_presto_spark.operators.polygon_overlay import (
            overlay,
            overlay_all,
            polygon_area,
        )

        rng = random.Random(7)
        for _ in range(60):
            a, b = self._rand_lshape(rng), self._rand_rect(rng)
            r = overlay_all(a, b)
            for op in ("intersection", "union", "difference", "symdifference"):
                single = overlay(a, b, op)
                assert abs(polygon_area(single) - polygon_area(r[op])) < 1e-9

    def test_rat_overlay_differential_vs_stock_fraction(self, monkeypatch):
        """Differential guard for the r9 scalar swap: the SAME random pairs
        overlaid with Rat and with fractions.Fraction produce identical
        geometry (vertex-exact, not just areas)."""
        import random
        from fractions import Fraction as StockFraction

        import lyft_presto_spark.operators.polygon_overlay as PO

        rng = random.Random(4242)
        pairs = [
            (self._rand_lshape(rng), self._rand_rect(rng)) for _ in range(40)
        ]
        with_rat = [PO.overlay_all(a, b) for a, b in pairs]
        monkeypatch.setattr(PO, "Fraction", StockFraction)
        try:
            with_frac = [PO.overlay_all(a, b) for a, b in pairs]
        finally:
            monkeypatch.undo()

        def canon(res):
            out = {}
            for op, polys in res.items():
                out[op] = sorted(
                    sorted(
                        tuple(sorted((float(p["x"]), float(p["y"])) for p in ring))
                        for ring in rings
                    )
                    for rings in polys
                )
            return out

        for (a, b), r1, r2 in zip(pairs, with_rat, with_frac):
            assert canon(r1) == canon(r2), (a, b)
