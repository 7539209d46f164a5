"""Convex-hull aggregate: the reference's ``convex_hull_agg``
(presto-geospatial/.../GeometryStateFactory.java + ConvexHullAggregation.java)
as a two-level mergeable aggregate.

Spark-first shape (100 TB argument, SCALE.md discipline):

1. **Local pre-reduction, no shuffle** — ``mapInPandas`` computes a convex
   hull per group *within each scan partition*. Hull-of-hulls equals the
   hull, so this is lossless map-side combine: shuffle bytes shrink from
   O(points) to O(hull vertices x partitions) — the same partial/final
   split the reference's AccumulatorStateFactory gives its aggregate.
2. **Final hull, one shuffle** — ``applyInPandas`` per group over the
   surviving candidate vertices.

The chain keeps collinear boundary points (pop only on strictly-right
turns), which makes vertex counts deterministic when coordinates are exact
integers-in-double: every orientation test is exact below 2^53, so the
engine and the DuckDB oracle (an independent O(n^3) hull-edge formulation)
agree bit-for-bit on which points are hull vertices.

numpy/pandas run Arrow-batched (grouped-map), never row-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def monotone_chain(xs: Iterable[float], ys: Iterable[float]) -> list[tuple[float, float]]:
    """Andrew's monotone chain, keeping collinear boundary points.

    Returns the hull cycle counter-clockwise starting from the lexicographic
    minimum. Degenerate inputs: 1 point -> [p]; 2 points / all collinear ->
    the segment endpoints plus any interior collinear points, traversed out
    and back (area 0, perimeter = 2 x length), matching the oracle's
    directed-edge formulation.
    """
    pts = sorted(set(zip(xs, ys)))
    if len(pts) <= 2:
        return pts

    def _half(seq: list[tuple[float, float]]) -> list[tuple[float, float]]:
        h: list[tuple[float, float]] = []
        for p in seq:
            # pop only on a strictly clockwise turn: collinear points stay.
            while len(h) >= 2 and _cross(h[-2], h[-1], p) < 0:
                h.pop()
            h.append(p)
        return h

    lower = _half(pts)
    upper = _half(pts[::-1])
    return lower[:-1] + upper[:-1]


def _hull_metrics(pts: list[tuple[float, float]]) -> tuple[float, float, int]:
    """(area, perimeter, vertex count) of a hull cycle."""
    n = len(pts)
    if n == 1:
        return 0.0, 0.0, 1
    a = np.asarray(pts, dtype=np.float64)
    b = np.roll(a, -1, axis=0)
    area = abs(float(np.sum(a[:, 0] * b[:, 1] - b[:, 0] * a[:, 1]))) / 2.0
    perim = float(np.sum(np.sqrt(np.sum((b - a) ** 2, axis=1))))
    return area, perim, n


def convex_hull_agg(
    df: DataFrame, key: str, xcol: str, ycol: str, *, points_are_distinct: bool = False
) -> DataFrame:
    """Per-``key`` convex hull metrics: hull_area, hull_perimeter,
    hull_vertices, plus the bbox extent (env_xmin/env_ymax — the
    geometry-extent aggregate) and n_points (distinct input points).

    ``points_are_distinct=True`` declares that each (key, x, y) row appears
    at most once in ``df`` (e.g. the caller already ran DISTINCT). Then
    n_points is the sum of per-partition partial counts carried through the
    same single shuffle — no extra scan. With the default ``False`` the
    operator cannot merge partial distinct counts exactly (a point may
    repeat across partitions), so it pays one documented extra cost: a
    second scan of ``df`` plus a global distinct shuffle.
    """

    def _local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            frames = []
            for k, g in pdf.groupby(key, sort=False):
                hull = monotone_chain(g[xcol].to_numpy(), g[ycol].to_numpy())
                # Hull drops interior points, so the partial distinct count
                # must ride along. Emit it on the first hull row only (0 on
                # the rest): the final stage sums the column, giving one
                # partial per (scan partition, group).
                npts = len(set(zip(g[xcol], g[ycol])))
                frames.append(
                    pd.DataFrame(
                        {
                            key: k,
                            "x": [p[0] for p in hull],
                            "y": [p[1] for p in hull],
                            "part_points": [npts] + [0] * (len(hull) - 1),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    reduced = df.select(key, F.col(xcol).alias("x"), F.col(ycol).alias("y")).mapInPandas(
        _local, schema=f"{key} bigint, x double, y double, part_points bigint"
    )

    def _final(pdf: pd.DataFrame) -> pd.DataFrame:
        hull = monotone_chain(pdf["x"].to_numpy(), pdf["y"].to_numpy())
        area, perim, nvert = _hull_metrics(hull)
        return pd.DataFrame(
            [
                {
                    key: pdf[key].iloc[0],
                    "hull_area": round(area, 6),
                    "hull_perimeter": round(perim, 6),
                    "hull_vertices": nvert,
                    "env_xmin": float(pdf["x"].min()),
                    "env_ymax": float(pdf["y"].max()),
                    "n_points": int(pdf["part_points"].sum()),
                }
            ]
        )

    hulls = reduced.groupBy(key).applyInPandas(
        _final,
        schema=(
            f"{key} bigint, hull_area double, hull_perimeter double, "
            "hull_vertices int, env_xmin double, env_ymax double, n_points bigint"
        ),
    )
    if points_are_distinct:
        return hulls
    # General case: partial counts can double-count a point that repeats
    # across partitions, so recount exactly from the raw side. Documented
    # cost: one extra scan + a global distinct shuffle on (key, x, y).
    counts = (
        df.select(key, xcol, ycol)
        .distinct()
        .groupBy(key)
        .agg(F.count("*").cast("long").alias("n_points"))
    )
    return hulls.drop("n_points").join(F.broadcast(counts), key)
