"""Binned range joins — band and point-in-interval joins that scale.

A join whose only predicate is a range condition (|l - r| <= band, or
point BETWEEN start AND end) has no equi key, so Spark plans a broadcast/
cartesian nested-loop — O(|L| * |R|) comparisons, the classic 100 TB
killer. The reference executes these as JoinNode residual filters over
whatever equi keys exist (JoinNode.java filter), with the same degradation
when there are none.

The scale shape is binning: quantize the range dimension into fixed-width
bins so every candidate pair shares a bin, equi-join on the bin (hash
shuffle, no multiplication beyond bin fan-out <= 3), then apply the exact
range predicate as a residual filter.

- band_join: bin width = band. A left value's matches lie in its bin +-1,
  so the left side explodes to 3 bins and each true pair meets exactly once
  (the right row's bin is unique).
- interval_join: bin width = max interval length. The interval side
  explodes to the (<= 2) bins it covers; the point side has one bin, so
  again each true pair meets exactly once — no post-dedup needed.

Fan-out is a constant 3x (or 2x) on ONE side, against the nested-loop's
|L|x|R| — at any scale this is a plain shuffled equi-join, AQE-skew-
splittable like any other.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LBIN = "__range_bin_l"
_RBIN = "__range_bin_r"


def _equi_conds(left: DataFrame, right: DataFrame, equi: list[tuple[str, str]] | None) -> list[Column]:
    return [left[a] == right[b] for a, b in (equi or [])]


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    band: float,
    equi: list[tuple[str, str]] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join rows with ``abs(left_val - right_val) <= band`` (inclusive).

    ``equi`` adds ordinary key equalities [(left_col, right_col), ...].
    Returns all left + right columns (minus the internal bin columns).
    """
    lbin = F.floor(F.col(left_val) / F.lit(band))
    lf = left.withColumn(_LBIN, F.explode(F.array(lbin - 1, lbin, lbin + 1)))
    rf = right.withColumn(_RBIN, F.floor(F.col(right_val) / F.lit(band)))
    residual = (lf[left_val] >= rf[right_val] - band) & (lf[left_val] <= rf[right_val] + band)
    cond = reduce(
        Column.__and__, [lf[_LBIN] == rf[_RBIN], *_equi_conds(lf, rf, equi), residual]
    )
    return lf.join(rf, cond, how).drop(_LBIN).drop(_RBIN)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    max_length: float,
    equi: list[tuple[str, str]] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point to intervals containing it: start <= p <= end.

    ``max_length`` must bound every interval's length (end - start); it sets
    the bin width. Intervals longer than the bound raise at runtime (ANSI
    mode) rather than silently dropping matches.
    """
    w = F.lit(max_length)
    pf = points.withColumn(_LBIN, F.floor(F.col(point_col) / w))
    # assert_true fails the job loudly on a violating interval — a silent
    # wrong answer at scale is worse than a failed stage.
    guarded = intervals.withColumn(
        "__len_ok",
        F.assert_true(
            F.col(end_col) - F.col(start_col) <= w,
            F.lit(f"interval longer than max_length={max_length}"),
        ),
    ).drop("__len_ok")
    iv = guarded.withColumn(
        _RBIN,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w).cast("long"),
                F.floor(F.col(end_col) / w).cast("long"),
            )
        ),
    )
    residual = (pf[point_col] >= iv[start_col]) & (pf[point_col] <= iv[end_col])
    cond = reduce(
        Column.__and__, [pf[_LBIN] == iv[_RBIN], *_equi_conds(pf, iv, equi), residual]
    )
    return pf.join(iv, cond, how).drop(_LBIN).drop(_RBIN)
