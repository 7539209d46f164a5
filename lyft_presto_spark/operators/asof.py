"""As-of (point-in-time) join — a training-pipeline staple Spark lacks.

For each left row, attach the most recent right row at-or-before the left
timestamp (per key), e.g. "the user's last profile snapshot when this event
fired". The reference engine expresses this as a correlated TopN subquery
(LateralJoin + TopN — presto-main/.../planner/plan/CorrelatedJoinNode.java,
TopNNode.java); pandas calls it merge_asof.

Scale design — union + ordered window, NOT a join:

- Tag right rows side=0 and left rows side=1, union on (key, ts, payload).
- One hash shuffle on the key, one sort per partition on (ts, side), then
  ``last(value, ignorenulls=True)`` over ROWS UNBOUNDED PRECEDING carries
  the latest right payload forward into each left row.
- Filter back to side=1.

Cost is one shuffle + one sort of |L|+|R| rows — the same work a sort-merge
join would do, but with zero row multiplication however many right rows
precede a left row (a naive range join explodes to |matches| intermediate
rows before its TopN). Skewed keys behave like any window: one partition
per key-run, AQE-splittable upstream. This is the shape that survives 100
TB; ``merge_asof`` via applyInPandas would funnel every byte through
Python workers instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_MATCH_TS = "__asof_match_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    *,
    direction: str = "backward",
    tolerance: Column | None = None,
    suffix: str = "",
) -> DataFrame:
    """Left as-of join: every left row, plus the nearest right payload.

    direction='backward' matches the latest right row with
    ``right_ts <= left_ts`` (inclusive, like DuckDB ASOF and pandas
    merge_asof); 'forward' matches the earliest right row with
    ``right_ts >= left_ts``. ``tolerance`` (an interval/numeric Column)
    nulls out matches farther than the bound. Unmatched left rows keep
    NULL payloads (left-join semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys and c != right_ts]
    out_vals = [c + suffix for c in value_cols]

    # Right rows sort before left rows at an equal timestamp (side 0 < 1)
    # so an exact-tie right row is visible to the left row — inclusive match.
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias(_MATCH_TS),
        *[F.col(c).alias(v) for c, v in zip(value_cols, out_vals)],
        *[F.lit(None).cast(left.schema[c].dataType).alias("__l_" + c) for c in left.columns],
    )
    lf = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_MATCH_TS].dataType).alias(_MATCH_TS),
        *[F.lit(None).cast(r.schema[v].dataType).alias(v) for v in out_vals],
        *[F.col(c).alias("__l_" + c) for c in left.columns],
    )
    unioned = r.unionByName(lf)

    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__asof_ts").asc(), F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = lambda c: F.last(F.col(c), ignorenulls=True).over(w)  # noqa: E731
    else:
        # side desc: at an equal ts the right row (side 0) sits AFTER the
        # left row in ascending order, inside the FOLLOWING frame.
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__asof_ts").asc(), F.col(_SIDE).desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = lambda c: F.first(F.col(c), ignorenulls=True).over(w)  # noqa: E731

    matched = unioned.select(
        *keys,
        F.col("__asof_ts"),
        F.col(_SIDE),
        carry(_MATCH_TS).alias(_MATCH_TS),
        *[carry(v).alias(v) for v in out_vals],
        *["__l_" + c for c in left.columns],
    ).where(F.col(_SIDE) == 1)

    if tolerance is not None:
        gap = (
            F.col("__asof_ts") - F.col(_MATCH_TS)
            if direction == "backward"
            else F.col(_MATCH_TS) - F.col("__asof_ts")
        )
        within = F.col(_MATCH_TS).isNotNull() & (gap <= tolerance)
        matched = matched.select(
            *keys,
            "__asof_ts",
            _SIDE,
            F.when(within, F.col(_MATCH_TS)).alias(_MATCH_TS),
            *[F.when(within, F.col(v)).alias(v) for v in out_vals],
            *["__l_" + c for c in left.columns],
        )

    return matched.select(
        *[F.col("__l_" + c).alias(c) for c in left.columns],
        F.col(_MATCH_TS).alias("matched_" + right_ts + suffix),
        *out_vals,
    )
