"""Stream-stream interval join: click -> purchase attribution.

The missing piece of the streaming surface after windows/sessionize/dedup:
joining two unbounded streams. Spark requires (a) watermarks on both sides
and (b) a time-range join condition, so it can bound the buffered state —
each side keeps only rows younger than watermark + horizon, keyed by the
equi-join column. That is exactly the semantics of an attribution join: a
purchase matches a click by the same user within the horizon.

Written against plain DataFrames so the SAME function builds the batch twin
(oracle-checkable) and the streaming pipeline (availableNow parity test) —
the backfill-equals-live property the other streaming operators pin.

Scale: state is hash-partitioned on user_id (the equi-key); horizon bounds
per-key state to O(events per user per horizon). No broadcast, no cross
product — the range predicate only prunes within equi-key groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_pairs(
    events: DataFrame,
    horizon: str = "30 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """(click, purchase) pairs per user with purchase within ``horizon``.

    ``watermark=None`` builds the batch twin (watermarks are no-ops on batch
    DataFrames anyway, but None keeps the batch plan free of the nodes).
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value"),
    )
    if watermark is not None:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    return clicks.join(
        purchases,
        F.expr(
            "user_id = p_user_id AND purchase_ts >= click_ts "
            f"AND purchase_ts <= click_ts + INTERVAL {horizon}"
        ),
        "inner",
    ).select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts", "value")
