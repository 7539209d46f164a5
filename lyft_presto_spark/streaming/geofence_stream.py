"""Streaming geofencing: stream-static spatial join routed by the learned
KdbTree partitioning.

The batch twin is queries/geo_queries.py op_spatial_kdb_join (the
SpatialJoinOperator.java:41 analog). On an unbounded point stream the same
shape holds because everything heavy was moved to plan-compile time:

- the partitioning is LEARNED ONCE from a static sample and compiled into a
  codegen when-chain (operators/spatial_partition.py) — per streamed row,
  leaf assignment is log2(leaves) comparisons inside the micro-batch's scan
  stage, no lookup state;
- the zone side is STATIC and small after exploding to covering leaves, so
  Spark broadcasts it into every micro-batch (stream-static equi-join needs
  no watermark and keeps zero join state);
- the exact containment predicate refines after the leaf equi-join, exactly
  like the batch plan. A point matches a zone at most once (one leaf per
  point), so no dedup step.

Written against plain DataFrames so the SAME function builds the batch twin
(oracle-checkable via the kdb-join oracle) and the streaming pipeline
(availableNow parity test) — the backfill-equals-live property the other
streaming operators pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.spatial_partition import SpatialPartitioning


def geofence_matches(
    points: DataFrame,
    zones: DataFrame,
    part: SpatialPartitioning,
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """Rows of ``points`` (streaming or batch) joined to the zones whose
    rectangle strictly contains them. ``zones`` must carry
    zone_id/xmin/xmax/ymin/ymax and be a static (batch) DataFrame."""
    z = zones.withColumn(
        "leaf_id",
        F.explode(
            part.covering_leaf_ids_expr(
                F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax")
            )
        ),
    )
    p = points.withColumn("leaf_id", part.leaf_id_expr(F.col(x), F.col(y)))
    return p.join(F.broadcast(z), "leaf_id").where(
        (F.col(x) > F.col("xmin"))
        & (F.col(x) < F.col("xmax"))
        & (F.col(y) > F.col("ymin"))
        & (F.col(y) < F.col("ymax"))
    )


def geofence_counts(matches: DataFrame) -> DataFrame:
    """Per-zone match counts — the aggregate both the batch twin and the
    availableNow drain report (complete-mode friendly: small key space)."""
    return matches.groupBy("zone_id").agg(F.count(F.lit(1)).alias("n_points"))
