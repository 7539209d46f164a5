"""Streaming geofence (stream-static spatial join routed by the learned
KdbTree partitioning): the availableNow drain must equal the batch twin,
and the batch twin must equal the oracle-checked kdb-join aggregate."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from lyft_presto_spark.operators.spatial_partition import learn_partitioning
from lyft_presto_spark.queries import all_queries
from lyft_presto_spark.queries.registry import sql_over
from lyft_presto_spark.queries.geo_queries import (
    _POINTS,
    _ZONES,
    ZONE_HALF_H,
    ZONE_HALF_W,
)
from lyft_presto_spark.streaming import run_availablenow_to_memory
from lyft_presto_spark.streaming.geofence_stream import (
    geofence_counts,
    geofence_matches,
)

POINTS_SCHEMA = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("lon", DoubleType()),
        StructField("lat", DoubleType()),
    ]
)


def _zones(spark, sf_dir):
    return sql_over(spark, sf_dir, _ZONES, ("nation",)).select(
        "zone_id",
        (F.col("cx") - ZONE_HALF_W).alias("xmin"),
        (F.col("cx") + ZONE_HALF_W).alias("xmax"),
        (F.col("cy") - ZONE_HALF_H).alias("ymin"),
        (F.col("cy") + ZONE_HALF_H).alias("ymax"),
    )


def test_geofence_stream_matches_batch_and_oracle(spark, sf_dir, tmp_path_factory):
    pts = sql_over(spark, sf_dir, _POINTS, ("customer",))
    zones = _zones(spark, sf_dir)
    part = learn_partitioning(
        pts, "lon", "lat", sample_key="c_custkey", sample_mod=1,
        max_sample=4096, partition_count=32,
    )

    # Stream source: the same points as several files (multiple micro-batches).
    src = str(tmp_path_factory.mktemp("geofence_stream"))
    pts.repartition(8).write.mode("overwrite").parquet(src)
    for extra in os.listdir(src):
        if extra.startswith("_"):
            path = os.path.join(src, extra)
            (shutil.rmtree if os.path.isdir(path) else os.remove)(path)
    stream_pts = (
        spark.readStream.schema(POINTS_SCHEMA)
        .option("maxFilesPerTrigger", 3)
        .parquet(src)
    )

    streamed = run_availablenow_to_memory(
        geofence_counts(geofence_matches(stream_pts, zones, part)),
        "stream_geofence",
    )
    batch = geofence_counts(geofence_matches(pts, zones, part))

    s = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert len(s) == len(b) > 0
    assert s == b

    # The batch twin must agree with the oracle-checked registry aggregate
    # (op_spatial_kdb_join's n_points per zone).
    kdb = {
        r.zone_id: r.n_points
        for r in all_queries()["op_spatial_kdb_join"].spark(spark, sf_dir).collect()
    }
    assert dict(b) == kdb


def test_geofence_stream_plan_has_no_join_state(spark, sf_dir):
    """Stream-static equi-join: the static side broadcasts, so the plan has
    no stream-stream join state and needs no watermark."""
    pts = sql_over(spark, sf_dir, _POINTS, ("customer",))
    zones = _zones(spark, sf_dir)
    part = learn_partitioning(
        pts, "lon", "lat", sample_key="c_custkey", sample_mod=1,
        max_sample=4096, partition_count=32,
    )
    plan = (
        geofence_matches(pts, zones, part)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
