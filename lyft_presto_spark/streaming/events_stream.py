"""Streaming event pipeline: parquet file stream -> watermarked windows.

Batch/stream parity: ``tumbling_counts`` is written against an unbounded
DataFrame and produces the same rows as the batch rollup when run with an
``availableNow`` trigger over a static directory — the standard
backfill-equals-live property a production pipeline needs.

Scale notes: state is bounded by the watermark (late events beyond 1 hour
are dropped, matching the window retention); the aggregation state store is
keyed by (window, event_type) so it shuffles grouped scalars only. On a real
feed the source line becomes ``readStream.format("kafka")`` with the same
downstream plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Explicit schema: streaming readers cannot infer, and events.parquet stores
# ts as TIMESTAMP(NANOS) which arrives as long under nanosAsLong.
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # nanos since epoch
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events(spark: SparkSession, source_dir: str) -> DataFrame:
    """Unbounded events source over a parquet directory (file stream)."""
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window rollup (streaming twin of events_tumbling_window).

    ``approx_users`` is the streaming-legal distinct: exact COUNT(DISTINCT)
    is unsupported (and unboundedly stateful) in a streaming aggregation,
    while the HLL register state is fixed-size per group and its merge is
    commutative — so the incremental result is byte-identical to the batch
    plan regardless of micro-batch arrival order (pinned by the parity test).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "approx_users",
        )
    )


def run_availablenow_to_memory(result: DataFrame, query_name: str) -> DataFrame:
    """Drain all currently-available input into an in-memory table, then stop.

    This is the backfill mode: one bounded run over the existing files,
    exactly-once per file, producing the table the batch query would.
    """
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = result.sparkSession
    return spark.table(query_name)


def enriched_stream(events: DataFrame, dim: DataFrame, agg_window: str = "1 hour") -> DataFrame:
    """Stream-static enrichment join + windowed rollup per dimension key.

    The standard production shape: an unbounded event stream joined to a
    bounded dimension table (here customers as the user dimension). Spark
    plans the static side as a broadcast rebuilt per micro-batch — no
    stream-state for the join, so the only state store is the windowed
    aggregate (watermark-bounded). On a cluster the dim refresh cadence is
    the micro-batch cadence, which is exactly the semantics a slowly-
    changing enrichment wants.
    """
    ev = events.withWatermark("ts", "1 hour")
    joined = ev.join(
        F.broadcast(dim.select(F.col("c_custkey").alias("user_id"), "c_nationkey")),
        "user_id",
        "left",
    )
    return (
        joined.groupBy(F.window("ts", agg_window).alias("w"), "c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "c_nationkey",
            "n_events",
            "total_value",
        )
    )
