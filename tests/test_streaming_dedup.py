"""Streaming exact dedup: cross-batch duplicate suppression.

Documents are streamed twice (two file batches with identical content but
later timestamps in the second), so every batch-2 row is a cross-batch
duplicate that state must catch — within the watermark window.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from lyft_presto_spark.session import load_table
from lyft_presto_spark.streaming.dedup_stream import dedup_stream, digest_column

STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("arrival", TimestampType()),
    ]
)


def test_cross_batch_duplicates_dropped(spark, sf_dir, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("dedup_stream"))
    docs = load_table(spark, sf_dir, "documents").limit(200).select("doc_id", "text")

    base = docs.withColumn("arrival", F.expr("timestamp_seconds(1700000000 + doc_id % 60)"))
    dup = docs.withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    ).withColumn("arrival", F.expr("timestamp_seconds(1700000090 + doc_id % 60)"))

    base.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    dup.coalesce(1).write.mode("append").parquet(src)
    for extra in os.listdir(src):
        if extra.startswith("_"):
            p = os.path.join(src, extra)
            (shutil.rmtree if os.path.isdir(p) else os.remove)(p)

    stream = (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = (
        dedup_stream(stream, ts_col="arrival", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("dedup_out")

    # Batch truth: number of distinct digests in the original corpus.
    n_distinct = docs.select(digest_column().alias("d")).distinct().count()
    assert out.count() == n_distinct
    # Every batch-2 copy (doc_id >= 1M) whose content already appeared must be gone.
    survivors2 = out.filter("doc_id >= 1000000").count()
    dup_only = (
        docs.withColumn("d", digest_column())
        .groupBy("d")
        .count()
        .filter("count > 0")
        .count()
    )
    assert survivors2 == 0 or survivors2 == n_distinct - dup_only  # all content seen in batch 1
    assert survivors2 == 0
