"""Streaming ingest gate: stream-vs-standing-corpus dedup admission.

The streaming twin of the batch ``dedup_incremental_delta`` exact branch:
arriving docs whose content already exists in the corpus are dropped by a
STATELESS stream-static anti-join (broadcast static side, no stream
state); within-feed duplicates are then suppressed with watermark-bounded
state. Batch parity is asserted against the same-algebra batch anti-join.
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
from lyft_presto_spark.streaming.dedup_stream import digest_column
from lyft_presto_spark.streaming.ingest_gate_stream import (
    corpus_digest_index,
    gated_ingest,
    ingest_gate,
)

STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("arrival", TimestampType()),
    ]
)


def _land(df, src, wait=True):
    df.coalesce(1).write.mode("append").parquet(src)
    if wait:
        time.sleep(1.1)


def _clean_markers(src):
    for extra in os.listdir(src):
        if extra.startswith("_"):
            p = os.path.join(src, extra)
            (shutil.rmtree if os.path.isdir(p) else os.remove)(p)


def test_ingest_gate_drops_corpus_dups_stateless(spark, sf_dir, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("ingest_gate"))
    corpus = load_table(spark, sf_dir, "documents").limit(150).select("doc_id", "text")
    idx = corpus_digest_index(corpus)

    # Arrivals: 40 docs that duplicate corpus content (new ids), 30 novel
    # docs, landed across two micro-batches; one novel doc arrives TWICE
    # (within-feed duplicate) to exercise the composed pipeline.
    dup_of_corpus = (
        corpus.limit(40)
        .withColumn("doc_id", F.col("doc_id") + 5_000_000)
        .withColumn("arrival", F.expr("timestamp_seconds(1700000000 + doc_id % 30)"))
    )
    novel = spark.range(30).selectExpr(
        "id + 9000000 AS doc_id",
        "concat('novel ingest document number ', id, ' with unique content') AS text",
        "timestamp_seconds(1700000030 + id) AS arrival",
    )
    repeat = novel.limit(1).withColumn("doc_id", F.col("doc_id") + 777).withColumn(
        "arrival", F.expr("arrival + INTERVAL 40 SECONDS")
    )
    _land(dup_of_corpus.unionByName(novel.limit(15)), src)
    _land(novel.subtract(novel.limit(15)).unionByName(repeat), src, wait=False)
    _clean_markers(src)

    stream = (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = (
        gated_ingest(stream, idx, ts_col="arrival", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("ingest_gate_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("ingest_gate_out")

    # every corpus-duplicate arrival dropped; every novel doc admitted once
    assert out.filter("doc_id >= 5000000 AND doc_id < 9000000").count() == 0
    assert out.count() == 30  # 30 distinct novel contents, repeat suppressed
    # batch parity: the same-algebra static anti-join admits the same set
    arrivals = spark.read.schema(STREAM_SCHEMA).parquet(src)
    batch_admit = (
        arrivals.withColumn("digest", digest_column())
        .join(idx, "digest", "left_anti")
        .select("digest")
        .distinct()
    )
    got = {r.digest for r in out.select("digest").collect()}
    want = {r.digest for r in batch_admit.collect()}
    assert got == want


def test_ingest_gate_is_broadcast_and_stateless(spark, sf_dir):
    corpus = load_table(spark, sf_dir, "documents").limit(100).select("doc_id", "text")
    idx = corpus_digest_index(corpus)
    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value AS doc_id", "concat('doc ', value) AS text",
                    "timestamp AS arrival")
    )
    gated = ingest_gate(rate, idx)
    # a streaming frame cannot be optimized/executed outside a started
    # query — pin the join shape on the ANALYZED logical plan: an equi
    # LEFT ANTI against the static digest index (the Deduplicate in the
    # plan belongs to the STATIC side's distinct(), evaluated per
    # micro-batch, not to stream state)
    p = gated._jdf.queryExecution().analyzed().toString()
    assert "LeftAnti" in p
    q = (
        gated.writeStream.format("memory")
        .queryName("gate_plan_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # STATELESS: the gate-only query registers no state-store operators at
    # all (the composed gated_ingest adds exactly the watermarked dedup's)
    last = q.lastProgress
    assert last is None or (last["stateOperators"] or []) == []
