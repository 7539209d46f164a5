"""Streaming/batch parity: the availableNow drain must equal the batch rollup.

The reference has no streaming to mirror (SURVEY.md §2.9); the correctness
bar for this extension is internal consistency — incremental execution over
the same files produces the same aggregate as the batch plan.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from lyft_presto_spark.session import load_table
from lyft_presto_spark.streaming import (
    run_availablenow_to_memory,
    stream_events,
    tumbling_counts,
)


def test_stream_matches_batch(spark, sf_dir, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("events_stream"))
    # Re-write the fixture as several files so the stream takes multiple
    # micro-batches (maxFilesPerTrigger=4 -> at least 2 triggers).
    load_table(spark, sf_dir, "events").withColumn(
        "ts", F.expr("unix_micros(ts) * 1000")
    ).repartition(8).write.mode("overwrite").parquet(src)
    for extra in os.listdir(src):
        if extra.startswith("_"):
            path = os.path.join(src, extra)
            (shutil.rmtree if os.path.isdir(path) else os.remove)(path)

    streamed = run_availablenow_to_memory(
        tumbling_counts(stream_events(spark, src)), "stream_tumbling"
    )

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
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

    s = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert len(s) == len(b) > 0
    assert s == b


def test_stream_static_enrichment_matches_batch(spark, sf_dir, tmp_path_factory):
    from lyft_presto_spark.streaming import enriched_stream

    src = str(tmp_path_factory.mktemp("events_enrich"))
    load_table(spark, sf_dir, "events").withColumn(
        "ts", F.expr("unix_micros(ts) * 1000")
    ).repartition(8).write.mode("overwrite").parquet(src)
    for extra in os.listdir(src):
        if extra.startswith("_"):
            path = os.path.join(src, extra)
            (shutil.rmtree if os.path.isdir(path) else os.remove)(path)

    dim = load_table(spark, sf_dir, "customer")
    streamed = run_availablenow_to_memory(
        enriched_stream(stream_events(spark, src), dim), "stream_enriched"
    )

    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.join(
            dim.selectExpr("c_custkey AS user_id", "c_nationkey"), "user_id", "left"
        )
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "c_nationkey", "n_events", "total_value")
    )
    s = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert s == b and len(b) > 0


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path_factory):
    """attribution_pairs as a watermarked stream-stream join == its batch twin.

    Both sides of the join come from the same unbounded file stream; Spark
    buffers each side's state bounded by watermark + the 30-minute horizon,
    keyed on user_id. The availableNow drain must produce exactly the pairs
    the batch interval join produces.
    """
    import os
    import shutil

    from lyft_presto_spark.streaming import attribution_pairs

    src = str(tmp_path_factory.mktemp("events_join_stream"))
    load_table(spark, sf_dir, "events").withColumn(
        "ts", F.expr("unix_micros(ts) * 1000")
    ).repartition(8).write.mode("overwrite").parquet(src)
    for extra in os.listdir(src):
        if extra.startswith("_"):
            path = os.path.join(src, extra)
            (shutil.rmtree if os.path.isdir(path) else os.remove)(path)

    result = attribution_pairs(stream_events(spark, src))
    q = (
        result.writeStream.format("memory")
        .queryName("stream_attr")
        .outputMode("append")  # stream-stream inner joins emit append-only
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table("stream_attr")

    batch = attribution_pairs(load_table(spark, sf_dir, "events"), watermark=None)

    s = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert len(s) == len(b) > 0
    assert s == b


def test_checkpoint_restart_exactly_once(spark, sf_dir, tmp_path_factory):
    """Stop/restart with a checkpoint neither loses nor duplicates input.

    The exactly-once contract a production pipeline rests on: run 1 drains
    the first half of the files and stops; run 2 restarts from the same
    checkpointLocation after the second half lands and must produce exactly
    the batch-equivalent totals — file-source offsets + sink commit log do
    the dedup, no operator help needed.
    """
    import os
    import shutil

    base = tmp_path_factory.mktemp("events_ckpt")
    src, ckpt, out = str(base / "src"), str(base / "ckpt"), str(base / "out")
    os.makedirs(src)

    ev = load_table(spark, sf_dir, "events").withColumn("ts", F.expr("unix_micros(ts) * 1000"))
    half1 = ev.filter("event_id % 2 = 0")
    half2 = ev.filter("event_id % 2 = 1")
    stage = str(base / "stage1")
    half1.coalesce(2).write.parquet(stage)
    for f in os.listdir(stage):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(stage, f), os.path.join(src, "a_" + f))

    def run_once():
        q = (
            stream_events(spark, src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # drains half 1, commits offsets, stops
    n_after_first = spark.read.parquet(out).count()
    assert n_after_first == half1.count()

    stage2 = str(base / "stage2")
    half2.coalesce(2).write.parquet(stage2)
    for f in os.listdir(stage2):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(stage2, f), os.path.join(src, "b_" + f))

    run_once()  # restart from checkpoint: processes ONLY the new files
    got = spark.read.parquet(out)
    assert got.count() == ev.count()  # no loss, no duplicates
    dec_sum = F.sum(F.col("value").cast("decimal(18,2)"))  # order-independent exact total
    assert got.select(dec_sum).collect()[0][0] == ev.select(dec_sum).collect()[0][0]


def test_burst_stream_matches_batch(spark, sf_dir, tmp_path_factory):
    """Streaming burst detector == batch lag-gap-cumsum twin on one dataset.

    The fixture has ~1 error per user (no bursts), so the test synthesizes a
    dataset with known structure: users 0..49 get a 4-error burst (5-min
    spacing) followed by a lone error 2 h later (which closes the burst and
    leaves only a length-1 chain open at drain — below BURST_MIN, so nothing
    is lost by never flushing it); users 50..59 get 2-chains that must NOT
    count. Batch side = the registered query's SQL over the same data.
    """
    import os
    import shutil

    from lyft_presto_spark.queries.events import _BURSTS_SQL_SPARK
    from lyft_presto_spark.streaming import burst_stream

    base_us = 1_700_000_000_000_000
    rows = []
    eid = 0
    for u in range(50):  # one genuine 4-burst + a lone closer
        for j in range(4):
            rows.append((eid, (base_us + u * 10_000_000 + j * 300_000_000) * 1000, u)); eid += 1
        rows.append((eid, (base_us + u * 10_000_000 + 2 * 3_600_000_000) * 1000, u)); eid += 1
    for u in range(50, 60):  # 2-chains: below BURST_MIN
        for j in range(2):
            rows.append((eid, (base_us + u * 10_000_000 + j * 300_000_000) * 1000, u)); eid += 1

    synth = spark.createDataFrame(
        [(e, t, u, "error", 1.0, "{}") for (e, t, u) in rows],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    src_dir = str(tmp_path_factory.mktemp("events_burst_stream"))
    # The operator's documented contract is per-key time-ordered ARRIVAL
    # (Kafka's per-key partition order). Model it deterministically: 8
    # time-slice files with strictly increasing mtimes, so the file source
    # (oldest-first) feeds two 4-file micro-batches in time order — a
    # random file split would hand batch 2 events OLDER than batch 1 state,
    # which no gap-chain operator can fold without watermark buffering.
    import time as _time

    slices = synth.repartitionByRange(8, "ts")
    stage = str(tmp_path_factory.mktemp("burst_slices"))
    os.makedirs(src_dir, exist_ok=True)
    slices.write.mode("overwrite").parquet(stage)
    parts = sorted(f for f in os.listdir(stage) if f.endswith(".parquet"))
    now = _time.time()
    for i, f in enumerate(parts):
        dst = os.path.join(src_dir, f"slice_{i:02d}.parquet")
        shutil.copy(os.path.join(stage, f), dst)
        os.utime(dst, (now + i, now + i))

    result = burst_stream(stream_events(spark, src_dir))
    q = (
        result.writeStream.format("memory")
        .queryName("stream_bursts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = (
        spark.table("stream_bursts")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_bursts"),
            F.max("burst_len").cast("long").alias("max_burst_len"),
            F.sum("burst_len").cast("long").alias("errors_in_bursts"),
        )
    )

    synth.withColumn("ts", F.expr("timestamp_micros(ts div 1000)")).createOrReplaceTempView(
        "burst_synth"
    )
    batch = spark.sql(_BURSTS_SQL_SPARK.replace("FROM events", "FROM burst_synth"))

    s = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert len(s) == len(b) == 50
    assert s == b
    assert all(r[1:] == (1, 4, 4) for r in s)  # exactly one 4-burst per user


def test_burst_stream_idle_timeout_flushes_tail_burst(spark, tmp_path_factory):
    """A tail burst with NO later event from its user must still flush once
    other keys advance the watermark past its gap (ADVICE r3: NoTimeout left
    such chains unemitted forever and retained their state forever)."""
    import os
    import shutil
    import time as _time

    from lyft_presto_spark.streaming import burst_stream
    from lyft_presto_spark.streaming.events_stream import stream_events

    base_us = 1_700_000_000_000_000
    rows = []
    # user 0: a 4-burst (5-min spacing) and nothing else — previously stuck open.
    for j in range(4):
        rows.append((j, (base_us + j * 300_000_000) * 1000, 0))
    # user 1: activity 6 h later in a LATER slice — advances the watermark
    # (10-min delay) far past user 0's last_error + gap.
    rows.append((4, (base_us + 6 * 3_600_000_000) * 1000, 1))

    synth = spark.createDataFrame(
        [(e, t, u, "error", 1.0, "{}") for (e, t, u) in rows],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    src_dir = str(tmp_path_factory.mktemp("events_burst_timeout"))
    stage = str(tmp_path_factory.mktemp("burst_timeout_slices"))
    synth.repartitionByRange(2, "ts").write.mode("overwrite").parquet(stage)
    parts = sorted(f for f in os.listdir(stage) if f.endswith(".parquet"))
    now = _time.time()
    os.makedirs(src_dir, exist_ok=True)
    for i, f in enumerate(parts):
        dst = os.path.join(src_dir, f"slice_{i:02d}.parquet")
        shutil.copy(os.path.join(stage, f), dst)
        os.utime(dst, (now + i, now + i))

    # maxFilesPerTrigger=4 would merge both slices into one batch, leaving the
    # watermark at 0 while user 0's group is processed; force 1 file per batch
    # so the second slice's watermark fires user 0's timeout.
    raw = (
        spark.readStream.schema(
            "event_id long, ts long, user_id long, event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    q = (
        burst_stream(raw)
        .writeStream.format("memory")
        .queryName("stream_bursts_timeout")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.table("stream_bursts_timeout").select("user_id", "burst_len").collect()}
    assert got == {(0, 4)}  # the tail burst flushed via the event-time timeout
