"""Streaming ANN index ingest: the streaming twin of sim_ivf_index_upsert.

New embeddings arrive as a stream, are coded against the FROZEN coarse
codebook (broadcast, batch-proportional work), and land in the
cell-partitioned index through idempotent atomic publishes — exactly-once
across stop/restart, bit-identical to the batch upsert coding (parity
asserted against the registered query's per-cell census).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from lyft_presto_spark.plans import assert_broadcast_join, assert_no_cartesian
from lyft_presto_spark.queries import all_queries
from lyft_presto_spark.queries.similarity_queries import (
    _UPSERT_BATCH_MOD,
    _upsert_staged,
)
from lyft_presto_spark.session import load_table
from lyft_presto_spark.streaming.ann_ingest_stream import (
    ann_ingest_query,
    code_against_codebook,
    publish_batch,
)

STREAM_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _frozen_codebook(spark, sf_dir):
    """The corpus-only coarse codebook the batch upsert trains (staged)."""
    return spark.table(_upsert_staged(spark, sf_dir)["ccb2"])


def _arriving(spark, sf_dir):
    """The late-arriving vectors — the same batch the registered query codes."""
    m = _UPSERT_BATCH_MOD
    return (
        load_table(spark, sf_dir, "embeddings")
        .filter(f"vec_id % {m} = {m - 1}")
        .select("vec_id", "embedding")
    )


def test_ann_ingest_restart_exactly_once_and_batch_parity(
    spark, sf_dir, tmp_path_factory
):
    """Stop/restart neither loses nor duplicates vectors, and the streamed
    index agrees with the batch upsert census per cell."""
    base = tmp_path_factory.mktemp("ann_ingest")
    src, ckpt, idx = str(base / "src"), str(base / "ckpt"), str(base / "idx")
    os.makedirs(src)

    cb = _frozen_codebook(spark, sf_dir)
    batch = _arriving(spark, sf_dir)
    half1 = batch.filter("vec_id % 2 = 0")
    half2 = batch.filter("vec_id % 2 = 1")
    n1, n2 = half1.count(), half2.count()
    assert n1 > 0 and n2 > 0
    dims = batch.select(F.size("embedding").alias("d")).distinct().collect()
    assert len(dims) == 1
    d = dims[0].d

    half1.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema(STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = ann_ingest_query(stream, cb, idx, ckpt).trigger(availableNow=True).start()
        q.awaitTermination()

    run_once()  # drains half 1, commits offsets, stops
    got1 = spark.read.parquet(idx)
    assert got1.count() == n1 * d  # every vector fully landed, once
    assert got1.select("vec_id").distinct().count() == n1

    half2.coalesce(1).write.mode("append").parquet(src)
    run_once()  # restart from checkpoint: codes ONLY the new arrivals
    got = spark.read.parquet(idx)
    assert got.count() == (n1 + n2) * d  # no loss, no duplicates
    assert got.select("vec_id").distinct().count() == n1 + n2

    # cell partitioning survives inside every batch directory (the probe's
    # pruning contract): batch=*/c=* on disk
    batch_dirs = [p for p in os.listdir(idx) if p.startswith("batch=")]
    assert batch_dirs
    for b in batch_dirs:
        subdirs = [p for p in os.listdir(os.path.join(idx, b)) if p.startswith("c=")]
        assert subdirs, f"{b} lost its cell partitioning"

    # batch parity 1: the streamed coding equals the batch coding per vector
    want = {
        (r.vec_id, r.c)
        for r in code_against_codebook(batch, cb).select("vec_id", "c").distinct().collect()
    }
    have = {(r.vec_id, r.c) for r in got.select("vec_id", "c").distinct().collect()}
    assert have == want

    # batch parity 2: per-cell vector counts equal the registered upsert
    # census's n_batch column (the oracle-checked batch twin)
    census = {
        r.cell: r.n_batch
        for r in all_queries()["sim_ivf_index_upsert"].spark(spark, sf_dir).collect()
        if r.n_batch > 0
    }
    streamed = {
        r.c: r.n
        for r in got.groupBy("c").agg(F.countDistinct("vec_id").alias("n")).collect()
    }
    assert streamed == census


def test_publish_batch_replay_is_noop(spark, sf_dir, tmp_path):
    """A foreachBatch retry of an already-published batch id must not
    duplicate index rows — the idempotence half of exactly-once."""
    idx = str(tmp_path / "idx")
    cb = _frozen_codebook(spark, sf_dir)
    coded = code_against_codebook(_arriving(spark, sf_dir).limit(5), cb)
    assert publish_batch(coded, idx, 0) is True
    n = spark.read.parquet(idx).count()
    assert publish_batch(coded, idx, 0) is False  # replay: skipped
    assert spark.read.parquet(idx).count() == n
    assert publish_batch(coded, idx, 1) is True  # a NEW batch still lands
    assert spark.read.parquet(idx).count() == 2 * n


def test_coding_plan_broadcasts_codebook(spark, sf_dir):
    """The per-batch coding join must broadcast the codebook (K*D rows at
    any corpus scale) and contain no cartesian — the stream-static
    discipline ingest_gate_stream pins."""
    cb = _frozen_codebook(spark, sf_dir)
    coded = code_against_codebook(_arriving(spark, sf_dir), cb)
    assert_broadcast_join(coded, expect=True)
    assert_no_cartesian(coded)


def _corpus_index(spark, sf_dir):
    """The standing corpus index (vec_id, dim, xq, c) the gate consumes —
    the same staged artifacts the batch gate reads."""
    v = _upsert_staged(spark, sf_dir)
    return spark.sql(
        f"SELECT f.vec_id, f.dim, f.xq, cl.c FROM {v['cflatc']} f "
        f"JOIN {v['cells']} cl ON cl.vec_id = f.vec_id"
    )


def test_semantic_gate_matches_batch_twin(spark, sf_dir):
    """The streaming gate's verdicts must be row-identical to the
    registered (oracle-checked) batch twin dedup_semantic_incremental."""
    from lyft_presto_spark.queries.dedup_queries import _SEMANTIC_L2Q_T
    from lyft_presto_spark.streaming.ann_ingest_stream import semantic_gate

    cb = _frozen_codebook(spark, sf_dir)
    got = {
        r.vec_id: (r.verdict, r.matched_vec, r.l2q_dist)
        for r in semantic_gate(
            _arriving(spark, sf_dir), cb, _corpus_index(spark, sf_dir),
            _SEMANTIC_L2Q_T,
        ).collect()
    }
    want = {
        r.vec_id: (r.verdict, r.matched_vec, r.l2q_dist)
        for r in all_queries()["dedup_semantic_incremental"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == want
    assert {v[0] for v in want.values()} == {"dup", "keep"}  # non-vacuous


def test_gated_ann_ingest_admits_only_novel_with_restart(
    spark, sf_dir, tmp_path_factory
):
    """Gate + append composed: across a stop/restart, the index holds
    exactly the keep-verdict vectors, once each."""
    from lyft_presto_spark.queries.dedup_queries import _SEMANTIC_L2Q_T
    from lyft_presto_spark.streaming.ann_ingest_stream import (
        gated_ann_ingest_query,
        semantic_gate,
    )

    base = tmp_path_factory.mktemp("gated_ann")
    src, ckpt, idx = str(base / "src"), str(base / "ckpt"), str(base / "idx")
    os.makedirs(src)

    cb = _frozen_codebook(spark, sf_dir)
    cidx = _corpus_index(spark, sf_dir)
    batch = _arriving(spark, sf_dir)
    batch.filter("vec_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema(STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            gated_ann_ingest_query(stream, cb, cidx, _SEMANTIC_L2Q_T, idx, ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    batch.filter("vec_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    run_once()  # restart from checkpoint

    keep = {
        r.vec_id
        for r in semantic_gate(batch, cb, cidx, _SEMANTIC_L2Q_T).collect()
        if r.verdict == "keep"
    }
    got = spark.read.parquet(idx)
    assert {r.vec_id for r in got.select("vec_id").distinct().collect()} == keep
    d = batch.select(F.size("embedding")).first()[0]
    assert got.count() == len(keep) * d  # once each, fully landed
