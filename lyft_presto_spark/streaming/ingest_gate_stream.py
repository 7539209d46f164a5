"""Streaming ingest gate: new documents deduplicated against a STANDING
corpus index as they arrive — the streaming twin of the batch
``dedup_incremental_delta`` operator (queries/dedup_queries.py).

A training-data pipeline's firehose form of the per-ingest gate: the
standing corpus's digest index is a static (in production: durable,
table-staged — operators/staging.py) relation; each micro-batch of
arriving documents LEFT ANTI joins it on the content digest, so a doc
whose exact content already exists in the corpus never reaches the sink.
The gate itself is STATELESS: a stream-static join re-plans the static
side per micro-batch and Spark broadcasts the bounded digest index (plan
pinned in tests/test_streaming_ingest_gate.py, the same
broadcast-the-static-side discipline as geofence_stream). Within-feed
duplicates are a separate concern with different state economics —
``gated_ingest`` composes the gate with watermark-bounded
``dropDuplicatesWithinWatermark`` (dedup_stream's machinery), so total
state is bounded by the duplicate-arrival window, never by corpus size.

Scale notes: at 100 TB the corpus digest index is large but 16 bytes/doc;
when it outgrows broadcast the same plan degrades gracefully to a
shuffled stream-static join on the digest — still one equi-key, still
stateless. Near-dup gating (the posting-join half of the batch operator)
stays batch: its candidate joins need the full posting index per arrival,
which is a per-micro-batch scan economics decision, not a semantics gap
— the batch operator runs as the compaction pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .dedup_stream import digest_column


def corpus_digest_index(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """The standing index: distinct content digests of the corpus.

    In production this is built once and table-staged (durable, shared by
    every ingest job); here it is derived from the corpus frame with the
    SAME normalization/digest as the batch operator and dedup_stream, so
    all three gates agree byte-for-byte on what "already exists" means.
    """
    return corpus.select(digest_column(text_col).alias("digest")).distinct()


def ingest_gate(
    stream: DataFrame, corpus_digests: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Pass only documents whose content is NOT in the standing corpus.

    Stateless stream-static LEFT ANTI equi-join on the digest; the static
    side is bounded and broadcasts.
    """
    arriving = stream.withColumn("digest", digest_column(text_col))
    return arriving.join(corpus_digests, "digest", "left_anti")


def gated_ingest(
    stream: DataFrame,
    corpus_digests: DataFrame,
    ts_col: str,
    watermark: str = "10 minutes",
    text_col: str = "text",
) -> DataFrame:
    """Corpus gate + within-feed dedup: the full ingest admission path.

    Novel-vs-corpus is the stateless anti-join above; duplicates WITHIN
    the feed (two crawlers submitting the same page in one window) are
    then suppressed with watermark-bounded digest state — the composed
    state is O(arrival window), independent of corpus size.
    """
    gated = ingest_gate(stream, corpus_digests, text_col=text_col)
    return gated.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["digest"]
    )
