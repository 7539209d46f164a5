"""Streaming exact deduplication: content-digest dropDuplicates with
watermark-bounded state.

The batch twin is queries/dedup_queries.py dedup_exact (digest hash-agg,
keep-first). On an unbounded feed the digest set must live in state; the
scale-correct variant is ``dropDuplicatesWithinWatermark`` — state for a
digest is retired once the watermark passes it, so memory is bounded by the
duplicate-arrival window, not the stream's lifetime. Plain
``dropDuplicates`` (unbounded state) is kept for exactly-once dedup of
keyed streams where the key space itself is bounded.

Scale notes: the digest is computed map-side (JVM md5 over normalized
text); state stores only the 128-bit digest + watermark timestamp. One
shuffle on the digest — the same shape as the batch operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def digest_column(text_col: str = "text") -> "F.Column":
    """Normalized-content digest, identical to the batch dedup_exact digest."""
    norm = F.array_join(
        F.filter(
            F.split(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "), " "),
            lambda t: t != "",
        ),
        " ",
    )
    return F.md5(norm)


def dedup_stream(docs: DataFrame, ts_col: str, watermark: str = "10 minutes") -> DataFrame:
    """Watermark-bounded streaming exact dedup (state retired after the
    duplicate-arrival window passes)."""
    return (
        docs.withColumn("digest", digest_column())
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["digest"])
    )


def dedup_stream_keyed(rows: DataFrame, key_cols: list[str]) -> DataFrame:
    """Exactly-once keyed dedup (unbounded state — for bounded key spaces)."""
    return rows.dropDuplicates(key_cols)
