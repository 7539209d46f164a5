"""Streaming ANN index ingest: new embeddings coded against the FROZEN
coarse codebook and appended to the cell-partitioned index — the streaming
twin of the batch ``sim_ivf_index_upsert`` operator
(queries/similarity_queries.py), matching the ingest-gate discipline
(ingest_gate_stream.py): a standing artifact on the static side, per-batch
work proportional to the batch, exactly-once through idempotent publishes.

Per micro-batch: quantize (the same fix-point xq = round((x+4)*1e6) as the
batch PQ/IVF algebra), one distance round against the BROADCAST codebook
(K*D rows — tiny at any corpus scale), the exact cross-multiplied rational
argmin (bit-identical to ``_pq_assign_cte``'s fold — no floats, no
division), then an append published with the staging module's
atomic-rename protocol: each batch lands as a ``batch=<id>`` partition
directory, staged under a dot-prefixed dir (invisible to partition
discovery) and renamed into place. A foreachBatch RETRY of an
already-published batch id is a no-op — the _SUCCESS check makes the sink
idempotent, which together with the checkpoint's offset log is the
exactly-once contract (same mechanics as the write path's atomic publish,
operators/staging.py).

Scale notes (100 TB): the codebook broadcast is K*D rows regardless of
corpus size; coding work is batch-proportional (the upsert invariant); the
index stays partitioned by cell WITHIN each batch directory, so the
probe's cell predicate still prunes directories (``c=<cell>`` under every
``batch=<id>``); periodic re-cluster of overgrown cells remains the batch
compaction decision (sim_ivf_compaction) — streaming never retrains.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The same exact-integer algebra as the batch side (similarity_queries):
# fix-point quantization and the cross-multiplied rational argmin.
_XQ = "CAST(round((CAST(x AS DOUBLE) + 4.0) * 1000000, 0) AS BIGINT)"
_TERM = (
    "(CAST(n AS DECIMAL(20,0)) * CAST(xq AS DECIMAL(20,0)) "
    "- CAST(S AS DECIMAL(20,0)))"
)
_CMP = (
    "e.A * acc.n2 < acc.A * e.n2 OR "
    "(e.A * acc.n2 = acc.A * e.n2 AND e.c < acc.c)"
)


def quantized_flat(df: DataFrame, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """Explode embeddings to (vec_id, dim, xq) fix-point postings."""
    return df.select(
        F.col(id_col).alias("vec_id"), F.posexplode(vec_col).alias("pos", "x")
    ).selectExpr("vec_id", "pos + 1 AS dim", f"{_XQ} AS xq")


def code_against_codebook(batch: DataFrame, codebook: DataFrame) -> DataFrame:
    """Code a batch of embeddings against a frozen coarse codebook.

    ``codebook`` carries exact rational centroids (c, d, S, n) — the
    ``ccb2`` artifact the batch upsert trains (corpus-only, staged). One
    broadcast equi-join on the dimension, one partial-aggregated distance
    SUM per (vec, cell), and the exact fold argmin — bit-identical to the
    batch coding, so the streaming index and the batch census agree
    row-for-row. Returns (vec_id, dim, xq, c): the index rows to append.
    """
    flat = quantized_flat(batch)
    cb = F.broadcast(codebook.select("c", "d", "S", "n"))
    dists = (
        flat.join(cb, flat.dim == cb.d)
        .groupBy("vec_id", "c", "n")
        .agg(F.expr(f"CAST(SUM({_TERM} * {_TERM}) AS DECIMAL(38,0))").alias("A"))
        .selectExpr(
            "vec_id", "c", "A",
            "CAST(n AS DECIMAL(20,0)) * CAST(n AS DECIMAL(20,0)) AS n2",
        )
    )
    codes = (
        dists.groupBy("vec_id")
        .agg(F.expr("array_agg(struct(c, A, n2))").alias("arr"))
        .selectExpr(
            "vec_id",
            f"aggregate(slice(arr, 2, size(arr) - 1), element_at(arr, 1), "
            f"(acc, e) -> IF({_CMP}, e, acc)).c AS c",
        )
    )
    return flat.join(codes, "vec_id").select("vec_id", "dim", "xq", "c")


def publish_batch(coded: DataFrame, index_root: str, batch_id: int) -> bool:
    """Atomically publish one coded batch as a ``batch=<id>`` partition.

    Idempotent: a replayed batch id (foreachBatch retry after restart) is
    skipped on the _SUCCESS check, so the sink never duplicates — the
    exactly-once half the checkpoint's offset log cannot provide alone.
    The stage directory is dot-prefixed (partition discovery ignores it),
    and the rename is within one parent, so readers never observe a
    half-written batch. Returns True when this call published.
    """
    final = os.path.join(index_root, f"batch={batch_id}")
    if os.path.exists(os.path.join(final, "_SUCCESS")):
        return False
    stage = os.path.join(index_root, f".stage_{batch_id}_{uuid.uuid4().hex}")
    os.makedirs(index_root, exist_ok=True)
    coded.write.mode("errorifexists").partitionBy("c").parquet(stage)
    try:
        os.rename(stage, final)
    except OSError:
        # lost a concurrent-publish race: the winner's batch is the batch
        if not os.path.exists(os.path.join(final, "_SUCCESS")):
            raise
        shutil.rmtree(stage, ignore_errors=True)
        return False
    return True


def ann_ingest_query(stream: DataFrame, codebook: DataFrame, index_root: str,
                     checkpoint: str):
    """Build (not start) the streaming ingest writer.

    foreachBatch codes each micro-batch against the frozen broadcast
    codebook and publishes it atomically; callers pick the trigger
    (availableNow for backfill/drain, processingTime for tailing).
    """
    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        publish_batch(code_against_codebook(batch_df, codebook),
                      index_root, batch_id)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
    )
