"""Embedding similarity search over the ``embeddings`` fixture.

Generalizes the reference's cosine_similarity scalar (presto-main/.../scalar/
MathFunctions.java) to dense array<float> columns; adds the ANN shapes a
training pipeline needs (SURVEY.md §7 Phase 6).

Scale notes (100 TB):
- ``sim_topk_bruteforce``: the query vector is a scalar-subquery broadcast;
  the scan is map-side only with a partial top-k per partition folded by a
  final ``TakeOrderedAndProject`` — no wide shuffle.
- ``sim_topk_signbucket``: IVF-style — candidates pruned by an equi-filter on
  a coarse sign-quantization key, so the scan prunes to ~1/256 of rows before
  any distance math (and would partition-prune if the table were written
  bucketed by ``bucket``).
- ``sim_pairs_blocked``: pairwise similarity only *within* label blocks —
  a partitioned self-join on the blocking key, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import similarity as S
from .registry import query, sql_over

TOP_K = 10
QUERY_VEC_ID = 0


def _topk_sql(dialect: str) -> str:
    cos = S.cosine("e.embedding", "q.embedding", dialect)
    return f"""
WITH q AS (
    SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
)
SELECT e.vec_id, e.label, {cos} AS cosine_sim
FROM embeddings e CROSS JOIN q
WHERE e.vec_id <> {QUERY_VEC_ID}
ORDER BY cosine_sim DESC, e.vec_id
LIMIT {TOP_K}
"""


@query(
    "sim_topk_bruteforce",
    oracle=_topk_sql("duck"),
    doc="Exact cosine top-k for one query vector: broadcast query vec, "
    "map-side scan + TakeOrderedAndProject (no wide shuffle).",
    tags=("similarity",),
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    S.register_vector_udfs(spark)
    return sql_over(spark, sf_dir, _topk_sql("spark"), ("embeddings",))


def _signbucket_sql(dialect: str) -> str:
    cos = S.cosine("e.embedding", "q.embedding", dialect)
    bucket_e = S.sign_bucket("e.embedding", dialect)
    bucket_q = S.sign_bucket("q.embedding", dialect)
    return f"""
WITH q AS (
    SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
)
SELECT e.vec_id, e.label, {cos} AS cosine_sim
FROM embeddings e CROSS JOIN q
WHERE e.vec_id <> {QUERY_VEC_ID}
  AND {bucket_e} = {bucket_q}
ORDER BY cosine_sim DESC, e.vec_id
LIMIT {TOP_K}
"""


@query(
    "sim_topk_signbucket",
    oracle=_signbucket_sql("duck"),
    doc="ANN top-k via sign-bit coarse quantization (IVF-style): candidates "
    "restricted to the query's bucket before any distance computation.",
    tags=("similarity",),
)
def sim_topk_signbucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    S.register_vector_udfs(spark)
    return sql_over(spark, sf_dir, _signbucket_sql("spark"), ("embeddings",))


def _pairs_sql(dialect: str) -> str:
    cos = S.cosine("a.embedding", "b.embedding", dialect)
    return f"""
WITH blocked AS (
    SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
           {cos} AS cosine_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT label,
       count(*) AS n_pairs,
       CAST(sum(CASE WHEN cosine_sim >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_similar,
       round(max(cosine_sim), 6) AS max_sim,
       round(min(cosine_sim), 6) AS min_sim
FROM blocked
GROUP BY label
ORDER BY label
"""


@query(
    "sim_pairs_blocked",
    oracle=_pairs_sql("duck"),
    doc="Per-label pairwise cosine stats: self-join blocked on label "
    "(partitioned shuffle join on the blocking key, never all-pairs).",
    tags=("similarity",),
)
def sim_pairs_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    S.register_vector_udfs(spark)
    return sql_over(spark, sf_dir, _pairs_sql("spark"), ("embeddings",))


def _centroid_sql(dialect: str) -> str:
    # Per-label centroid norm + dispersion: aggregation over array columns via
    # position explode (the only shuffle is the groupBy on (label, pos)).
    if dialect == "spark":
        exploded = (
            "SELECT label, pos, CAST(v AS DOUBLE) AS v "
            "FROM embeddings LATERAL VIEW posexplode(embedding) AS pos, v"
        )
    else:
        exploded = (
            "SELECT label, generate_subscripts(embedding, 1) - 1 AS pos, "
            "CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings"
        )
    return f"""
WITH flat AS (
    {exploded}
),
centroid AS (
    SELECT label, pos, avg(v) AS c, count(*) AS n
    FROM flat
    GROUP BY label, pos
)
SELECT label,
       max(n) AS n_vectors,
       round(sqrt(sum(c * c)), 6) AS centroid_norm
FROM centroid
GROUP BY label
ORDER BY label
"""


@query(
    "sim_label_centroids",
    oracle=_centroid_sql("duck"),
    doc="Per-label centroid norms via posexplode + two-level aggregation "
    "(partial aggregates map-side; one shuffle on (label,pos)).",
    tags=("similarity",),
)
def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _centroid_sql("spark"), ("embeddings",))


@query(
    "sim_topk_ivf",
    oracle=None,  # KMeans training is iterative — recall-tested in tests/test_ivf.py
    doc="IVF ANN top-k: MLlib KMeans cells + nprobe-nearest-cell search "
    "(learned counterpart of sim_topk_signbucket; presto-ml niche analog). "
    "Rows-only for the driver; correctness = recall bounds vs brute force.",
    tags=("similarity",),
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ivf import ensure_ivf_index, ivf_topk
    from .registry import t

    emb = t(spark, sf_dir, "embeddings")
    query_vec = list(emb.filter(f"vec_id = {QUERY_VEC_ID}").collect()[0]["embedding"])
    # Build-once/probe-many: the index is a persisted cell-partitioned table
    # (rebuilt only when missing); each query is a partition-pruned probe.
    assigned, centroids = ensure_ivf_index(
        spark, emb.filter(f"vec_id <> {QUERY_VEC_ID}"), key=f"{sf_dir}:no_query_vec", k=16
    )
    return ivf_topk(assigned, centroids, query_vec, top_k=TOP_K, nprobe=4)


# --- batch kNN join (many-query top-k) -------------------------------------

KNN_K = 5
KNN_QUERY_STRIDE = 100  # query set = vec_id % stride == 0 (bounded sample)


def _knn_join_sql(dialect: str) -> str:
    cos = S.cosine("e.embedding", "q.q_emb", dialect)
    return f"""
WITH q AS (
    SELECT vec_id AS q_id, embedding AS q_emb
    FROM embeddings WHERE vec_id % {KNN_QUERY_STRIDE} = 0
),
scored AS (
    SELECT q.q_id, e.vec_id, e.label, {cos} AS cosine_sim
    FROM embeddings e JOIN q ON e.vec_id <> q.q_id
),
ranked AS (
    SELECT q_id, vec_id, label, cosine_sim,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cosine_sim DESC, vec_id) AS rn
    FROM scored
)
SELECT q_id, rn AS rank, vec_id, label, round(cosine_sim, 6) AS cosine_sim
FROM ranked WHERE rn <= {KNN_K}
ORDER BY q_id, rank
"""


@query(
    "sim_knn_join",
    oracle=_knn_join_sql("duck"),
    doc="Batch kNN join: top-k cosine neighbors for EVERY vector in a "
    "bounded query set (the many-query generalization of sim_topk — the "
    "clustering/dedup-candidate input shape). The query side broadcasts "
    "(bounded sample, never the corpus); scoring is one pass over the "
    "corpus with the Arrow-batched cosine; per-query top-k is a window "
    "over q_id. Scale path for unbounded query sets is the IVF index "
    "(operators/ivf.py) probed per query.",
    tags=("similarity",),
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    S.register_vector_udfs(spark)
    return sql_over(spark, sf_dir, _knn_join_sql("spark"), ("embeddings",))
