"""Embedding similarity operators: cosine top-k and sign-bucket ANN.

Reference niche: cosine_similarity over maps (presto-main/.../scalar/
MathFunctions.java cosine_similarity) — generalized here to dense
``array<float>`` embedding columns, the shape an LLM training pipeline needs.

Spark side: an Arrow-batched pandas UDF doing one numpy matrix product per
batch (``register_vector_udfs``). Lambda HOFs (``aggregate``/``zip_with``)
execute *interpreted* in Spark — ~1e5 evals/s vs ~1e7 for codegen — which is
a ~100x constant factor on every vector at 100 TB (VERDICT r1 item 3). The
vectorized UDF pays one Arrow transfer per batch and then runs at BLAS speed.
The DuckDB oracle keeps the sequential lambda reduction; float64 summation
order can differ in the last bits, so results are rounded to 6 decimals
(values are O(1) cosines — a 1e-12 drift never moves the 6th decimal).

Scale path: brute-force top-k is the exactness baseline (one broadcast of the
query vector, a map-side partial top-k, no shuffle of the full table); the
sign-bucket variant prunes candidates by an equi-join on a coarse
quantization key — IVF-style, turning ANN into a bucket-partitioned scan.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

ROUND = 6

_UDFS_REGISTERED: set[str] = set()


def register_vector_udfs(spark: SparkSession) -> None:
    """Register ``cosine_sim_v(a, b) -> double`` (Arrow-batched, numpy).

    Idempotent per session (keyed by applicationId so a recycled id() of a
    stopped session never skips registration); queries call this before
    emitting SQL that uses the vectorized cosine.
    """
    from ..session import session_key

    if session_key(spark) in _UDFS_REGISTERED:
        return
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    # No parameter annotations: under `from __future__ import annotations`
    # they become strings and pandas_udf's hint inference rejects them.
    @pandas_udf(DoubleType())
    def cosine_sim_v(a, b):
        # One BLAS batch per Arrow chunk: float32 inputs upcast to float64
        # so precision matches the oracle's double accumulation.
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(den > 0, num / den, 0.0)
        return pd.Series(out)

    spark.udf.register("cosine_sim_v", cosine_sim_v)
    _UDFS_REGISTERED.add(session_key(spark))


def dot(a: str, b: str, dialect: str) -> str:
    """Sequential double-precision dot product (oracle-side reduction)."""
    if dialect == "spark":
        # Interpreted-HOF form: kept ONLY for tests that pin the semantic
        # equivalence of the vectorized path; never used in registered
        # queries' hot path.
        return (
            f"aggregate(zip_with(CAST({a} AS ARRAY<DOUBLE>), CAST({b} AS ARRAY<DOUBLE>), "
            f"(x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (acc, v) -> acc + v)"
    )


def cosine(a: str, b: str, dialect: str) -> str:
    """Rounded cosine similarity — vectorized on Spark, lambda-HOF in DuckDB."""
    if dialect == "spark":
        return (
            f"round(cosine_sim_v(CAST({a} AS ARRAY<DOUBLE>), "
            f"CAST({b} AS ARRAY<DOUBLE>)), {ROUND})"
        )
    return (
        f"round({dot(a, b, dialect)} / "
        f"(sqrt({dot(a, a, dialect)}) * sqrt({dot(b, b, dialect)})), {ROUND})"
    )


SIGN_BITS = 8  # coarse quantization: sign of the first 8 dimensions


def sign_bucket(v: str, dialect: str) -> str:
    """IVF-style bucket id: packed sign bits of the leading dimensions."""
    terms = []
    for i in range(1, SIGN_BITS + 1):
        idx = f"element_at({v}, {i})" if dialect == "spark" else f"{v}[{i}]"
        terms.append(f"(CASE WHEN {idx} > 0 THEN {1 << (i - 1)} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"
