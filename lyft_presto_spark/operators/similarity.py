"""Embedding similarity operators: cosine top-k and sign-bucket ANN.

Reference niche: cosine_similarity over maps (presto-main/.../scalar/
MathFunctions.java cosine_similarity) — generalized here to dense
``array<float>`` embedding columns, the shape an LLM training pipeline needs.

Spark side: ``aggregate``/``zip_with`` lambda HOFs — JVM codegen, sequential
left-to-right double accumulation. The DuckDB oracle uses the same sequential
reduction, so dot products are bit-identical; results are still rounded to 6
decimals as a belt-and-braces guard.

Scale path: brute-force top-k is the exactness baseline (one broadcast of the
query vector, a map-side partial top-k, no shuffle of the full table); the
sign-bucket variant prunes candidates by an equi-join on a coarse
quantization key — IVF-style, turning ANN into a bucket-partitioned scan.
"""

from __future__ import annotations

ROUND = 6


def dot(a: str, b: str, dialect: str) -> str:
    """Sequential double-precision dot product (order-stable in both engines)."""
    if dialect == "spark":
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
