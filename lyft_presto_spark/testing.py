"""Differential-testing harness: Spark result vs DuckDB oracle.

Mirrors the reference's two correctness mechanisms (SURVEY.md §5):
- QueryAssertions.assertQuery against an H2 oracle
  (presto-tests/src/main/java/io/prestosql/tests/QueryAssertions.java:97)
- presto-verifier's two-engine diff
  (presto-verifier/src/main/java/io/prestosql/verifier/PrestoVerifier.java)

The driver's comparator sorts columns by name and hashes values
order-insensitively; this harness is intentionally *stricter* (exact value
equality after canonical sorting) so any driver-visible mismatch is caught
locally first.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .session import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with every fixture table registered as a view (driver analog)."""
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v):
    """Canonicalize one value for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        # Deliberately NOT coerced to float: a Spark DECIMAL output column
        # arrives in pandas as object-dtype Decimal while DuckDB hands back
        # float64 — the driver's value hash sees different reprs. Keeping the
        # Decimal makes the type-strict compare fail locally first; queries
        # must CAST decimal outputs to DOUBLE/BIGINT explicitly.
        return v
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, (pd.Timestamp, np.datetime64, datetime.datetime, datetime.date)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    """Sort columns by name, canonicalize cells, sort rows — order-insensitive form."""
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))


class OracleMismatch(AssertionError):
    pass


def assert_driver_hashable(spark_df: DataFrame, name: str = "?") -> None:
    """Reject Array/Map-typed output columns — the driver cannot score them.

    The driver's canonicalizer sorts results with pandas ``sort_values``
    over all columns, and pandas cannot factorize/hash Python lists or
    dicts (``TypeError: unhashable type: 'list'`` before any comparison
    runs — the r13 ``fn_presto_compat`` red row). This repo's own
    ``canonicalize`` below is deliberately more permissive (type-aware
    pure-Python sort), which is exactly how that row slipped through; this
    gate pins the *driver's* limitation the way tests/test_bench_contract
    pins the metric-line contract. Queries that pin array/map semantics
    must serialize the column (array_join / to_json) in BOTH dialects.

    Nesting counts (ADVICE r14): a struct<a: array<int>> column becomes a
    Row holding a Python list after toPandas — the exact unhashable-cell
    failure — so the check matches array</map< anywhere in the type string,
    not only at the top level.
    """
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in spark_df.schema.fields
        if "array<" in f.dataType.simpleString() or "map<" in f.dataType.simpleString()
    ]
    if bad:
        raise OracleMismatch(
            f"[{name}] driver-unhashable output columns (pandas sort_values "
            f"cannot hash list/dict cells): {bad} — serialize via "
            f"array_join/to_json in both dialects"
        )


def compare_with_oracle(
    spark_df: DataFrame,
    oracle_sql: str,
    sf_dir: str,
    name: str = "?",
    float_rel_tol: float = 0.0,
) -> None:
    """Assert a Spark result matches the DuckDB oracle exactly (modulo order).

    ``float_rel_tol=0`` by default: the query inventory's numeric-stability
    convention (exact decimal accumulation) makes results bit-identical, so a
    nonzero tolerance is a per-query opt-out, not the norm.
    """
    assert_driver_hashable(spark_df, name=name)
    spark_pd = spark_df.toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pd = con.execute(oracle_sql).df()
    finally:
        con.close()

    if sorted(spark_pd.columns) != sorted(oracle_pd.columns):
        raise OracleMismatch(
            f"[{name}] column names differ: spark={sorted(spark_pd.columns)} "
            f"oracle={sorted(oracle_pd.columns)}"
        )
    if len(spark_pd) != len(oracle_pd):
        raise OracleMismatch(f"[{name}] row counts differ: spark={len(spark_pd)} oracle={len(oracle_pd)}")

    a, b = canonicalize(spark_pd), canonicalize(oracle_pd)
    for i, (ra, rb) in enumerate(zip(a, b)):
        if _rows_close(ra, rb, float_rel_tol):
            continue
        raise OracleMismatch(f"[{name}] first differing row {i}:\n  spark : {ra}\n  oracle: {rb}")


def _cell_eq(x, y, rel_tol: float) -> bool:
    """Type-strict cell equality.

    The driver hashes the *repr* of values, so ``1764`` (Spark BIGINT) vs
    ``1764.0`` (DuckDB HUGEINT -> pandas float64) is a driver hash MISMATCH
    even though Python says ``1764 == 1764.0``. Mirror that strictness here:
    int/float/bool must match in type, not just value (VERDICT r1 item 1).
    """
    if x is None or y is None:
        return x is y
    if isinstance(x, tuple) and isinstance(y, tuple):
        return len(x) == len(y) and all(_cell_eq(a, b, rel_tol) for a, b in zip(x, y))
    if isinstance(x, bool) or isinstance(y, bool):
        return type(x) is type(y) and x == y
    if isinstance(x, (int, float, decimal.Decimal)) or isinstance(y, (int, float, decimal.Decimal)):
        if type(x) is not type(y):
            return False
        if x == y:
            return True
        return (
            rel_tol > 0
            and isinstance(x, float)
            and isinstance(y, float)
            and math.isclose(x, y, rel_tol=rel_tol)
        )
    return x == y


def _rows_close(ra: tuple, rb: tuple, rel_tol: float) -> bool:
    if len(ra) != len(rb):
        return False
    return all(_cell_eq(x, y, rel_tol) for x, y in zip(ra, rb))
