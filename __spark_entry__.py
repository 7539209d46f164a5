"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``lyft_presto_spark``: the engine package owns the query
inventory (``lyft_presto_spark.queries``), where every entry carries a Spark
callable and (where SQL-expressible) a DuckDB oracle. See SURVEY.md §2 for
the operator inventory these queries cover.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lyft_presto_spark.queries import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    q = all_queries()["tpch_q1"]
    return q.spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    return {name: q.spark for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted entries get rows-only checks."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
