"""ANSI error semantics: the engine fails where Presto fails.

Presto 319 errors on bad casts, integer overflow, division by zero, and
out-of-bounds subscripts (type/*Operators.java, ArraySubscriptOperator.java —
SURVEY.md §1.2, §7 hard-part 1). The session pins
``spark.sql.ansi.enabled=true`` to match; the ``try_*`` family is the
explicit opt-out (TryFunction.java:37 TRY()).
"""

from __future__ import annotations

import pytest
from pyspark.sql.utils import AnalysisException


def _fails(spark, sql: str) -> bool:
    try:
        spark.sql(sql).collect()
        return False
    except AnalysisException:
        raise
    except Exception:
        return True


def test_bad_cast_errors_try_cast_nulls(spark):
    assert _fails(spark, "SELECT CAST('abc' AS INT)")
    assert spark.sql("SELECT try_cast('abc' AS INT) AS v").collect()[0]["v"] is None


def test_int_overflow_errors(spark):
    assert _fails(spark, "SELECT CAST(2147483647 AS INT) + CAST(1 AS INT)")
    assert _fails(spark, "SELECT 9223372036854775807 + 1")
    assert (
        spark.sql("SELECT try_add(9223372036854775807, 1) AS v").collect()[0]["v"] is None
    )


def test_division_by_zero_errors(spark):
    assert _fails(spark, "SELECT 1 / 0")
    assert spark.sql("SELECT try_divide(1, 0) AS v").collect()[0]["v"] is None


def test_array_subscript_oob_errors(spark):
    # Presto: 1-based, errors on OOB (ArraySubscriptOperator.java); same here.
    assert _fails(spark, "SELECT array(1, 2)[5]")
    assert (
        spark.sql("SELECT try_element_at(array(1, 2), 5) AS v").collect()[0]["v"] is None
    )
    # 1-based element_at in both engines.
    assert spark.sql("SELECT element_at(array(10, 20), 1) AS v").collect()[0]["v"] == 10


def test_string_to_date_strictness(spark):
    assert _fails(spark, "SELECT CAST('2024-13-45' AS DATE)")
    assert spark.sql("SELECT try_cast('2024-13-45' AS DATE) AS v").collect()[0]["v"] is None


def test_bigram_lm_short_docs_never_throw_under_ansi(spark):
    """ADVICE r9: docs with <2 tokens must be screened BEFORE the bigram
    Generate — sequence(1, size-1) on a short doc is a descending [1,0]
    and element_at(toks, 0) throws under Spark 4 ANSI mode. Correctness
    must hold in every plan shape, not only when the optimizer happens to
    push an outer filter below the explode."""
    from lyft_presto_spark.queries.text_pipeline import _bigram_lm_sql

    rows = [(1, "only"), (2, ""), (3, "-"), (4, "two tokens here indeed")]
    spark.createDataFrame(rows, "doc_id INT, text STRING").createOrReplaceTempView(
        "documents_short_ansi"
    )
    sql = _bigram_lm_sql("spark").replace("FROM documents)", "FROM documents_short_ansi)")
    out = spark.sql(sql).collect()  # must not raise INVALID_ARRAY_INDEX
    assert sum(r.n_docs for r in out) == 1  # only doc 4 produces bigrams
    spark.catalog.dropTempView("documents_short_ansi")
