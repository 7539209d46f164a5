"""Presto dialect shim: transpiler unit tests + end-to-end front-door runs.

Mirror of the reference's function tests (AbstractTestFunctions pattern,
SURVEY.md §5.1) at the dialect layer: Presto-flavored SQL must run on Spark
via transpile() and produce the same values DuckDB computes for the
equivalent ANSI SQL.
"""

from __future__ import annotations

from lyft_presto_spark.functions import transpile
from lyft_presto_spark.functions.presto import presto_sql
from lyft_presto_spark.testing import compare_with_oracle


def test_transpile_renames():
    assert transpile("SELECT strpos(name, 'x') FROM t") == "SELECT instr(name, 'x') FROM t"
    assert (
        transpile("SELECT approx_distinct(a), array_agg(b) FROM t")
        == "SELECT approx_count_distinct(a), collect_list(b) FROM t"
    )


def test_transpile_date_add_unit_form():
    assert (
        transpile("SELECT date_add('day', 5, o_orderdate) FROM orders")
        == "SELECT timestampadd(DAY, 5, o_orderdate) FROM orders"
    )
    # Spark-native 2-arg form passes through untouched.
    assert transpile("SELECT date_add(d, 5) FROM t") == "SELECT date_add(d, 5) FROM t"


def test_transpile_nested_calls():
    out = transpile("SELECT date_diff('day', date_add('month', 1, a), b) FROM t")
    assert out == "SELECT timestampdiff(DAY, timestampadd(MONTH, 1, a), b) FROM t"


def test_transpile_bitwise_and_passthrough():
    assert transpile("SELECT bitwise_and(a, b), abs(c) FROM t") == "SELECT (a & b), abs(c) FROM t"


def test_transpile_string_literals_untouched():
    # A function-looking token inside a string literal must not be rewritten.
    sql = "SELECT 'date_add(day)' AS s, strpos(x, 'y') FROM t"
    assert transpile(sql) == "SELECT 'date_add(day)' AS s, instr(x, 'y') FROM t"


PRESTO_QUERY = """
SELECT o_orderpriority,
       count(*) AS n,
       approx_distinct(o_custkey) AS approx_customers,
       CAST(date_add('day', 30, max(o_orderdate)) AS DATE) AS max_plus_30,
       CAST(date_diff('day', min(o_orderdate), max(o_orderdate)) AS BIGINT) AS span_days,
       strpos(min(o_orderpriority), '-') AS dash_pos
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLE = """
SELECT o_orderpriority,
       count(*) AS n,
       count(DISTINCT o_custkey) AS exact_customers,
       CAST(max(o_orderdate) + INTERVAL 30 DAY AS DATE) AS max_plus_30,
       CAST(date_diff('day', min(o_orderdate), max(o_orderdate)) AS BIGINT) AS span_days,
       strpos(min(o_orderpriority), '-') AS dash_pos
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def test_presto_front_door(spark, sf_dir):
    from lyft_presto_spark.session import register_tables

    register_tables(spark, sf_dir)
    df = presto_sql(spark, PRESTO_QUERY)
    # approx_distinct is engine-specific: check bounds, compare the rest exactly.
    rows = {r["o_orderpriority"]: r for r in df.collect()}
    exact = presto_sql(
        spark,
        "SELECT o_orderpriority, count(DISTINCT o_custkey) AS n FROM orders GROUP BY 1",
    ).collect()
    for r in exact:
        approx = rows[r["o_orderpriority"]]["approx_customers"]
        assert abs(approx - r["n"]) <= max(3, 0.15 * r["n"])
    compare_with_oracle(
        df.drop("approx_customers"),
        ORACLE.replace("count(DISTINCT o_custkey) AS exact_customers,", ""),
        sf_dir,
        name="presto_front_door",
    )
