"""SHOW/DESCRIBE/PREPARE/EXECUTE statement surface (SqlBase.g4:33-118).

Parity contract: statement results must agree with the live
spark.catalog / DataFrame schema metadata they describe.
"""

from __future__ import annotations

import pytest

from lyft_presto_spark.functions.presto import presto_sql
from lyft_presto_spark.session import load_table, register_tables
from lyft_presto_spark.sources.connectors import CatalogManager, dir_catalog
from lyft_presto_spark.sources.statements import set_default_manager


@pytest.fixture()
def mounted(spark, sf_dir):
    mgr = CatalogManager()
    mgr.mount(dir_catalog("fixtures", sf_dir))
    set_default_manager(mgr)
    register_tables(spark, sf_dir)
    return mgr


def test_show_catalogs(spark, mounted):
    cats = [r["catalog"] for r in presto_sql(spark, "SHOW CATALOGS").collect()]
    assert "fixtures" in cats and "spark" in cats


def test_show_schemas(spark, mounted):
    assert [r["schema"] for r in presto_sql(spark, "SHOW SCHEMAS FROM fixtures").collect()] == ["default"]
    spark_schemas = [r["schema"] for r in presto_sql(spark, "SHOW SCHEMAS").collect()]
    assert spark_schemas == sorted(d.name for d in spark.catalog.listDatabases())


def test_show_tables_parity(spark, mounted):
    # Mounted catalog: every fixture parquet is a table.
    tables = [r["table"] for r in presto_sql(spark, "SHOW TABLES FROM fixtures").collect()]
    assert "orders" in tables and "lineitem" in tables
    assert tables == mounted.catalog("fixtures").list_tables()
    # Session catalog: parity with spark.catalog.listTables().
    session_tables = [r["table"] for r in presto_sql(spark, "SHOW TABLES").collect()]
    assert session_tables == sorted(t.name for t in spark.catalog.listTables())
    assert "orders" in session_tables


def test_describe_matches_schema(spark, sf_dir, mounted):
    rows = presto_sql(spark, "DESCRIBE fixtures.orders").collect()
    got = [(r["column"], r["type"]) for r in rows]
    expected = [
        (f.name, f.dataType.simpleString()) for f in load_table(spark, sf_dir, "orders").schema.fields
    ]
    # dir_catalog reads raw parquet (no ts-column rewrite), so compare names
    # and that every described type is the raw reader's type.
    raw = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert got == [(f.name, f.dataType.simpleString()) for f in raw.schema.fields]
    assert [c for c, _ in got] == [c for c, _ in expected]


def test_show_columns_equals_describe(spark, mounted):
    a = presto_sql(spark, "SHOW COLUMNS FROM fixtures.nation").collect()
    b = presto_sql(spark, "DESCRIBE fixtures.nation").collect()
    assert a == b


def test_show_functions_inventory(spark, mounted):
    rows = presto_sql(spark, "SHOW FUNCTIONS LIKE 'date%'").collect()
    names = [r["function"] for r in rows]
    assert "date_add" in names and "date_format" in names
    from lyft_presto_spark.functions.presto import FUNCTION_MAP

    assert set(names) == {k for k in FUNCTION_MAP if k.startswith("date")}


def test_show_stats(spark, mounted):
    rows = {r["column"]: r for r in presto_sql(spark, "SHOW STATS FOR fixtures.nation").collect()}
    assert rows["n_nationkey"]["row_count"] == 25
    assert rows["n_nationkey"]["null_count"] == 0
    # approx ndv within HLL bounds of the exact 25
    assert abs(rows["n_nationkey"]["approx_ndv"] - 25) <= 3


def test_explain_statement(spark, mounted):
    rows = presto_sql(spark, "EXPLAIN SELECT count(*) FROM orders WHERE o_orderkey > 10").collect()
    plan = "\n".join(r["plan"] for r in rows)
    assert "HashAggregate" in plan
    # Presto-dialect bodies transpile before planning.
    rows2 = presto_sql(spark, "EXPLAIN SELECT strpos(o_orderpriority, '-') FROM orders").collect()
    assert any("instr" in r["plan"] for r in rows2)


def test_prepare_execute_with_params(spark, mounted):
    presto_sql(spark, "PREPARE top_orders FROM SELECT o_orderkey FROM orders WHERE o_orderkey <= ? ORDER BY o_orderkey LIMIT ?")
    rows = presto_sql(spark, "EXECUTE top_orders USING 10, 3").collect()
    expected = [
        r["o_orderkey"]
        for r in spark.sql(
            "SELECT o_orderkey FROM orders WHERE o_orderkey <= 10 ORDER BY o_orderkey LIMIT 3"
        ).collect()
    ]
    assert [r["o_orderkey"] for r in rows] == expected and len(expected) == 3


def test_prepare_execute_transpiles_body(spark, mounted):
    # The prepared body is Presto dialect: strpos must transpile on EXECUTE.
    presto_sql(spark, "PREPARE find_dash FROM SELECT strpos(o_orderpriority, '-') AS p FROM orders LIMIT 1")
    assert presto_sql(spark, "EXECUTE find_dash").collect()[0]["p"] >= 1


def test_show_set_reset_session(spark, mounted):
    rows = {r["name"]: r["value"] for r in presto_sql(spark, "SHOW SESSION").collect()}
    assert rows["spark.sql.ansi.enabled"] == "true"
    presto_sql(spark, "SET SESSION spark.sql.shuffle.partitions = 16")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "16"
    presto_sql(spark, "RESET SESSION spark.sql.shuffle.partitions")
    presto_sql(spark, "SET SESSION spark.sql.shuffle.partitions = 8")  # restore


def test_use_and_transactions(spark, mounted):
    assert presto_sql(spark, "USE default").collect()[0]["status"] == "USING"
    assert presto_sql(spark, "START TRANSACTION").collect()[0]["status"].startswith("OK")
    assert presto_sql(spark, "COMMIT").collect()[0]["status"].startswith("OK")
    import pytest as _pytest

    with _pytest.raises(Exception, match="ROLLBACK"):
        presto_sql(spark, "ROLLBACK")


def test_describe_input_output_deallocate(spark, mounted):
    presto_sql(spark, "PREPARE di FROM SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= ?")
    rows = presto_sql(spark, "DESCRIBE INPUT di").collect()
    assert len(rows) == 1 and rows[0]["position"] == 0
    presto_sql(spark, "PREPARE do2 FROM SELECT o_orderkey, strpos(o_orderpriority, '-') AS p FROM orders")
    out = {r["column"]: r["type"] for r in presto_sql(spark, "DESCRIBE OUTPUT do2").collect()}
    assert out["o_orderkey"] == "bigint" and out["p"] == "int"
    assert presto_sql(spark, "DEALLOCATE PREPARE do2").collect()[0]["status"] == "DEALLOCATED"
    import pytest as _pytest

    with _pytest.raises(Exception, match="not found"):
        presto_sql(spark, "EXECUTE do2")


def test_system_runtime_tables(spark, mounted):
    nodes = presto_sql(spark, "SELECT node_id, coordinator, state FROM system.runtime.nodes").collect()
    assert len(nodes) == 1 and nodes[0]["coordinator"] is True and nodes[0]["state"] == "active"
    q = presto_sql(spark, "SELECT count(*) AS n FROM system.runtime.queries").collect()
    assert q[0]["n"] >= 1


def test_call_unregistered_procedure_errors(spark):
    with pytest.raises(ValueError, match="procedure"):
        presto_sql(spark, "CALL system.create_empty_partition('a', 'b')")


def test_role_dcl_errors(spark):
    for stmt in ("GRANT SELECT ON t TO alice", "REVOKE SELECT ON t FROM alice", "SET ROLE admin"):
        with pytest.raises(ValueError, match="access control"):
            presto_sql(spark, stmt)


def test_show_create_table(spark, sf_dir, mounted):
    out = presto_sql(spark, "SHOW CREATE TABLE lineitem").collect()
    assert len(out) == 1
    ddl = out[0][0]
    assert ddl.startswith("CREATE TABLE lineitem (")
    assert "l_orderkey bigint" in ddl
    assert "l_quantity double" in ddl or "l_quantity decimal" in ddl
    assert "l_shipdate timestamp(6)" in ddl
    assert "format = 'PARQUET'" in ddl
    # round-trip sanity: every column of the resolved table appears
    from lyft_presto_spark.session import load_table

    for f in load_table(spark, sf_dir, "lineitem").schema.fields:
        assert f.name in ddl


def test_presto_type_name_nested_types():
    """Map keys with commas and struct fields render valid Presto DDL (ADVICE r3)."""
    from lyft_presto_spark.sources.statements import _presto_type_name

    assert _presto_type_name("map<decimal(10,2),string>") == "map(decimal(10,2), varchar)"
    assert _presto_type_name("map<string,array<int>>") == "map(varchar, array(integer))"
    assert _presto_type_name("struct<a:int,b:map<decimal(10,2),string>>") == (
        "row(a integer, b map(decimal(10,2), varchar))"
    )
    assert _presto_type_name("array<struct<x:double,y:double>>") == (
        "array(row(x double, y double))"
    )
