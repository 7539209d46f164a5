"""Generator connector (sources/tpch_datasource.py): the presto-tpch
analog over Spark 4's Python DataSource API. Determinism and
partition-invariance are the connector's contract — the reference pins
its generator the same way (TestTpchMetadata over airlift-tpch)."""

from __future__ import annotations

import pytest

from lyft_presto_spark.sources.tpch_datasource import (
    lineitem_row,
    orders_row,
    register_tpchgen,
)


def _read(spark, **opts):
    register_tpchgen(spark)
    r = spark.read.format("tpchgen")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_rows_and_partitions(spark):
    df = _read(spark, table="orders", rows=5000, partitions=8)
    assert df.count() == 5000
    assert df.rdd.getNumPartitions() == 8


def test_partition_count_never_changes_results(spark):
    # splits are row ranges with the remainder on the last split: the SAME
    # rows come back under any partitioning (1, a non-divisor, many)
    a = _read(spark, table="orders", rows=1003, partitions=1).collect()
    b = _read(spark, table="orders", rows=1003, partitions=7).collect()
    c = _read(spark, table="orders", rows=1003, partitions=64).collect()
    key = lambda r: r.o_orderkey  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key) == sorted(c, key=key)


def test_rows_match_reference_generator(spark):
    # executor-side generation == the local pure function, row for row
    got = {r.o_orderkey: r for r in _read(spark, table="orders", rows=64).collect()}
    for i in range(64):
        exp = orders_row(i)
        row = got[i]
        assert (
            row.o_custkey, row.o_orderstatus, row.o_totalprice,
            row.o_orderpriority,
        ) == (exp[1], exp[2], exp[3], exp[5])


def test_lineitem_links_to_orders(spark):
    li = _read(spark, table="lineitem", rows=400).collect()
    assert len(li) == 400
    # ~4 lines per order, linenumbers 1..4, keys derived from the index
    assert {r.l_linenumber for r in li} == {1, 2, 3, 4}
    exp = lineitem_row(17)
    row = next(r for r in li if r.l_orderkey == 17 // 4 and r.l_linenumber == 17 % 4 + 1)
    assert (row.l_quantity, row.l_extendedprice, row.l_returnflag) == (
        exp[2], exp[3], exp[5]
    )


def test_unknown_table_is_loud(spark):
    register_tpchgen(spark)
    with pytest.raises(Exception, match="unknown table"):
        spark.read.format("tpchgen").option("table", "nope").load().collect()
