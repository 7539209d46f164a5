"""Bucketed co-located join: the zero-shuffle fact-to-fact join strategy.

The reference co-locates joins via connector bucketing (presto-hive bucketed
tables; grouped execution — SURVEY.md §4.3). Spark's analog is
``bucketBy`` + ``sortBy`` catalog tables: when both join sides are bucketed
on the join key with the same bucket count, the join compiles with NO
shuffle exchange on either side — the property that makes repeated
fact-to-fact joins viable at 100 TB.
"""

from __future__ import annotations

import re

from lyft_presto_spark.plans.inspect import formatted_plan
from lyft_presto_spark.session import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )

    for name, df, key in (
        ("b_orders", orders, "o_orderkey"),
        ("b_lineitem", lineitem, "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .option("path", str(tmp_path / name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )

    # Disable broadcast so the plan must rely on bucket co-location (at fact
    # scale neither side would broadcast anyway).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_lineitem")
            .join(spark.table("b_orders"), spark.table("b_lineitem").l_orderkey == spark.table("b_orders").o_orderkey)
            .groupBy("o_orderpriority")
            .agg({"l_quantity": "sum"})
        )
        plan = formatted_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # The join itself must not reshuffle either bucketed side: no hash
    # exchange may appear below the join (the aggregation after it may add one).
    join_section = plan.split("HashAggregate")[-1] if "SortMergeJoin" in plan else plan
    shuffles_below_join = len(re.findall(r"Exchange hashpartitioning", join_section))
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert shuffles_below_join <= 1, plan[:2000]

    # And the answer matches the unbucketed plan.
    expected = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg({"l_quantity": "sum"})
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expected.collect()))

    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE {name}")
