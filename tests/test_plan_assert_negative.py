"""Every plan assertion must FAIL on a plan that violates it.

Round-3 lesson: Spark 4.1 changed the formatted-plan text and two helpers
went vacuous (count_exchanges saw 0 everywhere; assert_no_cartesian never
fired on BroadcastNestedLoopJoin). A plan gate that cannot fail is not a
gate — these negative fixtures pin that each helper still has teeth against
the *current* Spark's plan format.
"""

from __future__ import annotations

import pytest

from lyft_presto_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_read_schema_pruned,
    count_exchanges,
)
from lyft_presto_spark.session import load_table


def test_no_cartesian_fires_on_cross_join(spark, sf_dir):
    na = load_table(spark, sf_dir, "nation")
    re_ = load_table(spark, sf_dir, "region")
    with pytest.raises(AssertionError):
        assert_no_cartesian(na.crossJoin(re_))
    # explicit scalar opt-out accepts the same plan
    assert_no_cartesian(na.crossJoin(re_), allow_scalar_bnlj=True)


def test_pushed_filters_fires_without_pushdown(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(AssertionError):
        assert_pushed_filters(li, "l_quantity")
    assert_pushed_filters(li.filter("l_quantity < 5"), "l_quantity")


def test_read_schema_pruned_fires_on_wide_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(AssertionError):
        assert_read_schema_pruned(li, "lineitem", 1)
    assert_read_schema_pruned(li.select("l_orderkey"), "lineitem", 1)


def test_broadcast_join_detection_both_ways(spark, sf_dir):
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    na = load_table(spark, sf_dir, "nation")
    broadcasted = li.join(F.broadcast(na), li.l_suppkey == na.n_nationkey)
    shuffled = li.join(na.hint("shuffle_hash"), li.l_suppkey == na.n_nationkey)
    assert_broadcast_join(broadcasted, expect=True)
    assert_broadcast_join(shuffled, expect=False)
    with pytest.raises(AssertionError):
        assert_broadcast_join(shuffled, expect=True)
    with pytest.raises(AssertionError):
        assert_broadcast_join(broadcasted, expect=False)


def test_count_exchanges_sees_groupby_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_returnflag").count()
    assert count_exchanges(grouped) >= 1
    # a pure projection shuffles nothing
    assert count_exchanges(li.select("l_orderkey")) == 0
