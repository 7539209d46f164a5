"""Binned range join tests (operators/range_join.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from lyft_presto_spark.operators.range_join import band_join, interval_join
from lyft_presto_spark.plans import assert_no_cartesian


def test_band_join_matches_naive(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"lid": range(40), "lv": [i * 3.7 - 20 for i in range(40)]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"rid": range(35), "rv": [i * 4.1 - 30 for i in range(35)]})
    )
    got = (
        band_join(left, right, "lv", "rv", 5.0)
        .select("lid", "rid")
        .toPandas()
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    naive = (
        left.crossJoin(right)
        .where("abs(lv - rv) <= 5.0")
        .select("lid", "rid")
        .toPandas()
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    assert got.equals(naive)
    assert len(naive) > 0


def test_band_join_no_nested_loop(spark):
    left = spark.range(100).selectExpr("id AS lid", "CAST(id * 2.5 AS DOUBLE) AS lv")
    right = spark.range(100).selectExpr("id AS rid", "CAST(id * 3.5 AS DOUBLE) AS rv")
    df = band_join(left, right, "lv", "rv", 4.0)
    assert_no_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_interval_join_matches_naive(spark):
    pts = spark.createDataFrame(pd.DataFrame({"pid": range(60), "p": [i * 1.9 for i in range(60)]}))
    ivs = spark.createDataFrame(
        pd.DataFrame(
            {
                "iid": range(20),
                "s": [i * 6.0 for i in range(20)],
                "e": [i * 6.0 + (i % 4) for i in range(20)],
            }
        )
    )
    got = (
        interval_join(pts, ivs, "p", "s", "e", 4.0)
        .select("pid", "iid")
        .toPandas()
        .sort_values(["pid", "iid"])
        .reset_index(drop=True)
    )
    naive = (
        pts.crossJoin(ivs)
        .where("p >= s AND p <= e")
        .select("pid", "iid")
        .toPandas()
        .sort_values(["pid", "iid"])
        .reset_index(drop=True)
    )
    assert got.equals(naive)
    assert len(naive) > 0


def test_interval_join_rejects_oversized_interval(spark):
    pts = spark.createDataFrame(pd.DataFrame({"pid": [1], "p": [5.0]}))
    ivs = spark.createDataFrame(pd.DataFrame({"iid": [1], "s": [0.0], "e": [100.0]}))
    with pytest.raises(Exception, match="max_length|ASSERT"):
        interval_join(pts, ivs, "p", "s", "e", 4.0).collect()
