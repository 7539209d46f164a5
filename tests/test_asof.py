"""As-of join operator tests (operators/asof.py).

Semantics pinned against pandas ``merge_asof`` (the de-facto reference for
point-in-time joins) on synthetic data, plus plan-shape assertions proving
the union+window design: exactly one shuffle on the key, no join operator
anywhere in the physical plan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from lyft_presto_spark.operators.asof import asof_join
from lyft_presto_spark.plans import assert_no_cartesian, count_exchanges


def _frames(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2, 2, 3],
                "ts": [5, 10, 20, 7, 30, 4],
                "lbl": ["a", "b", "c", "d", "e", "f"],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 2, 2, 4],
                "rts": [3, 10, 8, 25, 1],
                "v": [100, 200, 300, 400, 500],
            }
        )
    )
    return left, right


def test_asof_backward_matches_merge_asof(spark):
    left, right = _frames(spark)
    got = (
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
        .orderBy("k", "ts")
        .toPandas()
    )
    lpd = left.toPandas().sort_values("ts")
    rpd = right.toPandas().sort_values("rts")
    exp = pd.merge_asof(lpd, rpd, left_on="ts", right_on="rts", by="k").sort_values(
        ["k", "ts"]
    )
    assert list(got["v"].fillna(-1)) == list(exp["v"].fillna(-1))
    # inclusive at equal timestamps: left (1, ts=10) matches right (1, 10)
    row = got[(got.k == 1) & (got.ts == 10)].iloc[0]
    assert row.v == 200 and row.matched_rts == 10


def test_asof_forward(spark):
    left, right = _frames(spark)
    got = (
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts", direction="forward")
        .orderBy("k", "ts")
        .toPandas()
    )
    by_key = {(r.k, r.ts): r for r in got.itertuples()}
    assert by_key[(1, 5)].v == 200  # next right at rts=10
    assert by_key[(1, 10)].v == 200  # inclusive tie
    assert pd.isna(by_key[(1, 20)].v)  # nothing after 20 for k=1
    assert by_key[(2, 7)].v == 300
    assert pd.isna(by_key[(3, 4)].v)  # key with no right rows


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    got = (
        asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", tolerance=F.lit(3)
        )
        .orderBy("k", "ts")
        .toPandas()
    )
    by_key = {(r.k, r.ts): r for r in got.itertuples()}
    assert by_key[(1, 5)].v == 100  # gap 2 <= 3
    assert by_key[(1, 10)].v == 200  # gap 0
    assert pd.isna(by_key[(1, 20)].v)  # gap 10 > 3 -> nulled, row kept
    assert pd.isna(by_key[(2, 30)].v)  # gap 5 > 3
    assert len(got) == 6  # left-join semantics: every left row present


def test_asof_plan_one_shuffle_no_join(spark):
    left, right = _frames(spark)
    df = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
    assert_no_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union+window, not a join
    # one hash exchange on the key (plus possibly AQE reads); no range/
    # broadcast exchanges from row multiplication
    assert count_exchanges(df) <= 2
