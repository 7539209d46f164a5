"""Connected-components operator tests (operators/cc.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from lyft_presto_spark.operators.cc import connected_components


def _components(spark, edges):
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    out = connected_components(df).toPandas()
    return dict(zip(out["node"], out["label"]))


def test_chain_triangle_and_pair(spark):
    # chain 1-2-3-4, triangle 10-11-12 (+ redundant edge), isolated pair 20-21
    got = _components(
        spark,
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (21, 20)],
    )
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_long_chain_converges(spark):
    # diameter 12 chain: needs several propagation rounds, still converges
    edges = [(i, i + 1) for i in range(12)]
    got = _components(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame(
        pd.DataFrame([(i, i + 1) for i in range(8)], columns=["src", "dst"])
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)


def test_non_integral_node_ids_rejected(spark):
    """ADVICE r13: string (or fractional-double) node ids would cast to
    NULL/truncate in the decimal label-sum probe, making round 1 look
    converged (None == None) — a silent partial closure. The guard must
    reject them loudly at entry instead."""
    df = spark.createDataFrame(
        pd.DataFrame([("a", "b"), ("b", "c")], columns=["src", "dst"])
    )
    with pytest.raises(TypeError, match="integral node ids"):
        connected_components(df)
    ddf = spark.createDataFrame(
        pd.DataFrame([(1.5, 2.5)], columns=["src", "dst"])
    )
    with pytest.raises(TypeError, match="integral node ids"):
        connected_components(ddf)
