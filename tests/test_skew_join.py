"""Salted join: correctness vs the plain join, and salt spread."""

from __future__ import annotations

from pyspark.sql import functions as F

from lyft_presto_spark.operators.skew import salted_join
from lyft_presto_spark.session import load_table


def test_salted_join_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")

    plain = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("l_quantity").alias("q"))
    )
    salted = (
        salted_join(li, sup, "l_suppkey", "s_suppkey", salt_n=4, salt_source="l_orderkey")
        .groupBy("s_name")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_spreads_hot_key(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    salted = li.withColumn("__salt", F.pmod(F.xxhash64(F.col("l_orderkey")), F.lit(8)))
    # The hottest supplier key must be split across all 8 salt residues.
    hot = (
        salted.groupBy("l_suppkey", "__salt")
        .count()
        .groupBy("l_suppkey")
        .agg(F.countDistinct("__salt").alias("n_salts"))
        .agg(F.max("n_salts").alias("m"))
        .collect()[0]["m"]
    )
    assert hot == 8
