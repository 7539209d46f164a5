"""Relational operator conformance corpus — one query per plan-node family.

Covers SURVEY.md §2.1's logical operator inventory (the reference's
sql/planner/plan/*.java nodes) with small targeted queries, each matched to a
DuckDB oracle. Spark-side implementations prefer the DataFrame API where it
demonstrates the operator; set ops / subqueries use Spark SQL (same Catalyst
plan, clearer text).

Determinism rules: every LIMIT is preceded by a total order; sampling is
modulo-key (SYSTEM-sample analog) rather than RNG; no floating accumulation
without the decimal convention (see tpch.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, sql_over, t

# ---------------------------------------------------------------------------
# Joins — JoinNode.java:50 (INNER/LEFT/RIGHT/FULL), SemiJoinNode.java:30,
# NestedLoopJoinOperator.java:36 (cross), LookupJoinOperator.java:53.
# ---------------------------------------------------------------------------


@query(
    "op_join_left",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
           CAST(SUM(COALESCE(CAST(o_totalprice AS DECIMAL(14,2)), 0)) AS DOUBLE) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey ORDER BY c_custkey
    """,
    doc="LEFT OUTER join preserving unmatched customers (null-padded right side). "
    "Reference: JoinNode.java:194-199 LEFT; LookupJoinOperators.java PROBE_OUTER.",
    tags=("join",),
)
def op_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.coalesce(F.col("o_totalprice").cast("decimal(14,2)"), F.lit(0)))
            .cast("double")
            .alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@query(
    "op_join_right",
    oracle="""
    SELECT n_name, COUNT(s_suppkey) AS n_suppliers
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
    doc="RIGHT OUTER join: all nations kept even with zero suppliers. "
    "Reference: JoinNode.java RIGHT / LOOKUP_OUTER.",
    tags=("join",),
)
def op_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    return (
        supp.join(nat, supp.s_nationkey == nat.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
        .orderBy("n_name")
    )


@query(
    "op_join_full",
    oracle="""
    WITH bal_c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
         bal_s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
    SELECT COALESCE(bal_c.nk, bal_s.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
    FROM bal_c FULL OUTER JOIN bal_s ON bal_c.nk = bal_s.nk
    ORDER BY nationkey
    """,
    doc="FULL OUTER join of two sparse aggregates; unmatched sides null-padded. "
    "Reference: JoinNode.java FULL; LookupJoinOperators.java FULL_OUTER.",
    tags=("join",),
)
def op_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        cust.join(supp, cust.nk == supp.nk, "full_outer")
        .select(
            F.coalesce(cust.nk, supp.nk).alias("nationkey"),
            F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
            F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@query(
    "op_join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    ORDER BY r_name, n_name
    """,
    doc="Cross join (cartesian product) of two small dims. "
    "Reference: NestedLoopJoinOperator.java:36.",
    tags=("join", "cross"),
)
def op_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    reg = t(spark, sf_dir, "region")
    nat = t(spark, sf_dir, "nation")
    return reg.crossJoin(nat).select("r_name", "n_name").orderBy("r_name", "n_name")


@query(
    "op_join_semi",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_parts
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
    GROUP BY p_brand ORDER BY p_brand
    """,
    doc="Semi join (IN subquery) via DataFrame left_semi. "
    "Reference: SemiJoinNode.java:30; HashSemiJoinOperator.java:48.",
    tags=("join", "semijoin"),
)
def op_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
        .orderBy("p_brand")
    )


@query(
    "op_join_anti",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="Anti join (NOT EXISTS) via DataFrame left_anti: customers with no "
    "URGENT order. Reference: SemiJoinNode negated; "
    "ReplaceExceptWithAntiJoin analog. The screen matters: every fixture "
    "customer has SOME order, so the unscreened form was vacuous "
    "(0 rows at every scale — r8 audit).",
    tags=("join", "antijoin"),
)
def op_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    urgent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@query(
    "op_join_nonequi",
    oracle="""
    SELECT s_suppkey, COUNT(*) AS n_close_customers
    FROM supplier JOIN customer
      ON c_nationkey = s_nationkey AND c_acctbal BETWEEN s_acctbal - 100 AND s_acctbal + 100
    GROUP BY s_suppkey ORDER BY s_suppkey
    """,
    doc="Equi + band (non-equi residual) join: customers within ±100 acctbal of a "
    "same-nation supplier. Reference: JoinNode filter (residual predicate).",
    tags=("join", "nonequi"),
)
def op_join_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = t(spark, sf_dir, "supplier")
    cust = t(spark, sf_dir, "customer")
    return (
        supp.join(
            cust,
            (cust.c_nationkey == supp.s_nationkey)
            & cust.c_acctbal.between(supp.s_acctbal - 100, supp.s_acctbal + 100),
        )
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_close_customers"))
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Aggregation — AggregationNode.java:45 (DISTINCT, FILTER), GroupIdNode.java:40
# (GROUPING SETS / CUBE / ROLLUP), MarkDistinctNode.java:31,
# DistinctLimitNode.java:31.
# ---------------------------------------------------------------------------


@query(
    "op_agg_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_distinct_qty
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Multiple DISTINCT aggregates in one grouping — the reference marks first "
    "occurrences per key (MarkDistinctOperator.java:35); Catalyst rewrites via "
    "Expand (RewriteDistinctAggregates).",
    tags=("aggregation", "distinct"),
)
def op_agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.sum_distinct(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_distinct_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "op_agg_filter",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_total
    FROM orders
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="FILTER (WHERE ...) per-aggregate masks. Reference: AggregationNode per-agg "
    "filter (AggregationNode.java:45); ImplementFilteredAggregations.java.",
    tags=("aggregation", "filter"),
)
def op_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(
        spark,
        sf_dir,
        """
        SELECT o_orderstatus,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
               COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_total
        FROM orders
        GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        ("orders",),
    )


@query(
    "op_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
           COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="ROLLUP hierarchy totals + GROUPING() marker. Reference: GroupIdNode.java:40; "
    "GroupIdOperator.java:32 (row replication -> Catalyst Expand).",
    tags=("aggregation", "rollup"),
)
def op_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g_rf"),
            F.grouping("l_linestatus").alias("g_ls"),
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
        )
        .orderBy(
            "g_rf",
            "g_ls",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "op_agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="CUBE: all grouping-set combinations. Reference: GroupIdNode (CUBE expansion).",
    tags=("aggregation", "cube"),
)
def op_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


@query(
    "op_agg_grouping_sets",
    oracle="""
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
    """,
    doc="Explicit GROUPING SETS with disjoint keys. Reference: GroupIdNode.java:40.",
    tags=("aggregation", "grouping_sets"),
)
def op_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(
        spark,
        sf_dir,
        """
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
        """,
        ("customer",),
    )


@query(
    "op_distinct_limit",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    LIMIT 4
    """,
    doc="DISTINCT + ORDER + LIMIT (fused DistinctLimit in the reference). "
    "Reference: DistinctLimitNode.java:31; DistinctLimitOperator.java.",
    tags=("distinct", "limit"),
)
def op_distinct_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct().orderBy("l_returnflag", "l_linestatus").limit(4)


# ---------------------------------------------------------------------------
# Window functions — WindowNode.java:43, WindowOperator.java:61,
# TopNRowNumberNode.java:34, RowNumberNode.java:31; SURVEY.md §2.5.
# ---------------------------------------------------------------------------


@query(
    "op_window_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_mktsegment, rn
    """,
    doc="row_number / rank / dense_rank over a partition. Reference: "
    "RowNumberFunction.java:23, RankFunction.java:23, DenseRankFunction.java:23.",
    tags=("window",),
)
def op_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .orderBy("c_mktsegment", "rn")
    )


@query(
    "op_window_topn_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) ranked
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    doc="Top-3 orders per customer via ranked-window filter. Reference: "
    "TopNRowNumberNode.java:34 / GroupedTopNBuilder.java:49; Spark 3.5+ "
    "optimizes to WindowGroupLimit.",
    tags=("window", "topn"),
)
def op_window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@query(
    "op_window_lag_lead",
    oracle="""
    SELECT s_suppkey, s_acctbal,
           LAG(s_acctbal, 1) OVER w AS prev_bal,
           LEAD(s_acctbal, 1) OVER w AS next_bal,
           LAG(s_acctbal, 2, -1.0) OVER w AS prev2_bal_defaulted
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_suppkey)
    ORDER BY s_suppkey
    """,
    doc="lag/lead with offsets and defaults. Reference: LagFunction.java:29, "
    "LeadFunction.java:29.",
    tags=("window",),
)
def op_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("s_nationkey").orderBy("s_suppkey")
    return (
        t(spark, sf_dir, "supplier")
        .select(
            "s_suppkey",
            "s_acctbal",
            F.lag("s_acctbal", 1).over(w).alias("prev_bal"),
            F.lead("s_acctbal", 1).over(w).alias("next_bal"),
            F.lag("s_acctbal", 2, -1.0).over(w).alias("prev2_bal_defaulted"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "op_window_frames",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS window3_total,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_to_date
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    doc="ROWS frames (unbounded/2-preceding) and default RANGE frame with peers. "
    "Reference: FrameInfo.java:25; WindowPartition.java:35; "
    "AggregateWindowFunction.java:30 (any agg as window fn).",
    tags=("window", "frames"),
)
def op_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    ob = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = F.col("o_totalprice").cast("decimal(14,2)")
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            F.sum(price).over(ob.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double").alias("running_total"),
            F.sum(price).over(ob.rowsBetween(-2, Window.currentRow)).cast("double").alias("window3_total"),
            F.count("*").over(ob.rangeBetween(Window.unboundedPreceding, Window.currentRow)).alias("n_to_date"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


@query(
    "op_window_value_functions",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice,
           FIRST_VALUE(p_retailprice) OVER w AS cheapest,
           LAST_VALUE(p_retailprice) OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS priciest,
           NTH_VALUE(p_retailprice, 2) OVER w AS second_cheapest
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    ORDER BY p_partkey
    """,
    doc="first_value / last_value (full frame) / nth_value. Reference: "
    "FirstValueFunction.java:25, LastValueFunction.java:25, NthValueFunction.java:27.",
    tags=("window",),
)
def op_window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            "p_brand",
            "p_retailprice",
            F.first("p_retailprice").over(w).alias("cheapest"),
            F.last("p_retailprice").over(wfull).alias("priciest"),
            F.nth_value("p_retailprice", 2).over(w).alias("second_cheapest"),
        )
        .orderBy("p_partkey")
    )


@query(
    "op_window_distribution",
    oracle="""
    SELECT s_suppkey, s_acctbal,
           NTILE(4) OVER w AS quartile,
           CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank,
           CAST(CUME_DIST() OVER w AS DOUBLE) AS cume
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal, s_suppkey)
    ORDER BY s_suppkey
    """,
    doc="ntile / percent_rank / cume_dist over a global order. Reference: "
    "NTileFunction.java:27, PercentRankFunction.java:23, "
    "CumulativeDistributionFunction.java:23.",
    tags=("window",),
)
def op_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.orderBy("s_acctbal", "s_suppkey")
    return (
        t(spark, sf_dir, "supplier")
        .select(
            "s_suppkey",
            "s_acctbal",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).cast("double").alias("pct_rank"),
            F.cume_dist().over(w).cast("double").alias("cume"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Sort / Limit / Offset / TopN — SortNode.java:27, TopNNode.java:33,
# LimitNode.java:32, OffsetNode.java:30.
# ---------------------------------------------------------------------------


@query(
    "op_sort_nulls",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_or_null
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY status_or_null ASC NULLS FIRST, o_orderkey
    """,
    doc="Sort with explicit null ordering (Presto defaults NULLS LAST on ASC, Spark "
    "NULLS FIRST — the engine always emits explicit NULLS FIRST/LAST; SURVEY.md §7 "
    "phase-2 semantic deltas). Reference: SortNode.java:27; OrderByOperator.java:44.",
    tags=("sort",),
)
def op_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") <= 500)
        .select("o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"))
        .orderBy(F.col("status_or_null").asc_nulls_first(), F.col("o_orderkey"))
    )


@query(
    "op_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15 OFFSET 10
    """,
    doc="ORDER BY + OFFSET + LIMIT (total order makes the page deterministic). "
    "Reference: OffsetNode.java:30, ImplementOffset.java.",
    tags=("limit", "offset"),
)
def op_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(10)
        .limit(15)
    )


@query(
    "op_limit_with_ties",
    oracle="""
    SELECT p_size, p_partkey FROM (
      SELECT p_size, p_partkey, RANK() OVER (ORDER BY p_size) AS rnk
      FROM part
    ) t WHERE rnk <= 20
    ORDER BY p_size, p_partkey
    """,
    doc="LIMIT WITH TIES implemented as rank()<=n rewrite — Spark has no native "
    "FETCH FIRST WITH TIES; this mirrors the reference's own rewrite "
    "(ImplementLimitWithTies.java:1).",
    tags=("limit", "ties"),
)
def op_limit_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.orderBy("p_size")
    return (
        t(spark, sf_dir, "part")
        .select("p_size", "p_partkey", F.rank().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 20)
        .select("p_size", "p_partkey")
        .orderBy("p_size", "p_partkey")
    )


# ---------------------------------------------------------------------------
# Set operations — UnionNode.java:26, IntersectNode.java:26, ExceptNode.java:25.
# ---------------------------------------------------------------------------


@query(
    "op_union_all",
    oracle="""
    SELECT k, kind FROM (
      SELECT c_nationkey AS k, 'customer' AS kind FROM customer WHERE c_acctbal > 9990
      UNION ALL
      SELECT s_nationkey AS k, 'supplier' AS kind FROM supplier WHERE s_acctbal > 9000
      UNION ALL
      SELECT n_nationkey AS k, 'nation' AS kind FROM nation WHERE n_nationkey < 3
    ) u ORDER BY kind, k
    """,
    doc="N-ary UNION ALL (no dedup). Reference: UnionNode.java:26; "
    "SetFlatteningOptimizer merges nested unions (Catalyst CombineUnions).",
    tags=("setop",),
)
def op_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9990).select(
        F.col("c_nationkey").alias("k"), F.lit("customer").alias("kind")
    )
    supp = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000).select(
        F.col("s_nationkey").alias("k"), F.lit("supplier").alias("kind")
    )
    nat = t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 3).select(
        F.col("n_nationkey").alias("k"), F.lit("nation").alias("kind")
    )
    return cust.unionAll(supp).unionAll(nat).orderBy("kind", "k")


@query(
    "op_union_distinct",
    oracle="""
    SELECT nk FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION
      SELECT s_nationkey AS nk FROM supplier
    ) u ORDER BY nk
    """,
    doc="UNION (distinct semantics). Reference: UnionNode + aggregation rewrite.",
    tags=("setop", "distinct"),
)
def op_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return cust.union(supp).distinct().orderBy("nk")


@query(
    "op_intersect",
    oracle="""
    SELECT l_partkey AS pk FROM lineitem WHERE l_quantity >= 49
    INTERSECT
    SELECT l_partkey FROM lineitem WHERE l_discount >= 0.09
    ORDER BY pk
    """,
    doc="INTERSECT (distinct) of two filtered key sets. Reference: "
    "IntersectNode.java:26; ImplementIntersectAndExceptAsUnion.java:120 "
    "(Catalyst: ReplaceIntersectWithSemiJoin).",
    tags=("setop",),
)
def op_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 49).select(F.col("l_partkey").alias("pk"))
    b = li.filter(F.col("l_discount") >= 0.09).select(F.col("l_partkey").alias("pk"))
    return a.intersect(b).orderBy("pk")


@query(
    "op_except",
    oracle="""
    SELECT p_partkey AS pk FROM part WHERE p_size <= 25
    EXCEPT
    SELECT l_partkey FROM lineitem WHERE l_quantity >= 40
    ORDER BY pk
    """,
    doc="EXCEPT (distinct): small parts never ordered in bulk. Reference: "
    "ExceptNode.java:25 (Catalyst: ReplaceExceptWithAntiJoin). Screened "
    "sides: the original parts-never-ordered form was vacuous on this "
    "fixture (every part is sold; 0 rows at every scale — r8 audit).",
    tags=("setop",),
)
def op_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 25)
        .select(F.col("p_partkey").alias("pk"))
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 40)
        .select(F.col("l_partkey").alias("pk"))
    )
    return part.exceptAll(li).distinct().orderBy("pk")


@query(
    "op_intersect_all",
    oracle="""
    SELECT l_partkey AS pk FROM lineitem WHERE l_quantity >= 49
    INTERSECT ALL
    SELECT l_partkey FROM lineitem WHERE l_discount >= 0.09
    ORDER BY pk
    """,
    doc="INTERSECT ALL (bag semantics: multiplicity = min of the two sides). "
    "Reference: IntersectNode distinct=false (SetOperationNodeUtils); "
    "Catalyst RewriteIntersectAll.",
    tags=("setop",),
)
def op_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 49).select(F.col("l_partkey").alias("pk"))
    b = li.filter(F.col("l_discount") >= 0.09).select(F.col("l_partkey").alias("pk"))
    return a.intersectAll(b).orderBy("pk")


@query(
    "op_except_all",
    oracle="""
    SELECT l_partkey AS pk FROM lineitem WHERE l_quantity >= 45
    EXCEPT ALL
    SELECT l_partkey FROM lineitem WHERE l_discount >= 0.09
    ORDER BY pk
    """,
    doc="EXCEPT ALL (bag semantics: multiplicity = left minus right, floored "
    "at zero). Reference: ExceptNode distinct=false; Catalyst "
    "RewriteExceptAll.",
    tags=("setop",),
)
def op_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 45).select(F.col("l_partkey").alias("pk"))
    b = li.filter(F.col("l_discount") >= 0.09).select(F.col("l_partkey").alias("pk"))
    return a.exceptAll(b).orderBy("pk")


# ---------------------------------------------------------------------------
# Unnest / Values / Sample — UnnestNode.java:33, ValuesNode.java:30,
# SampleNode.java:31.
# ---------------------------------------------------------------------------


@query(
    "op_unnest",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) w
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
    doc="UNNEST/explode of a computed array (word split) + count. Reference: "
    "UnnestNode.java:33; UnnestOperator.java:39 (Catalyst GenerateExec).",
    tags=("unnest",),
)
def op_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


@query(
    "op_unnest_ordinality",
    oracle="""
    SELECT doc_id, i - 1 AS pos, words[i] AS word
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents WHERE doc_id < 10) d,
         LATERAL (SELECT unnest(generate_series(1, len(words))) AS i) s
    ORDER BY doc_id, pos
    """,
    doc="UNNEST WITH ORDINALITY (position-aware explode) via posexplode. "
    "Reference: UnnestNode withOrdinality (UnnestOperator.java:39).",
    tags=("unnest", "ordinality"),
)
def op_unnest_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return (
        docs.select("doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"))
        .orderBy("doc_id", "pos")
    )


@query(
    "op_unnest_map",
    oracle="""
    SELECT n_nationkey, 'key' AS mk, n_name AS mv FROM nation
    UNION ALL
    SELECT n_nationkey, 'region', CAST(n_regionkey AS VARCHAR) FROM nation
    ORDER BY n_nationkey, mk
    """,
    doc="UNNEST of a MAP into (key, value) rows — Presto UNNEST(map) emits "
    "two columns (UnnestOperator.java map case); Spark spells it "
    "explode(map). Oracle reconstructs the same rows relationally.",
    tags=("unnest", "map"),
)
def op_unnest_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = t(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("key"), F.col("n_name"),
        F.lit("region"), F.col("n_regionkey").cast("string"),
    )
    return (
        nation.select("n_nationkey", F.explode(m).alias("mk", "mv"))
        .orderBy("n_nationkey", "mk")
    )


@query(
    "op_row_type",
    oracle="""
    WITH pairs AS (
        SELECT n_nationkey,
               struct_pack(rk := n_regionkey, ini := substr(n_name, 1, 1)) AS r
        FROM nation
    )
    SELECT a.n_nationkey AS nk_a, b.n_nationkey AS nk_b
    FROM pairs a JOIN pairs b
      ON a.r = b.r AND a.n_nationkey < b.n_nationkey
    UNION ALL
    SELECT n_nationkey, CAST(r.rk AS BIGINT)
    FROM pairs WHERE r.ini >= 'A'
    ORDER BY nk_a, nk_b
    """,
    doc="ROW/struct type operators: construction, field access, full-struct "
    "equality in a join key (RowType.java, RowEqualOperator.java; Spark "
    "struct() + field access). Struct equality joins only identical rows.",
    tags=("row", "struct"),
)
def op_row_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = t(spark, sf_dir, "nation")
    pairs = nation.select(
        "n_nationkey",
        F.struct(
            F.col("n_regionkey").alias("rk"), F.substring("n_name", 1, 1).alias("ini")
        ).alias("r"),
    )
    a, b = pairs.alias("a"), pairs.alias("b")
    eq = (
        a.join(b, (F.col("a.r") == F.col("b.r")) & (F.col("a.n_nationkey") < F.col("b.n_nationkey")))
        .select(F.col("a.n_nationkey").alias("nk_a"), F.col("b.n_nationkey").alias("nk_b"))
    )
    access = pairs.filter(F.col("r.ini") >= "A").select(
        F.col("n_nationkey").alias("nk_a"), F.col("r.rk").cast("bigint").alias("nk_b")
    )
    return eq.unionAll(access).orderBy("nk_a", "nk_b")


@query(
    "op_skew_salted_join",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Skew-salted join equivalence: the salted plan (big side's key "
    "salted N ways, small side replicated N times — operators/skew.py) must "
    "produce exactly the plain-join aggregate. This is the explicit skew "
    "tool for when AQE's runtime skew split can't see the hot key.",
    tags=("join", "skew"),
)
def op_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    joined = salted_join(orders, cust, big_key="o_custkey", small_key="c_custkey", salt_n=8)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "op_values",
    oracle="""
    SELECT v.region_hint, r.r_regionkey
    FROM (VALUES ('AFRICA', 10), ('ASIA', 20), ('EUROPE', 30)) v(region_hint, weight)
    JOIN region r ON r.r_name = v.region_hint
    ORDER BY v.region_hint
    """,
    doc="Inline VALUES relation joined to a table. Reference: ValuesNode.java:30; "
    "ValuesOperator.java:27 (Catalyst LocalTableScan).",
    tags=("values",),
)
def op_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    # VALUES as a Catalyst LocalRelation via SQL — NOT spark.createDataFrame,
    # whose Python-RDD serialization path costs seconds per call (and is the
    # one shape that can wedge a harness-owned session).
    vals = spark.sql(
        "SELECT * FROM VALUES ('AFRICA', 10), ('ASIA', 20), ('EUROPE', 30) AS v(region_hint, weight)"
    )
    reg = t(spark, sf_dir, "region")
    return (
        vals.join(reg, reg.r_name == vals.region_hint)
        .select("region_hint", "r_regionkey")
        .orderBy("region_hint")
    )


@query(
    "op_sample_system",
    oracle="""
    SELECT COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
    FROM lineitem WHERE l_orderkey % 20 = 3
    """,
    doc="Deterministic SYSTEM-sample analog (modulo on key) so the oracle can "
    "reproduce the selection; df.sample(fraction) itself is covered by a "
    "rows-only statistical check. Reference: SampleNode.java:31, "
    "ImplementBernoulliSampleAsFilter.java:1.",
    tags=("sample",),
)
def op_sample_system(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") % 20 == 3)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("qty"),
        )
    )


@query(
    "op_sample_bernoulli",
    # The sampled SET is RNG-based so its rows can't hash-match an oracle —
    # but the PROPERTIES every correct Bernoulli sample must satisfy can
    # (the ml_classify/ml_regress gate-boolean pattern, r9): DuckDB
    # recomputes the deterministic total and asserts the three gates the
    # Spark side verifies for real. A sampler regression (fraction drift,
    # foreign rows, unseeded nondeterminism) flips a boolean and fails the
    # value comparison.
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS total_rows,
           TRUE AS fraction_within_tolerance,
           TRUE AS sample_is_subset,
           TRUE AS seed_reproducible
    FROM lineitem
    """,
    doc="TABLESAMPLE BERNOULLI analog: df.sample(fraction, seed). "
    "Value-checked via gate booleans (r10, strengthened r11 per ADVICE): "
    "fraction within binomial tolerance; sampled rows a SUBSET of an "
    "INDEPENDENTLY RE-READ copy of the table (a fresh spark.read.parquet "
    "scan, so the anti-join compares two distinct plans over the files — "
    "not the sample's own parent plan, which would be tautological); and "
    "same-seed reproducibility where the second sample hangs off that "
    "independent scan too (two distinct plan trees must agree on count "
    "and key checksum — a genuinely falsifiable determinism check). The "
    "sample set itself is RNG-based and deliberately not hashed. "
    "Reference: SampleNode BERNOULLI.",
    tags=("sample",),
)
def op_sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    li = t(spark, sf_dir, "lineitem")
    # independent re-read: a fresh reader over the same files, NOT the
    # sample's parent DataFrame — so subset/reproducibility compare two
    # distinct plans and can actually fail (ADVICE r10)
    li2 = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    total = li.count()
    s1 = li.sample(fraction=0.1, seed=42)
    s2 = li2.sample(fraction=0.1, seed=42)
    n1 = s1.count()
    frac_ok = abs(n1 / total - 0.1) < 0.03
    # subset: every sampled (orderkey, linenumber) key exists in the
    # independently re-read table
    keys = ["l_orderkey", "l_linenumber"]
    subset_ok = s1.select(*keys).join(li2.select(*keys), keys, "left_anti").count() == 0
    # reproducibility: same seed over a DIFFERENT plan instance -> same
    # count and same key checksum
    def chk(df) -> int:
        row = df.agg(
            F.sum(F.col("l_orderkey") * 7 + F.col("l_linenumber")).alias("c")
        ).collect()[0]
        return int(row.c or 0)
    repro_ok = n1 == s2.count() and chk(s1) == chk(s2)
    # LocalRelation via SQL, not createDataFrame (Python-RDD path).
    return spark.sql(
        f"SELECT CAST({total} AS BIGINT) AS total_rows, "
        f"{str(frac_ok).lower()} AS fraction_within_tolerance, "
        f"{str(subset_ok).lower()} AS sample_is_subset, "
        f"{str(repro_ok).lower()} AS seed_reproducible"
    )


# ---------------------------------------------------------------------------
# Subqueries — ApplyNode.java:34, CorrelatedJoinNode.java:39,
# EnforceSingleRowNode.java:29; quantified comparisons.
# ---------------------------------------------------------------------------


@query(
    "op_subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) FROM orders)
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    doc="Uncorrelated scalar subquery (single-row enforcement). Reference: "
    "EnforceSingleRowNode.java:29; EnforceSingleRowOperator.java:27.",
    tags=("subquery",),
)
def op_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(
        spark,
        sf_dir,
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) FROM orders)
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 25
        """,
        ("orders",),
    )


@query(
    "op_subquery_correlated",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier s
    WHERE s_acctbal > (
      SELECT CAST(SUM(CAST(s2.s_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
      FROM supplier s2 WHERE s2.s_nationkey = s.s_nationkey
    )
    ORDER BY s_suppkey
    """,
    doc="Correlated scalar subquery (per-nation average), decorrelated to an "
    "aggregate+join by Catalyst. Reference: "
    "TransformCorrelatedScalarAggregationToJoin.java, ApplyNode.java:34.",
    tags=("subquery", "correlated"),
)
def op_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(
        spark,
        sf_dir,
        """
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier s
        WHERE s_acctbal > (
          SELECT CAST(SUM(CAST(s2.s_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
          FROM supplier s2 WHERE s2.s_nationkey = s.s_nationkey
        )
        ORDER BY s_suppkey
        """,
        ("supplier",),
    )


@query(
    "op_subquery_quantified",
    oracle="""
    SELECT p_partkey, p_retailprice
    FROM part
    WHERE p_retailprice >= ALL (SELECT p2.p_retailprice FROM part p2 WHERE p2.p_brand = 'Brand#1')
      AND p_brand = 'Brand#1'
    ORDER BY p_partkey
    """,
    doc="Quantified comparison (>= ALL). Spark SQL has no ALL/ANY quantifier, so "
    "the engine rewrites to a MAX scalar subquery — the same rewrite the "
    "reference applies (TransformQuantifiedComparisonApplyToCorrelatedJoin.java).",
    tags=("subquery", "quantified"),
)
def op_subquery_quantified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(
        spark,
        sf_dir,
        """
        SELECT p_partkey, p_retailprice
        FROM part
        WHERE p_retailprice >= (SELECT MAX(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = 'Brand#1')
          AND p_brand = 'Brand#1'
        ORDER BY p_partkey
        """,
        ("part",),
    )


@query(
    "op_lateral",
    oracle="""
    SELECT n_name, o_orderkey, o_totalprice
    FROM nation,
         LATERAL (
           SELECT o_orderkey, o_totalprice
           FROM orders JOIN customer ON o_custkey = c_custkey
           WHERE c_nationkey = n_nationkey
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
         ) top_orders
    WHERE n_nationkey < 5
    ORDER BY n_name, o_totalprice DESC, o_orderkey
    """,
    doc="LATERAL correlated subquery in FROM (top-2 orders per nation). The Spark "
    "side uses the equivalent ranked-window form, the standard decorrelation of "
    "correlated-LIMIT lateral queries. Reference: CorrelatedJoinNode.java:39 "
    "(LATERAL), SqlBase.g4:276-281.",
    tags=("lateral", "subquery"),
)
def op_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 5)
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    w = Window.partitionBy("n_nationkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("n_name", "o_orderkey", "o_totalprice")
        .orderBy("n_name", F.desc("o_totalprice"), "o_orderkey")
    )


@query(
    "op_cte_reuse",
    oracle="""
    WITH nation_bal AS (
      SELECT c_nationkey AS nk, CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
      FROM customer GROUP BY c_nationkey
    )
    SELECT a.nk, a.bal
    FROM nation_bal a
    WHERE a.bal > (SELECT CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM nation_bal)
    ORDER BY a.nk
    """,
    doc="CTE referenced twice (WITH reuse). Reference: SqlBase.g4 WITH/CTE; "
    "the reference inlines CTEs during planning, Catalyst likewise.",
    tags=("cte",),
)
def op_cte_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(
        spark,
        sf_dir,
        """
        WITH nation_bal AS (
          SELECT c_nationkey AS nk, CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
          FROM customer GROUP BY c_nationkey
        )
        SELECT a.nk, a.bal
        FROM nation_bal a
        WHERE a.bal > (SELECT CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM nation_bal)
        ORDER BY a.nk
        """,
        ("customer",),
    )


# ---------------------------------------------------------------------------
# Pivot / unpivot and misc projection — ProjectNode.java:29,
# AssignUniqueId.java:27.
# ---------------------------------------------------------------------------


@query(
    "op_pivot",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS O,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS F
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="PIVOT (status columns per returnflag). The reference has no PIVOT "
    "keyword; users write conditional aggs — both forms produce this plan.",
    tags=("pivot",),
)
def op_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)))
        .orderBy("l_returnflag")
    )


@query(
    "op_unpivot",
    oracle="""
    SELECT p_partkey, attr, val FROM (
      SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
      UNION ALL
      SELECT p_partkey, 'price' AS attr, p_retailprice AS val FROM part
    ) u
    WHERE p_partkey <= 50
    ORDER BY p_partkey, attr
    """,
    doc="UNPIVOT/melt via stack(): wide columns to (attr, val) rows.",
    tags=("unpivot",),
)
def op_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    return (
        part.select(
            "p_partkey",
            F.expr("stack(2, 'size', CAST(p_size AS DOUBLE), 'price', p_retailprice) AS (attr, val)"),
        )
        .orderBy("p_partkey", "attr")
    )


@query(
    "op_assign_unique_id",
    oracle="SELECT COUNT(*) AS n_rows, COUNT(*) AS n_unique_ids FROM lineitem",
    doc="AssignUniqueId analog: monotonically_increasing_id() must be unique per "
    "row (verified by distinct-count == row-count; same task-id-high-bits "
    "construction as the reference). Reference: AssignUniqueId.java:27, "
    "AssignUniqueIdOperator.java:29.",
    tags=("misc",),
)
def op_assign_unique_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").withColumn("uid", F.monotonically_increasing_id())
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("uid").alias("n_unique_ids"),
    )


@query(
    "op_case_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high' WHEN o_totalprice > 150000 THEN 'mid' ELSE 'low' END AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           GREATEST(o_totalprice, 100000.0) AS floor_price,
           LEAST(CAST(o_orderkey AS DOUBLE), 1000.0) AS capped_key,
           IF(o_orderpriority = '1-URGENT', 1, 0) AS is_urgent
    FROM orders
    WHERE o_orderkey <= 200
    ORDER BY o_orderkey
    """,
    doc="Conditional expressions: CASE / COALESCE / NULLIF / GREATEST / LEAST / IF. "
    "Reference: searched-case in SqlBase.g4, AbstractGreatestLeast.java:1, "
    "scalar/TryFunction.java sibling conditionals.",
    tags=("scalar", "conditional"),
)
def op_case_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("low")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias("status_norm"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("floor_price"),
        F.least(F.col("o_orderkey").cast("double"), F.lit(1000.0)).alias("capped_key"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# As-of (point-in-time) join — operators/asof.py. The reference expresses
# this as a correlated TopN subquery (CorrelatedJoinNode.java + TopNNode.java
# with n=1); the Spark-first shape is union + ordered window (one shuffle,
# no row multiplication). DuckDB's native ASOF JOIN is the oracle.
# ---------------------------------------------------------------------------


@query(
    "op_asof_join",
    oracle="""
    WITH ords AS (
        SELECT o_custkey AS user_id, CAST(o_orderdate AS TIMESTAMP) AS ots,
               o_orderkey, o_totalprice
        FROM (SELECT o.*, row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                             ORDER BY o_orderkey DESC) AS rn
              FROM orders o)
        WHERE rn = 1
    ), ev AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        FROM events WHERE user_id <= 300
    )
    SELECT ev.event_id, ev.user_id, ev.event_type,
           ords.ots AS matched_ots,
           ords.o_orderkey AS last_orderkey,
           ords.o_totalprice AS last_totalprice
    FROM ev ASOF LEFT JOIN ords ON ev.user_id = ords.user_id AND ev.ts >= ords.ots
    ORDER BY ev.event_id
    """,
    doc="As-of join: each event picks up the user's most recent order at or "
    "before the event timestamp (point-in-time feature lookup). Spark side "
    "is the union+window operator (operators/asof.py — one shuffle on the "
    "key, zero row multiplication); right side deduped to one row per "
    "(key, ts) for determinism; oracle is DuckDB's native ASOF LEFT JOIN.",
    tags=("join", "extension"),
)
def op_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = (
        t(spark, sf_dir, "events")
        .where(F.col("user_id") <= 300)
        .select("event_id", "user_id", "ts", "event_type")
    )
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    ords = (
        t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("timestamp").alias("ots"),
            "o_orderkey",
            "o_totalprice",
        )
    )
    res = asof_join(ev, ords, on="user_id", left_ts="ts", right_ts="ots",
                    value_cols=["o_orderkey", "o_totalprice"])
    return res.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("matched_ots"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    ).orderBy("event_id")


@query(
    "op_range_join_binned",
    oracle="""
    SELECT s_suppkey, COUNT(*) AS n_close
    FROM supplier JOIN customer
      ON c_acctbal BETWEEN s_acctbal - 10 AND s_acctbal + 10
    GROUP BY s_suppkey ORDER BY s_suppkey
    """,
    doc="Pure band join (NO equi key): suppliers paired with customers within "
    "±10 acctbal. Spark would plan a nested-loop for this predicate; the "
    "binned operator (operators/range_join.py) quantizes the range dimension "
    "and hash-joins on the bin with a residual filter — 3x fan-out on one "
    "side instead of |L|x|R| comparisons. Oracle runs the naive non-equi "
    "join in DuckDB.",
    tags=("join", "nonequi", "extension"),
)
def op_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.range_join import band_join

    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    return (
        band_join(supp, cust, "s_acctbal", "c_acctbal", 10.0)
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_close"))
        .orderBy("s_suppkey")
    )


def _ignore_nulls_sql(d: str) -> str:
    # LOCF gap-fill (forward-fill): NULLs injected deterministically, then
    # last/lag/first with IGNORE NULLS per user ordered by (ts, event_id).
    # Presto spells the modifier after the call (x) IGNORE NULLS; DuckDB
    # inside it (x IGNORE NULLS) — semantics identical (SqlBase.g4
    # nullTreatment; value windows in WindowAnnotationsParser).
    if d == "spark":
        locf = "last_value(v) IGNORE NULLS"
        prev = "lag(v) IGNORE NULLS"
        fst = "first_value(v) IGNORE NULLS"
    else:
        locf = "last_value(v IGNORE NULLS)"
        prev = "lag(v IGNORE NULLS)"
        fst = "first_value(v IGNORE NULLS)"
    return f"""
SELECT user_id, event_id, v,
       {locf} OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
       {prev} OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_obs,
       {fst} OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_obs
FROM (
    SELECT user_id, event_id, ts,
           CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v
    FROM events
)
WHERE user_id <= 100
ORDER BY user_id, ts, event_id
"""


@query(
    "op_window_ignore_nulls",
    oracle=_ignore_nulls_sql("duck"),
    doc="IGNORE NULLS value windows (SqlBase.g4 nullTreatment): LOCF "
    "forward-fill via last_value, previous-observation lag, first_value — "
    "the time-series gap-fill staple. One shuffle on user_id.",
    tags=("window",),
)
def op_window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _ignore_nulls_sql("spark"), ("events",))


# --- time-based RANGE frames (WindowNode frameType=RANGE with offsets) -----

_RANGE_INTERVAL_SPARK = """
SELECT user_id, event_id,
       CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS trailing_1d_value,
       count(*) OVER w AS trailing_1d_events,
       CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w / (count(*) OVER w) AS DECIMAL(16,4)) AS DOUBLE) AS trailing_1d_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1' DAY PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""

_RANGE_INTERVAL_DUCK = """
SELECT user_id, event_id,
       CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS trailing_1d_value,
       count(*) OVER w AS trailing_1d_events,
       CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w / (count(*) OVER w) AS DECIMAL(16,4)) AS DOUBLE) AS trailing_1d_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1 day' PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


@query(
    "op_window_range_interval",
    oracle=_RANGE_INTERVAL_DUCK,
    doc="Time-based RANGE frame: trailing-24h sum/count/avg per user, the "
    "sliding-aggregate staple Presto plans as WindowNode frameType=RANGE "
    "with a value offset (WindowFrame.java). One shuffle on user_id; the "
    "frame scan is a per-partition two-pointer sweep, no self-join.",
    tags=("window",),
)
def op_window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _RANGE_INTERVAL_SPARK, ("events",))


# --- JOIN USING / NATURAL JOIN (SqlBase.g4:211-231 joinCriteria) -----------

_JOIN_USING_SQL = """
SELECT n_nationkey, n_name, count(*) AS n_customers
FROM (SELECT c_nationkey AS n_nationkey, c_custkey FROM customer) c
JOIN nation USING (n_nationkey)
GROUP BY n_nationkey, n_name
ORDER BY n_nationkey
"""


@query(
    "op_join_using",
    oracle=_JOIN_USING_SQL,
    doc="JOIN ... USING (coalesced single key column in the output — the "
    "grammar's joinCriteria USING branch). Same text runs on both engines.",
    tags=("join",),
)
def op_join_using(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _JOIN_USING_SQL, ("customer", "nation"))


_JOIN_NATURAL_SQL = """
SELECT r_name, count(*) AS n_nations
FROM (SELECT n_name, n_regionkey AS r_regionkey FROM nation) n
NATURAL JOIN region
GROUP BY r_name
ORDER BY r_name
"""


@query(
    "op_join_natural",
    oracle=_JOIN_NATURAL_SQL,
    doc="NATURAL JOIN (implicit equi-keys from shared column names). Same "
    "text on both engines; the single shared column is the join key.",
    tags=("join",),
)
def op_join_natural(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _JOIN_NATURAL_SQL, ("nation", "region"))
