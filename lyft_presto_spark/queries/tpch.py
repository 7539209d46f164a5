"""TPC-H-shaped query corpus adapted to the driver fixture schema.

The reference treats TPC-H as its primary correctness corpus
(presto-tests/src/test/java/io/prestosql/tests/tpch/TpchQueryRunner.java,
presto-benchto-benchmarks/src/main/resources/sql/presto/tpch/q01.sql..q22.sql
— SURVEY.md §5.3, §6). The driver schema is a column subset (no partsupp, no
commit/receipt dates, no comments/phone — FIXTURES.md), so queries whose
predicates need missing columns are adapted while preserving the operator
shape (join graph, agg structure, subquery form).

Numeric-stability convention (applies to every query in this package):
double money columns are cast to tight DECIMALs before any SUM so the
accumulation is exact and order-independent, then the final aggregate is cast
to DOUBLE. Spark and DuckDB then produce bit-identical values regardless of
partitioning. Averages divide an exact decimal sum by a count in double.

(Measured alternative: summing integer cents as BIGINT is ~1.6x faster at
sf0.1 but overflows int64 near 1e9 rows for charge-style three-factor
products — a small-data trick that breaks at the 100 TB target. Spark's
decimal aggregation is 128-bit; it stays exact at any scale, so it wins.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import staged_view
from .registry import query, sql_over, t

# Tight decimal casts: l_extendedprice < 1e6, discount/tax in [0,1].
PRICE = "decimal(12,2)"
FRAC = "decimal(4,2)"
QTY = "decimal(12,2)"


def _dec(col: str, typ: str) -> F.Column:
    return F.col(col).cast(typ)


def disc_price() -> F.Column:
    # decimal(12,2) * decimal(5,2) -> exact
    return _dec("l_extendedprice", PRICE) * (F.lit(1).cast(FRAC) - _dec("l_discount", FRAC))


def charge() -> F.Column:
    return disc_price() * (F.lit(1).cast(FRAC) + _dec("l_tax", FRAC))


# Same expressions in DuckDB's dialect (identical semantics by construction).
SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)
SQL_CHARGE = SQL_DISC_PRICE + " * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))"


@query(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({SQL_CHARGE}) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: scan->filter->hash agg (partial/final) -> sort. "
    "Reference: sql/presto/tpch/q01.sql; HashAggregationOperator.java:48.",
    tags=("tpch", "aggregation"),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity", QTY)).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice", PRICE)).cast("double").alias("sum_base_price"),
            F.sum(disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(charge()).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity", QTY)).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice", PRICE)).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(_dec("l_discount", FRAC)).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shipping priority: 3-way join (broadcast dims) -> agg -> TopN. "
    "Reference: q03.sql; TopNOperator.java:36.",
    tags=("tpch", "join", "topn"),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (EXISTS semi-join + agg), adapted: no commit/receipt dates in "
    "the fixture, so 'late' = shipped >60 days after order date. "
    "Reference: q04.sql; HashSemiJoinOperator.java:48.",
    tags=("tpch", "semijoin", "subquery"),
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        ("orders", "lineitem"),
    )


@query(
    "tpch_q5",
    oracle=f"""
    SELECT n_name, CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 local supplier volume: 6-way join graph; dims broadcast, fact "
    "shuffles once on orderkey. Reference: q05.sql; LookupJoinOperator.java:53.",
    tags=("tpch", "join"),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 forecast revenue: pure scan+filter+global agg; filters push to "
    "parquet row groups. Reference: q06.sql; AggregationOperator.java:35.",
    tags=("tpch", "aggregation", "pushdown"),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice", PRICE) * _dec("l_discount", FRAC))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS l_year,
             {SQL_DISC_PRICE} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 volume shipping: self-joined dimension (nation n1/n2), OR of "
    "conjuncts, year extraction. Reference: q07.sql.",
    tags=("tpch", "join"),
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(
        spark,
        sf_dir,
        f"""
        SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 EXTRACT(year FROM l_shipdate) AS l_year,
                 {SQL_DISC_PRICE} AS volume
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
        """,
        ("supplier", "lineitem", "orders", "customer", "nation"),
    )


@query(
    "tpch_q8",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             {SQL_DISC_PRICE} AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 national market share: 8-way join + conditional aggregation ratio. "
    "Adapted: p_type = 'ECONOMY' (fixture p_type is a single word). Reference: q08.sql.",
    tags=("tpch", "join", "case"),
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(
        spark,
        sf_dir,
        f"""
        SELECT o_year,
               CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE) AS mkt_share
        FROM (
          SELECT EXTRACT(year FROM o_orderdate) AS o_year,
                 {SQL_DISC_PRICE} AS volume,
                 n2.n_name AS nation
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
            AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
        ) all_nations
        GROUP BY o_year
        ORDER BY o_year
        """,
        ("part", "lineitem", "supplier", "orders", "customer", "nation", "region"),
    )


@query(
    "tpch_q9",
    oracle=f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
             {SQL_DISC_PRICE} AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape (product profit by nation/year), adapted: fixture has no "
    "partsupp/supplycost, so amount = discounted revenue. LIKE filter on p_name. "
    "Reference: q09.sql.",
    tags=("tpch", "join", "like"),
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    nat = t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            disc_price().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           c_acctbal, n_name, c_mktsegment
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 returned-item reporting: join + agg + top-20. Reference: q10.sql.",
    tags=("tpch", "join", "topn"),
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q12",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    doc="TPC-H Q12 shape (priority CASE-sums per group), adapted: fixture lacks "
    "l_shipmode/commit/receipt dates; group by l_linestatus over a shipdate year. "
    "Reference: q12.sql.",
    tags=("tpch", "join", "case"),
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 customer distribution: left outer join with join-level filter + "
    "double aggregation. Reference: q13.sql.",
    tags=("tpch", "outerjoin", "aggregation"),
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q14",
    oracle=f"""
    SELECT CAST(100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_DISC_PRICE}
                                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                / CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS DOUBLE) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
    doc="TPC-H Q14 promo effect: join + conditional-agg ratio. Reference: q14.sql.",
    tags=("tpch", "join", "case"),
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", disc_price()).otherwise(zero)).cast("double")
                / F.sum(disc_price()).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 top supplier: CTE + scalar subquery on aggregated max. "
    "Reference: q15.sql; EnforceSingleRowNode.java:29 analog (scalar subquery).",
    tags=("tpch", "cte", "subquery"),
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:


    # the revenue view feeds the supplier join AND the MAX scalar
    # subquery; Spark inlines CTEs, so unstaged it scans lineitem twice —
    # the reference materializes q15's revenue view for the same reason.
    # Staged as a LogicalRDD leaf (operators/staging.py) so both
    # consumers read one materialization.
    revenue_v = staged_view(
        spark, sf_dir, "tpch_q15_revenue",
        lambda: sql_over(
            spark, sf_dir,
            f"""
            SELECT l_suppkey AS supplier_no, CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
            """,
            ("lineitem",),
        ),
    )
    return sql_over(
        spark,
        sf_dir,
        f"""
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN {revenue_v} ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM {revenue_v})
        ORDER BY s_suppkey
        """,
        ("supplier",),
    )


@query(
    "tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (distinct-supplier counts per part attrs), adapted: fixture "
    "lacks partsupp, so supplier relationships come from lineitem. "
    "Reference: q16.sql; MarkDistinctNode.java:31 (COUNT DISTINCT).",
    tags=("tpch", "distinct"),
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q17",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.5 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey
      )
    """,
    doc="TPC-H Q17 small-quantity-order revenue: correlated scalar subquery "
    "(decorrelated by Catalyst into an aggregate+join). Adapted: no container "
    "column, brand-only filter. Reference: q17.sql.",
    tags=("tpch", "subquery"),
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(
        spark,
        sf_dir,
        """
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#3'
          AND l_quantity < (
            SELECT 0.5 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey
          )
        """,
        ("lineitem", "part"),
    )


@query(
    "tpch_q18",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 large-volume customers: IN over aggregated HAVING subquery "
    "(semi-join) + top-100. Reference: q18.sql.",
    tags=("tpch", "semijoin", "having", "topn"),
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-scan rewrite of the spec's IN-over-HAVING shape (the oracle keeps
    # that shape): the subquery's per-order SUM is exactly the outer
    # aggregate, so compute it once, filter >150, and join the survivors to
    # orders/customer. o_orderkey functionally determines the other group
    # keys, so the outer GROUP BY disappears. At scale this halves the
    # lineitem traffic and the HAVING survivors are rare (~1e-5 of orders),
    # so both joins broadcast the aggregate instead of shuffling the facts.
    return sql_over(
        spark,
        sf_dir,
        """
        WITH big AS (
          SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty_d
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(sum_qty_d AS DOUBLE) AS sum_qty
        FROM big
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        LIMIT 100
        """,
        ("customer", "orders", "lineitem"),
    )


@query(
    "tpch_q19",
    oracle=f"""
    SELECT CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    doc="TPC-H Q19 discounted revenue: join with disjunctive multi-column residual "
    "predicate (OR-of-ANDs). Adapted to fixture part columns. Reference: q19.sql.",
    tags=("tpch", "join", "predicate"),
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(F.sum(disc_price()).cast("double").alias("revenue"))


@query(
    "tpch_q21",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND n_name = 'NATION_5'
      AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    doc="TPC-H Q21 waiting-supplier shape: EXISTS + NOT EXISTS correlated "
    "subqueries (semi + anti join) over the same fact. Adapted: 'late' = shipped "
    ">30 days after order date (no commit/receipt dates). Reference: q21.sql.",
    tags=("tpch", "semijoin", "antijoin"),
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-scan rewrite of the spec's EXISTS/NOT-EXISTS shape (the oracle
    # keeps that shape). Per order: EXISTS(other supplier) = more than one
    # distinct supplier on the order; NOT EXISTS(other late supplier) = this
    # row is late and the order has exactly one late supplier. Both are
    # per-order window aggregates (collect_set is bounded by suppliers per
    # order, ~4-7), so lineitem is scanned ONCE and shuffled ONCE on
    # l_orderkey — Catalyst's decorrelation would scan and shuffle it three
    # times (l1 + semi + anti). The orders join lands on the same key, so at
    # scale the window reuses the join's partitioning.
    return sql_over(
        spark,
        sf_dir,
        """
        WITH flagged AS (
          SELECT l_orderkey, l_suppkey,
                 l_shipdate > o_orderdate + INTERVAL 30 DAY AS late
          FROM lineitem JOIN orders ON o_orderkey = l_orderkey
          WHERE o_orderstatus = 'F'
        ),
        scored AS (
          SELECT l_suppkey, late,
                 size(collect_set(l_suppkey)
                      OVER (PARTITION BY l_orderkey)) AS n_supp,
                 size(collect_set(CASE WHEN late THEN l_suppkey END)
                      OVER (PARTITION BY l_orderkey)) AS n_late_supp
          FROM flagged
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM scored
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE late AND n_supp > 1 AND n_late_supp = 1
          AND n_name = 'NATION_5'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
        """,
        ("supplier", "lineitem", "orders", "nation"),
    )


@query(
    "tpch_q22",
    oracle="""
    SELECT n_name, COUNT(*) AS numcust, CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0.00
      )
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
    ORDER BY n_name
    """,
    doc="TPC-H Q22 global-sales-opportunity shape: uncorrelated scalar subquery + "
    "NOT EXISTS anti-join + agg. Adapted: group by nation (fixture has no phone "
    "country codes). Reference: q22.sql.",
    tags=("tpch", "antijoin", "subquery"),
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(
        spark,
        sf_dir,
        """
        SELECT n_name, COUNT(*) AS numcust, CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
            FROM customer WHERE c_acctbal > 0.00
          )
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY n_name
        ORDER BY n_name
        """,
        ("customer", "nation", "orders"),
    )


# q2 / q11 / q20 depend on partsupp, which the driver fixture set omits
# (FIXTURES.md). lineitem(l_partkey, l_suppkey) is the part<->supplier bridge,
# and unit price l_extendedprice/l_quantity stands in for ps_supplycost.
# Operator *shape* is preserved exactly: q2's correlated min scalar subquery,
# q11's global-fraction HAVING with an uncorrelated scalar subquery, q20's
# nested IN/semi-join chain.

_Q2_SUPPLY = """
    SELECT l_partkey AS partkey, l_suppkey AS suppkey,
           min(CAST(l_extendedprice AS DECIMAL(12,2)) / CAST(l_quantity AS DECIMAL(12,2))) AS unit_cost
    FROM lineitem
    WHERE l_quantity > 0
    GROUP BY l_partkey, l_suppkey
"""

# {supply}: the CTE name (oracle) or the staged view name (Spark) — the
# supply aggregate feeds the main join AND the correlated min subquery
_Q2_BODY = """
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       CAST(sp.unit_cost AS DOUBLE) AS supplycost
FROM part
JOIN {supply} sp ON sp.partkey = p_partkey
JOIN supplier ON s_suppkey = sp.suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size = 15
  AND r_name = 'REGION_1'
  AND sp.unit_cost = (
      SELECT min(sp2.unit_cost)
      FROM {supply} sp2
      JOIN supplier s2 ON s2.s_suppkey = sp2.suppkey
      JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      WHERE sp2.partkey = p_partkey AND r2.r_name = 'REGION_1'
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

_Q2_SQL = f"""
WITH supply AS ({_Q2_SUPPLY})
{_Q2_BODY.format(supply="supply")}
"""


@query(
    "tpch_q2",
    oracle=_Q2_SQL,
    doc="TPC-H Q2 minimum-cost-supplier shape: 5-way join + correlated min "
    "scalar subquery (decorrelated by Catalyst to an aggregate+join). Adapted: "
    "partsupp derived from lineitem unit prices. Reference: q02.sql; "
    "TransformCorrelatedScalarAggregationToJoin.java.",
    tags=("tpch", "join", "subquery"),
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.staging import staged_view

    # the supply aggregate feeds the main join AND the correlated min
    # subquery; unstaged, the lineitem grouping runs twice (CTE inlining)
    supply_v = staged_view(
        spark, sf_dir, "tpch_q2_supply",
        lambda: sql_over(spark, sf_dir, _Q2_SUPPLY, ("lineitem",)),
    )
    return sql_over(
        spark, sf_dir,
        _Q2_BODY.format(supply=supply_v),
        ("part", "supplier", "nation", "region"),
    )


_Q11_SQL = """
WITH supply AS (
    SELECT l_partkey AS partkey, s_nationkey,
           SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS value_dec
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY l_partkey, s_nationkey
)
SELECT partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM supply
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
GROUP BY partkey, value_dec
HAVING value_dec > (
    SELECT SUM(value_dec) * 0.0001
    FROM supply
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
)
ORDER BY part_value DESC, partkey
"""


@query(
    "tpch_q11",
    oracle=_Q11_SQL,
    doc="TPC-H Q11 important-stock shape: agg + HAVING against an "
    "uncorrelated scalar subquery over the same aggregate (one broadcast of "
    "the scalar). Adapted: stock value from lineitem x supplier. Reference: "
    "q11.sql.",
    tags=("tpch", "aggregation", "subquery"),
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The supply CTE feeds both the main aggregation and the HAVING scalar
    # subquery; Spark inlines CTEs, so stage it once (nation filter applied)
    # with a managed persisted lifetime (operators/staging.py) — one lineitem
    # scan + join instead of two, one cached copy per session no matter how
    # many times the query runs.
    supply_v = staged_view(
        spark,
        sf_dir,
        "tpch_q11_supply",
        lambda: sql_over(
            spark,
            sf_dir,
            """
            SELECT l_partkey AS partkey,
                   SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS value_dec
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
            GROUP BY l_partkey
            """,
            ("lineitem", "supplier", "nation"),
        ),
    )
    return spark.sql(
        f"""
        SELECT partkey, CAST(value_dec AS DOUBLE) AS part_value
        FROM {supply_v}
        WHERE value_dec > (SELECT SUM(value_dec) * 0.0001 FROM {supply_v})
        ORDER BY part_value DESC, partkey
        """
    )


_Q20_SQL = """
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (
          SELECT p_partkey FROM part WHERE p_size <= 10
      )
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > (
          SELECT 0.5 * SUM(CAST(l2.l_quantity AS DECIMAL(12,2)))
          FROM lineitem l2
          WHERE l2.l_partkey = lineitem.l_partkey
            AND l2.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l2.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      )
  )
ORDER BY s_name
"""


@query(
    "tpch_q20",
    oracle=_Q20_SQL,
    doc="TPC-H Q20 excess-supply shape: nested IN semi-joins + correlated "
    "scalar subquery under HAVING. Adapted: availqty test over lineitem "
    "shipped quantities. Reference: q20.sql; "
    "TransformUncorrelatedInPredicateSubqueryToSemiJoin.java.",
    tags=("tpch", "semijoin", "subquery"),
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _Q20_SQL, ("supplier", "nation", "lineitem", "part"))
