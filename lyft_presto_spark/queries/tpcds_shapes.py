"""TPC-DS-shaped query corpus adapted to the driver fixture schema.

The reference ships a 103-query TPC-DS benchmark corpus
(presto-benchto-benchmarks/src/main/resources/sql/presto/tpcds/q01.sql..q99.sql
— BASELINE.md) exercising operator COMBINATIONS the TPC-H corpus doesn't:
correlated scalar subqueries over a shared CTE (q01), channel UNION ALL +
weekday pivot + week-offset CTE self-join (q02), multi-channel year totals
with growth-ratio self-joins (q11), ROLLUP + GROUPING() + windowed rank
(q36), cumulative-sum windows FULL OUTER JOINed across channels (q51),
avg-over + lag/lead deviation screens (q47), share-of-class windows over
grouped aggregates (q98), repeated-CTE semi-joins (q95), before/after
CASE-pivot ratio screens (q21), count-range cohorts joined back to the
dimension (q34), and multi-bucket scalar scans (q88).

The fixture schema has no TPC-DS tables, so each shape is re-based on the
TPC-H-style fixtures while preserving the operator structure: lineitem JOIN
orders plays store_sales (o_orderdate is the date_dim), l_linenumber parity
splits the fact into the two "channels" the DS queries union, part plays
item, and customer/nation/region play the customer/store dimensions.

Numeric-stability convention is inherited from queries/tpch.py: money is
cast to tight DECIMALs before SUM (exact, order-independent), ratios divide
the exact sums after casting to DOUBLE (same IEEE operands both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.staging import staged
from .registry import query, sql_over, t
from .tpch import FRAC, PRICE, QTY, SQL_DISC_PRICE, _dec, disc_price

# Monday before the fixture's earliest order date (1995-01-01), so day
# diffs are non-negative and floor-div/modulo agree between the engines.
_EPOCH = "1994-12-26"
_SQL_DAYS = f"date_diff('day', TIMESTAMP '{_EPOCH} 00:00:00', o_orderdate)"
_SQL_PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
_SQL_QTY = "CAST(l_quantity AS DECIMAL(12,2))"


def _days() -> F.Column:
    return F.datediff(F.col("o_orderdate"), F.lit(_EPOCH).cast("timestamp"))


# --- q01 shape: CTE + per-group-average screen ------------------------------


@query(
    "tpcds_q01_returns_above_avg",
    oracle=f"""
    WITH ctr AS (
        SELECT o_custkey AS ctr_custkey,
               c_nationkey AS ctr_nationkey,
               SUM({_SQL_PRICE}) AS ctr_total_return
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
        GROUP BY o_custkey, c_nationkey
    )
    SELECT c_name, CAST(ctr_total_return AS DOUBLE) AS total_return
    FROM ctr ctr1
    JOIN customer ON ctr1.ctr_custkey = c_custkey
    WHERE CAST(ctr_total_return AS DOUBLE) > 1.2 * (
        SELECT CAST(SUM(ctr_total_return) AS DOUBLE) / COUNT(*)
        FROM ctr ctr2
        WHERE ctr1.ctr_nationkey = ctr2.ctr_nationkey
    )
    ORDER BY c_name
    LIMIT 100
    """,
    doc="TPC-DS q01 shape (sql/presto/tpcds/q01.sql): a returns-total CTE "
    "consumed twice — once as the driving row set, once inside a "
    "correlated scalar subquery computing the per-group (nation) average "
    "screen. Spark expresses the correlated aggregate as a window over the "
    "same CTE — one shuffle on the group key instead of a per-row "
    "re-aggregation; the oracle keeps the reference's literal correlated "
    "form, so the two formulations must agree.",
    tags=("tpcds", "subquery"),
)
def tpcds_q01_returns_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    ctr = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("o_custkey").alias("ctr_custkey"),
            F.col("c_nationkey").alias("ctr_nationkey"),
        )
        .agg(F.sum(_dec("l_extendedprice", PRICE)).alias("ctr_total_return"))
    )
    w = Window.partitionBy("ctr_nationkey")
    screened = ctr.select(
        "ctr_custkey",
        F.col("ctr_total_return").cast("double").alias("total_return"),
        (
            F.sum("ctr_total_return").over(w).cast("double")
            / F.count("*").over(w)
        ).alias("nation_avg"),
    ).filter(F.col("total_return") > 1.2 * F.col("nation_avg"))
    return (
        screened.join(cust, screened.ctr_custkey == cust.c_custkey)
        .select("c_name", "total_return")
        .orderBy("c_name")
        .limit(100)
    )


# --- q02 shape: channel union + weekday pivot + week-offset self-join -------

_Q02_SQL_WSWSCS = f"""
    wscs AS (
        SELECT o_orderdate, {_SQL_PRICE} AS sales_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_linenumber % 2 = 0
        UNION ALL
        SELECT o_orderdate, {_SQL_PRICE} AS sales_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_linenumber % 2 = 1
    ),
    wswscs AS (
        SELECT {_SQL_DAYS} // 7 AS wk,
               SUM(CASE WHEN {_SQL_DAYS} % 7 = 0 THEN sales_price END) AS mon_sales,
               SUM(CASE WHEN {_SQL_DAYS} % 7 = 3 THEN sales_price END) AS thu_sales,
               SUM(CASE WHEN {_SQL_DAYS} % 7 = 6 THEN sales_price END) AS sun_sales
        FROM wscs
        GROUP BY {_SQL_DAYS} // 7
    )
"""


@query(
    "tpcds_q02_week_over_year_ratio",
    oracle=f"""
    WITH {_Q02_SQL_WSWSCS}
    SELECT y.wk AS wk,
           CAST(y.mon_sales AS DOUBLE) / CAST(z.mon_sales AS DOUBLE) AS mon_ratio,
           CAST(y.thu_sales AS DOUBLE) / CAST(z.thu_sales AS DOUBLE) AS thu_ratio,
           CAST(y.sun_sales AS DOUBLE) / CAST(z.sun_sales AS DOUBLE) AS sun_ratio
    FROM wswscs y JOIN wswscs z ON y.wk = z.wk - 52
    WHERE y.wk >= 53 AND y.wk < 105
    ORDER BY wk
    """,
    doc="TPC-DS q02 shape (q02.sql): two 'channels' (l_linenumber parity "
    "standing in for web_sales/catalog_sales) UNION ALLed, pivoted into "
    "weekday columns per week via conditional aggregation, then the pivot "
    "CTE self-joined at a 52-week offset to produce year-over-year weekday "
    "ratios. Ratios divide exact decimal sums as doubles.",
    tags=("tpcds", "union", "window"),
)
def tpcds_q02_week_over_year_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    even = joined.filter(F.col("l_linenumber") % 2 == 0)
    odd = joined.filter(F.col("l_linenumber") % 2 == 1)
    wscs = even.select(
        "o_orderdate", _dec("l_extendedprice", PRICE).alias("sales_price")
    ).unionAll(
        odd.select(
            "o_orderdate", _dec("l_extendedprice", PRICE).alias("sales_price")
        )
    )
    days = _days()

    def dow_sum(d: int) -> F.Column:
        return F.sum(F.when(days % 7 == d, F.col("sales_price")))

    wswscs = wscs.groupBy(F.floor(days / 7).alias("wk")).agg(
        dow_sum(0).alias("mon_sales"),
        dow_sum(3).alias("thu_sales"),
        dow_sum(6).alias("sun_sales"),
    )
    y = wswscs.alias("y")
    z = wswscs.alias("z")
    return (
        y.join(z, F.col("y.wk") == F.col("z.wk") - 52)
        .filter((F.col("y.wk") >= 53) & (F.col("y.wk") < 105))
        .select(
            F.col("y.wk").alias("wk"),
            (
                F.col("y.mon_sales").cast("double")
                / F.col("z.mon_sales").cast("double")
            ).alias("mon_ratio"),
            (
                F.col("y.thu_sales").cast("double")
                / F.col("z.thu_sales").cast("double")
            ).alias("thu_ratio"),
            (
                F.col("y.sun_sales").cast("double")
                / F.col("z.sun_sales").cast("double")
            ).alias("sun_ratio"),
        )
        .orderBy("wk")
    )


# --- q11 shape: two-channel year totals, growth-ratio self-join -------------

_Q11_SQL_YEAR_TOTAL = f"""
    year_total AS (
        SELECT o_custkey AS customer_sk,
               year(o_orderdate) AS yr,
               CASE WHEN l_linenumber % 2 = 0 THEN 's' ELSE 'w' END AS channel,
               SUM({SQL_DISC_PRICE}) AS total
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey, year(o_orderdate),
                 CASE WHEN l_linenumber % 2 = 0 THEN 's' ELSE 'w' END
    )
"""


@query(
    "tpcds_q11_channel_growth",
    oracle=f"""
    WITH {_Q11_SQL_YEAR_TOTAL}
    SELECT s1.customer_sk AS customer_sk,
           CAST(s2.total AS DOUBLE) / CAST(s1.total AS DOUBLE) AS store_growth,
           CAST(w2.total AS DOUBLE) / CAST(w1.total AS DOUBLE) AS web_growth
    FROM year_total s1
    JOIN year_total s2 ON s1.customer_sk = s2.customer_sk
    JOIN year_total w1 ON s1.customer_sk = w1.customer_sk
    JOIN year_total w2 ON s1.customer_sk = w2.customer_sk
    WHERE s1.channel = 's' AND s1.yr = 1996
      AND s2.channel = 's' AND s2.yr = 1997
      AND w1.channel = 'w' AND w1.yr = 1996
      AND w2.channel = 'w' AND w2.yr = 1997
      AND CAST(w2.total AS DOUBLE) / CAST(w1.total AS DOUBLE)
        > CAST(s2.total AS DOUBLE) / CAST(s1.total AS DOUBLE)
    ORDER BY customer_sk
    LIMIT 100
    """,
    doc="TPC-DS q11/q04 shape (q11.sql): a UNION-style two-channel year_total "
    "CTE self-joined four ways per customer, keeping customers whose web "
    "growth (1996->1997) beat their store growth. The CTE is staged once "
    "(operators/staging.py) — Spark inlines CTEs, and a 4-way self-join of "
    "a recomputed aggregate would re-scan the fact four times; the staged "
    "artifact is the reference's CTE-materialization analog.",
    tags=("tpcds", "join"),
)
def tpcds_q11_channel_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        li = t(spark, sf_dir, "lineitem")
        orders = t(spark, sf_dir, "orders")
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy(
                F.col("o_custkey").alias("customer_sk"),
                F.year("o_orderdate").alias("yr"),
                F.when(F.col("l_linenumber") % 2 == 0, "s")
                .otherwise("w")
                .alias("channel"),
            )
            .agg(F.sum(disc_price()).alias("total"))
        )

    yt = staged(spark, sf_dir, "tpcds_year_total", build)

    def slice_(channel: str, yr: int, alias: str) -> DataFrame:
        return (
            yt.filter((F.col("channel") == channel) & (F.col("yr") == yr))
            .select("customer_sk", F.col("total").alias(f"{alias}_total"))
        )

    s1, s2 = slice_("s", 1996, "s1"), slice_("s", 1997, "s2")
    w1, w2 = slice_("w", 1996, "w1"), slice_("w", 1997, "w2")
    joined = (
        s1.join(s2, "customer_sk")
        .join(w1, "customer_sk")
        .join(w2, "customer_sk")
        .select(
            "customer_sk",
            (
                F.col("s2_total").cast("double") / F.col("s1_total").cast("double")
            ).alias("store_growth"),
            (
                F.col("w2_total").cast("double") / F.col("w1_total").cast("double")
            ).alias("web_growth"),
        )
    )
    return (
        joined.filter(F.col("web_growth") > F.col("store_growth"))
        .orderBy("customer_sk")
        .limit(100)
    )


# --- q36 shape: ROLLUP + GROUPING() + rank within hierarchy level -----------


@query(
    "tpcds_q36_rollup_margin_rank",
    oracle=f"""
    WITH agg AS (
        SELECT r_name, n_name,
               CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE)
                   / CAST(SUM({_SQL_PRICE}) AS DOUBLE) AS margin,
               GROUPING(r_name) + GROUPING(n_name) AS lochierarchy,
               CASE WHEN GROUPING(n_name) = 0 THEN r_name END AS rank_group
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    )
    SELECT r_name, n_name, lochierarchy, margin,
           RANK() OVER (PARTITION BY lochierarchy, rank_group
                        ORDER BY margin) AS rank_within_parent
    FROM agg
    ORDER BY lochierarchy DESC, r_name NULLS FIRST, n_name NULLS FIRST
    """,
    doc="TPC-DS q36 shape (q36.sql): gross-margin ROLLUP over the "
    "region->nation hierarchy with GROUPING()-derived hierarchy level and "
    "RANK() within each parent (partitioned by level and the CASE-gated "
    "parent key). GroupIdNode + window over grouped aggregate — the "
    "combination TPC-H never exercises.",
    tags=("tpcds", "rollup", "window"),
)
def tpcds_q36_rollup_margin_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    # Pre-aggregate the exact decimal sums per leaf BEFORE the rollup:
    # Catalyst does not push partial aggregation through Expand, so rolling
    # up the raw fact replicates every fact row once per grouping set (3x
    # the decimal work and shuffle width — this was the heaviest registry
    # row, ~2.5 s at sf0.1). Rollup-of-sums == sum by associativity, and
    # the dimension keys are never NULL in the base data, so GROUPING()
    # semantics are unchanged. ~25 rows enter Expand.
    #
    # OPTIMIZATION r16: key the fact-side aggregate on c_nationkey (one
    # int) and join nation/region names to the 25-row aggregate AFTER —
    # the 600k-row path previously paid two extra per-row broadcast hash
    # probes (nation, region) plus string-keyed (r_name, n_name) partial
    # aggregation. Equivalent because nationkey determines (n_name,
    # r_name) (FK into nation ⨝ region, both inner joins), and the rollup
    # leaf grouping set re-aggregates by the names anyway, so even
    # same-named nations merge exactly as before.
    per_nation = joined.groupBy("c_nationkey").agg(
        F.sum(disc_price()).alias("s_disc"),
        F.sum(_dec("l_extendedprice", PRICE)).alias("s_price"),
    )
    base = (
        per_nation.join(
            F.broadcast(nation), per_nation.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("r_name", "n_name", "s_disc", "s_price")
    )
    agg = base.rollup("r_name", "n_name").agg(
        (
            F.sum("s_disc").cast("double") / F.sum("s_price").cast("double")
        ).alias("margin"),
        (F.grouping("r_name") + F.grouping("n_name")).alias("lochierarchy"),
        F.when(F.grouping("n_name") == 0, F.col("r_name")).alias("rank_group"),
    )
    w = Window.partitionBy("lochierarchy", "rank_group").orderBy("margin")
    return (
        agg.select(
            "r_name", "n_name", "lochierarchy", "margin",
            F.rank().over(w).alias("rank_within_parent"),
        )
        .orderBy(
            F.desc("lochierarchy"),
            F.asc_nulls_first("r_name"),
            F.asc_nulls_first("n_name"),
        )
    )


# --- q51 shape: per-channel cumulative sums + FULL OUTER JOIN ---------------

def _q51_sql_channel(parity: int) -> str:
    return f"""
        SELECT l_partkey % 10 AS bucket,
               {_SQL_DAYS} // 7 AS wk,
               SUM({_SQL_PRICE}) AS sales
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_linenumber % 2 = {parity} AND year(o_orderdate) = 1996
        GROUP BY l_partkey % 10, {_SQL_DAYS} // 7
"""


@query(
    "tpcds_q51_cumulative_crossover",
    oracle=f"""
    WITH web AS (
        SELECT bucket, wk, SUM(sales) OVER (
            PARTITION BY bucket ORDER BY wk
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume
        FROM ({_q51_sql_channel(1)}) w0
    ),
    store AS (
        SELECT bucket, wk, SUM(sales) OVER (
            PARTITION BY bucket ORDER BY wk
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume
        FROM ({_q51_sql_channel(0)}) s0
    )
    SELECT COALESCE(web.bucket, store.bucket) AS bucket,
           COALESCE(web.wk, store.wk) AS wk,
           CAST(web.cume AS DOUBLE) AS web_cumulative,
           CAST(store.cume AS DOUBLE) AS store_cumulative
    FROM web FULL OUTER JOIN store
      ON web.bucket = store.bucket AND web.wk = store.wk
    WHERE web.cume > store.cume
    ORDER BY bucket, wk
    """,
    doc="TPC-DS q51 shape (q51.sql): per-channel weekly revenue with "
    "running-total windows, FULL OUTER JOINed across channels on "
    "(bucket, week), keeping weeks where the web running total overtook "
    "the store one. Window-then-outer-join — the DS-only combination.",
    tags=("tpcds", "window", "join"),
)
def tpcds_q51_cumulative_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.year("o_orderdate") == 1996
    )
    # OPTIMIZATION r15 (guide §2.3-2.4): the two channels partition the
    # fact disjointly on linenumber parity — one conditional aggregation
    # plus ONE window sort computes both running sums (the window's sum
    # skips a channel's NULL weeks, so each running value equals the
    # per-channel cume over its own week set), and the FULL OUTER join
    # disappears. The join's null-extension semantics survive as presence
    # checks: the crossover filter only ever passed weeks where BOTH
    # channels had a group (a missing side's cume was NULL), which is
    # exactly web_sales/store_sales IS NOT NULL at that week. Measured
    # 1.45 -> ~0.9 s (2 fact scans + 2 aggs + 2 window sorts + full-outer
    # SMJ -> 1 scan + 1 agg + 1 window sort). Oracle keeps the
    # two-channel FULL OUTER spelling (DuckDB materializes the CTEs).
    par = F.col("l_linenumber") % 2
    merged = joined.groupBy(
        (F.col("l_partkey") % 10).alias("bucket"),
        F.floor(_days() / 7).alias("wk"),
    ).agg(
        F.sum(F.when(par == 1, _dec("l_extendedprice", PRICE))).alias("web_sales"),
        F.sum(F.when(par == 0, _dec("l_extendedprice", PRICE))).alias("store_sales"),
    )
    cume_w = (
        Window.partitionBy("bucket")
        .orderBy("wk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.select(
            "bucket", "wk", "web_sales", "store_sales",
            F.sum("web_sales").over(cume_w).alias("web_cume"),
            F.sum("store_sales").over(cume_w).alias("store_cume"),
        )
        .filter(
            F.col("web_sales").isNotNull()
            & F.col("store_sales").isNotNull()
            & (F.col("web_cume") > F.col("store_cume"))
        )
        .select(
            "bucket", "wk",
            F.col("web_cume").cast("double").alias("web_cumulative"),
            F.col("store_cume").cast("double").alias("store_cumulative"),
        )
        .orderBy("bucket", "wk")
    )


# --- q47 shape: avg-over + lag/lead monthly deviation screen ----------------


@query(
    "tpcds_q47_monthly_deviation",
    oracle=f"""
    WITH monthly AS (
        SELECT n_name, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
               SUM({_SQL_PRICE}) AS sales
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, year(o_orderdate), month(o_orderdate)
    ),
    v AS (
        SELECT n_name, yr, mo,
               CAST(sales AS DOUBLE) AS sales,
               CAST(SUM(sales) OVER (PARTITION BY n_name, yr) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY n_name, yr) AS avg_monthly,
               CAST(LAG(sales) OVER (PARTITION BY n_name ORDER BY yr, mo)
                    AS DOUBLE) AS prev_sales,
               CAST(LEAD(sales) OVER (PARTITION BY n_name ORDER BY yr, mo)
                    AS DOUBLE) AS next_sales
        FROM monthly
    )
    SELECT n_name, yr, mo, sales, avg_monthly, prev_sales, next_sales
    FROM v
    WHERE yr = 1997 AND avg_monthly > 0
      AND abs(sales - avg_monthly) / avg_monthly > 0.1
    ORDER BY n_name, yr, mo
    """,
    doc="TPC-DS q47 shape (q47.sql): monthly sales per nation with the "
    "yearly average as a partition window, lag/lead month neighbors over "
    "an ordered window spanning years, and a >10% deviation screen — "
    "three window frames over one grouped aggregate.",
    tags=("tpcds", "window"),
)
def tpcds_q47_monthly_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    monthly = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name",
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(F.sum(_dec("l_extendedprice", PRICE)).alias("sales_dec"))
    )
    wp = Window.partitionBy("n_name", "yr")
    wo = Window.partitionBy("n_name").orderBy("yr", "mo")
    v = monthly.select(
        "n_name", "yr", "mo",
        F.col("sales_dec").cast("double").alias("sales"),
        (
            F.sum("sales_dec").over(wp).cast("double") / F.count("*").over(wp)
        ).alias("avg_monthly"),
        F.lag("sales_dec").over(wo).cast("double").alias("prev_sales"),
        F.lead("sales_dec").over(wo).cast("double").alias("next_sales"),
    )
    return (
        v.filter(
            (F.col("yr") == 1997)
            & (F.col("avg_monthly") > 0)
            & (
                F.abs(F.col("sales") - F.col("avg_monthly"))
                / F.col("avg_monthly")
                > 0.1
            )
        )
        .orderBy("n_name", "yr", "mo")
    )


# --- q98 shape: share-of-class window over a grouped aggregate --------------


@query(
    "tpcds_q98_class_revenue_share",
    oracle=f"""
    WITH rev AS (
        SELECT p_type, p_brand, SUM({SQL_DISC_PRICE}) AS revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'
        GROUP BY p_type, p_brand
    )
    SELECT p_type, p_brand,
           CAST(revenue AS DOUBLE) AS revenue,
           CAST(revenue AS DOUBLE) * 100
               / CAST(SUM(revenue) OVER (PARTITION BY p_type) AS DOUBLE)
               AS revenue_share
    FROM rev
    ORDER BY p_type, revenue_share DESC, p_brand
    """,
    doc="TPC-DS q98 shape (q98.sql): revenue per (class, item) for one "
    "month, with each item's share of its class total via SUM() OVER "
    "(PARTITION BY class) over the grouped aggregate — the windowed "
    "market-share pattern.",
    tags=("tpcds", "window"),
)
def tpcds_q98_class_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_brand")
        .agg(F.sum(disc_price()).alias("revenue_dec"))
    )
    w = Window.partitionBy("p_type")
    return (
        rev.select(
            "p_type", "p_brand",
            F.col("revenue_dec").cast("double").alias("revenue"),
            (
                F.col("revenue_dec").cast("double")
                * 100
                / F.sum("revenue_dec").over(w).cast("double")
            ).alias("revenue_share"),
        )
        .orderBy("p_type", F.desc("revenue_share"), "p_brand")
    )


# --- q95 shape: repeated-CTE semi-joins -------------------------------------


@query(
    "tpcds_q95_multi_supplier_returns",
    oracle=f"""
    WITH multi_supp AS (
        SELECT DISTINCT l1.l_orderkey AS okey
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
    )
    SELECT COUNT(DISTINCT o_orderkey) AS order_count,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND o_orderkey IN (SELECT okey FROM multi_supp)
      AND o_orderkey IN (
          SELECT okey FROM multi_supp
          JOIN lineitem ON okey = l_orderkey
          WHERE l_returnflag = 'R')
    """,
    doc="TPC-DS q95 shape (q95.sql): a fact self-join CTE (orders shipped "
    "by more than one supplier — the ws_wh warehouse-pair analog) consumed "
    "by TWO IN-subqueries, the second joining the CTE back to the fact for "
    "the returns screen. The CTE is staged once; both IN screens become "
    "left-semi joins against the staged artifact.",
    tags=("tpcds", "join", "subquery"),
)
def tpcds_q95_multi_supplier_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")

    def build() -> DataFrame:
        l1 = li.alias("l1")
        l2 = li.alias("l2")
        return (
            l1.join(
                l2,
                (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
                & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            )
            .select(F.col("l1.l_orderkey").alias("okey"))
            .distinct()
        )

    multi_supp = staged(spark, sf_dir, "tpcds_multi_supp", build)
    returned = (
        multi_supp.join(
            li.filter(F.col("l_returnflag") == "R"),
            multi_supp.okey == li.l_orderkey,
            "left_semi",
        )
    )
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    screened = orders.join(
        multi_supp, orders.o_orderkey == multi_supp.okey, "left_semi"
    ).join(returned, orders.o_orderkey == returned.okey, "left_semi")
    return screened.agg(
        F.countDistinct("o_orderkey").alias("order_count"),
        F.sum(_dec("o_totalprice", "decimal(14,2)"))
        .cast("double")
        .alias("total_price"),
    )


# --- q21 shape: before/after pivot with ratio screen ------------------------


@query(
    "tpcds_q21_before_after_ratio",
    oracle=f"""
    SELECT n_name, p_brand,
           CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
                         THEN {_SQL_QTY} ELSE CAST(0 AS DECIMAL(12,2)) END)
                AS DOUBLE) AS qty_before,
           CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-07-01 00:00:00'
                         THEN {_SQL_QTY} ELSE CAST(0 AS DECIMAL(12,2)) END)
                AS DOUBLE) AS qty_after
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-05-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-09-01 00:00:00'
    GROUP BY n_name, p_brand
    HAVING SUM(CASE WHEN l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
                    THEN {_SQL_QTY} ELSE CAST(0 AS DECIMAL(12,2)) END) > 0
       AND SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-07-01 00:00:00'
                    THEN {_SQL_QTY} ELSE CAST(0 AS DECIMAL(12,2)) END) > 0
       AND CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-07-01 00:00:00'
                         THEN {_SQL_QTY} ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         / CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
                         THEN {_SQL_QTY} ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         BETWEEN 2.0/3.0 AND 3.0/2.0
    ORDER BY n_name, p_brand
    LIMIT 100
    """,
    doc="TPC-DS q21 shape (q21.sql): quantity shipped in the 60 days "
    "before vs after a pivot date, CASE-pivoted into two columns per "
    "(warehouse-nation, item-brand) group, kept only when the after/before "
    "ratio stays within [2/3, 3/2] — conditional aggregation + HAVING on a "
    "ratio of the pivoted sums.",
    tags=("tpcds", "aggregation"),
)
def tpcds_q21_before_after_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    pivot = F.lit("1997-07-01").cast("timestamp")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-05-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-09-01").cast("timestamp"))
    )
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    part = t(spark, sf_dir, "part")
    zero = F.lit(0).cast(QTY)
    before = F.sum(
        F.when(F.col("l_shipdate") < pivot, _dec("l_quantity", QTY)).otherwise(zero)
    )
    after = F.sum(
        F.when(F.col("l_shipdate") >= pivot, _dec("l_quantity", QTY)).otherwise(zero)
    )
    grouped = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("n_name", "p_brand")
        .agg(before.alias("before_dec"), after.alias("after_dec"))
    )
    ratio = F.col("after_dec").cast("double") / F.col("before_dec").cast("double")
    return (
        grouped.filter(
            (F.col("before_dec") > 0)
            & (F.col("after_dec") > 0)
            & (ratio >= 2.0 / 3.0)
            & (ratio <= 3.0 / 2.0)
        )
        .select(
            "n_name", "p_brand",
            F.col("before_dec").cast("double").alias("qty_before"),
            F.col("after_dec").cast("double").alias("qty_after"),
        )
        .orderBy("n_name", "p_brand")
        .limit(100)
    )


# --- q34 shape: count-range cohort joined back to the dimension -------------


@query(
    "tpcds_q34_bulk_order_cohort",
    oracle="""
    WITH cohort AS (
        SELECT o_orderkey, o_custkey, COUNT(*) AS item_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderkey, o_custkey
        HAVING COUNT(*) BETWEEN 10 AND 13
    )
    SELECT c_name, o_orderkey, item_count
    FROM cohort JOIN customer ON o_custkey = c_custkey
    ORDER BY c_name, o_orderkey
    LIMIT 200
    """,
    doc="TPC-DS q34/q73 shape (q34.sql): a HAVING COUNT BETWEEN cohort "
    "(bulk orders of 10-13 line items) joined back to the customer "
    "dimension for the detail rows — aggregate-filter-then-rejoin.",
    tags=("tpcds", "aggregation", "join"),
)
def tpcds_q34_bulk_order_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    cohort = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count("*").alias("item_count"))
        .filter(F.col("item_count").between(10, 13))
    )
    return (
        cohort.join(cust, cohort.o_custkey == cust.c_custkey)
        .select("c_name", "o_orderkey", "item_count")
        .orderBy("c_name", "o_orderkey")
        .limit(200)
    )


# --- q88 shape: multi-bucket scalar counts ----------------------------------


@query(
    "tpcds_q88_quantity_buckets",
    oracle="""
    SELECT * FROM
        (SELECT COUNT(*) AS b1 FROM lineitem WHERE l_quantity BETWEEN 1 AND 5) h1,
        (SELECT COUNT(*) AS b2 FROM lineitem WHERE l_quantity BETWEEN 6 AND 10) h2,
        (SELECT COUNT(*) AS b3 FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) h3,
        (SELECT COUNT(*) AS b4 FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) h4,
        (SELECT COUNT(*) AS b5 FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) h5,
        (SELECT COUNT(*) AS b6 FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) h6
    """,
    doc="TPC-DS q88 shape (q88.sql): the reference cross-joins N scalar "
    "COUNT subqueries over the same fact with disjoint bucket predicates "
    "into one wide row. The Spark-first re-expression is a single "
    "conditional-aggregation scan — one fact pass instead of six — "
    "producing the identical wide row; the oracle keeps the reference's "
    "literal cross-join form, so the rewrite is verified equivalent.",
    tags=("tpcds", "aggregation"),
)
def tpcds_q88_quantity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")

    def bucket(lo: int, hi: int) -> F.Column:
        return F.count(
            F.when(F.col("l_quantity").between(lo, hi), F.lit(1))
        )

    return li.agg(
        bucket(1, 5).alias("b1"),
        bucket(6, 10).alias("b2"),
        bucket(11, 20).alias("b3"),
        bucket(21, 30).alias("b4"),
        bucket(31, 40).alias("b5"),
        bucket(41, 50).alias("b6"),
    )


# --- q14 shape: cross-channel INTERSECT + semi-join restriction -------------


@query(
    "tpcds_q14_cross_channel_items",
    oracle=f"""
    WITH ch1 AS (
        SELECT DISTINCT l_partkey FROM lineitem WHERE l_linenumber % 2 = 0
    ),
    ch2 AS (
        SELECT DISTINCT l_partkey FROM lineitem WHERE l_linenumber % 2 = 1
    ),
    both_items AS (
        SELECT l_partkey FROM ch1 INTERSECT SELECT l_partkey FROM ch2
    )
    SELECT p_brand,
           CAST(SUM({_SQL_PRICE}) AS DOUBLE) AS sales,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_partkey IN (SELECT l_partkey FROM both_items)
    GROUP BY p_brand
    ORDER BY p_brand
    LIMIT 50
    """,
    doc="TPC-DS q14 shape (sql/presto/tpcds/q14.sql cross_items CTE): the "
    "set of items sold in EVERY channel via INTERSECT of per-channel "
    "DISTINCT projections, then the fact table restricted to that set "
    "with a semi-join before a brand rollup — IntersectNode feeding "
    "SemiJoinNode feeding AggregationNode, the combination the TPC-H "
    "corpus never produces. Channels are the l_linenumber parity split "
    "(module docstring).",
    tags=("tpcds", "setop"),
)
def tpcds_q14_cross_channel_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    ch1 = li.filter(F.col("l_linenumber") % 2 == 0).select("l_partkey").distinct()
    ch2 = li.filter(F.col("l_linenumber") % 2 == 1).select("l_partkey").distinct()
    both_items = ch1.intersect(ch2)
    return (
        li.join(both_items, "l_partkey", "left_semi")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(_dec("l_extendedprice", PRICE)).cast("double").alias("sales"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("p_brand")
        .limit(50)
    )


# --- q23 shape: frequent-items x best-customers double screen ---------------


@query(
    "tpcds_q23_frequent_best_customers",
    oracle=f"""
    WITH frequent_items AS (
        SELECT l_partkey
        FROM lineitem
        GROUP BY l_partkey
        HAVING COUNT(*) > 30
    ),
    spend AS (
        SELECT o_custkey, SUM({_SQL_PRICE}) AS total_spend
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey
    ),
    best_customers AS (
        SELECT o_custkey
        FROM spend
        WHERE CAST(total_spend AS DOUBLE)
              > 0.5 * (SELECT CAST(MAX(total_spend) AS DOUBLE) FROM spend)
    )
    SELECT CAST(SUM({_SQL_PRICE}) AS DOUBLE) AS restricted_sales,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_partkey IN (SELECT l_partkey FROM frequent_items)
      AND o_custkey IN (SELECT o_custkey FROM best_customers)
    """,
    doc="TPC-DS q23 shape (sql/presto/tpcds/q23.sql): two independent "
    "subquery screens — frequent items (grouped HAVING over the fact) and "
    "best customers (spend above a scalar-subquery threshold on the max) "
    "— both applied as semi-joins to the fact before a global aggregate. "
    "Spark computes the scalar max without collect (1-row aggregate "
    "cross-joined in, AQE broadcasts it); the oracle keeps the literal "
    "scalar-subquery form.",
    tags=("tpcds", "subquery"),
)
def tpcds_q23_frequent_best_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    fact = li.join(orders, li.l_orderkey == orders.o_orderkey)
    frequent = (
        li.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 30)
        .select("l_partkey")
    )
    spend = fact.groupBy("o_custkey").agg(
        F.sum(_dec("l_extendedprice", PRICE)).alias("total_spend")
    )
    max_spend = spend.agg(
        F.max("total_spend").cast("double").alias("max_spend")
    )
    best = (
        spend.crossJoin(F.broadcast(max_spend))
        .filter(F.col("total_spend").cast("double") > 0.5 * F.col("max_spend"))
        .select("o_custkey")
    )
    return (
        fact.join(frequent, "l_partkey", "left_semi")
        .join(best, "o_custkey", "left_semi")
        .agg(
            F.sum(_dec("l_extendedprice", PRICE)).cast("double").alias("restricted_sales"),
            F.count("*").alias("n_lines"),
        )
    )


# --- q39 shape: coefficient-of-variation screen + period self-join ----------


@query(
    "tpcds_q39_cv_self_join",
    oracle=f"""
    WITH inv AS (
        SELECT l_partkey,
               ({_SQL_DAYS}) // 30 AS period,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
               CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS ssq
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_partkey, ({_SQL_DAYS}) // 30
        HAVING COUNT(*) >= 3
    ),
    screened AS (
        SELECT * FROM inv
        WHERE 100 * n * (n * ssq - s * s) > 16 * (n - 1) * s * s
    )
    SELECT a.l_partkey AS l_partkey, a.period AS period,
           round(CAST(a.n * (a.n * a.ssq - a.s * a.s) AS DOUBLE)
                 / ((a.n - 1) * a.s * a.s), 6) AS cv2_a,
           round(CAST(b.n * (b.n * b.ssq - b.s * b.s) AS DOUBLE)
                 / ((b.n - 1) * b.s * b.s), 6) AS cv2_b
    FROM screened a
    JOIN screened b
      ON a.l_partkey = b.l_partkey AND b.period = a.period + 1
    ORDER BY l_partkey, period
    """,
    doc="TPC-DS q39 shape (sql/presto/tpcds/q39.sql): per-item-per-period "
    "demand variability (coefficient of variation) screened then "
    "SELF-JOINED across consecutive periods to find persistently volatile "
    "items. The CV screen is rewritten into an exact integer inequality — "
    "100*n*(n*ssq - s^2) > 16*(n-1)*s^2 is cv^2 > 0.16 with integer "
    "quantities — so the screen can never flip on float accumulation "
    "order (the stddev form is engine-order-dependent; the committed "
    "scale-trap list calls this out). The reported cv^2 doubles divide "
    "the same exact integers on both engines.",
    tags=("tpcds", "stats"),
)
def tpcds_q39_cv_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    q = F.col("l_quantity").cast("long")
    inv = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "l_partkey",
            (_days() / F.lit(30)).cast("long").alias("period"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(q).alias("s"),
            F.sum(q * q).alias("ssq"),
        )
        .filter(F.col("n") >= 3)
    )
    n, s, ssq = F.col("n"), F.col("s"), F.col("ssq")
    screened = inv.filter(
        100 * n * (n * ssq - s * s) > 16 * (n - 1) * s * s
    )
    cv2 = F.round(
        (n * (n * ssq - s * s)).cast("double") / ((n - 1) * s * s), 6
    )
    a = screened.select(
        "l_partkey", "period", cv2.alias("cv2_a")
    )
    b = screened.select(
        F.col("l_partkey").alias("bp"), F.col("period").alias("period_b"),
        cv2.alias("cv2_b"),
    )
    return (
        a.join(
            b,
            (a.l_partkey == b.bp) & (b.period_b == a.period + 1),
        )
        .select("l_partkey", "period", "cv2_a", "cv2_b")
        .orderBy("l_partkey", "period")
    )


# --- q93 shape: returns-adjusted sales via LEFT JOIN + COALESCE -------------


@query(
    "tpcds_q93_returns_adjusted_sales",
    oracle=f"""
    WITH ret AS (
        SELECT l_orderkey AS r_orderkey, l_partkey AS r_partkey,
               SUM(CAST(l_quantity AS BIGINT)) AS ret_qty
        FROM lineitem
        WHERE l_linenumber % 2 = 1 AND l_returnflag = 'R'
        GROUP BY l_orderkey, l_partkey
    )
    SELECT o_custkey,
           CAST(SUM(
               greatest(CAST(0 AS BIGINT),
                        CAST(l_quantity AS BIGINT) - COALESCE(ret_qty, 0))
               * {_SQL_PRICE}
           ) AS DOUBLE) AS adjusted_sales,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    LEFT JOIN ret ON l_orderkey = r_orderkey AND l_partkey = r_partkey
    WHERE l_linenumber % 2 = 0
    GROUP BY o_custkey
    HAVING SUM(CAST(l_quantity AS BIGINT)) > 180
    ORDER BY o_custkey
    LIMIT 100
    """,
    doc="TPC-DS q93 shape (sql/presto/tpcds/q93.sql): sales adjusted by a "
    "returns side-table — LEFT JOIN the fact to pre-aggregated returns "
    "(the parity-1 'R' rows keyed by order+part), COALESCE the missing "
    "side to zero, clamp the adjusted quantity at zero, and revalue the "
    "line (integer-times-decimal stays exact, so the sum is order-"
    "independent) — the null-producing outer-join arithmetic TPC-H's "
    "inner-join corpus never exercises. Returns are pre-aggregated before "
    "the join so the fact row count is preserved (no fan-out).",
    tags=("tpcds", "join"),
)
def tpcds_q93_returns_adjusted_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    ret = (
        li.filter((F.col("l_linenumber") % 2 == 1) & (F.col("l_returnflag") == "R"))
        .groupBy(
            F.col("l_orderkey").alias("r_orderkey"),
            F.col("l_partkey").alias("r_partkey"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("ret_qty"))
    )
    sales = li.filter(F.col("l_linenumber") % 2 == 0)
    qty = F.col("l_quantity").cast("long")
    adj = F.greatest(F.lit(0).cast("long"), qty - F.coalesce(F.col("ret_qty"), F.lit(0)))
    return (
        sales.join(orders, sales.l_orderkey == orders.o_orderkey)
        .join(
            ret,
            (sales.l_orderkey == ret.r_orderkey)
            & (sales.l_partkey == ret.r_partkey),
            "left",
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(adj * _dec("l_extendedprice", PRICE))
            .cast("double")
            .alias("adjusted_sales"),
            F.count("*").alias("n_lines"),
            F.sum(qty).alias("tot_qty"),
        )
        .filter(F.col("tot_qty") > 180)
        .select("o_custkey", "adjusted_sales", "n_lines")
        .orderBy("o_custkey")
        .limit(100)
    )


# --- q67 shape: windowed top-N over ROLLUP output ----------------------------


@query(
    "tpcds_q67_rollup_topn",
    oracle=f"""
    WITH dw1 AS (
        SELECT n_name, c_mktsegment, month(o_orderdate) AS mo,
               SUM({_SQL_PRICE}) AS sumsales
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE year(o_orderdate) = 1995
        GROUP BY ROLLUP (n_name, c_mktsegment, month(o_orderdate))
    )
    SELECT n_name, c_mktsegment, mo,
           CAST(sumsales AS DOUBLE) AS sumsales, rk
    FROM (
        SELECT *,
               RANK() OVER (PARTITION BY n_name ORDER BY sumsales DESC) AS rk
        FROM dw1
    ) dw2
    WHERE rk <= 3
    ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST, mo NULLS FIRST,
             sumsales, rk
    LIMIT 100
    """,
    doc="TPC-DS q67 shape (sql/presto/tpcds/q67.sql): a full-hierarchy "
    "ROLLUP aggregate fed into a rank() window PARTITIONED BY the rollup's "
    "top level — so each partition mixes detail rows, subtotals, and (for "
    "the NULL partition) the grand total, and the top-N screen keeps "
    "whichever level dominates. WindowNode over GroupIdNode output, a "
    "combination no other corpus row produces.",
    tags=("tpcds", "window", "aggregation"),
)
def tpcds_q67_rollup_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    # Pre-aggregate per leaf key before the rollup (the q36 Expand lesson:
    # Catalyst does not push partial aggregation through Expand, so rolling
    # up the raw fact replicates every row once per grouping set). The leaf
    # keys are never NULL, so GROUPING() semantics are unchanged.
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_mktsegment", F.month("o_orderdate").alias("mo"))
        .agg(F.sum(_dec("l_extendedprice", PRICE)).alias("s_leaf"))
    )
    dw1 = (
        base.rollup("n_name", "c_mktsegment", "mo")
        .agg(F.sum("s_leaf").alias("sumsales_dec"))
    )
    w = Window.partitionBy("n_name").orderBy(F.col("sumsales_dec").desc())
    return (
        dw1.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "n_name", "c_mktsegment", "mo",
            F.col("sumsales_dec").cast("double").alias("sumsales"), "rk",
        )
        .orderBy(
            F.col("n_name").asc_nulls_first(),
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("mo").asc_nulls_first(),
            "sumsales", "rk",
        )
        .limit(100)
    )


# --- q27 shape: multi-measure ROLLUP with GROUPING() over filtered dims -----


@query(
    "tpcds_q27_rollup_multi_avg",
    oracle=f"""
    SELECT p_type, n_name,
           CAST(GROUPING(n_name) AS INT) AS g_state,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           round(CAST(SUM({_SQL_QTY}) AS DOUBLE) / COUNT(*), 6) AS agg1,
           round(CAST(SUM({_SQL_PRICE}) AS DOUBLE) / COUNT(*), 6) AS agg2,
           round(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
                 / COUNT(*), 6) AS agg3,
           round(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
                 / COUNT(*), 6) AS agg4
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE c_mktsegment = 'BUILDING'
      AND year(o_orderdate) = 1995
      AND n_name IN ('NATION_2', 'NATION_7', 'NATION_11', 'NATION_19')
    GROUP BY ROLLUP (p_type, n_name)
    ORDER BY p_type NULLS FIRST, n_name NULLS FIRST
    LIMIT 100
    """,
    doc="TPC-DS q27 shape (sql/presto/tpcds/q27.sql): four AVG measures "
    "over a five-table join with equality filters on three dimensions "
    "(demographic segment, year, state/nation set), aggregated by "
    "ROLLUP(item, state) with GROUPING(state) exposed — the "
    "grouping-flag-projection combination (GroupIdNode's group-id "
    "channel) over a selective multi-dim join. Averages are expressed as "
    "exact DECIMAL sums divided once in DOUBLE, so both engines divide "
    "identical operands (module numeric convention).",
    tags=("tpcds", "aggregation"),
)
def tpcds_q27_rollup_multi_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    nation = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_2", "NATION_7", "NATION_11", "NATION_19")
    )
    part = t(spark, sf_dir, "part")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(part, li.l_partkey == part.p_partkey)
    )
    # Pre-aggregate per leaf (the q36 Expand lesson); rollup re-sums the
    # exact decimal leaf sums and counts, so the averages are identical.
    base = joined.groupBy("p_type", "n_name").agg(
        F.count("*").alias("n_leaf"),
        F.sum(_dec("l_quantity", QTY)).alias("s_qty"),
        F.sum(_dec("l_extendedprice", PRICE)).alias("s_price"),
        F.sum(_dec("l_discount", FRAC)).alias("s_disc"),
        F.sum(_dec("o_totalprice", "decimal(14,2)")).alias("s_total"),
    )
    n = F.sum("n_leaf")
    return (
        base.rollup("p_type", "n_name")
        .agg(
            F.grouping("n_name").cast("int").alias("g_state"),
            n.alias("n_rows"),
            F.round(F.sum("s_qty").cast("double") / n, 6).alias("agg1"),
            F.round(F.sum("s_price").cast("double") / n, 6).alias("agg2"),
            F.round(F.sum("s_disc").cast("double") / n, 6).alias("agg3"),
            F.round(F.sum("s_total").cast("double") / n, 6).alias("agg4"),
        )
        .orderBy(F.col("p_type").asc_nulls_first(), F.col("n_name").asc_nulls_first())
        .limit(100)
    )


# --- q78 shape: per-channel no-returns rollups LEFT JOIN chained ------------

_Q78_RET = """
    SELECT DISTINCT l_orderkey AS r_orderkey, l_partkey AS r_partkey
    FROM lineitem WHERE l_returnflag = 'R'
"""


def _q78_channel_sql(mod: int) -> str:
    # Grouped by (year, customer) rather than the reference's (year, item,
    # customer): the synthetic fixture has no repeat-purchase structure, so
    # the item-level key would leave the triple-channel screen vacuously
    # empty at every SF. The operator chain is unchanged.
    return f"""
        SELECT year(o_orderdate) AS yr, o_custkey AS ck,
               SUM({_SQL_QTY}) AS qty, SUM({_SQL_PRICE}) AS sp
        FROM lineitem
        LEFT JOIN ret ON l_orderkey = r_orderkey AND l_partkey = r_partkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE r_orderkey IS NULL AND l_linenumber % 3 = {mod}
        GROUP BY year(o_orderdate), o_custkey
    """


@query(
    "tpcds_q78_channel_ratio_chain",
    oracle=f"""
    WITH ret AS ({_Q78_RET}),
    ss AS ({_q78_channel_sql(0)}),
    ws AS ({_q78_channel_sql(1)}),
    cs AS ({_q78_channel_sql(2)})
    SELECT ss.yr, ss.ck,
           round(CAST(ss.qty AS DOUBLE)
                 / CAST(COALESCE(ws.qty + cs.qty, 1) AS DOUBLE), 2) AS ratio,
           CAST(ss.qty AS DOUBLE) AS store_qty,
           CAST(COALESCE(ws.qty, 0) + COALESCE(cs.qty, 0) AS DOUBLE)
               AS other_chan_qty,
           CAST(COALESCE(ws.sp, 0) + COALESCE(cs.sp, 0) AS DOUBLE)
               AS other_chan_sales_price
    FROM ss
    LEFT JOIN ws ON ws.yr = ss.yr AND ws.ck = ss.ck
    LEFT JOIN cs ON cs.yr = ss.yr AND cs.ck = ss.ck
    WHERE COALESCE(ws.qty, 0) > 0 AND COALESCE(cs.qty, 0) > 0
      AND ss.yr = 1995
    ORDER BY ss.ck
    LIMIT 100
    """,
    doc="TPC-DS q78 shape (sql/presto/tpcds/q78.sql): three per-channel "
    "CTEs each excluding returned rows via LEFT JOIN + IS NULL (the "
    "outer-join anti idiom, not the ANTI keyword), rolled up to (year, "
    "item, customer), then chained with two LEFT JOINs and screened to "
    "customers active in ALL channels — outer joins whose null-extension "
    "is immediately constrained by COALESCE screens. Channels are the "
    "l_linenumber mod-3 split; returns are flag-'R' order/part pairs. "
    "Keyed by (year, customer) — the fixture has no repeat-purchase "
    "structure, so the reference's item-level key would be vacuous.",
    tags=("tpcds", "outerjoin"),
)
def tpcds_q78_channel_ratio_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    ret = (
        li.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("r_orderkey"),
            F.col("l_partkey").alias("r_partkey"),
        )
        .distinct()
    )

    # OPTIMIZATION r15 (guide §2.3-2.4): the three channels partition
    # lineitem DISJOINTLY on l_linenumber % 3, so the oracle's
    # three-CTE-plus-two-LEFT-JOIN chain collapses to ONE pass with
    # conditional aggregation — 6 lineitem scans + 3 orders joins + 2
    # sort-merge chain joins (measured 2.16 s) become 1 scan, 1 ret
    # anti-join, 1 orders join, 1 aggregation. Equivalence: a (yr, ck)
    # group's per-channel sums are exactly the per-CTE sums (identical
    # DECIMAL operands); a missing channel yields a NULL conditional sum,
    # which is exactly the LEFT JOIN's null extension; the ss LEFT-side
    # existence requirement is ss_qty IS NOT NULL (l_quantity is
    # non-null, so the sum is NULL iff no mod-0 row). The ss.yr = 1995
    # screen propagates to every channel through the yr equi-join keys,
    # so it is applied BEFORE aggregation, pruning the orders scan.
    # DuckDB materializes CTEs, so the oracle keeps the reference's
    # three-channel spelling unchanged.
    mod3 = F.col("l_linenumber") % 3

    def chan(mod: int, expr, alias: str):
        return F.sum(F.when(mod3 == mod, expr)).alias(alias)

    joined = (
        li.join(
            ret,
            (li.l_orderkey == ret.r_orderkey) & (li.l_partkey == ret.r_partkey),
            "left",
        )
        .filter(F.col("r_orderkey").isNull())
        .join(orders.filter(F.year("o_orderdate") == 1995), li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.year("o_orderdate").alias("ss_yr"),
            F.col("o_custkey").alias("ss_ck"),
        )
        .agg(
            chan(0, _dec("l_quantity", QTY), "ss_qty"),
            chan(0, _dec("l_extendedprice", PRICE), "ss_sp"),
            chan(1, _dec("l_quantity", QTY), "ws_qty"),
            chan(1, _dec("l_extendedprice", PRICE), "ws_sp"),
            chan(2, _dec("l_quantity", QTY), "cs_qty"),
            chan(2, _dec("l_extendedprice", PRICE), "cs_sp"),
        )
        .filter(
            F.col("ss_qty").isNotNull()
            & (F.coalesce(F.col("ws_qty"), F.lit(0)) > 0)
            & (F.coalesce(F.col("cs_qty"), F.lit(0)) > 0)
        )
    )
    zero = F.lit(0).cast(QTY)
    zerop = F.lit(0).cast(PRICE)
    return (
        joined.select(
            F.col("ss_yr").alias("yr"),
            F.col("ss_ck").alias("ck"),
            F.round(
                F.col("ss_qty").cast("double")
                / F.coalesce(F.col("ws_qty") + F.col("cs_qty"), F.lit(1)).cast("double"),
                2,
            ).alias("ratio"),
            F.col("ss_qty").cast("double").alias("store_qty"),
            (F.coalesce(F.col("ws_qty"), zero) + F.coalesce(F.col("cs_qty"), zero))
            .cast("double")
            .alias("other_chan_qty"),
            (F.coalesce(F.col("ws_sp"), zerop) + F.coalesce(F.col("cs_sp"), zerop))
            .cast("double")
            .alias("other_chan_sales_price"),
        )
        .orderBy("ck")
        .limit(100)
    )


# --- q17 shape: buy/return/re-buy chain with stats aggregates ---------------


@query(
    "tpcds_q17_repurchase_stats",
    oracle=f"""
    WITH bought AS (
        SELECT o_custkey AS ck, p_brand AS bk, {_SQL_QTY} AS qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'N'
          AND year(o_orderdate) = 1995 AND quarter(o_orderdate) = 1
    ),
    returned AS (
        SELECT o_custkey AS ck, p_brand AS bk, {_SQL_QTY} AS qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'R'
          AND year(o_orderdate) = 1995 AND quarter(o_orderdate) <= 3
    ),
    rebought AS (
        SELECT o_custkey AS ck, p_brand AS bk, {_SQL_QTY} AS qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'A'
          AND year(o_orderdate) = 1995 AND quarter(o_orderdate) <= 3
    )
    SELECT b.bk AS p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_chains,
           round(CAST(SUM(b.qty) AS DOUBLE) / COUNT(*), 6) AS buy_avg,
           round(COALESCE(stddev_samp(CAST(b.qty AS DOUBLE)), 0), 4) AS buy_sd,
           round(CAST(SUM(r.qty) AS DOUBLE) / COUNT(*), 6) AS ret_avg,
           round(COALESCE(stddev_samp(CAST(r.qty AS DOUBLE)), 0), 4) AS ret_sd,
           round(CAST(SUM(rb.qty) AS DOUBLE) / COUNT(*), 6) AS rebuy_avg
    FROM bought b
    JOIN returned r ON b.ck = r.ck AND b.bk = r.bk
    JOIN rebought rb ON b.ck = rb.ck AND b.bk = rb.bk
    GROUP BY b.bk
    ORDER BY b.bk
    LIMIT 100
    """,
    doc="TPC-DS q17 shape (sql/presto/tpcds/q17.sql): the "
    "buy/return/re-buy behavioral chain — three filtered fact slices "
    "(store sale in Q1, return in Q1-Q3, catalog re-purchase in Q1-Q3, "
    "played by l_returnflag N/R/A) joined on (customer, brand) — the "
    "fixture has no repeat (customer, item) purchases, so the "
    "reference's item-level chain would be vacuous at every SF — with "
    "count/avg/stddev_samp quantity statistics per brand. A three-way "
    "fact self-join feeding statistical aggregates; averages use the "
    "exact-decimal-sum convention, stddev is rounded (parallel float "
    "summation, module convention).",
    tags=("tpcds", "join", "aggregation"),
)
def tpcds_q17_repurchase_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part")

    def slice_(flag: str, max_quarter: int, pre: str) -> DataFrame:
        return (
            li.filter(F.col("l_returnflag") == flag)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .filter(
                (F.year("o_orderdate") == 1995)
                & (F.quarter("o_orderdate") <= max_quarter)
            )
            .join(part, li.l_partkey == part.p_partkey)
            .select(
                F.col("o_custkey").alias(f"{pre}_ck"),
                F.col("p_brand").alias(f"{pre}_bk"),
                _dec("l_quantity", QTY).alias(f"{pre}_qty"),
            )
        )

    b = slice_("N", 1, "b")
    r = slice_("R", 3, "r")
    rb = slice_("A", 3, "rb")
    n = F.count("*")
    return (
        b.join(r, (b.b_ck == r.r_ck) & (b.b_bk == r.r_bk))
        .join(rb, (b.b_ck == rb.rb_ck) & (b.b_bk == rb.rb_bk))
        .groupBy(F.col("b_bk").alias("p_brand"))
        .agg(
            n.alias("n_chains"),
            F.round(F.sum("b_qty").cast("double") / n, 6).alias("buy_avg"),
            F.round(
                F.coalesce(F.stddev_samp(F.col("b_qty").cast("double")), F.lit(0.0)), 4
            ).alias("buy_sd"),
            F.round(F.sum("r_qty").cast("double") / n, 6).alias("ret_avg"),
            F.round(
                F.coalesce(F.stddev_samp(F.col("r_qty").cast("double")), F.lit(0.0)), 4
            ).alias("ret_sd"),
            F.round(F.sum("rb_qty").cast("double") / n, 6).alias("rebuy_avg"),
        )
        .orderBy("p_brand")
        .limit(100)
    )


# --- q31 shape: quarter-over-quarter growth, two channels, self-joins -------

_Q31_QSUM = f"""
    SELECT n_name, quarter(o_orderdate) AS qtr, l_linenumber % 2 AS chan,
           SUM({_SQL_PRICE}) AS sales
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE year(o_orderdate) = 1995 AND quarter(o_orderdate) <= 2
    GROUP BY n_name, quarter(o_orderdate), l_linenumber % 2
"""


@query(
    "tpcds_q31_qoq_channel_growth",
    oracle=f"""
    WITH qs AS ({_Q31_QSUM})
    SELECT ss1.n_name,
           CAST(ss2.sales AS DOUBLE) / CAST(ss1.sales AS DOUBLE) AS store_growth,
           CAST(ws2.sales AS DOUBLE) / CAST(ws1.sales AS DOUBLE) AS web_growth
    FROM qs ss1
    JOIN qs ss2 ON ss1.n_name = ss2.n_name AND ss2.qtr = 2 AND ss2.chan = 0
    JOIN qs ws1 ON ss1.n_name = ws1.n_name AND ws1.qtr = 1 AND ws1.chan = 1
    JOIN qs ws2 ON ss1.n_name = ws2.n_name AND ws2.qtr = 2 AND ws2.chan = 1
    WHERE ss1.qtr = 1 AND ss1.chan = 0
      AND CAST(ss1.sales AS DOUBLE) > 0 AND CAST(ws1.sales AS DOUBLE) > 0
      AND CAST(ws2.sales AS DOUBLE) / CAST(ws1.sales AS DOUBLE)
          > CAST(ss2.sales AS DOUBLE) / CAST(ss1.sales AS DOUBLE)
    ORDER BY ss1.n_name
    """,
    doc="TPC-DS q31 shape (sql/presto/tpcds/q31.sql): one quarterly "
    "per-channel aggregate CTE consumed FOUR times (store/web x Q1/Q2) "
    "through a same-source equi-join chain on the nation key, screening "
    "nations whose web growth outpaced store growth — the repeated-CTE "
    "multi-self-join shape with a cross-derived-column comparison "
    "predicate. Ratios divide exact decimal sums in DOUBLE (identical "
    "operands both engines).",
    tags=("tpcds", "join", "cte"),
)
def tpcds_q31_qoq_channel_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    qs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .filter((F.year("o_orderdate") == 1995) & (F.quarter("o_orderdate") <= 2))
        .groupBy(
            "n_name",
            F.quarter("o_orderdate").alias("qtr"),
            (F.col("l_linenumber") % 2).alias("chan"),
        )
        .agg(F.sum(_dec("l_extendedprice", PRICE)).alias("sales"))
    )

    def leg(qtr: int, chan: int, pre: str) -> DataFrame:
        return qs.filter((F.col("qtr") == qtr) & (F.col("chan") == chan)).select(
            F.col("n_name").alias(f"{pre}_n"),
            F.col("sales").cast("double").alias(f"{pre}_sales"),
        )

    ss1, ss2 = leg(1, 0, "ss1"), leg(2, 0, "ss2")
    ws1, ws2 = leg(1, 1, "ws1"), leg(2, 1, "ws2")
    return (
        ss1.join(ss2, ss1.ss1_n == ss2.ss2_n)
        .join(ws1, ss1.ss1_n == ws1.ws1_n)
        .join(ws2, ss1.ss1_n == ws2.ws2_n)
        .filter((F.col("ss1_sales") > 0) & (F.col("ws1_sales") > 0))
        .withColumn("store_growth", F.col("ss2_sales") / F.col("ss1_sales"))
        .withColumn("web_growth", F.col("ws2_sales") / F.col("ws1_sales"))
        .filter(F.col("web_growth") > F.col("store_growth"))
        .select(F.col("ss1_n").alias("n_name"), "store_growth", "web_growth")
        .orderBy("n_name")
    )


# --- q65 shape: agg-of-agg screen (items under 10% of store average) --------


@query(
    "tpcds_q65_below_avg_revenue",
    oracle=f"""
    WITH sa AS (
        SELECT c_nationkey AS nk, l_partkey AS pk, SUM({_SQL_PRICE}) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey, l_partkey
    ),
    sb AS (
        SELECT nk, CAST(SUM(revenue) AS DOUBLE) / COUNT(*) AS ave
        FROM sa GROUP BY nk
    )
    SELECT n_name, p_name, CAST(sa.revenue AS DOUBLE) AS revenue,
           round(sb.ave, 6) AS store_avg
    FROM sa
    JOIN sb ON sa.nk = sb.nk
    JOIN part ON sa.pk = p_partkey
    JOIN nation ON sa.nk = n_nationkey
    WHERE CAST(sa.revenue AS DOUBLE) <= 0.1 * sb.ave
    ORDER BY n_name, p_name, sa.pk
    LIMIT 100
    """,
    doc="TPC-DS q65 shape (sql/presto/tpcds/q65.sql): per-(store, item) "
    "revenue joined against the per-store AVERAGE of those same revenues "
    "— an aggregate-of-aggregate (sb aggregates sa's output) re-joined to "
    "its own input with a non-equi screen (revenue <= 10% of average), "
    "then decorated from two dimensions. The Spark plan broadcasts the "
    "tiny second-level aggregate.",
    tags=("tpcds", "aggregation", "join"),
)
def tpcds_q65_below_avg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    part = t(spark, sf_dir, "part")
    nation = t(spark, sf_dir, "nation")
    sa = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"), F.col("l_partkey").alias("pk"))
        .agg(F.sum(_dec("l_extendedprice", PRICE)).alias("revenue_dec"))
    )
    sb = sa.groupBy("nk").agg(
        (F.sum("revenue_dec").cast("double") / F.count("*")).alias("ave")
    ).withColumnRenamed("nk", "sb_nk")
    return (
        sa.join(F.broadcast(sb), sa.nk == sb.sb_nk)
        .filter(F.col("revenue_dec").cast("double") <= 0.1 * F.col("ave"))
        .join(part, sa.pk == part.p_partkey)
        .join(F.broadcast(nation), sa.nk == nation.n_nationkey)
        .select(
            "n_name", "p_name",
            F.col("revenue_dec").cast("double").alias("revenue"),
            F.round("ave", 6).alias("store_avg"),
            F.col("pk"),
        )
        # pk tiebreaks the LIMIT: p_name repeats across parts, so
        # (n_name, p_name) alone is not a total order and row 98 of the
        # sf0.1 result differed per engine (r13 preflight). (nk, pk) is
        # the sa grain, so (n_name, pk) is unique.
        .orderBy("n_name", "p_name", "pk")
        .limit(100)
        .drop("pk")
    )


# --- q92 shape: excess-discount correlated-average screen -------------------

_Q92_DISC = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))"
)


@query(
    "tpcds_q92_excess_discount",
    oracle=f"""
    WITH w AS (
        SELECT l_partkey, {_Q92_DISC} AS disc_amt
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-03-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1995-06-01 00:00:00'
    )
    SELECT round(CAST(SUM(disc_amt) AS DOUBLE), 2) AS excess_discount
    FROM w w1
    WHERE CAST(disc_amt AS DOUBLE) > 1.3 * (
        SELECT CAST(SUM(disc_amt) AS DOUBLE) / COUNT(*)
        FROM w w2 WHERE w2.l_partkey = w1.l_partkey
    )
    """,
    doc="TPC-DS q92 shape (sql/presto/tpcds/q92.sql): the excess-discount "
    "scan — every line whose discount amount exceeds 1.3x the average "
    "discount for the SAME item over the same 90-day window, summed to a "
    "single scalar. The oracle keeps the literal correlated scalar "
    "subquery over the shared CTE; Spark expresses the per-item average "
    "as a window over one scan (one shuffle on the item key, no per-row "
    "re-aggregation), the q01 decorrelation discipline.",
    tags=("tpcds", "subquery"),
)
def tpcds_q92_excess_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    w = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-06-01").cast("timestamp"))
    ).select(
        "l_partkey",
        (_dec("l_extendedprice", PRICE) * _dec("l_discount", FRAC)).alias("disc_amt"),
    )
    win = Window.partitionBy("l_partkey")
    screened = w.withColumn(
        "item_avg",
        F.sum("disc_amt").over(win).cast("double") / F.count("*").over(win),
    ).filter(F.col("disc_amt").cast("double") > 1.3 * F.col("item_avg"))
    return screened.agg(
        F.round(F.sum("disc_amt").cast("double"), 2).alias("excess_discount")
    )


# --- q48 shape: disjunction-of-conjunctions quantity scan -------------------


@query(
    "tpcds_q48_disjunctive_scan",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(SUM({_SQL_QTY}) AS DOUBLE) AS total_qty,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE (
            (c_mktsegment = 'BUILDING'
             AND l_quantity BETWEEN 1 AND 15
             AND l_discount BETWEEN 0.00 AND 0.04)
         OR (c_mktsegment = 'MACHINERY'
             AND l_quantity BETWEEN 16 AND 35
             AND l_discount BETWEEN 0.03 AND 0.07)
         OR (c_mktsegment = 'FURNITURE'
             AND l_quantity BETWEEN 36 AND 50
             AND l_discount BETWEEN 0.06 AND 0.10)
          )
      AND (
            (n_name IN ('NATION_0', 'NATION_3', 'NATION_6', 'NATION_9', 'NATION_12', 'NATION_15', 'NATION_18', 'NATION_21')
             AND l_extendedprice BETWEEN 0 AND 20000)
         OR (n_name IN ('NATION_1', 'NATION_4', 'NATION_7', 'NATION_10', 'NATION_13', 'NATION_16', 'NATION_19', 'NATION_22')
             AND l_extendedprice BETWEEN 20000 AND 60000)
          )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-DS q48 shape (sql/presto/tpcds/q48.sql): the "
    "disjunction-of-conjunctions scan — three (segment, quantity-band, "
    "discount-band) arms OR-ed together, conjoined with a second "
    "two-arm (nation-set, price-band) disjunction, over a four-table "
    "join. Exercises complex boolean predicate normalization and "
    "partial pushdown (the lineitem-only conjuncts of each arm cannot "
    "be factored below the join; the filter sits above it in both "
    "engines).",
    tags=("tpcds", "filter"),
)
def tpcds_q48_disjunctive_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    seg = F.col("c_mktsegment")
    qty = F.col("l_quantity")
    disc = F.col("l_discount")
    price = F.col("l_extendedprice")
    arm1 = (
        ((seg == "BUILDING") & qty.between(1, 15) & disc.between(0.00, 0.04))
        | ((seg == "MACHINERY") & qty.between(16, 35) & disc.between(0.03, 0.07))
        | ((seg == "FURNITURE") & qty.between(36, 50) & disc.between(0.06, 0.10))
    )
    arm2a = F.col("n_name").isin("NATION_0", "NATION_3", "NATION_6", "NATION_9", "NATION_12", "NATION_15", "NATION_18", "NATION_21") & price.between(0, 20000)
    arm2b = F.col("n_name").isin("NATION_1", "NATION_4", "NATION_7", "NATION_10", "NATION_13", "NATION_16", "NATION_19", "NATION_22") & price.between(
        20000, 60000
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .filter(arm1 & (arm2a | arm2b))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(_dec("l_quantity", QTY)).cast("double").alias("total_qty"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("o_orderpriority")
    )


# --- q10 shape: EXISTS AND (EXISTS OR EXISTS) customer screen ---------------


@query(
    "tpcds_q10_exists_or_exists",
    oracle="""
    SELECT c_mktsegment, n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND year(o_orderdate) = 1995 AND quarter(o_orderdate) <= 2
          )
      AND (
          EXISTS (
            SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey = c_custkey AND l_linenumber % 3 = 1
          )
          OR EXISTS (
            SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey = c_custkey AND l_linenumber % 3 = 2
          )
          )
    GROUP BY c_mktsegment, n_name
    ORDER BY c_mktsegment, n_name
    """,
    doc="TPC-DS q10 shape (sql/presto/tpcds/q10.sql): customers screened "
    "by EXISTS (store activity window) AND an OR of two more EXISTS "
    "(web / catalog channel activity), then counted per demographic "
    "cell. The OR-of-EXISTS cannot be two chained semi-joins (ANDs "
    "semantics); Spark expresses it as ONE semi-join against the "
    "UNION of the two channels' customer keys — distinct-union "
    "pushdown of a disjunctive ApplyNode — after the plain semi-join "
    "for the first EXISTS.",
    tags=("tpcds", "subquery", "join"),
)
def tpcds_q10_exists_or_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    active = (
        orders.filter(
            (F.year("o_orderdate") == 1995) & (F.quarter("o_orderdate") <= 2)
        )
        .select(F.col("o_custkey").alias("a_ck"))
        .distinct()
    )

    def chan_keys(mod: int) -> DataFrame:
        return (
            li.filter(F.col("l_linenumber") % 3 == mod)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .select(F.col("o_custkey").alias("ch_ck"))
        )

    either = chan_keys(1).union(chan_keys(2)).distinct()
    return (
        cust.join(active, cust.c_custkey == active.a_ck, "left_semi")
        .join(either, cust.c_custkey == either.ch_ck, "left_semi")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_mktsegment", "n_name")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment", "n_name")
    )


# --- q62 shape: shipping-lag day-diff buckets -------------------------------


@query(
    "tpcds_q62_shipping_lag_buckets",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) AS BIGINT)
               AS d30,
           CAST(SUM(CASE WHEN lag_days > 30 AND lag_days <= 60 THEN 1 ELSE 0 END)
               AS BIGINT) AS d60,
           CAST(SUM(CASE WHEN lag_days > 60 AND lag_days <= 90 THEN 1 ELSE 0 END)
               AS BIGINT) AS d90,
           CAST(SUM(CASE WHEN lag_days > 90 AND lag_days <= 120 THEN 1 ELSE 0 END)
               AS BIGINT) AS d120,
           CAST(SUM(CASE WHEN lag_days > 120 THEN 1 ELSE 0 END) AS BIGINT)
               AS dmore
    FROM (
        SELECT o_orderpriority,
               date_diff('day', o_orderdate, l_shipdate) AS lag_days
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ) t
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-DS q62 shape (sql/presto/tpcds/q62.sql): fulfilment-lag "
    "distribution — the day difference between two dates on OPPOSITE "
    "sides of a join (order date vs ship date, playing sold vs shipped "
    "date_sk) bucketed into five CASE bands and counted per dimension "
    "(order priority plays ship mode). Date arithmetic feeding a "
    "conditional-aggregation pivot, one fact pass.",
    tags=("tpcds", "aggregation"),
)
def tpcds_q62_shipping_lag_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))

    def band(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0))

    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_orderpriority", lag.alias("lag_days"))
        .groupBy("o_orderpriority")
        .agg(
            band(F.col("lag_days") <= 30).alias("d30"),
            band((F.col("lag_days") > 30) & (F.col("lag_days") <= 60)).alias("d60"),
            band((F.col("lag_days") > 60) & (F.col("lag_days") <= 90)).alias("d90"),
            band((F.col("lag_days") > 90) & (F.col("lag_days") <= 120)).alias("d120"),
            band(F.col("lag_days") > 120).alias("dmore"),
        )
        .orderBy("o_orderpriority")
    )


# --- q09 shape: scalar subqueries inside CASE projections -------------------

# (band, threshold-per-unit-SF): each quantity band holds ~1.2M rows per
# unit SF, so the chosen thresholds split the five CASEs into both
# branches (1, 2, 5 above; 3, 4 below) with >8-sigma margins at every SF.
# Both engines compute identical exact counts, so the branch taken is
# always consistent; the spread just makes both branches load-bearing.
_Q09_BANDS = (
    (1, 10, 600_000),
    (11, 20, 800_000),
    (21, 30, 1_600_000),
    (31, 40, 1_800_000),
    (41, 50, 900_000),
)


def _q09_sql() -> str:
    cols = []
    for i, (lo, hi, thresh) in enumerate(_Q09_BANDS, 1):
        base = f"FROM lineitem WHERE l_quantity BETWEEN {lo} AND {hi}"
        cnt = f"(SELECT COUNT(*) {base})"
        avg_price = (
            f"(SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)"
            f" / COUNT(*) {base})"
        )
        avg_disc = (
            f"(SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
            f" * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))"
            f" AS DOUBLE) / COUNT(*) {base})"
        )
        cols.append(
            f"round(CASE WHEN {cnt} > {thresh} * sf THEN {avg_price}"
            f" ELSE {avg_disc} END, 6) AS bucket{i}"
        )
    sel = ",\n           ".join(cols)
    return f"""
    SELECT {sel}
    FROM (SELECT CAST(COUNT(*) AS DOUBLE) / 1500000.0 AS sf FROM orders) probe
    """


@query(
    "tpcds_q09_case_scalar_subqueries",
    oracle=_q09_sql(),
    doc="TPC-DS q09 shape (sql/presto/tpcds/q09.sql): fifteen "
    "uncorrelated scalar subqueries embedded in the CASE branches of one "
    "single-row projection — each quantity band COUNTs the fact table to "
    "choose which of two averages to report (EnforceSingleRowNode x15 "
    "feeding conditional projection). The count threshold scales with a "
    "probe-derived scale factor so the branch taken is SF-independent "
    "only where the data says so. Averages are exact decimal sums "
    "divided once in DOUBLE.",
    tags=("tpcds", "subquery"),
)
def tpcds_q09_case_scalar_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _q09_sql(), ("lineitem", "orders"))


# --- q66 shape: two-mode monthly pivot UNION ALL + re-aggregation -----------


def _q66_leg_sql(mod: int, tag: str) -> str:
    cols = ", ".join(
        f"SUM(CASE WHEN month(o_orderdate) = {m} THEN {_SQL_PRICE}"
        f" ELSE CAST(0 AS DECIMAL(12,2)) END) AS {tag}_m{m}"
        for m in range(1, 7)
    )
    return f"""
        SELECT n_name, year(o_orderdate) AS yr, {cols}
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_linenumber % 2 = {mod} AND year(o_orderdate) = 1995
        GROUP BY n_name, year(o_orderdate)
    """


@query(
    "tpcds_q66_monthly_mode_pivot",
    oracle=f"""
    WITH legs AS (
        SELECT n_name, yr, {", ".join(f"a_m{m}" for m in range(1, 7))},
               {", ".join(f"CAST(0 AS DECIMAL(12,2)) AS b_m{m}" for m in range(1, 7))}
        FROM ({_q66_leg_sql(0, "a")}) x
        UNION ALL
        SELECT n_name, yr, {", ".join(f"CAST(0 AS DECIMAL(12,2)) AS a_m{m}" for m in range(1, 7))},
               {", ".join(f"b_m{m}" for m in range(1, 7))}
        FROM ({_q66_leg_sql(1, "b")}) y
    )
    SELECT n_name, yr,
           {", ".join(f"CAST(SUM(a_m{m}) AS DOUBLE) AS mode_a_m{m}" for m in range(1, 7))},
           {", ".join(f"CAST(SUM(b_m{m}) AS DOUBLE) AS mode_b_m{m}" for m in range(1, 7))}
    FROM legs
    GROUP BY n_name, yr
    ORDER BY n_name, yr
    """,
    doc="TPC-DS q66 shape (sql/presto/tpcds/q66.sql): two ship-mode legs "
    "(l_linenumber parity) each pivoting sales into six monthly CASE "
    "columns, zero-padded to a common wide schema, UNION ALL'd, and "
    "re-aggregated per (warehouse=nation, year) — the pivot-pad-union-"
    "reaggregate idiom that fuses two channel scans into one wide row "
    "set. Exact decimal accumulation end to end, cast once on output.",
    tags=("tpcds", "aggregation", "setop"),
)
def tpcds_q66_monthly_mode_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    zero = F.lit(0).cast(PRICE)

    # each leg aggregates its six monthly pivot columns, then pads the
    # OTHER mode's columns with typed zeros so the union schema is wide
    # and identical (the reference's zero-padded common shape)
    def leg_df(mod: int, tag: str) -> DataFrame:
        monthly = [
            F.sum(
                F.when(F.month("o_orderdate") == m, _dec("l_extendedprice", PRICE))
                .otherwise(zero)
            ).alias(f"{tag}_m{m}")
            for m in range(1, 7)
        ]
        base = (
            li.filter(F.col("l_linenumber") % 2 == mod)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name", F.year("o_orderdate").alias("yr"))
            .agg(*monthly)
        )
        sel = [F.col("n_name"), F.col("yr")]
        for m in range(1, 7):
            sel.append(F.col(f"a_m{m}") if tag == "a" else zero.alias(f"a_m{m}"))
        for m in range(1, 7):
            sel.append(F.col(f"b_m{m}") if tag == "b" else zero.alias(f"b_m{m}"))
        return base.select(*sel)

    legs = leg_df(0, "a").unionAll(leg_df(1, "b"))
    agg = [
        F.sum(f"a_m{m}").cast("double").alias(f"mode_a_m{m}") for m in range(1, 7)
    ] + [
        F.sum(f"b_m{m}").cast("double").alias(f"mode_b_m{m}") for m in range(1, 7)
    ]
    return legs.groupBy("n_name", "yr").agg(*agg).orderBy("n_name", "yr")


# --- q40 shape: returns-adjusted sales with before/after pivot --------------

_Q40_PIVOT = "1995-07-01"


@query(
    "tpcds_q40_returns_adjusted_pivot",
    oracle=f"""
    WITH ret AS (
        SELECT DISTINCT l_orderkey AS r_orderkey, l_partkey AS r_partkey
        FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT n_name, p_brand,
           round(CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '{_Q40_PIVOT} 00:00:00'
               THEN CASE WHEN r_orderkey IS NULL THEN {_SQL_PRICE}
                         ELSE CAST(0 AS DECIMAL(12,2)) END
               ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE), 2) AS sales_before,
           round(CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '{_Q40_PIVOT} 00:00:00'
               THEN CASE WHEN r_orderkey IS NULL THEN {_SQL_PRICE}
                         ELSE CAST(0 AS DECIMAL(12,2)) END
               ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE), 2) AS sales_after
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    LEFT JOIN ret ON l_orderkey = r_orderkey AND l_partkey = r_partkey
    WHERE year(o_orderdate) = 1995 AND p_size <= 10
    GROUP BY n_name, p_brand
    ORDER BY n_name, p_brand
    LIMIT 100
    """,
    doc="TPC-DS q40 shape (sql/presto/tpcds/q40.sql): catalog sales "
    "LEFT JOINed to returns (unreturned lines keep their value, returned "
    "lines contribute zero — the COALESCE-style null-extension use) "
    "pivoted into before/after columns around a cutoff date, per "
    "(warehouse=nation, item brand) with an item filter. Combines the "
    "q93 returns-adjustment outer join with the q21 date pivot in one "
    "aggregate.",
    tags=("tpcds", "outerjoin", "aggregation"),
)
def tpcds_q40_returns_adjusted_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    part = t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    ret = (
        li.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("r_orderkey"),
            F.col("l_partkey").alias("r_partkey"),
        )
        .distinct()
    )
    pivot_ts = F.lit(_Q40_PIVOT).cast("timestamp")
    zero = F.lit(0).cast(PRICE)
    kept = F.when(F.col("r_orderkey").isNull(), _dec("l_extendedprice", PRICE)).otherwise(zero)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(
            ret,
            (li.l_orderkey == ret.r_orderkey) & (li.l_partkey == ret.r_partkey),
            "left",
        )
        .groupBy("n_name", "p_brand")
        .agg(
            F.round(
                F.sum(F.when(F.col("o_orderdate") < pivot_ts, kept).otherwise(zero))
                .cast("double"),
                2,
            ).alias("sales_before"),
            F.round(
                F.sum(F.when(F.col("o_orderdate") >= pivot_ts, kept).otherwise(zero))
                .cast("double"),
                2,
            ).alias("sales_after"),
        )
        .orderBy("n_name", "p_brand")
        .limit(100)
    )


# --- q33 shape: three-channel union restricted by an IN subquery ------------

_Q33_TYPE_FILTER = "p_type LIKE 'S%'"


def _q33_leg_sql(mod: int) -> str:
    return f"""
        SELECT p_brand, SUM({_SQL_PRICE}) AS sales
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_linenumber % 3 = {mod}
          AND l_partkey IN (SELECT p_partkey FROM part WHERE {_Q33_TYPE_FILTER})
        GROUP BY p_brand
    """


@query(
    "tpcds_q33_three_channel_category",
    oracle=f"""
    WITH legs AS (
        {_q33_leg_sql(0)}
        UNION ALL
        {_q33_leg_sql(1)}
        UNION ALL
        {_q33_leg_sql(2)}
    )
    SELECT p_brand, CAST(SUM(sales) AS DOUBLE) AS total_sales
    FROM legs
    GROUP BY p_brand
    ORDER BY total_sales DESC, p_brand
    LIMIT 50
    """,
    doc="TPC-DS q33 shape (sql/presto/tpcds/q33.sql): three channel legs "
    "(l_linenumber mod 3), each restricted to a manufacturer/category "
    "item set via an IN subquery on the dimension (semi-join under each "
    "leg), UNION ALL'd and re-aggregated to total sales per brand — "
    "semi-join + three-way union + re-aggregation, ordered by the "
    "aggregate.",
    tags=("tpcds", "setop", "join"),
)
def tpcds_q33_three_channel_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    keys = part.filter(_Q33_TYPE_FILTER).select("p_partkey")

    def leg(mod: int) -> DataFrame:
        return (
            li.filter(F.col("l_linenumber") % 3 == mod)
            .join(keys, li.l_partkey == keys.p_partkey, "left_semi")
            .join(part, li.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .agg(F.sum(_dec("l_extendedprice", PRICE)).alias("sales"))
        )

    return (
        leg(0).unionAll(leg(1)).unionAll(leg(2))
        .groupBy("p_brand")
        .agg(F.sum("sales").cast("double").alias("total_sales"))
        .orderBy(F.desc("total_sales"), "p_brand")
        .limit(50)
    )


# --- q38 / q87 shapes: three-channel set-op customer counts -----------------


def _q3887_chan_sql(mod: int) -> str:
    return f"""
        SELECT DISTINCT o_custkey FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_linenumber % 3 = {mod} AND year(o_orderdate) = 1995
    """


@query(
    "tpcds_q38_three_channel_intersect",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS hot_customers FROM (
        {_q3887_chan_sql(0)}
        INTERSECT
        {_q3887_chan_sql(1)}
        INTERSECT
        {_q3887_chan_sql(2)}
    ) t
    """,
    doc="TPC-DS q38 shape (sql/presto/tpcds/q38.sql): customers active in "
    "ALL three channels in one year — a chained three-way INTERSECT of "
    "per-channel DISTINCT projections, counted. IntersectNode composed "
    "with itself (q14 stops at two-way + semi-join restriction).",
    tags=("tpcds", "setop"),
)
def tpcds_q38_three_channel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)

    def chan(mod: int) -> DataFrame:
        return (
            li.filter(F.col("l_linenumber") % 3 == mod)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .select("o_custkey")
            .distinct()
        )

    return (
        chan(0).intersect(chan(1)).intersect(chan(2))
        .agg(F.count("*").alias("hot_customers"))
    )


@query(
    "tpcds_q87_three_channel_except",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS store_only_customers FROM (
        {_q3887_chan_sql(0)}
        EXCEPT
        {_q3887_chan_sql(1)}
        EXCEPT
        {_q3887_chan_sql(2)}
    ) t
    """,
    doc="TPC-DS q87 shape (sql/presto/tpcds/q87.sql): customers active in "
    "the store channel but NEITHER other channel in the year — a chained "
    "EXCEPT over per-channel DISTINCT projections, counted. ExceptNode "
    "composed with itself over the same scans q38 intersects (the "
    "left-deep set-op chain both engines must associate identically).",
    tags=("tpcds", "setop"),
)
def tpcds_q87_three_channel_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)

    def chan(mod: int) -> DataFrame:
        return (
            li.filter(F.col("l_linenumber") % 3 == mod)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .select("o_custkey")
            .distinct()
        )

    return (
        chan(0).subtract(chan(1)).subtract(chan(2))
        .agg(F.count("*").alias("store_only_customers"))
    )


# --- q58 shape: equal-share band screen across three channels ---------------


@query(
    "tpcds_q58_equal_share_brands",
    oracle=f"""
    WITH r AS (
        SELECT p_brand, l_linenumber % 3 AS ch, SUM({_SQL_PRICE}) AS s
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, l_linenumber % 3
    )
    SELECT p_brand,
           CAST(SUM(CASE WHEN ch = 0 THEN s END) AS DOUBLE) AS store_rev,
           CAST(SUM(CASE WHEN ch = 1 THEN s END) AS DOUBLE) AS web_rev,
           CAST(SUM(CASE WHEN ch = 2 THEN s END) AS DOUBLE) AS catalog_rev,
           round(CAST(SUM(s) AS DOUBLE) / 3, 6) AS avg_rev
    FROM r
    GROUP BY p_brand
    HAVING COUNT(*) = 3
       AND MIN(CAST(s AS DOUBLE)) >= 0.7 * (CAST(SUM(s) AS DOUBLE) / 3)
       AND MAX(CAST(s AS DOUBLE)) <= 1.3 * (CAST(SUM(s) AS DOUBLE) / 3)
    ORDER BY p_brand
    """,
    doc="TPC-DS q58 shape (sql/presto/tpcds/q58.sql): brands whose "
    "revenue is EVENLY split across the three channels — per-channel "
    "sums pivoted per brand, screened with a +/-30% band around the "
    "three-channel average in the HAVING clause (min/max vs an aggregate "
    "of the same groups; the reference joins three CTEs with pairwise "
    "band predicates, which the single HAVING expresses equivalently). "
    "The band is 30% because the l_linenumber mod-3 channel split is "
    "structurally uneven (line numbers decay), mirroring the reference's "
    "unequal channel volumes.",
    tags=("tpcds", "aggregation", "filter"),
)
def tpcds_q58_equal_share_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    r = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", (F.col("l_linenumber") % 3).alias("ch"))
        .agg(F.sum(_dec("l_extendedprice", PRICE)).alias("s"))
    )
    avg3 = F.sum("s").cast("double") / 3
    return (
        r.groupBy("p_brand")
        .agg(
            F.sum(F.when(F.col("ch") == 0, F.col("s"))).cast("double").alias("store_rev"),
            F.sum(F.when(F.col("ch") == 1, F.col("s"))).cast("double").alias("web_rev"),
            F.sum(F.when(F.col("ch") == 2, F.col("s"))).cast("double").alias("catalog_rev"),
            F.round(avg3, 6).alias("avg_rev"),
            F.count("*").alias("nch"),
            F.min(F.col("s").cast("double")).alias("mn"),
            F.max(F.col("s").cast("double")).alias("mx"),
            (F.sum("s").cast("double") / 3).alias("avg_raw"),
        )
        .filter(
            (F.col("nch") == 3)
            & (F.col("mn") >= 0.7 * F.col("avg_raw"))
            & (F.col("mx") <= 1.3 * F.col("avg_raw"))
        )
        .select("p_brand", "store_rev", "web_rev", "catalog_rev", "avg_rev")
        .orderBy("p_brand")
    )


# --- q61 shape: promotional-share ratio of two scalar aggregates ------------


@query(
    "tpcds_q61_promo_share",
    oracle=f"""
    SELECT round(CAST(promo.s AS DOUBLE) / CAST(total.s AS DOUBLE) * 100, 6)
               AS promo_pct,
           round(CAST(promo.s AS DOUBLE), 2) AS promotions,
           round(CAST(total.s AS DOUBLE), 2) AS total
    FROM (
        SELECT SUM({_SQL_PRICE}) AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE year(o_orderdate) = 1995 AND l_discount > 0.05
    ) promo, (
        SELECT SUM({_SQL_PRICE}) AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE year(o_orderdate) = 1995
    ) total
    """,
    doc="TPC-DS q61 shape (sql/presto/tpcds/q61.sql): the promotional "
    "share — one scalar aggregate over the promoted subset (discount "
    "plays the promotion join) cross-joined with the same aggregate "
    "unrestricted, ratio in percent. Two EnforceSingleRow branches over "
    "overlapping scans joined without keys.",
    tags=("tpcds", "aggregation", "join"),
)
def tpcds_q61_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    base = li.join(orders, li.l_orderkey == orders.o_orderkey)
    promo = base.filter(F.col("l_discount") > 0.05).agg(
        F.sum(_dec("l_extendedprice", PRICE)).alias("ps")
    )
    total = base.agg(F.sum(_dec("l_extendedprice", PRICE)).alias("ts"))
    return promo.crossJoin(total).select(
        F.round(F.col("ps").cast("double") / F.col("ts").cast("double") * 100, 6)
        .alias("promo_pct"),
        F.round(F.col("ps").cast("double"), 2).alias("promotions"),
        F.round(F.col("ts").cast("double"), 2).alias("total"),
    )


# --- q04 shape: triple-channel year-over-year growth gate -------------------

_Q04_YT = f"""
    SELECT o_custkey AS ck, l_linenumber % 3 AS ch, year(o_orderdate) AS yr,
           SUM({_SQL_PRICE}) AS tot
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE year(o_orderdate) IN (1995, 1996)
    GROUP BY o_custkey, l_linenumber % 3, year(o_orderdate)
"""


@query(
    "tpcds_q04_triple_channel_growth",
    oracle=f"""
    WITH yt AS ({_Q04_YT})
    SELECT s1.ck AS c_custkey,
           round(CAST(w2.tot AS DOUBLE) / CAST(w1.tot AS DOUBLE), 6) AS web_growth,
           round(CAST(c2.tot AS DOUBLE) / CAST(c1.tot AS DOUBLE), 6) AS cat_growth,
           round(CAST(s2.tot AS DOUBLE) / CAST(s1.tot AS DOUBLE), 6) AS store_growth
    FROM yt s1
    JOIN yt s2 ON s1.ck = s2.ck AND s2.ch = 0 AND s2.yr = 1996
    JOIN yt w1 ON s1.ck = w1.ck AND w1.ch = 1 AND w1.yr = 1995
    JOIN yt w2 ON s1.ck = w2.ck AND w2.ch = 1 AND w2.yr = 1996
    JOIN yt c1 ON s1.ck = c1.ck AND c1.ch = 2 AND c1.yr = 1995
    JOIN yt c2 ON s1.ck = c2.ck AND c2.ch = 2 AND c2.yr = 1996
    WHERE s1.ch = 0 AND s1.yr = 1995
      AND CAST(s1.tot AS DOUBLE) > 0 AND CAST(w1.tot AS DOUBLE) > 0
      AND CAST(c1.tot AS DOUBLE) > 0
      AND CAST(w2.tot AS DOUBLE) / CAST(w1.tot AS DOUBLE)
          > CAST(s2.tot AS DOUBLE) / CAST(s1.tot AS DOUBLE)
      AND CAST(c2.tot AS DOUBLE) / CAST(c1.tot AS DOUBLE)
          > CAST(s2.tot AS DOUBLE) / CAST(s1.tot AS DOUBLE)
    ORDER BY c_custkey
    """,
    doc="TPC-DS q04 shape (sql/presto/tpcds/q04.sql): the year_total CTE "
    "consumed SIX times — per-customer yearly totals for three channels "
    "x two years, self-joined on the customer key, gating customers "
    "whose web AND catalog growth both outpaced store growth. The "
    "deepest repeated-CTE join chain in the corpus (q31 stops at four "
    "legs, q11 at two channels); all ratios divide exact decimal sums "
    "in DOUBLE.",
    tags=("tpcds", "join", "cte"),
)
def tpcds_q04_triple_channel_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996)
    )
    # OPTIMIZATION r15 (guide §2.3-2.4): the six yt legs are DISJOINT
    # (channel, year) cells of one aggregate, and the six-way self-join
    # re-scanned lineitem/orders six times each (5 sort-merge joins,
    # measured 1.70 s). One pass with six conditional sums is the
    # identical algebra: each cell's sum is the same DECIMAL total; a
    # missing cell yields NULL, and requiring all six IS NOT NULL is
    # exactly the six-way INNER join's existence condition. The oracle
    # keeps the reference's repeated-CTE spelling (DuckDB materializes
    # yt once).
    mod3 = F.col("l_linenumber") % 3
    yrc = F.year("o_orderdate")

    def cell(ch: int, yr: int, pre: str):
        return (
            F.sum(F.when((mod3 == ch) & (yrc == yr), _dec("l_extendedprice", PRICE)))
            .cast("double")
            .alias(f"{pre}_tot")
        )

    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("s1_ck"))
        .agg(
            cell(0, 1995, "s1"), cell(0, 1996, "s2"),
            cell(1, 1995, "w1"), cell(1, 1996, "w2"),
            cell(2, 1995, "c1"), cell(2, 1996, "c2"),
        )
        .filter(
            F.col("s1_tot").isNotNull() & F.col("s2_tot").isNotNull()
            & F.col("w1_tot").isNotNull() & F.col("w2_tot").isNotNull()
            & F.col("c1_tot").isNotNull() & F.col("c2_tot").isNotNull()
        )
        .filter(
            (F.col("s1_tot") > 0) & (F.col("w1_tot") > 0) & (F.col("c1_tot") > 0)
        )
        .withColumn("store_growth", F.col("s2_tot") / F.col("s1_tot"))
        .withColumn("web_growth", F.col("w2_tot") / F.col("w1_tot"))
        .withColumn("cat_growth", F.col("c2_tot") / F.col("c1_tot"))
        .filter(
            (F.col("web_growth") > F.col("store_growth"))
            & (F.col("cat_growth") > F.col("store_growth"))
        )
    )
    return joined.select(
        F.col("s1_ck").alias("c_custkey"),
        F.round("web_growth", 6).alias("web_growth"),
        F.round("cat_growth", 6).alias("cat_growth"),
        F.round("store_growth", 6).alias("store_growth"),
    ).orderBy("c_custkey")


# --- q35 shape: EXISTS-gated demographic statistics -------------------------


@query(
    "tpcds_q35_demographic_stats",
    oracle=f"""
    SELECT n_name, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal,
           round(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_bal,
           round(COALESCE(stddev_samp(c_acctbal), 0), 4) AS sd_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995
          )
      AND c_acctbal > 0
    GROUP BY n_name, c_mktsegment
    ORDER BY n_name, c_mktsegment
    LIMIT 100
    """,
    doc="TPC-DS q35 shape (sql/presto/tpcds/q35.sql): an EXISTS activity "
    "gate on the customer set followed by count/min/max/avg/stddev "
    "statistics per demographic cell — the semi-join feeding a "
    "multi-statistic aggregate (q10 counts only; this carries the full "
    "stats battery). Averages are exact decimal sums divided once; "
    "stddev rounded per the module convention.",
    tags=("tpcds", "subquery", "aggregation"),
)
def tpcds_q35_demographic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    orders = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    nation = t(spark, sf_dir, "nation")
    active = orders.select(F.col("o_custkey").alias("a_ck")).distinct()
    n = F.count("*")
    return (
        cust.join(active, cust.c_custkey == active.a_ck, "left_semi")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(
            n.alias("cnt"),
            F.min("c_acctbal").cast("double").alias("min_bal"),
            F.max("c_acctbal").cast("double").alias("max_bal"),
            F.round(F.sum(_dec("c_acctbal", PRICE)).cast("double") / n, 6)
            .alias("avg_bal"),
            F.round(F.coalesce(F.stddev_samp("c_acctbal"), F.lit(0.0)), 4)
            .alias("sd_bal"),
        )
        .orderBy("n_name", "c_mktsegment")
        .limit(100)
    )


# --- q45 shape: OR of a literal filter and an IN-subquery -------------------


@query(
    "tpcds_q45_literal_or_subquery",
    oracle=f"""
    SELECT n_name,
           round(CAST(SUM({_SQL_PRICE}) AS DOUBLE), 2) AS sales,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_nationkey IN (1, 3, 5, 7)
       OR l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 1)
    GROUP BY n_name
    ORDER BY n_name
    """,
    doc="TPC-DS q45 shape (sql/presto/tpcds/q45.sql): the disjunction of "
    "a literal dimension filter (zip list) and an IN-subquery (item "
    "set) — a predicate no chain of semi-joins can express (ORing a "
    "semi-join with a filter). Spark expresses the subquery arm as a "
    "LEFT join against the DISTINCT key set with a match flag, then "
    "filters the OR of flag and literal — the outer-join-flag "
    "decorrelation of a disjunctive ApplyNode; the oracle keeps the "
    "literal OR-IN form.",
    tags=("tpcds", "subquery", "filter"),
)
def tpcds_q45_literal_or_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    special = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_size") == 1)
        .select(F.col("p_partkey").alias("sp_pk"))
        .distinct()
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(special), li.l_partkey == special.sp_pk, "left")
        .filter(
            F.col("c_nationkey").isin(1, 3, 5, 7) | F.col("sp_pk").isNotNull()
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(_dec("l_extendedprice", PRICE)).cast("double"), 2)
            .alias("sales"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("n_name")
    )


# --- q54 shape: aggregate-of-aggregate revenue segmentation -----------------


@query(
    "tpcds_q54_revenue_segments",
    oracle=f"""
    WITH spend AS (
        SELECT o_custkey AS ck, SUM({_SQL_PRICE}) AS rev
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey
    )
    SELECT CAST(floor(CAST(rev AS DOUBLE) / 50000) AS INT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS num_customers
    FROM spend
    GROUP BY CAST(floor(CAST(rev AS DOUBLE) / 50000) AS INT)
    ORDER BY segment
    """,
    doc="TPC-DS q54 shape (sql/presto/tpcds/q54.sql tail): per-customer "
    "revenue re-aggregated into fixed-width segments — an aggregate "
    "whose GROUP key is a bucketing function of another aggregate's "
    "output (the revenue histogram). Both engines floor the same DOUBLE "
    "of the exact decimal sum, so bucket boundaries agree bit-for-bit.",
    tags=("tpcds", "aggregation"),
)
def tpcds_q54_revenue_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    spend = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(F.sum(_dec("l_extendedprice", PRICE)).alias("rev"))
    )
    seg = F.floor(F.col("rev").cast("double") / 50000).cast("int")
    return (
        spend.groupBy(seg.alias("segment"))
        .agg(F.count("*").alias("num_customers"))
        .orderBy("segment")
    )


# --- q70 shape: rank-restricted ROLLUP (top regions by a window subquery) ---


@query(
    "tpcds_q70_rank_restricted_rollup",
    oracle=f"""
    WITH nation_sales AS (
        SELECT c_nationkey AS nk, n_regionkey AS rk, n_name,
               SUM({_SQL_PRICE}) AS sales
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY c_nationkey, n_regionkey, n_name
    ),
    top_nations AS (
        SELECT n_name FROM (
            SELECT n_name,
                   RANK() OVER (PARTITION BY rk ORDER BY sales DESC) AS rnk
            FROM nation_sales
        ) r WHERE rnk <= 2
    )
    SELECT r_name, n_name,
           CAST(GROUPING(n_name) AS INT) AS g_nation,
           CAST(SUM({_SQL_PRICE}) AS DOUBLE) AS total_sales
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE n_name IN (SELECT n_name FROM top_nations)
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
    doc="TPC-DS q70 shape (sql/presto/tpcds/q70.sql): the fact rolled up "
    "by (region, nation) with GROUPING(), but RESTRICTED to nations that "
    "a separate windowed aggregate ranks top-2 within their region — an "
    "IN-subquery whose inner query is itself a rank() over a grouped "
    "aggregate, feeding a ROLLUP over the same fact. Semi-join over a "
    "window-derived key set + GroupIdNode in one plan.",
    tags=("tpcds", "window", "aggregation", "subquery"),
)
def tpcds_q70_rank_restricted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    fact = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    nation_sales = fact.groupBy("c_nationkey", "n_regionkey", "n_name").agg(
        F.sum(_dec("l_extendedprice", PRICE)).alias("sales")
    )
    w = Window.partitionBy("n_regionkey").orderBy(F.col("sales").desc())
    top_nations = (
        nation_sales.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 2)
        .select(F.col("n_name").alias("top_n"))
    )
    base = (
        fact.join(F.broadcast(top_nations), fact.n_name == top_nations.top_n, "left_semi")
        .join(F.broadcast(region), fact.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(_dec("l_extendedprice", PRICE)).alias("s_leaf"))
    )
    # Pre-aggregated leaves into the rollup (the q36 Expand lesson).
    return (
        base.rollup("r_name", "n_name")
        .agg(
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.sum("s_leaf").cast("double").alias("total_sales"),
        )
        .orderBy(
            F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first()
        )
    )


# --- q64 shape: refund-screened items, wide join, two-year self-join --------


@query(
    "tpcds_q64_cross_year_items",
    oracle=f"""
    WITH cs_ui AS (
        SELECT l_partkey AS pk
        FROM lineitem
        GROUP BY l_partkey
        HAVING SUM(CASE WHEN l_returnflag <> 'R' THEN {_SQL_PRICE}
                        ELSE CAST(0 AS DECIMAL(12,2)) END)
             > 2 * SUM(CASE WHEN l_returnflag = 'R' THEN {_SQL_PRICE}
                            ELSE CAST(0 AS DECIMAL(12,2)) END)
    ),
    cross_sales AS (
        SELECT l_partkey AS pk, p_brand, year(o_orderdate) AS yr,
               n_name AS cust_nation,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               SUM({_SQL_PRICE}) AS sales
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN part ON l_partkey = p_partkey
        WHERE l_partkey IN (SELECT pk FROM cs_ui)
          AND year(o_orderdate) IN (1995, 1996)
          AND s_nationkey <> c_nationkey
        GROUP BY l_partkey, p_brand, year(o_orderdate), n_name
    )
    SELECT cs1.p_brand, cs1.cust_nation,
           cs1.cnt AS cnt_95, CAST(cs1.sales AS DOUBLE) AS sales_95,
           cs2.cnt AS cnt_96, CAST(cs2.sales AS DOUBLE) AS sales_96
    FROM cross_sales cs1
    JOIN cross_sales cs2
      ON cs1.pk = cs2.pk AND cs1.cust_nation = cs2.cust_nation
     AND cs1.yr = 1995 AND cs2.yr = 1996
    WHERE cs2.cnt >= cs1.cnt
    ORDER BY cs1.p_brand, cs1.cust_nation, cnt_95, sales_95, cnt_96, sales_96
    LIMIT 100
    """,
    doc="TPC-DS q64 shape (sql/presto/tpcds/q64.sql): the refund-screened "
    "item set (HAVING sales > 2x refunds — the cs_ui CTE) restricting a "
    "SIX-table wide join with a cross-dimension inequality (supplier "
    "nation <> customer nation), aggregated per (item, nation, year) and "
    "self-joined across two years keeping pairs whose count did not "
    "drop. The widest join chain in the corpus feeding a repeated-CTE "
    "period comparison.",
    tags=("tpcds", "join", "cte"),
)
def tpcds_q64_cross_year_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    supp = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part")
    zero = F.lit(0).cast(PRICE)
    cs_ui = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") != "R", _dec("l_extendedprice", PRICE))
                .otherwise(zero)
            ).alias("kept"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", _dec("l_extendedprice", PRICE))
                .otherwise(zero)
            ).alias("refunded"),
        )
        .filter(F.col("kept") > 2 * F.col("refunded"))
        .select(F.col("l_partkey").alias("ui_pk"))
    )
    cross_sales = (
        li.join(cs_ui, li.l_partkey == cs_ui.ui_pk, "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.year("o_orderdate").isin(1995, 1996))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("l_partkey").alias("pk"), "p_brand",
            F.year("o_orderdate").alias("yr"),
            F.col("n_name").alias("cust_nation"),
        )
        .agg(
            F.count("*").alias("cnt"),
            F.sum(_dec("l_extendedprice", PRICE)).alias("sales"),
        )
    )
    cs1 = cross_sales.filter(F.col("yr") == 1995).select(
        F.col("pk").alias("pk1"), F.col("p_brand").alias("p_brand"),
        F.col("cust_nation").alias("cust_nation"),
        F.col("cnt").alias("cnt_95"), F.col("sales").cast("double").alias("sales_95"),
    )
    cs2 = cross_sales.filter(F.col("yr") == 1996).select(
        F.col("pk").alias("pk2"), F.col("cust_nation").alias("cn2"),
        F.col("cnt").alias("cnt_96"), F.col("sales").cast("double").alias("sales_96"),
    )
    return (
        cs1.join(cs2, (cs1.pk1 == cs2.pk2) & (cs1.cust_nation == cs2.cn2))
        .filter(F.col("cnt_96") >= F.col("cnt_95"))
        .select(
            "p_brand", "cust_nation", "cnt_95", "sales_95", "cnt_96", "sales_96"
        )
        .orderBy("p_brand", "cust_nation", "cnt_95", "sales_95", "cnt_96", "sales_96")
        .limit(100)
    )


# --- q80 shape: three-channel returns-adjusted ROLLUP -----------------------


def _q80_leg_sql(mod: int, tag: str) -> str:
    return f"""
        SELECT '{tag}' AS channel, p_brand,
               SUM(CASE WHEN r_orderkey IS NULL THEN {_SQL_PRICE}
                        ELSE CAST(0 AS DECIMAL(12,2)) END) AS sales,
               SUM(CASE WHEN r_orderkey IS NULL THEN CAST(0 AS DECIMAL(12,2))
                        ELSE {_SQL_PRICE} END) AS returns_
        FROM lineitem
        LEFT JOIN ret ON l_orderkey = r_orderkey AND l_partkey = r_partkey
        JOIN part ON l_partkey = p_partkey
        WHERE l_linenumber % 3 = {mod}
        GROUP BY p_brand
    """


@query(
    "tpcds_q80_channel_returns_rollup",
    oracle=f"""
    WITH ret AS (
        SELECT DISTINCT l_orderkey AS r_orderkey, l_partkey AS r_partkey
        FROM lineitem WHERE l_returnflag = 'R'
    ),
    legs AS (
        {_q80_leg_sql(0, "store")}
        UNION ALL
        {_q80_leg_sql(1, "web")}
        UNION ALL
        {_q80_leg_sql(2, "catalog")}
    )
    SELECT channel, p_brand,
           CAST(GROUPING(p_brand) AS INT) + 2 * CAST(GROUPING(channel) AS INT)
               AS g_level,
           CAST(SUM(sales) AS DOUBLE) AS total_sales,
           CAST(SUM(returns_) AS DOUBLE) AS total_returns
    FROM legs
    GROUP BY ROLLUP (channel, p_brand)
    ORDER BY channel NULLS FIRST, p_brand NULLS FIRST
    LIMIT 100
    """,
    doc="TPC-DS q80 shape (sql/presto/tpcds/q80.sql): three channel legs "
    "each splitting value into sales (unreturned) vs returns via the "
    "LEFT JOIN null-flag pivot, tagged with a literal channel column, "
    "UNION ALL'd, and rolled up over (channel, brand) with a composed "
    "GROUPING() level — returns-adjusted channel totals with subtotal "
    "and grand-total rows. Combines the q40 adjustment, q33 union, and "
    "q36 rollup machinery in one plan.",
    tags=("tpcds", "setop", "aggregation", "outerjoin"),
)
def tpcds_q80_channel_returns_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    ret = (
        li.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("r_orderkey"),
            F.col("l_partkey").alias("r_partkey"),
        )
        .distinct()
    )
    zero = F.lit(0).cast(PRICE)

    def leg(mod: int, tag: str) -> DataFrame:
        return (
            li.filter(F.col("l_linenumber") % 3 == mod)
            .join(
                ret,
                (li.l_orderkey == ret.r_orderkey) & (li.l_partkey == ret.r_partkey),
                "left",
            )
            .join(part, li.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .agg(
                F.sum(
                    F.when(F.col("r_orderkey").isNull(), _dec("l_extendedprice", PRICE))
                    .otherwise(zero)
                ).alias("sales"),
                F.sum(
                    F.when(F.col("r_orderkey").isNull(), zero)
                    .otherwise(_dec("l_extendedprice", PRICE))
                ).alias("returns_"),
            )
            .select(F.lit(tag).alias("channel"), "p_brand", "sales", "returns_")
        )

    legs = leg(0, "store").unionAll(leg(1, "web")).unionAll(leg(2, "catalog"))
    return (
        legs.rollup("channel", "p_brand")
        .agg(
            (
                F.grouping("p_brand").cast("int")
                + 2 * F.grouping("channel").cast("int")
            ).alias("g_level"),
            F.sum("sales").cast("double").alias("total_sales"),
            F.sum("returns_").cast("double").alias("total_returns"),
        )
        .orderBy(
            F.col("channel").asc_nulls_first(), F.col("p_brand").asc_nulls_first()
        )
        .limit(100)
    )


# --- q46 shape: cross-dimension inequality screen with join-back ------------


@query(
    "tpcds_q46_cross_nation_orders",
    oracle=f"""
    WITH per_order AS (
        SELECT o_orderkey, o_custkey,
               SUM({_SQL_PRICE}) AS amt,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               SUM(CASE WHEN s_nationkey <> c_nationkey THEN 1 ELSE 0 END)
                   AS cross_lines
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE year(o_orderdate) = 1995
        GROUP BY o_orderkey, o_custkey
    )
    SELECT c_name, o_orderkey, CAST(amt AS DOUBLE) AS amt, n_lines
    FROM per_order
    JOIN customer ON o_custkey = c_custkey
    WHERE cross_lines > 0
    ORDER BY c_name, o_orderkey
    LIMIT 100
    """,
    doc="TPC-DS q46 shape (sql/presto/tpcds/q46.sql): per-order "
    "aggregates carrying an embedded cross-dimension inequality flag "
    "(supplier nation <> ordering customer's nation — playing 'bought in "
    "a city they don't live in'), screened on the flag and joined BACK "
    "to the customer dimension for decoration — the aggregate-then-"
    "rejoin-the-dim pattern with a dim-vs-dim comparison inside the "
    "aggregate.",
    tags=("tpcds", "join", "aggregation"),
)
def tpcds_q46_cross_nation_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            F.sum(_dec("l_extendedprice", PRICE)).alias("amt"),
            F.count("*").alias("n_lines"),
            F.sum(
                F.when(F.col("s_nationkey") != F.col("c_nationkey"), 1).otherwise(0)
            ).alias("cross_lines"),
        )
        .filter(F.col("cross_lines") > 0)
    )
    cust2 = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck2"), "c_name"
    )
    return (
        per_order.join(cust2, per_order.o_custkey == cust2.ck2)
        .select(
            "c_name", "o_orderkey",
            F.col("amt").cast("double").alias("amt"), "n_lines",
        )
        .orderBy("c_name", "o_orderkey")
        .limit(100)
    )


# --- q44 shape: best/worst performers via opposed rank subqueries -----------


@query(
    "tpcds_q44_best_worst_items",
    oracle=f"""
    WITH perf AS (
        SELECT l_partkey AS pk,
               CAST(SUM({_SQL_PRICE}) AS DOUBLE) / COUNT(*) AS avg_rev
        FROM lineitem
        GROUP BY l_partkey
    ),
    ranked AS (
        SELECT pk, avg_rev,
               RANK() OVER (ORDER BY avg_rev DESC, pk) AS best_rank,
               RANK() OVER (ORDER BY avg_rev ASC, pk) AS worst_rank
        FROM perf
    )
    SELECT b.best_rank AS rnk, p1.p_name AS best_performing,
           p2.p_name AS worst_performing
    FROM ranked b
    JOIN ranked w ON b.best_rank = w.worst_rank
    JOIN part p1 ON b.pk = p1.p_partkey
    JOIN part p2 ON w.pk = p2.p_partkey
    WHERE b.best_rank <= 10
    ORDER BY rnk
    """,
    doc="TPC-DS q44 shape (sql/presto/tpcds/q44.sql): the best- and "
    "worst-performing items side by side — one per-item aggregate ranked "
    "TWICE in opposite directions, the two rankings equi-joined on rank "
    "position, and each side decorated from the item dimension "
    "independently (the dimension scanned twice under different join "
    "keys). Ties broken by the item key so both engines rank "
    "identically.",
    tags=("tpcds", "window", "join"),
)
def tpcds_q44_best_worst_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    perf = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(_dec("l_extendedprice", PRICE)).cast("double") / F.count("*"))
        .alias("avg_rev")
    )
    wb = Window.orderBy(F.col("avg_rev").desc(), F.col("pk"))
    ww = Window.orderBy(F.col("avg_rev").asc(), F.col("pk"))
    ranked = perf.select(
        "pk", "avg_rev",
        F.rank().over(wb).alias("best_rank"),
        F.rank().over(ww).alias("worst_rank"),
    )
    best = ranked.filter(F.col("best_rank") <= 10).select(
        F.col("best_rank").alias("rnk"), F.col("pk").alias("bpk")
    )
    worst = ranked.select(
        F.col("worst_rank").alias("wrnk"), F.col("pk").alias("wpk")
    )
    p1 = part.select(F.col("p_partkey").alias("pk1"), F.col("p_name").alias("best_performing"))
    p2 = part.select(F.col("p_partkey").alias("pk2"), F.col("p_name").alias("worst_performing"))
    return (
        best.join(worst, best.rnk == worst.wrnk)
        .join(p1, best.bpk == p1.pk1)
        .join(p2, worst.wpk == p2.pk2)
        .select("rnk", "best_performing", "worst_performing")
        .orderBy("rnk")
    )


# --- q49 shape: three-channel return-ratio dual ranks -----------------------


def _q49_leg_sql(mod: int, tag: str) -> str:
    return f"""
        SELECT '{tag}' AS channel, l_partkey AS pk,
               SUM(CASE WHEN l_returnflag = 'R' THEN {_SQL_QTY}
                        ELSE CAST(0 AS DECIMAL(12,2)) END) AS ret_qty,
               SUM({_SQL_QTY}) AS tot_qty
        FROM lineitem
        WHERE l_linenumber % 3 = {mod}
        GROUP BY l_partkey
        HAVING COUNT(*) >= 3
    """


@query(
    "tpcds_q49_return_ratio_ranks",
    oracle=f"""
    WITH legs AS (
        {_q49_leg_sql(0, "store")}
        UNION ALL
        {_q49_leg_sql(1, "web")}
        UNION ALL
        {_q49_leg_sql(2, "catalog")}
    ),
    ranked AS (
        SELECT channel, pk,
               round(CAST(ret_qty AS DOUBLE) / CAST(tot_qty AS DOUBLE), 6)
                   AS return_ratio,
               RANK() OVER (PARTITION BY channel
                            ORDER BY CAST(ret_qty AS DOUBLE)
                                     / CAST(tot_qty AS DOUBLE) DESC, pk)
                   AS ratio_rank,
               RANK() OVER (PARTITION BY channel
                            ORDER BY CAST(ret_qty AS DOUBLE) DESC, pk)
                   AS amount_rank
        FROM legs
    )
    SELECT channel, pk, return_ratio, ratio_rank, amount_rank
    FROM ranked
    WHERE ratio_rank <= 5 OR amount_rank <= 5
    ORDER BY channel, pk
    """,
    doc="TPC-DS q49 shape (sql/presto/tpcds/q49.sql): the worst return "
    "ratios per channel — three channel legs UNION ALL'd, each item "
    "ranked under TWO windows over the same partition (by return ratio "
    "and by returned amount), kept when EITHER rank makes the cut — the "
    "disjunctive dual-window screen. Ratios divide exact decimal sums; "
    "ties broken by the item key.",
    tags=("tpcds", "window", "setop"),
)
def tpcds_q49_return_ratio_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    zero = F.lit(0).cast(QTY)

    def leg(mod: int, tag: str) -> DataFrame:
        return (
            li.filter(F.col("l_linenumber") % 3 == mod)
            .groupBy(F.col("l_partkey").alias("pk"))
            .agg(
                F.sum(
                    F.when(F.col("l_returnflag") == "R", _dec("l_quantity", QTY))
                    .otherwise(zero)
                ).alias("ret_qty"),
                F.sum(_dec("l_quantity", QTY)).alias("tot_qty"),
                F.count("*").alias("n"),
            )
            .filter(F.col("n") >= 3)
            .select(F.lit(tag).alias("channel"), "pk", "ret_qty", "tot_qty")
        )

    legs = leg(0, "store").unionAll(leg(1, "web")).unionAll(leg(2, "catalog"))
    ratio = F.col("ret_qty").cast("double") / F.col("tot_qty").cast("double")
    wr = Window.partitionBy("channel").orderBy(ratio.desc(), F.col("pk"))
    wa = Window.partitionBy("channel").orderBy(
        F.col("ret_qty").cast("double").desc(), F.col("pk")
    )
    return (
        legs.select(
            "channel", "pk",
            F.round(ratio, 6).alias("return_ratio"),
            F.rank().over(wr).alias("ratio_rank"),
            F.rank().over(wa).alias("amount_rank"),
        )
        .filter((F.col("ratio_rank") <= 5) | (F.col("amount_rank") <= 5))
        .orderBy("channel", "pk")
    )


# --- q25 shape: three date roles chained through customer+item ---------------


@query(
    "tpcds_q25_chained_repurchase_profit",
    oracle=f"""
    WITH sale AS (
        SELECT o_custkey AS ck, l_partkey AS pk,
               SUM({SQL_DISC_PRICE}) AS sale_rev
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
        GROUP BY o_custkey, l_partkey
    ),
    ret AS (
        SELECT o_custkey AS ck, l_partkey AS pk,
               SUM({_SQL_QTY}) AS ret_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
          AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY o_custkey, l_partkey
    ),
    rep AS (
        SELECT o_custkey AS ck, l_partkey AS pk,
               SUM({SQL_DISC_PRICE}) AS rep_rev
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_custkey, l_partkey
    )
    SELECT n_name,
           CAST(SUM(sale_rev) AS DOUBLE) AS total_sale_rev,
           CAST(SUM(ret_qty) AS DOUBLE) AS total_ret_qty,
           CAST(SUM(rep_rev) AS DOUBLE) AS total_rep_rev
    FROM sale
    JOIN ret ON sale.ck = ret.ck AND sale.pk = ret.pk
    JOIN rep ON sale.ck = rep.ck AND sale.pk = rep.pk
    JOIN customer ON sale.ck = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    doc="TPC-DS q25 shape (sql/presto/tpcds/q25.sql): the same fact scanned "
    "under THREE different date roles — the original sale (order date in a "
    "half-year), its return (ship date within the year), and the "
    "re-purchase (order date in the following year) — chained on the "
    "(customer, item) pair and rolled up to the customer's nation. Each "
    "leg pre-aggregates BEFORE the chain so the three-way join runs on "
    "reduced keys, and the dimensions broadcast.",
    tags=("tpcds", "join"),
)
def tpcds_q25_chained_repurchase_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    fact = li.join(orders, li.l_orderkey == orders.o_orderkey)

    # OPTIMIZATION r15, examined and kept AS-IS (guide §1.2): the q78-style
    # conditional-aggregation collapse was tried here and MEASURED WORSE
    # (1.67 -> 1.96 s): unlike q78/q04/q74, whose legs partition the fact,
    # these legs are selective and their date/flag predicates push into the
    # per-leg parquet scans (sale prunes orders to a half-year, ret prunes
    # lineitem to R-flag ship-year) — the collapsed form forced one FULL
    # unpruned fact join, which costs more than the three pruned legs plus
    # the (ck, pk) chain joins. Pre-aggregate-then-chain stays.
    def leg(cond, measure, alias):
        return (
            fact.filter(cond)
            .groupBy(F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk"))
            .agg(F.sum(measure).alias(alias))
        )

    od = F.col("o_orderdate")
    sale = leg(
        (od >= F.lit("1995-01-01").cast("timestamp"))
        & (od < F.lit("1995-07-01").cast("timestamp")),
        disc_price(), "sale_rev",
    )
    ret = leg(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp")),
        _dec("l_quantity", QTY), "ret_qty",
    ).withColumnsRenamed({"ck": "rck", "pk": "rpk"})
    rep = leg(
        (od >= F.lit("1996-01-01").cast("timestamp"))
        & (od < F.lit("1997-01-01").cast("timestamp")),
        disc_price(), "rep_rev",
    ).withColumnsRenamed({"ck": "pck", "pk": "ppk"})
    return (
        sale.join(ret, (sale.ck == ret.rck) & (sale.pk == ret.rpk))
        .join(rep, (sale.ck == rep.pck) & (sale.pk == rep.ppk))
        .join(cust, sale.ck == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum("sale_rev").cast("double").alias("total_sale_rev"),
            F.sum("ret_qty").cast("double").alias("total_ret_qty"),
            F.sum("rep_rev").cast("double").alias("total_rep_rev"),
        )
        .orderBy("n_name")
    )


# --- q29 shape: quantity chain across three date roles, by item brand --------


@query(
    "tpcds_q29_quantity_chain",
    oracle=f"""
    WITH sale AS (
        SELECT o_custkey AS ck, l_partkey AS pk, SUM({_SQL_QTY}) AS sale_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
        GROUP BY o_custkey, l_partkey
    ),
    ret AS (
        SELECT o_custkey AS ck, l_partkey AS pk, SUM({_SQL_QTY}) AS ret_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
          AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
        GROUP BY o_custkey, l_partkey
    ),
    rep AS (
        SELECT o_custkey AS ck, l_partkey AS pk, SUM({_SQL_QTY}) AS rep_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1995-04-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY o_custkey, l_partkey
    )
    SELECT p_brand,
           CAST(SUM(sale_qty) AS DOUBLE) AS store_qty,
           CAST(SUM(ret_qty) AS DOUBLE) AS returned_qty,
           CAST(SUM(rep_qty) AS DOUBLE) AS catalog_qty
    FROM sale
    JOIN ret ON sale.ck = ret.ck AND sale.pk = ret.pk
    JOIN rep ON sale.ck = rep.ck AND sale.pk = rep.pk
    JOIN part ON sale.pk = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    doc="TPC-DS q29 shape (sql/presto/tpcds/q29.sql): q25's three-date-role "
    "chain with QUANTITY aggregates and a quarter-grained sale window, "
    "rolled up to the item brand instead of the buyer's nation — the "
    "variant that distinguishes the date-role machinery from the "
    "dimension it decorates. Pre-aggregated legs, equi-joined on "
    "(customer, item), part dimension broadcast.",
    tags=("tpcds", "join"),
)
def tpcds_q29_quantity_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part")
    fact = li.join(orders, li.l_orderkey == orders.o_orderkey)

    def leg(cond, alias):
        return (
            fact.filter(cond)
            .groupBy(F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk"))
            .agg(F.sum(_dec("l_quantity", QTY)).alias(alias))
        )

    od = F.col("o_orderdate")
    sale = leg(
        (od >= F.lit("1995-01-01").cast("timestamp"))
        & (od < F.lit("1995-04-01").cast("timestamp")),
        "sale_qty",
    )
    ret = leg(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp")),
        "ret_qty",
    ).withColumnsRenamed({"ck": "rck", "pk": "rpk"})
    rep = leg(
        (od >= F.lit("1995-04-01").cast("timestamp"))
        & (od < F.lit("1996-04-01").cast("timestamp")),
        "rep_qty",
    ).withColumnsRenamed({"ck": "pck", "pk": "ppk"})
    return (
        sale.join(ret, (sale.ck == ret.rck) & (sale.pk == ret.rpk))
        .join(rep, (sale.ck == rep.pck) & (sale.pk == rep.ppk))
        .join(part, sale.pk == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum("sale_qty").cast("double").alias("store_qty"),
            F.sum("ret_qty").cast("double").alias("returned_qty"),
            F.sum("rep_qty").cast("double").alias("catalog_qty"),
        )
        .orderBy("p_brand")
    )


# --- q56 shape: attribute-screened item ids across three channel legs --------

_Q56_PIDS = "SELECT p_partkey FROM part WHERE p_size IN (5, 10, 15, 20)"


def _q56_leg_sql(mod: int) -> str:
    return f"""
        SELECT l_partkey AS pk, SUM({SQL_DISC_PRICE}) AS rev
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_linenumber % 3 = {mod}
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
          AND l_partkey IN ({_Q56_PIDS})
        GROUP BY l_partkey
    """


@query(
    "tpcds_q56_screened_channel_totals",
    oracle=f"""
    WITH legs AS (
        {_q56_leg_sql(0)}
        UNION ALL
        {_q56_leg_sql(1)}
        UNION ALL
        {_q56_leg_sql(2)}
    )
    SELECT pk, CAST(SUM(rev) AS DOUBLE) AS total_rev
    FROM legs
    GROUP BY pk
    ORDER BY total_rev DESC, pk
    LIMIT 100
    """,
    doc="TPC-DS q56 shape (sql/presto/tpcds/q56.sql): per-item revenue "
    "summed across three channel legs, each leg independently screened by "
    "an item-ATTRIBUTE id-list subquery (items of the chosen sizes — the "
    "reference screens by color) — the IN-subquery runs per leg, then the "
    "legs UNION ALL and re-aggregate by item. Spark: the screened id set "
    "is a broadcast semi-join in each leg; one final hash agg.",
    tags=("tpcds", "setop", "subquery"),
)
def tpcds_q56_screened_channel_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    pids = t(spark, sf_dir, "part").filter(
        F.col("p_size").isin(5, 10, 15, 20)
    ).select("p_partkey")
    od = F.col("o_orderdate")
    fact = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (od >= F.lit("1995-01-01").cast("timestamp"))
            & (od < F.lit("1996-01-01").cast("timestamp"))
        )
    )

    def leg(mod: int) -> DataFrame:
        return (
            fact.filter(F.col("l_linenumber") % 3 == mod)
            .join(F.broadcast(pids), F.col("l_partkey") == F.col("p_partkey"), "semi")
            .groupBy(F.col("l_partkey").alias("pk"))
            .agg(F.sum(disc_price()).alias("rev"))
        )

    legs = leg(0).unionAll(leg(1)).unionAll(leg(2))
    return (
        legs.groupBy("pk")
        .agg(F.sum("rev").cast("double").alias("total_rev"))
        .orderBy(F.col("total_rev").desc(), F.col("pk"))
        .limit(100)
    )


# --- q75 shape: year-over-year quantity decline with returns netted out ------


@query(
    "tpcds_q75_yoy_decline",
    oracle=f"""
    WITH yearly AS (
        SELECT p_brand AS brand, EXTRACT(year FROM o_orderdate) AS yr,
               SUM(CASE WHEN l_returnflag = 'R'
                        THEN CAST(0 AS DECIMAL(12,2)) ELSE {_SQL_QTY} END)
                 AS net_qty
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY p_brand, EXTRACT(year FROM o_orderdate)
    )
    SELECT curr.brand,
           CAST(prev.net_qty AS DOUBLE) AS prev_qty,
           CAST(curr.net_qty AS DOUBLE) AS curr_qty,
           CAST(curr.net_qty - prev.net_qty AS DOUBLE) AS qty_diff
    FROM yearly curr
    JOIN yearly prev ON curr.brand = prev.brand AND curr.yr = prev.yr + 1
    WHERE curr.yr = 1996
      AND CAST(curr.net_qty AS DOUBLE) < 0.9 * CAST(prev.net_qty AS DOUBLE)
    ORDER BY curr.brand
    """,
    doc="TPC-DS q75 shape (sql/presto/tpcds/q75.sql): year-over-year sales "
    "DECLINE detection — per-(brand, year) net quantity (returned lines "
    "netted out via CASE), the aggregate self-joined on brand at a one-"
    "year offset, and brands kept only when the current year fell below "
    "90% of the prior. One fact pass builds both years; the self-join "
    "runs on the tiny aggregate.",
    tags=("tpcds", "join", "window"),
)
def tpcds_q75_yoy_decline(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part")
    od = F.col("o_orderdate")
    yearly = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .filter(
            (od >= F.lit("1995-01-01").cast("timestamp"))
            & (od < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(F.col("p_brand").alias("brand"), F.year(od).alias("yr"))
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") == "R", F.lit(0).cast(QTY))
                .otherwise(_dec("l_quantity", QTY))
            ).alias("net_qty")
        )
    )
    curr = yearly.filter(F.col("yr") == 1996).select(
        "brand", F.col("net_qty").alias("curr_net")
    )
    prev = yearly.filter(F.col("yr") == 1995).select(
        F.col("brand").alias("pbrand"), F.col("net_qty").alias("prev_net")
    )
    return (
        curr.join(prev, curr.brand == prev.pbrand)
        .filter(
            F.col("curr_net").cast("double")
            < 0.9 * F.col("prev_net").cast("double")
        )
        .select(
            "brand",
            F.col("prev_net").cast("double").alias("prev_qty"),
            F.col("curr_net").cast("double").alias("curr_qty"),
            (F.col("curr_net") - F.col("prev_net")).cast("double").alias("qty_diff"),
        )
        .orderBy("brand")
    )


# --- q69 shape: mutual-exclusion channel screens on the customer dim ---------


@query(
    "tpcds_q69_exclusive_channel_customers",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           round(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_acctbal
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey = c_custkey AND l_linenumber % 3 = 0
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    )
    AND NOT EXISTS (
        SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey = c_custkey AND l_linenumber % 3 = 1
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    )
    AND NOT EXISTS (
        SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey = c_custkey AND l_linenumber % 3 = 2
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="TPC-DS q69 shape (sql/presto/tpcds/q69.sql): customers active in "
    "ONE channel and provably absent from the other two in the same "
    "window — EXISTS plus two NOT EXISTS screens on the dimension, rolled "
    "up by segment. Spark: one semi-join and two anti-joins against "
    "per-channel custkey sets pre-reduced from a single fact pass.",
    tags=("tpcds", "subquery", "join"),
)
def tpcds_q69_exclusive_channel_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    od = F.col("o_orderdate")
    fact = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (od >= F.lit("1995-01-01").cast("timestamp"))
            & (od < F.lit("1996-01-01").cast("timestamp"))
        )
        .select("o_custkey", "l_linenumber")
    )

    def chan(mod: int) -> DataFrame:
        return (
            fact.filter(F.col("l_linenumber") % 3 == mod)
            .select(F.col("o_custkey").alias("ck"))
            .distinct()
        )

    screened = (
        cust.join(chan(0), cust.c_custkey == F.col("ck"), "semi")
        .join(chan(1), cust.c_custkey == F.col("ck"), "anti")
        .join(chan(2), cust.c_custkey == F.col("ck"), "anti")
    )
    return (
        screened.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            # exact decimal sum, then ONE double division: both engines
            # round the same IEEE value (the corpus' avg discipline)
            F.round(
                F.sum(_dec("c_acctbal", PRICE)).cast("double") / F.count("*"), 4
            ).alias("avg_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


# --- q97 shape: full-outer channel overlap counts ----------------------------


@query(
    "tpcds_q97_channel_overlap",
    oracle="""
    WITH store AS (
        SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_linenumber % 2 = 0
    ),
    cat AS (
        SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_linenumber % 2 = 1
    )
    SELECT CAST(SUM(CASE WHEN store.ck IS NOT NULL AND cat.ck IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
           CAST(SUM(CASE WHEN store.ck IS NULL AND cat.ck IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
           CAST(SUM(CASE WHEN store.ck IS NOT NULL AND cat.ck IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS store_and_catalog
    FROM store FULL OUTER JOIN cat
      ON store.ck = cat.ck AND store.pk = cat.pk
    """,
    doc="TPC-DS q97 shape (sql/presto/tpcds/q97.sql): channel overlap "
    "census — the distinct (customer, item) sets of two channels FULL "
    "OUTER JOINed on the composite key, null-ness of each side classifying "
    "every pair as store-only / catalog-only / both, counted in one "
    "scalar row. The two DISTINCT reductions happen before the join, so "
    "the outer join runs on the minimal key sets.",
    tags=("tpcds", "join", "setop"),
)
def tpcds_q97_channel_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    fact = li.join(orders, li.l_orderkey == orders.o_orderkey)

    # OPTIMIZATION r15 (guide §2.3-2.4): the two channels are the
    # linenumber-parity partition of ONE fact join, and both DISTINCT
    # sets share the (customer, part) key — so the FULL OUTER JOIN of
    # the two distinct sets is exactly a per-(ck, pk) presence
    # classification. One grouped pass (presence flags per side) + one
    # scalar aggregation replaces 2 fact scans + 2 DISTINCT shuffles +
    # a full-outer sort-merge join (measured 1.70 s). Equivalence: both
    # sides are distinct on the full join key, so every output row of
    # the outer join is one distinct (ck, pk) of the union, classified
    # by which side(s) contain it — precisely max(parity flags). The
    # oracle keeps the reference's FULL OUTER spelling.
    mod2 = F.col("l_linenumber") % 2
    presence = (
        fact.groupBy(
            F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk")
        )
        .agg(
            F.max(F.when(mod2 == 0, 1).otherwise(0)).alias("in_store"),
            F.max(F.when(mod2 == 1, 1).otherwise(0)).alias("in_cat"),
        )
    )
    return presence.agg(
        F.sum(
            F.when((F.col("in_store") == 1) & (F.col("in_cat") == 0), 1).otherwise(0)
        ).cast("bigint").alias("store_only"),
        F.sum(
            F.when((F.col("in_store") == 0) & (F.col("in_cat") == 1), 1).otherwise(0)
        ).cast("bigint").alias("catalog_only"),
        F.sum(
            F.when((F.col("in_store") == 1) & (F.col("in_cat") == 1), 1).otherwise(0)
        ).cast("bigint").alias("store_and_catalog"),
    )


# --- q90 shape: ratio of two disjoint count windows --------------------------


@query(
    "tpcds_q90_band_count_ratio",
    oracle=f"""
    WITH am AS (
        SELECT COUNT(*) AS amc
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE {_SQL_DAYS} % 7 <= 2 AND l_quantity >= 25
    ),
    pm AS (
        SELECT COUNT(*) AS pmc
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE {_SQL_DAYS} % 7 >= 4 AND l_quantity >= 25
    )
    SELECT round(CAST(amc AS DOUBLE) / CAST(pmc AS DOUBLE), 6) AS am_pm_ratio
    FROM am CROSS JOIN pm
    """,
    doc="TPC-DS q90 shape (sql/presto/tpcds/q90.sql): the am/pm ratio — "
    "two independent scalar COUNT aggregations over disjoint bands of the "
    "same fact (early-week vs late-week lines above a quantity screen), "
    "cross-joined 1x1 and divided. The canonical two-scalar-subquery "
    "ratio; both counts reduce map-side.",
    tags=("tpcds", "subquery"),
)
def tpcds_q90_band_count_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    fact = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_quantity") >= 25
    )
    dow = _days() % 7
    am = fact.filter(dow <= 2).agg(F.count("*").alias("amc"))
    pm = fact.filter(dow >= 4).agg(F.count("*").alias("pmc"))
    return am.crossJoin(pm).select(
        F.round(
            F.col("amc").cast("double") / F.col("pmc").cast("double"), 6
        ).alias("am_pm_ratio")
    )


# --- q43 shape: weekday pivot per dimension row ------------------------------


def _q43_day_sql(k: int, name: str) -> str:
    return (
        f"SUM(CASE WHEN {_SQL_DAYS} % 7 = {k} THEN {SQL_DISC_PRICE} "
        f"ELSE CAST(0 AS DECIMAL(12,2)) END) AS {name}"
    )


@query(
    "tpcds_q43_weekday_pivot",
    oracle=f"""
    SELECT n_name,
           CAST({_q43_day_sql(0, "mon_sales").replace(" AS mon_sales", "")} AS DOUBLE) AS mon_sales,
           CAST({_q43_day_sql(2, "wed_sales").replace(" AS wed_sales", "")} AS DOUBLE) AS wed_sales,
           CAST({_q43_day_sql(4, "fri_sales").replace(" AS fri_sales", "")} AS DOUBLE) AS fri_sales,
           CAST({_q43_day_sql(6, "sun_sales").replace(" AS sun_sales", "")} AS DOUBLE) AS sun_sales
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY n_name
    """,
    doc="TPC-DS q43 shape (sql/presto/tpcds/q43.sql): the weekday sales "
    "pivot — one fact pass, day-of-week CASE columns summed per dimension "
    "row (nation plays store). Exact decimal sums under the pivot; "
    "dimensions broadcast; a single hash aggregate.",
    tags=("tpcds", "agg"),
)
def tpcds_q43_weekday_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    od = F.col("o_orderdate")
    dow = _days() % 7
    zero = F.lit(0).cast(PRICE)

    def day_col(k: int, name: str) -> F.Column:
        return F.sum(
            F.when(dow == k, disc_price()).otherwise(zero)
        ).cast("double").alias(name)

    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (od >= F.lit("1995-01-01").cast("timestamp"))
            & (od < F.lit("1996-01-01").cast("timestamp"))
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            day_col(0, "mon_sales"),
            day_col(2, "wed_sales"),
            day_col(4, "fri_sales"),
            day_col(6, "sun_sales"),
        )
        .orderBy("n_name")
    )


# --- q22 shape: avg-over-ROLLUP across item attribute levels -----------------


@query(
    "tpcds_q22_rollup_avg_qty",
    oracle="""
    SELECT COALESCE(p_brand, '__ALL__') AS brand,
           COALESCE(p_type, '__ALL__') AS ptype,
           CAST(GROUPING(p_brand) + GROUPING(p_type) AS INT) AS lvl,
           round(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_qty,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 25
    GROUP BY ROLLUP(p_brand, p_type)
    ORDER BY lvl, brand, ptype
    """,
    doc="TPC-DS q22 shape (sql/presto/tpcds/q22.sql): average quantity on "
    "hand over a ROLLUP of item attribute levels (brand, type play "
    "product/brand/class/category) — AVG at every prefix level plus the "
    "grand total, levels disambiguated by GROUPING(). One Expand-backed "
    "hash aggregate; the item dimension broadcasts into the fact scan.",
    tags=("tpcds", "agg", "rollup"),
)
def tpcds_q22_rollup_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    # Pre-aggregated leaves into the rollup (the q36 Expand lesson).
    base = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count("*").alias("n_leaf"), F.sum(_dec("l_quantity", QTY)).alias("s_qty"))
    )
    return (
        base.rollup("p_brand", "p_type")
        .agg(
            (F.grouping("p_brand") + F.grouping("p_type")).cast("int").alias("lvl"),
            F.round(
                F.sum("s_qty").cast("double") / F.sum("n_leaf"), 4
            ).alias("avg_qty"),
            F.sum("n_leaf").alias("n_lines"),
        )
        .select(
            F.coalesce(F.col("p_brand"), F.lit("__ALL__")).alias("brand"),
            F.coalesce(F.col("p_type"), F.lit("__ALL__")).alias("ptype"),
            "lvl", "avg_qty", "n_lines",
        )
        .orderBy("lvl", "brand", "ptype")
    )


# --- q28 shape: per-band avg / count / count-distinct scalar buckets ---------

_Q28_BANDS = ((1, 10), (11, 20), (21, 30), (31, 40), (41, 50))


def _q28_band_sql(lo: int, hi: int, i: int) -> str:
    return f"""
        SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                     / COUNT(*), 4) AS avg_price_{i},
               COUNT(*) AS cnt_{i},
               COUNT(DISTINCT l_extendedprice) AS dist_{i}
        FROM lineitem
        WHERE l_quantity BETWEEN {lo} AND {hi}
    """


@query(
    "tpcds_q28_band_distinct_buckets",
    oracle="SELECT * FROM "
    + " CROSS JOIN ".join(
        f"({_q28_band_sql(lo, hi, i)}) b{i}"
        for i, (lo, hi) in enumerate(_Q28_BANDS)
    ),
    doc="TPC-DS q28 shape (sql/presto/tpcds/q28.sql): five quantity-band "
    "buckets, each computing AVG + COUNT + COUNT(DISTINCT) over its band, "
    "cross-joined into one scalar row — the distinct-count-per-bucket "
    "variant of the q09 scalar-subquery scan. Each band is its own "
    "aggregation (no mixed distinct/object state per key, the "
    "fn_approx_agg lesson); the 1x1 cross joins are broadcast.",
    tags=("tpcds", "subquery", "agg"),
)
def tpcds_q28_band_distinct_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    out = None
    for i, (lo, hi) in enumerate(_Q28_BANDS):
        band = li.filter(F.col("l_quantity").between(lo, hi)).agg(
            F.round(
                F.sum(_dec("l_extendedprice", PRICE)).cast("double")
                / F.count("*"), 4
            ).alias(f"avg_price_{i}"),
            F.count("*").alias(f"cnt_{i}"),
            F.countDistinct("l_extendedprice").alias(f"dist_{i}"),
        )
        out = band if out is None else out.crossJoin(band)
    return out


# --- q53 shape: quarterly deviation-from-window-average screen ----------------


@query(
    "tpcds_q53_quarterly_deviation_screen",
    oracle=f"""
    WITH qsum AS (
        SELECT p_brand AS brand,
               ({_SQL_DAYS}) // 91 AS qtr,
               SUM({SQL_DISC_PRICE}) AS rev
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY p_brand, ({_SQL_DAYS}) // 91
    ),
    win AS (
        SELECT brand, qtr,
               CAST(rev AS DOUBLE) AS revd,
               CAST(SUM(rev) OVER (PARTITION BY brand) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY brand) AS brand_avg
        FROM qsum
    )
    SELECT brand, qtr, revd AS qtr_rev, round(brand_avg, 4) AS avg_rev
    FROM win
    WHERE brand_avg > 0 AND abs(revd - brand_avg) / brand_avg > 0.2
    ORDER BY brand, qtr
    """,
    doc="TPC-DS q53 shape (sql/presto/tpcds/q53.sql, also q63): quarterly "
    "revenue per brand screened by deviation from the brand's "
    "average-over-quarters window — aggregate once, one window over the "
    "small aggregate, filter on the relative deviation. The window "
    "partitions by brand so no single-partition WindowExec.",
    tags=("tpcds", "window"),
)
def tpcds_q53_quarterly_deviation_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part")
    od = F.col("o_orderdate")
    qsum = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .filter(
            (od >= F.lit("1995-01-01").cast("timestamp"))
            & (od < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.floor(_days() / 91).alias("qtr"),
        )
        .agg(F.sum(disc_price()).alias("rev"))
    )
    w = Window.partitionBy("brand")
    # window average = exact decimal window sum / count: both engines then
    # divide the SAME two exact operands, so the filter and the rounded
    # output agree bit-for-bit (round-half on an engine-drifted double was
    # the q89 failure mode). revd is an exact scale-4 decimal -> the cast
    # is deterministic; no re-round.
    win = qsum.select(
        "brand", "qtr",
        F.col("rev").cast("double").alias("revd"),
        (F.sum("rev").over(w).cast("double") / F.count("*").over(w)).alias("brand_avg"),
    )
    return (
        win.filter(
            (F.col("brand_avg") > 0)
            & (F.abs(F.col("revd") - F.col("brand_avg")) / F.col("brand_avg") > 0.2)
        )
        .select(
            "brand", "qtr",
            F.col("revd").alias("qtr_rev"),
            F.round("brand_avg", 4).alias("avg_rev"),
        )
        .orderBy("brand", "qtr")
    )


# --- q59 shape: week-over-week weekday ratios per dimension row ---------------


@query(
    "tpcds_q59_wow_weekday_ratio",
    oracle=f"""
    WITH wk AS (
        SELECT c_nationkey AS nk,
               ({_SQL_DAYS}) // 7 AS wk,
               SUM(CASE WHEN {_SQL_DAYS} % 7 = 0 THEN {_SQL_PRICE}
                        ELSE CAST(0 AS DECIMAL(12,2)) END) AS mon_s,
               SUM(CASE WHEN {_SQL_DAYS} % 7 = 3 THEN {_SQL_PRICE}
                        ELSE CAST(0 AS DECIMAL(12,2)) END) AS thu_s
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey, ({_SQL_DAYS}) // 7
    )
    SELECT n_name, y.wk AS wk,
           round(CAST(y.mon_s AS DOUBLE) / CAST(x.mon_s AS DOUBLE), 6) AS mon_ratio,
           round(CAST(y.thu_s AS DOUBLE) / CAST(x.thu_s AS DOUBLE), 6) AS thu_ratio
    FROM wk x
    JOIN wk y ON x.nk = y.nk AND y.wk = x.wk + 52
    JOIN nation ON x.nk = n_nationkey
    WHERE x.mon_s > 0 AND x.thu_s > 0 AND y.wk BETWEEN 60 AND 80
    ORDER BY n_name, wk
    """,
    doc="TPC-DS q59 shape (sql/presto/tpcds/q59.sql): week-over-week "
    "weekday ratios PER STORE (nation plays store) — the weekday pivot "
    "aggregated per (nation, week), self-joined at a 52-week offset on "
    "the composite key, ratios per weekday column. q02 does the "
    "week-offset self-join globally; this is the per-dimension variant.",
    tags=("tpcds", "join", "window"),
)
def tpcds_q59_wow_weekday_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    dow = _days() % 7
    zero = F.lit(0).cast(PRICE)
    wk = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.floor(_days() / 7).alias("wk"),
        )
        .agg(
            F.sum(F.when(dow == 0, _dec("l_extendedprice", PRICE)).otherwise(zero)).alias("mon_s"),
            F.sum(F.when(dow == 3, _dec("l_extendedprice", PRICE)).otherwise(zero)).alias("thu_s"),
        )
    )
    x = wk.withColumnsRenamed({"nk": "xnk", "wk": "xwk", "mon_s": "xmon", "thu_s": "xthu"})
    y = wk.withColumnsRenamed({"nk": "ynk", "wk": "ywk", "mon_s": "ymon", "thu_s": "ythu"})
    return (
        x.join(y, (x.xnk == y.ynk) & (y.ywk == x.xwk + 52))
        .filter((F.col("xmon") > 0) & (F.col("xthu") > 0)
                & F.col("ywk").between(60, 80))
        .join(nation, F.col("xnk") == nation.n_nationkey)
        .select(
            "n_name", F.col("ywk").alias("wk"),
            F.round(F.col("ymon").cast("double") / F.col("xmon").cast("double"), 6).alias("mon_ratio"),
            F.round(F.col("ythu").cast("double") / F.col("xthu").cast("double"), 6).alias("thu_ratio"),
        )
        .orderBy("n_name", "wk")
    )


# --- q79 shape: per-trip aggregate, best trip per customer ---------------------


@query(
    "tpcds_q79_best_trip_per_customer",
    oracle=f"""
    WITH trips AS (
        SELECT o_custkey AS ck, o_orderkey AS ok,
               SUM({SQL_DISC_PRICE}) AS trip_rev,
               COUNT(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        GROUP BY o_custkey, o_orderkey
        HAVING COUNT(*) >= 4
    ),
    ranked AS (
        SELECT ck, ok, trip_rev, n_items,
               ROW_NUMBER() OVER (PARTITION BY ck
                                  ORDER BY CAST(trip_rev AS DOUBLE) DESC, ok)
                   AS rn
        FROM trips
    )
    SELECT c_name, ok AS best_order, CAST(trip_rev AS DOUBLE) AS best_rev,
           n_items
    FROM ranked JOIN customer ON ck = c_custkey
    WHERE rn = 1 AND CAST(trip_rev AS DOUBLE) > 200000
    ORDER BY c_name
    """,
    doc="TPC-DS q79 shape (sql/presto/tpcds/q79.sql, also q68): per-TRIP "
    "(customer, order) aggregate under a dimension screen, then the best "
    "trip per customer via a partitioned row_number — the "
    "aggregate-then-top-1-per-group idiom, decorated from the customer "
    "dimension after the rank filter so only winners join.",
    tags=("tpcds", "window", "agg"),
)
def tpcds_q79_best_trip_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    cust = t(spark, sf_dir, "customer")
    trips = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("ck"), F.col("o_orderkey").alias("ok"))
        .agg(F.sum(disc_price()).alias("trip_rev"), F.count("*").alias("n_items"))
        .filter(F.col("n_items") >= 4)
    )
    w = Window.partitionBy("ck").orderBy(
        F.col("trip_rev").cast("double").desc(), F.col("ok")
    )
    ranked = trips.select(
        "ck", "ok", "trip_rev", "n_items", F.row_number().over(w).alias("rn")
    )
    return (
        ranked.filter((F.col("rn") == 1) & (F.col("trip_rev").cast("double") > 200000))
        .join(cust, F.col("ck") == cust.c_custkey)
        .select(
            "c_name", F.col("ok").alias("best_order"),
            F.col("trip_rev").cast("double").alias("best_rev"), "n_items",
        )
        .orderBy("c_name")
    )


# --- q24 shape: group totals screened by a scalar avg-of-totals ---------------


@query(
    "tpcds_q24_totals_above_scalar_avg",
    oracle=f"""
    WITH paid AS (
        SELECT o_custkey AS ck, l_partkey AS pk,
               SUM({SQL_DISC_PRICE}) AS net_paid
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag <> 'R'
        GROUP BY o_custkey, l_partkey
    )
    SELECT ck, pk, CAST(net_paid AS DOUBLE) AS net_paid
    FROM paid
    WHERE CAST(net_paid AS DOUBLE) > 3 * (
        SELECT CAST(SUM(net_paid) AS DOUBLE) / COUNT(*) FROM paid
    )
    ORDER BY ck, pk
    """,
    doc="TPC-DS q24 shape (sql/presto/tpcds/q24.sql): per-(customer, item) "
    "net-paid totals kept only when they exceed a multiple of the GLOBAL "
    "average of those same totals — an aggregate-of-aggregate scalar "
    "subquery gating the group rows. Spark: the CTE stages once "
    "(localCheckpoint-free reuse), the scalar average is a 1-row "
    "broadcast, the screen is a map-side filter.",
    tags=("tpcds", "subquery", "agg"),
)
def tpcds_q24_totals_above_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") != "R")
    orders = t(spark, sf_dir, "orders")
    paid = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk"))
        .agg(F.sum(disc_price()).alias("net_paid"))
    )
    avg1 = paid.agg(
        (F.sum("net_paid").cast("double") / F.count("*")).alias("avg_paid")
    )
    return (
        paid.crossJoin(F.broadcast(avg1))
        .filter(F.col("net_paid").cast("double") > 3 * F.col("avg_paid"))
        .select("ck", "pk", F.col("net_paid").cast("double").alias("net_paid"))
        .orderBy("ck", "pk")
    )


# --- q41 shape: dimension self-EXISTS on a shared attribute -------------------


@query(
    "tpcds_q41_dimension_self_exists",
    oracle="""
    SELECT DISTINCT p1.p_name AS p_name
    FROM part p1
    WHERE p1.p_size BETWEEN 10 AND 15
      AND EXISTS (
        SELECT 1 FROM part p2
        WHERE p2.p_brand = p1.p_brand
          AND p2.p_partkey <> p1.p_partkey
          AND p2.p_size = p1.p_size + 1
      )
    ORDER BY p_name
    LIMIT 100
    """,
    doc="TPC-DS q41 shape (sql/presto/tpcds/q41.sql): a screen computed "
    "entirely WITHIN the item dimension — items kept when a sibling of "
    "the same brand exists one size up (the reference screens on "
    "manufacturer + attribute combinations). Spark: a self semi-join on "
    "(brand, size+1) — the dimension is small, so both sides broadcast; "
    "no fact scan at all.",
    tags=("tpcds", "subquery"),
)
def tpcds_q41_dimension_self_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    p1 = part.filter(F.col("p_size").between(10, 15)).select(
        F.col("p_partkey").alias("k1"), F.col("p_name").alias("p_name"),
        F.col("p_brand").alias("b1"), F.col("p_size").alias("s1"),
    )
    p2 = part.select(
        F.col("p_partkey").alias("k2"), F.col("p_brand").alias("b2"),
        F.col("p_size").alias("s2"),
    )
    return (
        p1.join(
            p2,
            (p1.b1 == p2.b2) & (p2.s2 == p1.s1 + 1) & (p1.k1 != p2.k2),
            "semi",
        )
        .select("p_name")
        .distinct()
        .orderBy("p_name")
        .limit(100)
    )


# --- q37 shape: price-band dimension screen semi-joined to active items -------


@query(
    "tpcds_q37_price_band_active_items",
    oracle="""
    SELECT DISTINCT p_partkey AS pk, p_name, p_retailprice
    FROM part
    WHERE p_retailprice BETWEEN 940 AND 960
      AND p_partkey IN (
        SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
      )
    ORDER BY pk
    LIMIT 100
    """,
    doc="TPC-DS q37 shape (sql/presto/tpcds/q37.sql, also q82): items in a "
    "retail-price band that were actually SOLD in the window — a "
    "dimension attribute screen semi-joined against the active item set "
    "of the fact. Spark: the screened dimension broadcasts; the fact "
    "reduces to distinct partkeys before the semi-join probes it.",
    tags=("tpcds", "subquery", "join"),
)
def tpcds_q37_price_band_active_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").filter(
        F.col("p_retailprice").between(940, 960)
    )
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    active = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (od >= F.lit("1995-01-01").cast("timestamp"))
            & (od < F.lit("1995-07-01").cast("timestamp"))
        )
        .select("l_partkey")
    )
    return (
        part.join(active, part.p_partkey == F.col("l_partkey"), "semi")
        .select(F.col("p_partkey").alias("pk"), "p_name", "p_retailprice")
        .distinct()
        .orderBy("pk")
        .limit(100)
    )


# --- q72 shape: date-offset inequality join on a shared key -------------------


@query(
    "tpcds_q72_reorder_within_window",
    oracle="""
    SELECT o1.o_orderpriority AS priority,
           COUNT(*) AS n_reorders
    FROM orders o1
    JOIN orders o2
      ON o1.o_custkey = o2.o_custkey
     AND o2.o_orderdate > o1.o_orderdate
     AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 30 DAY
    WHERE o1.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o1.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o1.o_orderpriority
    ORDER BY priority
    """,
    doc="TPC-DS q72 shape (sql/presto/tpcds/q72.sql's date-offset "
    "inequality: d3.d_date > d1.d_date + 5): re-orders by the same "
    "customer within 30 days — an equi-join on the customer key carrying "
    "a date-window inequality residual. The equi-key bounds the join "
    "(orders-per-customer is the group size, not the table), so the "
    "inequality never degrades to a cartesian; pinned by plan test.",
    tags=("tpcds", "join"),
)
def tpcds_q72_reorder_within_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    o1 = orders.filter(
        (od >= F.lit("1995-01-01").cast("timestamp"))
        & (od < F.lit("1996-01-01").cast("timestamp"))
    ).select(
        F.col("o_custkey").alias("ck1"), F.col("o_orderdate").alias("d1"),
        F.col("o_orderpriority").alias("priority"),
    )
    o2 = orders.select(
        F.col("o_custkey").alias("ck2"), F.col("o_orderdate").alias("d2")
    )
    return (
        o1.join(
            o2,
            (F.col("ck1") == F.col("ck2"))
            & (F.col("d2") > F.col("d1"))
            & (F.col("d2") <= F.col("d1") + F.expr("INTERVAL 30 DAY")),
        )
        .groupBy("priority")
        .agg(F.count("*").alias("n_reorders"))
        .orderBy("priority")
    )


# --- q96 shape: multi-screen scalar count -------------------------------------


@query(
    "tpcds_q96_multi_screen_count",
    oracle=f"""
    SELECT COUNT(*) AS n_rows
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE {_SQL_DAYS} % 7 = 5
      AND l_quantity BETWEEN 20 AND 30
      AND c_mktsegment = 'BUILDING'
    """,
    doc="TPC-DS q96 shape (sql/presto/tpcds/q96.sql): a single scalar "
    "COUNT under three independent dimension screens (time band, "
    "quantity band, demographic) — the all-filters-pushed-down probe. "
    "Every screen must reach its scan; the count reduces map-side.",
    tags=("tpcds", "agg"),
)
def tpcds_q96_multi_screen_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity").between(20, 30))
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(_days() % 7 == 5)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .agg(F.count("*").alias("n_rows"))
    )


# --- q06 shape: items above their own category's average price ----------------


@query(
    "tpcds_q06_above_category_avg_buyers",
    oracle="""
    WITH cat_avg AS (
        -- exact decimal sum, ONE double division (corpus discipline: double
        -- AVG accumulates in engine-dependent order; ULP drift at the
        -- 1.02x threshold would flip items in/out of the pricey set)
        SELECT p_type,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(*) AS type_avg
        FROM part
        GROUP BY p_type
    ),
    pricey AS (
        SELECT p_partkey
        FROM part JOIN cat_avg ON part.p_type = cat_avg.p_type
        WHERE p_retailprice > 1.02 * type_avg
    )
    SELECT n_name, COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_partkey IN (SELECT p_partkey FROM pricey)
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
    GROUP BY n_name
    HAVING COUNT(*) >= 10
    ORDER BY n_lines, n_name
    """,
    doc="TPC-DS q06 shape (sql/presto/tpcds/q06.sql): customers (by "
    "nation) buying items priced above 1.02x their OWN category's average "
    "— the correlated category-average screen computed entirely inside "
    "the item dimension (window/join on p_type), then pushed into the "
    "fact as a broadcast semi-join on the surviving item ids. AVG(price) "
    "is a dimension-only aggregate, so no fact-side re-aggregation.",
    tags=("tpcds", "subquery", "join"),
)
def tpcds_q06_above_category_avg_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    w = Window.partitionBy("p_type")
    # exact decimal sum then one double division — mirrors the oracle so the
    # 1.02x threshold compares the SAME double on both engines
    type_avg = (
        F.sum(F.col("p_retailprice").cast("decimal(12,2)")).over(w).cast("double")
        / F.count("*").over(w)
    )
    pricey = (
        part.withColumn("type_avg", type_avg)
        .filter(F.col("p_retailprice") > 1.02 * F.col("type_avg"))
        .select("p_partkey")
    )
    od = F.col("o_orderdate")
    return (
        li.join(F.broadcast(pricey), li.l_partkey == F.col("p_partkey"), "semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (od >= F.lit("1995-01-01").cast("timestamp"))
            & (od < F.lit("1995-07-01").cast("timestamp"))
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_lines"))
        .filter(F.col("n_lines") >= 10)
        .orderBy("n_lines", "n_name")
    )


# --- q08 shape: INTERSECT-derived preferred-customer screen -------------------


@query(
    "tpcds_q08_intersect_screened_sales",
    oracle=f"""
    WITH preferred AS (
        SELECT c_custkey FROM customer WHERE substring(c_name, 18, 1) IN ('1', '3')
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name, CAST(SUM({_SQL_PRICE}) AS DOUBLE) AS net_sales
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_custkey IN (SELECT c_custkey FROM preferred)
    GROUP BY n_name
    ORDER BY n_name
    """,
    doc="TPC-DS q08 shape (sql/presto/tpcds/q08.sql): sales restricted to "
    "a preferred-customer set defined as the INTERSECT of two independent "
    "dimension screens (the reference intersects zip-prefix lists with "
    "high-count zips), the set then driving a broadcast semi-join into "
    "the fact. IntersectNode output feeding SemiJoinNode — a set-op/join "
    "combination no other corpus row produces.",
    tags=("tpcds", "setop", "subquery"),
)
def tpcds_q08_intersect_screened_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    a = cust.filter(
        F.substring("c_name", 18, 1).isin("1", "3")
    ).select(F.col("c_custkey").alias("pk_cust"))
    b = cust.filter(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("pk_cust")
    )
    preferred = a.intersect(b)
    # fresh column names for the decorating customer pass: `preferred`
    # shares lineage with `cust`, so unqualified c_* would be ambiguous
    cust2 = cust.select(
        F.col("c_custkey").alias("ck2"), F.col("c_nationkey").alias("nk2")
    )
    return (
        orders.join(F.broadcast(preferred), orders.o_custkey == preferred.pk_cust, "semi")
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(cust2, orders.o_custkey == cust2.ck2)
        .join(F.broadcast(nation), cust2.nk2 == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_dec("l_extendedprice", PRICE)).cast("double").alias("net_sales"))
        .orderBy("n_name")
    )


# --- q15 shape: disjunctive screen mixing dimension and measure ---------------


@query(
    "tpcds_q15_disjunctive_mixed_screen",
    oracle=f"""
    SELECT c_nationkey AS nk, CAST(SUM({_SQL_PRICE}) AS DOUBLE) AS total_sales
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE (substring(c_name, 18, 1) IN ('1', '2')
           OR c_mktsegment = 'AUTOMOBILE'
           OR l_extendedprice > 50000)
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
    GROUP BY c_nationkey
    ORDER BY nk
    """,
    doc="TPC-DS q15 shape (sql/presto/tpcds/q15.sql): the catalog-sales "
    "zip screen — a DISJUNCTION mixing two dimension predicates with a "
    "fact MEASURE predicate (zip-prefix OR state OR sale > 500), so the "
    "screen cannot push below the join and must evaluate post-join; the "
    "date window still pushes to the fact scan.",
    tags=("tpcds", "join"),
)
def tpcds_q15_disjunctive_mixed_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    od = F.col("o_orderdate")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (od >= F.lit("1995-01-01").cast("timestamp"))
            & (od < F.lit("1995-04-01").cast("timestamp"))
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(
            F.substring("c_name", 18, 1).isin("1", "2")
            | (F.col("c_mktsegment") == "AUTOMOBILE")
            | (F.col("l_extendedprice") > 50000)
        )
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.sum(_dec("l_extendedprice", PRICE)).cast("double").alias("total_sales"))
        .orderBy("nk")
    )


# --- q50 shape: two-date-role lag buckets per dimension row -------------------


@query(
    "tpcds_q50_return_lag_buckets",
    oracle=f"""
    SELECT n_name,
           CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(SUM(CASE WHEN lag_days > 30 AND lag_days <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
           CAST(SUM(CASE WHEN lag_days > 60 AND lag_days <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
           CAST(SUM(CASE WHEN lag_days > 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90plus
    FROM (
        SELECT c_nationkey,
               date_diff('day', o_orderdate, l_shipdate) AS lag_days
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    ) lagged
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    doc="TPC-DS q50 shape (sql/presto/tpcds/q50.sql): the sale-to-return "
    "lag histogram per store (nation) — the bucket variable is a date "
    "DIFFERENCE between two date roles on the joined row (order date vs "
    "ship date of the returned line), CASE-bucketed into 30-day bands. "
    "One fact pass, codegen datediff, single hash aggregate.",
    tags=("tpcds", "agg"),
)
def tpcds_q50_return_lag_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    od = F.col("o_orderdate")
    lag = F.datediff(F.col("l_shipdate"), od)

    def band(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)

    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (od >= F.lit("1995-01-01").cast("timestamp"))
            & (od < F.lit("1996-01-01").cast("timestamp"))
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            band(lag <= 30, "d30"),
            band((lag > 30) & (lag <= 60), "d60"),
            band((lag > 60) & (lag <= 90), "d90"),
            band(lag > 90, "d90plus"),
        )
        .orderBy("n_name")
    )


# --- q76 shape: null-keyed rows unioned across channels, counted --------------


def _q76_leg_sql(mod: int, tag: str) -> str:
    return f"""
        SELECT '{tag}' AS channel,
               CASE WHEN l_linenumber % 5 = 0 THEN NULL ELSE l_returnflag END
                   AS flag_key,
               {_SQL_PRICE} AS price
        FROM lineitem
        WHERE l_linenumber % 3 = {mod}
    """


@query(
    "tpcds_q76_null_key_channel_counts",
    oracle=f"""
    WITH legs AS (
        {_q76_leg_sql(0, "store")}
        UNION ALL
        {_q76_leg_sql(1, "web")}
        UNION ALL
        {_q76_leg_sql(2, "catalog")}
    )
    SELECT channel, COALESCE(flag_key, '__NULL__') AS flag_key,
           COUNT(*) AS n_rows,
           CAST(SUM(price) AS DOUBLE) AS total_price
    FROM legs
    GROUP BY channel, flag_key
    ORDER BY channel, flag_key
    """,
    doc="TPC-DS q76 shape (sql/presto/tpcds/q76.sql): the NULL-key census "
    "— each channel leg deliberately NULLs a dimension key on part of its "
    "rows (the reference counts fact rows with NULL foreign keys), the "
    "legs UNION ALL, and the aggregate groups BY the nullable key so NULL "
    "forms its own group. Grouping-on-NULL semantics must agree between "
    "engines; the output key is coalesced only for display.",
    tags=("tpcds", "setop", "agg"),
)
def tpcds_q76_null_key_channel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")

    def leg(mod: int, tag: str) -> DataFrame:
        return li.filter(F.col("l_linenumber") % 3 == mod).select(
            F.lit(tag).alias("channel"),
            F.when(F.col("l_linenumber") % 5 == 0, F.lit(None))
            .otherwise(F.col("l_returnflag")).alias("flag_key"),
            _dec("l_extendedprice", PRICE).alias("price"),
        )

    legs = leg(0, "store").unionAll(leg(1, "web")).unionAll(leg(2, "catalog"))
    return (
        legs.groupBy("channel", "flag_key")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("price").cast("double").alias("total_price"),
        )
        .select(
            "channel",
            F.coalesce(F.col("flag_key"), F.lit("__NULL__")).alias("flag_key"),
            "n_rows", "total_price",
        )
        .orderBy("channel", "flag_key")
    )


# --- q83 shape: three return aggregates equi-joined on item with a date list --

_Q83_DATES = f"""
    SELECT DISTINCT o_orderdate AS d FROM orders
    WHERE {_SQL_DAYS} % 13 = 0
"""


def _q83_leg_sql(mod: int, alias: str) -> str:
    return f"""
        SELECT l_partkey AS pk_{alias}, SUM({_SQL_QTY}) AS ret_{alias}
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R' AND l_linenumber % 3 = {mod}
          AND o_orderdate IN ({_Q83_DATES})
        GROUP BY l_partkey
    """


@query(
    "tpcds_q83_three_channel_item_returns",
    oracle=f"""
    WITH s AS ({_q83_leg_sql(0, "s")}),
         w AS ({_q83_leg_sql(1, "w")}),
         c AS ({_q83_leg_sql(2, "c")})
    SELECT pk_s AS pk,
           CAST(ret_s AS DOUBLE) AS store_returns,
           CAST(ret_w AS DOUBLE) AS web_returns,
           CAST(ret_c AS DOUBLE) AS catalog_returns,
           round(CAST(ret_s AS DOUBLE)
                 / (CAST(ret_s AS DOUBLE) + CAST(ret_w AS DOUBLE)
                    + CAST(ret_c AS DOUBLE)) * 100, 4) AS store_share
    FROM s JOIN w ON pk_s = pk_w JOIN c ON pk_s = pk_c
    ORDER BY pk
    """,
    doc="TPC-DS q83 shape (sql/presto/tpcds/q83.sql): per-item returned "
    "quantity in each of three channels — each leg screened by a DATE "
    "id-list subquery (the reference nests d_week_seq IN (...) two "
    "levels) — the three aggregates inner-joined on the item key with a "
    "per-channel share ratio. The date list is a broadcast semi-join per "
    "leg; items must appear in all three channels to survive.",
    tags=("tpcds", "subquery", "join"),
)
def tpcds_q83_three_channel_item_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = t(spark, sf_dir, "orders")
    dates = (
        orders.filter(_days() % 13 == 0)
        .select(F.col("o_orderdate").alias("d"))
        .distinct()
    )
    fact = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        F.broadcast(dates), F.col("o_orderdate") == F.col("d"), "semi"
    )

    def leg(mod: int, alias: str) -> DataFrame:
        return (
            fact.filter(F.col("l_linenumber") % 3 == mod)
            .groupBy(F.col("l_partkey").alias(f"pk_{alias}"))
            .agg(F.sum(_dec("l_quantity", QTY)).alias(f"ret_{alias}"))
        )

    s, w, c = leg(0, "s"), leg(1, "w"), leg(2, "c")
    tot = (
        F.col("ret_s").cast("double")
        + F.col("ret_w").cast("double")
        + F.col("ret_c").cast("double")
    )
    return (
        s.join(w, s.pk_s == w.pk_w)
        .join(c, s.pk_s == c.pk_c)
        .select(
            F.col("pk_s").alias("pk"),
            F.col("ret_s").cast("double").alias("store_returns"),
            F.col("ret_w").cast("double").alias("web_returns"),
            F.col("ret_c").cast("double").alias("catalog_returns"),
            F.round(F.col("ret_s").cast("double") / tot * 100, 4).alias("store_share"),
        )
        .orderBy("pk")
    )


# --- q55 shape: brand revenue top-n for one month ------------------------------


@query(
    "tpcds_q55_brand_month_topn",
    oracle=f"""
    SELECT p_brand, CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS brand_rev
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    WHERE o_orderdate >= TIMESTAMP '1995-03-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
    GROUP BY p_brand
    ORDER BY brand_rev DESC, p_brand
    LIMIT 10
    """,
    doc="TPC-DS q55 shape (sql/presto/tpcds/q55.sql, family q42/q52): "
    "brand revenue for one month, top 10 — the minimal "
    "scan-join-aggregate-topN staple. Date window pushed to the fact "
    "scan, item dim broadcast, TopNNode folds the sort+limit.",
    tags=("tpcds", "agg"),
)
def tpcds_q55_brand_month_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part")
    od = F.col("o_orderdate")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (od >= F.lit("1995-03-01").cast("timestamp"))
            & (od < F.lit("1995-04-01").cast("timestamp"))
        )
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(disc_price()).cast("double").alias("brand_rev"))
        .orderBy(F.col("brand_rev").desc(), F.col("p_brand"))
        .limit(10)
    )


# --- q07 shape: multi-measure demographic averages (flat, no rollup) ----------


@query(
    "tpcds_q07_demographic_averages",
    oracle=f"""
    SELECT p_brand,
           round(CAST(SUM({_SQL_QTY}) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           round(CAST(SUM({_SQL_PRICE}) AS DOUBLE) / COUNT(*), 6) AS avg_price,
           round(CAST(SUM(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_disc,
           round(CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) / COUNT(*), 6) AS avg_net
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN part ON l_partkey = p_partkey
    WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')
      AND o_orderpriority <> '1-URGENT'
      AND p_size < 10
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    doc="TPC-DS q07 shape (sql/presto/tpcds/q07.sql, family q26): four "
    "simultaneous averages per item under demographic + promo screens — "
    "the flat multi-measure aggregate (no rollup), each average the exact "
    "decimal sum over one shared COUNT(*). Dimension screens broadcast; "
    "one hash aggregate.",
    tags=("tpcds", "agg"),
)
def tpcds_q07_demographic_averages(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    cust = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY")
    )
    small = t(spark, sf_dir, "part").filter(F.col("p_size") < 10).select("p_partkey")
    part = t(spark, sf_dir, "part")
    n = F.count("*")
    # p_brand decorates the surviving rows; a second part read keeps the
    # lineage distinct from the semi-join's screen set
    dim = part.select(F.col("p_partkey").alias("dpk"), "p_brand")
    return (
        li.join(F.broadcast(small), li.l_partkey == small.p_partkey, "semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(dim, li.l_partkey == dim.dpk)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(_dec("l_quantity", QTY)).cast("double") / n, 6).alias("avg_qty"),
            F.round(F.sum(_dec("l_extendedprice", PRICE)).cast("double") / n, 6).alias("avg_price"),
            F.round(F.sum(_dec("l_discount", "decimal(8,2)")).cast("double") / n, 6).alias("avg_disc"),
            F.round(F.sum(disc_price()).cast("double") / n, 6).alias("avg_net"),
        )
        .orderBy("p_brand")
    )


# --- q13 shape: averages under OR-of-AND demographic bands --------------------


@query(
    "tpcds_q13_band_disjunction_averages",
    oracle=f"""
    SELECT round(CAST(SUM({_SQL_QTY}) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           round(CAST(SUM({_SQL_PRICE}) AS DOUBLE) / COUNT(*), 6) AS avg_price,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS total_net,
           COUNT(*) AS n_rows
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE (c_mktsegment = 'BUILDING' AND c_acctbal BETWEEN 100 AND 5000
           AND l_quantity BETWEEN 1 AND 20)
       OR (c_mktsegment = 'MACHINERY' AND c_acctbal BETWEEN 5000 AND 9000
           AND l_quantity BETWEEN 21 AND 35)
       OR (c_mktsegment = 'HOUSEHOLD' AND c_acctbal BETWEEN 50 AND 7000
           AND l_quantity BETWEEN 36 AND 50)
    """,
    doc="TPC-DS q13 shape (sql/presto/tpcds/q13.sql): one scalar row of "
    "averages under an OR of three AND-bands that each pair a DIMENSION "
    "band (segment, balance) with a FACT band (quantity) — the "
    "band-disjunction screen that can only evaluate post-join. Exact "
    "decimal sums over one shared count.",
    tags=("tpcds", "agg"),
)
def tpcds_q13_band_disjunction_averages(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    seg, bal, qty = F.col("c_mktsegment"), F.col("c_acctbal"), F.col("l_quantity")
    screen = (
        ((seg == "BUILDING") & bal.between(100, 5000) & qty.between(1, 20))
        | ((seg == "MACHINERY") & bal.between(5000, 9000) & qty.between(21, 35))
        | ((seg == "HOUSEHOLD") & bal.between(50, 7000) & qty.between(36, 50))
    )
    n = F.count("*")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(screen)
        .agg(
            F.round(F.sum(_dec("l_quantity", QTY)).cast("double") / n, 6).alias("avg_qty"),
            F.round(F.sum(_dec("l_extendedprice", PRICE)).cast("double") / n, 6).alias("avg_price"),
            F.sum(disc_price()).cast("double").alias("total_net"),
            n.alias("n_rows"),
        )
    )


# --- q30 shape: return share above the nation average, customer output --------


@query(
    "tpcds_q30_high_return_customers",
    oracle=f"""
    WITH ret AS (
        SELECT o_custkey AS ck, c_nationkey AS nk,
               SUM({_SQL_PRICE}) AS total_ret
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
        GROUP BY o_custkey, c_nationkey
    )
    SELECT c_name, c_mktsegment, round(c_acctbal, 2) AS acctbal,
           CAST(total_ret AS DOUBLE) AS total_ret
    FROM ret r1 JOIN customer ON r1.ck = c_custkey
    WHERE CAST(total_ret AS DOUBLE) > 1.5 * (
        SELECT CAST(SUM(total_ret) AS DOUBLE) / COUNT(*)
        FROM ret r2 WHERE r1.nk = r2.nk
    )
    ORDER BY c_name
    LIMIT 100
    """,
    doc="TPC-DS q30 shape (sql/presto/tpcds/q30.sql, family q81): "
    "customers whose returns exceed 1.5x their nation's per-customer "
    "average, decorated with FULL customer attributes after the screen — "
    "q01's correlated-average machinery with a wider output row and a "
    "higher multiplier. Spark expresses the correlated aggregate as a "
    "window over the CTE; only screen survivors join the dimension.",
    tags=("tpcds", "subquery", "window"),
)
def tpcds_q30_high_return_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    ret = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("o_custkey").alias("ck"), F.col("c_nationkey").alias("nk"))
        .agg(F.sum(_dec("l_extendedprice", PRICE)).alias("total_ret"))
    )
    w = Window.partitionBy("nk")
    screened = ret.select(
        "ck",
        F.col("total_ret").cast("double").alias("total_ret"),
        (F.sum("total_ret").over(w).cast("double") / F.count("*").over(w)).alias("nation_avg"),
    ).filter(F.col("total_ret") > 1.5 * F.col("nation_avg"))
    cust2 = cust.select(
        F.col("c_custkey").alias("ck2"), "c_name", "c_mktsegment", "c_acctbal"
    )
    return (
        screened.join(cust2, screened.ck == cust2.ck2)
        .select(
            "c_name", "c_mktsegment",
            F.round("c_acctbal", 2).alias("acctbal"), "total_ret",
        )
        .orderBy("c_name")
        .limit(100)
    )


# --- q60 shape: category id-list channel union (q56's category twin) ----------

_Q60_PIDS = "SELECT p_partkey FROM part WHERE p_type LIKE 'S%'"


def _q60_leg_sql(mod: int) -> str:
    return f"""
        SELECT l_partkey AS pk, SUM({_SQL_PRICE}) AS rev
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_linenumber % 3 = {mod}
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_partkey IN ({_Q60_PIDS})
        GROUP BY l_partkey
    """


@query(
    "tpcds_q60_category_channel_totals",
    oracle=f"""
    WITH legs AS (
        {_q60_leg_sql(0)}
        UNION ALL
        {_q60_leg_sql(1)}
        UNION ALL
        {_q60_leg_sql(2)}
    )
    SELECT pk, CAST(SUM(rev) AS DOUBLE) AS total_rev
    FROM legs
    GROUP BY pk
    ORDER BY total_rev DESC, pk
    LIMIT 100
    """,
    doc="TPC-DS q60 shape (sql/presto/tpcds/q60.sql): q56's three-channel "
    "id-list union with the CATEGORY screen (LIKE-prefix on the item "
    "type, the reference's i_category = 'Music'), a different date "
    "window, and extended-price revenue — the family twin the reference "
    "corpus itself ships. Broadcast semi per leg; one final hash agg.",
    tags=("tpcds", "setop", "subquery"),
)
def tpcds_q60_category_channel_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    pids = t(spark, sf_dir, "part").filter(
        F.col("p_type").like("S%")
    ).select("p_partkey")
    od = F.col("o_orderdate")
    fact = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        (od >= F.lit("1996-01-01").cast("timestamp"))
        & (od < F.lit("1997-01-01").cast("timestamp"))
    )

    def leg(mod: int) -> DataFrame:
        return (
            fact.filter(F.col("l_linenumber") % 3 == mod)
            .join(F.broadcast(pids), F.col("l_partkey") == F.col("p_partkey"), "semi")
            .groupBy(F.col("l_partkey").alias("pk"))
            .agg(F.sum(_dec("l_extendedprice", PRICE)).alias("rev"))
        )

    legs = leg(0).unionAll(leg(1)).unionAll(leg(2))
    return (
        legs.groupBy("pk")
        .agg(F.sum("rev").cast("double").alias("total_rev"))
        .orderBy(F.col("total_rev").desc(), F.col("pk"))
        .limit(100)
    )


# --- q74 shape: year-over-year growth with a MIN-ratio gate (q11's twin) ------


@query(
    "tpcds_q74_min_ratio_growth_gate",
    oracle=f"""
    WITH yt AS (
        SELECT o_custkey AS ck,
               EXTRACT(year FROM o_orderdate) AS yr,
               l_linenumber % 2 AS chan,
               SUM({_SQL_QTY}) AS total
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)
        GROUP BY o_custkey, EXTRACT(year FROM o_orderdate), l_linenumber % 2
    )
    SELECT s2.ck AS ck,
           round(CAST(s2.total AS DOUBLE) / CAST(s1.total AS DOUBLE), 6)
               AS store_growth,
           round(CAST(w2.total AS DOUBLE) / CAST(w1.total AS DOUBLE), 6)
               AS web_growth
    FROM yt s1 JOIN yt s2 ON s1.ck = s2.ck
    JOIN yt w1 ON s1.ck = w1.ck
    JOIN yt w2 ON s1.ck = w2.ck
    WHERE s1.chan = 0 AND s1.yr = 1995 AND s2.chan = 0 AND s2.yr = 1996
      AND w1.chan = 1 AND w1.yr = 1995 AND w2.chan = 1 AND w2.yr = 1996
      AND CAST(s1.total AS DOUBLE) > 0 AND CAST(w1.total AS DOUBLE) > 0
      AND CAST(w2.total AS DOUBLE) / CAST(w1.total AS DOUBLE)
          > CAST(s2.total AS DOUBLE) / CAST(s1.total AS DOUBLE)
    ORDER BY ck
    LIMIT 100
    """,
    doc="TPC-DS q74 shape (sql/presto/tpcds/q74.sql): q11's year-total "
    "self-join family with QUANTITY totals and the growth-comparison gate "
    "(web growth must exceed store growth) — four instances of one CTE "
    "joined on the customer key, the reference's year_total idiom. All "
    "four self-joins stay keyed on the customer key.",
    tags=("tpcds", "join", "subquery"),
)
def tpcds_q74_min_ratio_growth_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    # OPTIMIZATION r15 (guide §2.3-2.4): q04's collapse applied to q74 —
    # the four yt instances are disjoint (chan, yr) cells of one
    # aggregate, so four conditional sums in ONE pass replace 4 lineitem
    # + 4 orders scans and 3 sort-merge self-joins (measured 1.36 s).
    # A missing cell's conditional sum is NULL; requiring all four
    # IS NOT NULL is the four-way INNER join's existence condition. The
    # oracle keeps the reference's year_total repeated-CTE spelling.
    mod2 = F.col("l_linenumber") % 2
    yrc = F.year(od)

    def cell(chan: int, yr: int, alias: str):
        return F.sum(
            F.when((mod2 == chan) & (yrc == yr), _dec("l_quantity", QTY))
        ).alias(f"t_{alias}")

    sg = F.col("t_s2").cast("double") / F.col("t_s1").cast("double")
    wg = F.col("t_w2").cast("double") / F.col("t_w1").cast("double")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(yrc.isin(1995, 1996))
        .groupBy(F.col("o_custkey").alias("ck_s2"))
        .agg(
            cell(0, 1995, "s1"), cell(0, 1996, "s2"),
            cell(1, 1995, "w1"), cell(1, 1996, "w2"),
        )
        .filter(
            F.col("t_s1").isNotNull() & F.col("t_s2").isNotNull()
            & F.col("t_w1").isNotNull() & F.col("t_w2").isNotNull()
        )
        .filter(
            (F.col("t_s1").cast("double") > 0)
            & (F.col("t_w1").cast("double") > 0)
            & (wg > sg)
        )
        .select(
            F.col("ck_s2").alias("ck"),
            F.round(sg, 6).alias("store_growth"),
            F.round(wg, 6).alias("web_growth"),
        )
        .orderBy("ck")
        .limit(100)
    )


# --- q86 shape: rollup rank without a fact measure screen (q70's flat twin) ---


@query(
    "tpcds_q86_rollup_rank_within_parent",
    oracle=f"""
    WITH agg AS (
        SELECT o_orderpriority AS prio, o_orderstatus AS status,
               SUM({_SQL_PRICE}) AS total,
               GROUPING(o_orderpriority) + GROUPING(o_orderstatus)
                   AS lochierarchy,
               CASE WHEN GROUPING(o_orderstatus) = 0 THEN o_orderpriority END
                   AS rank_group
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    )
    SELECT prio, status, lochierarchy,
           CAST(total AS DOUBLE) AS total_price,
           RANK() OVER (PARTITION BY lochierarchy, rank_group
                        ORDER BY CAST(total AS DOUBLE) DESC) AS rank_within_parent
    FROM agg
    ORDER BY lochierarchy DESC, prio NULLS FIRST, status NULLS FIRST
    """,
    doc="TPC-DS q86 shape (sql/presto/tpcds/q86.sql): q36's "
    "rank-within-rollup machinery over the ORDER hierarchy "
    "(priority -> status) ranking raw totals DESC instead of a margin "
    "ratio — the flat family twin the reference ships. Pre-aggregated "
    "leaves into the rollup (the q36 Expand lesson).",
    tags=("tpcds", "rollup", "window"),
)
def tpcds_q86_rollup_rank_within_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (od >= F.lit("1995-01-01").cast("timestamp"))
            & (od < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.sum(_dec("l_extendedprice", PRICE)).alias("s_leaf"))
    )
    agg = base.rollup("o_orderpriority", "o_orderstatus").agg(
        F.sum("s_leaf").alias("total"),
        (F.grouping("o_orderpriority") + F.grouping("o_orderstatus")).alias("lochierarchy"),
        F.when(F.grouping("o_orderstatus") == 0, F.col("o_orderpriority")).alias("rank_group"),
    )
    w = Window.partitionBy("lochierarchy", "rank_group").orderBy(
        F.col("total").cast("double").desc()
    )
    return (
        agg.select(
            F.col("o_orderpriority").alias("prio"),
            F.col("o_orderstatus").alias("status"),
            "lochierarchy",
            F.col("total").cast("double").alias("total_price"),
            F.rank().over(w).alias("rank_within_parent"),
        )
        .orderBy(
            F.desc("lochierarchy"),
            F.asc_nulls_first("prio"),
            F.asc_nulls_first("status"),
        )
    )


# --- q82 shape: q37's twin with a sold-quantity HAVING band --------------------


@query(
    "tpcds_q82_band_items_qty_having",
    oracle="""
    SELECT p_partkey AS pk, p_name, p_retailprice,
           CAST(sold_qty AS DOUBLE) AS sold_qty
    FROM part
    JOIN (
        SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sold_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        GROUP BY l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) BETWEEN 100 AND 500
    ) sold ON p_partkey = l_partkey
    WHERE p_retailprice BETWEEN 920 AND 980
    ORDER BY pk
    LIMIT 100
    """,
    doc="TPC-DS q82 shape (sql/presto/tpcds/q82.sql): q37's "
    "price-band/active-items twin with the inventory quantity band — the "
    "fact aggregates sold quantity per item and a HAVING band (the "
    "reference's inv_quantity_on_hand BETWEEN 100 AND 500) gates which "
    "items join back to the screened dimension.",
    tags=("tpcds", "join", "agg"),
)
def tpcds_q82_band_items_qty_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").filter(F.col("p_retailprice").between(920, 980))
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    sold = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (od >= F.lit("1996-01-01").cast("timestamp"))
            & (od < F.lit("1996-07-01").cast("timestamp"))
        )
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_quantity", QTY)).alias("sold_qty"))
        .filter(F.col("sold_qty").between(100, 500))
    )
    return (
        part.join(sold, part.p_partkey == sold.l_partkey)
        .select(
            F.col("p_partkey").alias("pk"), "p_name", "p_retailprice",
            F.col("sold_qty").cast("double").alias("sold_qty"),
        )
        .orderBy("pk")
        .limit(100)
    )


# --- q91 shape: one-month returns by crossed demographic cells -----------------


@query(
    "tpcds_q91_monthly_return_cells",
    oracle=f"""
    SELECT c_mktsegment, o_orderpriority,
           COUNT(*) AS n_returns,
           CAST(SUM({_SQL_PRICE}) AS DOUBLE) AS returned_value
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1995-06-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
    GROUP BY c_mktsegment, o_orderpriority
    HAVING COUNT(*) >= 2
    ORDER BY returned_value DESC, c_mktsegment, o_orderpriority
    """,
    doc="TPC-DS q91 shape (sql/presto/tpcds/q91.sql): returned value for "
    "one month crossed over two demographic axes (segment x priority play "
    "marital x education), HAVING-screened and ordered by loss — the "
    "call-center returns report. One fact pass, dims broadcast.",
    tags=("tpcds", "agg"),
)
def tpcds_q91_monthly_return_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    od = F.col("o_orderdate")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (od >= F.lit("1995-06-01").cast("timestamp"))
            & (od < F.lit("1995-07-01").cast("timestamp"))
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.count("*").alias("n_returns"),
            F.sum(_dec("l_extendedprice", PRICE)).cast("double").alias("returned_value"),
        )
        .filter(F.col("n_returns") >= 2)
        .orderBy(F.col("returned_value").desc(), "c_mktsegment", "o_orderpriority")
    )


# --- q94 shape: multi-supplier EXISTS + no-returns NOT EXISTS, distinct count --


@query(
    "tpcds_q94_multi_supplier_no_returns",
    oracle=f"""
    SELECT COUNT(DISTINCT l1.l_orderkey) AS n_orders,
           CAST(SUM({SQL_DISC_PRICE.replace("l_extendedprice", "l1.l_extendedprice").replace("l_discount", "l1.l_discount")}) AS DOUBLE)
               AS net_value
    FROM lineitem l1
    JOIN orders ON l1.l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_returnflag = 'R'
      )
    """,
    doc="TPC-DS q94 shape (sql/presto/tpcds/q94.sql, family q16): order "
    "lines shipped alongside ANOTHER supplier's line (EXISTS, same order) "
    "with NO returned line anywhere in the order (NOT EXISTS) — tpch "
    "q21's correlated-pair machinery with the DS outputs: a DISTINCT "
    "order count plus net value. Spark rewrites both correlates as one "
    "per-order window pass (supplier-count + returns-count), one shuffle.",
    tags=("tpcds", "subquery", "agg"),
)
def tpcds_q94_multi_supplier_no_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    w = Window.partitionBy("l_orderkey")
    flagged = li.select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).over(w).alias("n_ret"),
    )
    return (
        flagged.filter((F.col("n_supp") >= 2) & (F.col("n_ret") == 0))
        .join(orders, flagged.l_orderkey == orders.o_orderkey)
        .filter(
            (od >= F.lit("1995-01-01").cast("timestamp"))
            & (od < F.lit("1995-04-01").cast("timestamp"))
        )
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.sum(disc_price()).cast("double").alias("net_value"),
        )
    )


# --- q99 shape: two-axis shipping-lag buckets (q62's crossed twin) -------------


@query(
    "tpcds_q99_crossed_lag_buckets",
    oracle="""
    SELECT o_orderpriority, EXTRACT(month FROM o_orderdate) AS mo,
           CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(SUM(CASE WHEN lag_days > 30 AND lag_days <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
           CAST(SUM(CASE WHEN lag_days > 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60plus
    FROM (
        SELECT o_orderpriority, o_orderdate,
               date_diff('day', o_orderdate, l_shipdate) AS lag_days
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    ) lagged
    GROUP BY o_orderpriority, EXTRACT(month FROM o_orderdate)
    ORDER BY o_orderpriority, mo
    """,
    doc="TPC-DS q99 shape (sql/presto/tpcds/q99.sql): q62's shipping-lag "
    "buckets crossed over a second axis (priority x ship month play "
    "warehouse x ship mode) — the catalog twin the reference corpus "
    "ships. Codegen datediff buckets, single hash aggregate.",
    tags=("tpcds", "agg"),
)
def tpcds_q99_crossed_lag_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    lag = F.datediff(F.col("l_shipdate"), od)

    def band(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)

    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (od >= F.lit("1995-01-01").cast("timestamp"))
            & (od < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy("o_orderpriority", F.month(od).alias("mo"))
        .agg(
            band(lag <= 30, "d30"),
            band((lag > 30) & (lag <= 60), "d60"),
            band(lag > 60, "d60plus"),
        )
        .orderBy("o_orderpriority", "mo")
    )


# --- q03 shape: brand revenue by year under a manufacturer screen --------------


@query(
    "tpcds_q03_brand_year_revenue",
    oracle=f"""
    SELECT EXTRACT(year FROM o_orderdate) AS yr, p_brand,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS brand_rev
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO' AND {_SQL_DAYS} % 7 IN (5, 6)
    GROUP BY EXTRACT(year FROM o_orderdate), p_brand
    ORDER BY yr, brand_rev DESC, p_brand
    LIMIT 100
    """,
    doc="TPC-DS q03 shape (sql/presto/tpcds/q03.sql): brand revenue per "
    "year under a manufacturer screen restricted to particular calendar "
    "days (the reference pins d_moy = 11; here weekend day-of-week "
    "slots) — the canonical star-join report. Item screen broadcast; "
    "one hash aggregate; deterministic (yr, rev DESC, brand) order.",
    tags=("tpcds", "agg"),
)
def tpcds_q03_brand_year_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter((_days() % 7).isin(5, 6))
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.year("o_orderdate").alias("yr"), F.col("p_brand"))
        .agg(F.sum(disc_price()).cast("double").alias("brand_rev"))
        .orderBy("yr", F.col("brand_rev").desc(), "p_brand")
        .limit(100)
    )


# --- q05 shape: signed sales/returns union rolled up per channel ---------------


def _q05_leg_sql(mod: int, tag: str) -> str:
    return f"""
        SELECT '{tag}' AS channel,
               CASE WHEN l_returnflag = 'R' THEN CAST(0 AS DECIMAL(12,2))
                    ELSE {_SQL_PRICE} END AS sales,
               CASE WHEN l_returnflag = 'R' THEN {_SQL_PRICE}
                    ELSE CAST(0 AS DECIMAL(12,2)) END AS returns_,
               CASE WHEN l_returnflag = 'R' THEN -{SQL_DISC_PRICE}
                    ELSE {SQL_DISC_PRICE} END AS profit
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_linenumber % 3 = {mod}
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1995-02-01 00:00:00'
    """


@query(
    "tpcds_q05_channel_profit_summary",
    oracle=f"""
    WITH legs AS (
        {_q05_leg_sql(0, "store")}
        UNION ALL
        {_q05_leg_sql(1, "web")}
        UNION ALL
        {_q05_leg_sql(2, "catalog")}
    )
    SELECT COALESCE(channel, '__ALL__') AS channel,
           CAST(SUM(sales) AS DOUBLE) AS total_sales,
           CAST(SUM(returns_) AS DOUBLE) AS total_returns,
           CAST(SUM(profit) AS DOUBLE) AS total_profit
    FROM legs
    GROUP BY ROLLUP (channel)
    ORDER BY channel
    """,
    doc="TPC-DS q05 shape (sql/presto/tpcds/q05.sql): the channel P&L — "
    "each leg emits SIGNED sales/returns/profit rows (returned lines "
    "negate profit), the legs UNION ALL, and a one-level ROLLUP adds the "
    "all-channel total. Exact decimal signed sums; pre-aggregated per "
    "channel before Expand (the q36 lesson).",
    tags=("tpcds", "setop", "rollup"),
)
def tpcds_q05_channel_profit_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    zero = F.lit(0).cast(PRICE)
    ret = F.col("l_returnflag") == "R"
    fact = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        (od >= F.lit("1995-01-01").cast("timestamp"))
        & (od < F.lit("1995-02-01").cast("timestamp"))
    )

    def leg(mod: int, tag: str) -> DataFrame:
        return fact.filter(F.col("l_linenumber") % 3 == mod).select(
            F.lit(tag).alias("channel"),
            F.when(ret, zero).otherwise(_dec("l_extendedprice", PRICE)).alias("sales"),
            F.when(ret, _dec("l_extendedprice", PRICE)).otherwise(zero).alias("returns_"),
            F.when(ret, -disc_price()).otherwise(disc_price()).alias("profit"),
        )

    legs = leg(0, "store").unionAll(leg(1, "web")).unionAll(leg(2, "catalog"))
    base = legs.groupBy("channel").agg(
        F.sum("sales").alias("s_sales"),
        F.sum("returns_").alias("s_ret"),
        F.sum("profit").alias("s_prof"),
    )
    return (
        base.rollup("channel")
        .agg(
            F.sum("s_sales").cast("double").alias("total_sales"),
            F.sum("s_ret").cast("double").alias("total_returns"),
            F.sum("s_prof").cast("double").alias("total_profit"),
        )
        .select(
            F.coalesce(F.col("channel"), F.lit("__ALL__")).alias("channel"),
            "total_sales", "total_returns", "total_profit",
        )
        .orderBy("channel")
    )


# --- q16 shape: q94's twin on another channel with a priority screen -----------


@query(
    "tpcds_q16_urgent_multi_supplier",
    oracle=f"""
    SELECT COUNT(DISTINCT l1.l_orderkey) AS n_orders,
           CAST(SUM({_SQL_QTY.replace("l_quantity", "l1.l_quantity")}) AS DOUBLE)
               AS total_qty
    FROM lineitem l1
    JOIN orders ON l1.l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_returnflag = 'R'
      )
    """,
    doc="TPC-DS q16 shape (sql/presto/tpcds/q16.sql, q94's catalog twin): "
    "the same multi-supplier EXISTS + no-returns NOT EXISTS pair under an "
    "URGENT-priority screen and a different half-year, outputting a "
    "distinct order count and total quantity. One per-order window pass "
    "replaces both correlates.",
    tags=("tpcds", "subquery", "agg"),
)
def tpcds_q16_urgent_multi_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    od = F.col("o_orderdate")
    w = Window.partitionBy("l_orderkey")
    flagged = li.select(
        "l_orderkey", "l_quantity",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).over(w).alias("n_ret"),
    )
    return (
        flagged.filter((F.col("n_supp") >= 2) & (F.col("n_ret") == 0))
        .join(orders, flagged.l_orderkey == orders.o_orderkey)
        .filter(
            (od >= F.lit("1996-01-01").cast("timestamp"))
            & (od < F.lit("1996-07-01").cast("timestamp"))
        )
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.sum(_dec("l_quantity", QTY)).cast("double").alias("total_qty"),
        )
    )


# --- q18 shape: demographic rollup of multiple exact averages ------------------


@query(
    "tpcds_q18_demographic_rollup_avgs",
    oracle=f"""
    WITH base AS (
        SELECT n_name, c_mktsegment,
               COUNT(*) AS n_leaf,
               SUM({_SQL_QTY}) AS s_qty,
               SUM({_SQL_PRICE}) AS s_price,
               SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS s_bal
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderpriority IN ('2-HIGH', '3-MEDIUM')
        GROUP BY n_name, c_mktsegment
    )
    SELECT COALESCE(n_name, '__ALL__') AS n_name,
           COALESCE(c_mktsegment, '__ALL__') AS segment,
           CAST(GROUPING(n_name) + GROUPING(c_mktsegment) AS INT) AS lvl,
           round(CAST(SUM(s_qty) AS DOUBLE) / SUM(n_leaf), 6) AS avg_qty,
           round(CAST(SUM(s_price) AS DOUBLE) / SUM(n_leaf), 6) AS avg_price,
           round(CAST(SUM(s_bal) AS DOUBLE) / SUM(n_leaf), 6) AS avg_bal
    FROM base
    GROUP BY ROLLUP (n_name, c_mktsegment)
    ORDER BY lvl, n_name, segment
    """,
    doc="TPC-DS q18 shape (sql/presto/tpcds/q18.sql): multiple exact "
    "averages rolled up the customer-geography hierarchy (nation -> "
    "segment play country/state/county) — q22's avg-over-rollup machinery "
    "with THREE simultaneous measures incl. a dimension attribute "
    "(account balance plays c_birth_year). Pre-aggregated leaves; each "
    "average is sum-of-sums over sum-of-counts.",
    tags=("tpcds", "rollup", "agg"),
)
def tpcds_q18_demographic_rollup_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("2-HIGH", "3-MEDIUM")
    )
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_leaf"),
            F.sum(_dec("l_quantity", QTY)).alias("s_qty"),
            F.sum(_dec("l_extendedprice", PRICE)).alias("s_price"),
            F.sum(_dec("c_acctbal", PRICE)).alias("s_bal"),
        )
    )
    n = F.sum("n_leaf")
    return (
        base.rollup("n_name", "c_mktsegment")
        .agg(
            (F.grouping("n_name") + F.grouping("c_mktsegment")).cast("int").alias("lvl"),
            F.round(F.sum("s_qty").cast("double") / n, 6).alias("avg_qty"),
            F.round(F.sum("s_price").cast("double") / n, 6).alias("avg_price"),
            F.round(F.sum("s_bal").cast("double") / n, 6).alias("avg_bal"),
        )
        .select(
            F.coalesce(F.col("n_name"), F.lit("__ALL__")).alias("n_name"),
            F.coalesce(F.col("c_mktsegment"), F.lit("__ALL__")).alias("segment"),
            "lvl", "avg_qty", "avg_price", "avg_bal",
        )
        .orderBy("lvl", "n_name", "segment")
    )


# --- q19 shape: cross-nation purchases (customer nation <> supplier nation) ----


@query(
    "tpcds_q19_cross_nation_brand_revenue",
    oracle=f"""
    SELECT p_brand, CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS ext_rev
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE c_nationkey <> s_nationkey
      AND p_size BETWEEN 1 AND 15
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1995-02-01 00:00:00'
    GROUP BY p_brand
    ORDER BY ext_rev DESC, p_brand
    LIMIT 100
    """,
    doc="TPC-DS q19 shape (sql/presto/tpcds/q19.sql): brand revenue from "
    "OUT-OF-AREA purchases — the reference keeps rows where the "
    "customer's zip differs from the store's (substr(ca_zip,1,5) <> "
    "s_zip); here the buyer's nation differs from the supplier's — a "
    "dimension-inequality residual on a fully equi-keyed star join.",
    tags=("tpcds", "join", "agg"),
)
def tpcds_q19_cross_nation_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part").filter(F.col("p_size").between(1, 15))
    od = F.col("o_orderdate")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (od >= F.lit("1995-01-01").cast("timestamp"))
            & (od < F.lit("1995-02-01").cast("timestamp"))
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(disc_price()).cast("double").alias("ext_rev"))
        .orderBy(F.col("ext_rev").desc(), "p_brand")
        .limit(100)
    )


# --- q42 shape: category revenue for one month across years --------------------


@query(
    "tpcds_q42_category_month_years",
    oracle=f"""
    SELECT EXTRACT(year FROM o_orderdate) AS yr, p_type,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS cat_rev
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    WHERE EXTRACT(month FROM o_orderdate) = 12
    GROUP BY EXTRACT(year FROM o_orderdate), p_type
    ORDER BY cat_rev DESC, yr, p_type
    LIMIT 100
    """,
    doc="TPC-DS q42 shape (sql/presto/tpcds/q42.sql, family q52/q55): "
    "category revenue for one calendar month across all years — the "
    "month screen prunes on a DERIVED date attribute (the reference's "
    "d_moy), so it evaluates post-scan but pre-join. Ordered by revenue "
    "with (yr, type) tiebreak.",
    tags=("tpcds", "agg"),
)
def tpcds_q42_category_month_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.month("o_orderdate") == 12)
    part = t(spark, sf_dir, "part")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.year("o_orderdate").alias("yr"), F.col("p_type"))
        .agg(F.sum(disc_price()).cast("double").alias("cat_rev"))
        .orderBy(F.col("cat_rev").desc(), "yr", "p_type")
        .limit(100)
    )


# --- q57 shape: q47's twin with the window MIN/MAX alongside the average --------


@query(
    "tpcds_q57_deviation_with_extrema",
    oracle=f"""
    WITH monthly AS (
        SELECT p_brand AS brand, EXTRACT(month FROM o_orderdate) AS mo,
               SUM({_SQL_PRICE}) AS rev
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE EXTRACT(year FROM o_orderdate) = 1996
        GROUP BY p_brand, EXTRACT(month FROM o_orderdate)
    ),
    win AS (
        SELECT brand, mo, CAST(rev AS DOUBLE) AS revd,
               CAST(SUM(rev) OVER (PARTITION BY brand) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY brand) AS brand_avg,
               MIN(CAST(rev AS DOUBLE)) OVER (PARTITION BY brand) AS brand_min,
               MAX(CAST(rev AS DOUBLE)) OVER (PARTITION BY brand) AS brand_max
        FROM monthly
    )
    SELECT brand, mo, revd AS month_rev,
           round(brand_avg, 4) AS avg_rev,
           brand_max - brand_min AS rev_spread
    FROM win
    WHERE brand_avg > 0 AND revd < 0.85 * brand_avg
    ORDER BY brand, mo
    """,
    doc="TPC-DS q57 shape (sql/presto/tpcds/q57.sql, q47's catalog twin): "
    "months whose revenue fell below 85% of the brand's average "
    "(calibrated: monthly deviations smooth toward 1.0 as SF grows), "
    "reporting the brand's min/max spread from TWO more windows over the "
    "same partition — the multi-window-one-partition idiom (one Window "
    "node computes all three).",
    tags=("tpcds", "window"),
)
def tpcds_q57_deviation_with_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1996)
    part = t(spark, sf_dir, "part")
    monthly = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.month("o_orderdate").alias("mo"))
        .agg(F.sum(_dec("l_extendedprice", PRICE)).alias("rev"))
    )
    w = Window.partitionBy("brand")
    revd = F.col("rev").cast("double")
    # exact decimal window sum / count (the q89 round-half lesson);
    # min/max/spread of exact decimals cast to double are deterministic
    win = monthly.select(
        "brand", "mo", revd.alias("revd"),
        (F.sum("rev").over(w).cast("double") / F.count("*").over(w)).alias("brand_avg"),
        F.min(revd).over(w).alias("brand_min"),
        F.max(revd).over(w).alias("brand_max"),
    )
    return (
        win.filter((F.col("brand_avg") > 0) & (F.col("revd") < 0.85 * F.col("brand_avg")))
        .select(
            "brand", "mo",
            F.col("revd").alias("month_rev"),
            F.round("brand_avg", 4).alias("avg_rev"),
            (F.col("brand_max") - F.col("brand_min")).alias("rev_spread"),
        )
        .orderBy("brand", "mo")
    )


# --- q71 shape: three-channel brand revenue by time bucket ---------------------


def _q71_leg_sql(mod: int) -> str:
    return f"""
        SELECT l_partkey, {_SQL_DAYS} % 7 AS dow, {_SQL_PRICE} AS price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_linenumber % 3 = {mod}
          AND EXTRACT(year FROM o_orderdate) = 1995
          AND EXTRACT(month FROM o_orderdate) = 6
    """


@query(
    "tpcds_q71_brand_time_buckets",
    oracle=f"""
    WITH legs AS (
        {_q71_leg_sql(0)}
        UNION ALL
        {_q71_leg_sql(1)}
        UNION ALL
        {_q71_leg_sql(2)}
    )
    SELECT p_brand, dow, CAST(SUM(price) AS DOUBLE) AS rev
    FROM legs JOIN part ON l_partkey = p_partkey
    WHERE p_size > 40
    GROUP BY p_brand, dow
    ORDER BY rev DESC, p_brand, dow
    LIMIT 100
    """,
    doc="TPC-DS q71 shape (sql/presto/tpcds/q71.sql): brand revenue by "
    "TIME BUCKET (day-of-week plays the breakfast/dinner hour bands) "
    "across three channel legs UNION ALL'd BEFORE the item join — the "
    "union-then-join order the reference uses, with the time dimension "
    "joined after the union.",
    tags=("tpcds", "setop", "agg"),
)
def tpcds_q71_brand_time_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        (F.year("o_orderdate") == 1995) & (F.month("o_orderdate") == 6)
    )
    part = t(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    fact = li.join(orders, li.l_orderkey == orders.o_orderkey)

    def leg(mod: int) -> DataFrame:
        return fact.filter(F.col("l_linenumber") % 3 == mod).select(
            "l_partkey", (_days() % 7).alias("dow"),
            _dec("l_extendedprice", PRICE).alias("price"),
        )

    legs = leg(0).unionAll(leg(1)).unionAll(leg(2))
    return (
        legs.join(part, legs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "dow")
        .agg(F.sum("price").cast("double").alias("rev"))
        .orderBy(F.col("rev").desc(), "p_brand", "dow")
        .limit(100)
    )


# --- q77 shape: per-channel sales vs returns FULL OUTER, rolled up --------------


def _q77_sales_sql(mod: int, tag: str) -> str:
    return f"""
        SELECT '{tag}' AS channel, l_partkey % 10 AS grp,
               SUM({_SQL_PRICE}) AS sales
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag <> 'R' AND l_linenumber % 2 = {mod}
        GROUP BY l_partkey % 10
    """


def _q77_ret_sql(mod: int, tag: str) -> str:
    return f"""
        SELECT '{tag}' AS channel, l_partkey % 10 AS grp,
               SUM({_SQL_PRICE}) AS returns_
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R' AND l_linenumber % 2 = {mod}
        GROUP BY l_partkey % 10
    """


@query(
    "tpcds_q77_channel_pnl_rollup",
    oracle=f"""
    WITH s0 AS ({_q77_sales_sql(0, "store")}), r0 AS ({_q77_ret_sql(0, "store")}),
         s1 AS ({_q77_sales_sql(1, "web")}), r1 AS ({_q77_ret_sql(1, "web")}),
    joined AS (
        SELECT s0.channel, s0.grp,
               s0.sales AS sales,
               COALESCE(r0.returns_, CAST(0 AS DECIMAL(12,2))) AS returns_
        FROM s0 LEFT JOIN r0 ON s0.grp = r0.grp
        UNION ALL
        SELECT s1.channel, s1.grp, s1.sales,
               COALESCE(r1.returns_, CAST(0 AS DECIMAL(12,2)))
        FROM s1 LEFT JOIN r1 ON s1.grp = r1.grp
    )
    SELECT COALESCE(channel, '__ALL__') AS channel,
           CAST(GROUPING(channel) + GROUPING(grp) AS INT) AS lvl,
           COALESCE(CAST(grp AS VARCHAR), '__ALL__') AS grp,
           CAST(SUM(sales) AS DOUBLE) AS total_sales,
           CAST(SUM(returns_) AS DOUBLE) AS total_returns
    FROM joined
    GROUP BY ROLLUP (channel, grp)
    ORDER BY lvl, channel, grp
    """,
    doc="TPC-DS q77 shape (sql/presto/tpcds/q77.sql): per-channel P&L — "
    "each channel's sales aggregate LEFT JOINs its returns aggregate on "
    "the group key (returns may be absent -> COALESCE 0), channels UNION "
    "ALL, and a two-level ROLLUP adds channel and grand totals. "
    "Aggregate-join-union-rollup in one plan.",
    tags=("tpcds", "rollup", "join", "setop"),
)
def tpcds_q77_channel_pnl_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    fact = li.join(orders, li.l_orderkey == orders.o_orderkey)
    zero = F.lit(0).cast(PRICE)

    def chan(mod: int, tag: str) -> DataFrame:
        sales = (
            fact.filter((F.col("l_returnflag") != "R") & (F.col("l_linenumber") % 2 == mod))
            .groupBy((F.col("l_partkey") % 10).alias("grp"))
            .agg(F.sum(_dec("l_extendedprice", PRICE)).alias("sales"))
        )
        rets = (
            fact.filter((F.col("l_returnflag") == "R") & (F.col("l_linenumber") % 2 == mod))
            .groupBy((F.col("l_partkey") % 10).alias("rgrp"))
            .agg(F.sum(_dec("l_extendedprice", PRICE)).alias("returns_"))
        )
        return sales.join(rets, sales.grp == rets.rgrp, "left").select(
            F.lit(tag).alias("channel"), "grp", "sales",
            F.coalesce(F.col("returns_"), zero).alias("returns_"),
        )

    joined = chan(0, "store").unionAll(chan(1, "web"))
    return (
        joined.rollup("channel", "grp")
        .agg(
            (F.grouping("channel") + F.grouping("grp")).cast("int").alias("lvl"),
            F.sum("sales").cast("double").alias("total_sales"),
            F.sum("returns_").cast("double").alias("total_returns"),
        )
        .select(
            F.coalesce(F.col("channel"), F.lit("__ALL__")).alias("channel"),
            "lvl",
            F.coalesce(F.col("grp").cast("string"), F.lit("__ALL__")).alias("grp"),
            "total_sales", "total_returns",
        )
        .orderBy("lvl", "channel", "grp")
    )


# --- q85 shape: tiered reason bands with per-band averages ----------------------


@query(
    "tpcds_q85_reason_band_averages",
    oracle=f"""
    SELECT o_orderpriority AS reason,
           round(CAST(SUM({_SQL_QTY}) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           round(CAST(SUM(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_disc,
           round(CAST(SUM({_SQL_PRICE}) AS DOUBLE) / COUNT(*), 6) AS avg_price
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag = 'R'
      AND ((c_mktsegment = 'BUILDING' AND l_quantity BETWEEN 1 AND 25)
        OR (c_mktsegment = 'AUTOMOBILE' AND l_quantity BETWEEN 26 AND 50))
      AND ((c_acctbal BETWEEN 0 AND 5000 AND l_discount <= 0.05)
        OR (c_acctbal BETWEEN 5000 AND 10000 AND l_discount > 0.05))
    GROUP BY o_orderpriority
    ORDER BY reason
    """,
    doc="TPC-DS q85 shape (sql/presto/tpcds/q85.sql): returned lines under "
    "TWO stacked band disjunctions (demographic x quantity AND "
    "balance x discount play marital/education x sales_price and "
    "income band x fee), averaged per return reason (priority plays "
    "r_reason_desc). The conjunction of disjunctions evaluates post-join.",
    tags=("tpcds", "agg"),
)
def tpcds_q85_reason_band_averages(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    seg, qty = F.col("c_mktsegment"), F.col("l_quantity")
    bal, disc = F.col("c_acctbal"), F.col("l_discount")
    band1 = ((seg == "BUILDING") & qty.between(1, 25)) | (
        (seg == "AUTOMOBILE") & qty.between(26, 50)
    )
    band2 = (bal.between(0, 5000) & (disc <= 0.05)) | (
        bal.between(5000, 10000) & (disc > 0.05)
    )
    n = F.count("*")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(band1 & band2)
        .groupBy(F.col("o_orderpriority").alias("reason"))
        .agg(
            F.round(F.sum(_dec("l_quantity", QTY)).cast("double") / n, 6).alias("avg_qty"),
            F.round(F.sum(_dec("l_discount", "decimal(8,2)")).cast("double") / n, 6).alias("avg_disc"),
            F.round(F.sum(_dec("l_extendedprice", PRICE)).cast("double") / n, 6).alias("avg_price"),
        )
        .orderBy("reason")
    )


# --- q12/q20 shapes: revenue share within class over a 30-day window -----------


def _q12_sql(mod3: int, start: str, end: str, dialect_days: str) -> str:
    return f"""
    WITH sold AS (
        SELECT p_type, p_brand, {_SQL_PRICE} AS price
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE l_linenumber % 3 = {mod3}
          AND o_orderdate >= TIMESTAMP '{start} 00:00:00'
          AND o_orderdate < TIMESTAMP '{end} 00:00:00'
    ),
    agg AS (
        SELECT p_type, p_brand, SUM(price) AS rev
        FROM sold GROUP BY p_type, p_brand
    )
    SELECT p_type, p_brand, CAST(rev AS DOUBLE) AS brand_rev,
           round(CAST(rev AS DOUBLE) * 100
                 / SUM(CAST(rev AS DOUBLE)) OVER (PARTITION BY p_type), 6)
               AS revenue_share
    FROM agg
    ORDER BY p_type, revenue_share DESC, p_brand
    """


@query(
    "tpcds_q12_web_class_share",
    oracle=_q12_sql(1, "1995-05-01", "1995-05-31", "duck"),
    doc="TPC-DS q12 shape (sql/presto/tpcds/q12.sql, q98's web twin): "
    "brand revenue share within its class over a 30-day window on the "
    "web channel — aggregate once, one share window per class partition.",
    tags=("tpcds", "window"),
)
def tpcds_q12_web_class_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q12_impl(spark, sf_dir, 1, "1995-05-01", "1995-05-31")


@query(
    "tpcds_q20_catalog_class_share",
    oracle=_q12_sql(2, "1996-02-01", "1996-03-02", "duck"),
    doc="TPC-DS q20 shape (sql/presto/tpcds/q20.sql, q98's catalog twin): "
    "the same class-share window on the catalog channel over a different "
    "30-day window.",
    tags=("tpcds", "window"),
)
def tpcds_q20_catalog_class_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q12_impl(spark, sf_dir, 2, "1996-02-01", "1996-03-02")


def _q12_impl(spark, sf_dir, mod3, start, end):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") % 3 == mod3)
    orders = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part")
    od = F.col("o_orderdate")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (od >= F.lit(start).cast("timestamp"))
            & (od < F.lit(end).cast("timestamp"))
        )
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_brand")
        .agg(F.sum(_dec("l_extendedprice", PRICE)).alias("rev"))
    )
    w = Window.partitionBy("p_type")
    revd = F.col("rev").cast("double")
    return (
        agg.select(
            "p_type", "p_brand", revd.alias("brand_rev"),
            F.round(revd * 100 / F.sum(revd).over(w), 6).alias("revenue_share"),
        )
        .orderBy("p_type", F.col("revenue_share").desc(), "p_brand")
    )


# --- q26 shape: q07's catalog twin ---------------------------------------------


@query(
    "tpcds_q26_catalog_demographic_averages",
    oracle=f"""
    SELECT p_brand,
           round(CAST(SUM({_SQL_QTY}) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           round(CAST(SUM({_SQL_PRICE}) AS DOUBLE) / COUNT(*), 6) AS avg_price,
           round(CAST(SUM(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_disc,
           round(CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) / COUNT(*), 6) AS avg_net
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN part ON l_partkey = p_partkey
    WHERE c_mktsegment = 'HOUSEHOLD'
      AND o_orderpriority = '5-LOW'
      AND p_size >= 25
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    doc="TPC-DS q26 shape (sql/presto/tpcds/q26.sql, q07's catalog twin): "
    "the same four-average aggregate under a single-segment, low-priority, "
    "large-item screen.",
    tags=("tpcds", "agg"),
)
def tpcds_q26_catalog_demographic_averages(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "5-LOW")
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "HOUSEHOLD")
    part = t(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    n = F.count("*")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(_dec("l_quantity", QTY)).cast("double") / n, 6).alias("avg_qty"),
            F.round(F.sum(_dec("l_extendedprice", PRICE)).cast("double") / n, 6).alias("avg_price"),
            F.round(F.sum(_dec("l_discount", "decimal(8,2)")).cast("double") / n, 6).alias("avg_disc"),
            F.round(F.sum(disc_price()).cast("double") / n, 6).alias("avg_net"),
        )
        .orderBy("p_brand")
    )


# --- q32 shape: q92's catalog twin (excess discount over a window) -------------


@query(
    "tpcds_q32_catalog_excess_discount",
    oracle=f"""
    WITH win AS (
        SELECT l_partkey AS pk, CAST(l_discount AS DOUBLE) AS disc,
               CAST(l_discount AS DECIMAL(4,2)) AS disc_d,
               {_SQL_PRICE} AS price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_linenumber % 3 = 2
          AND o_orderdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-05-30 00:00:00'
    ),
    -- exact decimal sum, ONE double division (double AVG order drifts
    -- between engines; ULP drift at the 1.3x threshold flips rows)
    avg_disc AS (
        SELECT pk, CAST(SUM(disc_d) AS DOUBLE) / COUNT(*) AS ad
        FROM win GROUP BY pk
    )
    SELECT CAST(SUM(price) AS DOUBLE) AS excess_revenue
    FROM win JOIN avg_disc ON win.pk = avg_disc.pk
    WHERE disc > 1.3 * ad
    """,
    doc="TPC-DS q32 shape (sql/presto/tpcds/q32.sql, q92's catalog twin): "
    "revenue from lines discounted over 1.3x their item's window-average "
    "discount, on the catalog channel over a 90-day window — the "
    "correlated-average excess screen as an aggregate-join.",
    tags=("tpcds", "subquery", "agg"),
)
def tpcds_q32_catalog_excess_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") % 3 == 2)
    orders = t(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    win = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (od >= F.lit("1996-03-01").cast("timestamp"))
            & (od < F.lit("1996-05-30").cast("timestamp"))
        )
        .select(
            F.col("l_partkey").alias("pk"),
            F.col("l_discount").cast("double").alias("disc"),
            F.col("l_discount").cast("decimal(4,2)").alias("disc_d"),
            _dec("l_extendedprice", PRICE).alias("price"),
        )
    )
    w = Window.partitionBy("pk")
    # exact decimal sum then one double division, mirroring the oracle
    ad = F.sum("disc_d").over(w).cast("double") / F.count("*").over(w)
    return (
        win.withColumn("ad", ad)
        .filter(F.col("disc") > 1.3 * F.col("ad"))
        .agg(F.sum("price").cast("double").alias("excess_revenue"))
    )


# --- q52 shape: q42/q55 family — one brand-month report sorted by revenue ------


@query(
    "tpcds_q52_brand_month_report",
    oracle=f"""
    SELECT EXTRACT(year FROM o_orderdate) AS yr, p_brand,
           CAST(SUM({_SQL_PRICE}) AS DOUBLE) AS ext_price
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    WHERE EXTRACT(month FROM o_orderdate) = 11
      AND EXTRACT(year FROM o_orderdate) = 1997
    GROUP BY EXTRACT(year FROM o_orderdate), p_brand
    ORDER BY ext_price DESC, p_brand
    LIMIT 100
    """,
    doc="TPC-DS q52 shape (sql/presto/tpcds/q52.sql, family q42/q55): "
    "one brand-month revenue report (extended price, not discounted) "
    "pinned to a single month+year, ordered by revenue.",
    tags=("tpcds", "agg"),
)
def tpcds_q52_brand_month_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        (F.month("o_orderdate") == 11) & (F.year("o_orderdate") == 1997)
    )
    part = t(spark, sf_dir, "part")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.year("o_orderdate").alias("yr"), F.col("p_brand"))
        .agg(F.sum(_dec("l_extendedprice", PRICE)).cast("double").alias("ext_price"))
        .orderBy(F.col("ext_price").desc(), "p_brand")
        .limit(100)
    )


# --- q63 shape: q53's manager twin over a CASE-defined item cohort -------------


@query(
    "tpcds_q63_cohort_monthly_deviation",
    oracle=f"""
    WITH msum AS (
        SELECT CASE WHEN p_size < 20 THEN 'small' ELSE 'large' END AS cohort,
               EXTRACT(month FROM o_orderdate) AS mo,
               SUM({SQL_DISC_PRICE}) AS rev
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE EXTRACT(year FROM o_orderdate) = 1995
          AND p_type IN ('STANDARD', 'PROMO', 'ECONOMY')
        GROUP BY CASE WHEN p_size < 20 THEN 'small' ELSE 'large' END,
                 EXTRACT(month FROM o_orderdate)
    ),
    win AS (
        SELECT cohort, mo, CAST(rev AS DOUBLE) AS revd,
               CAST(SUM(rev) OVER (PARTITION BY cohort) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY cohort) AS cohort_avg
        FROM msum
    )
    SELECT cohort, mo, revd AS month_rev,
           round(cohort_avg, 4) AS avg_rev
    FROM win
    WHERE cohort_avg > 0 AND abs(revd - cohort_avg) / cohort_avg > 0.05
    ORDER BY cohort, mo
    """,
    doc="TPC-DS q63 shape (sql/presto/tpcds/q63.sql, q53's manager twin): "
    "monthly revenue deviation for a CASE-DEFINED item cohort (the "
    "reference's manager buckets are CASE over brand/class) against the "
    "cohort's average-over-months window.",
    tags=("tpcds", "window"),
)
def tpcds_q63_cohort_monthly_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    part = t(spark, sf_dir, "part").filter(
        F.col("p_type").isin("STANDARD", "PROMO", "ECONOMY")
    )
    cohort = F.when(F.col("p_size") < 20, "small").otherwise("large")
    msum = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy(cohort.alias("cohort"), F.month("o_orderdate").alias("mo"))
        .agg(F.sum(disc_price()).alias("rev"))
    )
    w = Window.partitionBy("cohort")
    revd = F.col("rev").cast("double")
    return (
        msum.select(
            "cohort", "mo", revd.alias("revd"),
            (F.sum("rev").over(w).cast("double") / F.count("*").over(w)).alias("cohort_avg"),
        )
        .filter(
            (F.col("cohort_avg") > 0)
            & (F.abs(F.col("revd") - F.col("cohort_avg")) / F.col("cohort_avg") > 0.05)
        )
        .select(
            "cohort", "mo",
            F.col("revd").alias("month_rev"),
            F.round("cohort_avg", 4).alias("avg_rev"),
        )
        .orderBy("cohort", "mo")
    )


# --- q68 shape: q46's twin with two per-trip measures ---------------------------


@query(
    "tpcds_q68_trip_two_measures",
    oracle=f"""
    WITH trips AS (
        SELECT o_custkey AS ck, o_orderkey AS ok,
               SUM({_SQL_PRICE}) AS ext_total,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(l_discount AS DECIMAL(4,2))) AS disc_total
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority IN ('3-MEDIUM', '4-NOT SPECIFIED')
        GROUP BY o_custkey, o_orderkey
        HAVING COUNT(*) BETWEEN 5 AND 7
    )
    SELECT c_name, ok AS order_id,
           CAST(ext_total AS DOUBLE) AS ext_total,
           CAST(disc_total AS DOUBLE) AS disc_total
    FROM trips JOIN customer ON ck = c_custkey
    ORDER BY c_name, ok
    LIMIT 100
    """,
    doc="TPC-DS q68 shape (sql/presto/tpcds/q68.sql, q46's twin): per-trip "
    "(customer, order) totals of TWO measures (extended price and "
    "discount amount play list price and coupon amount) under an "
    "item-count cohort band, decorated from the customer dimension — the "
    "trip-report staple.",
    tags=("tpcds", "agg", "join"),
)
def tpcds_q68_trip_two_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("3-MEDIUM", "4-NOT SPECIFIED")
    )
    cust = t(spark, sf_dir, "customer")
    disc_amt = _dec("l_extendedprice", PRICE) * _dec("l_discount", FRAC)
    trips = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("ck"), F.col("o_orderkey").alias("ok"))
        .agg(
            F.sum(_dec("l_extendedprice", PRICE)).alias("ext_total"),
            F.sum(disc_amt).alias("disc_total"),
            F.count("*").alias("n_items"),
        )
        .filter(F.col("n_items").between(5, 7))
    )
    return (
        trips.join(cust, trips.ck == cust.c_custkey)
        .select(
            "c_name", F.col("ok").alias("order_id"),
            F.col("ext_total").cast("double").alias("ext_total"),
            F.col("disc_total").cast("double").alias("disc_total"),
        )
        .orderBy("c_name", "order_id")
        .limit(100)
    )


# --- q73 shape: q34's twin with a lower item-count band -------------------------


@query(
    "tpcds_q73_small_basket_cohort",
    oracle="""
    WITH baskets AS (
        SELECT o_custkey AS ck, o_orderkey AS ok, COUNT(*) AS item_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '2-HIGH'
        GROUP BY o_custkey, o_orderkey
        HAVING COUNT(*) BETWEEN 1 AND 3
    )
    SELECT c_name, item_count, ok AS o_orderkey
    FROM baskets JOIN customer ON ck = c_custkey
    ORDER BY c_name, o_orderkey
    LIMIT 100
    """,
    doc="TPC-DS q73 shape (sql/presto/tpcds/q73.sql, q34's twin): the "
    "SMALL-basket cohort (1-3 items vs q34's bulk band) under a "
    "single-priority screen, buyers decorated after the HAVING.",
    tags=("tpcds", "agg", "join"),
)
def tpcds_q73_small_basket_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "2-HIGH")
    cust = t(spark, sf_dir, "customer")
    baskets = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("ck"), F.col("o_orderkey").alias("ok"))
        .agg(F.count("*").alias("item_count"))
        .filter(F.col("item_count").between(1, 3))
    )
    return (
        baskets.join(cust, baskets.ck == cust.c_custkey)
        .select("c_name", "item_count", F.col("ok").alias("o_orderkey"))
        .orderBy("c_name", "o_orderkey")
        .limit(100)
    )


# --- q81 shape: q30's catalog twin with a balance decoration --------------------


@query(
    "tpcds_q81_catalog_high_returners",
    oracle=f"""
    WITH ret AS (
        SELECT o_custkey AS ck, c_nationkey AS nk,
               SUM({_SQL_QTY}) AS ret_qty
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R' AND l_linenumber % 3 = 2
        GROUP BY o_custkey, c_nationkey
    )
    SELECT c_name, n_name, CAST(ret_qty AS DOUBLE) AS ret_qty
    FROM ret r1
    JOIN customer ON r1.ck = c_custkey
    JOIN nation ON r1.nk = n_nationkey
    WHERE CAST(ret_qty AS DOUBLE) > 1.2 * (
        SELECT CAST(SUM(ret_qty) AS DOUBLE) / COUNT(*)
        FROM ret r2 WHERE r1.nk = r2.nk
    )
    ORDER BY c_name
    LIMIT 100
    """,
    doc="TPC-DS q81 shape (sql/presto/tpcds/q81.sql, q30's catalog twin): "
    "catalog-channel returned QUANTITY above 1.2x the nation's "
    "per-customer average, decorated with the nation name — the "
    "correlated-average screen expressed as a window, survivors joined "
    "to two dimensions.",
    tags=("tpcds", "subquery", "window"),
)
def tpcds_q81_catalog_high_returners(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_returnflag") == "R") & (F.col("l_linenumber") % 3 == 2)
    )
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    ret = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("o_custkey").alias("ck"), F.col("c_nationkey").alias("nk"))
        .agg(F.sum(_dec("l_quantity", QTY)).alias("ret_qty"))
    )
    w = Window.partitionBy("nk")
    screened = ret.select(
        "ck", "nk",
        F.col("ret_qty").cast("double").alias("ret_qty"),
        (F.sum("ret_qty").over(w).cast("double") / F.count("*").over(w)).alias("nation_avg"),
    ).filter(F.col("ret_qty") > 1.2 * F.col("nation_avg"))
    cust2 = cust.select(F.col("c_custkey").alias("ck2"), "c_name")
    return (
        screened.join(cust2, screened.ck == cust2.ck2)
        .join(F.broadcast(nation), screened.nk == nation.n_nationkey)
        .select("c_name", "n_name", "ret_qty")
        .orderBy("c_name")
        .limit(100)
    )


# --- q84 shape: chained dimension decode under an attribute band ----------------


@query(
    "tpcds_q84_customer_band_decode",
    oracle="""
    SELECT c_custkey AS ck, c_name, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE c_acctbal BETWEEN 4000 AND 4500
      AND c_mktsegment = 'FURNITURE'
    ORDER BY ck
    LIMIT 100
    """,
    doc="TPC-DS q84 shape (sql/presto/tpcds/q84.sql): pure dimension "
    "decode — customers in an income band (account balance plays the "
    "income-band range) resolved through the chained geography dims "
    "(customer -> nation -> region play household -> address -> income "
    "band). No fact scan; every join broadcasts.",
    tags=("tpcds", "join"),
)
def tpcds_q84_customer_band_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(
        F.col("c_acctbal").between(4000, 4500)
        & (F.col("c_mktsegment") == "FURNITURE")
    )
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(F.col("c_custkey").alias("ck"), "c_name", "n_name", "r_name")
        .orderBy("ck")
        .limit(100)
    )


# --- q89 shape: crossed-axis monthly deviation ----------------------------------


@query(
    "tpcds_q89_crossed_monthly_deviation",
    oracle=f"""
    WITH msum AS (
        SELECT p_type, c_mktsegment AS segment,
               EXTRACT(month FROM o_orderdate) AS mo,
               SUM({SQL_DISC_PRICE}) AS rev
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN part ON l_partkey = p_partkey
        WHERE EXTRACT(year FROM o_orderdate) = 1996
        GROUP BY p_type, c_mktsegment, EXTRACT(month FROM o_orderdate)
    ),
    win AS (
        SELECT p_type, segment, mo, CAST(rev AS DOUBLE) AS revd,
               CAST(SUM(rev) OVER (PARTITION BY p_type, segment) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY p_type, segment) AS cell_avg
        FROM msum
    )
    SELECT p_type, segment, mo, revd AS month_rev,
           round(cell_avg, 4) AS avg_rev
    FROM win
    WHERE cell_avg > 0 AND abs(revd - cell_avg) / cell_avg > 0.2
    ORDER BY p_type, segment, mo
    """,
    doc="TPC-DS q89 shape (sql/presto/tpcds/q89.sql): monthly deviation "
    "over a CROSSED partition (item class x customer segment play "
    "category/brand x store) — the q53 family with a two-axis window "
    "partition and a within-year month series.",
    tags=("tpcds", "window"),
)
def tpcds_q89_crossed_monthly_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1996)
    cust = t(spark, sf_dir, "customer")
    part = t(spark, sf_dir, "part")
    msum = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy(
            "p_type", F.col("c_mktsegment").alias("segment"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(F.sum(disc_price()).alias("rev"))
    )
    w = Window.partitionBy("p_type", "segment")
    revd = F.col("rev").cast("double")
    return (
        msum.select(
            "p_type", "segment", "mo", revd.alias("revd"),
            (F.sum("rev").over(w).cast("double") / F.count("*").over(w)).alias("cell_avg"),
        )
        .filter(
            (F.col("cell_avg") > 0)
            & (F.abs(F.col("revd") - F.col("cell_avg")) / F.col("cell_avg") > 0.2)
        )
        .select(
            "p_type", "segment", "mo",
            F.col("revd").alias("month_rev"),
            F.round("cell_avg", 4).alias("avg_rev"),
        )
        .orderBy("p_type", "segment", "mo")
    )
