"""Generator-connector queries: the ``tpchgen`` DataSource end-to-end.

The reference's ``presto-tpch`` connector generates rows lazily per split
(TpchConnectorFactory.java:35, LazyRecordPageSource.java); these rows run
the same machinery through Spark 4's Python DataSource API
(sources/tpch_datasource.py) and value-check it against a DuckDB oracle
that REGENERATES the identical rows from ``generate_series`` — the
generator's determinism contract is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query

_ROWS = 10_000

# The exact integer row hash shared with sources/tpch_datasource.py._h —
# both mod-2^32 products stay within int64/int128 in either engine.
_ORACLE = f"""
WITH g AS (
    SELECT i, (i * 2654435761 + 40503) % 4294967296 AS h
    FROM generate_series(0, {_ROWS - 1}) AS t(i)
),
o AS (
    SELECT i AS o_orderkey,
           h % 1500 AS o_custkey,
           CASE h % 3 WHEN 0 THEN 'F' WHEN 1 THEN 'O' ELSE 'P' END AS status,
           (h % 10000000) / 100.0 AS price,
           CASE h % 5 WHEN 0 THEN '1-URGENT' WHEN 1 THEN '2-HIGH'
                WHEN 2 THEN '3-MEDIUM' WHEN 3 THEN '4-NOT SPECIFIED'
                ELSE '5-LOW' END AS priority
    FROM g
)
SELECT status,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(price * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(MIN(o_custkey) AS BIGINT) AS min_cust,
       CAST(MAX(o_custkey) AS BIGINT) AS max_cust,
       COUNT(DISTINCT priority) AS n_priorities
FROM o
GROUP BY status
ORDER BY status
"""


@query(
    "connector_tpchgen_orders",
    oracle=_ORACLE,
    doc="Generator connector end-to-end (presto-tpch analog, "
    "TpchConnectorFactory.java:35): spark.read.format('tpchgen') plans "
    "row-range input partitions and synthesizes orders rows on executors "
    "(no files); the DuckDB oracle regenerates the identical rows from "
    "generate_series via the shared integer hash, so the driver "
    "value-checks the connector itself. Money re-exactified as cents "
    "before the sum (double summation order is partition-dependent).",
    tags=("connector",),
)
def connector_tpchgen_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tpch_datasource import register_tpchgen

    register_tpchgen(spark)
    df = (
        spark.read.format("tpchgen")
        .option("table", "orders")
        .option("rows", str(_ROWS))
        .option("partitions", "8")
        .load()
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    return (
        df.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(cents).cast("bigint").alias("total_cents"),
            F.min("o_custkey").cast("bigint").alias("min_cust"),
            F.max("o_custkey").cast("bigint").alias("max_cust"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
        .orderBy("status")
    )
