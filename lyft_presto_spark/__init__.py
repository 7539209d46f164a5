"""lyft_presto_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference distributed SQL engine (yeameen/lyft-presto, a Presto 319 fork),
re-expressed idiomatically on Spark SQL / DataFrame / Catalyst rather than
ported from the reference's Java execution engine.

Layout
------
- ``session``    : SparkSession factory (ANSI mode, UTC, AQE) + catalog bootstrap.
- ``queries``    : the declared operator/query inventory; every entry carries a
                   Spark callable and (where SQL-expressible) a DuckDB oracle.
- ``functions``  : Presto-dialect scalar/aggregate function surface on Spark
                   (renames, semantic shims, pandas UDFs for the long tail).
- ``operators``  : operators Spark lacks as built-ins — dedup (exact/MinHash/
                   SimHash), similarity search, text analysis, multimodal.
- ``sources``    : connector registry (parquet/orc/csv/json/jdbc/memory/noop).
- ``plans``      : plan inspection helpers (pushdown / broadcast assertions).
- ``streaming``  : Structured Streaming event pipelines (beyond-reference).
"""

__version__ = "0.1.0"
