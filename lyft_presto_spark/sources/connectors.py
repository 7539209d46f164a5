"""Catalog/connector implementations over Spark's readers and writers.

Reference mapping (SURVEY.md §2.3):
- dir_catalog(fmt)   ≈ presto-hive (HiveStorageFormat.java:53-93 formats)
- memory_catalog     ≈ presto-memory (MemoryConnectorFactory.java:29)
- jdbc_catalog       ≈ presto-base-jdbc family (federated scan w/ pushdown)
- noop_sink          ≈ presto-blackhole (benchmark sink)
- Kafka would be spark.read.format("kafka") (presto-kafka scans topics as
  batch tables — KafkaRecordSet.java:53); gated: no broker in this env.

Scale notes: dir catalogs expose the path layout to Spark so partition
discovery/pruning works (a `dt=.../` layout prunes at 100 TB); every reader
keeps predicate pushdown and column pruning because tables resolve straight
to DataSource scans — no materialization in the registry layer.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SUPPORTED_FORMATS = ("parquet", "orc", "csv", "json", "text")


@dataclass
class Catalog:
    """A mounted connector instance: name -> DataFrame factories."""

    name: str
    tables: dict[str, Callable[[SparkSession], DataFrame]] = field(default_factory=dict)

    def table(self, spark: SparkSession, table: str) -> DataFrame:
        if table not in self.tables:
            raise KeyError(f"table {self.name}.{table} not found")
        return self.tables[table](spark)

    def list_tables(self) -> list[str]:
        return sorted(self.tables)

    def register_views(self, spark: SparkSession, prefix: str = "") -> None:
        """Mount every table as a temp view (catalog.schema.table analog)."""
        for t in self.tables:
            self.table(spark, t).createOrReplaceTempView(f"{prefix}{t}")


class CatalogManager:
    """The engine's metadata root (MetadataManager.java analog)."""

    def __init__(self) -> None:
        self._catalogs: dict[str, Catalog] = {}

    def mount(self, catalog: Catalog) -> None:
        self._catalogs[catalog.name] = catalog

    def catalog(self, name: str) -> Catalog:
        return self._catalogs[name]

    def list_catalogs(self) -> list[str]:
        return sorted(self._catalogs)

    def table(self, spark: SparkSession, catalog: str, table: str) -> DataFrame:
        return self._catalogs[catalog].table(spark, table)


def dir_catalog(
    name: str,
    path: str,
    fmt: str = "parquet",
    options: dict[str, str] | None = None,
) -> Catalog:
    """Catalog over a directory of ``<table>.<fmt>`` files/dirs (hive analog).

    The reader is lazy and per-table, so Catalyst sees the raw scan —
    predicate pushdown / partition pruning are preserved.
    """
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED_FORMATS}")
    tables: dict[str, Callable[[SparkSession], DataFrame]] = {}
    if os.path.isdir(path):
        for entry in sorted(os.listdir(path)):
            stem, ext = os.path.splitext(entry)
            if ext.lstrip(".") == fmt:
                full = os.path.join(path, entry)

                def reader(spark: SparkSession, _p: str = full) -> DataFrame:
                    r = spark.read.format(fmt)
                    for k, v in (options or {}).items():
                        r = r.option(k, v)
                    return r.load(_p)

                tables[stem] = reader
    return Catalog(name=name, tables=tables)


def memory_catalog(name: str, frames: dict[str, DataFrame]) -> Catalog:
    """In-memory tables (presto-memory analog): existing DataFrames by name."""
    return Catalog(
        name=name,
        tables={t: (lambda spark, _df=df: _df) for t, df in frames.items()},
    )


def jdbc_catalog(
    name: str,
    url: str,
    tables: list[str],
    properties: dict[str, str] | None = None,
) -> Catalog:
    """Federated JDBC tables (presto-base-jdbc analog).

    spark.read.jdbc pushes filters and prunes columns server-side, matching
    the reference's JDBC pushdown. Untested in this environment (no JDBC
    endpoint); the wiring is the standard reader call.
    """

    def make(table: str) -> Callable[[SparkSession], DataFrame]:
        def reader(spark: SparkSession) -> DataFrame:
            r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
            for k, v in (properties or {}).items():
                r = r.option(k, v)
            return r.load()

        return reader

    return Catalog(name=name, tables={t: make(t) for t in tables})


def noop_sink(df: DataFrame) -> None:
    """Execute fully, write nothing (presto-blackhole analog; bench.py uses this)."""
    df.write.format("noop").mode("overwrite").save()
