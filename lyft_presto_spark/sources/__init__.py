"""Connector registry: catalogs of named tables over Spark data sources.

Analog of the reference's connector SPI (presto-spi/.../connector/ —
Connector/ConnectorMetadata/ConnectorPageSource; SURVEY.md §2.3) without
inventing an SPI: a *connector* here is a factory returning DataFrames for
named tables, a *catalog* is a mounted connector instance. Spark's built-in
readers cover the reference's format matrix (presto-hive
HiveStorageFormat.java:53-93 — parquet/orc/csv/json/text/avro) natively.
"""

from .connectors import (
    Catalog,
    CatalogManager,
    dir_catalog,
    jdbc_catalog,
    memory_catalog,
    noop_sink,
)

__all__ = [
    "Catalog",
    "CatalogManager",
    "dir_catalog",
    "memory_catalog",
    "jdbc_catalog",
    "noop_sink",
]
