"""Kafka-shaped record decoders: json / csv / raw / avro over message batches.

The reference scans Kafka topics as static tables and decodes messages
row-wise (presto-kafka KafkaRecordSet.java:53; decoder SPI in
presto-record-decoder: JsonRowDecoder, CsvRowDecoder, RawRowDecoder,
AvroRowDecoder). This module is that decoder layer on Spark: a "topic" is
any DataFrame with the Kafka source schema (key/value binary + topic/
partition/offset/timestamp — exactly what ``spark.read.format("kafka")``
yields), and each decoder turns ``value`` bytes into typed columns with
``from_json`` / ``from_csv`` / casts — all JVM-side, codegen-friendly.

No broker exists in this environment, so tests feed the decoders a
fixture-built message dump with the same schema; against a real cluster the
input swaps to ``spark.read.format("kafka")`` with zero decoder changes.

Scale notes: decoding is a stateless map — no shuffle; malformed records
surface as NULL structs (PERMISSIVE), matching the reference's
skip-on-decode-error connector session property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset bigint, "
    "timestamp timestamp"
)

_META = ("topic", "partition", "offset", "timestamp")


def decode_json(batch: DataFrame, schema: StructType | str) -> DataFrame:
    """JsonRowDecoder analog: value bytes -> typed columns via from_json."""
    decoded = batch.withColumn(
        "rec", F.from_json(F.col("value").cast("string"), schema)
    )
    return decoded.select(*_META, "rec.*")


def decode_csv(batch: DataFrame, schema: str, sep: str = ",") -> DataFrame:
    """CsvRowDecoder analog via from_csv (schema as DDL string)."""
    decoded = batch.withColumn(
        "rec", F.from_csv(F.col("value").cast("string"), schema, {"sep": sep})
    )
    return decoded.select(*_META, "rec.*")


def decode_raw(batch: DataFrame, column: str = "payload") -> DataFrame:
    """RawRowDecoder analog: value bytes exposed as one string column."""
    return batch.select(*_META, F.col("value").cast("string").alias(column))


def decode_avro(batch: DataFrame, avro_schema_json: str) -> DataFrame:
    """AvroRowDecoder analog via spark-avro's from_avro.

    Gated: the spark-avro artifact may be absent from the classpath (it is
    not bundled with a plain pyspark install); callers get a clear
    ImportError rather than a py4j stack.
    """
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise ImportError("spark-avro not available in this environment") from e
    decoded = batch.withColumn("rec", from_avro(F.col("value"), avro_schema_json))
    return decoded.select(*_META, "rec.*")
