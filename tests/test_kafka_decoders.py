"""Kafka record decoders over a fixture-built message dump (no broker).

The dump has the exact spark.read.format("kafka") output schema, so these
tests exercise the decoder layer precisely as a real topic scan would
(presto-kafka KafkaRecordSet.java:53; presto-record-decoder SPI).
"""

from __future__ import annotations

import pytest

from lyft_presto_spark.session import load_table
from lyft_presto_spark.sources.kafka_decoders import (
    decode_csv,
    decode_json,
    decode_raw,
)


@pytest.fixture()
def topic_dump(spark, sf_dir):
    """orders rows serialized as JSON 'messages' with Kafka metadata."""
    orders = load_table(spark, sf_dir, "orders").limit(100)
    return orders.selectExpr(
        "CAST(CAST(o_orderkey AS STRING) AS BINARY) AS key",
        "CAST(to_json(named_struct('orderkey', o_orderkey, 'status', o_orderstatus, "
        "'totalprice', o_totalprice)) AS BINARY) AS value",
        "'orders_topic' AS topic",
        "CAST(o_orderkey % 4 AS INT) AS partition",
        "CAST(o_orderkey AS BIGINT) AS offset",
        "CAST(o_orderdate AS TIMESTAMP) AS timestamp",
    )


def test_decode_json_roundtrip(spark, sf_dir, topic_dump):
    out = decode_json(topic_dump, "orderkey bigint, status string, totalprice double")
    rows = {r["orderkey"]: r for r in out.collect()}
    src = {r["o_orderkey"]: r for r in load_table(spark, sf_dir, "orders").limit(100).collect()}
    assert set(rows) == set(src)
    some = next(iter(src))
    assert rows[some]["status"] == src[some]["o_orderstatus"]
    assert rows[some]["totalprice"] == pytest.approx(src[some]["o_totalprice"])
    # Kafka metadata preserved alongside decoded columns
    assert out.columns[:4] == ["topic", "partition", "offset", "timestamp"]


def test_decode_json_malformed_is_null(spark, topic_dump):
    broken = topic_dump.selectExpr(
        "key", "CAST('not json' AS BINARY) AS value", "topic", "partition", "offset", "timestamp"
    )
    out = decode_json(broken, "orderkey bigint, status string, totalprice double")
    assert out.filter("orderkey IS NOT NULL").count() == 0
    assert out.count() == broken.count()  # skip-on-error keeps the row, nulls the fields


def test_decode_csv(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").limit(50)
    dump = orders.selectExpr(
        "CAST(NULL AS BINARY) AS key",
        "CAST(concat_ws(',', CAST(o_orderkey AS STRING), o_orderstatus) AS BINARY) AS value",
        "'csv_topic' AS topic", "CAST(0 AS INT) AS partition",
        "CAST(o_orderkey AS BIGINT) AS offset", "CAST(o_orderdate AS TIMESTAMP) AS timestamp",
    )
    out = decode_csv(dump, "orderkey bigint, status string")
    assert out.count() == 50
    assert out.filter("status IS NULL").count() == 0


def test_decode_raw(topic_dump):
    out = decode_raw(topic_dump)
    assert out.columns == ["topic", "partition", "offset", "timestamp", "payload"]
    assert out.filter("payload LIKE '{%'").count() == out.count()
