"""`time` type + `time with time zone` shim (TimeType.java,
TimeWithTimeZoneType.java, DateTimeEncoding.java)."""

from __future__ import annotations

import datetime

import pytest

from lyft_presto_spark.functions.timetz import (
    timetz,
    timetz_compare,
    timetz_format,
    timetz_to_utc_time,
)


def _one(spark, expr_sql: str):
    spark.conf.set("spark.sql.timeType.enabled", "true")
    return spark.sql(f"SELECT {expr_sql} AS v").collect()[0].v


@pytest.mark.parametrize(
    ("tod", "off", "utc"),
    [
        ("TIME'10:30:00'", "330", datetime.time(5, 0)),  # +05:30 (reference doc example)
        ("TIME'00:30:00'", "60", datetime.time(23, 30)),  # wraps backward past midnight
        ("TIME'23:30:00'", "-90", datetime.time(1, 0)),  # wraps forward past midnight
        ("TIME'12:00:00.123456'", "0", datetime.time(12, 0, 0, 123456)),  # micros kept
    ],
)
def test_timetz_utc_normalization(spark, tod, off, utc):
    assert _one(spark, timetz_to_utc_time(timetz(tod, off))) == utc


def test_timetz_format(spark):
    assert _one(spark, timetz_format(timetz("TIME'01:02:03.5'", "330"))) == "01:02:03.5+05:30"
    assert _one(spark, timetz_format(timetz("TIME'23:00:00'", "-480"))) == "23:00:00-08:00"


def test_timetz_compare_on_utc_instant(spark):
    # 10:30+05:30 and 05:00 UTC are the same instant => equal (reference rule)
    a = timetz("TIME'10:30:00'", "330")
    b = timetz("TIME'05:00:00'", "0")
    c = timetz("TIME'06:00:00'", "0")
    assert _one(spark, timetz_compare(a, b)) == 0
    assert _one(spark, timetz_compare(a, c)) == -1
    assert _one(spark, timetz_compare(c, a)) == 1


def test_time_type_round_trip_through_groupby(spark, sf_dir):
    """TIME survives shuffle (group-by key) — exchange-safe physical type."""
    spark.conf.set("spark.sql.timeType.enabled", "true")
    df = spark.sql(
        """
        SELECT t, count(*) AS n FROM VALUES
          (TIME'01:00:00'), (TIME'01:00:00'), (TIME'02:30:00') AS v(t)
        GROUP BY t ORDER BY t
        """
    )
    rows = [(r.t, r.n) for r in df.collect()]
    assert rows == [(datetime.time(1, 0), 2), (datetime.time(2, 30), 1)]
