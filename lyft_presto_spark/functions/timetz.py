"""`time with time zone` shim (TimeWithTimeZoneType.java).

The reference packs (millis-of-day, zone offset) into one long
(DateTimeEncoding.java) and compares TIMETZ values on their UTC instant.
Spark 4.1 has a native TIME type (feature-flagged; build_session enables it)
but no TIMETZ, so the engine models the reference's semantics as a struct:

    struct<tod: time(6), offset_minutes: int>

— wall-clock time-of-day plus fixed UTC offset, exactly the information the
reference encodes. All helpers are SQL expression strings (JVM codegen,
no UDFs):

- ``timetz(tod_sql, offset_min_sql)``    construct
- ``timetz_to_utc_time(tz_sql)``         normalize to UTC time-of-day
  (mod-24h wrap, microsecond-exact via seconds-of-day decimal arithmetic —
  TIME +/- INTERVAL would overflow at midnight under ANSI instead of
  wrapping, so arithmetic runs on ``cast(time AS decimal(20,6))``)
- ``timetz_format(tz_sql)``              render 'HH:mm:ss.SSSSSS+HH:MM'
  (DateTimeFunctions / TimeWithTimeZoneType casts to varchar)
- ``timetz_compare(a_sql, b_sql)``       -1/0/1 on the UTC instant, the
  reference's comparison rule (equal instants with different zones compare
  equal)
"""

from __future__ import annotations


def timetz(tod_sql: str, offset_min_sql: str) -> str:
    return f"named_struct('tod', {tod_sql}, 'offset_minutes', CAST({offset_min_sql} AS INT))"


def _utc_seconds_of_day(tz_sql: str) -> str:
    # seconds-of-day minus offset, wrapped into [0, 86400)
    return (
        f"MOD(MOD(CAST(({tz_sql}).tod AS DECIMAL(20,6)) - ({tz_sql}).offset_minutes * 60, 86400)"
        " + 86400, 86400)"
    )


def _time_from_seconds(sec_sql: str) -> str:
    return (
        f"make_time(CAST(FLOOR(({sec_sql}) / 3600) AS INT), "
        f"CAST(FLOOR(MOD({sec_sql}, 3600) / 60) AS INT), "
        f"MOD({sec_sql}, 60))"
    )


def timetz_to_utc_time(tz_sql: str) -> str:
    return _time_from_seconds(_utc_seconds_of_day(tz_sql))


def timetz_format(tz_sql: str) -> str:
    """Render as the reference's varchar cast: wall time + signed offset."""
    off = f"({tz_sql}).offset_minutes"
    return (
        f"concat(CAST(({tz_sql}).tod AS STRING), "
        f"IF({off} < 0, '-', '+'), "
        f"lpad(CAST(abs({off}) DIV 60 AS STRING), 2, '0'), ':', "
        f"lpad(CAST(abs({off}) % 60 AS STRING), 2, '0'))"
    )


def timetz_compare(a_sql: str, b_sql: str) -> str:
    ua, ub = _utc_seconds_of_day(a_sql), _utc_seconds_of_day(b_sql)
    return f"CASE WHEN {ua} < {ub} THEN -1 WHEN {ua} > {ub} THEN 1 ELSE 0 END"
