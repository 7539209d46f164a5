"""Event analytics over the ``events`` fixture (batch time-series).

The reference has no streaming operators (SURVEY.md §2.9) — its Kafka
connector scans topics as static tables (presto-kafka/.../KafkaRecordSet.java:53)
and time-series work is plain timestamp-column SQL. This module is that
surface: tumbling-window rollups, gap sessionization, funnels, retention,
JSON property extraction (JsonFunctions.java:64 analog).

Time buckets are computed by epoch arithmetic (identical in both engines)
rather than engine-specific window()/time_bucket() helpers, so the oracle is
bit-exact. Sessionization is the classic lag-gap-cumsum rewrite — two window
functions over (user_id, ts), one shuffle on user_id.

Scale notes: every query shuffles on (bucket|user_id) grouped scalars only;
sessionization's state is bounded per user partition (WindowExec), the
streaming-native variant lives in lyft_presto_spark/streaming/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import query, sql_over, t

SESSION_GAP_MIN = 30


def _bucket(d: str, col: str = "ts", secs: int = 300) -> str:
    """Epoch-aligned tumbling bucket start, identical across engines."""
    if d == "spark":
        return f"timestamp_seconds(CAST(floor(unix_timestamp({col}) / {secs}) * {secs} AS BIGINT))"
    return f"CAST(to_timestamp(CAST(floor(epoch_ms({col}) / 1000.0 / {secs}) * {secs} AS BIGINT)) AS TIMESTAMP)"


def _tumbling_sql(d: str) -> str:
    # avg as integer cents via integer division: round(avg_double, n) can land
    # on a .5 decimal boundary (e.g. 290.93/8) where engines round apart.
    idiv = "div" if d == "spark" else "//"
    avg_cents = (
        f"CAST(sum(CAST(round(value * 100) AS BIGINT)) {idiv} count(*) AS BIGINT)"
    )
    return f"""
SELECT {_bucket(d, secs=3600)} AS window_start,
       event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 4) AS total_value,
       min(value) AS min_value,
       max(value) AS max_value,
       {avg_cents} AS avg_value_cents
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


@query(
    "events_tumbling_window",
    oracle=_tumbling_sql("duck"),
    doc="Hourly tumbling-window rollup per event type (epoch-aligned bucket, "
    "single hash-aggregate shuffle on (bucket, type)).",
    tags=("events",),
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _tumbling_sql("spark"), ("events",))


_TUMBLING_HLL_SQL = f"""
SELECT {_bucket("spark", secs=3600)} AS window_start,
       event_type,
       count(*) AS n_events,
       approx_count_distinct(user_id) AS approx_users,
       round(sum(value), 4) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


def tumbling_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production operator: hourly rollup with HLL distinct users —
    ONE ordinary hash-agg shuffle, Expand-free, fixed-size registers
    partial-aggregated map-side (plan pinned in tests/test_hll_rollup.py).
    The registered conformance row wraps this with its exact twin to
    produce a value-checked oracle; at 100 TB you run THIS shape."""
    return sql_over(spark, sf_dir, _TUMBLING_HLL_SQL, ("events",))


_TUMBLING_HLL_CHECK_SQL = f"""
WITH hll AS ({_TUMBLING_HLL_SQL.replace("ORDER BY window_start, event_type", "")}),
exact AS (
    SELECT {_bucket("spark", secs=3600)} AS window_start,
           event_type,
           count(DISTINCT user_id) AS n_users_exact
    FROM events
    GROUP BY 1, 2
)
SELECT h.window_start, h.event_type, h.n_events, h.total_value,
       e.n_users_exact,
       abs(h.approx_users - e.n_users_exact)
           <= 8.0 + 0.2 * e.n_users_exact AS users_within_tol
FROM hll h
JOIN exact e ON h.window_start = e.window_start AND h.event_type = e.event_type
ORDER BY h.window_start, h.event_type
"""

_TUMBLING_HLL_ORACLE = f"""
SELECT {_bucket("duck", secs=3600)} AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS total_value,
       count(DISTINCT user_id) AS n_users_exact,
       TRUE AS users_within_tol
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


@query(
    "events_tumbling_window_hll",
    oracle=_TUMBLING_HLL_ORACLE,
    doc="Hourly rollup with HLL distinct users — the 100 TB-preferred twin "
    "of events_tumbling_window: exact count(DISTINCT) costs an extra "
    "exchange keyed by (bucket, type, user_id), a shuffle that scales with "
    "distinct-user cardinality, while the HLL register is fixed-size per "
    "group and partial-aggregates map-side, so the production shape "
    "(tumbling_hll_rollup, plan-pinned Expand-free in "
    "tests/test_hll_rollup.py) is ONE ordinary hash-agg shuffle. This "
    "conformance row joins the sketch rollup with its exact twin so the "
    "driver value-checks the exact columns AND a per-group "
    "users_within_tol boolean (8 + 0.2n: Spark's HLL++ at default rsd "
    "0.05 shows small-cardinality bias beyond 3 sigma — an sf0.1 group "
    "with 24 distinct users measured off by 4, so the band carries "
    "absolute small-n slack; verified across sf0.001/0.01/0.1) — the "
    "fn_kll_quantile tolerance-oracle pattern. Streaming "
    "twin: streaming/events_stream.py tumbling_counts. Approximation "
    "analog: ApproximateCountDistinctAggregation.java:44.",
    tags=("events",),
)
def events_tumbling_window_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _TUMBLING_HLL_CHECK_SQL, ("events",))


def _sessionize_sql(d: str) -> str:
    # Microsecond precision on both sides (Spark unix_timestamp truncates to
    # whole seconds, which would misclassify events near the gap boundary).
    if d == "spark":
        gap_s = "(unix_micros(ts) - unix_micros(prev_ts)) / 1000000.0"
    else:
        gap_s = "(epoch_us(ts) - epoch_us(prev_ts)) / 1000000.0"
    return f"""
WITH ordered AS (
    SELECT user_id, event_id, ts, event_type, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
),
flagged AS (
    SELECT user_id, event_id, ts, event_type, value,
           CASE WHEN prev_ts IS NULL
                  OR {gap_s} > {SESSION_GAP_MIN * 60}
                THEN 1 ELSE 0 END AS new_session
    FROM ordered
),
sessions AS (
    SELECT user_id, ts, event_type, value,
           CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM flagged
)
SELECT user_id, session_id,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       round(sum(value), 4) AS session_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


@query(
    "events_sessionize",
    oracle=_sessionize_sql("duck"),
    doc="Gap-based sessionization (30 min): lag -> new-session flag -> "
    "running-sum session ids; bounded per-user window state, one shuffle "
    "on user_id. Window machinery analog: WindowOperator.java:61.",
    tags=("events",),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _sessionize_sql("spark"), ("events",))


def _funnel_sql(d: str) -> str:
    return """
WITH firsts AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
           min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
           min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
    FROM events
    GROUP BY user_id
)
SELECT count(*) AS n_users,
       CAST(sum(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_then_view,
       CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup AND t_purchase > t_view
                THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
FROM firsts
"""


@query(
    "events_funnel",
    oracle=_funnel_sql("duck"),
    doc="3-step ordered funnel (signup -> view -> purchase) via conditional "
    "min-timestamp pivot; one shuffle on user_id.",
    tags=("events",),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _funnel_sql("spark"), ("events",))


def _retention_sql(d: str) -> str:
    day = "CAST(ts AS DATE)"
    return f"""
WITH daily AS (
    SELECT DISTINCT user_id, {day} AS d FROM events
),
firsts AS (
    SELECT user_id, min(d) AS first_day FROM daily GROUP BY user_id
)
SELECT CAST(daily.d - firsts.first_day AS INT) AS day_offset,
       count(DISTINCT daily.user_id) AS n_active
FROM daily JOIN firsts ON daily.user_id = firsts.user_id
WHERE CAST(daily.d - firsts.first_day AS INT) <= 7
GROUP BY 1
ORDER BY 1
"""


def _retention_spark_sql() -> str:
    return """
WITH daily AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
firsts AS (
    SELECT user_id, min(d) AS first_day FROM daily GROUP BY user_id
)
SELECT datediff(daily.d, firsts.first_day) AS day_offset,
       count(DISTINCT daily.user_id) AS n_active
FROM daily JOIN firsts ON daily.user_id = firsts.user_id
WHERE datediff(daily.d, firsts.first_day) <= 7
GROUP BY 1
ORDER BY 1
"""


@query(
    "events_retention",
    oracle=_retention_sql("duck"),
    doc="N-day retention cohort: first-activity join + day-offset distinct "
    "counts (broadcastable firsts side).",
    tags=("events",),
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _retention_spark_sql(), ("events",))


def _json_props_sql(d: str) -> str:
    if d == "spark":
        k = "CAST(get_json_object(props, '$.k') AS INT)"
    else:
        k = "CAST(json_extract_string(props, '$.k') AS INT)"
    return f"""
SELECT event_type,
       count(*) AS n_events,
       min({k}) AS min_k,
       max({k}) AS max_k,
       round(avg({k}), 4) AS avg_k,
       count(DISTINCT {k}) AS n_distinct_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query(
    "events_json_props",
    oracle=_json_props_sql("duck"),
    doc="JSON property extraction + rollup (json_extract_scalar analog — "
    "JsonFunctions.java:64).",
    tags=("events",),
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _json_props_sql("spark"), ("events",))


def _top_users_sql(d: str) -> str:
    return """
WITH ranked AS (
    SELECT user_id, event_type, value, ts,
           row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
    FROM events
)
SELECT event_type, rn, user_id, round(value, 4) AS value
FROM ranked
WHERE rn <= 5
ORDER BY event_type, rn
"""


@query(
    "events_top_per_type",
    oracle=_top_users_sql("duck"),
    doc="Top-5 events per type by value — TopNRowNumberNode analog "
    "(TopNRowNumberOperator.java:38; Spark WindowGroupLimit prunes it).",
    tags=("events",),
)
def events_top_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _top_users_sql("spark"), ("events",))


def _session_window_sql(d: str) -> str:
    if d == "spark":
        # Native session windows: Catalyst's SessionWindow node handles the
        # gap merge — same state machine Structured Streaming uses.
        return f"""
SELECT user_id,
       session_window.start AS session_start,
       session_window.end AS session_end,
       count(*) AS n_events,
       round(sum(value), 4) AS session_value
FROM events
GROUP BY user_id, session_window(ts, '{SESSION_GAP_MIN} minutes')
ORDER BY user_id, session_start
"""
    # Oracle: the lag-gap-cumsum rewrite; a session window's end is
    # last-event + gap by definition.
    return f"""
WITH ordered AS (
    SELECT user_id, event_id, ts, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
),
flagged AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN prev_ts IS NULL
                  OR (epoch_us(ts) - epoch_us(prev_ts)) / 1000000.0 > {SESSION_GAP_MIN * 60}
                THEN 1 ELSE 0 END AS new_session
    FROM ordered
),
sessions AS (
    SELECT user_id, ts, value,
           sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 4) AS session_value
FROM sessions
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


@query(
    "events_session_window",
    oracle=_session_window_sql("duck"),
    doc="Native session windows (session_window(ts, gap)) checked against "
    "the lag-gap-cumsum relational rewrite as oracle — the same dynamic-gap "
    "session semantics Structured Streaming applies on unbounded input.",
    tags=("events",),
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _session_window_sql("spark"), ("events",))


_HOPPING_DUCK = """
SELECT CAST(to_timestamp(ws) AS TIMESTAMP) AS window_start,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 4) AS total_value
FROM (
    SELECT e.*,
           (CAST(floor(epoch_ms(ts) / 1000.0 / 900) AS BIGINT) - k.k) * 900 AS ws
    FROM events e
    CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k
)
GROUP BY ws
ORDER BY window_start
"""


@query(
    "events_hopping_window",
    oracle=_HOPPING_DUCK,
    doc="Hopping (sliding) window rollup: 1-hour windows every 15 minutes via "
    "Spark's native window(ts, '1 hour', '15 minutes') — each event lands in "
    "4 overlapping windows (Expand + one hash-agg shuffle, the streaming-"
    "compatible operator). Oracle recomputes by exploding the 4 epoch-"
    "aligned window starts per event.",
    tags=("events",),
)
def events_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "n_users", "total_value")
        .orderBy("window_start")
    )


# --- click -> purchase attribution (batch twin of the stream-stream join) ---

_ATTRIBUTION_DUCK = """
SELECT c.user_id,
       count(*) AS n_pairs,
       round(sum(p.value), 4) AS attributed_value
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND p.event_type = 'purchase'
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL '30 minutes'
GROUP BY c.user_id
ORDER BY c.user_id
"""


@query(
    "events_click_attribution",
    oracle=_ATTRIBUTION_DUCK,
    doc="Click->purchase attribution pairs within a 30-minute horizon, "
    "rolled up per user. The pair generator is streaming/join_stream.py's "
    "attribution_pairs — the SAME code that runs as a watermarked "
    "stream-stream interval join (state bounded by watermark + horizon, "
    "partitioned on the user_id equi-key); here it runs as its batch twin.",
    tags=("events", "streaming"),
)
def events_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..streaming import attribution_pairs

    pairs = attribution_pairs(t(spark, sf_dir, "events"), watermark=None)
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("value"), 4).alias("attributed_value"),
        )
        .orderBy("user_id")
    )


# --- error-burst detection (ordered per-key sequence pattern) --------------

_BURSTS_SQL_SPARK = """
WITH errs AS (SELECT user_id, ts FROM events WHERE event_type = 'error'),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL '10' MINUTE
              THEN 1 ELSE 0 END AS new_chain
  FROM errs WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
chains AS (
  SELECT user_id, sum(new_chain) OVER (PARTITION BY user_id ORDER BY ts) AS chain_id
  FROM flagged
),
per_chain AS (
  SELECT user_id, chain_id, count(*) AS chain_len
  FROM chains GROUP BY user_id, chain_id
)
SELECT user_id,
       count(*) AS n_bursts,
       CAST(max(chain_len) AS BIGINT) AS max_burst_len,
       CAST(sum(chain_len) AS BIGINT) AS errors_in_bursts
FROM per_chain WHERE chain_len >= 3
GROUP BY user_id
ORDER BY user_id
"""

_BURSTS_SQL_DUCK = _BURSTS_SQL_SPARK.replace("INTERVAL '10' MINUTE", "INTERVAL '10 minutes'")

# The REGISTERED row widens the chain gap to 6 hours: the fixture's error
# density (~1 error/user/week) never chains at 10 minutes, so the row was
# vacuous (0 rows at every scale — r8 zero-row audit). The 10-minute
# template above stays as the streaming twin's batch side
# (test_streaming.py parity vs burst_stream's BURST_GAP_S); the gap is a
# parameter of the shape, not of the machinery.
_BURSTS_REG_SPARK = _BURSTS_SQL_SPARK.replace(
    "INTERVAL '10' MINUTE", "INTERVAL '6' HOUR"
)
_BURSTS_REG_DUCK = _BURSTS_REG_SPARK.replace("INTERVAL '6' HOUR", "INTERVAL '6 hours'")


@query(
    "events_error_bursts",
    oracle=_BURSTS_REG_DUCK,
    doc="Error-burst detection: chains of 'error' events each within 6 h "
    "of the previous, per user; bursts are chains of length >= 3 "
    "(lag-gap-cumsum, the sequence-pattern shape). Batch twin of "
    "streaming/burst_stream.py's stateful detector (which parameterizes "
    "the same gap; its parity test uses the 10-minute template on "
    "synthetic data).",
    tags=("events", "streaming"),
)
def events_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _BURSTS_REG_SPARK, ("events",))
