"""Stateful streaming sessionization vs the batch rewrite.

Events are fed in two time-ordered micro-batches, so sessions that span the
file boundary exercise cross-batch state carry-over. Sessions still open when
input is exhausted stay in state (a live feed would close them later), so
the comparison drops each user's final batch session.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F

from lyft_presto_spark.queries import all_queries
from lyft_presto_spark.session import load_table
from lyft_presto_spark.streaming.events_stream import EVENTS_SCHEMA
from lyft_presto_spark.streaming.sessionize_stream import sessionize_stream


class _FakeState:
    """Minimal GroupState double for exercising the TTL code path directly
    (processing-time timeouts can't be fired deterministically under
    availableNow triggers, so the flush/remove contract is unit-tested)."""

    def __init__(self, value, timed_out):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.updated = None
        self.timeout_ms = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self.updated = v

    def remove(self):
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def test_state_ttl_flushes_idle_user():
    from lyft_presto_spark.streaming.sessionize_stream import _sessionize_group

    # Timed-out user with an open session: flush it, retire the state.
    state = _FakeState((1_000_000, 5_000_000, 7, 12.5), timed_out=True)
    out = list(_sessionize_group((42,), iter([]), state, idle_timeout_s=60.0))
    assert state.removed and not state.updated
    assert len(out) == 1 and len(out[0]) == 1
    row = out[0].iloc[0]
    assert row["user_id"] == 42 and row["n_events"] == 7 and row["session_value"] == 12.5


def test_state_ttl_arms_timeout_on_update():
    import pandas as pd

    from lyft_presto_spark.streaming.sessionize_stream import _sessionize_group

    pdf = pd.DataFrame({"ts": [pd.Timestamp("2024-01-01 00:00:00")], "value": [1.0]})
    state = _FakeState(None, timed_out=False)
    list(_sessionize_group((7,), iter([pdf]), state, idle_timeout_s=60.0))
    assert state.updated is not None
    assert state.timeout_ms == 60_000
    # Without a TTL the timeout is never armed (NoTimeout mode).
    state2 = _FakeState(None, timed_out=False)
    list(_sessionize_group((7,), iter([pdf]), state2))
    assert state2.timeout_ms is None


def test_stateful_sessionize_matches_batch(spark, sf_dir, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("sess_stream"))
    events = load_table(spark, sf_dir, "events")
    cutoff = events.selectExpr("percentile_approx(unix_micros(ts), 0.5, 10000) AS c").collect()[0]["c"]

    nanos = events.withColumn("ts", F.expr("unix_micros(ts) * 1000"))
    for i, pred in enumerate([f"ts <= {cutoff * 1000}", f"ts > {cutoff * 1000}"]):
        nanos.filter(pred).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct mod-times => deterministic file order
    for extra in os.listdir(src):
        if extra.startswith("_"):
            p = os.path.join(src, extra)
            (shutil.rmtree if os.path.isdir(p) else os.remove)(p)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], round(r["session_value"], 4))
        for r in spark.table("closed_sessions").collect()
    }

    # Batch truth: all sessions, minus each user's last (potentially open).
    batch = all_queries()["events_sessionize"].spark(spark, sf_dir)
    rows = batch.collect()
    last_per_user = {}
    for r in rows:
        if r["user_id"] not in last_per_user or r["session_id"] > last_per_user[r["user_id"]]:
            last_per_user[r["user_id"]] = r["session_id"]
    expected = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], round(r["session_value"], 4))
        for r in rows
        if r["session_id"] != last_per_user[r["user_id"]]
    }
    assert streamed == expected
    assert len(streamed) > 0
