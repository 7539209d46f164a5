"""Custom stateful streaming operator: gap sessionization with applyInPandasWithState.

The batch twin is queries/events.py events_sessionize (lag-gap-cumsum). On an
unbounded feed that rewrite no longer works — session state must live across
micro-batches. This is the ``applyInPandasWithState`` shape: state keyed by
user_id holding the open session; closed sessions are emitted as soon as a
new event's gap exceeds the threshold.

Scale notes: state is one small tuple per active user (bounded by active-user
cardinality, not event volume); the shuffle *groups* a key's rows but gives
no ordering guarantee, and one group can span several Arrow chunks — so the
operator concatenates all chunks and sorts once before folding (sorting each
chunk independently mis-sessionizes any user whose events straddle chunks).
The optional state TTL (``idle_timeout_s`` -> ProcessingTimeTimeout) retires
idle users by flushing their open session and removing state, bounding total
state by *active* users; the default NoTimeout keeps bounded availableNow
runs deterministic for the batch-parity tests.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_S = 30 * 60

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("session_value", DoubleType()),
    ]
)

# Open-session state: (start_us, last_us, n_events, value_sum)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)


def _make_row(user_id, start_us, last_us, n_events, value_sum) -> dict:
    return {
        "user_id": user_id,
        "session_start": pd.Timestamp(start_us * 1000),
        "session_end": pd.Timestamp(last_us * 1000),
        "n_events": n_events,
        "session_value": value_sum,
    }


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    idle_timeout_s: float | None = None,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key

    if idle_timeout_s is not None and state.hasTimedOut:
        # TTL expiry: the user has been idle past the timeout — flush the
        # open session and retire the state (the production path that keeps
        # total state bounded by *active* users, not all users ever seen).
        start_us, last_us, n_events, value_sum = state.get
        state.remove()
        if n_events:
            yield pd.DataFrame(
                [_make_row(user_id, start_us, last_us, n_events, value_sum)],
                columns=[f.name for f in SESSION_SCHEMA.fields],
            )
        return

    if state.exists:
        start_us, last_us, n_events, value_sum = state.get
    else:
        start_us = last_us = None
        n_events, value_sum = 0, 0.0

    closed: list[dict] = []
    # Materialize ALL Arrow chunks, then sort once: within-group order is not
    # guaranteed by the shuffle, and a >1-chunk group sorted per-chunk would
    # interleave out of order (ADVICE r1).
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("ts")
        for ts, value in zip(pdf["ts"], pdf["value"]):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if last_us is not None and ts_us - last_us > SESSION_GAP_S * 1_000_000:
                closed.append(
                    {
                        "user_id": user_id,
                        "session_start": pd.Timestamp(start_us * 1000),
                        "session_end": pd.Timestamp(last_us * 1000),
                        "n_events": n_events,
                        "session_value": value_sum,
                    }
                )
                start_us, n_events, value_sum = ts_us, 0, 0.0
            if start_us is None:
                start_us = ts_us
            last_us = ts_us
            n_events += 1
            value_sum += float(value)

    state.update((start_us, last_us, n_events, value_sum))
    if idle_timeout_s is not None:
        state.setTimeoutDuration(int(idle_timeout_s * 1000))
    if closed:
        yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])


def sessionize_stream(events: DataFrame, idle_timeout_s: float | None = None) -> DataFrame:
    """Closed sessions per user over an unbounded event stream.

    ``idle_timeout_s`` enables the production TTL: a user idle past the
    timeout has their open session flushed and state removed
    (ProcessingTimeTimeout), bounding state by *active* users. The default
    (None) keeps NoTimeout so bounded availableNow runs stay deterministic.
    """
    if idle_timeout_s is None:
        fn, conf = _sessionize_group, GroupStateTimeout.NoTimeout
    else:

        def fn(key, pdfs, state):  # bind the TTL parameter
            yield from _sessionize_group(key, pdfs, state, idle_timeout_s=idle_timeout_s)

        conf = GroupStateTimeout.ProcessingTimeTimeout
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )
