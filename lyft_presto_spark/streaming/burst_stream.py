"""Custom stateful streaming operator: error-burst (sequence-pattern) detection.

Batch twin: queries/events.py events_error_bursts (lag-gap-cumsum). On an
unbounded feed the chain must live across micro-batches — per-user state is
(last error timestamp, current chain length, chain start), the minimal
sequence-pattern state. A burst (chain of >= BURST_MIN errors, each within
GAP of the previous) is emitted the moment its chain breaks; this is the
CEP-style "A followed by A... within T" shape that windowed aggregation
cannot express.

Idle flush (ADVICE r3): chains also close via EventTimeTimeout — once the
watermark passes ``last_error + BURST_GAP_S``, the chain is by definition
broken (no in-time event can extend it), so the group flushes and its state
is REMOVED. State is therefore bounded by *recently-erroring* users, not all
users ever seen, and a tail-of-stream burst no longer waits for a later
event from the same user. Residual end-of-stream difference vs the batch
twin: the watermark only advances when new data arrives, so a chain at the
global maximum event time flushes on the next batch (or never, if the feed
truly ends) — an availableNow drain emits it only if later-arriving data
from OTHER keys pushes the watermark past its gap.

Scale: state is three scalars per user with recent errors — bounded by key
cardinality and retired by the timeout; the same chunk-concatenate-then-sort
rule as sessionize_stream (shuffle groups a key's rows but does not order
them).

Ordering contract: like every gap-chain operator (sessionize included), this
assumes micro-batches arrive in per-key event-time order — the normal
arrival property of a live feed. Cross-batch disorder up to
``watermark_delay`` survives the late-row filter; within a batch any order
is fine (sorted here).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType, TimestampType

BURST_GAP_S = 10 * 60
BURST_MIN = 3

BURST_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("burst_start", TimestampType()),
        StructField("burst_end", TimestampType()),
        StructField("burst_len", LongType()),
    ]
)

# (chain_start_us, last_err_us, chain_len)
BURST_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("chain_len", LongType()),
    ]
)


def _detect_bursts(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start_us, last_us, chain_len = state.get
    else:
        start_us = last_us = None
        chain_len = 0

    out: list[dict] = []

    def close_chain() -> None:
        if chain_len >= BURST_MIN:
            out.append(
                {
                    "user_id": user_id,
                    "burst_start": pd.Timestamp(start_us * 1000),
                    "burst_end": pd.Timestamp(last_us * 1000),
                    "burst_len": chain_len,
                }
            )

    if state.hasTimedOut:
        # Watermark passed last_error + GAP: the chain cannot be extended by
        # any in-time event. Emit if it qualified, then retire the state.
        close_chain()
        state.remove()
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in BURST_SCHEMA.fields])
        return

    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("ts")
        for ts in pdf["ts"]:
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if last_us is not None and ts_us - last_us > BURST_GAP_S * 1_000_000:
                close_chain()
                start_us, chain_len = ts_us, 0
            if start_us is None:
                start_us = ts_us
            last_us = ts_us
            chain_len += 1

    state.update((start_us, last_us, chain_len))
    # Fire once the watermark proves no in-time event can extend the chain.
    # last_us is event-time µs; the API takes epoch ms.
    state.setTimeoutTimestamp(last_us // 1000 + BURST_GAP_S * 1000)
    if out:
        yield pd.DataFrame(out, columns=[f.name for f in BURST_SCHEMA.fields])


def burst_stream(events: DataFrame, watermark_delay: str = "10 minutes") -> DataFrame:
    """Closed error bursts per user over an unbounded event stream.

    ``watermark_delay`` is the tolerated cross-key disorder; it also delays
    the idle flush (a chain closes when the watermark — max event time minus
    the delay — passes its last error + BURST_GAP_S).
    """
    errs = (
        events.filter(F.col("event_type") == "error")
        .select("user_id", "ts")
        .withWatermark("ts", watermark_delay)
    )
    return errs.groupBy("user_id").applyInPandasWithState(
        _detect_bursts,
        outputStructType=BURST_SCHEMA,
        stateStructType=BURST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
