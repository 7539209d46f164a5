"""Managed lifetimes for persisted intermediate artifacts.

Several queries stage an intermediate once and reuse it within (and across)
calls — TPC-H q11's supply aggregate feeds the main agg and the HAVING scalar
subquery; minhash/simhash signatures feed banding plus both sides of the
candidate self-join. Spark inlines CTEs, so without caching those would
recompute per consumer.

Round 2 persisted these inline per call: every repeat call re-persisted the
same logical plan ("Asked to cache already cached data" warnings) and nothing
ever unpersisted, so a long-lived session (the driver's sweep, a real service)
leaked cached partitions until executor eviction. This module makes the
lifetime explicit, the same posture as ``operators/ivf.py``'s build-once /
probe-many index:

- ``staged(spark, sf_dir, name, build)``: get-or-create a persisted DataFrame
  keyed by (session, sf_dir, name). Exactly one cached copy per artifact per
  session regardless of call count — the production "materialized signature
  dataset" model.
- ``release_staged(spark=None)``: unpersist and drop all artifacts (or one
  session's). Benches/tests/services call this at pass or teardown boundaries.

Reference analog: the reference materializes reused subplans via
CommonSubqueryRewriter/cte materialization rather than re-executing them; the
memory ownership lives with the coordinator, not the query text.
"""

from __future__ import annotations

import os
import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_STAGED: dict[tuple[str, str, str], DataFrame] = {}
# _LOCK guards the maps only and is never held across build(): builds of
# unrelated artifacts (different names/sessions) must not serialize behind
# one slow plan construction, and a build that re-enters staged() for a
# *different* artifact must not deadlock (ADVICE r3). Same-key callers block
# on each other via a per-key lock so a race can't persist twice and leak
# the losing copy until session end.
_LOCK = threading.Lock()
_KEY_LOCKS: dict[tuple[str, str, str], threading.Lock] = {}


def _session_key(spark: SparkSession) -> str:
    from ..session import session_key

    return session_key(spark)


def staged(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Get-or-create the persisted artifact ``name`` for (session, sf_dir)."""
    key = (_session_key(spark), os.path.abspath(sf_dir), name)
    df = _STAGED.get(key)
    if df is not None:
        return df
    with _LOCK:
        df = _STAGED.get(key)  # double-checked: loser of the race reuses
        if df is not None:
            return df
        key_lock = _KEY_LOCKS.setdefault(key, threading.Lock())
    with key_lock:  # only same-key callers wait; build() runs outside _LOCK
        df = _STAGED.get(key)
        if df is None:
            # localCheckpoint, NOT persist(): Spark's cache manager
            # substitutes InMemoryRelations on the ANALYZED plan
            # (withCachedData) but WITH-CTEs inline only later in the
            # optimizer, so a persisted artifact referenced inside any
            # CTE body silently misses the cache and re-runs its whole
            # build per consumer (found r11 via the PQ plans: the bigram
            # posting table re-tokenized the corpus 3x through exactly
            # this hole). localCheckpoint cuts lineage instead — the
            # artifact becomes an opaque LogicalRDD leaf that survives
            # CTE inlining, view re-registration, and cache-manager
            # misses alike. eager=False defers materialization to first
            # use. (Non-reliable checkpoint is safe here: single-JVM
            # local mode cannot lose executors; a multi-node deployment
            # of this pattern would write the artifact as a table —
            # same lifecycle, durable blocks.)
            df = build().localCheckpoint(eager=False)
            with _LOCK:
                _STAGED[key] = df
    return df


def release_staged(spark: SparkSession | None = None) -> int:
    """Unpersist staged artifacts; returns how many were released.

    With ``spark`` given, only that session's artifacts are dropped; with
    None, everything (safe: unpersist on a stopped session is ignored).
    """
    with _LOCK:
        if spark is not None:
            sk = _session_key(spark)
            keys = [k for k in _STAGED if k[0] == sk]
        else:
            keys = list(_STAGED)
        dfs = [_STAGED.pop(k) for k in keys]
        for k in keys:
            _KEY_LOCKS.pop(k, None)
    for df in dfs:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session already stopped
            pass
    return len(keys)
