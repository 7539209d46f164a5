"""Persisted-artifact lifetime (operators/staging.py) and session-cache keying.

Round 2's inline ``persist()`` calls re-persisted per query call and never
unpersisted (VERDICT r2 "What's wrong" #3). These tests pin the fixed
contract: one cached copy per artifact per session, reclaimable on demand.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lyft_presto_spark.operators.staging import _STAGED, release_staged, staged
from lyft_presto_spark.queries import all_queries
from lyft_presto_spark.session import load_table, session_key


def test_staged_builds_once_and_releases(spark, sf_dir):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(100).select(F.col("id").alias("v"))

    a = staged(spark, sf_dir, "test_artifact", build)
    b = staged(spark, sf_dir, "test_artifact", build)
    assert a is b and calls["n"] == 1
    # r11: staged artifacts are localCheckpoints (LogicalRDD leaves that
    # survive CTE inlining), not persist()-cached plans — the artifact's
    # plan must be an opaque RDD scan, not the build lineage
    assert "LogicalRDD" in a._jdf.queryExecution().analyzed().toString()
    released = release_staged(spark)
    assert released >= 1
    assert not any(k[2] == "test_artifact" for k in _STAGED)


def test_repeat_query_calls_do_not_stack_persists(spark, sf_dir):
    """q11 + minhash twice each: exactly one staged artifact per name."""
    release_staged(spark)
    qs = all_queries()
    for _ in range(2):
        qs["tpch_q11"].spark(spark, sf_dir).collect()
        qs["dedup_minhash_lsh"].spark(spark, sf_dir).limit(1).collect()
    names = sorted(k[2] for k in _STAGED if k[0] == session_key(spark))
    assert names == ["minhash_sigs", "tpch_q11_supply"]
    release_staged(spark)


def test_session_key_is_stable_and_cache_key_material(spark, sf_dir):
    """Caches key on applicationId (stable per context), not id(spark).

    id() of a stopped session can be recycled by the allocator, silently
    serving stale DataFrames to a fresh session (VERDICT r2 #4). We cannot
    cheaply stop/restart the shared test session, so pin the mechanism: the
    key is the applicationId string and load_table round-trips through it.
    """
    k1 = session_key(spark)
    assert isinstance(k1, str) and k1  # e.g. "local-17234..."
    df1 = load_table(spark, sf_dir, "nation")
    df2 = load_table(spark, sf_dir, "nation")
    assert df1 is df2  # cache hit on the applicationId-keyed entry


def test_staged_concurrent_get_or_create_builds_once(spark, sf_dir):
    """A thread-pool race on the same artifact must persist exactly one copy."""
    import threading

    release_staged(spark)
    calls = {"n": 0}
    lock = threading.Lock()

    def build():
        with lock:
            calls["n"] += 1
        return spark.range(1000).select(F.col("id").alias("v"))

    results = [None] * 8

    def worker(i):
        results[i] = staged(spark, sf_dir, "race_artifact", build)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert calls["n"] == 1
    assert all(r is results[0] for r in results)  # one shared persisted DF
    release_staged(spark)


def test_staged_unrelated_builds_do_not_serialize(spark, sf_dir):
    """A slow build of one artifact must not block another key's build,
    and a build that re-enters staged() for a different artifact must not
    deadlock (ADVICE r3: build() ran under the single global lock)."""
    import threading

    release_staged(spark)
    slow_started = threading.Event()
    fast_done = threading.Event()

    def slow_build():
        slow_started.set()
        # Deadlock probe: re-enter staged() for a different key mid-build.
        staged(spark, sf_dir, "nested_artifact", lambda: spark.range(5).toDF("v"))
        # If fast_build serialized behind us this wait would time out.
        assert fast_done.wait(timeout=30), "unrelated build serialized behind slow build"
        return spark.range(10).toDF("v")

    def fast_build():
        return spark.range(10).toDF("v")

    t = threading.Thread(
        target=lambda: staged(spark, sf_dir, "slow_artifact", slow_build)
    )
    t.start()
    assert slow_started.wait(timeout=30)
    staged(spark, sf_dir, "fast_artifact", fast_build)  # must not block
    fast_done.set()
    t.join(timeout=60)
    assert not t.is_alive()
    assert release_staged(spark) >= 3


def test_staged_artifact_survives_cte_consumers(spark, sf_dir):
    """The r11 recompute fix: a staged artifact referenced inside a
    WITH-CTE body must NOT re-run its build. Spark's cache manager
    substitutes InMemoryRelations on the analyzed plan but inlines CTEs
    later, so persist()-based staging silently recomputed per consumer;
    localCheckpoint staging pins the artifact as a LogicalRDD leaf. The
    bigram LM query is the canonical victim: its posting table must
    appear in consumer plans as an RDD scan, never as a re-tokenize
    (Generate/explode) chain."""
    from lyft_presto_spark.queries import all_queries

    df = all_queries()["text_bigram_lm_score"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, "posting build re-ran inside a consumer"
    assert "Scan ExistingRDD" in plan  # the checkpointed posting leaf
    # and a synthetic CTE consumer of a fresh staged artifact: zero
    # re-execution of the build body
    from lyft_presto_spark.operators.staging import release_staged, staged

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(100).selectExpr("id", "id * 2 AS v")

    art = staged(spark, sf_dir, "cte_probe", build)
    art.createOrReplaceTempView("cte_probe_v")
    out = spark.sql(
        "WITH a AS (SELECT sum(v) s FROM cte_probe_v), "
        "b AS (SELECT count(*) c FROM cte_probe_v) "
        "SELECT * FROM a CROSS JOIN b"
    )
    p = out._jdf.queryExecution().executedPlan().toString()
    assert p.count("Scan ExistingRDD") == 2  # both CTE bodies read the leaf
    assert "Range" not in p  # the build plan never re-enters
    assert calls["n"] == 1
    release_staged(spark)
