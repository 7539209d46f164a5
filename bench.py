#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline query set at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Protocol mirrors the reference's benchto config (prewarm + repeated measured
runs, median reported — presto-benchto-benchmarks/src/main/resources/
benchmarks/presto/tpch.yaml:3-6; see BASELINE.md), scaled down for per-round
wall-clock budget: 1 prewarm + ``SPARK_GRAFT_BENCH_RUNS`` (default 3) measured
runs per query.

Execution is forced with a noop sink (the reference's blackhole connector
analog — presto-blackhole) so we measure full plan execution without driver
collect overhead. Round-over-round drift triage (median vs min vs the
fixed-cost probe) is documented in BENCHNOTES.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lyft_presto_spark.operators.staging import release_staged  # noqa: E402
from lyft_presto_spark.queries import all_queries  # noqa: E402
from lyft_presto_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# Floor of 3 measured runs: a median of 2 is a mean, so one GC/ambient-load
# spike doubles the reported number (round 2's q1: 6.03 s recorded vs 1.5 s
# isolated). Three samples let the median discard a single outlier.
RUNS = max(int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")), 3)

# Headline set: the full TPC-H corpus we implement plus one representative
# per extension family (events analytics, text, dedup, similarity). Keeping
# the extension list to representatives bounds per-round bench wall-clock;
# correctness for the rest is covered by the oracle gate.
# Default artifact is BENCHRUN_latest.json — NOT BENCHLOCAL.json — so the
# driver's per-round rerun can never overwrite the committed idle-window
# record (VERDICT r10 #4). Module-level so the contract test asserts the
# resolved value, not source formatting (ADVICE r11).
DEFAULT_BENCH_OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCHRUN_latest.json"
)

HEADLINE_PREFIXES = ("tpch_",)
HEADLINE_EXTRAS = (
    "events_tumbling_window",
    "events_tumbling_window_hll",
    "events_sessionize",
    "text_quality_score",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_topk_bruteforce",
    "multimodal_features",
    "op_spatial_bbox_join",
    "op_spatial_kdb_join",
    "op_spatial_polygon_pair_join",
    "geo_union_agg",
    # TPC-DS-shape representatives (r6): the three heaviest operator
    # combinations from the new corpus — rollup+grouping+rank, cumulative
    # windows + full outer join, repeated-CTE semi-joins.
    "tpcds_q36_rollup_margin_rank",
    "tpcds_q51_cumulative_crossover",
    "tpcds_q95_multi_supplier_returns",
    # r7 additions: rank-over-full-ROLLUP, the three-channel no-returns
    # outer-join chain, and the six-leg repeated-CTE growth gate.
    "tpcds_q67_rollup_topn",
    "tpcds_q78_channel_ratio_chain",
    "tpcds_q04_triple_channel_growth",
    # r8 additions: the three-date-role chained fact scans, the FULL OUTER
    # distinct-set overlap census, and the four-instance year-total
    # self-join — the heaviest new operator combinations this round.
    "tpcds_q25_chained_repurchase_profit",
    "tpcds_q97_channel_overlap",
    "tpcds_q74_min_ratio_growth_gate",
    # r9 additions: the generator-connector TPC-H Q3 (executor-side row
    # synthesis end-to-end), the restructured exact-rational overlay row
    # (formerly the heaviest registry entry — keep it watched), and the
    # bigram-LM quality filter (two model aggs + postings equi-joins).
    "connector_tpchgen_q3",
    "fn_geo_boolean_ops",
    "text_bigram_lm_score",
    # r10 additions: the generator Q9 join web (widest TPC-H chain on the
    # connector), BM25 retrieval (distributed top-k ranking), the hashed
    # NB classifier (model-as-relational-algebra), int8 embedding
    # quantization, and the prepared-cache-reworked generic intersection
    # dispatcher (formerly the heaviest registry wall — keep it watched).
    "connector_tpchgen_q9",
    "text_bm25_retrieval",
    "text_hashed_nb_classifier",
    "sim_int8_quantization",
    "fn_geo_intersection_any",
    # r11 additions: BPE merge training (three staged corpus passes +
    # top-1 picks), PQ codebook training (two exact-integer Lloyd
    # iterations), PQ ADC search (coding + LUT ranking), and the two new
    # generator-catalog shapes.
    "text_bpe_merge_train",
    "sim_pq_codebook",
    "sim_pq_adc_search",
    "connector_tpchgen_q1",
    "connector_tpchgen_q18",
    # r12 additions: the composed IVF-PQ search (coarse probe + ADC over
    # the probed cells' codes), and the two heaviest new generator-catalog
    # shapes — the region-gated six-way q5 and the EXISTS/NOT-EXISTS
    # anti-join web q21 (the corpus now serves all 22 TPC-H shapes; these
    # two are its widest join web and its decorrelated semi+anti pair).
    "sim_ivfpq_search",
    "connector_tpchgen_q5",
    "connector_tpchgen_q21",
    # r13 additions: the cell-partitioned IVF index write+probe path and
    # the recall@10 evaluation (the index's storage and quality stories),
    # the incremental ingestion dedup gate (delta vs standing corpus), and
    # the shared-span detector now that its stop-gram df cap is algebra.
    "sim_ivf_partition_probe",
    "sim_ivf_recall",
    "sim_ivf_index_upsert",
    "dedup_incremental_delta",
    "dedup_incremental_minhash",
    "dedup_shared_span",
    # r14 addition: the IVF compaction decision (census trigger + targeted
    # re-cluster of overgrown cells), completing the ANN lifecycle.
    "sim_ivf_compaction",
    # r15 additions: semantic dedup through the shared IVF cell index
    # (cell-bucketed candidate join + exact integer refine + closure) and
    # its incremental form — the embedding admission gate (batch coded
    # against the frozen codebook, gated against the standing corpus
    # cells).
    "dedup_semantic",
    "dedup_semantic_incremental",
    # r15 addition: the tombstone-delete census + purge decision, the
    # lifecycle step compaction presupposes.
    "sim_ivf_delete",
    # r15 addition: quality-ranked canonical selection (keep the BEST
    # cluster member by the shared quality score, not the first).
    "dedup_canonical_best",
    # r16 addition (VERDICT r15 what's-wrong #1): dedup_semantic and
    # dedup_canonical_best stage the connected-components MAP itself, so
    # after the prewarm no measured rep executed the min-label closure
    # anywhere in the bench. This row keeps its closure in-query (only the
    # edge set is staged — the accepted artifact precedent), so the
    # closure's iterative propagation is honestly timed every rep.
    "dedup_cluster_canonical",
)


def force(df) -> None:
    """Fully execute a DataFrame without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    queries = all_queries()
    names = [n for n in sorted(queries) if n.startswith(HEADLINE_PREFIXES)]
    names += [n for n in HEADLINE_EXTRAS if n in queries]
    # Test hook: restrict the set to a comma-separated allowlist so the
    # output-contract test (last line == metric JSON) can exercise a real
    # end-to-end bench run without the full headline set's wall-clock.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        allow = {n.strip() for n in only.split(",") if n.strip()}
        names = [n for n in names if n in allow]

    spark = build_session(app_name="lyft_presto_spark_bench")

    # Session prewarm: JVM/codegen warm-up on a tiny independent query.
    spark.range(1_000_000).selectExpr("sum(id) AS s").collect()

    # Measured passes are interleaved round-robin (pass 1 runs every query,
    # then pass 2, ...) so a transient ambient-load spike inflates at most one
    # sample per query instead of poisoning every sample of whichever query it
    # lands on — the per-query median then discards it. Each pass starts at a
    # rotated offset: with a fixed order the same query opens every pass and
    # alone absorbs whatever the pass boundary costs (post-pass GC, cache
    # churn) in ALL of its samples, which the median cannot discard — r3's q1
    # measured 1.35x its r1 wall purely from that position (VERDICT r3 perf
    # note). Rotation spreads the boundary cost across queries, at most one
    # sample each.
    samples: dict[str, list[float]] = {n: [] for n in names}
    # Fixed-cost probe (VERDICT r6 next-round #3): time a constant-plan
    # 1-row noop write at the start of every measured pass. Its wall is pure
    # harness overhead — job scheduling, noop-sink commit, JIT/GC ambient —
    # with zero per-query work, so round-over-round drift in the probe is
    # environment drift, and per-query medians can be read net of it.
    probe_samples: list[float] = []
    broken: dict[str, str] = {}
    for name in names:  # prewarm pass (parquet footer cache, codegen)
        try:
            force(queries[name].spark(spark, SF_DIR))
        except Exception as e:  # noqa: BLE001 — a broken query shouldn't kill the bench
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            broken[name] = str(e)
    force(spark.range(1).selectExpr("id"))  # probe prewarm (codegen for the shape)
    for i in range(RUNS):
        t0 = time.perf_counter()
        force(spark.range(1).selectExpr("id"))
        probe_samples.append(time.perf_counter() - t0)
        offset = (i * max(len(names) // RUNS, 1)) % max(len(names), 1)
        for name in names[offset:] + names[:offset]:
            if name in broken:
                continue
            t0 = time.perf_counter()
            try:
                force(queries[name].spark(spark, SF_DIR))
            except Exception as e:  # noqa: BLE001
                print(f"bench: {name} failed: {e}", file=sys.stderr)
                broken[name] = str(e)
                continue
            samples[name].append(time.perf_counter() - t0)

    per_query: dict[str, float] = {
        name: (-1.0 if name in broken else round(statistics.median(samples[name]), 4))
        for name in names
    }
    # Per-query MIN alongside the median (VERDICT r5 next-round #7): when a
    # pinned-plan query's median regresses round-over-round, the min shows
    # whether the plan got slower (min moves too) or a pass-boundary /
    # ambient spike landed on it (min stays put — variance, not regression).
    per_query_min: dict[str, float] = {
        name: (-1.0 if name in broken else round(min(samples[name]), 4))
        for name in names
    }

    failed = sorted(n for n, v in per_query.items() if v < 0)
    # A failed query must never *improve* the headline number: each one is
    # charged a penalty larger than any real query's wall, and the process
    # exits nonzero so a regression is loud (ADVICE r1).
    penalty = 60.0 * len(failed)
    total = round(sum(v for v in per_query.values() if v > 0) + penalty, 4)
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    result = {
        "metric": "headline_total_median_wall",
        "value": total,
        "unit": "sec",
        # The driver also reruns the bench at a lower core count; stamping
        # the run's cores into the artifact keeps an 8-CPU rerun landing in
        # BENCHRUN_latest.json from being misread as the 32-CPU record
        # (VERDICT r15 minor #5).
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "queries": per_query,
        "queries_min": per_query_min,
        "probe": {
            "samples": [round(s, 4) for s in probe_samples],
            "median": round(statistics.median(probe_samples), 4),
            "min": round(min(probe_samples), 4),
        },
        "failed": failed,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }
    # The driver captures only the TAIL of stdout, and in r7 the per-query
    # block outgrew that window (14 of 41 medians truncated, parsed: null in
    # BENCH_r07.json). Persist the full JSON to a committable artifact, then
    # print it LAST so whatever the capture window keeps is the freshest and
    # the artifact is the authoritative record (VERDICT r7 next-round #4).
    # Default artifact is BENCHRUN_latest.json — NOT BENCHLOCAL.json — so the
    # driver's per-round rerun can never overwrite the committed idle-window
    # record and drift it away from the BENCHNOTES narrative (VERDICT r10
    # next-round #4). The idle-box refresh writes BENCHLOCAL.json explicitly
    # via SPARK_GRAFT_BENCH_OUT.
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT", DEFAULT_BENCH_OUT)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    # ALL teardown runs BEFORE the metric prints. In r12 the metric printed
    # first and release_staged() — whose ADVICE-r11 fix made it genuinely
    # unpersist locally-checkpointed RDDs — flooded "RDD ... was locally
    # checkpointed ... cannot be recomputed" WARNs after it; the driver's
    # stdout-tail capture kept the WARNs and lost the metric (BENCH_r12.json
    # parsed: null). Silence logging for teardown too: nothing may write to
    # the output stream after this point except the metric lines themselves
    # (pinned by tests/test_bench_contract.py::test_last_output_line_is_the_metric).
    spark.sparkContext.setLogLevel("ERROR")
    release_staged(spark)  # reclaim persisted signature/supply artifacts
    spark.stop()
    print(json.dumps(result))
    # The full JSON above is ~36 KB and the driver's stdout-tail window has
    # truncated it three rounds running (BENCH_r07..r09 parsed: null). Emit a
    # compact self-sufficient summary as the LAST stdout line — small enough
    # that any tail window keeps it intact — so the driver's parse succeeds
    # even without the committed artifact (VERDICT r9 next-round #2).
    # The compact line CARRIES the per-query medians (3-decimal, ~2.5 KB for
    # 71 queries): omitting them broke the driver's PERF per-query/geomean/
    # scaling computation two rounds running (n_common=0, VERDICT r15
    # next-round #1) because the full dict above lives only in the oversized
    # line the tail window truncates. 3 decimals keeps the line small enough
    # to survive any tail window while losing nothing a ms-scale comparison
    # needs.
    print(
        json.dumps(
            {
                "metric": result["metric"],
                "value": result["value"],
                "unit": "sec",
                "sf": result["sf"],
                "n_queries": len(per_query),
                "queries": {n: round(v, 3) for n, v in per_query.items()},
                "failed": failed,
                "probe_median": result["probe"]["median"],
                "full_results": os.path.basename(out_path),
            }
        )
    )
    sys.stdout.flush()
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
