"""Cold-vs-warm disclosure for staged-artifact queries (VERDICT r11 #6).

The bench protocol (2 prewarm + N measured) reports WARM medians: for a
staged-consumer query the one-time artifact build runs in prewarm, so the
committed median is a build-once/probe-many probe wall. That is the intended
framing, but without the cold wall a reader cannot tell a 0.1 s
"select from trained model" apart from a 1 s "train". This tool measures
both per staged-consumer headline query at sf0.1 and emits the BENCHNOTES
markdown table:

  cold  = first call in a fresh session with ALL staged artifacts released
          (includes every artifact build the query triggers)
  warm  = median of 3 subsequent calls (artifacts staged)

Run:  python tools/staged_cold.py   (prints the table; paste into BENCHNOTES)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lyft_presto_spark.operators.staging import release_staged  # noqa: E402
from lyft_presto_spark.queries import all_queries  # noqa: E402
from lyft_presto_spark.session import build_session  # noqa: E402

# Every registered query that stages at least one artifact (grep `staged(`
# / `staged_view(` call sites; keep in sync when a new consumer lands).
STAGED_QUERIES = (
    "tpch_q2", "tpch_q11", "tpch_q15",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
    "dedup_cluster_canonical", "dedup_shared_span", "dedup_incremental_delta",
    "dedup_incremental_minhash",
    "sim_ivf_partition_probe", "sim_ivf_recall", "sim_ivf_index_upsert",
    "sim_ivf_compaction",
    "text_decontaminate", "text_repetition_signals", "text_bigram_lm_score",
    "text_vocab_coverage", "text_bm25_retrieval", "text_hashed_nb_classifier",
    "text_bpe_merge_train",
    "fn_quantile_rollup",
    "sim_pq_codebook", "sim_pq_adc_search", "sim_ivfpq_search",
    "connector_tpchgen_q3", "connector_tpchgen_q5", "connector_tpchgen_q9",
    "connector_tpchgen_q18", "connector_tpchgen_q21",
    "tpcds_q11_channel_growth", "tpcds_q95_multi_supplier_returns",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    # Session prewarm on NON-staged queries so the first cold row measures
    # artifact build + probe, not JVM/codegen warmup.
    for warm_name in ("tpch_q1", "tpch_q6"):
        qs[warm_name].spark(spark, sf_dir).collect()
    rows = []
    for name in STAGED_QUERIES:
        q = qs.get(name)
        if q is None:
            print(f"staged_cold: {name} not registered, skipping", file=sys.stderr)
            continue
        release_staged(spark)  # cold: every artifact rebuilds
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).collect()
        cold = time.perf_counter() - t0
        warm = []
        for _ in range(3):
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).collect()
            warm.append(time.perf_counter() - t0)
        rows.append((name, cold, statistics.median(warm)))
    release_staged(spark)
    print("| query | cold (build + probe) s | warm probe s |")
    print("|---|---|---|")
    for name, cold, warm in rows:
        print(f"| {name} | {cold:.2f} | {warm:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
