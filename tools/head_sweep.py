#!/usr/bin/env python
"""Run the driver-scored head-50 queries against their DuckDB oracles.

Local pre-flight for the driver's CORRECTNESS gate: every entry in
``DRIVER_SCORED_HEAD`` runs at ``$SPARK_GRAFT_SF_DIR`` (default sf0.01 —
the driver's correctness scale) and is compared with ``compare_with_oracle``
(the strict driver-hash-parity compare). Prints one line per query and a
final summary; exits nonzero on any mismatch.

Usage: python tools/head_sweep.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lyft_presto_spark.queries import DRIVER_SCORED_HEAD, all_queries  # noqa: E402
from lyft_presto_spark.session import build_session  # noqa: E402
from lyft_presto_spark.testing import compare_with_oracle  # noqa: E402


def main() -> int:
    sf_dirs = sys.argv[1:] or [
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    ]
    queries = all_queries()
    spark = build_session(app_name="head_sweep")
    bad = 0
    for sf_dir in sf_dirs:
        for name in DRIVER_SCORED_HEAD:
            q = queries[name]
            t0 = time.perf_counter()
            try:
                if q.oracle is None:
                    df = q.spark(spark, sf_dir)
                    assert df.columns and df.count() >= 0
                    status = "rows-only"
                else:
                    compare_with_oracle(q.spark(spark, sf_dir), q.oracle, sf_dir, name=name)
                    status = "ok"
            except Exception as e:  # noqa: BLE001 — report every row
                status = f"FAIL: {e}"
                bad += 1
            print(f"{sf_dir} {name}: {status} ({time.perf_counter() - t0:.2f}s)", flush=True)
    print(f"head_sweep: {bad} failures over {len(sf_dirs)} scale(s)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
