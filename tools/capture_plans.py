#!/usr/bin/env python
"""Capture .explain('formatted') for named queries into plans/<round>/<q>_<tag>.txt.

Usage: python tools/capture_plans.py <tag> <query> [query ...]
Runs at $SPARK_GRAFT_SF_DIR (default sf0.1) so the plans match the bench scale.
The round subdirectory defaults to r16; override with $SPARK_GRAFT_PLANS_ROUND.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lyft_presto_spark.queries import all_queries  # noqa: E402
from lyft_presto_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"),
)


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    qs = all_queries()
    spark = build_session(app_name="capture_plans")
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        df = qs[name].spark(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
