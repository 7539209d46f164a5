"""Every registered query with an oracle must match DuckDB exactly.

This is the local mirror of the driver's CORRECTNESS gate (and of the
reference's AbstractTestQueries-vs-H2 mechanism, SURVEY.md §5).
"""

from __future__ import annotations

import pytest

from lyft_presto_spark.queries import all_queries
from lyft_presto_spark.testing import compare_with_oracle

QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, sf_dir, name):
    q = QUERIES[name]
    compare_with_oracle(q.spark(spark, sf_dir), q.oracle, sf_dir, name=name)


if ROWS_ONLY:
    # Queries without an oracle get the driver's weaker rows-only check.
    @pytest.mark.parametrize("name", ROWS_ONLY)
    def test_rows_only_runs(spark, sf_dir, name):
        q = QUERIES[name]
        df = q.spark(spark, sf_dir)
        # Must at least execute and produce a stable schema.
        assert df.columns
        assert df.count() >= 0
else:
    # The rows-only set emptied in r10 (every registered query carries an
    # oracle). An empty parametrize set reports as an unexplained SKIP
    # (the r10 suite's lone skip — VERDICT r10 next-round #5); pin the
    # emptiness as a passing test instead, loudly naming the state.
    def test_rows_only_set_is_empty():
        assert ROWS_ONLY == []
