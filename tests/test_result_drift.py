"""Round-over-round result-drift harness (the reference's verifier analog).

The reference's presto-verifier (presto-verifier/src/main/java/io/prestosql/
verifier/PrestoVerifier.java:1) replays a query corpus between versions and
diffs results. Here: every deterministic registered query's canonicalized
result at sf0.001 is hashed into a committed snapshot
(``tests/result_snapshots_sf0.001.json``); this test replays the corpus and
diffs hashes, so an engine regression OR a silent driver fixture regeneration
(round 2's TIMESTAMP_NTZ break) is caught locally before the driver runs.

Regenerate deliberately after an intended change:

    SPARK_GRAFT_UPDATE_SNAPSHOTS=1 python -m pytest tests/test_result_drift.py -q

and commit the snapshot diff — the git diff IS the review surface, exactly
the verifier's determinism-vs-change triage.
"""

from __future__ import annotations

import hashlib
import json
import os

import pytest

from lyft_presto_spark.queries import all_queries
from lyft_presto_spark.testing import canonicalize

SNAPSHOT_PATH = os.path.join(os.path.dirname(__file__), "result_snapshots_sf0.001.json")
SNAPSHOT_SF_DIR = "/root/testdata/sf0.001"
UPDATE = os.environ.get("SPARK_GRAFT_UPDATE_SNAPSHOTS") == "1"

QUERIES = all_queries()
# Oracle-less queries are excluded: they are the nondeterministic tail
# (bernoulli sampling, kmeans-IVF recall) whose row sets legitimately vary.
DETERMINISTIC = sorted(n for n, q in QUERIES.items() if q.oracle is not None)


def _result_fingerprint(spark, name: str) -> dict[str, object]:
    df = QUERIES[name].spark(spark, SNAPSHOT_SF_DIR)
    pdf = df.toPandas()
    rows = canonicalize(pdf)
    digest = hashlib.sha256()
    digest.update(repr(sorted(pdf.columns)).encode())
    for row in rows:
        digest.update(repr(row).encode())
    return {
        "columns": sorted(pdf.columns),
        "rows": len(rows),
        "sha256": digest.hexdigest(),
    }


def _load_snapshots() -> dict[str, dict]:
    if not os.path.exists(SNAPSHOT_PATH):
        return {}
    with open(SNAPSHOT_PATH) as f:
        return json.load(f)


if UPDATE:

    def test_update_snapshots(spark):
        snaps = {name: _result_fingerprint(spark, name) for name in DETERMINISTIC}
        with open(SNAPSHOT_PATH, "w") as f:
            json.dump(snaps, f, indent=1, sort_keys=True)
            f.write("\n")

else:

    @pytest.mark.parametrize("name", DETERMINISTIC)
    def test_no_result_drift(spark, name):
        snaps = _load_snapshots()
        if name not in snaps:
            pytest.fail(
                f"no snapshot for {name!r} — regenerate with "
                "SPARK_GRAFT_UPDATE_SNAPSHOTS=1 and commit the diff"
            )
        expected = snaps[name]
        actual = _result_fingerprint(spark, name)
        assert actual == expected, (
            f"[{name}] result drifted from committed snapshot.\n"
            f"  expected: {expected}\n  actual  : {actual}\n"
            "Causes: an engine change (review it), or a driver fixture "
            "regeneration (verify load_table normalization still holds). "
            "If intended, regenerate: SPARK_GRAFT_UPDATE_SNAPSHOTS=1 "
            "python -m pytest tests/test_result_drift.py -q"
        )
