"""bench.py contract: the headline set stays in sync with the registry.

``bench.py`` filters ``HEADLINE_EXTRAS`` with ``if n in queries`` so a
renamed/removed query would SILENTLY drop out of the bench (the driver
would keep parsing a shrinking headline set with no error). Pin the names
here so a rename fails loudly, and pin the artifact-path default so the
driver's per-round rerun can never overwrite the committed idle-window
BENCHLOCAL.json (VERDICT r10 next-round #4).
"""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_headline_extra_is_registered():
    from lyft_presto_spark.queries import all_queries

    bench = _load_bench()
    names = set(all_queries())
    missing = [n for n in bench.HEADLINE_EXTRAS if n not in names]
    assert not missing, f"bench HEADLINE_EXTRAS not registered: {missing}"


def test_last_output_line_is_the_metric(tmp_path, sf_dir):
    """End-to-end: the LAST line of a bench run's merged output parses as the
    compact metric JSON.

    The driver captures the tail of the combined output stream, so anything
    printed (or logged) after the metric displaces it — r12's BENCH_r12.json
    had parsed: null because release_staged()'s unpersist WARNs flooded in
    after the print. bench.py now runs ALL teardown (release_staged,
    spark.stop, at ERROR log level) before the metric lines; this pins it
    against regression with a real subprocess run, stderr merged into stdout
    exactly as a tail capture would see it.
    """
    import json
    import subprocess
    import sys

    env = dict(os.environ)
    env.update(
        # Reuse the suite's fixture dir (honors SPARK_GRAFT_TEST_SF_DIR /
        # SPARK_GRAFT_TEST_SF) instead of hardcoding a path (ADVICE r13).
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_ONLY="tpch_q6",
        SPARK_GRAFT_BENCH_OUT=str(tmp_path / "bench_contract.json"),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        env=env,
        cwd=REPO,
        timeout=600,
        check=True,
    )
    lines = [ln for ln in proc.stdout.decode().splitlines() if ln.strip()]
    assert lines, "bench produced no output"
    tail = json.loads(lines[-1])  # must parse — this IS the driver's signal
    assert tail["metric"] == "headline_total_median_wall"
    assert tail["failed"] == []
    assert tail["n_queries"] == 1
    # The compact line must itself carry the per-query medians: the driver's
    # PERF per-query/geomean/scaling computation parses THIS line, and the
    # full dict printed earlier lives in an oversized line the driver's
    # stdout-tail window truncates (n_common=0 in PERF_r14/r15 — VERDICT r15
    # next-round #1). 3-decimal floats keep the line tail-window-sized.
    assert set(tail["queries"]) == {"tpch_q6"}
    assert all(isinstance(v, float) and v == round(v, 3) for v in tail["queries"].values())
    # the full result object is the second-to-last line and must also parse
    full = json.loads(lines[-2])
    assert set(full["queries"]) == {"tpch_q6"}


def test_bench_default_artifact_is_not_the_committed_idle_record():
    # the default out path must be BENCHRUN_latest.json; BENCHLOCAL.json is
    # written only explicitly (SPARK_GRAFT_BENCH_OUT) during the idle-box
    # refresh, so the committed narrative and artifact cannot drift apart.
    # Assert the imported constant, not source formatting (ADVICE r11: the
    # old source-text grep broke on any innocuous rewrap).
    bench = _load_bench()
    assert os.path.basename(bench.DEFAULT_BENCH_OUT) == "BENCHRUN_latest.json"
    assert os.path.dirname(bench.DEFAULT_BENCH_OUT) == REPO
    # and the env override is what selects any other destination
    with open(os.path.join(REPO, "bench.py")) as f:
        src = f.read()
    assert "SPARK_GRAFT_BENCH_OUT" in src
