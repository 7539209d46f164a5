"""Scale-stability guard: representative shuffle-heavy queries must scale
~linearly from sf0.001 to sf0.01 (10x data). Catches a plan that silently
degrades to all-pairs or loses a pushdown before the driver's bench does
(VERDICT r3 next-round #5). The committed RATIOS.json snapshot (sf0.01 ->
sf0.1, tools/scale_ratios.py) is the full-corpus record; this test keeps a
cheap always-on subset in the suite."""

from __future__ import annotations

import time

import pytest

from lyft_presto_spark.operators.staging import release_staged
from lyft_presto_spark.queries import all_queries

# One representative per machinery family; sim_pairs_blocked is deliberately
# absent (pairwise-within-block stats are super-linear by contract).
GUARDED = [
    "tpch_q1",  # wide hash aggregate
    "tpch_q9",  # multi-join
    "events_sessionize",  # window lag-gap-cumsum
    "dedup_minhash_lsh",  # explode + banded self-join
    "op_spatial_bbox_join",  # grid-blocked spatial join
    "text_decontaminate",  # inverted-index semi-join
]
# 10x data; generous bound (fixed overhead keeps small-sf ratios noisy, and a
# genuine all-pairs regression shows up as ~100x, far above this).
MAX_RATIO = 20.0
FLOOR_S = 1.0  # below this wall, overhead dominates and the ratio is noise


def _wall(q, spark, sf: str) -> float:
    q.spark(spark, sf).write.format("noop").mode("overwrite").save()  # prewarm
    t0 = time.perf_counter()
    q.spark(spark, sf).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def test_incremental_merge_clears_remeasured_alerts_and_rejects_mixed_scales():
    """ADVICE r12: the old merge unioned new alerts into the stored set (a
    re-measured-clean query could never clear its alert short of a full
    sweep) and never checked the doc's scale pair against the current env."""
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "scale_ratios", os.path.join(repo, "tools", "scale_ratios.py")
    )
    sr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sr)

    doc = {
        "sf_a": "a_dir", "sf_b": "b_dir",
        "alerts": ["q_bad", "q_untouched"],
        "queries": {"q_bad": {"ratio": 12.0, "flagged": True}},
    }
    # q_bad re-measured clean: its alert clears; q_untouched's survives;
    # a fresh alert from this run (q_new) joins.
    merged = sr.merge_incremental(
        doc,
        out={"q_bad": {"ratio": 1.1, "flagged": False},
             "q_new": {"ratio": 9.0, "flagged": True}},
        alerts=["q_new"],
        names=["q_bad", "q_new"],
        sf_a="a_dir", sf_b="b_dir",
    )
    assert merged["alerts"] == ["q_new", "q_untouched"]
    assert merged["queries"]["q_bad"]["ratio"] == 1.1
    # mixed scale pair: refuse loudly rather than blend entries
    with pytest.raises(sr.ScaleMismatch):
        sr.merge_incremental(
            {"sf_a": "a_dir", "sf_b": "OTHER", "alerts": [], "queries": {}},
            out={}, alerts=[], names=[], sf_a="a_dir", sf_b="b_dir",
        )


@pytest.mark.parametrize("name", GUARDED)
def test_query_scales_linearly(spark, name):
    qs = all_queries()
    ta = _wall(qs[name], spark, "/root/testdata/sf0.001")
    tb = _wall(qs[name], spark, "/root/testdata/sf0.01")
    release_staged(spark)
    if tb < FLOOR_S:
        return  # overhead-dominated at these scales; nothing to measure
    assert tb / max(ta, 1e-3) < MAX_RATIO, (
        f"{name} scaled {tb / ta:.1f}x for 10x data (a={ta:.2f}s b={tb:.2f}s) — "
        "check for all-pairs joins or lost pushdown"
    )
