"""DELTAS.md must stay in sync with the in-code delta registry."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from render_deltas import render  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_deltas_md_is_current():
    with open(os.path.join(REPO, "DELTAS.md")) as f:
        on_disk = f.read()
    assert on_disk == render(), (
        "DELTAS.md is stale — regenerate with: python tools/render_deltas.py"
    )
