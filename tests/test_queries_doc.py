"""QUERIES.md must stay in sync with the query registry."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from render_queries import render  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_queries_md_is_current():
    with open(os.path.join(REPO, "QUERIES.md")) as f:
        on_disk = f.read()
    assert on_disk == render(), (
        "QUERIES.md is stale — regenerate with: python tools/render_queries.py"
    )
