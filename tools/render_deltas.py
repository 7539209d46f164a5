#!/usr/bin/env python
"""Render DELTAS.md from the in-code delta registry (single source of truth).

Run after editing ``lyft_presto_spark.functions.presto.DELTAS``:

    python tools/render_deltas.py

``tests/test_deltas_doc.py`` fails if the rendered file is stale.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lyft_presto_spark.functions.presto import DELTAS  # noqa: E402

HEADER = """\
# DELTAS — semantic differences a migrating user must know

Function-level behavior deltas between the reference (Presto 319) and this
engine, maintained as `lyft_presto_spark.functions.presto.DELTAS` (the code
is the source of truth; this file is rendered by `tools/render_deltas.py`).
Type-system modeling decisions (TIME, TIME WITH TIME ZONE, timestamps) live
in `COVERAGE.md` §1.2.

| Function | Delta |
|---|---|
"""


def render() -> str:
    rows = "".join(f"| `{k}` | {v} |\n" for k, v in sorted(DELTAS.items()))
    return HEADER + rows


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "DELTAS.md")
    with open(out, "w") as f:
        f.write(render())
    print(f"wrote {out} ({len(DELTAS)} deltas)")
