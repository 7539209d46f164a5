"""Query inventory: the engine's declared operator surface.

Every module in this package registers named queries into
``registry.REGISTRY``. ``lyft_presto_spark.queries.all_queries()`` imports all
modules and returns the full inventory — this is what ``__spark_entry__.py``
exposes to the driver and what the test harness runs against the DuckDB
oracle.
"""

from __future__ import annotations

from .registry import REGISTRY, Query, query


def all_queries() -> dict[str, Query]:
    # Import registers; keep the list explicit so a broken module is loud.
    # Registration order is also evaluation order for budgeted scorers, so
    # modules run cheapest-first within each tier: core relational surface,
    # then scalar/agg families, then the heavier pipeline operators (exploded
    # posting tables, Python-worker spawns) last.
    from . import tpch  # noqa: F401
    from . import relational  # noqa: F401
    from . import functions_sql  # noqa: F401
    from . import events  # noqa: F401
    from . import text_pipeline  # noqa: F401
    from . import similarity_queries  # noqa: F401
    from . import dedup_queries  # noqa: F401
    from . import multimodal_queries  # noqa: F401

    return dict(REGISTRY)


__all__ = ["REGISTRY", "Query", "query", "all_queries"]
