"""Custom operators beyond plain relational algebra.

Each module builds *expression fragments* in two dialects — Spark SQL and
DuckDB SQL — from shared constants, so the engine query and its oracle can
never drift. Everything Spark-side stays in catalyst/codegen (built-in
functions + lambda HOFs); there are no Python UDFs in these hot paths, which
is what keeps them viable at 100 TB (SURVEY.md §7 Phase 6).
"""
