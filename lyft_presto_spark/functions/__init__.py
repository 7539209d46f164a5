"""Presto dialect surface: function registry + SQL transpiler.

The reference's only query language is SQL text with its own function
catalog (FunctionRegistry.java:403-656). This package is the "front door"
shim (SURVEY.md §3.3, §7 Phase 3): a registry mapping every supported Presto
function to its Spark SQL spelling, and a lightweight transpiler so
Presto-dialect SQL runs on Spark unmodified. Everything resolves to built-in
Spark functions — the shim rewrites names/arguments, it never adds UDFs.
"""

from .presto import FUNCTION_MAP, presto_sql, transpile

__all__ = ["FUNCTION_MAP", "transpile", "presto_sql"]
