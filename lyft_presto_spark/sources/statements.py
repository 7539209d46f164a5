"""Metadata statement surface: SHOW / DESCRIBE / PREPARE / EXECUTE / session control.

The reference exposes catalog metadata through SQL statements
(SqlBase.g4:33-118 — SHOW CATALOGS/SCHEMAS/TABLES/COLUMNS/FUNCTIONS/STATS/
SESSION, DESCRIBE [INPUT|OUTPUT], PREPARE/EXECUTE/DEALLOCATE, USE,
SET/RESET SESSION, transaction statements; resolved by MetadataManager.java).
Here the same statements resolve against the CatalogManager
(sources/connectors.py) plus the live SparkSession catalog/conf, and return
ordinary DataFrames.

Metadata results are tiny (bounded by table/function counts, never data
volume), so building them driver-side is the correct shape at any scale —
SHOW STATS is the one exception and computes its aggregates distributed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .connectors import CatalogManager

_DEFAULT_MANAGER: CatalogManager | None = None
_PREPARED: dict[str, str] = {}


def set_default_manager(mgr: CatalogManager) -> None:
    """Mount the CatalogManager the statement surface resolves against."""
    global _DEFAULT_MANAGER
    _DEFAULT_MANAGER = mgr


def _manager() -> CatalogManager:
    global _DEFAULT_MANAGER
    if _DEFAULT_MANAGER is None:
        _DEFAULT_MANAGER = CatalogManager()
    return _DEFAULT_MANAGER


STATEMENT_RE = re.compile(
    r"^\s*(SHOW|DESCRIBE|DESC|PREPARE|EXECUTE|DEALLOCATE|EXPLAIN|USE|SET|RESET|"
    r"START|COMMIT|ROLLBACK|CALL|GRANT|REVOKE)\b",
    re.IGNORECASE,
)

# Session properties surfaced by SHOW SESSION — the Spark confs that map to
# the reference's commonly-used session properties (SystemSessionProperties.java).
_SESSION_PROPS = (
    "spark.sql.shuffle.partitions",
    "spark.sql.adaptive.enabled",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.ansi.enabled",
    "spark.sql.session.timeZone",
    "spark.sql.files.maxPartitionBytes",
)


def is_statement(sql: str) -> bool:
    return STATEMENT_RE.match(sql) is not None


def _session_tables(spark: SparkSession) -> list[str]:
    return sorted(t.name for t in spark.catalog.listTables())


def _resolve_table(spark: SparkSession, name: str) -> DataFrame:
    """Resolve ``[catalog.]table`` against mounted catalogs, then the session."""
    mgr = _manager()
    if "." in name:
        cat, tbl = name.split(".", 1)
        if cat in mgr.list_catalogs():
            return mgr.table(spark, cat, tbl)
    for cat in mgr.list_catalogs():
        if name in mgr.catalog(cat).tables:
            return mgr.table(spark, cat, name)
    return spark.table(name)


_SYSTEM_RUNTIME_RE = re.compile(r"\bsystem\.runtime\.(nodes|queries)\b", re.IGNORECASE)


def rewrite_system_tables(spark: SparkSession, sql: str) -> str:
    """Mount system.runtime introspection tables referenced by a query.

    The reference's system connector exposes cluster state as tables
    (presto-main SystemConnector — system.runtime.nodes/queries). Here the
    "cluster" is the SparkContext: nodes reports the app's executors-view,
    queries the scheduler's active/completed job state. Referenced names are
    registered as temp views and the dotted name rewritten to the view.
    """

    def mount(m: re.Match) -> str:
        kind = m.group(1).lower()
        view = f"system_runtime_{kind}"
        sc = spark.sparkContext
        if kind == "nodes":
            rows = [
                (
                    sc.applicationId,
                    sc.master,
                    sc.version,
                    True,
                    "active",
                )
            ]
            spark.createDataFrame(
                rows,
                "node_id string, http_uri string, node_version string, "
                "coordinator boolean, state string",
            ).createOrReplaceTempView(view)
        else:
            tracker = sc.statusTracker()
            rows = []
            for jid in tracker.getActiveJobsIds():
                info = tracker.getJobInfo(jid)
                rows.append((str(jid), "RUNNING" if info else "UNKNOWN"))
            spark.createDataFrame(
                rows or [("none", "FINISHED")], "query_id string, state string"
            ).createOrReplaceTempView(view)
        return view

    return _SYSTEM_RUNTIME_RE.sub(mount, sql)


def _presto_type_name(spark_type: str) -> str:
    """Spark simpleString -> Presto type spelling (inverse of _TYPE_RENAMES)."""
    base = {
        "string": "varchar",
        "binary": "varbinary",
        "float": "real",
        "int": "integer",
        "timestamp": "timestamp(6)",
        "timestamp_ntz": "timestamp(6)",
    }
    t = spark_type.strip()
    m = re.fullmatch(r"array<(.+)>", t)
    if m:
        return f"array({_presto_type_name(m.group(1))})"
    m = re.fullmatch(r"map<(.+)>", t)
    if m:
        # Split at the TOP-LEVEL comma: key types can themselves contain
        # commas (map<decimal(10,2),string>), so a first-comma split renders
        # malformed DDL (ADVICE r3).
        k, v = _split_top_level(m.group(1), limit=2)
        return f"map({_presto_type_name(k)}, {_presto_type_name(v)})"
    m = re.fullmatch(r"struct<(.+)>", t)
    if m:
        fields = []
        for field in _split_top_level(m.group(1)):
            name, _, ftype = field.partition(":")
            fields.append(f"{name.strip()} {_presto_type_name(ftype)}")
        return f"row({', '.join(fields)})"
    return base.get(t, t)


def _split_top_level(s: str, limit: int = 0) -> list[str]:
    """Split on commas at bracket depth 0 (over ``<>()``); at most ``limit``
    parts when given (the tail keeps its commas)."""
    parts: list[str] = []
    depth, start = 0, 0
    for i, ch in enumerate(s):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i].strip())
            start = i + 1
            if limit and len(parts) == limit - 1:
                break
    parts.append(s[start:].strip())
    return parts


def execute_statement(spark: SparkSession, sql: str) -> DataFrame:
    """Run one metadata statement; raises ValueError on unknown syntax."""
    mgr = _manager()
    s = sql.strip().rstrip(";").strip()
    u = s.upper()

    if u == "SHOW CATALOGS":
        names = sorted(set(mgr.list_catalogs()) | {"spark"})
        return spark.createDataFrame([(n,) for n in names], "catalog string")

    m = re.fullmatch(r"SHOW\s+SCHEMAS(?:\s+FROM\s+(\w+))?", s, re.IGNORECASE)
    if m:
        cat = (m.group(1) or "spark").lower()
        if cat == "spark":
            names = sorted(d.name for d in spark.catalog.listDatabases())
        else:
            mgr.catalog(cat)  # existence check
            names = ["default"]
        return spark.createDataFrame([(n,) for n in names], "schema string")

    m = re.fullmatch(r"SHOW\s+TABLES(?:\s+FROM\s+(\w+))?", s, re.IGNORECASE)
    if m:
        cat = (m.group(1) or "").lower()
        if cat and cat != "spark":
            names = mgr.catalog(cat).list_tables()
        else:
            names = _session_tables(spark)
        return spark.createDataFrame([(n,) for n in names], "table string")

    m = re.fullmatch(r"DESCRIBE\s+INPUT\s+(\w+)", s, re.IGNORECASE)
    if m:
        name = m.group(1).lower()
        if name not in _PREPARED:
            raise ValueError(f"prepared statement {name!r} not found")
        from ..functions.presto import _mask_literals

        masked, _ = _mask_literals(_PREPARED[name])
        n_params = masked.count("?")
        # Parameter types are inference-dependent in the reference
        # (DescribeInput -> unknown until bound); report positions.
        return spark.createDataFrame(
            [(i, "unknown") for i in range(n_params)] or [(None, None)],
            "position int, type string",
        )

    m = re.fullmatch(r"DESCRIBE\s+OUTPUT\s+(\w+)", s, re.IGNORECASE)
    if m:
        name = m.group(1).lower()
        if name not in _PREPARED:
            raise ValueError(f"prepared statement {name!r} not found")
        from ..functions.presto import _mask_literals, transpile

        masked, lits = _mask_literals(_PREPARED[name])
        if "?" in masked:
            raise ValueError("DESCRIBE OUTPUT of a parameterized statement requires bound values")
        out = spark.sql(transpile(_PREPARED[name])).limit(0)
        rows = [(f.name, f.dataType.simpleString(), f.nullable) for f in out.schema.fields]
        return spark.createDataFrame(rows, "column string, type string, nullable boolean")

    m = re.fullmatch(r"DEALLOCATE\s+(?:PREPARE\s+)?(\w+)", s, re.IGNORECASE)
    if m:
        name = m.group(1).lower()
        if name not in _PREPARED:
            raise ValueError(f"prepared statement {name!r} not found")
        del _PREPARED[name]
        return spark.createDataFrame([(name, "DEALLOCATED")], "name string, status string")

    m = re.fullmatch(r"SHOW\s+CREATE\s+(?:TABLE|VIEW)\s+([\w.]+)", s, re.IGNORECASE)
    if m:
        # ShowCreate.java renders reconstructed DDL in Presto type spellings;
        # here the DDL is synthesized from the resolved Spark schema with the
        # inverse of the transpiler's type mapping.
        name = m.group(1)
        df = _resolve_table(spark, name)
        cols = ",\n".join(
            f"   {f.name} {_presto_type_name(f.dataType.simpleString())}"
            for f in df.schema.fields
        )
        ddl = f"CREATE TABLE {name.split('.')[-1]} (\n{cols}\n)\nWITH (\n   format = 'PARQUET'\n)"
        return spark.createDataFrame([(ddl,)], "`Create Table` string")

    m = re.fullmatch(
        r"(?:SHOW\s+COLUMNS\s+FROM|DESCRIBE|DESC)\s+([\w.]+)", s, re.IGNORECASE
    )
    if m:
        df = _resolve_table(spark, m.group(1))
        rows = [(f.name, f.dataType.simpleString(), f.nullable) for f in df.schema.fields]
        return spark.createDataFrame(rows, "column string, type string, nullable boolean")

    m = re.fullmatch(r"SHOW\s+FUNCTIONS(?:\s+LIKE\s+'([^']*)')?", s, re.IGNORECASE)
    if m:
        from ..functions.presto import FUNCTION_MAP

        pat = (m.group(1) or "%").replace("%", ".*").replace("_", ".")
        rx = re.compile(f"^{pat}$", re.IGNORECASE)
        rows = sorted((k, v) for k, v in FUNCTION_MAP.items() if rx.match(k))
        return spark.createDataFrame(rows, "function string, spark_mapping string")

    m = re.fullmatch(r"SHOW\s+STATS\s+FOR\s+([\w.]+)", s, re.IGNORECASE)
    if m:
        # Distributed single-pass stats (the reference's SHOW STATS shape:
        # one row per column + a row-count summary row).
        from pyspark.sql import functions as F

        df = _resolve_table(spark, m.group(1))
        aggs: list = [F.count(F.lit(1)).alias("__rows")]
        for f in df.schema.fields:
            aggs.append(F.approx_count_distinct(f.name).alias(f"__ndv_{f.name}"))
            aggs.append(F.sum(F.when(F.col(f.name).isNull(), 1).otherwise(0)).alias(f"__nulls_{f.name}"))
        r = df.agg(*aggs).first()
        rows = [
            (f.name, int(r[f"__ndv_{f.name}"]), int(r[f"__nulls_{f.name}"]), int(r["__rows"]))
            for f in df.schema.fields
        ]
        return spark.createDataFrame(
            rows, "column string, approx_ndv bigint, null_count bigint, row_count bigint"
        )

    m = re.fullmatch(r"SHOW\s+SESSION(?:\s+LIKE\s+'([^']*)')?", s, re.IGNORECASE)
    if m:
        pat = (m.group(1) or "%").replace("%", ".*").replace("_", ".")
        rx = re.compile(f"^{pat}$", re.IGNORECASE)
        def _get(p: str) -> str:
            try:
                return str(spark.conf.get(p))
            except Exception:  # noqa: BLE001 — unset conf with no default
                return "<unset>"

        rows = [(p, _get(p)) for p in _SESSION_PROPS if rx.match(p)]
        return spark.createDataFrame(rows, "name string, value string")

    m = re.fullmatch(r"SET\s+SESSION\s+([\w.]+)\s*=\s*(.+)", s, re.IGNORECASE)
    if m:
        key, val = m.group(1), m.group(2).strip().strip("'")
        spark.conf.set(key, val)
        return spark.createDataFrame([(key, val)], "name string, value string")

    m = re.fullmatch(r"RESET\s+SESSION\s+([\w.]+)", s, re.IGNORECASE)
    if m:
        spark.conf.unset(m.group(1))
        return spark.createDataFrame([(m.group(1), "RESET")], "name string, status string")

    m = re.fullmatch(r"USE\s+(?:(\w+)\.)?(\w+)", s, re.IGNORECASE)
    if m:
        # USE [catalog.]schema — only the spark catalog carries schemas here.
        spark.catalog.setCurrentDatabase(m.group(2))
        return spark.createDataFrame([(m.group(2), "USING")], "schema string, status string")

    # Transactions: the reference runs autocommit by default and delegates
    # transactional semantics to connectors (TransactionManager.java); the
    # parquet/dir connectors here have none, matching most Presto
    # deployments. BEGIN/COMMIT are accepted no-ops; ROLLBACK errors rather
    # than silently not undoing.
    if re.fullmatch(r"START\s+TRANSACTION.*|COMMIT(\s+WORK)?", s, re.IGNORECASE | re.DOTALL):
        return spark.createDataFrame([(s.split()[0].upper(), "OK (autocommit)")], "statement string, status string")
    if re.fullmatch(r"ROLLBACK(\s+WORK)?", s, re.IGNORECASE):
        raise ValueError("ROLLBACK is unsupported: connectors are non-transactional (autocommit)")

    # CALL + role DCL (SqlBase.g4:33-118): the reference resolves procedures
    # and roles against the connector (ProcedureRegistry.java,
    # AccessControlManager); the directory/parquet connectors here register
    # neither, which in the reference surfaces as PROCEDURE_NOT_FOUND /
    # access-control errors. Fail loudly with the same meaning.
    m = re.fullmatch(r"CALL\s+([\w.]+)\s*\(.*\)", s, re.IGNORECASE | re.DOTALL)
    if m:
        raise ValueError(
            f"procedure {m.group(1)!r} not registered: "
            "no connector in this catalog provides procedures"
        )
    if re.match(r"(GRANT|REVOKE)\b|(CREATE|DROP|SET)\s+ROLE\b", s, re.IGNORECASE):
        raise ValueError(
            "role-based access control is not provided by the mounted "
            "connectors (reference delegates DCL to connector access control)"
        )

    m = re.fullmatch(r"EXPLAIN\s+(?:\((?:[^)]*)\)\s+)?(.+)", s, re.IGNORECASE | re.DOTALL)
    if m and not re.match(r"(?i)\s*(SHOW|DESCRIBE|DESC|PREPARE|EXECUTE)\b", m.group(1)):
        # EXPLAIN [(...options...)] <query> — SqlBase.g4 explain; the plan
        # text is Spark's formatted physical plan for the transpiled query.
        from ..functions.presto import transpile
        from ..plans.inspect import formatted_plan

        plan = formatted_plan(spark.sql(transpile(m.group(1))))
        return spark.createDataFrame([(line,) for line in plan.splitlines()], "plan string")

    m = re.fullmatch(r"PREPARE\s+(\w+)\s+FROM\s+(.+)", s, re.IGNORECASE | re.DOTALL)
    if m:
        _PREPARED[m.group(1).lower()] = m.group(2).strip()
        return spark.createDataFrame([(m.group(1).lower(), "PREPARED")], "name string, status string")

    m = re.fullmatch(r"EXECUTE\s+(\w+)(?:\s+USING\s+(.+))?", s, re.IGNORECASE | re.DOTALL)
    if m:
        name = m.group(1).lower()
        if name not in _PREPARED:
            raise ValueError(f"prepared statement {name!r} not found")
        body = _PREPARED[name]
        if m.group(2):
            # Positional '?' substitution, literal-masked so a '?' inside a
            # string literal is never treated as a parameter slot.
            from ..functions.presto import _mask_literals, _split_args, _unmask

            params = _split_args(m.group(2))
            masked, lits = _mask_literals(body)
            for p in params:
                masked = masked.replace("?", p.strip(), 1)
            body = _unmask(masked, lits)
        from ..functions.presto import presto_sql

        return presto_sql(spark, body)

    raise ValueError(f"unsupported statement: {sql!r}")
