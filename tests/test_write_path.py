"""Write path: CTAS/INSERT/DELETE/ANALYZE round-trips (SURVEY.md Phase 4)."""

from __future__ import annotations

import pytest

from lyft_presto_spark.session import load_table
from lyft_presto_spark.sources.write_path import (
    analyze,
    ctas,
    delete_where,
    insert_into,
    table_stats,
)


@pytest.fixture()
def nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


def test_ctas_insert_delete_analyze(spark, nation, tmp_path):
    table = "t_nation_wp"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    ctas(spark, nation, table, str(tmp_path / "nation_ctas"))
    n0 = spark.table(table).count()
    assert n0 == nation.count()

    insert_into(spark, nation.limit(5), table)
    assert spark.table(table).count() == n0 + 5

    delete_where(spark, table, "n_regionkey = 0")
    after = spark.table(table)
    assert after.filter("n_regionkey = 0").count() == 0
    assert after.count() < n0 + 5

    analyze(spark, table, columns=("n_nationkey",))
    stats = table_stats(spark, table)
    assert "statistics" in stats and "bytes" in stats["statistics"]
    spark.sql(f"DROP TABLE {table}")


def test_delete_where_stays_distributed(spark, sf_dir, tmp_path, monkeypatch):
    """DELETE must never materialize the table on the driver (VERDICT r1 #2).

    Monkeypatch DataFrame.collect to fail loudly: at 100 TB a collect-based
    rewrite is a guaranteed driver OOM, so any collect() on this path is a
    scale bug, not an implementation detail.
    """
    import pyspark.sql

    orders = load_table(spark, sf_dir, "orders")
    table = "t_orders_del"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    ctas(spark, orders, table, str(tmp_path / "orders_del"))
    expected = orders.filter("NOT (o_orderpriority = '1-URGENT')")
    exp_n = expected.count()
    exp_sum = expected.selectExpr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) s").first()["s"]

    def _no_collect(self):
        raise AssertionError("delete_where must not collect() to the driver")

    monkeypatch.setattr(pyspark.sql.DataFrame, "collect", _no_collect)
    try:
        delete_where(spark, table, "o_orderpriority = '1-URGENT'")
    finally:
        monkeypatch.undo()

    after = spark.table(table)
    assert after.count() == exp_n
    assert after.filter("o_orderpriority = '1-URGENT'").count() == 0
    got_sum = after.selectExpr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) s").first()["s"]
    assert got_sum == exp_sum
    # Type fidelity: the staged write preserves the original schema exactly.
    assert after.schema == orders.schema
    assert not [t for t in spark.catalog.listTables() if t.name == f"{table}__delete_stage"]
    spark.sql(f"DROP TABLE {table}")


def test_partitioned_ctas_prunes(spark, nation, tmp_path):
    table = "t_nation_part"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    ctas(spark, nation, table, str(tmp_path / "nation_part"), partition_by=("n_regionkey",))
    df = spark.table(table).filter("n_regionkey = 1")
    # Partition pruning: the scan's partition filters must include the key.
    from lyft_presto_spark.plans.inspect import formatted_plan

    assert "n_regionkey" in formatted_plan(df)
    assert df.count() == nation.filter("n_regionkey = 1").count()
    spark.sql(f"DROP TABLE {table}")


def test_view_ddl_roundtrip(spark, sf_dir):
    """CREATE VIEW re-expands at analysis time; DROP removes it."""
    from lyft_presto_spark.session import register_tables
    from lyft_presto_spark.sources.write_path import create_view, drop_view

    register_tables(spark, sf_dir)
    create_view(spark, "big_orders_v", "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100")
    n = spark.table("big_orders_v").count()
    direct = spark.sql("SELECT count(*) AS n FROM orders WHERE o_totalprice > 100").collect()[0].n
    assert n == direct > 0
    # view tracks the underlying data definition, not a snapshot
    create_view(spark, "big_orders_v", "SELECT o_orderkey FROM orders WHERE o_totalprice > 200")
    assert spark.table("big_orders_v").columns == ["o_orderkey"]
    drop_view(spark, "big_orders_v")
    assert "big_orders_v" not in [t.name for t in spark.catalog.listTables()]


def test_alter_table_add_columns_and_rename(spark, sf_dir, tmp_path_factory):
    """Schema evolution: added columns read NULL from pre-existing files."""
    from lyft_presto_spark.session import load_table
    from lyft_presto_spark.sources.write_path import (
        alter_table_add_columns,
        alter_table_rename,
        ctas,
    )

    loc = str(tmp_path_factory.mktemp("alter_tbl")) + "/t"
    spark.sql("DROP TABLE IF EXISTS alter_src")
    spark.sql("DROP TABLE IF EXISTS alter_dst")
    ctas(spark, load_table(spark, sf_dir, "region"), "alter_src", loc)
    alter_table_add_columns(spark, "alter_src", "r_comment STRING, r_score DOUBLE")
    df = spark.table("alter_src")
    assert {"r_comment", "r_score"} <= set(df.columns)
    row = df.limit(1).collect()[0]
    assert row.r_comment is None and row.r_score is None
    alter_table_rename(spark, "alter_src", "alter_dst")
    tables = [t.name for t in spark.catalog.listTables()]
    assert "alter_dst" in tables and "alter_src" not in tables
    spark.sql("DROP TABLE IF EXISTS alter_dst")


def test_optimize_table_compacts_small_files(spark, sf_dir, tmp_path, monkeypatch):
    """OPTIMIZE (small-file compaction): many tiny appended files rewrite
    into ~target-size files with byte-identical content, through the same
    staged-swap never-collect() discipline as DELETE."""
    import pyspark.sql

    from lyft_presto_spark.sources.write_path import optimize_table

    nation = load_table(spark, sf_dir, "nation")
    table = "t_nation_opt"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    ctas(spark, nation.limit(0), table, str(tmp_path / "nation_opt"))
    # micro-batch ingest shape: 8 tiny appends -> >= 8 small files
    for i in range(8):
        insert_into(spark, nation.filter(f"n_nationkey % 8 = {i}"), table)
    before_rows = sorted(map(tuple, spark.table(table).collect()))
    assert len(spark.table(table).inputFiles()) >= 8

    def _no_collect(self):
        raise AssertionError("optimize_table must not collect() to the driver")

    monkeypatch.setattr(pyspark.sql.DataFrame, "collect", _no_collect)
    try:
        stats = optimize_table(spark, table, target_file_mb=128)
    finally:
        monkeypatch.undo()

    assert stats["files_before"] >= 8
    assert stats["files_after"] == 1  # tiny table -> one target-size file
    after_rows = sorted(map(tuple, spark.table(table).collect()))
    assert after_rows == before_rows  # content byte-identical
    assert spark.table(table).schema == nation.schema
    assert not [t for t in spark.catalog.listTables() if t.name == f"{table}__optimize_stage"]
    spark.sql(f"DROP TABLE {table}")


def test_optimize_table_respects_partitions(spark, sf_dir, tmp_path):
    """Partitioned tables compact per partition directory: repartition BY
    the partition columns, never round-robin across them."""
    from lyft_presto_spark.sources.write_path import optimize_table

    nation = load_table(spark, sf_dir, "nation")
    table = "t_nation_opt_part"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    ctas(
        spark, nation.limit(0), table, str(tmp_path / "nation_opt_part"),
        partition_by=("n_regionkey",),
    )
    for i in range(4):
        insert_into(spark, nation.filter(f"n_nationkey % 4 = {i}"), table)
    before_rows = sorted(map(tuple, spark.table(table).collect()))
    n_parts = spark.table(table).select("n_regionkey").distinct().count()
    assert len(spark.table(table).inputFiles()) > n_parts

    stats = optimize_table(spark, table, target_file_mb=128)
    # one file per partition directory is the compacted floor
    assert stats["files_after"] == n_parts
    assert sorted(map(tuple, spark.table(table).collect())) == before_rows
    spark.sql(f"DROP TABLE {table}")


def test_staged_swap_failure_preserves_stage_table(spark, sf_dir, tmp_path):
    """ADVICE r9: if the swap overwrite fails mid-write, the stage table is
    the only complete copy — it must be KEPT and named in the error, not
    dropped by a finally block."""
    import pytest

    from lyft_presto_spark.sources.write_path import _staged_swap

    nation = load_table(spark, sf_dir, "nation")
    table = "t_swapfail"
    stage = f"{table}__delete_stage"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {stage}")
    ctas(spark, nation, table, str(tmp_path / "swapfail"))
    # force the SWAP (second phase) to fail: drop the target between the
    # stage write and the overwrite by pointing the swap at a bad table name
    broken = nation.selectExpr("n_nationkey AS wrong_col")  # schema mismatch
    with pytest.raises(RuntimeError, match=stage):
        _staged_swap(spark, broken, table, stage)
    # stage survives with the complete staged data, target not silently lost
    assert [t for t in spark.catalog.listTables() if t.name == stage]
    assert spark.table(stage).count() == nation.count()
    spark.sql(f"DROP TABLE IF EXISTS {stage}")
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_staged_swap_stage_write_failure_drops_partial_stage(spark, sf_dir, tmp_path):
    """If the STAGE write itself fails the target is untouched and the
    partial stage is cleaned up (nothing to recover: target still complete)."""
    import pytest
    from pyspark.sql import functions as F

    from lyft_presto_spark.sources.write_path import _staged_swap

    nation = load_table(spark, sf_dir, "nation")
    table = "t_stagefail"
    stage = f"{table}__delete_stage"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {stage}")
    ctas(spark, nation, table, str(tmp_path / "stagefail"))
    exploding = nation.withColumn(
        "boom", F.assert_true(F.col("n_nationkey") < 0, F.lit("stage write fails"))
    )
    with pytest.raises(Exception):
        _staged_swap(spark, exploding, table, stage)
    assert not [t for t in spark.catalog.listTables() if t.name == stage]
    assert spark.table(table).count() == nation.count()  # target intact
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_total_file_bytes_via_hadoop_fs(spark, sf_dir, tmp_path):
    """File sizing goes through the Hadoop FileSystem API (scheme-agnostic,
    ADVICE r9) and matches the local on-disk truth for file:// paths;
    unreadable files count as SMALL so compaction never degrades to an
    expensive same-file-count rewrite."""
    import os
    from urllib.parse import urlparse

    from lyft_presto_spark.sources.write_path import _total_file_bytes

    nation = load_table(spark, sf_dir, "nation")
    table = "t_sizing"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    ctas(spark, nation, table, str(tmp_path / "sizing"))
    files = spark.table(table).inputFiles()
    want = sum(os.path.getsize(urlparse(f).path) for f in files)
    assert _total_file_bytes(spark, files) == want > 0
    # unknown/unreadable paths: counted as 0 (assume-small), never as full
    ghost = [str(tmp_path / "nope" / "missing.parquet")]
    assert _total_file_bytes(spark, ghost) == 0
    spark.sql(f"DROP TABLE {table}")


def test_merge_into_upsert_updates_and_inserts(spark, sf_dir, tmp_path, monkeypatch):
    """MERGE INTO (NEW r10): WHEN MATCHED UPDATE SET * + WHEN NOT MATCHED
    INSERT * — matched rows take the source version, new keys append,
    untouched rows survive byte-identical; distributed throughout."""
    from pyspark.sql import functions as F

    from lyft_presto_spark.sources.write_path import merge_into

    nation = load_table(spark, sf_dir, "nation")
    table = "t_merge"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    ctas(spark, nation, table, str(tmp_path / "merge"))
    n = nation.count()
    # source: update keys 0..4 (marked names), insert keys 1000..1002
    updates = nation.filter("n_nationkey < 5").withColumn(
        "n_name", F.concat(F.lit("UPDATED_"), F.col("n_name"))
    )
    inserts = nation.filter("n_nationkey < 3").select(
        (F.col("n_nationkey") + 1000).alias("n_nationkey"),
        F.col("n_name"),
        *[F.col(c) for c in nation.columns if c not in ("n_nationkey", "n_name")],
    )
    stats = merge_into(
        spark, table, updates.unionByName(inserts), on=("n_nationkey",)
    )
    assert stats == {"matched": 5, "inserted": 3}
    got = spark.table(table)
    assert got.count() == n + 3
    assert got.filter("n_name LIKE 'UPDATED_%'").count() == 5
    assert got.filter("n_nationkey >= 1000").count() == 3
    # untouched rows identical
    untouched = got.filter("n_nationkey >= 5 AND n_nationkey < 1000")
    want = nation.filter("n_nationkey >= 5")
    assert sorted(map(tuple, untouched.collect())) == sorted(map(tuple, want.collect()))
    assert not [t for t in spark.catalog.listTables() if t.name == f"{table}__merge_stage"]
    spark.sql(f"DROP TABLE {table}")


def test_merge_into_delete_mode_and_cardinality_guard(spark, sf_dir, tmp_path):
    """WHEN MATCHED DELETE removes matched target rows and still inserts
    unmatched source rows; a source with duplicate merge keys raises the
    ANSI MERGE cardinality violation."""
    import pytest
    from pyspark.sql import functions as F

    from lyft_presto_spark.sources.write_path import merge_into

    nation = load_table(spark, sf_dir, "nation")
    table = "t_merge_del"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    ctas(spark, nation, table, str(tmp_path / "merge_del"))
    n = nation.count()
    src = nation.filter("n_nationkey < 4").unionByName(
        nation.filter("n_nationkey = 0").select(
            (F.col("n_nationkey") + 2000).alias("n_nationkey"),
            *[F.col(c) for c in nation.columns if c != "n_nationkey"],
        )
    )
    stats = merge_into(spark, table, src, on=("n_nationkey",), when_matched="delete")
    assert stats == {"matched": 4, "inserted": 1}
    got = spark.table(table)
    assert got.count() == n - 4 + 1
    assert got.filter("n_nationkey < 4").count() == 0
    assert got.filter("n_nationkey = 2000").count() == 1
    # duplicate-key source: ANSI cardinality violation, loud
    dup_src = nation.filter("n_nationkey = 5").unionByName(
        nation.filter("n_nationkey = 5")
    )
    with pytest.raises(ValueError, match="cardinality"):
        merge_into(spark, table, dup_src, on=("n_nationkey",))
    spark.sql(f"DROP TABLE {table}")


def test_merge_into_duplicate_target_keys_update_each_row(spark, sf_dir, tmp_path):
    """ANSI MERGE with duplicate TARGET keys (ADVICE r10): update mode must
    rewrite EACH matched target row to the source version — a key present
    twice in the target yields two updated rows — and the matched/inserted
    counts stay non-negative and key-accurate."""
    from pyspark.sql import functions as F

    from lyft_presto_spark.sources.write_path import merge_into

    nation = load_table(spark, sf_dir, "nation")
    table = "t_merge_dupt"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # target: nation with key 3 duplicated (two copies)
    dup_target = nation.unionByName(nation.filter("n_nationkey = 3"))
    ctas(spark, dup_target, table, str(tmp_path / "merge_dupt"))
    n = dup_target.count()
    # source: update key 3 (matches TWO target rows), insert key 3000
    src = nation.filter("n_nationkey = 3").withColumn(
        "n_name", F.lit("UPDATED")
    ).unionByName(
        nation.filter("n_nationkey = 0").select(
            (F.col("n_nationkey") + 3000).alias("n_nationkey"),
            *[F.col(c) for c in nation.columns if c != "n_nationkey"],
        )
    )
    stats = merge_into(spark, table, src, on=("n_nationkey",))
    # matched counts TARGET rows (2 copies of key 3); inserted the 1 new key
    assert stats == {"matched": 2, "inserted": 1}
    got = spark.table(table)
    assert got.count() == n + 1  # both copies kept (updated), one insert
    updated = got.filter("n_nationkey = 3")
    assert updated.count() == 2  # ANSI: each matched row updated
    assert updated.filter("n_name = 'UPDATED'").count() == 2
    assert got.filter("n_nationkey = 3000").count() == 1
    spark.sql(f"DROP TABLE {table}")


def test_optimize_table_aborts_when_size_probe_fails(spark, nation, tmp_path, monkeypatch):
    """A blanket size-probe failure (every file reads as 0 bytes) must abort
    compaction rather than repartition(1) the whole table (ADVICE r10)."""
    from lyft_presto_spark.sources import write_path

    table = "t_opt_zero"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    ctas(spark, nation.repartition(4), table, str(tmp_path / "opt_zero"))
    before = len(spark.table(table).inputFiles())
    assert before > 1
    monkeypatch.setattr(write_path, "_total_file_bytes", lambda *_: 0)
    stats = write_path.optimize_table(spark, table)
    assert stats == {"files_before": before, "files_after": before, "skipped": 1}
    assert len(spark.table(table).inputFiles()) == before  # no rewrite ran
    spark.sql(f"DROP TABLE {table}")
