"""Presto dialect shim: transpiler unit tests + end-to-end front-door runs.

Mirror of the reference's function tests (AbstractTestFunctions pattern,
SURVEY.md §5.1) at the dialect layer: Presto-flavored SQL must run on Spark
via transpile() and produce the same values DuckDB computes for the
equivalent ANSI SQL.
"""

from __future__ import annotations

from lyft_presto_spark.functions import transpile
from lyft_presto_spark.functions.presto import presto_sql
from lyft_presto_spark.testing import compare_with_oracle


def test_transpile_renames():
    assert transpile("SELECT strpos(name, 'x') FROM t") == "SELECT instr(name, 'x') FROM t"
    assert (
        transpile("SELECT approx_distinct(a), array_agg(b) FROM t")
        == "SELECT approx_count_distinct(a), collect_list(b) FROM t"
    )


def test_transpile_date_add_unit_form():
    assert (
        transpile("SELECT date_add('day', 5, o_orderdate) FROM orders")
        == "SELECT timestampadd(DAY, 5, o_orderdate) FROM orders"
    )
    # Spark-native 2-arg form passes through untouched.
    assert transpile("SELECT date_add(d, 5) FROM t") == "SELECT date_add(d, 5) FROM t"


def test_transpile_nested_calls():
    out = transpile("SELECT date_diff('day', date_add('month', 1, a), b) FROM t")
    assert out == "SELECT timestampdiff(DAY, timestampadd(MONTH, 1, a), b) FROM t"


def test_transpile_bitwise_and_passthrough():
    assert transpile("SELECT bitwise_and(a, b), abs(c) FROM t") == "SELECT (a & b), abs(c) FROM t"


def test_transpile_string_literals_untouched():
    # A function-looking token inside a string literal must not be rewritten.
    sql = "SELECT 'date_add(day)' AS s, strpos(x, 'y') FROM t"
    assert transpile(sql) == "SELECT 'date_add(day)' AS s, instr(x, 'y') FROM t"


def test_transpile_escaped_quotes_in_literals():
    # Doubled '' is an escaped quote, not a literal boundary (ADVICE r1).
    sql = "SELECT strpos(x, 'it''s a strpos(test)') FROM t"
    assert transpile(sql) == "SELECT instr(x, 'it''s a strpos(test)') FROM t"


def test_transpile_mysql_datetime_patterns():
    assert (
        transpile("SELECT date_format(ts, '%Y-%m-%dT%H:%i:%S') FROM t")
        == "SELECT date_format(ts, 'yyyy-MM-dd''T''HH:mm:ss') FROM t"
    )
    assert (
        transpile("SELECT date_parse(s, '%d/%m/%Y') FROM t")
        == "SELECT to_timestamp(s, 'dd/MM/yyyy') FROM t"
    )
    # Already-JDK patterns (no %) pass through untouched.
    assert (
        transpile("SELECT date_format(ts, 'yyyy-MM') FROM t")
        == "SELECT date_format(ts, 'yyyy-MM') FROM t"
    )


def test_transpile_joda_patterns():
    assert (
        transpile("SELECT format_datetime(ts, 'YYYY-MM-dd') FROM t")
        == "SELECT date_format(ts, 'yyyy-MM-dd') FROM t"
    )
    assert (
        transpile("SELECT parse_datetime(s, 'yyyy-MM-dd') FROM t")
        == "SELECT to_timestamp(s, 'yyyy-MM-dd') FROM t"
    )


def test_transpile_dow_iso_and_week():
    out = transpile("SELECT day_of_week(d), week(d), year_of_week(d) FROM t")
    assert "((dayofweek(d) + 5) % 7 + 1)" in out
    assert "weekofyear(d)" in out
    assert "extract(YEAROFWEEK FROM d)" in out


def test_transpile_minmax_n_only_two_arg_literal():
    out = transpile("SELECT max(x, 3), min(x, 2), max(x), min(y), max(a, b) FROM t")
    assert "slice(reverse(array_sort(collect_list(x))), 1, 3)" in out
    assert "slice(array_sort(collect_list(x)), 1, 2)" in out
    # plain aggregates and non-literal 2-arg calls untouched
    assert "max(x)" in out and "min(y)" in out and "max(a, b)" in out


def test_every_same_entry_resolves_in_spark(spark):
    """Each SAME-inventory function must actually exist under that name in
    Spark — an advertised-compatible name that fails with AnalysisException
    is an inventory bug (ADVICE r1)."""
    from lyft_presto_spark.functions.presto import SAME

    unknown = []
    for name in SAME:
        try:
            spark.sql(f"DESCRIBE FUNCTION `{name}`").collect()
        except Exception:
            unknown.append(name)
    assert unknown == []


def test_transpile_binary_renames_and_ieee754():
    out = transpile("SELECT to_hex(from_hex(h)), to_base64(b), format('%d', n) FROM t")
    assert "hex(unhex(h))" in out
    assert "base64(b)" in out
    assert "format_string('%d', n)" in out
    out2 = transpile("SELECT sha256(x), date_format(ts, 'yyyy') FROM t")
    assert "sha2(x, 256)" in out2
    assert "date_format(ts, 'yyyy')" in out2  # 'format' rename must not touch it


def test_transpile_url_base_hll():
    out = transpile("SELECT url_encode(u), from_base('ff', 16), to_base(n, 2) FROM t")
    assert "reflect('java.net.URLEncoder', 'encode', CAST(u AS STRING), 'UTF-8')" in out
    assert "CAST(conv('ff', 16, 10) AS BIGINT)" in out
    assert "lower(conv(CAST(n AS STRING), 10, 2))" in out
    out2 = transpile("SELECT hll_cardinality(merge(s)) FROM (SELECT approx_set(x) s FROM t)")
    assert "hll_sketch_estimate(hll_union_agg(s))" in out2
    assert "hll_sketch_agg(x)" in out2


PRESTO_QUERY = """
SELECT o_orderpriority,
       count(*) AS n,
       approx_distinct(o_custkey) AS approx_customers,
       CAST(date_add('day', 30, max(o_orderdate)) AS DATE) AS max_plus_30,
       CAST(date_diff('day', min(o_orderdate), max(o_orderdate)) AS BIGINT) AS span_days,
       strpos(min(o_orderpriority), '-') AS dash_pos
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLE = """
SELECT o_orderpriority,
       count(*) AS n,
       count(DISTINCT o_custkey) AS exact_customers,
       CAST(max(o_orderdate) + INTERVAL 30 DAY AS DATE) AS max_plus_30,
       CAST(date_diff('day', min(o_orderdate), max(o_orderdate)) AS BIGINT) AS span_days,
       strpos(min(o_orderpriority), '-') AS dash_pos
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def test_presto_front_door(spark, sf_dir):
    from lyft_presto_spark.session import register_tables

    register_tables(spark, sf_dir)
    df = presto_sql(spark, PRESTO_QUERY)
    # approx_distinct is engine-specific: check bounds, compare the rest exactly.
    rows = {r["o_orderpriority"]: r for r in df.collect()}
    exact = presto_sql(
        spark,
        "SELECT o_orderpriority, count(DISTINCT o_custkey) AS n FROM orders GROUP BY 1",
    ).collect()
    for r in exact:
        approx = rows[r["o_orderpriority"]]["approx_customers"]
        assert abs(approx - r["n"]) <= max(3, 0.15 * r["n"])
    compare_with_oracle(
        df.drop("approx_customers"),
        ORACLE.replace("count(DISTINCT o_custkey) AS exact_customers,", ""),
        sf_dir,
        name="presto_front_door",
    )


def test_transpile_iso8601_duration_datasize():
    out = transpile("SELECT to_iso8601(ts), from_iso8601_date(s), from_iso8601_timestamp(s) FROM t")
    assert "date_format(ts, \"yyyy-MM-dd'T'HH:mm:ss.SSS\")" in out
    assert "to_date(s)" in out
    assert "to_timestamp(s)" in out
    out2 = transpile("SELECT to_milliseconds(parse_duration('3.5h')) FROM t")
    assert "make_dt_interval" in out2
    assert "unix_micros" in out2
    out3 = transpile("SELECT parse_presto_data_size('2.3MB') FROM t")
    assert "1048576.0" in out3
    assert "DECIMAL(38,0)" in out3


def test_transpile_split_to_multimap_and_types():
    out = transpile("SELECT split_to_multimap(s, ';', '=') FROM t")
    assert "map_from_entries" in out
    # split_part now expands to the NULL-on-out-of-range try_element_at form
    assert "try_element_at(split(" in out
    # split_to_map (-> str_to_map) must not fire inside split_to_multimap.
    assert "str_to_map" not in out
    out2 = transpile("SELECT CAST(x AS VARCHAR), CAST(b AS VARBINARY), CAST(r AS REAL) FROM t")
    assert "CAST(x AS STRING)" in out2
    assert "CAST(b AS BINARY)" in out2
    assert "CAST(r AS FLOAT)" in out2
    # parameterized VARCHAR(n) is valid Spark and passes through
    out3 = transpile("SELECT CAST(x AS VARCHAR(10)) FROM t")
    assert "VARCHAR(10)" in out3


def test_transpile_millisecond_not_to_milliseconds():
    out = transpile("SELECT millisecond(ts), char2hexint(s) FROM t")
    assert "CAST(date_format(ts, 'SSS') AS INT)" in out
    assert "hex(encode(s, 'UTF-16BE'))" in out


def test_iso8601_duration_values(spark):
    df = spark.sql(
        transpile(
            "SELECT to_milliseconds(parse_duration('1.5m')) AS a, "
            "to_milliseconds(parse_duration('250ms')) AS b, "
            "CAST(parse_presto_data_size('2kB') AS BIGINT) AS c, "
            "char2hexint('AB') AS d"
        )
    )
    row = df.collect()[0]
    assert row.a == 90000
    assert row.b == 250
    assert row.c == 2048
    assert row.d == "00410042"


def test_transpile_teradata_datetime():
    out = transpile("SELECT to_char(ts, 'yyyy-mm-dd hh24:mi:ss') FROM t")
    assert "date_format(ts, 'yyyy-MM-dd HH:mm:ss')" in out
    out2 = transpile("SELECT to_date(s, 'yyyy-mm-dd'), to_timestamp(s, 'yyyy-mm-dd hh24:mi') FROM t")
    assert "to_date(s, 'yyyy-MM-dd')" in out2
    assert "to_timestamp(s, 'yyyy-MM-dd HH:mm')" in out2
    # 1-arg forms (incl. the ISO rewrites' own output) pass through
    out3 = transpile("SELECT from_iso8601_timestamp(s), to_date(s) FROM t")
    assert "to_timestamp(s)" in out3 and "to_date(s)" in out3


def test_teradata_datetime_values(spark):
    row = spark.sql(
        transpile(
            "SELECT to_char(TIMESTAMP '2021-03-04 15:06:07', 'yyyy-mm-dd hh24:mi:ss') AS a, "
            "CAST(to_date('2021-03-04', 'yyyy-mm-dd') AS STRING) AS b"
        )
    ).collect()[0]
    assert row.a == "2021-03-04 15:06:07"
    assert row.b == "2021-03-04"


def test_normalize_unicode(spark):
    from lyft_presto_spark.functions.presto import register_udfs

    register_udfs(spark)
    out = transpile("SELECT normalize(s), normalize(s, NFD), normalize(s, 'NFKC') FROM t")
    assert "unicode_normalize('NFC', s)" in out
    assert "unicode_normalize('NFD', s)" in out
    assert "unicode_normalize('NFKC', s)" in out
    # e + combining acute (len 2) -> NFC composes to single codepoint
    row = spark.sql(
        transpile("SELECT length(normalize('étest')) AS c, length(normalize('étest', NFD)) AS d")
    ).collect()[0]
    assert row.c == 5 and row.d == 6


class TestScalarCompatWave3:
    """Rewrites added with fn_presto_compat (array/element/special values)."""

    def test_array_literal_constructor(self):
        assert transpile("SELECT ARRAY[1, 2, 3]") == "SELECT array(1, 2, 3)"
        # nested + inside calls
        assert transpile("SELECT cardinality(ARRAY[ARRAY[1], ARRAY[2]])") == (
            "SELECT cardinality(array(array(1), array(2)))"
        )
        # string-key map subscripts untouched (masked literal, same semantics)
        assert transpile("SELECT m['k']") == "SELECT m['k']"

    def test_ordinal_subscript_is_one_based(self, spark):
        # Presto arr[n] is 1-based; Spark [] is 0-based — the transpiler must
        # rewrite so ARRAY[10,20][1] returns 10, not 20 (ADVICE r3).
        assert transpile("SELECT ARRAY[10, 20][1]") == (
            "SELECT try_element_at(array(10, 20), 1)"
        )
        assert spark.sql(transpile("SELECT ARRAY[10, 20][1] AS v")).collect()[0].v == 10
        # chained subscripts unwrap outside-in
        assert spark.sql(
            transpile("SELECT ARRAY[ARRAY[1, 2], ARRAY[3, 4]][2][1] AS v")
        ).collect()[0].v == 3
        # qualified-name and call bases
        assert transpile("SELECT t.arr[3]") == "SELECT try_element_at(t.arr, 3)"
        assert transpile("SELECT split(s, ',')[1]") == (
            "SELECT try_element_at(split(s, ','), 1)"
        )
        # integer map keys: element_at is key-lookup on maps, same as Presto []
        assert spark.sql(
            transpile("SELECT map(ARRAY[7], ARRAY['x'])[7] AS v")
        ).collect()[0].v == "x"
        # non-literal subscripts pass through (documented in DELTAS)
        assert transpile("SELECT arr[i]") == "SELECT arr[i]"

    def test_map_two_array_constructor(self):
        assert transpile("SELECT map(ARRAY['a'], ARRAY[1])") == (
            "SELECT map_from_arrays(array('a'), array(1))"
        )
        # flat Spark-style map() with >2 args passes through
        assert transpile("SELECT map('a', 1, 'b', 2)") == "SELECT map('a', 1, 'b', 2)"

    def test_element_at_becomes_try(self):
        assert transpile("SELECT element_at(arr, 5)") == "SELECT try_element_at(arr, 5)"
        # already-Spark try_element_at is not double-wrapped
        assert transpile("SELECT try_element_at(arr, 5)") == "SELECT try_element_at(arr, 5)"

    def test_array_vs_string_name_collisions(self):
        assert transpile("SELECT contains(arr, x)") == "SELECT array_contains(arr, x)"
        assert transpile("SELECT repeat(x, 3)") == "SELECT array_repeat(x, 3)"
        assert transpile("SELECT levenshtein_distance(a, b)") == "SELECT levenshtein(a, b)"

    def test_special_values(self, spark):
        sql = transpile(
            "SELECT is_finite(1.0) a, is_infinite(infinity()) b, is_finite(nan()) c, "
            "is_infinite(0.0 - infinity()) d"
        )
        row = spark.sql(sql).collect()[0]
        assert (row.a, row.b, row.c, row.d) == (True, True, False, True)

    def test_split_part_null_out_of_range(self, spark):
        sql = transpile("SELECT split_part('a.b.c', '.', 2) x, split_part('a.b.c', '.', 9) y")
        row = spark.sql(sql).collect()[0]
        assert (row.x, row.y) == ("b", None)

    def test_cosine_similarity_sparse_maps(self, spark):
        sql = transpile(
            "SELECT cosine_similarity(map(ARRAY['a','b'], ARRAY[1.0, 2.0]), "
            "map(ARRAY['b','c'], ARRAY[3.0, 4.0])) v"
        )
        got = spark.sql(sql).collect()[0].v
        import math

        expect = (2.0 * 3.0) / (math.sqrt(1 + 4) * math.sqrt(9 + 16))
        assert abs(got - expect) < 1e-12

    def test_at_timezone_with_timezone(self, spark):
        sql = transpile(
            "SELECT at_timezone(TIMESTAMP '2024-01-01 12:00:00', 'America/Los_Angeles') a, "
            "with_timezone(TIMESTAMP '2024-01-01 04:00:00', 'America/Los_Angeles') b"
        )
        row = spark.sql(sql).collect()[0]
        assert str(row.a) == "2024-01-01 04:00:00"  # instant re-rendered on LA wall clock
        assert str(row.b) == "2024-01-01 12:00:00"  # LA wall clock -> UTC instant
