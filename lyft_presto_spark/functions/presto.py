"""Presto -> Spark SQL function mapping and text transpiler.

Inventory source: FunctionRegistry.java:403-656 and the scalar files in
presto-main/src/main/java/io/prestosql/operator/scalar/ (SURVEY.md §2.4-2.6).
Three mapping kinds:

- SAME:   identical name & semantics in Spark SQL (listed for inventory).
- RENAME: same arguments, different name (``strpos`` -> ``instr``).
- REWRITE: argument restructuring handled by the transpiler
  (``date_add('day', n, ts)`` -> ``timestampadd(DAY, n, ts)``).

Known semantic deltas are documented in DELTAS — they matter to a user
switching engines, and the conformance corpus pins the behavior we ship.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# Presto functions whose Spark spelling is identical (name and args).
SAME = (
    # string — StringFunctions.java:62
    "chr concat length lower upper lpad rpad trim ltrim rtrim replace reverse "
    "split split_part substr levenshtein translate "
    # math — MathFunctions.java:65
    "abs ceil ceiling floor round sign mod pow power exp ln log log2 log10 sqrt cbrt "
    "sin cos tan asin acos atan atan2 sinh cosh tanh degrees radians pi e "
    "is_nan width_bucket greatest least rand random "
    # date/time — DateTimeFunctions.java:63
    "now current_date current_timestamp from_unixtime to_unixtime date_trunc "
    "year quarter month day hour minute second day_of_week day_of_year last_day_of_month "
    # bitwise — BitwiseFunctions.java:24
    "bit_count "
    # regex — JoniRegexpFunctions.java:44
    "regexp_extract regexp_replace "
    # binary — VarbinaryFunctions.java:37
    "md5 sha1 sha256 sha512 crc32 xxhash64 to_hex from_hex to_base64 from_base64 "
    # array / map / HOF — scalar/Array*.java, Map*.java
    "cardinality element_at contains array_distinct array_intersect array_union "
    "array_except array_position array_remove array_sort arrays_overlap array_join "
    "flatten sequence repeat shuffle slice zip zip_with transform filter reduce "
    "map map_keys map_values map_entries map_from_entries map_concat map_filter "
    "map_zip_with transform_keys transform_values "
    # conditional / misc
    "coalesce nullif if typeof format concat_ws "
    # aggregates — operator/aggregation/
    "count count_if sum avg min max min_by max_by bool_and bool_or every "
    "variance var_samp var_pop stddev stddev_samp stddev_pop skewness kurtosis "
    "covar_samp covar_pop corr regr_slope regr_intercept approx_percentile "
    "histogram bit_and bit_or bit_xor any_value "
    # window — window/*.java
    "row_number rank dense_rank percent_rank cume_dist ntile "
    "first_value last_value nth_value lag lead"
).split()

# Same arguments, different Spark name.
RENAME = {
    "strpos": "instr",  # both 1-based (StringFunctions.java stringPosition)
    "codepoint": "ascii",
    "json_extract_scalar": "get_json_object",  # JsonFunctions.java:64
    "approx_distinct": "approx_count_distinct",  # ApproximateCountDistinctAggregation.java:44
    "array_agg": "collect_list",  # NULL delta: see DELTAS
    "arbitrary": "any_value",  # ArbitraryAggregationFunction.java:47
    "index": "instr",  # TeradataStringFunctions.java
}

# Argument-restructuring rewrites, applied by the transpiler. Each maps a
# Presto call shape to a Spark SQL template with $1..$n placeholders.
REWRITE: dict[str, str] = {
    # DateTimeFunctions.java date_add(unit, n, ts): unit becomes a keyword.
    "date_add": "timestampadd(__UNIT($1), $2, $3)",
    "date_diff": "timestampdiff(__UNIT($1), $2, $3)",
    # MathFunctions.java cosine_similarity over sparse maps -> dense arrays
    # is covered by operators/similarity.py; scalar truncate:
    "truncate": "(CAST($1 AS BIGINT) + 0.0)",
    # VarbinaryFunctions.java
    "to_utf8": "encode($1, 'UTF-8')",
    "from_utf8": "decode($1, 'UTF-8')",
    # BitwiseFunctions.java (two-arg functions -> operators)
    "bitwise_and": "($1 & $2)",
    "bitwise_or": "($1 | $2)",
    "bitwise_xor": "($1 ^ $2)",
    "bitwise_not": "(~$1)",
    # GeometricMeanAggregations.java
    "geometric_mean": "exp(avg(ln($1)))",
    # StringFunctions.java hamming_distance via codegen-able expression
    "hamming_distance": (
        "size(filter(zip_with(split($1, ''), split($2, ''), (a, b) -> a <> b), x -> x))"
    ),
}

# Semantic deltas a migrating user must know (pinned by the conformance corpus).
DELTAS = {
    "array_agg": "Presto keeps NULLs; Spark collect_list drops them.",
    "round": "Presto/Spark round HALF_UP on doubles; DuckDB differs at exact .5 decimals.",
    "element_at": "Both 1-based; Presto errors on OOB under ANSI, Spark returns error in ANSI mode too.",
    "date_format": "Presto uses MySQL patterns, Spark uses JDK patterns — not transpiled.",
    "json_parse": "Presto has a JSON type; Spark represents json as string.",
}

FUNCTION_MAP: dict[str, str] = {}
for _name in SAME:
    FUNCTION_MAP[_name] = _name
for _name, _spark in RENAME.items():
    FUNCTION_MAP[_name] = _spark
for _name in REWRITE:
    FUNCTION_MAP[_name] = f"<rewrite> {REWRITE[_name]}"

_UNITS = {"'second'", "'minute'", "'hour'", "'day'", "'week'", "'month'", "'quarter'", "'year'"}


def _split_args(argstr: str) -> list[str]:
    """Split a call's argument list on top-level commas."""
    args, depth, cur, in_str = [], 0, [], False
    for ch in argstr:
        if ch == "'" :
            in_str = not in_str
        if not in_str:
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif ch == "," and depth == 0:
                args.append("".join(cur).strip())
                cur = []
                continue
        cur.append(ch)
    if cur:
        args.append("".join(cur).strip())
    return args


def _find_call(sql: str, name: str, start: int = 0) -> tuple[int, int, list[str]] | None:
    """Locate ``name( ... )`` at/after start; return (begin, end, args)."""
    pat = re.compile(r"\b" + re.escape(name) + r"\s*\(", re.IGNORECASE)
    m = pat.search(sql, start)
    if not m:
        return None
    depth, i, in_str = 1, m.end(), False
    while i < len(sql) and depth:
        ch = sql[i]
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
        i += 1
    return m.start(), i, _split_args(sql[m.end() : i - 1])


def transpile(sql: str) -> str:
    """Rewrite Presto-dialect SQL into Spark SQL.

    Handles RENAME (name swap) and REWRITE (argument restructuring);
    SAME-named functions pass through untouched. Nested calls are handled by
    iterating to fixpoint.
    """
    out = sql
    for name, template in REWRITE.items():
        pos = 0
        while True:
            found = _find_call(out, name, pos)
            if found is None:
                break
            begin, end, args = found
            # Presto date_add/date_diff take a unit literal first; Spark's
            # native 2-arg date_add(date, n) must pass through untouched.
            if name in ("date_add", "date_diff") and (
                not args or args[0].strip().lower() not in _UNITS
            ):
                pos = begin + len(name)
                continue
            repl = template
            for idx, arg in enumerate(args, 1):
                if f"__UNIT(${idx})" in repl:
                    repl = repl.replace(f"__UNIT(${idx})", arg.strip().strip("'").upper())
                repl = repl.replace(f"${idx}", arg)
            # Re-scan from the replacement start: templates never contain
            # their own name, so nested calls in args still get rewritten.
            out = out[:begin] + repl + out[end:]
            pos = begin
    for name, spark_name in RENAME.items():
        out = re.sub(r"\b" + re.escape(name) + r"\s*\(", spark_name + "(", out, flags=re.IGNORECASE)
    return out


def presto_sql(spark: SparkSession, sql: str) -> DataFrame:
    """The engine's Presto-compatible front door: transpile then run."""
    return spark.sql(transpile(sql))
