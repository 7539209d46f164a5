"""Presto -> Spark SQL function mapping and text transpiler.

Inventory source: FunctionRegistry.java:403-656 and the scalar files in
presto-main/src/main/java/io/prestosql/operator/scalar/ (SURVEY.md §2.4-2.6).
Three mapping kinds:

- SAME:   identical name & semantics in Spark SQL (listed for inventory).
- RENAME: same arguments, different name (``strpos`` -> ``instr``).
- REWRITE: argument restructuring handled by the transpiler
  (``date_add('day', n, ts)`` -> ``timestampadd(DAY, n, ts)``). A REWRITE
  value is either a ``$1..$n`` template or a callable ``(args, lits) ->
  str | None`` for shapes that need to inspect literal arguments (datetime
  pattern translation, 2-arg min/max).

String literals are masked out before any pass runs (doubled ``''`` escapes
included), so function-looking text inside literals is never rewritten and
argument splitting cannot mis-parse escaped quotes.

Known semantic deltas are documented in DELTAS — they matter to a user
switching engines, and the conformance corpus pins the behavior we ship.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Presto functions whose Spark spelling is identical (name and args).
SAME = (
    # string — StringFunctions.java:62
    "chr concat length lower upper lpad rpad trim ltrim rtrim replace reverse "
    "split split_part substr levenshtein translate "
    # math — MathFunctions.java:65
    "abs ceil ceiling floor round sign mod pow power exp ln log log2 log10 sqrt cbrt "
    "sin cos tan asin acos atan atan2 sinh cosh tanh degrees radians pi e "
    "width_bucket greatest least rand random "
    # date/time — DateTimeFunctions.java:63
    "now current_date current_timestamp date_trunc "
    "year quarter month day hour minute second "
    # bitwise — BitwiseFunctions.java:24
    "bit_count "
    # regex — JoniRegexpFunctions.java:44
    "regexp_extract regexp_replace "
    # binary — VarbinaryFunctions.java:37
    "md5 sha1 crc32 xxhash64 "
    # array / map / HOF — scalar/Array*.java, Map*.java
    "cardinality element_at contains array_distinct array_intersect array_union "
    "array_except array_position array_remove array_sort arrays_overlap array_join "
    "flatten sequence repeat shuffle slice zip_with transform filter reduce "
    "map map_keys map_values map_entries map_from_entries map_concat map_filter "
    "map_zip_with transform_keys transform_values "
    # conditional / misc
    "coalesce nullif if typeof concat_ws uuid current_user "
    # session/zone — SessionFunctions.java, DateTimeFunctions.java
    "current_timezone localtimestamp "
    # aggregates — operator/aggregation/
    "count count_if sum avg min max min_by max_by bool_and bool_or every "
    "variance var_samp var_pop stddev stddev_samp stddev_pop skewness kurtosis "
    "covar_samp covar_pop corr regr_slope regr_intercept approx_percentile "
    "bit_and bit_or bit_xor any_value "
    # window — window/*.java
    "row_number rank dense_rank percent_rank cume_dist ntile "
    "first_value last_value nth_value lag lead"
).split()

# Same arguments, different Spark name.
RENAME = {
    # BitwiseAndAggregation/BitwiseOrAggregation.java — Spark's bit_and/bit_or.
    "bitwise_and_agg": "bit_and",
    "bitwise_or_agg": "bit_or",
    "strpos": "instr",  # both 1-based (StringFunctions.java stringPosition)
    "codepoint": "ascii",
    "json_extract_scalar": "get_json_object",  # JsonFunctions.java:64
    "approx_distinct": "approx_count_distinct",  # ApproximateCountDistinctAggregation.java:44
    "array_agg": "collect_list",  # NULL delta: see DELTAS
    "arbitrary": "any_value",  # ArbitraryAggregationFunction.java:47
    "index": "instr",  # TeradataStringFunctions.java
    "is_nan": "isnan",  # MathFunctions.java isNaN
    "day_of_year": "dayofyear",  # DateTimeFunctions.java dayOfYear
    "doy": "dayofyear",
    "week": "weekofyear",
    "week_of_year": "weekofyear",
    "last_day_of_month": "last_day",
    "zip": "arrays_zip",  # ZipFunction.java (struct field names differ; DELTAS)
    "split_to_map": "str_to_map",  # StringFunctions.java splitToMap
    "to_hex": "hex",  # VarbinaryFunctions.java (both uppercase output)
    "from_hex": "unhex",
    "to_base64": "base64",
    "from_base64": "unbase64",
    "format": "format_string",  # FormatFunction.java — printf-style
    "regexp_split": "split",  # RegexpSplitFunction — same Java-regex split
}

# --- MySQL datetime pattern translation (DateTimeFunctions.java:63 date_format/
# date_parse use MySQL codes; Spark uses JDK java.time patterns). ---
_MYSQL_TO_JDK = {
    "a": "EEE",
    "b": "MMM",
    "c": "M",
    "d": "dd",
    "e": "d",
    "f": "SSSSSS",
    "H": "HH",
    "h": "hh",
    "I": "hh",
    "i": "mm",
    "j": "DDD",
    "k": "H",
    "l": "h",
    "M": "MMMM",
    "m": "MM",
    "p": "a",
    "r": "hh:mm:ss a",
    "S": "ss",
    "s": "ss",
    "T": "HH:mm:ss",
    "v": "ww",
    "W": "EEEE",
    "x": "YYYY",
    "Y": "yyyy",
    "y": "yy",
}


def mysql_pattern_to_jdk(pat: str) -> str:
    """Translate a MySQL datetime pattern ('%Y-%m-%d') to JDK ('yyyy-MM-dd').

    Literal runs containing letters are single-quoted (JDK treats bare
    letters as pattern codes); ``%%`` produces a literal percent.
    """
    out: list[str] = []
    lit: list[str] = []

    def flush() -> None:
        if not lit:
            return
        text = "".join(lit)
        if re.search(r"[A-Za-z']", text):
            out.append("'" + text.replace("'", "''") + "'")
        else:
            out.append(text)
        lit.clear()

    i = 0
    while i < len(pat):
        ch = pat[i]
        if ch == "%" and i + 1 < len(pat):
            code = pat[i + 1]
            if code == "%":
                lit.append("%")
            else:
                jdk = _MYSQL_TO_JDK.get(code)
                if jdk is None:
                    raise ValueError(f"unsupported MySQL datetime code %{code}")
                flush()
                out.append(jdk)
            i += 2
        else:
            lit.append(ch)
            i += 1
    flush()
    return "".join(out)


def joda_pattern_to_jdk(pat: str) -> str:
    """Translate a Joda pattern (format_datetime/parse_datetime —
    JodaDateTimeFormat) to JDK. The alphabets mostly coincide; the deltas:
    Joda 'Y' is year-of-era (JDK 'y') and Joda 'x' is weekyear (JDK 'Y').
    Quoted literal sections pass through untouched.
    """
    out: list[str] = []
    in_quote = False
    for ch in pat:
        if ch == "'":
            in_quote = not in_quote
            out.append(ch)
        elif not in_quote and ch == "Y":
            out.append("y")
        elif not in_quote and ch == "x":
            out.append("Y")
        else:
            out.append(ch)
    return "".join(out)


# Teradata datetime codes (presto-teradata-functions TeradataDateFunctions:
# supported tokens yyyy/yy/mm/dd/hh24/hh/mi/ss). Longest-match-first.
_TERADATA_TOKENS = [
    ("yyyy", "yyyy"),
    ("yy", "yy"),
    ("hh24", "HH"),
    ("hh", "hh"),
    ("mi", "mm"),
    ("mm", "MM"),
    ("ss", "ss"),
    ("dd", "dd"),
]


def teradata_pattern_to_jdk(pat: str) -> str:
    """Translate a Teradata datetime pattern ('yyyy-mm-dd hh24:mi:ss') to JDK."""
    out: list[str] = []
    i = 0
    low = pat.lower()
    while i < len(pat):
        for tok, jdk in _TERADATA_TOKENS:
            if low.startswith(tok, i):
                out.append(jdk)
                i += len(tok)
                break
        else:
            ch = pat[i]
            if ch.isalpha():
                raise ValueError(f"unsupported Teradata datetime token at {pat[i:]!r}")
            out.append(ch)
            i += 1
    return "".join(out)


_LITERAL_RE = re.compile(r"'(?:[^']|'')*'")
_MASK = "\x00L{}\x00"
_MASK_RE = re.compile("\x00L(\\d+)\x00")


def _mask_literals(sql: str) -> tuple[str, list[str]]:
    lits: list[str] = []

    def sub(m: re.Match) -> str:
        lits.append(m.group(0))
        return _MASK.format(len(lits) - 1)

    return _LITERAL_RE.sub(sub, sql), lits


def _unmask(sql: str, lits: list[str]) -> str:
    return _MASK_RE.sub(lambda m: lits[int(m.group(1))], sql)


def _lit_value(arg: str, lits: list[str]) -> str | None:
    """If ``arg`` is exactly one masked literal, return its unquoted text."""
    m = _MASK_RE.fullmatch(arg.strip())
    if not m:
        return None
    raw = lits[int(m.group(1))]
    return raw[1:-1].replace("''", "'")


def _quote(text: str) -> str:
    return "'" + text.replace("'", "''") + "'"


# --- callable rewrites -------------------------------------------------------

RewriteFn = Callable[[list[str], list[str]], "str | None"]


def _rw_date_format(args: list[str], lits: list[str]) -> str | None:
    # date_format(ts, '%Y-%m-%d') — translate only when the pattern is a
    # literal containing MySQL codes; otherwise leave for Spark (JDK) syntax.
    if len(args) != 2:
        return None
    pat = _lit_value(args[1], lits)
    if pat is None or "%" not in pat:
        return None
    return f"date_format({args[0]}, {_quote(mysql_pattern_to_jdk(pat))})"


def _rw_date_parse(args: list[str], lits: list[str]) -> str | None:
    if len(args) != 2:
        return None
    pat = _lit_value(args[1], lits)
    if pat is None:
        return None
    return f"to_timestamp({args[0]}, {_quote(mysql_pattern_to_jdk(pat))})"


def _rw_format_datetime(args: list[str], lits: list[str]) -> str | None:
    if len(args) != 2:
        return None
    pat = _lit_value(args[1], lits)
    if pat is None:
        return None
    return f"date_format({args[0]}, {_quote(joda_pattern_to_jdk(pat))})"


def _rw_parse_datetime(args: list[str], lits: list[str]) -> str | None:
    if len(args) != 2:
        return None
    pat = _lit_value(args[1], lits)
    if pat is None:
        return None
    return f"to_timestamp({args[0]}, {_quote(joda_pattern_to_jdk(pat))})"


def _rw_max_n(args: list[str], lits: list[str]) -> str | None:
    # MaxNAggregationFunction.java: max(x, n) -> n largest values as array.
    # Only fires on a 2-arg call with an integer-literal n (never the plain
    # aggregate).
    if len(args) != 2 or not args[1].strip().isdigit():
        return None
    return f"slice(reverse(array_sort(collect_list({args[0]}))), 1, {args[1]})"


def _rw_min_n(args: list[str], lits: list[str]) -> str | None:
    if len(args) != 2 or not args[1].strip().isdigit():
        return None
    return f"slice(array_sort(collect_list({args[0]})), 1, {args[1]})"


_NORM_FORMS = {"NFC", "NFD", "NFKC", "NFKD"}


def _rw_normalize(args: list[str], lits: list[str]) -> str | None:
    if len(args) == 1:
        return f"unicode_normalize('NFC', {args[0]})"
    if len(args) == 2:
        form = (_lit_value(args[1], lits) or args[1]).strip().upper()
        if form in _NORM_FORMS:
            return f"unicode_normalize('{form}', {args[0]})"
    return None


def _mk_teradata_rw(spark_fn: str) -> RewriteFn:
    # presto-teradata-functions to_char/to_date/to_timestamp: fire only on
    # the 2-arg form with a literal Teradata pattern; Spark's native 1-arg
    # to_date/to_timestamp (and our ISO rewrites that emit them) pass through.
    def rw(args: list[str], lits: list[str]) -> str | None:
        if len(args) != 2:
            return None
        pat = _lit_value(args[1], lits)
        if pat is None:
            return None
        try:
            jdk = teradata_pattern_to_jdk(pat)
        except ValueError:
            return None
        return f"{spark_fn}({args[0]}, {_quote(jdk)})"

    return rw


def _hrs_part(value_expr: str, unit: str) -> str:
    return (
        f"CASE WHEN {value_expr} > 0 THEN CAST({value_expr} AS STRING) || ' ' || "
        f"CASE WHEN {value_expr} = 1 THEN '{unit}' ELSE '{unit}s' END END"
    )


_HRS_N = "CAST(round(CAST($1 AS DOUBLE)) AS BIGINT)"
_HRS_TEMPLATE = (
    "COALESCE(nullif(concat_ws(', ', "
    + _hrs_part(f"({_HRS_N} DIV 604800)", "week")
    + ", "
    + _hrs_part(f"(({_HRS_N} % 604800) DIV 86400)", "day")
    + ", "
    + _hrs_part(f"(({_HRS_N} % 86400) DIV 3600)", "hour")
    + ", "
    + _hrs_part(f"(({_HRS_N} % 3600) DIV 60)", "minute")
    + ", "
    + _hrs_part(f"({_HRS_N} % 60)", "second")
    + "), ''), '0 seconds')"
)

_ERF = "reflect('org.apache.commons.math3.special.Erf', 'erf', CAST({} AS DOUBLE))"
_ERFINV = "reflect('org.apache.commons.math3.special.Erf', 'erfInv', CAST({} AS DOUBLE))"

# Argument-restructuring rewrites, applied by the transpiler. Each maps a
# Presto call shape to a Spark SQL template with $1..$n placeholders, or a
# callable for literal-dependent shapes.
REWRITE: dict[str, "str | RewriteFn"] = {
    # DateTimeFunctions.java date_add(unit, n, ts): unit becomes a keyword.
    "date_add": "timestampadd(__UNIT($1), $2, $3)",
    "date_diff": "timestampdiff(__UNIT($1), $2, $3)",
    # MySQL-pattern and Joda-pattern translation (DateTimeFunctions.java:63,
    # 95 functions; the reference's dashboard-facing surface).
    "date_format": _rw_date_format,
    "date_parse": _rw_date_parse,
    "format_datetime": _rw_format_datetime,
    "parse_datetime": _rw_parse_datetime,
    # from_unixtime returns TIMESTAMP in Presto; Spark's returns a string.
    "from_unixtime": "timestamp_seconds($1)",
    # to_unixtime returns DOUBLE seconds (Presto); unix_timestamp truncates.
    "to_unixtime": "(CAST(unix_micros(CAST($1 AS TIMESTAMP)) AS DOUBLE) / 1000000.0)",
    # Presto day_of_week is ISO (Mon=1..Sun=7); Spark dayofweek is Sun=1.
    "day_of_week": "((dayofweek($1) + 5) % 7 + 1)",
    "dow": "((dayofweek($1) + 5) % 7 + 1)",
    "year_of_week": "extract(YEAROFWEEK FROM $1)",
    "yow": "extract(YEAROFWEEK FROM $1)",
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
    # Min/MaxNAggregationFunction.java — top-n aggregates.
    "max": _rw_max_n,
    "min": _rw_min_n,
    # UrlFunctions.java:43 — URLEncoder matches Presto byte-for-byte
    # (space -> '+', UTF-8 percent escapes).
    "url_encode": "reflect('java.net.URLEncoder', 'encode', CAST($1 AS STRING), 'UTF-8')",
    "url_decode": "reflect('java.net.URLDecoder', 'decode', CAST($1 AS STRING), 'UTF-8')",
    # MathFunctions.java:65 radix conversion (Presto emits lowercase digits).
    "from_base": "CAST(conv($1, $2, 10) AS BIGINT)",
    "to_base": "lower(conv(CAST($1 AS STRING), 10, $2))",
    # MathFunctions normal_cdf/inverse_normal_cdf via commons-math Erf
    # (on Spark's classpath); reflect returns string, round-trips doubles
    # exactly through Double.toString.
    "normal_cdf": (
        "(0.5 * (1.0 + CAST(" + _ERF.format("(($3) - ($1)) / (($2) * sqrt(2.0))") + " AS DOUBLE)))"
    ),
    "inverse_normal_cdf": (
        "(($1) + ($2) * sqrt(2.0) * CAST(" + _ERFINV.format("2.0 * ($3) - 1.0") + " AS DOUBLE))"
    ),
    # MathFunctions beta_cdf via commons-math regularized incomplete beta
    # (Beta.regularizedBeta(x, a, b); Presto argument order is (a, b, value)).
    "beta_cdf": (
        "CAST(reflect('org.apache.commons.math3.special.Beta', 'regularizedBeta', "
        "CAST($3 AS DOUBLE), CAST($1 AS DOUBLE), CAST($2 AS DOUBLE)) AS DOUBLE)"
    ),
    # WilsonInterval.java — score interval bounds from (successes, trials, z).
    "wilson_interval_lower": (
        "((($1) / CAST($2 AS DOUBLE) + ($3) * ($3) / (2.0 * ($2)) - ($3) * "
        "sqrt((($1) / CAST($2 AS DOUBLE)) * (1.0 - ($1) / CAST($2 AS DOUBLE)) / ($2) "
        "+ ($3) * ($3) / (4.0 * ($2) * ($2)))) / (1.0 + ($3) * ($3) / ($2)))"
    ),
    "wilson_interval_upper": (
        "((($1) / CAST($2 AS DOUBLE) + ($3) * ($3) / (2.0 * ($2)) + ($3) * "
        "sqrt((($1) / CAST($2 AS DOUBLE)) * (1.0 - ($1) / CAST($2 AS DOUBLE)) / ($2) "
        "+ ($3) * ($3) / (4.0 * ($2) * ($2)))) / (1.0 + ($3) * ($3) / ($2)))"
    ),
    # ArrayNgramsFunction.java — n-grams over any array; when n exceeds the
    # array length Presto returns the whole array as the single n-gram.
    "ngrams": "transform(sequence(1, greatest(size($1) - ($2) + 1, 1)), i -> slice($1, i, $2))",
    # HyperLogLogFunctions.java / ApproximateSetAggregation.java — mergeable
    # sketches over Spark's DataSketches HLL.
    "approx_set": "hll_sketch_agg($1)",
    "merge": "hll_union_agg($1)",
    # cardinality(hll) is type-directed in Presto; on sketch columns use
    # hll_cardinality explicitly (cardinality stays the array/map function).
    "hll_cardinality": "hll_sketch_estimate($1)",
    # VarbinaryFunctions.java sha256/sha512 -> Spark's parameterized sha2.
    # sha2 returns a hex STRING; Presto returns varbinary — unhex restores
    # the binary type contract so to_hex/to_base64 compose correctly.
    "sha256": "unhex(sha2($1, 256))",
    "sha512": "unhex(sha2($1, 512))",
    # MathFunctions.java IEEE 754 bit patterns via java.lang reflection
    # (big-endian binary, matching Presto's to/from_ieee754_* exactly).
    "to_ieee754_64": (
        "unhex(lpad(hex(CAST(reflect('java.lang.Double', 'doubleToRawLongBits', "
        "CAST($1 AS DOUBLE)) AS BIGINT)), 16, '0'))"
    ),
    "from_ieee754_64": (
        "CAST(reflect('java.lang.Double', 'longBitsToDouble', "
        "CAST(reflect('java.lang.Long', 'parseUnsignedLong', conv(hex($1), 16, 10)) "
        "AS BIGINT)) AS DOUBLE)"
    ),
    "to_ieee754_32": (
        "unhex(lpad(hex(CAST(reflect('java.lang.Float', 'floatToRawIntBits', "
        "CAST($1 AS FLOAT)) AS BIGINT) & 4294967295), 8, '0'))"
    ),
    "from_ieee754_32": (
        "CAST(reflect('java.lang.Float', 'intBitsToFloat', "
        "CAST(reflect('java.lang.Integer', 'parseUnsignedInt', conv(hex($1), 16, 10)) "
        "AS INT)) AS FLOAT)"
    ),
    # VarbinaryFunctions.java to/from_base64url: Java's Base64.getUrlEncoder()
    # is the standard alphabet with '+/' swapped for '-_' (padding kept).
    "to_base64url": "translate(base64($1), '+/', '-_')",
    "from_base64url": "unbase64(translate($1, '-_', '+/'))",
    # VarbinaryFunctions.java big-endian encodings: hex already renders the
    # two's-complement bit pattern; parseUnsigned{Long,Int} folds it back to
    # the signed value without overflow (conv keeps it an unsigned string).
    "to_big_endian_64": "unhex(lpad(hex($1), 16, '0'))",
    "from_big_endian_64": (
        "CAST(reflect('java.lang.Long', 'parseUnsignedLong', conv(hex($1), 16, 10)) "
        "AS BIGINT)"
    ),
    "to_big_endian_32": "unhex(lpad(hex(CAST($1 AS BIGINT) & 4294967295), 8, '0'))",
    "from_big_endian_32": (
        "CAST(reflect('java.lang.Integer', 'parseUnsignedInt', conv(hex($1), 16, 10)) "
        "AS INT)"
    ),
    # DateTimeFunctions.java human_readable_seconds: week/day/hour/minute/
    # second decomposition with pluralization; concat_ws drops the NULL
    # zero-valued units and the empty string falls back to '0 seconds'.
    "human_readable_seconds": _HRS_TEMPLATE,
    # DateTimeFunctions.java ISO 8601 surface. to_iso8601 is type-directed in
    # Presto (DATE -> 'yyyy-MM-dd'); the textual transpiler always emits the
    # timestamp form (see DELTAS).
    "to_iso8601": 'date_format($1, "yyyy-MM-dd\'T\'HH:mm:ss.SSS")',
    "from_iso8601_timestamp": "to_timestamp($1)",
    "from_iso8601_date": "to_date($1)",
    "millisecond": "CAST(date_format($1, 'SSS') AS INT)",
    # to_milliseconds(interval day to second): adding the interval to an epoch
    # anchor keeps sub-second precision (CAST(interval AS BIGINT) truncates
    # to whole seconds).
    "to_milliseconds": ("CAST(unix_micros(TIMESTAMP '1970-01-01 00:00:00' + ($1)) / 1000 AS BIGINT)"),
    # DateTimeFunctions.java:1331 parse_duration('3.5h') -> interval. Value
    # and unit are picked apart by regex; unit factors are Presto's
    # (ns/us/ms/s/m/h/d).
    "parse_duration": (
        "make_dt_interval(0, 0, 0, "
        "CAST(regexp_extract($1, '^[ ]*([0-9]+(\\\\.[0-9]+)?)[ ]*([a-z]+)[ ]*$', 1) AS DOUBLE) * "
        "CASE regexp_extract($1, '^[ ]*([0-9]+(\\\\.[0-9]+)?)[ ]*([a-z]+)[ ]*$', 3) "
        "WHEN 'ns' THEN 0.000000001 WHEN 'us' THEN 0.000001 WHEN 'ms' THEN 0.001 "
        "WHEN 's' THEN 1.0 WHEN 'm' THEN 60.0 WHEN 'h' THEN 3600.0 WHEN 'd' THEN 86400.0 END)"
    ),
    # DataSizeFunctions.java:37 parse_presto_data_size('2.3MB') -> bytes as
    # DECIMAL(38,0); binary units, kB = 1024.
    "parse_presto_data_size": (
        "CAST(CAST(regexp_extract($1, '^[ ]*([0-9]+(\\\\.[0-9]+)?)[ ]*([A-Za-z]+)[ ]*$', 1) AS DOUBLE) * "
        "CASE regexp_extract($1, '^[ ]*([0-9]+(\\\\.[0-9]+)?)[ ]*([A-Za-z]+)[ ]*$', 3) "
        "WHEN 'B' THEN 1.0 WHEN 'kB' THEN 1024.0 WHEN 'MB' THEN 1048576.0 "
        "WHEN 'GB' THEN 1073741824.0 WHEN 'TB' THEN 1099511627776.0 "
        "WHEN 'PB' THEN 1125899906842624.0 WHEN 'EB' THEN 1152921504606846976.0 "
        "WHEN 'ZB' THEN 1180591620717411303424.0 WHEN 'YB' THEN 1208925819614629174706176.0 "
        "END AS DECIMAL(38,0))"
    ),
    # SplitToMultimapFunction.java — map<varchar, array<varchar>> grouping
    # duplicate keys. Composed from codegen-able HOFs; $1 is evaluated per
    # reference (three scans of the same split) — fine for a scalar surface,
    # never on the engine's own hot path.
    "split_to_multimap": (
        "map_from_entries(transform("
        "array_distinct(transform(split($1, $2), e -> split_part(e, $3, 1))), "
        "k -> struct(k AS key, transform(filter(split($1, $2), e -> split_part(e, $3, 1) = k), "
        "e -> split_part(e, $3, 2)) AS value)))"
    ),
    # TeradataStringFunctions.java char2hexint — hex of UTF-16BE code units.
    "char2hexint": "hex(encode($1, 'UTF-16BE'))",
    # presto-teradata-functions TeradataDateFunctions — Teradata-pattern
    # datetime formatting/parsing (2-arg literal-pattern form only).
    "to_char": _mk_teradata_rw("date_format"),
    "to_date": _mk_teradata_rw("to_date"),
    "to_timestamp": _mk_teradata_rw("to_timestamp"),
    # StringFunctions.java normalize(s[, form]) — Unicode normalization; the
    # form is a bare keyword (NFC/NFD/NFKC/NFKD) in Presto's grammar.
    # unicode_normalize is a register_udfs() Python UDF (no JVM builtin).
    "normalize": _rw_normalize,
    # MapConstructor.java — Presto's map() takes (key_array, value_array);
    # Spark's two-array spelling is map_from_arrays (flat map(k,v,...) calls
    # pass through untouched: only the exact 2-arg Presto shape rewrites).
    "map": (lambda args, lits: f"map_from_arrays({args[0]}, {args[1]})" if len(args) == 2 else None),
    # StringFunctions.java levenshteinDistance — Spark spells it levenshtein.
    "levenshtein_distance": "levenshtein($1, $2)",
    # ArrayContains.java — Presto contains(array, elem); Spark's bare
    # `contains` is a *string* function, so the Presto spelling must map to
    # array_contains. (Presto 319 has no string contains — strpos/LIKE.)
    "contains": "array_contains($1, $2)",
    # RepeatFunction.java — repeat(element, count) returns ARRAY in Presto
    # (string repetition is rpad there); Spark's repeat is string-only.
    "repeat": "array_repeat($1, $2)",
    # ElementAt: Presto returns NULL for a missing map key or out-of-range
    # index (ElementAtFunction.java); Spark's element_at THROWS under ANSI
    # mode. try_element_at restores the reference contract.
    "element_at": "try_element_at($1, $2)",
    # StringFunctions.java splitPart: out-of-range index -> NULL (Spark's
    # split_part returns ''). \\Q..\\E regex-quotes the delimiter so dynamic
    # (non-literal) delimiters split literally, matching Presto.
    "split_part": "try_element_at(split($1, concat('\\\\Q', $2, '\\\\E'), -1), $3)",
    # MathFunctions.java special values; Spark has no infinity()/nan()
    # constructors or is_finite/is_infinite predicates.
    "infinity": "CAST('Infinity' AS DOUBLE)",
    "nan": "CAST('NaN' AS DOUBLE)",
    "is_finite": "(NOT isnan(CAST($1 AS DOUBLE)) AND abs(CAST($1 AS DOUBLE)) <> CAST('Infinity' AS DOUBLE))",
    "is_infinite": "(abs(CAST($1 AS DOUBLE)) = CAST('Infinity' AS DOUBLE))",
    # DateTimeFunctions at_timezone/with_timezone. The engine models every
    # timestamp as a UTC instant (COVERAGE §1.2): at_timezone re-renders the
    # instant on the target zone's wall clock; with_timezone interprets a
    # naive wall clock IN the zone and yields the UTC instant.
    "at_timezone": "convert_timezone('UTC', $2, $1)",
    "with_timezone": "convert_timezone($2, 'UTC', $1)",
    # MathFunctions.java cosineSimilarity over sparse map vectors: dot over
    # the left map's keys / (l2(left) * l2(right)) — pure codegen HOFs, the
    # same shape the reference computes over its map blocks.
    "cosine_similarity": (
        "(aggregate(map_keys($1), CAST(0 AS DOUBLE), "
        "(acc, k) -> acc + coalesce(try_element_at($2, k), CAST(0 AS DOUBLE)) * try_element_at($1, k)) "
        "/ (sqrt(aggregate(map_values($1), CAST(0 AS DOUBLE), (a, x) -> a + x * x)) "
        "* sqrt(aggregate(map_values($2), CAST(0 AS DOUBLE), (a, x) -> a + x * x))))"
    ),
}

# Semantic deltas a migrating user must know (pinned by the conformance corpus).
DELTAS = {
    "ST_Crosses": "Linestring/linestring crosses uses exact orientation "
    "arithmetic (proper sign change on both edge orientations). A crossing "
    "that passes exactly THROUGH A VERTEX of either line (vertex-grazing: "
    "some orientation is zero at the meeting point, e.g. a line through a "
    "zigzag's apex) classifies as a touch here — crosses=false, "
    "touches=true — while the strict OGC/Esri Relate matrix reports "
    "crosses=true when both interiors meet. For the strict classification "
    "use st_relate_lines (the exact split-and-classify DE-9IM, r6) and "
    "test the matrix — it reports the vertex-grazing case as the "
    "reference does; the codegen predicate stays the fast path. Proper "
    "crossings, endpoint touches, and collinear overlaps classify "
    "identically to the reference on both paths.",
    "ST_Buffer": "Point buffers are regular 32-gon rings approximating the "
    "Esri round buffer (area within 0.65% of pi*r^2; raise n in "
    "st_buffer_point where tighter bounds matter). LINESTRING buffers "
    "(st_buffer_line) fold per-segment stadium polygons through the exact "
    "overlay union with m=8 polygonal half-caps (same inscribed "
    "convention, so a straight segment's area is exactly "
    "2rL + m*r^2*sin(pi/m)). POLYGON buffers with positive distance "
    "(st_buffer_polygon) are the Minkowski dilation by the same inscribed "
    "disc (holes erode with sharp corners and vanish when narrower than "
    "2r); NEGATIVE distances are st_erode_polygon — the morphological "
    "complement (subtract the boundary-stadium union), returning a "
    "MULTIPOLYGON since erosion can split the polygon at necks narrower "
    "than 2|r| (fn_geo_erode_polygon).",
    "ST_AsText": "Double formatting follows Spark's cast-to-string (POINT "
    "(60.0 30.0)) where the reference's Esri writer trims integral doubles "
    "(POINT (60 30)); parse both spellings, compare geometries numerically.",
    "ST_* geometry model": "Geometries are structs/arrays of doubles "
    "(point struct, array<struct<x,y>> linestrings/rings, one nesting "
    "level per composite: holed polygons, MULTIPOINT/MULTILINESTRING/"
    "MULTIPOLYGON; flat GEOMETRYCOLLECTION as array<tagged-union>). WKT "
    "and WKB codecs round-trip the model; one-level nested "
    "GEOMETRYCOLLECTION members flatten at WKT parse time (union "
    "semantics are nesting-invariant, r10); only two-deep nesting stays "
    "NULL — see COVERAGE.md geospatial section. General polygon boolean "
    "ops returning GEOMETRY ARE implemented (exact-rational planar "
    "overlay; see the `polygon boolean ops (geometry output)` row).",
    "ST_LineString / ST_MultiPoint": "The reference throws "
    "INVALID_FUNCTION_ARGUMENT on a null/empty member point or consecutive "
    "duplicate vertices; the planar constructors return NULL instead so an "
    "ANSI-on pipeline degrades per-row rather than dying (st_linestring_of/"
    "st_multipoint_of, functions/geo.py).",
    "ST_Intersection (polygon case)": "Polygon/polygon intersection is the "
    "published Sutherland-Hodgman clip (st_intersection_convex): exact for "
    "a CONVEX clip ring; a non-convex subject clips correctly except that "
    "disconnected pieces come back joined by degenerate bridge edges, and "
    "a pure edge/corner contact yields a degenerate zero-area ring or the "
    "empty ring where the reference returns a LINESTRING/POINT geometry. "
    "ST_Union/ST_SymDifference/ST_Difference also ship as exact AREA "
    "analogs by inclusion-exclusion. For geometry OUTPUT on arbitrary "
    "(non-convex, holed) pairs use the overlay-backed st_*_geom forms "
    "instead (`polygon boolean ops (geometry output)` row); for ANY "
    "simple pair family — point/point, point/line, point/polygon, "
    "line/line (overlap segments + crossing points), line/polygon "
    "(chord clip + boundary touches), polygon/polygon — "
    "st_intersection_any dispatches the tagged union to exact "
    "mixed-dimension kernels returning the pieces struct "
    "(fn_geo_intersection_any).",
    "polygon boolean ops (geometry output)": "ST_Intersection/ST_Union/"
    "ST_Difference/ST_SymDifference for arbitrary simple polygon pairs "
    "(holes allowed) return AREA geometry in the MULTIPOLYGON "
    "representation via the exact-rational planar overlay "
    "(operators/polygon_overlay.py). The st_*_geom forms return area "
    "pieces only; the MIXED-DIMENSION intersection result the Esri-backed "
    "reference produces (shared edges of edge-adjacent polygons as "
    "LINESTRINGs, touch points as POINTs, GEOMETRYCOLLECTION when mixed) "
    "is st_intersection_pieces + st_collection_of_pieces (a flat "
    "tagged-union collection composing with every st_collection_* "
    "accessor; OGC type collapse via st_pieces_geometry_type, with the "
    "empty result pinned to the empty-collection tag). Empty results are "
    "the empty array, NULL inputs NULL, and a malformed row degrades to "
    "NULL instead of failing the job. Outer rings come back CCW and holes "
    "CW, closed, with exact-rational vertices rounded to double on "
    "output. Per-row cost is Python-side (exact arithmetic, "
    "float-filtered); the scale axis is row parallelism, not per-row "
    "vertex count.",
    "SphericalGeography": "to_spherical_geography returns NULL on "
    "out-of-range lat/lon (reference throws); ST_Area(geography) "
    "implements the reference's spherical-excess sum INCLUDING the "
    "courseDelta pole-enclosure correction (fn_geo_spherical_pole), so "
    "pole-enclosing polygons measure correctly; ST_Distance(geography) "
    "covers the point case, matching the reference's own TODO at "
    "stSphericalDistance:1497; ST_Length(geography) for linestrings is an "
    "extension beyond reference 319 (the great-circle edge sum, the "
    "modern-Presto behavior).",
    "ST_Relate": "The full DE-9IM matrix is computed exactly for "
    "AXIS-ALIGNED ENVELOPE pairs as pure codegen (st_relate_envelopes) "
    "and for ARBITRARY polygon pairs with holes via the overlay "
    "arrangement (st_relate_polygons, Arrow-batched — "
    "fn_geo_relate_pairs), plus the mixed-dimension LINESTRING/POLYGON "
    "(st_relate_line_polygon) and pure-codegen POINT/POLYGON "
    "(st_relate_point_polygon) matrices — fn_geo_relate_mixed — and the "
    "LINESTRING/LINESTRING, POINT/LINESTRING, POINT/POINT matrices "
    "(st_relate_lines, st_relate_point_line, st_relate_points — "
    "fn_geo_relate_lines). Every geometry-pair family's full matrix is "
    "available; GEOMETRYCOLLECTION operands are not (COVERAGE). "
    "Degenerate inputs (zero-extent envelopes, zero-area polygons) yield "
    "NULL where the reference treats them as lower-dimensional "
    "geometries.",
    "polygon-pair predicates": "ST_Intersects/ST_Touches/ST_Overlaps/"
    "ST_Contains/ST_Within/ST_Equals/ST_Disjoint for polygon/polygon pairs "
    "are composed from planar primitives (proper edge crossing, strict "
    "vertex containment, convex-centroid witness, mutual covering) instead "
    "of Esri's Relate. Exact whenever one of those witnesses decides the "
    "relation — all generic-position pairs, plus equal/nested convex pairs; "
    "the residue (concave polygons whose every vertex AND edge midpoint "
    "grazes the other's boundary) may misclassify, the same vertex-grazing "
    "delta the line predicates document. Holed polygons participate via "
    "their exterior ring.",
    "ST_Length on non-line tags": "The reference's ST_Length throws "
    "INVALID_FUNCTION_ARGUMENT for polygon and point inputs; the tagged-"
    "union twin (st_length_any) degrades to 0.0 there so a columnar plan "
    "stays NULL-safe. Line and multiline tags measure identically.",
    "ST_Geometries on non-collections": "The reference returns a 1-element "
    "array containing the geometry itself when the input is not a "
    "collection; applied to this engine's holed-polygon representation "
    "(array of rings) st_geometries returns the RINGS — use it on multi-* "
    "arrays only, or wrap the polygon in a 1-element array first.",
    "geometry_invalid_reason": "Planar validity reuses the reference's "
    "NON_SIMPLE_REASONS spellings (GeoFunctions.java:125) for the checks "
    "expressible over the vertex array: 'Degenerate segments', 'Repeated "
    "points', 'Self-intersection', and 'Disconnected interior' (a hole "
    "escaping its shell's envelope). Esri's finer split (Self-tangency vs "
    "Cracking, tolerance-based Clustering) collapses into those; the "
    "'at or near (x y)' location suffix is not emitted.",
    "array subscript": "Presto arr[n] is 1-based and raises out-of-bounds; the "
    "transpiler rewrites integer-literal subscripts to try_element_at(arr, n) "
    "(1-based, preserving every in-bounds value) but an out-of-bounds ordinal "
    "yields NULL instead of Presto's error.",
    "ln": "Presto ln(0) = -Infinity, ln(<0) = NaN; Spark ln(<=0) = NULL.",
    "map": "2-arg map() is rewritten as the Presto two-array constructor; "
    "Spark's flat 2-arg map(k, v) form must be spelled map_from_entries or "
    "use >2 args in transpiled SQL.",
    "array_agg": "Presto keeps NULLs; Spark collect_list drops them.",
    "round": "Presto/Spark round HALF_UP on doubles; DuckDB differs at exact .5 decimals.",
    "element_at": "Both 1-based; transpiled element_at maps to try_element_at, "
    "restoring Presto's NULL-on-missing-key/out-of-range contract (Spark's own "
    "element_at errors under ANSI).",
    "json_parse": "Presto has a JSON type; Spark represents json as string.",
    "zip": "Presto rows have unnamed fields; Spark arrays_zip names struct fields 0..n / by column.",
    "histogram": "No single Spark aggregate; expressed as groupBy-count + "
    "map_from_entries (see fn_histogram in the corpus).",
    "map_agg": "Expressed as map_from_entries(collect_list(struct(k, v))); "
    "duplicate-key resolution is last-wins on both engines (see fn_map_agg).",
    "cardinality": "On HLL sketches Presto overloads cardinality(); here the "
    "sketch estimator is the explicit hll_cardinality/hll_sketch_estimate.",
    "hmac_*": "No JVM builtin; registered as Python UDFs via "
    "register_udfs(spark) — the documented slow path, never on a hot path.",
    "combinations": "Registered as a Python UDF via register_udfs(spark).",
    "spooky_hash_v2_*": "Registered Python UDFs (operators/spooky.py), "
    "asserted against the reference's own test vectors.",
    "approx_most_frequent": "Computed exactly (groupBy-count + top-k window; "
    "see fn_approx_most_frequent) — a valid refinement of the sketch bounds.",
    "qdigest/merge": "Re-aggregatable percentiles expressed two ways: "
    "mergeable histogram rollups (fn_quantile_rollup) and true DataSketches "
    "KLL sketches (fn_kll_quantile). No qdigest binary interchange — "
    "sketches built in one engine cannot be read by the other.",
    "make_set_digest/merge_set_digest/intersection_cardinality": "Modeled "
    "with DataSketches theta sketches (theta_sketch_agg/theta_union/"
    "theta_intersection, fn_theta_setdigest) — the same mergeable "
    "union/intersection algebra; SetDigest binaries are not interchangeable.",
    "decimal division": "Result scale rules differ (Presto caps at 38 with "
    "its own scale formula; Spark adjusts precision/scale on overflow) — "
    "cast explicitly when migrating precision-sensitive divisions.",
    "split": "Presto's delimiter is a literal string; Spark's is a regex. "
    "Plain-text delimiters (',', ';', '=') behave identically; regex "
    "metacharacters ('|', '.') must be escaped when migrating.",
    "to_iso8601": "Type-directed in Presto (DATE formats as 'yyyy-MM-dd'); "
    "the textual transpiler always emits the timestamp form — cast DATE "
    "columns or format directly.",
    "timezone_hour/minute": "Presto extracts the offset of TIMESTAMP WITH "
    "TIME ZONE; Spark has no tz-carrying type (session-zone instants only), "
    "so there is no per-value offset to extract.",
    "localtime": "Presto returns TIME; Spark 4.1's native TIME type "
    "(build_session enables the feature flag) makes this current_time() "
    "directly — see fn_time and COVERAGE §1.2.",
    "multimap_from_entries": "Spark struct field names are expression-"
    "derived, so no generic textual rewrite; build with named fields and "
    "the split_to_multimap/map_agg shapes (fn_multimap, fn_map_agg).",
    "parse_presto_data_size": "Computed via double multiplication then cast "
    "to DECIMAL(38,0) — exact through TB; EB+ magnitudes round at the "
    "double's 53-bit mantissa.",
    "to_char/to_date/to_timestamp": "2-arg literal patterns are interpreted "
    "as Teradata codes (mi=minute, hh24=24-hour — the teradata-functions "
    "plugin semantics); JDK-style 'HH'/'mm' in those positions would be "
    "reinterpreted. 1-arg forms keep Spark semantics.",
}

FUNCTION_MAP: dict[str, str] = {}
for _name in SAME:
    FUNCTION_MAP[_name] = _name
for _name, _spark in RENAME.items():
    FUNCTION_MAP[_name] = _spark
for _name, _rw in REWRITE.items():
    FUNCTION_MAP[_name] = f"<rewrite> {_rw if isinstance(_rw, str) else _rw.__name__}"

_UNITS = {"second", "minute", "hour", "day", "week", "month", "quarter", "year"}

# Presto type names with different Spark spellings, in CAST position only
# (SqlBase.g4 type rules). Length-parameterized VARCHAR(n) is valid Spark and
# passes through.
_TYPE_RENAMES = [
    (re.compile(r"\bAS\s+VARCHAR\b(?!\s*\()", re.IGNORECASE), "AS STRING"),
    (re.compile(r"\bAS\s+VARBINARY\b", re.IGNORECASE), "AS BINARY"),
    (re.compile(r"\bAS\s+REAL\b", re.IGNORECASE), "AS FLOAT"),
    # Presto's bare `localtime` keyword -> Spark 4.1's TIME-typed
    # current_time() (the function-call form, so the keyword never collides
    # with identifiers named localtime_something).
    (re.compile(r"\blocaltime\b(?!\s*\()", re.IGNORECASE), "current_time()"),
]


def _split_args(argstr: str) -> list[str]:
    """Split a (literal-masked) call argument list on top-level commas."""
    args, depth, cur = [], 0, []
    for ch in argstr:
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
    """Locate ``name( ... )`` at/after start in masked SQL; return (begin, end, args)."""
    pat = re.compile(r"\b" + re.escape(name) + r"\s*\(", re.IGNORECASE)
    m = pat.search(sql, start)
    if not m:
        return None
    depth, i = 1, m.end()
    while i < len(sql) and depth:
        ch = sql[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        i += 1
    return m.start(), i, _split_args(sql[m.end() : i - 1])


_ARRAY_LIT = re.compile(r"\bARRAY\s*\[", re.IGNORECASE)


def _rewrite_array_literals(sql: str) -> str:
    """Presto ``ARRAY[a, b]`` constructor -> Spark ``array(a, b)``.

    Bracket-matching (not regex) so nested constructors and subscripts
    survive; runs on literal-masked SQL so bracketed text inside strings is
    never touched. Each pass rewrites the first (outermost) occurrence and
    re-scans, which unwraps nested ARRAY[ARRAY[...]] from the outside in.
    """
    while True:
        m = _ARRAY_LIT.search(sql)
        if not m:
            return sql
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            ch = sql[i]
            if ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
            i += 1
        sql = sql[: m.start()] + "array(" + sql[m.end() : i - 1] + ")" + sql[i:]


_SUBSCRIPT = re.compile(r"\[\s*(\d+)\s*\]")


def _rewrite_subscripts(sql: str) -> str:
    """Presto ordinal subscript ``expr[n]`` -> Spark ``element_at(expr, n)``.

    Presto's ``[]`` is 1-based on arrays (ArraySubscriptOperator.java:60) and
    key-lookup on maps; Spark's ``[]`` is 0-based on arrays, so passing the
    subscript through would silently shift every array ordinal by one.
    ``element_at`` is 1-based on arrays and key-lookup on maps — Presto's
    ``[]`` semantics for both. (The downstream REWRITE pass turns it into
    ``try_element_at``, so an out-of-bounds ordinal yields NULL where Presto
    raises — the in-bounds values agree; documented in DELTAS.) Only
    integer-literal subscripts are rewritten: string-key map subscripts are
    masked literals at this stage (never pure digits) and already agree
    between engines. Runs on masked SQL after ARRAY[...] constructors are
    gone, so every remaining ``[n]`` is a subscript. Chained subscripts
    ``a[1][2]`` unwrap across re-scans.
    """
    while True:
        m = _SUBSCRIPT.search(sql)
        if m is None:
            return sql
        # Walk backwards over the base expression the subscript applies to:
        # a (possibly qualified) identifier, a call/paren group, or a chain
        # of both (``f(x)[1]``, ``element_at(a, 1)[2]``).
        i = m.start()
        while i > 0 and sql[i - 1].isspace():
            i -= 1
        j = i
        while j > 0:
            ch = sql[j - 1]
            if ch in ")]":
                opener = "(" if ch == ")" else "["
                depth = 0
                while j > 0:
                    j -= 1
                    if sql[j] == ch:
                        depth += 1
                    elif sql[j] == opener:
                        depth -= 1
                        if depth == 0:
                            break
                continue  # keep walking: the function name before the parens
            if ch.isalnum() or ch in "_.$\x00":
                j -= 1
                continue
            break
        base = sql[j:i]
        if not base:
            return sql  # stray bracket; leave untouched rather than mangle
        sql = f"{sql[:j]}element_at({base}, {m.group(1)}){sql[m.end():]}"


def transpile(sql: str) -> str:
    """Rewrite Presto-dialect SQL into Spark SQL.

    Handles RENAME (name swap) and REWRITE (argument restructuring);
    SAME-named functions pass through untouched. String literals are masked
    for the duration of both passes. Nested calls are handled by re-scanning
    from each replacement.
    """
    out, lits = _mask_literals(sql)
    out = _rewrite_array_literals(out)
    out = _rewrite_subscripts(out)
    for name, rw in REWRITE.items():
        pos = 0
        while True:
            found = _find_call(out, name, pos)
            if found is None:
                break
            begin, end, args = found
            if isinstance(rw, str):
                # Presto date_add/date_diff take a unit literal first; Spark's
                # native 2-arg date_add(date, n) must pass through untouched.
                if name in ("date_add", "date_diff"):
                    unit = _lit_value(args[0], lits) if args else None
                    if unit is None or unit.lower() not in _UNITS:
                        pos = begin + len(name)
                        continue
                repl = rw
                for idx, arg in enumerate(args, 1):
                    if f"__UNIT(${idx})" in repl:
                        repl = repl.replace(f"__UNIT(${idx})", (_lit_value(arg, lits) or arg).upper())
                    repl = repl.replace(f"${idx}", arg)
                out = out[:begin] + repl + out[end:]
                # Templates never contain their own name: re-scan from the
                # replacement start so nested calls in args get rewritten.
                pos = begin
            else:
                repl = rw(args, lits)
                if repl is None:
                    pos = begin + len(name)
                    continue
                out = out[:begin] + repl + out[end:]
                # A callable's output may legitimately contain the source
                # name (date_format -> date_format with a JDK pattern); the
                # callable returns None for already-translated calls, so
                # re-scanning from `begin` terminates.
                pos = begin
    for name, spark_name in RENAME.items():
        out = re.sub(r"\b" + re.escape(name) + r"\s*\(", spark_name + "(", out, flags=re.IGNORECASE)
    for pat, repl in _TYPE_RENAMES:
        out = pat.sub(repl, out)
    return _unmask(out, lits)


def register_udfs(spark: SparkSession) -> None:
    """Register the few Presto functions with no JVM-side Spark equivalent.

    These are the documented slow path (HmacFunctions.java:25,
    CombinationsFunction.java): row-at-a-time crypto/combinatorics on
    driver-registered Python UDFs — fine off the hot path, never used by the
    engine's own operators.
    """
    import hashlib
    import hmac as _hmac
    from itertools import combinations as _combos

    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        StringType,
    )

    def _mk_hmac(algo: str):
        def f(data, key):
            if data is None or key is None:
                return None
            d = data if isinstance(data, (bytes, bytearray)) else str(data).encode()
            k = key if isinstance(key, (bytes, bytearray)) else str(key).encode()
            return _hmac.new(bytes(k), bytes(d), getattr(hashlib, algo)).digest()

        return f

    for algo in ("md5", "sha1", "sha256", "sha512"):
        spark.udf.register(f"hmac_{algo}", _mk_hmac(algo), BinaryType())

    from ..operators.spooky import spooky_hash_v2_32, spooky_hash_v2_64

    def _bin(f):
        def g(data):
            if data is None:
                return None
            d = data if isinstance(data, (bytes, bytearray)) else str(data).encode()
            return f(bytes(d))

        return g

    spark.udf.register("spooky_hash_v2_32", _bin(spooky_hash_v2_32), BinaryType())
    spark.udf.register("spooky_hash_v2_64", _bin(spooky_hash_v2_64), BinaryType())

    import unicodedata

    spark.udf.register(
        "unicode_normalize",
        lambda form, s: None if s is None else unicodedata.normalize(form, s),
        StringType(),
    )

    def combinations_fn(arr, n):
        if arr is None or n is None:
            return None
        return [list(c) for c in _combos(arr, int(n))]

    spark.udf.register("combinations", combinations_fn, ArrayType(ArrayType(StringType())))


def presto_sql(spark: SparkSession, sql: str) -> DataFrame:
    """The engine's Presto-compatible front door.

    Metadata statements (SHOW/DESCRIBE/PREPARE/EXECUTE — SqlBase.g4:33-118)
    route to the statement surface; queries are transpiled then run.
    """
    from ..sources import statements as _st

    if _st.is_statement(sql):
        return _st.execute_statement(spark, sql)
    return spark.sql(transpile(_st.rewrite_system_tables(spark, sql)))
