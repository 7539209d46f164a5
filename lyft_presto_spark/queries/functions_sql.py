"""Scalar & aggregate function conformance corpus (SURVEY.md §2.4–2.6).

Mirrors the reference's per-function test strategy (presto-main/src/test/
java/io/prestosql/operator/scalar/* via AbstractTestFunctions; SURVEY.md §5.1)
as family-grouped queries over real fixture rows, each matched against the
DuckDB oracle. Where the two dialects spell a function differently, both
sides alias to the same column name; where semantics can diverge at the last
float bit (parallel summation), results are rounded.

Family -> reference citation:
- string:    StringFunctions.java:62
- regex:     JoniRegexpFunctions.java:44
- math:      MathFunctions.java:65
- datetime:  DateTimeFunctions.java:63
- bitwise:   BitwiseFunctions.java:24
- binary:    VarbinaryFunctions.java:37
- array/HOF: scalar/Array*.java, ArrayTransformFunction.java:68
- conditional: TryFunction.java:37, AbstractGreatestLeast.java
- stats aggs: VarianceAggregation.java:32, DoubleCorrelationAggregation.java:32
- approx aggs: ApproximateCountDistinctAggregation.java:44
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import query, sql_over


def _string_sql(d: str) -> str:
    pos = "instr(p_name, 'a')" if d == "spark" else "strpos(p_name, 'a')"
    return f"""
SELECT p_partkey,
       lower(p_name) AS lower_name,
       upper(p_brand) AS upper_brand,
       length(p_name) AS name_len,
       substr(p_name, 1, 5) AS name_prefix,
       trim(p_type) AS type_trim,
       replace(p_name, ' ', '_') AS name_underscored,
       reverse(p_brand) AS brand_rev,
       lpad(p_brand, 12, '*') AS brand_lpad,
       rpad(p_brand, 12, '#') AS brand_rpad,
       split_part(p_type, ' ', 1) AS type_first_word,
       {pos} AS first_a_pos,
       concat(p_brand, '/', p_type) AS brand_type,
       levenshtein(p_brand, p_type) AS brand_type_lev
FROM part
WHERE p_partkey <= 200
ORDER BY p_partkey
"""


@query(
    "fn_string",
    oracle=_string_sql("duck"),
    doc="String family: lower/upper/length/substr/trim/replace/reverse/"
    "lpad/rpad/split_part/strpos/concat/levenshtein (StringFunctions.java:62).",
    tags=("functions",),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _string_sql("spark"), ("part",))


def _regex_sql(d: str) -> str:
    if d == "spark":
        like = "CASE WHEN p_type RLIKE '^[A-Z]+' THEN 1 ELSE 0 END"
        extract_all_n = "size(regexp_extract_all(p_name, '([aeiou]+)', 1))"
        repl = "regexp_replace(p_name, '[aeiou]', '.')"
    else:
        like = "CASE WHEN regexp_matches(p_type, '^[A-Z]+') THEN 1 ELSE 0 END"
        extract_all_n = "len(regexp_extract_all(p_name, '([aeiou]+)', 1))"
        repl = "regexp_replace(p_name, '[aeiou]', '.', 'g')"
    return f"""
SELECT p_partkey,
       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
       {extract_all_n} AS n_vowel_runs,
       {repl} AS vowels_masked,
       {like} AS starts_upper
FROM part
WHERE p_partkey <= 200
ORDER BY p_partkey
"""


@query(
    "fn_regex",
    oracle=_regex_sql("duck"),
    doc="Regex family: regexp_extract(_all)/regexp_replace/regexp_like "
    "(JoniRegexpFunctions.java:44).",
    tags=("functions",),
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _regex_sql("spark"), ("part",))


def _math_sql(d: str) -> str:
    # width_bucket is absent in DuckDB: spelled as clamped floor arithmetic
    # identically on both sides (MathFunctions.java width_bucket semantics).
    wb = (
        "CAST(CASE WHEN l_quantity >= 50 THEN 11 WHEN l_quantity < 0 THEN 0 "
        "ELSE floor(l_quantity / 5) + 1 END AS BIGINT)"
    )
    return f"""
SELECT l_orderkey, l_linenumber,
       abs(l_extendedprice - 30000) AS abs_delta,
       CAST(ceil(l_extendedprice / 100) AS BIGINT) AS price_ceil_100,
       CAST(floor(l_discount * 100) AS BIGINT) AS discount_pct,
       round(sqrt(l_extendedprice), 6) AS price_sqrt,
       round(exp(l_discount), 6) AS discount_exp,
       round(ln(l_extendedprice), 6) AS price_ln,
       round(log10(l_extendedprice), 6) AS price_log10,
       round(power(l_discount + 1, 3), 6) AS disc_pow3,
       mod(CAST(l_partkey AS BIGINT), 7) AS partkey_mod7,
       CAST(sign(l_discount - 0.05) AS INT) AS disc_sign,
       round(sin(l_tax), 6) AS tax_sin,
       round(atan2(l_tax, l_discount + 0.01), 6) AS tax_atan2,
       {wb} AS qty_bucket,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate
FROM lineitem
WHERE l_orderkey <= 100
ORDER BY l_orderkey, l_linenumber
"""


@query(
    "fn_math",
    oracle=_math_sql("duck"),
    doc="Math family: abs/ceil/floor/round/sqrt/exp/ln/log10/power/mod/sign/"
    "trig/width_bucket/greatest/least (MathFunctions.java:65).",
    tags=("functions",),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _math_sql("spark"), ("lineitem",))


def _datetime_sql(d: str) -> str:
    if d == "spark":
        dow = "(dayofweek(o_orderdate) + 5) % 7"  # normalize: Monday=0
        ddiff = "datediff(DATE '1998-12-01', o_orderdate)"
        dadd = "date_add(o_orderdate, 90)"
        fmt = "date_format(o_orderdate, 'yyyy-MM')"
    else:
        dow = "(CAST(dayofweek(o_orderdate) AS INT) + 6) % 7"  # duck: Sun=0
        ddiff = "date_diff('day', o_orderdate, DATE '1998-12-01')"
        dadd = "o_orderdate + INTERVAL 90 DAY"
        fmt = "strftime(o_orderdate, '%Y-%m')"
    return f"""
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
       CAST(extract(year FROM o_orderdate) AS BIGINT) AS order_year,
       CAST(extract(month FROM o_orderdate) AS BIGINT) AS order_month_num,
       CAST(extract(day FROM o_orderdate) AS BIGINT) AS order_day,
       CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS order_quarter,
       {dow} AS order_dow_mon0,
       last_day(o_orderdate) AS month_end,
       CAST({dadd} AS DATE) AS plus_90d,
       CAST({ddiff} AS BIGINT) AS days_to_cutoff,
       {fmt} AS month_str
FROM orders
WHERE o_orderkey <= 200
ORDER BY o_orderkey
"""


@query(
    "fn_datetime",
    oracle=_datetime_sql("duck"),
    doc="Date/time family: date_trunc/extract/day-of-week/last_day/date_add/"
    "date_diff/date_format (DateTimeFunctions.java:63; Presto date_add(unit,n,ts) "
    "spelled as Spark date arithmetic).",
    tags=("functions",),
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _datetime_sql("spark"), ("orders",))


def _bitwise_sql(d: str) -> str:
    if d == "spark":
        ops = """
       n_nationkey & 12 AS bits_and,
       n_nationkey | 3 AS bits_or,
       n_nationkey ^ 9 AS bits_xor,
       shiftleft(n_nationkey, 2) AS bits_shl,
       shiftright(n_nationkey, 1) AS bits_shr,
       bit_count(n_nationkey) AS bits_popcount"""
    else:
        ops = """
       n_nationkey & 12 AS bits_and,
       n_nationkey | 3 AS bits_or,
       xor(n_nationkey, 9) AS bits_xor,
       n_nationkey << 2 AS bits_shl,
       n_nationkey >> 1 AS bits_shr,
       CAST(bit_count(n_nationkey) AS INT) AS bits_popcount"""
    return f"""
SELECT n_nationkey,{ops}
FROM nation
ORDER BY n_nationkey
"""


@query(
    "fn_bitwise",
    oracle=_bitwise_sql("duck"),
    doc="Bitwise family: and/or/xor/shifts/bit_count (BitwiseFunctions.java:24).",
    tags=("functions",),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _bitwise_sql("spark"), ("nation",))


def _binary_sql(d: str) -> str:
    if d == "spark":
        sha = "sha2(n_name, 256)"
        b64 = "base64(CAST(n_name AS BINARY))"
        hx = "hex(CAST(n_name AS BINARY))"
    else:
        sha = "sha256(n_name)"
        b64 = "base64(CAST(n_name AS BLOB))"
        hx = "hex(n_name)"
    return f"""
SELECT n_nationkey,
       md5(n_name) AS name_md5,
       {sha} AS name_sha256,
       lower({b64}) AS name_b64_lower,
       lower({hx}) AS name_hex_lower
FROM nation
ORDER BY n_nationkey
"""


@query(
    "fn_binary_hash",
    oracle=_binary_sql("duck"),
    doc="Binary/digest family: md5/sha256/base64/hex (VarbinaryFunctions.java:37).",
    tags=("functions",),
)
def fn_binary_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _binary_sql("spark"), ("nation",))


def _array_sql(d: str) -> str:
    if d == "spark":
        arr = "array(CAST(n_nationkey AS BIGINT), CAST(n_regionkey * 7 AS BIGINT), CAST(n_nationkey % 5 AS BIGINT))"
        return f"""
WITH base AS (SELECT n_nationkey, {arr} AS arr FROM nation)
SELECT n_nationkey,
       size(arr) AS arr_size,
       array_join(transform(sort_array(arr), x -> CAST(x AS STRING)), '-') AS arr_sorted,
       array_join(transform(sort_array(array_distinct(arr)), x -> CAST(x AS STRING)), '-') AS arr_distinct_sorted,
       element_at(arr, 1) AS arr_first,
       array_contains(arr, 3) AS has_three,
       array_join(transform(slice(sort_array(arr), 1, 2), x -> CAST(x AS STRING)), '-') AS arr_low2,
       array_join(transform(sort_array(array_intersect(arr, array(0L, 1L, 2L, 3L, 4L))), x -> CAST(x AS STRING)), '-') AS small_vals,
       array_join(transform(sort_array(arr), x -> CAST(x AS STRING)), '-') AS arr_str,
       aggregate(arr, CAST(0 AS BIGINT), (acc, x) -> acc + x) AS arr_sum,
       size(filter(arr, x -> x % 2 = 0)) AS n_even,
       array_max(arr) AS arr_max,
       array_min(arr) AS arr_min,
       array_join(transform(flatten(array(slice(arr, 1, 1), slice(arr, 2, 2))), x -> CAST(x AS STRING)), '-') AS arr_reflat,
       array_join(transform(sequence(1, 3), x -> CAST(x AS STRING)), '-') AS seq3
FROM base
ORDER BY n_nationkey
"""
    arr = "[CAST(n_nationkey AS BIGINT), CAST(n_regionkey * 7 AS BIGINT), CAST(n_nationkey % 5 AS BIGINT)]"
    return f"""
WITH base AS (SELECT n_nationkey, {arr} AS arr FROM nation)
SELECT n_nationkey,
       len(arr) AS arr_size,
       array_to_string(list_transform(list_sort(arr), x -> CAST(x AS VARCHAR)), '-') AS arr_sorted,
       array_to_string(list_transform(list_sort(list_distinct(arr)), x -> CAST(x AS VARCHAR)), '-') AS arr_distinct_sorted,
       arr[1] AS arr_first,
       list_contains(arr, 3) AS has_three,
       array_to_string(list_transform(list_sort(arr)[1:2], x -> CAST(x AS VARCHAR)), '-') AS arr_low2,
       array_to_string(list_transform(list_sort(list_intersect(arr, [0, 1, 2, 3, 4])), x -> CAST(x AS VARCHAR)), '-') AS small_vals,
       array_to_string(list_transform(list_sort(arr), x -> CAST(x AS VARCHAR)), '-') AS arr_str,
       list_reduce(list_prepend(CAST(0 AS BIGINT), arr), (acc, x) -> acc + x) AS arr_sum,
       len(list_filter(arr, x -> x % 2 = 0)) AS n_even,
       list_max(arr) AS arr_max,
       list_min(arr) AS arr_min,
       array_to_string(list_transform(flatten([arr[1:1], arr[2:3]]), x -> CAST(x AS VARCHAR)), '-') AS arr_reflat,
       array_to_string(list_transform(generate_series(1, 3), x -> CAST(x AS VARCHAR)), '-') AS seq3
FROM base
ORDER BY n_nationkey
"""


@query(
    "fn_array_hof",
    oracle=_array_sql("duck"),
    doc="Array + lambda-HOF family: size/sort/distinct/element_at/contains/"
    "slice/intersect/join/transform/filter/aggregate/min/max/flatten/sequence "
    "(scalar/Array*.java, ArrayTransformFunction.java:68).",
    tags=("functions",),
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _array_sql("spark"), ("nation",))


def _conditional_sql(d: str) -> str:
    # try()/TRY: Presto returns NULL on error (TryFunction.java:37); Spark's
    # try_divide & friends match; DuckDB needs an explicit guard.
    if d == "spark":
        tdiv = "try_divide(CAST(o_totalprice AS DOUBLE), CAST(o_orderkey % 3 AS DOUBLE))"
    else:
        tdiv = ("CASE WHEN o_orderkey % 3 = 0 THEN NULL "
                "ELSE CAST(o_totalprice AS DOUBLE) / (o_orderkey % 3) END")
    return f"""
SELECT o_orderkey,
       coalesce(nullif(o_orderstatus, 'O'), '<open>') AS status_or_tag,
       CASE o_orderstatus WHEN 'F' THEN 'final' WHEN 'O' THEN 'open' ELSE 'other' END AS status_word,
       if(o_totalprice > 100000, 'big', 'small') AS size_class,
       round({tdiv}, 4) AS try_div_mod,
       nullif(o_orderpriority, '1-URGENT') AS prio_non_urgent,
       coalesce(CAST(NULL AS STRING), o_orderpriority) AS prio_coalesced
FROM orders
WHERE o_orderkey <= 200
ORDER BY o_orderkey
"""


def _conditional_duck() -> str:
    # DuckDB also has if(); only the NULL-literal cast type is spelled differently.
    return _conditional_sql("duck").replace("AS STRING", "AS VARCHAR")


@query(
    "fn_conditional",
    oracle=_conditional_duck(),
    doc="Conditional family: coalesce/nullif/case/if/try-division "
    "(TryFunction.java:37, TryCastFunction.java).",
    tags=("functions",),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _conditional_sql("spark"), ("orders",))


def _stats_sql(d: str) -> str:
    # Definitions identical across engines; parallel summation order differs,
    # so every double aggregate is rounded.
    return """
SELECT l_returnflag,
       count(*) AS n,
       round(stddev_samp(l_extendedprice), 4) AS sd_samp,
       round(stddev_pop(l_extendedprice), 4) AS sd_pop,
       round(var_samp(l_extendedprice), 2) AS var_s,
       round(var_pop(l_extendedprice), 2) AS var_p,
       round(covar_samp(l_extendedprice, l_discount), 4) AS covar_s,
       round(covar_pop(l_extendedprice, l_discount), 4) AS covar_p,
       round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query(
    "fn_stats_agg",
    oracle=_stats_sql("duck"),
    doc="Statistical aggregates: stddev/variance (samp+pop)/covar/corr/"
    "regr_slope/regr_intercept (VarianceAggregation.java:32, "
    "DoubleCorrelationAggregation.java:32, DoubleRegressionAggregation.java).",
    tags=("functions",),
)
def fn_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _stats_sql("spark"), ("lineitem",))


def _minmax_by_sql(d: str) -> str:
    if d == "spark":
        mb = "max_by(o_orderkey, o_totalprice)"
        nb = "min_by(o_orderkey, o_totalprice)"
    else:
        mb = "arg_max(o_orderkey, o_totalprice)"
        nb = "arg_min(o_orderkey, o_totalprice)"
    return f"""
SELECT o_orderpriority,
       count(*) AS n_orders,
       {mb} AS priciest_order,
       {nb} AS cheapest_order,
       max(o_totalprice) AS max_price,
       min(o_totalprice) AS min_price,
       count_if(o_orderstatus = 'F') AS n_final,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_totalprice > 500000) AS any_huge,
       any_value(o_orderstatus IS NOT NULL) AS has_status
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def _minmax_by_duck() -> str:
    return _minmax_by_sql("duck").replace(
        "count_if(o_orderstatus = 'F')", "count(*) FILTER (WHERE o_orderstatus = 'F')"
    ).replace(
        "any_value(o_orderstatus IS NOT NULL)", "bool_and(o_orderstatus IS NOT NULL)"
    )


@query(
    "fn_minmax_by",
    oracle=_minmax_by_duck(),
    doc="min_by/max_by/count_if/bool_and/bool_or/any_value aggregates "
    "(minmaxby/AbstractMinMaxBy.java:80, CountIfAggregation.java:29, "
    "BooleanAndAggregation.java:32, ArbitraryAggregationFunction.java:47). "
    "Tie-safety: o_totalprice ties broken identically because values are "
    "unique per priority group at fixture scales.",
    tags=("functions",),
)
def fn_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _minmax_by_sql("spark"), ("orders",))


def _approx_sql(d: str) -> str:
    # Approx sketches differ across engines by construction, so the sketch
    # *estimates* can't be value-compared; instead both sides compute the
    # exact ground truth (n_exact, exact median) — value-checked — and the
    # Spark side additionally proves its sketches land within the published
    # error bounds (the reference's own bounds-test pattern,
    # ApproximateCountDistinctAggregation tests). Only the boolean bound
    # flags reduce to TRUE on the oracle side.
    if d == "spark":
        # The distinct count lives in its OWN aggregation, cross-joined
        # (1 row x 1 row) with the sketch pass: mixing count(DISTINCT) with
        # object aggregates makes Catalyst pre-group the whole table by
        # o_custkey carrying a percentile buffer + HLL + QuantileSummaries
        # state PER KEY (~100k object-hash states, 57-column shuffle —
        # 5 s at sf0.1, ratio 5.09x in the r7 RATIOS sweep). Two scans with
        # map-side partials are strictly cheaper at any scale.
        return """
WITH d AS (SELECT count(DISTINCT o_custkey) AS n_exact FROM orders),
s AS (
  SELECT
    percentile(o_totalprice, 0.5) AS med,
    approx_count_distinct(o_custkey, 0.05) AS acd,
    percentile_approx(o_totalprice, 0.5, 10000) AS pa,
    min(o_totalprice) AS lo,
    max(o_totalprice) AS hi
  FROM orders
)
SELECT
  d.n_exact,
  round(s.med, 4) AS exact_median,
  CAST(abs(s.acd - d.n_exact) AS DOUBLE) / d.n_exact < 0.15 AS acd_within_bounds,
  abs(s.pa - s.med) / s.med < 0.05 AS pa_within_bounds,
  s.pa BETWEEN s.lo AND s.hi AS pa_within_range
FROM d CROSS JOIN s
"""
    return """
SELECT
  count(DISTINCT o_custkey) AS n_exact,
  round(quantile_cont(o_totalprice, 0.5), 4) AS exact_median,
  TRUE AS acd_within_bounds,
  TRUE AS pa_within_bounds,
  TRUE AS pa_within_range
FROM orders
"""


@query(
    "fn_approx_agg",
    oracle=_approx_sql("duck"),
    doc="Approximate aggregates with error-bound differential check: "
    "approx_count_distinct (approx_distinct, "
    "ApproximateCountDistinctAggregation.java:44) and percentile_approx "
    "(ApproximateLongPercentileAggregations.java:33).",
    tags=("functions",),
)
def fn_approx_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _approx_sql("spark"), ("orders",))


def _url_sql(d: str) -> str:
    # Synthetic URLs from part columns. Spark side uses the native parse_url
    # (UrlFunctions.java analog); the oracle recomputes with plain regexes —
    # an independent implementation checking the same values.
    # p_brand contains '#' (Brand#13) — sanitize the host token.
    g = "" if d == "spark" else ", 'g'"
    url = (
        f"concat('https://', regexp_replace(lower(p_brand), '[^a-z0-9]', ''{g}), "
        "'.example.com:8080/parts/', "
        "CAST(p_partkey AS STRING), '?size=', CAST(p_size AS STRING), '#frag')"
    )
    if d == "spark":
        return f"""
WITH u AS (SELECT p_partkey, {url} AS url FROM part WHERE p_partkey <= 200)
SELECT p_partkey,
       parse_url(url, 'PROTOCOL') AS proto,
       parse_url(url, 'HOST') AS host,
       parse_url(url, 'PATH') AS path,
       parse_url(url, 'QUERY') AS query,
       parse_url(url, 'QUERY', 'size') AS size_param,
       parse_url(url, 'REF') AS fragment
FROM u
ORDER BY p_partkey
"""
    url_duck = url.replace("AS STRING", "AS VARCHAR")
    return f"""
WITH u AS (SELECT p_partkey, {url_duck} AS url FROM part WHERE p_partkey <= 200)
SELECT p_partkey,
       regexp_extract(url, '^([a-z]+)://', 1) AS proto,
       regexp_extract(url, '^[a-z]+://([^:/]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^:/]+:[0-9]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '[?]([^#]*)', 1) AS query,
       regexp_extract(url, '[?&]size=([^&#]*)', 1) AS size_param,
       regexp_extract(url, '#(.*)$', 1) AS fragment
FROM u
ORDER BY p_partkey
"""


@query(
    "fn_url",
    oracle=_url_sql("duck"),
    doc="URL family: protocol/host/path/query/param/fragment extraction "
    "(UrlFunctions.java:43 url_extract_*; Spark parse_url vs an independent "
    "regex oracle).",
    tags=("functions",),
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _url_sql("spark"), ("part",))


def _map_sql(d: str) -> str:
    if d == "spark":
        return """
WITH m AS (
    SELECT p_partkey,
           map('brand', p_brand, 'type', split_part(p_type, ' ', 1)) AS meta,
           str_to_map(concat('brand=', p_brand, '&size=', CAST(p_size AS STRING)), '&', '=') AS kv
    FROM part WHERE p_partkey <= 200
)
SELECT p_partkey,
       element_at(meta, 'brand') AS meta_brand,
       element_at(meta, 'type') AS meta_type,
       size(meta) AS meta_size,
       array_join(sort_array(map_keys(meta)), ',') AS meta_keys,
       element_at(kv, 'size') AS kv_size,
       element_at(kv, 'brand') AS kv_brand
FROM m
ORDER BY p_partkey
"""
    return """
WITH m AS (
    SELECT p_partkey,
           MAP {'brand': p_brand, 'type': split_part(p_type, ' ', 1)} AS meta,
           p_brand AS b, CAST(p_size AS VARCHAR) AS s
    FROM part WHERE p_partkey <= 200
)
SELECT p_partkey,
       meta['brand'][1] AS meta_brand,
       meta['type'][1] AS meta_type,
       CAST(cardinality(meta) AS INT) AS meta_size,
       array_to_string(list_sort(map_keys(meta)), ',') AS meta_keys,
       s AS kv_size,
       b AS kv_brand
FROM m
ORDER BY p_partkey
"""


@query(
    "fn_map",
    oracle=_map_sql("duck"),
    doc="Map family: map construction/element_at/map_keys/cardinality and "
    "str_to_map k/v parsing (MapConstructor.java, MapElementAtFunction.java, "
    "SplitToMapFunction.java).",
    tags=("functions",),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _map_sql("spark"), ("part",))


def _histogram_sql(d: str) -> str:
    # numeric_histogram analog (DoubleHistogramAggregation.java): fixed-width
    # binning + per-bucket stats. width_bucket spelled portably.
    wb = (
        "CAST(CASE WHEN l_extendedprice >= 100000 THEN 11 "
        "WHEN l_extendedprice < 0 THEN 0 "
        "ELSE floor(l_extendedprice / 10000) + 1 END AS BIGINT)"
    )
    return f"""
SELECT {wb} AS bucket,
       count(*) AS n,
       round(min(l_extendedprice), 2) AS lo,
       round(max(l_extendedprice), 2) AS hi,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum
FROM lineitem
GROUP BY 1
ORDER BY 1
"""


@query(
    "fn_histogram",
    oracle=_histogram_sql("duck"),
    doc="numeric_histogram analog: fixed-width bucketed counts + per-bucket "
    "bounds (DoubleHistogramAggregation.java, NumericHistogram.java; "
    "width_bucket MathFunctions.java).",
    tags=("functions",),
)
def fn_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _histogram_sql("spark"), ("lineitem",))


def _checksum_sql(d: str) -> str:
    # Order-independent checksum over a 60-bit portable hash (the reference's
    # checksum agg, ChecksumAggregationFunction.java:46, exists exactly for
    # cross-engine result diffing — this is its Spark spelling).
    if d == "spark":
        h = "CAST(conv(substr(md5(concat_ws('|', CAST(o_orderkey AS STRING), o_orderstatus)), 1, 15), 16, 10) AS BIGINT)"
    else:
        h = "CAST('0x' || substr(md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus)), 1, 15) AS BIGINT)"
    return f"""
SELECT o_orderpriority,
       count(*) AS n,
       bit_xor({h}) AS row_checksum
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query(
    "fn_checksum",
    oracle=_checksum_sql("duck"),
    doc="Order-independent row checksum via xor of portable row hashes "
    "(ChecksumAggregationFunction.java:46 — the reference's verifier "
    "primitive).",
    tags=("functions",),
)
def fn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _checksum_sql("spark"), ("orders",))


def _reduce_sql(d: str) -> str:
    # reduce_agg analog (ReduceAggregationFunction.java): fold a per-group
    # collection with a lambda. Deterministic via sorted collection.
    if d == "spark":
        return """
WITH g AS (
    SELECT n_regionkey, sort_array(collect_list(n_nationkey)) AS ks FROM nation GROUP BY n_regionkey
)
SELECT n_regionkey,
       aggregate(ks, CAST(0 AS BIGINT), (acc, x) -> acc + x * x) AS sum_sq,
       aggregate(ks, CAST(1 AS BIGINT), (acc, x) -> acc * (x + 1) % 1000003) AS fold_prod
FROM g
ORDER BY n_regionkey
"""
    return """
WITH g AS (
    SELECT n_regionkey, list_sort(array_agg(n_nationkey)) AS ks FROM nation GROUP BY n_regionkey
)
SELECT n_regionkey,
       list_reduce(list_prepend(CAST(0 AS BIGINT), ks), (acc, x) -> acc + x * x) AS sum_sq,
       list_reduce(list_prepend(CAST(1 AS BIGINT), ks), (acc, x) -> acc * (x + 1) % 1000003) AS fold_prod
FROM g
ORDER BY n_regionkey
"""


@query(
    "fn_reduce_agg",
    oracle=_reduce_sql("duck"),
    doc="reduce_agg analog: per-group lambda fold over a sorted collected "
    "array (ReduceAggregationFunction.java; Spark aggregate HOF).",
    tags=("functions",),
)
def fn_reduce_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _reduce_sql("spark"), ("nation",))


def _tz_interval_sql(d: str) -> str:
    # AT TIME ZONE analog (TimestampWithTimeZoneType, DateTimeEncoding.java)
    # + interval arithmetic incl. month-end clamping. Order dates are
    # midnight UTC, so no DST-ambiguous wall times arise.
    if d == "spark":
        ny = "from_utc_timestamp(o_orderdate, 'America/New_York')"
        rt = f"to_utc_timestamp({ny}, 'America/New_York')"
    else:
        ny = "CAST(o_orderdate AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York' AS TIMESTAMP)"
        rt = f"CAST({ny} AT TIME ZONE 'America/New_York' AT TIME ZONE 'UTC' AS TIMESTAMP)"
    return f"""
SELECT o_orderkey,
       {ny} AS ny_wall_time,
       {rt} AS utc_round_trip,
       o_orderdate + INTERVAL 1 MONTH AS plus_month,
       o_orderdate + INTERVAL 90 SECOND AS plus_90s,
       o_orderdate - INTERVAL 1 DAY AS minus_day,
       CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS plus_month_date
FROM orders
WHERE o_orderkey <= 200
ORDER BY o_orderkey
"""


@query(
    "fn_timezone_interval",
    oracle=_tz_interval_sql("duck"),
    doc="AT TIME ZONE + interval arithmetic: UTC<->zone wall-time conversion "
    "round trip, month-end-clamping month addition, second/day intervals "
    "(DateTimeFunctions.java:63, DateTimeEncoding.java, "
    "IntervalDayTimeType/IntervalYearMonthType).",
    tags=("functions",),
)
def fn_timezone_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _tz_interval_sql("spark"), ("orders",))


def _json_sql(d: str) -> str:
    # Nested JSON built per-row, then path extraction / array ops / validity —
    # json_extract, json_extract_scalar, json_array_length, is_json_scalar
    # (JsonFunctions.java:64, JsonExtract.java, JsonPath.java).
    doc = (
        "concat('{\"order\": {\"key\": ', CAST(o_orderkey AS STRING), "
        "', \"tags\": [\"', o_orderstatus, '\", \"', o_orderpriority, '\"]}}')"
    )
    if d == "spark":
        return f"""
WITH j AS (SELECT o_orderkey, {doc} AS doc FROM orders WHERE o_orderkey <= 200)
SELECT o_orderkey,
       CAST(get_json_object(doc, '$.order.key') AS BIGINT) AS extracted_key,
       get_json_object(doc, '$.order.tags[0]') AS tag0,
       get_json_object(doc, '$.order.tags[1]') AS tag1,
       json_array_length(get_json_object(doc, '$.order.tags')) AS n_tags,
       get_json_object(doc, '$.order.missing') IS NULL AS missing_is_null
FROM j
ORDER BY o_orderkey
"""
    doc_duck = doc.replace("AS STRING", "AS VARCHAR")
    return f"""
WITH j AS (SELECT o_orderkey, {doc_duck} AS doc FROM orders WHERE o_orderkey <= 200)
SELECT o_orderkey,
       CAST(json_extract_string(doc, '$.order.key') AS BIGINT) AS extracted_key,
       json_extract_string(doc, '$.order.tags[0]') AS tag0,
       json_extract_string(doc, '$.order.tags[1]') AS tag1,
       CAST(json_array_length(json_extract(doc, '$.order.tags')) AS INT) AS n_tags,
       json_extract_string(doc, '$.order.missing') IS NULL AS missing_is_null
FROM j
ORDER BY o_orderkey
"""


@query(
    "fn_json",
    oracle=_json_sql("duck"),
    doc="JSON family: nested path extraction, array element access, "
    "json_array_length, missing-path null (JsonFunctions.java:64, "
    "JsonExtract.java; Spark get_json_object/json_array_length).",
    tags=("functions",),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _json_sql("spark"), ("orders",))


def _json_extras_sql(d: str) -> str:
    # json_array_contains / json_array_get (incl. the negative "from the
    # end" index) / json_size for both the array and object cases
    # (JsonFunctions.java jsonArrayContains/jsonArrayGet/jsonSize).
    doc = (
        "concat('{\"order\": {\"key\": ', CAST(o_orderkey AS STRING), "
        "', \"tags\": [\"', o_orderstatus, '\", \"', o_orderpriority, '\"]}}')"
    )
    if d == "spark":
        return f"""
WITH j AS (SELECT o_orderkey, o_orderstatus, {doc} AS doc FROM orders WHERE o_orderkey <= 200),
a AS (SELECT o_orderkey, o_orderstatus, doc, get_json_object(doc, '$.order.tags') AS arr FROM j)
SELECT o_orderkey,
       array_contains(from_json(arr, 'array<string>'), 'F') AS contains_f,
       array_contains(from_json(arr, 'array<string>'), o_orderstatus) AS contains_status,
       element_at(from_json(arr, 'array<string>'), 1) AS get_0,
       element_at(from_json(arr, 'array<string>'), -1) AS get_last,
       CAST(json_array_length(arr) AS INT) AS size_arr,
       CAST(size(json_object_keys(get_json_object(doc, '$.order'))) AS INT) AS size_obj
FROM a
ORDER BY o_orderkey
"""
    doc_duck = doc.replace("AS STRING", "AS VARCHAR")
    return f"""
WITH j AS (SELECT o_orderkey, o_orderstatus, {doc_duck} AS doc FROM orders WHERE o_orderkey <= 200),
a AS (SELECT o_orderkey, o_orderstatus, doc, json_extract(doc, '$.order.tags') AS arr FROM j)
SELECT o_orderkey,
       list_contains(CAST(arr AS VARCHAR[]), 'F') AS contains_f,
       list_contains(CAST(arr AS VARCHAR[]), o_orderstatus) AS contains_status,
       json_extract_string(arr, '$[0]') AS get_0,
       json_extract_string(arr, '$[' || CAST(json_array_length(arr) - 1 AS VARCHAR) || ']') AS get_last,
       CAST(json_array_length(arr) AS INT) AS size_arr,
       CAST(len(json_keys(doc, '$.order')) AS INT) AS size_obj
FROM a
ORDER BY o_orderkey
"""


@query(
    "fn_json_extras",
    oracle=_json_extras_sql("duck"),
    doc="json_array_contains, json_array_get (0-based incl. negative "
    "from-the-end index), json_size for array and object payloads "
    "(JsonFunctions.java jsonArrayContains/jsonArrayGet/jsonSize): arrays "
    "decode once via from_json, object member counts via json_object_keys — "
    "all codegen, no UDF.",
    tags=("functions",),
)
def fn_json_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _json_extras_sql("spark"), ("orders",))


# --- MySQL / Joda datetime pattern translation (DateTimeFunctions.java:63) ---

_DT_PATTERNS_PRESTO = """
SELECT o_orderkey,
       date_format(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%dT%H:%i:%S') AS iso_str,
       date_format(CAST(o_orderdate AS TIMESTAMP), '%W %M %e, %Y') AS pretty_str,
       date_format(CAST(o_orderdate AS TIMESTAMP), '%d/%m/%y %H:%i') AS mysql_str,
       CAST(date_parse(date_format(CAST(o_orderdate AS TIMESTAMP), '%d/%m/%Y %H:%i'),
                       '%d/%m/%Y %H:%i') AS TIMESTAMP) AS roundtrip_ts,
       format_datetime(CAST(o_orderdate AS TIMESTAMP), 'YYYY-MM-dd HH:mm') AS joda_str,
       CAST(parse_datetime(format_datetime(CAST(o_orderdate AS TIMESTAMP), 'YYYY-MM-dd'),
                           'yyyy-MM-dd') AS TIMESTAMP) AS joda_roundtrip
FROM orders
WHERE o_orderkey <= 200
ORDER BY o_orderkey
"""

_DT_PATTERNS_DUCK = """
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S') AS iso_str,
       strftime(CAST(o_orderdate AS TIMESTAMP), '%A %B %-d, %Y') AS pretty_str,
       strftime(CAST(o_orderdate AS TIMESTAMP), '%d/%m/%y %H:%M') AS mysql_str,
       strptime(strftime(CAST(o_orderdate AS TIMESTAMP), '%d/%m/%Y %H:%M'),
                '%d/%m/%Y %H:%M') AS roundtrip_ts,
       strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d %H:%M') AS joda_str,
       strptime(strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d'), '%Y-%m-%d') AS joda_roundtrip
FROM orders
WHERE o_orderkey <= 200
ORDER BY o_orderkey
"""


@query(
    "fn_datetime_patterns",
    oracle=_DT_PATTERNS_DUCK,
    doc="MySQL-pattern date_format/date_parse and Joda format_datetime/"
    "parse_datetime, run through the dialect transpiler's pattern translator "
    "(DateTimeFunctions.java:63 — the MySQL pattern table; "
    "JodaDateTimeFormat). Oracle recomputes with DuckDB strftime/strptime.",
    tags=("functions", "dialect"),
)
def fn_datetime_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.presto import transpile

    return sql_over(spark, sf_dir, transpile(_DT_PATTERNS_PRESTO), ("orders",))


# --- map_agg / map_union / multimap_agg (MapAggregationFunction.java:47) ---


def _map_agg_sql(d: str) -> str:
    # Maps rendered as canonical 'k:v' strings (sorted by key) so the
    # cross-engine comparison — and the driver's value hash — never sees an
    # engine-specific map/dict repr.
    if d == "spark":
        return """
WITH maps AS (
    SELECT n_regionkey,
           map_from_entries(array_sort(collect_list(struct(n_name AS k, n_nationkey AS v)))) AS m
    FROM nation
    GROUP BY n_regionkey
),
mm AS (
    SELECT n_regionkey, substr(n_name, 1, 1) AS mk,
           array_join(array_sort(collect_list(n_name)), '|') AS mv
    FROM nation
    GROUP BY n_regionkey, substr(n_name, 1, 1)
),
mmagg AS (
    SELECT n_regionkey,
           array_join(array_sort(collect_list(concat(mk, '->', mv))), ',') AS multimap_str
    FROM mm
    GROUP BY n_regionkey
)
SELECT maps.n_regionkey,
       array_join(transform(array_sort(map_entries(maps.m)),
                            e -> concat(e.key, ':', CAST(e.value AS STRING))), ',') AS map_str,
       size(maps.m) AS map_size,
       mmagg.multimap_str
FROM maps JOIN mmagg ON maps.n_regionkey = mmagg.n_regionkey
ORDER BY maps.n_regionkey
"""
    return """
WITH mm AS (
    SELECT n_regionkey, substr(n_name, 1, 1) AS mk,
           string_agg(n_name, '|' ORDER BY n_name) AS mv
    FROM nation
    GROUP BY n_regionkey, substr(n_name, 1, 1)
),
mmagg AS (
    SELECT n_regionkey,
           string_agg(mk || '->' || mv, ',' ORDER BY mk) AS multimap_str
    FROM mm
    GROUP BY n_regionkey
),
maps AS (
    SELECT n_regionkey,
           string_agg(n_name || ':' || n_nationkey, ',' ORDER BY n_name) AS map_str,
           CAST(count(*) AS INT) AS map_size
    FROM nation
    GROUP BY n_regionkey
)
SELECT maps.n_regionkey, maps.map_str, maps.map_size, mmagg.multimap_str
FROM maps JOIN mmagg ON maps.n_regionkey = mmagg.n_regionkey
ORDER BY maps.n_regionkey
"""


@query(
    "fn_map_agg",
    oracle=_map_agg_sql("duck"),
    doc="map_agg / multimap_agg built by aggregation "
    "(MapAggregationFunction.java:47, MultimapAggregationFunction.java): "
    "map_from_entries(collect_list(struct(k,v))) with canonical string "
    "rendering; map_union is the same shape over exploded entries.",
    tags=("functions",),
)
def fn_map_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _map_agg_sql("spark"), ("nation",))


# --- mergeable HLL sketches (ApproximateSetAggregation.java,
#     HyperLogLogFunctions.java:24) ---


def _hll_sql(d: str) -> str:
    if d == "spark":
        # Two-level rollup: per-nation sketches -> region-level union.
        # This is the mergeability property approx_count_distinct lacks —
        # the incremental/rollup pipeline pattern approx_set/merge exist for.
        return """
WITH nat_sk AS (
    SELECT c_nationkey,
           hll_sketch_agg(c_custkey) AS sk,
           count(DISTINCT c_custkey) AS nd
    FROM customer
    GROUP BY c_nationkey
),
rolled AS (
    SELECT n_regionkey,
           hll_sketch_estimate(hll_union_agg(sk)) AS est,
           CAST(sum(nd) AS BIGINT) AS n_exact
    FROM nat_sk JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_regionkey
)
SELECT n_regionkey,
       n_exact,
       CAST(abs(est - n_exact) AS DOUBLE) / n_exact < 0.05 AS within_bounds
FROM rolled
ORDER BY n_regionkey
"""
    return """
SELECT n_regionkey,
       count(DISTINCT c_custkey) AS n_exact,
       TRUE AS within_bounds
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_regionkey
ORDER BY n_regionkey
"""


@query(
    "fn_hll_merge",
    oracle=_hll_sql("duck"),
    doc="Mergeable HLL surface: approx_set/merge/cardinality over Spark's "
    "DataSketches HLL (hll_sketch_agg/hll_union_agg/hll_sketch_estimate) — "
    "two-level rollup re-aggregating sketches, exact count value-checked, "
    "estimate proven within bounds (ApproximateSetAggregation.java, "
    "HyperLogLogFunctions.java:24).",
    tags=("functions",),
)
def fn_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _hll_sql("spark"), ("customer", "nation"))


# --- min(x,n)/max(x,n) top-n aggregates (Min/MaxNAggregationFunction.java) ---

_MINMAX_N_PRESTO = """
SELECT o_orderpriority,
       max(o_orderkey, 3) AS top3_keys,
       min(o_orderkey, 2) AS low2_keys
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def _minmax_n_spark() -> str:
    from ..functions.presto import transpile

    sql = transpile(_MINMAX_N_PRESTO)
    # Render arrays as strings for driver-hash safety (BIGINT casts are
    # engine-identical).
    return sql.replace(
        "slice(reverse(array_sort(collect_list(o_orderkey))), 1, 3) AS top3_keys",
        "array_join(transform(slice(reverse(array_sort(collect_list(o_orderkey))), 1, 3), x -> CAST(x AS STRING)), ',') AS top3_keys",
    ).replace(
        "slice(array_sort(collect_list(o_orderkey)), 1, 2) AS low2_keys",
        "array_join(transform(slice(array_sort(collect_list(o_orderkey)), 1, 2), x -> CAST(x AS STRING)), ',') AS low2_keys",
    )


_MINMAX_N_DUCK = """
SELECT o_orderpriority,
       array_to_string((list_sort(array_agg(o_orderkey), 'DESC'))[1:3], ',') AS top3_keys,
       array_to_string((list_sort(array_agg(o_orderkey)))[1:2], ',') AS low2_keys
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query(
    "fn_minmax_n",
    oracle=_MINMAX_N_DUCK,
    doc="min(x,n)/max(x,n) top-n aggregates via the transpiler's "
    "sort-and-slice rewrite (MinNAggregationFunction.java, "
    "MaxNAggregationFunction.java).",
    tags=("functions", "dialect"),
)
def fn_minmax_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _minmax_n_spark(), ("orders",))


# --- url_encode/url_decode (UrlFunctions.java:43) ---

_URL_CODEC_PRESTO = """
SELECT p_partkey,
       url_encode(p_name) AS enc,
       url_decode(url_encode(p_name)) AS roundtrip,
       url_encode('a b&c=d/e?f#g') AS enc_specials
FROM part
WHERE p_partkey <= 200
ORDER BY p_partkey
"""

# p_name is lowercase words + spaces, so its URL encoding is exactly
# space->'+'; the specials column pins the full escape table.
_URL_CODEC_DUCK = """
SELECT p_partkey,
       replace(p_name, ' ', '+') AS enc,
       p_name AS roundtrip,
       'a+b%26c%3Dd%2Fe%3Ff%23g' AS enc_specials
FROM part
WHERE p_partkey <= 200
ORDER BY p_partkey
"""


@query(
    "fn_url_codec",
    oracle=_URL_CODEC_DUCK,
    doc="url_encode/url_decode (UrlFunctions.java:43): x-www-form-urlencoded "
    "escaping (space->'+', UTF-8 percent escapes) with a decode round-trip.",
    tags=("functions", "dialect"),
)
def fn_url_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.presto import transpile

    return sql_over(spark, sf_dir, transpile(_URL_CODEC_PRESTO), ("part",))


# --- from_base/to_base (MathFunctions.java:65) ---

_BASE_CONV_PRESTO = """
SELECT o_orderkey,
       to_base(o_orderkey, 16) AS hex_str,
       to_base(o_orderkey, 2) AS bin_str,
       from_base(to_base(o_orderkey, 16), 16) AS roundtrip,
       from_base('ff', 16) AS const_255
FROM orders
WHERE o_orderkey <= 200
ORDER BY o_orderkey
"""

_BASE_CONV_DUCK = """
SELECT o_orderkey,
       lower(to_hex(o_orderkey)) AS hex_str,
       bin(o_orderkey) AS bin_str,
       o_orderkey AS roundtrip,
       CAST(255 AS BIGINT) AS const_255
FROM orders
WHERE o_orderkey <= 200
ORDER BY o_orderkey
"""


@query(
    "fn_base_conv",
    oracle=_BASE_CONV_DUCK,
    doc="from_base/to_base radix conversion (MathFunctions.java:65) via "
    "Spark conv(), lowercase digits matching Presto; round-trip pinned.",
    tags=("functions", "dialect"),
)
def fn_base_conv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.presto import transpile

    return sql_over(spark, sf_dir, transpile(_BASE_CONV_PRESTO), ("orders",))


# --- normal_cdf / inverse_normal_cdf / wilson intervals
#     (MathFunctions.java:65, WilsonInterval.java) ---

_CDF_PRESTO = """
SELECT o_orderkey,
       round(wilson_interval_lower(o_orderkey % 50 + 10, 100, 1.96), 6) AS w_lo,
       round(wilson_interval_upper(o_orderkey % 50 + 10, 100, 1.96), 6) AS w_hi,
       round(normal_cdf(0.0, 1.0, CAST(o_orderkey % 7 AS DOUBLE) - 3.0), 6) AS ncdf,
       abs(inverse_normal_cdf(0.0, 1.0, normal_cdf(0.0, 1.0, 1.5)) - 1.5) < 0.000000001 AS inv_roundtrip
FROM orders
WHERE o_orderkey <= 200
ORDER BY o_orderkey
"""

# DuckDB has no erf: the Wilson interval is recomputed arithmetically and
# normal_cdf is pinned against the 7 reference values Phi(-3..3) (computed
# from the error function; commons-math and libm agree to ~1e-15).
_CDF_DUCK = """
SELECT o_orderkey,
       round((s / 100.0 + z * z / 200.0 - z * sqrt((s / 100.0) * (1 - s / 100.0) / 100.0
              + z * z / 40000.0)) / (1 + z * z / 100.0), 6) AS w_lo,
       round((s / 100.0 + z * z / 200.0 + z * sqrt((s / 100.0) * (1 - s / 100.0) / 100.0
              + z * z / 40000.0)) / (1 + z * z / 100.0), 6) AS w_hi,
       CASE o_orderkey % 7
           WHEN 0 THEN 0.00135 WHEN 1 THEN 0.02275 WHEN 2 THEN 0.158655
           WHEN 3 THEN 0.5 WHEN 4 THEN 0.841345 WHEN 5 THEN 0.97725
           ELSE 0.99865 END AS ncdf,
       TRUE AS inv_roundtrip
FROM (SELECT o_orderkey, CAST(o_orderkey % 50 + 10 AS DOUBLE) AS s, 1.96 AS z
      FROM orders WHERE o_orderkey <= 200)
ORDER BY o_orderkey
"""


@query(
    "fn_cdf_wilson",
    oracle=_CDF_DUCK,
    doc="normal_cdf/inverse_normal_cdf (commons-math Erf via reflect) and "
    "wilson_interval_lower/upper (WilsonInterval.java) — CDF pinned against "
    "reference Phi values, Wilson recomputed arithmetically in the oracle.",
    tags=("functions", "dialect"),
)
def fn_cdf_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.presto import transpile

    return sql_over(spark, sf_dir, transpile(_CDF_PRESTO), ("orders",))


# --- hmac_* known-answer tests (HmacFunctions.java:25) ---

# RFC 4231 test case 2 (key "Jefe") + RFC 2202 for md5/sha1: published
# known-answer vectors, the same fixtures the reference's HmacFunctions
# tests assert against.
_HMAC_SPARK = """
SELECT 'jefe' AS vector,
       lower(hex(hmac_md5('what do ya want for nothing?', 'Jefe'))) AS h_md5,
       lower(hex(hmac_sha1('what do ya want for nothing?', 'Jefe'))) AS h_sha1,
       lower(hex(hmac_sha256('what do ya want for nothing?', 'Jefe'))) AS h_sha256,
       lower(hex(hmac_sha512('what do ya want for nothing?', 'Jefe'))) AS h_sha512
"""

_HMAC_DUCK = """
SELECT 'jefe' AS vector,
       '750c783e6ab0b503eaa86e310a5db738' AS h_md5,
       'effcdf6ae5eb2fa2d27416d5f184df9c259a7c79' AS h_sha1,
       '5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843' AS h_sha256,
       '164b7a7bfcf819e2e395fbe73b56e0a387bd64222e831fd610270cd7ea2505549758bf75c05a994a6d034f65f8f0e6fdcaeab1a34d4a6b4b636e070a38bce737' AS h_sha512
"""


@query(
    "fn_hmac",
    oracle=_HMAC_DUCK,
    doc="hmac_md5/sha1/sha256/sha512 (HmacFunctions.java:25) as registered "
    "Python UDFs, asserted against RFC 2202/4231 known-answer vectors "
    "(the documented slow path — no JVM hmac builtin; never on a hot path).",
    tags=("functions", "dialect"),
)
def fn_hmac(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.presto import register_udfs

    register_udfs(spark)
    return spark.sql(_HMAC_SPARK)


# --- approx_most_frequent analog (ApproximateMostFrequentFunction — heavy
#     hitters as a value->count map) ---


def _most_frequent_sql(d: str) -> str:
    # Exact top-k computation — a valid refinement of the sketch contract
    # (the reference's function guarantees the true heavy hitters appear;
    # exact counts satisfy every bound). Rendered canonically as a sorted
    # 'value:count' string, the map-shape the reference returns.
    if d == "spark":
        return """
WITH counts AS (
    SELECT event_type, count(*) AS c FROM events GROUP BY event_type
),
ranked AS (
    SELECT event_type, c,
           row_number() OVER (ORDER BY c DESC, event_type) AS rn
    FROM counts
)
SELECT array_join(
           transform(array_sort(collect_list(struct(rn AS o,
                     concat(event_type, ':', CAST(c AS STRING)) AS v))),
                     s -> s.v), ',') AS top3,
       count(*) AS n_buckets
FROM ranked WHERE rn <= 3
"""
    return """
WITH counts AS (
    SELECT event_type, count(*) AS c FROM events GROUP BY event_type
),
ranked AS (
    SELECT event_type, c,
           row_number() OVER (ORDER BY c DESC, event_type) AS rn
    FROM counts
)
SELECT string_agg(event_type || ':' || c, ',' ORDER BY rn) AS top3,
       count(*) AS n_buckets
FROM ranked WHERE rn <= 3
"""


@query(
    "fn_approx_most_frequent",
    oracle=_most_frequent_sql("duck"),
    doc="approx_most_frequent analog (ApproximateMostFrequentFunction): "
    "heavy hitters as an ordered value:count map — computed exactly (a "
    "valid refinement of the sketch's guarantees), one hash-agg + top-k.",
    tags=("functions",),
)
def fn_approx_most_frequent(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _most_frequent_sql("spark"), ("events",))


# --- mergeable quantile rollup (qdigest use case: QuantileDigestFunctions,
#     merge(qdigest) — re-aggregatable percentiles) ---


_QROLLUP_JOIN_SQL = """
SELECT n_nationkey AS nk, n_regionkey AS rk, o_totalprice AS v
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
"""


def _quantile_rollup_sql(d: str, joined: str = "joined") -> str:
    # Two-level mergeable estimation: per-nation fixed-width histograms are
    # the "sketches"; region level merges by summing bucket counts — the
    # re-aggregation property qdigest exists for. Every step is engine-
    # portable integer arithmetic, so the merged estimate AND the exact
    # median are both value-checked (no tautology).
    #
    # Shape notes (exchange budget): the fact join feeds BOTH the histogram
    # and the exact median; Spark inlines CTEs, so the Spark caller passes a
    # staged temp view instead (one join, not two). The per-region total is
    # an unbounded window over the same partitioning as the cumsum — no
    # extra aggregate + re-join for totals.
    exact = "percentile(v, 0.5)" if d == "spark" else "quantile_cont(v, 0.5)"
    with_joined = (
        "" if joined != "joined" else f"joined AS ({_QROLLUP_JOIN_SQL}),\n"
    )
    return f"""
WITH {with_joined}nat_hist AS (
    SELECT nk, rk, CAST(floor(v / 25000) AS BIGINT) AS b, count(*) AS cnt
    FROM {joined} GROUP BY 1, 2, 3
),
region_hist AS (
    SELECT rk, b, CAST(sum(cnt) AS BIGINT) AS cnt FROM nat_hist GROUP BY 1, 2
),
cum AS (
    SELECT rk, b,
           sum(cnt) OVER (PARTITION BY rk ORDER BY b) AS cum,
           sum(cnt) OVER (PARTITION BY rk) AS n
    FROM region_hist
),
med AS (
    SELECT rk,
           CAST(max(n) AS BIGINT) AS n,
           min(CASE WHEN cum * 2 >= n THEN b END) AS med_b
    FROM cum GROUP BY rk
),
exact_med AS (
    SELECT rk, round({exact}, 4) AS median_exact FROM {joined} GROUP BY rk
)
SELECT m.rk AS region,
       m.n AS n_orders,
       m.med_b AS median_bucket,
       CAST(m.med_b * 25000 + 12500 AS DOUBLE) AS median_est,
       e.median_exact,
       abs(CAST(m.med_b * 25000 + 12500 AS DOUBLE) - e.median_exact) <= 12500.0
           AS est_within_half_bucket
FROM med m
JOIN exact_med e ON m.rk = e.rk
ORDER BY region
"""


@query(
    "fn_quantile_rollup",
    oracle=_quantile_rollup_sql("duck"),
    doc="Mergeable quantile rollup (QuantileDigestFunctions / merge(qdigest) "
    "use case): per-nation fixed-width histograms merged to region level by "
    "count-sum re-aggregation, median estimated from the merged cumulative "
    "distribution — estimate, exact median, and error bound all "
    "value-checked on both engines.",
    tags=("functions",),
)
def fn_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.staging import staged_view

    joined_v = staged_view(
        spark,
        sf_dir,
        "qrollup_joined",
        lambda: sql_over(spark, sf_dir, _QROLLUP_JOIN_SQL, ("orders", "customer", "nation")),
    )
    return spark.sql(_quantile_rollup_sql("spark", joined=joined_v))


# --- spooky_hash_v2 known-answer tests (VarbinaryFunctions.java spooky;
#     vectors from the reference's TestVarbinaryFunctions.java:338-341) ---

_SPOOKY_SPARK = """
SELECT 'kat' AS vector,
       lower(hex(spooky_hash_v2_32(encode('', 'UTF-8')))) AS s32_empty,
       lower(hex(spooky_hash_v2_32(encode('hello', 'UTF-8')))) AS s32_hello,
       lower(hex(spooky_hash_v2_64(encode('', 'UTF-8')))) AS s64_empty,
       lower(hex(spooky_hash_v2_64(encode('hello', 'UTF-8')))) AS s64_hello
"""

_SPOOKY_DUCK = """
SELECT 'kat' AS vector,
       '6bf50919' AS s32_empty,
       'd382e6ca' AS s32_hello,
       '232706fc6bf50919' AS s64_empty,
       '3768826ad382e6ca' AS s64_hello
"""


@query(
    "fn_spooky",
    oracle=_SPOOKY_DUCK,
    doc="spooky_hash_v2_32/64 (VarbinaryFunctions.java — Hive bucket "
    "compatibility) as a pure-Python SpookyHashV2, asserted against the "
    "reference's own test vectors (TestVarbinaryFunctions.java:338-341). "
    "Compatibility surface only — engine-internal hashing stays JVM-side.",
    tags=("functions", "dialect"),
)
def fn_spooky(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.presto import register_udfs

    register_udfs(spark)
    return spark.sql(_SPOOKY_SPARK)


# --- ngrams as a user-facing function (ArrayNgramsFunction.java) ---

_NGRAMS_PRESTO = """
SELECT doc_id,
       cardinality(ngrams(split(text, ' '), 3)) AS n_trigrams,
       array_join(transform(ngrams(split(text, ' '), 2), g -> array_join(g, ' ')), '|') AS bigrams_str
FROM documents
WHERE doc_id <= 50
ORDER BY doc_id
"""

_NGRAMS_DUCK = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id <= 50
)
SELECT doc_id,
       CAST(greatest(len(t) - 3 + 1, 1) AS INT) AS n_trigrams,
       array_to_string(
           list_transform(generate_series(1, greatest(len(t) - 2 + 1, 1)),
                          i -> array_to_string(t[i:i+1], ' ')), '|') AS bigrams_str
FROM toks
ORDER BY doc_id
"""


# --- ORDER BY inside aggregation (Presto array_agg(x ORDER BY y) —
#     AggregationNode orderingScheme) ---


def _array_agg_ordered_sql(d: str) -> str:
    if d == "spark":
        # Spark's collect_list gives no ordering guarantee; the deterministic
        # rewrite packs the sort key into a struct, sorts, then projects.
        return """
SELECT n_regionkey,
       array_join(transform(array_sort(collect_list(struct(n_nationkey AS o, n_name AS v))),
                            s -> s.v), ',') AS names_by_key,
       array_join(transform(array_sort(collect_list(struct(n_name AS o, n_nationkey AS v))),
                            s -> CAST(s.v AS STRING)), ',') AS keys_by_name
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
"""
    return """
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_nationkey) AS names_by_key,
       string_agg(CAST(n_nationkey AS VARCHAR), ',' ORDER BY n_name) AS keys_by_name
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
"""


@query(
    "fn_array_agg_ordered",
    oracle=_array_agg_ordered_sql("duck"),
    doc="array_agg(x ORDER BY y) — ordered aggregation (AggregationNode "
    "orderingScheme, Presto 319 ORDER BY in aggregates) via the "
    "struct-sort-project rewrite, since collect_list guarantees no order.",
    tags=("functions",),
)
def fn_array_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _array_agg_ordered_sql("spark"), ("nation",))


# --- IEEE 754 bit patterns + binary spellings (VarbinaryFunctions.java,
#     MathFunctions.java to/from_ieee754_*) ---

_IEEE754_PRESTO = """
SELECT o_orderkey,
       from_ieee754_64(to_ieee754_64(CAST(o_totalprice AS DOUBLE))) AS roundtrip,
       CAST(from_ieee754_32(to_ieee754_32(CAST(o_totalprice AS REAL))) AS DOUBLE) AS roundtrip32,
       lower(to_hex(to_ieee754_64(CAST(1.0 AS DOUBLE)))) AS one_bits64,
       lower(to_hex(to_ieee754_32(CAST(1.0 AS DOUBLE)))) AS one_bits32,
       lower(to_hex(sha256(to_utf8('abc')))) AS sha256_abc,
       to_base64(to_utf8('presto')) AS b64,
       to_base64url(to_utf8('ab?~')) AS b64url,
       from_utf8(from_base64url(to_base64url(to_utf8(o_orderpriority)))) AS b64url_roundtrip,
       format('%05d/%s', o_orderkey, 'x') AS formatted
FROM orders
WHERE o_orderkey <= 200
ORDER BY o_orderkey
"""

# KAT oracle: the 1.0 bit patterns, sha256('abc'), and the URL-safe base64 of
# 'ab?~' (standard encoding 'YWI/fg==' -> '_' swap) are published constants;
# the round-trips must return the input exactly (bit-level identity).
_IEEE754_DUCK = """
SELECT o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS roundtrip,
       CAST(CAST(o_totalprice AS REAL) AS DOUBLE) AS roundtrip32,
       '3ff0000000000000' AS one_bits64,
       '3f800000' AS one_bits32,
       'ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad' AS sha256_abc,
       'cHJlc3Rv' AS b64,
       'YWI_fg==' AS b64url,
       o_orderpriority AS b64url_roundtrip,
       lpad(CAST(o_orderkey AS VARCHAR), 5, '0') || '/x' AS formatted
FROM orders
WHERE o_orderkey <= 200
ORDER BY o_orderkey
"""


@query(
    "fn_ieee754",
    oracle=_IEEE754_DUCK,
    doc="IEEE 754 bit patterns (to/from_ieee754_64, to_ieee754_32 — "
    "MathFunctions.java) via java.lang reflection, plus sha256/to_base64/"
    "format spellings (VarbinaryFunctions.java, FormatFunction.java); "
    "round-trip identity + published known-answer constants.",
    tags=("functions", "dialect"),
)
def fn_ieee754(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.presto import transpile

    return sql_over(spark, sf_dir, transpile(_IEEE754_PRESTO), ("orders",))


@query(
    "fn_ngrams",
    oracle=_NGRAMS_DUCK,
    doc="ngrams as a user-facing array function (ArrayNgramsFunction.java) "
    "via the transpiler's sequence+slice rewrite; bigrams rendered "
    "canonically, trigram cardinality value-checked.",
    tags=("functions", "dialect"),
)
def fn_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.presto import transpile

    return sql_over(spark, sf_dir, transpile(_NGRAMS_PRESTO), ("documents",))


# --- ISO 8601 / duration / data size (DateTimeFunctions.java:204-266,1331;
# DataSizeFunctions.java:37) ---

_ISO_DUR_PRESTO = """
SELECT o_orderkey,
       to_iso8601(CAST(o_orderdate AS TIMESTAMP)) AS iso_ts,
       CAST(from_iso8601_date(date_format(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d')) AS DATE) AS date_rt,
       CAST(from_iso8601_timestamp(to_iso8601(CAST(o_orderdate AS TIMESTAMP))) AS TIMESTAMP) AS ts_rt,
       millisecond(CAST(o_orderdate AS TIMESTAMP)) AS ms_part,
       to_milliseconds(parse_duration(concat(CAST(o_orderkey % 30 AS VARCHAR), 'm'))) AS dur_minutes_ms,
       to_milliseconds(parse_duration(concat(CAST(o_orderkey % 7 AS VARCHAR), '.5h'))) AS dur_hours_ms,
       to_milliseconds(parse_duration('250ms')) AS dur_fixed_ms,
       CAST(parse_presto_data_size(concat(CAST(o_orderkey % 100 AS VARCHAR), 'kB')) AS BIGINT) AS size_kb_bytes,
       CAST(parse_presto_data_size(concat(CAST(o_orderkey % 10 AS VARCHAR), '.5MB')) AS BIGINT) AS size_mb_bytes
FROM orders
WHERE o_orderkey <= 500
ORDER BY o_orderkey
"""

_ISO_DUR_DUCK = """
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%g') AS iso_ts,
       CAST(o_orderdate AS DATE) AS date_rt,
       CAST(o_orderdate AS TIMESTAMP) AS ts_rt,
       0 AS ms_part,
       CAST((o_orderkey % 30) * 60000 AS BIGINT) AS dur_minutes_ms,
       CAST(((o_orderkey % 7) + 0.5) * 3600000 AS BIGINT) AS dur_hours_ms,
       CAST(250 AS BIGINT) AS dur_fixed_ms,
       CAST((o_orderkey % 100) * 1024 AS BIGINT) AS size_kb_bytes,
       CAST(((o_orderkey % 10) + 0.5) * 1048576 AS BIGINT) AS size_mb_bytes
FROM orders
WHERE o_orderkey <= 500
ORDER BY o_orderkey
"""


@query(
    "fn_iso8601_duration",
    oracle=_ISO_DUR_DUCK,
    doc="ISO 8601 formatting/parsing round-trips (to_iso8601, "
    "from_iso8601_timestamp/date — DateTimeFunctions.java:204-266), "
    "millisecond extraction, parse_duration -> to_milliseconds "
    "(DateTimeFunctions.java:1331) and parse_presto_data_size "
    "(DataSizeFunctions.java:37), all through the dialect transpiler; "
    "oracle recomputes arithmetic directly in DuckDB.",
    tags=("functions", "dialect"),
)
def fn_iso8601_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.presto import transpile

    return sql_over(spark, sf_dir, transpile(_ISO_DUR_PRESTO), ("orders",))


# --- split_to_multimap / multimap rendering (SplitToMultimapFunction.java) ---

_MULTIMAP_PRESTO = """
SELECT n_nationkey,
       array_join(transform(array_sort(map_keys(mm)),
                            k -> concat(k, ':', array_join(element_at(mm, k), '|'))),
                  ',') AS mm_str,
       cardinality(mm) AS n_keys,
       cardinality(element_at(mm, 'a')) AS n_a_values
FROM (
    SELECT n_nationkey,
           split_to_multimap(concat('a=', CAST(n_nationkey AS VARCHAR), ';b=', n_name, ';a=', n_name),
                             ';', '=') AS mm
    FROM nation
)
ORDER BY n_nationkey
"""

_MULTIMAP_DUCK = """
SELECT n_nationkey,
       'a:' || CAST(n_nationkey AS VARCHAR) || '|' || n_name || ',b:' || n_name AS mm_str,
       2 AS n_keys,
       2 AS n_a_values
FROM nation
ORDER BY n_nationkey
"""


@query(
    "fn_multimap",
    oracle=_MULTIMAP_DUCK,
    doc="split_to_multimap (SplitToMultimapFunction.java) building "
    "map<varchar, array<varchar>> with duplicate-key grouping, via the "
    "transpiler's HOF composition; map rendered canonically (sorted keys, "
    "'|'-joined values) so the cross-engine hash never sees a map repr. "
    "Oracle constructs the expected rendering directly.",
    tags=("functions", "dialect"),
)
def fn_multimap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.presto import transpile

    return sql_over(spark, sf_dir, transpile(_MULTIMAP_PRESTO), ("nation",))


# --- beta_cdf, big-endian binary, human_readable_seconds
#     (MathFunctions.java:65, VarbinaryFunctions.java:37,
#     DateTimeFunctions.java human_readable_seconds) ---

_MISC_PRESTO = """
SELECT o_orderkey,
       round(beta_cdf(1.0, 1.0, x), 6) AS b11,
       round(beta_cdf(2.0, 1.0, x), 6) AS b21,
       round(beta_cdf(1.0, 2.0, x), 6) AS b12,
       round(beta_cdf(2.0, 2.0, x), 6) AS b22,
       lower(to_hex(to_big_endian_64(o_orderkey))) AS h64,
       from_big_endian_64(to_big_endian_64(0 - o_orderkey)) AS rt64,
       lower(to_hex(to_big_endian_32(k32))) AS h32,
       from_big_endian_32(to_big_endian_32(k32)) AS rt32,
       human_readable_seconds(o_orderkey % 700000) AS hrs
FROM (SELECT o_orderkey,
             CAST(o_orderkey % 9 + 1 AS DOUBLE) / 10.0 AS x,
             CAST(o_orderkey % 100 - 50 AS INTEGER) AS k32
      FROM orders)
WHERE o_orderkey <= 100
ORDER BY o_orderkey
"""


def _hrs_duck(n: str) -> str:
    big = f"CAST(round(CAST({n} AS DOUBLE)) AS BIGINT)"

    def part(v: str, unit: str) -> str:
        return (
            f"CASE WHEN {v} > 0 THEN CAST({v} AS VARCHAR) || ' ' || "
            f"CASE WHEN {v} = 1 THEN '{unit}' ELSE '{unit}s' END END"
        )

    return (
        "COALESCE(nullif(concat_ws(', ', "
        + part(f"({big} // 604800)", "week")
        + ", "
        + part(f"(({big} % 604800) // 86400)", "day")
        + ", "
        + part(f"(({big} % 86400) // 3600)", "hour")
        + ", "
        + part(f"(({big} % 3600) // 60)", "minute")
        + ", "
        + part(f"({big} % 60)", "second")
        + "), ''), '0 seconds')"
    )


# beta_cdf pinned against the closed forms Beta(1,1)=x, Beta(2,1)=x^2,
# Beta(1,2)=1-(1-x)^2, Beta(2,2)=3x^2-2x^3 (polynomials DuckDB evaluates
# exactly); big-endian encodings recomputed arithmetically (two's complement
# for the 32-bit negatives); human_readable_seconds re-derived with the same
# decomposition in DuckDB SQL.
_MISC_DUCK = f"""
SELECT o_orderkey,
       round(x, 6) AS b11,
       round(x * x, 6) AS b21,
       round(1 - (1 - x) * (1 - x), 6) AS b12,
       round(3 * x * x - 2 * x * x * x, 6) AS b22,
       lower(lpad(to_hex(o_orderkey), 16, '0')) AS h64,
       0 - o_orderkey AS rt64,
       lower(lpad(to_hex(CASE WHEN k32 < 0 THEN k32 + 4294967296 ELSE k32 END), 8, '0')) AS h32,
       k32 AS rt32,
       {_hrs_duck("o_orderkey % 700000")} AS hrs
FROM (SELECT o_orderkey,
             CAST(o_orderkey % 9 + 1 AS DOUBLE) / 10.0 AS x,
             CAST(o_orderkey % 100 - 50 AS INTEGER) AS k32
      FROM orders)
WHERE o_orderkey <= 100
ORDER BY o_orderkey
"""


@query(
    "fn_beta_endian_hrs",
    oracle=_MISC_DUCK,
    doc="beta_cdf (commons-math regularized incomplete beta via reflect, "
    "pinned against closed-form polynomials), to/from_big_endian_32/64 "
    "round-trips with hex renderings, and human_readable_seconds "
    "decomposition with pluralization.",
    tags=("functions", "dialect"),
)
def fn_beta_endian_hrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.presto import transpile

    return sql_over(spark, sf_dir, transpile(_MISC_PRESTO), ("orders",))


# --- time / time-of-day type (TimeType.java; DateTimeFunctions.java hour/
# minute/second over TIME) ------------------------------------------------
#
# Spark 4.1 ships a feature-flagged native TIME type; build_session enables
# it, and the query re-asserts the conf (runtime-settable) so a
# driver-provided session works too. The reference's `time` semantics —
# literals, string casts, field extraction, comparison, ordering, min/max —
# map 1:1. `cast(timestamp AS time)` (Presto-supported, Spark-unsupported)
# is expressed as date_format -> cast, which preserves microseconds.

_TIME_SPARK = """
SELECT event_type,
       min(tod) AS first_tod,
       max(tod) AS last_tod,
       count(IF(tod >= TIME'12:00:00', 1, NULL)) AS pm_events,
       hour(min(tod)) AS first_hour,
       minute(max(tod)) AS last_minute,
       cast(min(tod) AS string) AS first_tod_str
FROM (
    SELECT event_type,
           cast(date_format(ts, 'HH:mm:ss.SSSSSS') AS time) AS tod
    FROM events
)
GROUP BY event_type
ORDER BY event_type
"""

_TIME_DUCK = """
SELECT event_type,
       min(CAST(ts AS TIME)) AS first_tod,
       max(CAST(ts AS TIME)) AS last_tod,
       count(*) FILTER (WHERE CAST(ts AS TIME) >= TIME '12:00:00') AS pm_events,
       CAST(extract(hour FROM min(CAST(ts AS TIME))) AS INTEGER) AS first_hour,
       CAST(extract(minute FROM max(CAST(ts AS TIME))) AS INTEGER) AS last_minute,
       CAST(min(CAST(ts AS TIME)) AS VARCHAR) AS first_tod_str
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query(
    "fn_time",
    oracle=_TIME_DUCK,
    doc="`time` type surface (TimeType.java; SURVEY §1.2 gap now closed via "
    "Spark 4.1's native TIME): timestamp->time-of-day derivation, TIME "
    "literals, comparison, min/max aggregation, hour/minute extraction "
    "(DateTimeFunctions.java:304-332) and string rendering, vs DuckDB's "
    "native TIME.",
    tags=("functions", "types"),
)
def fn_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.timeType.enabled", "true")
    return sql_over(spark, sf_dir, _TIME_SPARK, ("events",))


# --- Presto scalar-compat wave 3 (array/element/special-value semantics) ---
#
# The semantic deltas these pin (all reference-faithful):
#  - element_at / split_part return NULL out of range (Spark: ANSI error /
#    empty string) — ElementAtFunction.java, StringFunctions.java splitPart
#  - contains/repeat are ARRAY functions in Presto (ArrayContains.java,
#    RepeatFunction.java); Spark's same-named builtins are string functions.
#    rep3 is emitted through array_join: the semantic pin is that repeat()
#    BUILDS an array (string repetition would render "000" not "0,0,0");
#    the carrier is a string because the driver's pandas canonicalizer
#    cannot hash list-typed cells (r13 red row; tests/test_registry_gate.py)
#  - infinity()/nan()/is_finite/is_infinite special values MathFunctions.java
#  - cosine_similarity over sparse map vectors (MathFunctions.java:1503) as
#    pure codegen HOFs — no UDF
#  - ARRAY[..] / map(ARRAY[..], ARRAY[..]) constructor syntax

_COMPAT3_PRESTO = """
SELECT p_partkey,
       levenshtein_distance(split_part(p_type, ' ', 1), split_part(p_type, ' ', 2)) AS lev,
       contains(ARRAY[1, 2, 3, 4, 5], p_partkey % 7) AS has_mod,
       array_join(repeat(p_partkey % 3, 3), ',') AS rep3,
       element_at(ARRAY[10, 20], CAST(p_partkey % 4 + 1 AS INTEGER)) AS maybe_elem,
       split_part(p_type, ' ', 99) AS oob_word,
       is_finite(ln(CAST(p_partkey + 1 AS DOUBLE))) AS fin,
       is_infinite(infinity()) AS inf_true,
       is_finite(nan()) AS nan_fin,
       width_bucket(CAST(p_retailprice AS DOUBLE), 0.0, 2500.0, 10) AS wb,
       round(cosine_similarity(
           map(ARRAY['a', 'b'], ARRAY[CAST(p_partkey % 5 + 1 AS DOUBLE), CAST(2 AS DOUBLE)]),
           map(ARRAY['b', 'c'], ARRAY[CAST(3 AS DOUBLE), CAST(4 AS DOUBLE)])), 6) AS cos_sim
FROM part
WHERE p_partkey <= 200
ORDER BY p_partkey
"""

_COMPAT3_DUCK = """
SELECT p_partkey,
       levenshtein(string_split(p_type, ' ')[1], string_split(p_type, ' ')[2]) AS lev,
       list_contains([1, 2, 3, 4, 5], p_partkey % 7) AS has_mod,
       array_to_string([p_partkey % 3, p_partkey % 3, p_partkey % 3], ',') AS rep3,
       CASE WHEN p_partkey % 4 + 1 <= 2 THEN [10, 20][CAST(p_partkey % 4 + 1 AS BIGINT)] END AS maybe_elem,
       CAST(NULL AS VARCHAR) AS oob_word,
       TRUE AS fin,
       TRUE AS inf_true,
       FALSE AS nan_fin,
       CASE WHEN CAST(p_retailprice AS DOUBLE) < 0 THEN 0
            WHEN CAST(p_retailprice AS DOUBLE) >= 2500.0 THEN 11
            ELSE CAST(floor(CAST(p_retailprice AS DOUBLE) / 250.0) + 1 AS BIGINT) END AS wb,
       round((2.0 * 3.0) / (sqrt((p_partkey % 5 + 1) * (p_partkey % 5 + 1) + 4.0) * 5.0), 6) AS cos_sim
FROM part
WHERE p_partkey <= 200
ORDER BY p_partkey
"""


@query(
    "fn_presto_compat",
    oracle=_COMPAT3_DUCK,
    doc="Presto array/element/special-value scalar semantics through the "
    "transpiler: NULL-on-out-of-range element_at/split_part, array "
    "contains/repeat, infinity/nan predicates, width_bucket, sparse-map "
    "cosine_similarity, ARRAY[]/map(ARRAY,ARRAY) constructors.",
    tags=("functions", "dialect"),
)
def fn_presto_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.presto import transpile

    return sql_over(spark, sf_dir, transpile(_COMPAT3_PRESTO), ("part",))


# --- entropy aggregate (EntropyAggregation.java) --------------------------
#
# Presto's entropy(c) consumes a column of counts and returns the Shannon
# entropy (log base 2) of the empirical distribution: -sum(p log2 p) over
# p = c / sum(c). Spark has no entropy aggregate; the mergeable two-moment
# identity makes it a pair of codegen sums instead:
#   H = log2(S) - sum(c * log2(c)) / S,   S = sum(c)
# which is exactly how the reference accumulates it (sumC, sumCLogC states)
# — so the Spark plan is a single hash aggregation, mergeable across
# partitions, no second pass over the data.

_ENTROPY_SPARK = """
SELECT o_orderpriority,
       round(CASE WHEN sum(c) > 0
                  THEN log2(sum(c)) - sum(c * log2(c)) / sum(c)
                  ELSE 0.0 END, 6) AS status_entropy,
       CAST(sum(c) AS BIGINT) AS n_orders
FROM (
    SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS DOUBLE) AS c
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

_ENTROPY_DUCK = """
SELECT o_orderpriority,
       round(CASE WHEN sum(c) > 0
                  THEN log2(sum(c)) - sum(c * log2(c)) / sum(c)
                  ELSE 0.0 END, 6) AS status_entropy,
       CAST(sum(c) AS BIGINT) AS n_orders
FROM (
    SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS DOUBLE) AS c
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query(
    "fn_entropy",
    oracle=_ENTROPY_DUCK,
    doc="Shannon entropy aggregate (EntropyAggregation.java) over per-status "
    "order counts, via the mergeable sumC/sumCLogC identity — one hash "
    "aggregation, same accumulator decomposition as the reference.",
    tags=("functions", "aggregates"),
)
def fn_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _ENTROPY_SPARK, ("orders",))


# --- DataSketches parity: theta set digests + KLL quantile sketches --------
#
# The reference's mergeable-sketch families map onto Spark 4.1's bundled
# Apache DataSketches functions:
#  - SetDigestFunctions.java (make_set_digest / merge_set_digest /
#    intersection_cardinality) -> theta_sketch_agg / theta_union /
#    theta_intersection / theta_sketch_estimate
#  - QuantileDigestFunctions.java (qdigest_agg / merge / value_at_quantile)
#    -> kll_sketch_agg_double / kll_merge_agg_double /
#    kll_sketch_get_quantile_double
# Theta estimates are EXACT below the sketch's retention threshold (~4k
# distinct at default lgK). The bucket space is FIXED (custkey % 1800) so
# per-region and pairwise-union cardinalities stay under the threshold at
# EVERY scale factor — the sf0.1 sweep caught the unbounded DIV 2 version
# drifting into estimate mode (4744 vs 4746) — and every cardinality
# column is value-checked, not just bounded. KLL
# compaction is randomized, so the estimate itself is never emitted — only
# exact-checkable stats plus a generous-tolerance boolean, the same pattern
# as fn_approx_agg.

_THETA_SPARK = """
WITH sk AS (
  SELECT n_regionkey AS rk,
         theta_sketch_agg(c_custkey % 1800) AS s,
         count(DISTINCT c_custkey % 1800) AS exact_card
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_regionkey
)
SELECT a.rk AS region_a, b.rk AS region_b,
       CAST(round(theta_sketch_estimate(a.s)) AS BIGINT) AS card_a,
       a.exact_card AS exact_a,
       CAST(round(theta_sketch_estimate(theta_union(a.s, b.s))) AS BIGINT) AS card_union,
       CAST(round(theta_sketch_estimate(theta_intersection(a.s, b.s))) AS BIGINT) AS card_intersect
FROM sk a JOIN sk b ON a.rk < b.rk
ORDER BY region_a, region_b
"""

_THETA_DUCK = """
WITH buckets AS (
  SELECT n_regionkey AS rk, c_custkey % 1800 AS b
  FROM customer JOIN nation ON c_nationkey = n_nationkey
),
card AS (SELECT rk, count(DISTINCT b) AS exact_card FROM buckets GROUP BY rk),
pairs AS (
  SELECT a.rk AS region_a, b.rk AS region_b FROM card a JOIN card b ON a.rk < b.rk
),
u AS (
  SELECT p.region_a, p.region_b, count(DISTINCT x.b) AS card_union
  FROM pairs p JOIN buckets x ON x.rk IN (p.region_a, p.region_b)
  GROUP BY p.region_a, p.region_b
),
i AS (
  SELECT p.region_a, p.region_b, count(*) AS card_intersect
  FROM pairs p
  LEFT JOIN (
    SELECT DISTINCT xa.b, xa.rk AS ra, xb.rk AS rb
    FROM buckets xa JOIN buckets xb ON xa.b = xb.b AND xa.rk < xb.rk
  ) ov ON ov.ra = p.region_a AND ov.rb = p.region_b
  WHERE ov.b IS NOT NULL
  GROUP BY p.region_a, p.region_b
)
SELECT u.region_a AS region_a, u.region_b AS region_b,
       c.exact_card AS card_a,
       c.exact_card AS exact_a,
       u.card_union,
       COALESCE(i.card_intersect, 0) AS card_intersect
FROM u
JOIN card c ON c.rk = u.region_a
LEFT JOIN i ON i.region_a = u.region_a AND i.region_b = u.region_b
ORDER BY u.region_a, u.region_b
"""


@query(
    "fn_theta_setdigest",
    oracle=_THETA_DUCK,
    doc="Mergeable set digests (SetDigestFunctions.java make_set_digest/"
    "merge_set_digest/intersection_cardinality) via theta sketches: "
    "per-region sketches over bucketed custkeys, pairwise union and "
    "intersection cardinalities — exact below the retention threshold, so "
    "every column is value-checked against DuckDB's exact distinct counts.",
    tags=("functions", "aggregates"),
)
def fn_theta_setdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _THETA_SPARK, ("customer", "nation"))


_KLL_SPARK = """
WITH sk AS (
  SELECT c_nationkey AS nk,
         kll_sketch_agg_double(CAST(c_acctbal AS DOUBLE), 800) AS s,
         count(*) AS n
  FROM customer GROUP BY c_nationkey
),
merged AS (
  SELECT kll_merge_agg_double(s) AS gs, CAST(sum(n) AS BIGINT) AS n_customers,
         count(*) AS n_sketches
  FROM sk
),
exact AS (
  SELECT round(percentile(CAST(c_acctbal AS DOUBLE), 0.5), 2) AS median_exact,
         round(percentile(CAST(c_acctbal AS DOUBLE), 0.9), 2) AS p90_exact
  FROM customer
)
SELECT m.n_customers,
       m.n_sketches,
       e.median_exact,
       e.p90_exact,
       abs(kll_sketch_get_quantile_double(m.gs, 0.5) - e.median_exact)
           <= 0.10 * (abs(e.median_exact) + 1.0) AS median_within_tol,
       abs(kll_sketch_get_quantile_double(m.gs, 0.9) - e.p90_exact)
           <= 0.10 * (abs(e.p90_exact) + 1.0) AS p90_within_tol
FROM merged m CROSS JOIN exact e
"""

_KLL_DUCK = """
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_sketches,
       round(quantile_cont(CAST(c_acctbal AS DOUBLE), 0.5), 2) AS median_exact,
       round(quantile_cont(CAST(c_acctbal AS DOUBLE), 0.9), 2) AS p90_exact,
       TRUE AS median_within_tol,
       TRUE AS p90_within_tol
FROM customer
"""


@query(
    "fn_kll_quantile",
    oracle=_KLL_DUCK,
    doc="Mergeable quantile sketches (QuantileDigestFunctions.java "
    "qdigest_agg/merge/value_at_quantile) via KLL: per-nation sketches "
    "merged once, median/p90 read from the merged sketch. Exact columns "
    "value-checked; sketch estimates asserted within tolerance (KLL "
    "compaction is randomized, so the raw estimate is never hashed).",
    tags=("functions", "aggregates"),
)
def fn_kll_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _KLL_SPARK, ("customer",))


def _ipaddress_sql(d: str) -> str:
    """ip4<->bigint codecs and CIDR membership as codegen arithmetic.

    The reference models IPs as a dedicated type (presto-spi IpAddressType.java)
    with casts from/to varchar; the engine models them as STRING plus these
    helpers (COVERAGE.md §1.2), the common warehouse idiom. Prefix checks are
    literal power-of-two integer divisions — no string ops on the hot path.
    """
    idiv = "div" if d == "spark" else "//"
    str_t = "STRING" if d == "spark" else "VARCHAR"
    o1, o2, o3, o4 = (
        f"(ip_num {idiv} 16777216) % 256",
        f"(ip_num {idiv} 65536) % 256",
        f"(ip_num {idiv} 256) % 256",
        "ip_num % 256",
    )
    parse_back = (
        "CAST(split_part(ip_str, '.', 1) AS BIGINT) * 16777216"
        " + CAST(split_part(ip_str, '.', 2) AS BIGINT) * 65536"
        " + CAST(split_part(ip_str, '.', 3) AS BIGINT) * 256"
        " + CAST(split_part(ip_str, '.', 4) AS BIGINT)"
    )
    return f"""
WITH src AS (
    SELECT c_custkey,
           (c_custkey * 2654435761) % 4294967296 AS ip_num
    FROM customer
    WHERE c_custkey % 13 = 0
),
ips AS (
    SELECT c_custkey, ip_num,
           concat(CAST({o1} AS {str_t}), '.', CAST({o2} AS {str_t}), '.',
                  CAST({o3} AS {str_t}), '.', CAST({o4} AS {str_t})) AS ip_str
    FROM src
)
SELECT c_custkey,
       ip_str,
       ip_num AS ip4_to_bigint,
       ({parse_back}) = ip_num AS roundtrip_ok,
       (ip_num {idiv} 16777216) = 10 AS in_10_0_0_0_8,
       (ip_num {idiv} 1048576) = 2753 AS in_172_16_0_0_12,
       (ip_num {idiv} 65536) = 49320 AS in_192_168_0_0_16
FROM ips
ORDER BY c_custkey
"""


@query(
    "fn_ipaddress",
    oracle=_ipaddress_sql("duck"),
    doc="ipaddress niche (IpAddressType.java + varchar casts): bigint->dotted "
    "quad, dotted quad->bigint round-trip, and CIDR-contains for /8, /12, "
    "/16 prefixes via literal power-of-two integer division — pure codegen, "
    "no regex/UDF. uuid() is covered by the transpiler (functions/presto.py).",
    tags=("functions",),
)
def fn_ipaddress(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _ipaddress_sql("spark"), ("customer",))
