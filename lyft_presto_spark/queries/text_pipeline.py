"""Text-analysis pipeline over the ``documents`` fixture.

Covers the reference's text surface (StringFunctions.java:62 split/length/
lower, ArrayNgramsFunction.java ngrams, WordStemFunction.java:51 stemming
niche) re-expressed as pipeline-scale operators: token counting, quality
scoring, language-ID, fingerprinting (SURVEY.md §7 Phase 6).

All scoring is built-in-function arithmetic (regexp + lambda HOFs) — JVM
codegen on the Spark side, one map-side pass per document, aggregations
shuffle only grouped scalars (never raw text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import text as T
from .registry import query, sql_over

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def _size(expr: str, d: str) -> str:
    return T.array_size(expr, d)


def _token_stats_sql(d: str) -> str:
    toks = T.tokens("text", d)
    return f"""
WITH per_doc AS (
    SELECT doc_id, source, {_size(toks, d)} AS n_tokens, n_chars
    FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(n_tokens), 4) AS avg_tokens,
       max(n_tokens) AS max_tokens,
       min(n_tokens) AS min_tokens,
       round(avg(CAST(n_chars AS DOUBLE) / n_tokens), 4) AS avg_chars_per_token
FROM per_doc
GROUP BY source
ORDER BY source
"""


@query(
    "text_token_stats",
    oracle=_token_stats_sql("duck"),
    doc="Whitespace token counting per document, aggregated per source "
    "(map-side tokenize, shuffle only grouped scalars).",
    tags=("text",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _token_stats_sql("spark"), ("documents",))


def _bpe_count_sql(d: str) -> str:
    # BPE-ish pre-tokenizer: letter runs | digit runs | non-space symbol runs
    # — the GPT-2 pre-tokenizer shape, regex-only. The space is written as a
    # literal class member (no backslash escapes: Spark SQL string literals
    # eat unknown escapes, DuckDB does not).
    pat = "'([a-z]+|[0-9]+|[^a-z0-9 ]+)'"
    if d == "spark":
        n = f"size(regexp_extract_all(lower(text), {pat}, 0))"
    else:
        n = f"len(regexp_extract_all(lower(text), {pat}))"
    return f"""
SELECT source,
       CAST(sum({n}) AS BIGINT) AS total_bpe_tokens,
       round(avg({n}), 4) AS avg_bpe_tokens
FROM documents
GROUP BY source
ORDER BY source
"""


@query(
    "text_bpe_token_count",
    oracle=_bpe_count_sql("duck"),
    doc="BPE-ish token counting via regex pre-tokenizer (letter/digit/symbol "
    "runs), regexp_extract_all only — no Python in the loop.",
    tags=("text",),
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _bpe_count_sql("spark"), ("documents",))


def _quality_sql(d: str) -> str:
    toks = T.tokens("text", d)
    g = ", 'g'" if d == "duck" else ""
    n_alnum = f"length(regexp_replace(lower(text), '[^a-z0-9]', ''{g}))"
    n_stop = (
        f"size(filter(toks, t -> t IN {STOPWORDS}))"
        if d == "spark"
        else f"len(list_filter(toks, t -> t IN {STOPWORDS}))"
    )
    return f"""
WITH feat AS (
    SELECT doc_id, source, n_chars, {toks} AS toks,
           {n_alnum} AS n_alnum
    FROM documents
),
scored AS (
    SELECT doc_id, source,
           {_size('toks', d)} AS n_tokens,
           round(CAST(n_chars - n_alnum AS DOUBLE) / n_chars, 6) AS punct_ratio,
           round(CAST({n_stop} AS DOUBLE) / {_size('toks', d)}, 6) AS stopword_ratio,
           round(CAST(n_alnum AS DOUBLE) / {_size('toks', d)}, 6) AS avg_token_len
    FROM feat
),
final AS (
    SELECT doc_id, source, n_tokens, punct_ratio, stopword_ratio, avg_token_len,
           CAST(round(
             (CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 0.4 ELSE 0.0 END)
           + (CASE WHEN punct_ratio < 0.3 THEN 0.3 ELSE 0.0 END)
           + (CASE WHEN stopword_ratio BETWEEN 0.01 AND 0.6 THEN 0.2 ELSE 0.0 END)
           + (CASE WHEN avg_token_len BETWEEN 2 AND 12 THEN 0.1 ELSE 0.0 END), 1) AS DOUBLE)
           AS quality_score
    FROM scored
)
SELECT source,
       count(*) AS n_docs,
       round(avg(quality_score), 6) AS avg_quality,
       CAST(sum(CASE WHEN quality_score >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
FROM final
GROUP BY source
ORDER BY source
"""


@query(
    "text_quality_score",
    oracle=_quality_sql("duck"),
    doc="Composite quality scoring (length/punct/stopword/token-length "
    "heuristics) with keep-threshold counts per source.",
    tags=("text",),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _quality_sql("spark"), ("documents",))


def _langid_sql(d: str) -> str:
    toks = T.tokens("text", d)
    hits = {lang: T.marker_hits("toks", lang, d) for lang in T.LANG_MARKERS}
    # arg-max by marker hits with deterministic tie-break (alphabetical lang).
    pairs = ", ".join(f"({hits[lang]}, '{lang}')" for lang in sorted(T.LANG_MARKERS))
    if d == "spark":
        guess = (
            f"array_max(array({', '.join(f'struct({hits[lang]} AS h, {chr(39)}{lang}{chr(39)} AS l)' for lang in sorted(T.LANG_MARKERS, reverse=True))})).l"
        )
    else:
        guess = (
            # struct-max on the Spark side ties to the *last* lang; match it.
            "(SELECT l FROM (VALUES " + pairs + ") AS m(h, l) ORDER BY h DESC, l DESC LIMIT 1)"
        )
    return f"""
WITH toks_t AS (
    SELECT doc_id, lang, {toks} AS toks FROM documents
),
guessed AS (
    SELECT doc_id, lang AS labeled_lang, {guess} AS guessed_lang FROM toks_t
)
SELECT labeled_lang, guessed_lang, count(*) AS n_docs
FROM guessed
GROUP BY labeled_lang, guessed_lang
ORDER BY labeled_lang, guessed_lang
"""


@query(
    "text_langid_confusion",
    oracle=_langid_sql("duck"),
    doc="N-gram/stopword-marker language ID, reported as a confusion matrix "
    "against the labeled lang column.",
    tags=("text",),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _langid_sql("spark"), ("documents",))


def _fingerprint_sql(d: str) -> str:
    # Winnowing-style fingerprint: the minimum shingle hash per document (the
    # k=1 minhash) plus a full-content digest; duplicates share fingerprints.
    toks = T.tokens("text", d)
    sh = T.shingles("toks", d)
    from ..operators import dedup as DD

    hashes = DD.shingle_hashes("sh", d)
    amin = "array_min" if d == "spark" else "list_min"
    join = "array_join" if d == "spark" else "array_to_string"
    return f"""
WITH toks_t AS (
    SELECT doc_id, {toks} AS toks FROM documents
),
sh_t AS (
    SELECT doc_id, {sh} AS sh, toks FROM toks_t
),
fp AS (
    SELECT doc_id,
           {amin}({hashes}) AS min_shingle_hash,
           md5({join}(toks, ' ')) AS content_digest
    FROM sh_t
)
SELECT count(DISTINCT min_shingle_hash) AS n_distinct_fingerprints,
       count(DISTINCT content_digest) AS n_distinct_digests,
       count(*) AS n_docs,
       min(min_shingle_hash) AS global_min_hash
FROM fp
"""


@query(
    "text_fingerprint",
    oracle=_fingerprint_sql("duck"),
    doc="Document fingerprinting: min-shingle-hash (winnowing-style) + "
    "content digest; distinct-fingerprint census.",
    tags=("text",),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql_over(spark, sf_dir, _fingerprint_sql("spark"), ("documents",))
