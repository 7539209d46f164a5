"""Text-analysis expression builders (tokenize, shingle, hash, fingerprint).

Role model: the reference's string/text surface — word_stem
(presto-main/.../scalar/WordStemFunction.java:51), ngrams
(ArrayNgramsFunction.java), split/levenshtein (StringFunctions.java:62) — plus
the LLM-pipeline text ops this engine adds as first-class capability.

Every builder returns a SQL expression string for a given dialect
(``spark`` | ``duck``); both are generated from the same constants so the
Spark query and DuckDB oracle stay in lock-step. Spark expressions use only
built-in functions and lambda HOFs → whole-stage codegen, no Python.
"""

from __future__ import annotations

# 60-bit portable hash: identical in Spark and DuckDB (md5 is md5 everywhere;
# 15 hex digits = 60 bits < 2^63 so the BIGINT cast is exact in both).
# Analog of the reference's xxhash64/spooky hashes (VarbinaryFunctions.java:37)
# but chosen for cross-engine determinism.


def hash60(expr: str, dialect: str) -> str:
    if dialect == "spark":
        return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def tokens(expr: str, dialect: str) -> str:
    """Lowercased alphanumeric tokens; identical tokenization in both engines."""
    if dialect == "spark":
        return (
            f"filter(split(regexp_replace(lower({expr}), '[^a-z0-9 ]', ' '), ' '), "
            "t -> t <> '')"
        )
    return (
        f"list_filter(string_split(regexp_replace(lower({expr}), '[^a-z0-9 ]', ' ', 'g'), ' '), "
        "t -> t <> '')"
    )


def shingles(tokens_expr: str, dialect: str, k: int = 3) -> str:
    """Distinct word k-gram shingles of a token array (ArrayNgramsFunction analog).

    Spark spelling uses a LET BINDING via single-element ``transform``:
    ``transform(array(<toks>), a -> <body over a>)[0]``. Without it,
    Catalyst's projection collapse inlines ``tokens_expr`` into every
    reference INSIDE the index lambda, so the document is re-tokenized once
    per shingle index — quadratic per document (observed 28 s -> 3.7 s on
    5k docs at sf0.1). A lambda-bound variable cannot be inlined through,
    so the binding pins exactly one evaluation per row regardless of how
    projections collapse upstream.
    """
    if dialect == "spark":
        gram = " || ' ' || ".join(f"element_at(a, i + {j})" for j in range(k))
        return (
            f"transform(array({tokens_expr}), a -> "
            f"CASE WHEN size(a) < {k} "
            f"THEN array(array_join(a, ' ')) "
            f"ELSE array_distinct(transform(sequence(1, size(a) - {k - 1}), "
            f"i -> {gram})) END)[0]"
        )
    gram = " || ' ' || ".join(f"__t[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({tokens_expr}) < {k} "
        f"THEN [array_to_string({tokens_expr}, ' ')] "
        f"ELSE list_distinct(list_transform(generate_series(1, len({tokens_expr}) - {k - 1}), "
        f"i -> {gram.replace('__t', tokens_expr)})) END"
    )


def array_size(expr: str, dialect: str) -> str:
    return f"size({expr})" if dialect == "spark" else f"len({expr})"


# Language-ID marker words (n-gram/stopword heuristic). The guess is the
# arg-max of marker hits — pure CASE arithmetic, byte-identical across engines.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "una", "por"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("de", "shi", "zai", "le", "wo"),
}


def marker_hits(tokens_expr: str, lang: str, dialect: str) -> str:
    """Count of tokens that are marker words for ``lang``."""
    markers = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    if dialect == "spark":
        return f"size(filter({tokens_expr}, t -> t IN ({markers})))"
    return f"len(list_filter({tokens_expr}, t -> t IN ({markers})))"
