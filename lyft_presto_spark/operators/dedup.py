"""Deduplication operators: MinHash+LSH and SimHash signatures.

Reference niche: SetDigest / MinHash jaccard (presto-main/.../type/setdigest/
SetDigestFunctions.java — intersection_cardinality, jaccard_index;
BuildSetDigestAggregation.java). Re-expressed Spark-first: signatures are
computed with built-in lambda HOFs over shingle arrays (whole-stage codegen),
candidate pairs come from an *equi-join on band keys* — the LSH trick that
turns an O(n²) all-pairs comparison into a shuffle-join on bucket ids, which
is the only shape that survives 100 TB.

All expressions are generated per-dialect (spark/duck) from the same
constants, so the DuckDB oracle computes bit-identical signatures.
"""

from __future__ import annotations

from .text import hash60

# MinHash: k permutations h_j(x) = (A_j * x + B_j) mod P over 60-bit shingle
# hashes reduced mod P. P = 2^31 - 1 (prime); A_j, B_j < 2^31 keep every
# intermediate < 2^62 — no bigint overflow under ANSI mode in either engine.
MINHASH_P = 2_147_483_647
NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS
# Deterministic seed table (odd multipliers; fixed constants, not runtime RNG).
MINHASH_A = [2 * j + 3 for j in range(NUM_HASHES)]
MINHASH_B = [(j * j * 31 + 17) % MINHASH_P for j in range(NUM_HASHES)]

SIMHASH_BITS = 60  # hash60 yields 60 usable bits
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS  # 15


def shingle_hashes(shingles_expr: str, dialect: str) -> str:
    """Array of full 60-bit hashes of each shingle.

    NOT reduced mod P here: simhash consumes the upper bits (a mod-P hash
    zeroes bits 31+, collapsing the upper LSH bands into one bucket).
    MinHash permutations reduce mod P themselves.
    """
    h = hash60("s", dialect)
    if dialect == "spark":
        return f"transform({shingles_expr}, s -> {h})"
    return f"list_transform({shingles_expr}, s -> {h})"


def minhash_perm(x: str, j: int) -> str:
    """j-th permutation of a 60-bit hash (overflow-safe under ANSI: the
    operand is reduced mod P < 2^31 before the < 2^6 multiplier)."""
    return f"(({MINHASH_A[j]} * ({x} % {MINHASH_P}) + {MINHASH_B[j]}) % {MINHASH_P})"


def minhash_sig(hashes_expr: str, dialect: str) -> str:
    """MinHash signature: array of NUM_HASHES minima over the shingle hashes."""
    parts = []
    for j in range(NUM_HASHES):
        perm = minhash_perm("x", j)
        if dialect == "spark":
            parts.append(f"array_min(transform({hashes_expr}, x -> {perm}))")
        else:
            parts.append(f"list_min(list_transform({hashes_expr}, x -> {perm}))")
    inner = ", ".join(parts)
    return f"array({inner})" if dialect == "spark" else f"[{inner}]"


def band_key(sig_expr: str, band: int, dialect: str) -> str:
    """One LSH band of the signature as a join key string."""
    lo = band * ROWS_PER_BAND + 1  # both engines are 1-based
    hi = lo + ROWS_PER_BAND - 1
    if dialect == "spark":
        return f"array_join(slice({sig_expr}, {lo}, {ROWS_PER_BAND}), ',')"
    return f"array_to_string({sig_expr}[{lo}:{hi}], ',')"


def sig_similarity(sig_a: str, sig_b: str, dialect: str) -> str:
    """Estimated Jaccard = fraction of agreeing signature positions."""
    if dialect == "spark":
        return (
            f"CAST(size(filter(zip_with({sig_a}, {sig_b}, (x, y) -> x = y), eq -> eq)) AS DOUBLE)"
            f" / {NUM_HASHES}"
        )
    return (
        f"CAST(len(list_filter(generate_series(1, {NUM_HASHES}), "
        f"i -> {sig_a}[i] = {sig_b}[i])) AS DOUBLE) / {NUM_HASHES}"
    )


def simhash(hashes_expr: str, dialect: str) -> str:
    """SimHash: per-bit majority vote over shingle hashes, packed to BIGINT.

    bit_i(sig) = 1 iff sum over shingles of (2*bit_i(h) - 1) > 0.
    """
    if dialect == "spark":
        vote = f"aggregate({hashes_expr}, 0L, (acc, h) -> acc + 2 * CAST(shiftright(h, i) % 2 AS BIGINT) - 1)"
        bit = f"CASE WHEN {vote} > 0 THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END"
        return f"aggregate(transform(sequence(0, {SIMHASH_BITS - 1}), i -> {bit}), 0L, (acc, x) -> acc + x)"
    vote = f"list_reduce(list_prepend(CAST(0 AS BIGINT), {hashes_expr}), (acc, h) -> acc + 2 * ((h >> i) & 1) - 1)"
    bit = f"CASE WHEN {vote} > 0 THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(0, {SIMHASH_BITS - 1}), i -> {bit})), (acc, x) -> acc + x)"
    )


def simhash_band(sh_expr: str, band: int, dialect: str) -> str:
    """15-bit band of a simhash for blocked (equi-join) candidate generation."""
    shift = band * SIMHASH_BAND_BITS
    mask = (1 << SIMHASH_BAND_BITS) - 1
    if dialect == "spark":
        return f"shiftright({sh_expr}, {shift}) % {mask + 1}"
    return f"({sh_expr} >> {shift}) & {mask}"


def hamming(a: str, b: str, dialect: str) -> str:
    if dialect == "spark":
        return f"bit_count({a} ^ {b})"
    return f"bit_count(xor({a}, {b}))"
