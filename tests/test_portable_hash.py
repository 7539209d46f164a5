"""Cross-engine parity of the portable 60-bit hash (`operators/text.hash60`).

Every deterministic sampling/split/dedup decision in the engine keys off
hash60, so Spark and DuckDB must agree on it byte-for-byte — including on
adversarial inputs (quotes, backslashes, newlines, non-ASCII, long strings).
A fixed tricky corpus plus a seeded random unicode sample round-trips
through a parquet file so both engines hash the exact same stored bytes.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from lyft_presto_spark.operators.text import hash60

TRICKY = [
    "",
    " ",
    "a",
    "hello world",
    "it's",
    'double "quote"',
    "back\\slash",
    "new\nline",
    "tab\tchar",
    "trailing space ",
    " leading space",
    "naïve café über",
    "中文字符串",
    "emoji 🙂🚀",
    "ÅÄÖ åäö",
    "0",
    "-1",
    "9999999999999999",
    "a" * 10_000,
    "μικρό ελληνικό",
]


def _random_unicode(rng: random.Random, n: int) -> str:
    # Mix of ASCII, Latin-1 supplement, CJK, and emoji planes.
    ranges = [(0x20, 0x7E), (0xA0, 0xFF), (0x4E00, 0x4FFF), (0x1F600, 0x1F64F)]
    out = []
    for _ in range(n):
        lo, hi = rng.choice(ranges)
        out.append(chr(rng.randint(lo, hi)))
    return "".join(out)


@pytest.fixture(scope="module")
def corpus_parquet(tmp_path_factory):
    rng = random.Random(0xC0FFEE)
    strings = TRICKY + [_random_unicode(rng, rng.randint(1, 80)) for _ in range(500)]
    path = str(tmp_path_factory.mktemp("hash60") / "corpus.parquet")
    con = duckdb.connect()
    con.execute("CREATE TABLE corpus (id BIGINT, s VARCHAR)")
    con.executemany(
        "INSERT INTO corpus VALUES (?, ?)", list(enumerate(strings))
    )
    con.execute(f"COPY corpus TO '{path}' (FORMAT PARQUET)")
    con.close()
    return path, len(strings)


def test_hash60_cross_engine_parity(spark, corpus_parquet):
    path, n = corpus_parquet
    sdf = spark.read.parquet(path)
    sdf.createOrReplaceTempView("hash_corpus")
    spark_rows = spark.sql(
        f"SELECT id, {hash60('s', 'spark')} AS h FROM hash_corpus ORDER BY id"
    ).collect()
    con = duckdb.connect()
    duck_rows = con.execute(
        f"SELECT id, {hash60('s', 'duck')} AS h "
        f"FROM read_parquet('{path}') ORDER BY id"
    ).fetchall()
    con.close()
    assert len(spark_rows) == len(duck_rows) == n
    for (sid, sh), (did, dh) in zip(spark_rows, duck_rows):
        assert sid == did
        assert sh == dh, f"hash60 mismatch on id={sid}: spark={sh} duck={dh}"
    # 60-bit range sanity: everything non-negative and below 2^60.
    assert all(0 <= r.h < (1 << 60) for r in spark_rows)
