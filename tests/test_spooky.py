"""SpookyHashV2 against the reference's published vectors + path coverage."""

from __future__ import annotations

from lyft_presto_spark.operators.spooky import (
    _BUF,
    spooky_hash_v2_32,
    spooky_hash_v2_64,
)


def test_reference_vectors():
    # TestVarbinaryFunctions.java:338-341
    assert spooky_hash_v2_32(b"").hex() == "6bf50919"
    assert spooky_hash_v2_32(b"hello").hex() == "d382e6ca"
    assert spooky_hash_v2_64(b"").hex() == "232706fc6bf50919"
    assert spooky_hash_v2_64(b"hello").hex() == "3768826ad382e6ca"


def test_hash32_is_low_word_of_hash64():
    for msg in (b"", b"hello", b"x" * 31, b"y" * 200):
        assert spooky_hash_v2_64(msg)[4:] == spooky_hash_v2_32(msg)


def test_short_path_block_boundaries():
    # 15/16 (word switch), 31/32 (block), 191/192 (short->long crossover):
    # distinct deterministic digests, no exceptions.
    seen = set()
    for n in (0, 1, 8, 15, 16, 31, 32, 33, 191, _BUF, _BUF + 1, 96 * 3):
        d = spooky_hash_v2_64(bytes(range(256))[: n % 256] * (n // 256 + 1))
        h = spooky_hash_v2_64(b"a" * n)
        assert h == spooky_hash_v2_64(b"a" * n)
        seen.add((n, h))
    assert len({h for _, h in seen}) == len(seen)
