"""SpookyHashV2 in pure Python (public-domain algorithm, Bob Jenkins 2012).

The reference exposes spooky_hash_v2_32/64 (VarbinaryFunctions.java — used
for Hive bucket compatibility). No JVM-side Spark equivalent exists and the
container has no native library, so this is a faithful from-the-published-
algorithm implementation registered as Python UDFs: the documented slow
path, for compatibility surface only — never on the engine's hot path
(engine-internal hashing uses xxhash64/md5, both JVM codegen).

Known-answer vectors from the reference's own tests
(TestVarbinaryFunctions.java:338-341, seeds 0):
  spooky_hash_v2_32('')      = 6BF50919
  spooky_hash_v2_64('')      = 232706FC6BF50919
  spooky_hash_v2_64('hello') = 3768826AD382E6CA
"""

from __future__ import annotations

import struct

_MASK = 0xFFFFFFFFFFFFFFFF
_SC_CONST = 0xDEADBEEFDEADBEEF
_NUM_VARS = 12
_BLOCK = 8 * _NUM_VARS  # 96
_BUF = 2 * _BLOCK  # 192


def _rot(x: int, k: int) -> int:
    return ((x << k) | (x >> (64 - k))) & _MASK


def _short_mix(a: int, b: int, c: int, d: int) -> tuple[int, int, int, int]:
    c = _rot(c, 50); c = (c + d) & _MASK; a ^= c
    d = _rot(d, 52); d = (d + a) & _MASK; b ^= d
    a = _rot(a, 30); a = (a + b) & _MASK; c ^= a
    b = _rot(b, 41); b = (b + c) & _MASK; d ^= b
    c = _rot(c, 54); c = (c + d) & _MASK; a ^= c
    d = _rot(d, 48); d = (d + a) & _MASK; b ^= d
    a = _rot(a, 38); a = (a + b) & _MASK; c ^= a
    b = _rot(b, 37); b = (b + c) & _MASK; d ^= b
    c = _rot(c, 62); c = (c + d) & _MASK; a ^= c
    d = _rot(d, 34); d = (d + a) & _MASK; b ^= d
    a = _rot(a, 5);  a = (a + b) & _MASK; c ^= a
    b = _rot(b, 36); b = (b + c) & _MASK; d ^= b
    return a, b, c, d


def _short_end(a: int, b: int, c: int, d: int) -> tuple[int, int, int, int]:
    d ^= c; c = _rot(c, 15); d = (d + c) & _MASK
    a ^= d; d = _rot(d, 52); a = (a + d) & _MASK
    b ^= a; a = _rot(a, 26); b = (b + a) & _MASK
    c ^= b; b = _rot(b, 51); c = (c + b) & _MASK
    d ^= c; c = _rot(c, 28); d = (d + c) & _MASK
    a ^= d; d = _rot(d, 9);  a = (a + d) & _MASK
    b ^= a; a = _rot(a, 47); b = (b + a) & _MASK
    c ^= b; b = _rot(b, 54); c = (c + b) & _MASK
    d ^= c; c = _rot(c, 32); d = (d + c) & _MASK
    a ^= d; d = _rot(d, 25); a = (a + d) & _MASK
    b ^= a; a = _rot(a, 63); b = (b + a) & _MASK
    return a, b, c, d


def _short(msg: bytes, seed1: int, seed2: int) -> tuple[int, int]:
    length = len(msg)
    remainder = length % 32
    a, b = seed1 & _MASK, seed2 & _MASK
    c = d = _SC_CONST
    pos = 0
    if length > 15:
        for _ in range(length // 32):
            u = struct.unpack_from("<4Q", msg, pos)
            c = (c + u[0]) & _MASK
            d = (d + u[1]) & _MASK
            a, b, c, d = _short_mix(a, b, c, d)
            a = (a + u[2]) & _MASK
            b = (b + u[3]) & _MASK
            pos += 32
        if remainder >= 16:
            u = struct.unpack_from("<2Q", msg, pos)
            c = (c + u[0]) & _MASK
            d = (d + u[1]) & _MASK
            a, b, c, d = _short_mix(a, b, c, d)
            pos += 16
            remainder -= 16
    d = (d + (length << 56)) & _MASK
    t = msg[pos:]
    r = remainder
    if r >= 9:
        # bytes 8..r-1 accumulate into d, byte positions 8..14
        for i in range(r - 1, 7, -1):
            d = (d + (t[i] << (8 * (i - 8)))) & _MASK
        c = (c + struct.unpack_from("<Q", t, 0)[0]) & _MASK
    elif r == 8:
        c = (c + struct.unpack_from("<Q", t, 0)[0]) & _MASK
    elif r >= 1:
        for i in range(r - 1, -1, -1):
            c = (c + (t[i] << (8 * i))) & _MASK
    else:
        c = (c + _SC_CONST) & _MASK
        d = (d + _SC_CONST) & _MASK
    a, b, c, d = _short_end(a, b, c, d)
    return a, b


def _mix(u: tuple, h: list[int]) -> None:
    r = (11, 32, 43, 31, 17, 28, 39, 57, 55, 54, 22, 46)
    for i in range(_NUM_VARS):
        h[i] = (h[i] + u[i]) & _MASK
        h[(i + 2) % 12] ^= h[(i + 10) % 12]
        h[(i + 11) % 12] ^= h[i]
        h[i] = _rot(h[i], r[i])
        h[(i + 11) % 12] = (h[(i + 11) % 12] + h[(i + 1) % 12]) & _MASK


def _end_partial(h: list[int]) -> None:
    r = (44, 15, 34, 21, 38, 33, 10, 13, 38, 31, 9, 24)
    for i in range(_NUM_VARS):
        h[(i + 11) % 12] = (h[(i + 11) % 12] + h[(i + 1) % 12]) & _MASK
        h[(i + 2) % 12] ^= h[(i + 11) % 12]
        h[(i + 1) % 12] = _rot(h[(i + 1) % 12], r[i])


def _hash128(msg: bytes, seed1: int = 0, seed2: int = 0) -> tuple[int, int]:
    length = len(msg)
    if length < _BUF:
        return _short(msg, seed1, seed2)
    h = [0] * 12
    h[0] = h[3] = h[6] = h[9] = seed1 & _MASK
    h[1] = h[4] = h[7] = h[10] = seed2 & _MASK
    h[2] = h[5] = h[8] = h[11] = _SC_CONST
    n_blocks = length // _BLOCK
    pos = 0
    for _ in range(n_blocks):
        _mix(struct.unpack_from("<12Q", msg, pos), h)
        pos += _BLOCK
    remainder = length - pos
    buf = msg[pos:] + b"\x00" * (_BLOCK - remainder)
    buf = buf[: _BLOCK - 1] + bytes([remainder])
    u = struct.unpack("<12Q", buf)
    for i in range(_NUM_VARS):
        h[i] = (h[i] + u[i]) & _MASK
    _end_partial(h)
    _end_partial(h)
    _end_partial(h)
    return h[0], h[1]


def spooky_hash_v2_64(data: bytes) -> bytes:
    """64-bit SpookyV2 digest, big-endian bytes (Presto's varbinary layout)."""
    h0, _ = _hash128(bytes(data), 0, 0)
    return struct.pack(">Q", h0)


def spooky_hash_v2_32(data: bytes) -> bytes:
    """32-bit SpookyV2 digest (low word of hash64), big-endian bytes."""
    h0, _ = _hash128(bytes(data), 0, 0)
    return struct.pack(">I", h0 & 0xFFFFFFFF)
