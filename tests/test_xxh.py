"""XXH64 bit-exactness: published vectors + scalar spec re-implementation.

The vectorized implementation (parquet2_ray/functions/xxh.py) must match
the public XXH64 algorithm bit-for-bit — that is what makes the bloom
sketches cross-engine interoperable (the reference binds upstream xxh64,
/root/reference/src/bloom_filter/hash.rs:8-17).
"""

import numpy as np
import pyarrow as pa
import pytest

from parquet2_ray.functions import bloom
from parquet2_ray.functions.xxh import xxh64, xxh64_bytes

_M = (1 << 64) - 1
_P1, _P2, _P3, _P4, _P5 = (
    11400714785074694791, 14029467366897019727, 1609587929392839161,
    9650029242287828579, 2870177450012600261,
)


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc, lane):
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def _ref_xxh64(data: bytes, seed: int = 0) -> int:
    """Scalar reference straight from the published algorithm."""
    n, i = len(data), 0
    if n >= 32:
        v = [(seed + _P1 + _P2) & _M, (seed + _P2) & _M, seed, (seed - _P1) & _M]
        while i + 32 <= n:
            for k in range(4):
                v[k] = _round(v[k], int.from_bytes(data[i + 8 * k : i + 8 * k + 8], "little"))
            i += 32
        acc = (_rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12) + _rotl(v[3], 18)) & _M
        for k in range(4):
            acc = ((acc ^ _round(0, v[k])) * _P1 + _P4) & _M
    else:
        acc = (seed + _P5) & _M
    acc = (acc + n) & _M
    while i + 8 <= n:
        acc = ((_rotl(acc ^ _round(0, int.from_bytes(data[i : i + 8], "little")), 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        acc = ((_rotl(acc ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & _M), 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        acc = (_rotl(acc ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    acc ^= acc >> 33
    acc = (acc * _P2) & _M
    acc ^= acc >> 29
    acc = (acc * _P3) & _M
    acc ^= acc >> 32
    return acc


def test_published_vectors():
    assert xxh64(b"") == 0xEF46DB3751D8E999
    # and the reference implementation agrees with itself on them
    assert _ref_xxh64(b"") == 0xEF46DB3751D8E999


def test_scalar_parity_all_length_classes():
    # every branch: <4, 4..7, 8..31, exactly 32, >32 with every tail kind
    cases = [b"", b"a", b"ab", b"abc", b"abcd", b"abcde", b"abcdefg",
             b"abcdefgh", b"0123456789abcdef", b"x" * 31, b"x" * 32,
             b"x" * 33, b"x" * 39, b"x" * 40, b"x" * 44, b"x" * 47,
             bytes(range(100)), bytes(range(256)) * 3]
    for c in cases:
        assert xxh64(c) == _ref_xxh64(c), c[:16]
    for seed in (1, 2**63, 12345678901234567890):
        assert xxh64(b"seeded input!", seed) == _ref_xxh64(b"seeded input!", seed)


def test_vectorized_random_rows():
    rng = np.random.default_rng(3)
    rows = [rng.integers(0, 256, int(l), dtype=np.uint8).tobytes()
            for l in rng.integers(0, 150, 300)]
    offs = np.concatenate([[0], np.cumsum([len(r) for r in rows])]).astype(np.int64)
    data = np.frombuffer(b"".join(rows), dtype=np.uint8)
    got = xxh64_bytes(offs, data)
    for i, r in enumerate(rows):
        assert int(got[i]) == _ref_xxh64(r), i


def test_bloom_canonical_plain_encoding():
    # int32-physical canonicalization: 4-byte LE plain encoding
    h32 = bloom.hash_arrow(pa.array([7, 1000], type=pa.int32()))
    assert int(h32[0]) == _ref_xxh64((7).to_bytes(4, "little"))
    # int64 → 8-byte LE
    h64 = bloom.hash_arrow(pa.array([7], type=pa.int64()))
    assert int(h64[0]) == _ref_xxh64((7).to_bytes(8, "little"))
    # small ints widen to parquet's int32 physical
    h8 = bloom.hash_arrow(pa.array([7], type=pa.int8()))
    assert int(h8[0]) == int(h32[0])
    # strings → raw utf8 bytes
    hs = bloom.hash_arrow(pa.array(["doc-1"]))
    assert int(hs[0]) == _ref_xxh64(b"doc-1")
    # probe-side hash_values with the recorded type matches the writer
    hv = bloom.hash_values([7], "int32")
    assert int(hv[0]) == int(h32[0])
    # nulls dropped
    assert bloom.hash_arrow(pa.array([None, "x"])).size == 1
