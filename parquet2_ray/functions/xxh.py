"""Vectorized XXH64 (seed-0 default) — the parquet bloom-filter hash.

The parquet-format spec mandates xxHash64 over the PLAIN-encoded value
bytes as the SBBF element hash; the reference binds the upstream crate
(/root/reference/src/bloom_filter/hash.rs:8-17).  This environment has
no xxhash binding, so this is a from-scratch NumPy implementation of
the public XXH64 algorithm, vectorized over a whole column of
variable-length byte strings at once: rows are scattered into one
padded uint8 matrix and every step (32-byte stripes, 8/4/1-byte tail
lanes, avalanche) runs as masked array ops.  Cost is
O(rows × max_len / 8) vectorized passes — intended for key columns
(ids, categories), not document bodies.

Bit-exactness is asserted in tests against the algorithm's published
test vectors and a scalar re-implementation, making the persisted
bloom sketches interoperable with any engine that follows the spec.
"""

from __future__ import annotations

import numpy as np

__all__ = ["xxh64_bytes", "xxh64"]

_P1 = np.uint64(11400714785074694791)
_P2 = np.uint64(14029467366897019727)
_P3 = np.uint64(1609587929392839161)
_P4 = np.uint64(9650029242287828579)
_P5 = np.uint64(2870177450012600261)

_SHIFTS8 = (np.arange(8, dtype=np.uint64) * np.uint64(8))
_SHIFTS4 = (np.arange(4, dtype=np.uint64) * np.uint64(8))


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _round(acc: np.ndarray, lane: np.ndarray) -> np.ndarray:
    return _rotl(acc + lane * _P2, 31) * _P1


def _read_u64(padded: np.ndarray, rows: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Little-endian u64 gather at per-row byte offsets."""
    b = padded[rows[:, None], offs[:, None] + np.arange(8)].astype(np.uint64)
    return np.bitwise_or.reduce(b << _SHIFTS8, axis=1)


def xxh64_bytes(offsets: np.ndarray, data: np.ndarray, seed: int = 0) -> np.ndarray:
    """XXH64 of each row of a (offsets:int64[n+1], data:uint8) column.

    ``offsets`` must start at 0 and ``data`` be exactly the concatenated
    row bytes (the Arrow large_binary layout after slicing).
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    data = np.asarray(data, dtype=np.uint8)
    lens = np.diff(offsets)
    n = lens.size
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    with np.errstate(over="ignore"):
        seed_u = np.uint64(seed)
        maxlen = int(lens.max())
        pad_w = ((maxlen // 8) + 2) * 8  # any 8-byte gather stays in-bounds
        padded = np.zeros((n, pad_w), dtype=np.uint8)
        if data.size:
            rows = np.repeat(np.arange(n), lens)
            cols = np.arange(data.size, dtype=np.int64) - np.repeat(offsets[:-1], lens)
            padded[rows, cols] = data

        acc = np.full(n, seed_u + _P5, dtype=np.uint64)
        nstripes = np.where(lens >= 32, lens // 32, 0)
        big = np.nonzero(nstripes > 0)[0]
        if big.size:
            v1 = np.full(big.size, seed_u + _P1 + _P2, dtype=np.uint64)
            v2 = np.full(big.size, seed_u + _P2, dtype=np.uint64)
            v3 = np.full(big.size, seed_u, dtype=np.uint64)
            v4 = np.full(big.size, seed_u - _P1, dtype=np.uint64)
            ns = nstripes[big]
            for j in range(int(ns.max())):
                m = ns > j
                rid = big[m]
                base = np.full(rid.size, j * 32, dtype=np.int64)
                v1[m] = _round(v1[m], _read_u64(padded, rid, base))
                v2[m] = _round(v2[m], _read_u64(padded, rid, base + 8))
                v3[m] = _round(v3[m], _read_u64(padded, rid, base + 16))
                v4[m] = _round(v4[m], _read_u64(padded, rid, base + 24))
            a = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
            zero = np.zeros(big.size, dtype=np.uint64)
            for v in (v1, v2, v3, v4):
                a = (a ^ _round(zero, v)) * _P1 + _P4
            acc[big] = a

        acc += lens.astype(np.uint64)

        tail = nstripes * 32
        rem = lens - tail
        n8 = rem // 8
        for j in range(int(n8.max())):
            m = n8 > j
            rid = np.nonzero(m)[0]
            lane = _read_u64(padded, rid, tail[m] + 8 * j)
            k1 = _round(np.zeros(rid.size, dtype=np.uint64), lane)
            acc[m] = _rotl(acc[m] ^ k1, 27) * _P1 + _P4
        has4 = (rem - n8 * 8) >= 4
        if has4.any():
            rid = np.nonzero(has4)[0]
            off = tail[has4] + n8[has4] * 8
            b = padded[rid[:, None], off[:, None] + np.arange(4)].astype(np.uint64)
            lane32 = np.bitwise_or.reduce(b << _SHIFTS4, axis=1)
            acc[has4] = _rotl(acc[has4] ^ (lane32 * _P1), 23) * _P2 + _P3
        last = tail + n8 * 8 + np.where(has4, 4, 0)
        nlast = lens - last
        for j in range(int(nlast.max())):
            m = nlast > j
            rid = np.nonzero(m)[0]
            byte = padded[rid, last[m] + j].astype(np.uint64)
            acc[m] = _rotl(acc[m] ^ (byte * _P5), 11) * _P1

        acc ^= acc >> np.uint64(33)
        acc *= _P2
        acc ^= acc >> np.uint64(29)
        acc *= _P3
        acc ^= acc >> np.uint64(32)
    return acc


def xxh64(data: bytes, seed: int = 0) -> int:
    """Scalar convenience wrapper (same code path as the vector form)."""
    offs = np.array([0, len(data)], dtype=np.int64)
    return int(xxh64_bytes(offs, np.frombuffer(data, dtype=np.uint8), seed)[0])
