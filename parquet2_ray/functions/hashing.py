"""Vectorized hashing helpers for dedup / fingerprints.

- ``hash_strings``: 64-bit content hash per string (pandas' siphash-
  based ``hash_array`` — C speed, deterministic across processes).
- ``rolling_window_hashes``: polynomial hashes of every k-byte window
  of a concatenated utf8 buffer (the shingle hasher for MinHash).
- ``md5_hex``: per-row md5 hexdigest (matches DuckDB's ``md5``) — the
  document-fingerprint operator.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = ["hash_strings", "rolling_window_hashes", "window_hashes_at",
           "md5_hex", "shard_of", "MERSENNE_P"]

MERSENNE_P = (1 << 61) - 1
_BASE = np.uint64(1099511628211)


def hash_strings(values) -> np.ndarray:
    """uint64 hash per element of a string sequence (vectorized)."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


def md5_hex(values) -> list[str]:
    return [hashlib.md5(v.encode() if isinstance(v, str) else v).hexdigest() for v in values]


def rolling_window_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """Hash of every k-byte window of ``data`` (uint8), vectorized.

    Returns uint64 array of length ``len(data) - k + 1`` (empty if the
    buffer is shorter than k). Polynomial in a 64-bit wrap-around ring.
    """
    n = data.size
    if n < k:
        return np.empty(0, dtype=np.uint64)
    w = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    with np.errstate(over="ignore"):  # wrap mod 2^64 is the ring
        return w @ _powers(k)


def _powers(k: int) -> np.ndarray:
    powers = np.empty(k, dtype=np.uint64)
    powers[0] = 1
    with np.errstate(over="ignore"):
        for i in range(1, k):
            powers[i] = powers[i - 1] * _BASE
    return powers


def window_hashes_at(data: np.ndarray, pos: np.ndarray, k: int) -> np.ndarray:
    """Hash of the k-byte window starting at each position in ``pos``
    (same polynomial ring as ``rolling_window_hashes``), without
    computing every sliding window — k× less work when windows are
    sparse (e.g. non-overlapping tiles).  Positions must satisfy
    ``pos + k <= len(data)``."""
    if pos.size == 0:
        return np.empty(0, dtype=np.uint64)
    powers = _powers(k)
    out = np.empty(pos.size, dtype=np.uint64)
    # chunked: the k-wide uint64 gather is 8k bytes per window — one
    # bounded transient reused across chunks instead of an O(n·k) spike
    step = 1 << 16
    with np.errstate(over="ignore"):
        for lo in range(0, pos.size, step):
            p = pos[lo : lo + step]
            w = data[p[:, None] + np.arange(k)].astype(np.uint64)
            out[lo : lo + step] = w @ powers
    return out


def shard_of(keys: np.ndarray, nshards: int) -> np.ndarray:
    """Golden-ratio multiplicative shard hash for integer keys — THE
    shuffle hash for shard-grouped exchanges (joins, sessionization,
    LSH bucket pairing).  One definition so every operator that must
    co-locate the same key agrees on the shard."""
    h = np.asarray(keys).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(33)) % np.uint64(nshards)).astype(np.int64)
