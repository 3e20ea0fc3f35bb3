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

__all__ = ["hash_strings", "rolling_window_hashes", "md5_hex", "MERSENNE_P"]

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
    powers = np.empty(k, dtype=np.uint64)
    powers[0] = 1
    with np.errstate(over="ignore"):  # wrap mod 2^64 is the ring
        for i in range(1, k):
            powers[i] = powers[i - 1] * _BASE
        return w @ powers
