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
           "md5_hex", "shard_of", "MERSENNE_P",
           "column_hashes", "row_fingerprints"]

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


_NULL_SENTINEL = np.uint64(0x9E3779B97F4A7C15)
_FNV_PRIME = np.uint64(0x100000001B3)


def column_hashes(arr) -> np.ndarray:
    """Per-row uint64 content hash of one Arrow column, null-aware and
    list-aware (the per-column half of :func:`row_fingerprints`).

    Scalar types reuse the spec-canonical xxh64 forms of
    ``functions.bloom.hash_arrow`` (PLAIN byte layouts, so hashes are
    stable across processes and library versions); nulls take a fixed
    sentinel.  ``list<scalar>`` rows hash the byte-run of their
    elements' hashes (order-sensitive, variable length); structs mix
    their fields.  Unsupported shapes (nulls inside list values,
    nested lists) raise rather than mis-hash."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .bloom import hash_arrow
    from .xxh import xxh64_bytes

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    t = arr.type
    if arr.null_count:
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        out = np.full(n, _NULL_SENTINEL, dtype=np.uint64)
        if arr.null_count < n:
            out[valid] = column_hashes(arr.drop_null())
        return out
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        # flatten() yields exactly THIS array's elements (a sliced list
        # array's .values would be the whole child buffer)
        values = arr.flatten()
        if pa.types.is_list(values.type) or pa.types.is_large_list(values.type):
            raise TypeError("column_hashes: nested lists unsupported")
        if values.null_count:
            raise TypeError("column_hashes: nulls inside list values unsupported")
        eh = column_hashes(values)
        lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        return xxh64_bytes(offs * 8, eh.view(np.uint8))
    if pa.types.is_struct(t):
        out = np.full(n, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
        for f in t:
            out = (out * _FNV_PRIME) ^ column_hashes(arr.field(f.name))
        return out
    return hash_arrow(arr)


def row_fingerprints(tbl) -> np.ndarray:
    """uint64 content fingerprint per ROW of an Arrow table/batch —
    column-order-sensitive FNV-style mix of the per-column hashes.
    Deterministic across processes (pinned canonical byte forms), so
    two decodes of the same logical rows agree regardless of physical
    layout.  The row-level change-data-feed (P56) keys its unchanged-
    row cancellation on this."""
    h = np.full(tbl.num_rows, np.uint64(0x84222325CBF29CE4), dtype=np.uint64)
    for name in tbl.column_names:
        h = (h * _FNV_PRIME) ^ column_hashes(tbl[name])
    return h
