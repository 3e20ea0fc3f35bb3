"""Byte-array codecs: PLAIN, DELTA_LENGTH_BYTE_ARRAY, DELTA_BYTE_ARRAY.

All three operate on an Arrow-style (offsets:int64[n+1], data:uint8[*])
representation — variable-length binary without per-row Python objects.

- PLAIN: ``[u32 LE length][bytes]*`` per value
  (/root/reference/src/encoding/plain_byte_array.rs:8-46).
- DELTA_LENGTH: delta-binary-packed lengths, then the concatenated raw
  bytes (/root/reference/src/encoding/delta_length_byte_array/encoder.rs:7-19).
- DELTA (front coding): per-item shared-prefix length vs the previous
  item, prefix lengths delta-binary-packed, suffixes as DELTA_LENGTH
  (/root/reference/src/encoding/delta_byte_array/encoder.rs:6-33).

Encoding is vectorized (the shared-prefix scan uses a padded byte
matrix); DELTA decode has an inherent sequential dependency and is used
on the verify path only.
"""

from __future__ import annotations

import numpy as np

from . import delta

__all__ = [
    "plain_encode",
    "plain_decode",
    "delta_length_encode",
    "delta_length_decode",
    "delta_ba_encode",
    "delta_ba_decode",
]


def _as_offsets_data(offsets, data):
    o = np.asarray(offsets).astype(np.int64, copy=False)
    d = np.asarray(data, dtype=np.uint8)
    return o, d


def plain_encode(offsets: np.ndarray, data: np.ndarray) -> bytes:
    """[u32 length][bytes]* — vectorized scatter into one output buffer."""
    o, d = _as_offsets_data(offsets, data)
    n = len(o) - 1
    lens = np.diff(o)
    total = int(d.size + 4 * n)
    out = np.zeros(total, dtype=np.uint8)
    starts = o[:-1] + 4 * np.arange(n, dtype=np.int64)  # dest of each length prefix
    pref = lens.astype("<u4").view(np.uint8).reshape(n, 4)
    out[(starts[:, None] + np.arange(4)).ravel()] = pref.ravel()
    if d.size:
        rec = np.repeat(np.arange(n, dtype=np.int64), lens)
        out[np.arange(d.size, dtype=np.int64) + 4 * (rec + 1)] = d
    return out.tobytes()


def plain_decode(buf: bytes, num_values: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of plain_encode → (offsets, data).

    The length chain is inherently sequential (offset i+1 needs length
    i), but the loop is reduced to pure int arithmetic over a
    precomputed u32-at-every-byte array; the payload copy is one
    vectorized gather."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    total = raw.size
    if num_values == 0:
        return np.zeros(1, dtype=np.int64), np.empty(0, np.uint8)
    padded = np.zeros(total + 3, dtype=np.uint32)
    padded[:total] = raw
    u32_at = padded[:total] | (padded[1 : total + 1] << 8) | (
        padded[2 : total + 2] << 16
    ) | (padded[3 : total + 3] << 24)
    lens = np.empty(num_values, dtype=np.int64)
    starts = np.empty(num_values, dtype=np.int64)  # payload start per value
    get = u32_at.item  # scalar extraction without per-access allocation
    pos = 0
    for i in range(num_values):
        if pos + 4 > total:
            raise ValueError("plain byte-array length overflows buffer")
        ln = get(pos)
        starts[i] = pos + 4
        lens[i] = ln
        pos += 4 + ln
    if pos > total:
        raise ValueError("plain byte-array length overflows buffer")
    offsets = np.zeros(num_values + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    n_bytes = int(offsets[-1])
    if n_bytes == 0:
        return offsets, np.empty(0, np.uint8)
    src = np.repeat(starts - offsets[:-1], lens) + np.arange(n_bytes, dtype=np.int64)
    return offsets, raw[src]


def delta_length_encode(
    offsets: np.ndarray, data: np.ndarray, miniblocks: int = 1
) -> bytes:
    o, d = _as_offsets_data(offsets, data)
    return delta.encode(np.diff(o), miniblocks=miniblocks) + d.tobytes()


def delta_length_decode(buf: bytes, num_values: int) -> tuple[np.ndarray, np.ndarray]:
    lens, consumed = delta.decode(buf)
    if len(lens) != num_values:
        raise ValueError(f"expected {num_values} lengths, got {len(lens)}")
    offsets = np.zeros(num_values + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    data = np.frombuffer(buf, dtype=np.uint8, offset=consumed)
    if data.size < offsets[-1]:
        raise ValueError("delta-length data region truncated")
    return offsets, data[: offsets[-1]]


def _shared_prefix_lengths(offsets: np.ndarray, data: np.ndarray) -> np.ndarray:
    """prefix[i] = shared prefix length of item i with item i-1 (prefix[0]=0).

    Vectorized via two padded byte matrices with *different* pad fills so
    padding never compares equal; result clamped to min(len_i, len_{i-1}).
    """
    n = len(offsets) - 1
    lens = np.diff(offsets)
    if n <= 1 or data.size == 0:
        return np.zeros(n, dtype=np.int64)
    maxlen = int(lens.max())
    if maxlen == 0:
        return np.zeros(n, dtype=np.int64)
    cur = np.zeros((n, maxlen), dtype=np.uint8)
    rec = np.repeat(np.arange(n, dtype=np.int64), lens)
    col = np.arange(data.size, dtype=np.int64) - np.repeat(offsets[:-1], lens)
    cur[rec, col] = data
    prev = np.full((n, maxlen), 255, dtype=np.uint8)
    prev[rec, col] = data
    neq = cur[1:] != prev[:-1]
    first_mismatch = np.argmax(neq, axis=1)  # 0 when all-equal rows, clamped below
    all_eq = ~neq.any(axis=1)
    first_mismatch[all_eq] = maxlen
    prefix = np.zeros(n, dtype=np.int64)
    prefix[1:] = np.minimum(first_mismatch, np.minimum(lens[1:], lens[:-1]))
    return prefix


def delta_ba_encode(offsets: np.ndarray, data: np.ndarray) -> bytes:
    o, d = _as_offsets_data(offsets, data)
    n = len(o) - 1
    prefix = _shared_prefix_lengths(o, d)
    lens = np.diff(o)
    suf_lens = lens - prefix
    # gather suffix bytes: for each item, bytes [offset+prefix, offset+len)
    keep = np.ones(d.size, dtype=bool)
    if d.size:
        rec = np.repeat(np.arange(n, dtype=np.int64), lens)
        col = np.arange(d.size, dtype=np.int64) - np.repeat(o[:-1], lens)
        keep = col >= prefix[rec]
    suf_data = d[keep]
    suf_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(suf_lens, out=suf_offsets[1:])
    return delta.encode(prefix, miniblocks=4) + delta_length_encode(
        suf_offsets, suf_data, miniblocks=4
    )


def delta_ba_decode(buf: bytes, num_values: int) -> tuple[np.ndarray, np.ndarray]:
    prefix, consumed = delta.decode(buf)
    if len(prefix) != num_values:
        raise ValueError(f"expected {num_values} prefix lengths, got {len(prefix)}")
    suf_offsets, suf_data = delta_length_decode(buf[consumed:], num_values)
    suf = suf_data.tobytes()
    out_parts: list[bytes] = []
    previous = b""
    for i in range(num_values):
        s = previous[: prefix[i]] + suf[suf_offsets[i] : suf_offsets[i + 1]]
        out_parts.append(s)
        previous = s
    offsets = np.zeros(num_values + 1, dtype=np.int64)
    np.cumsum(prefix + np.diff(suf_offsets), out=offsets[1:])
    data = np.frombuffer(b"".join(out_parts), dtype=np.uint8) if out_parts else np.empty(0, np.uint8)
    return offsets, data
