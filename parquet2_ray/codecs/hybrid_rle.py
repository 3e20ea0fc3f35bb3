"""Parquet hybrid RLE / bit-packed encoding — BOTH arms.

Format (parquet spec; reference decoder at
/root/reference/src/encoding/hybrid_rle/decoder.rs:26-65):

- bit-packed run: uleb header ``(num_groups << 1) | 1`` followed by
  ``num_groups`` groups of 8 values packed LSB-first at ``num_bits``.
- RLE run: uleb header ``run_length << 1`` followed by the repeated
  value in ``ceil8(num_bits)`` little-endian bytes.

The reference *encoder* only ever emits the bit-packed arm
(/root/reference/src/encoding/hybrid_rle/encoder.rs:9-29); we implement
the RLE arm too because token streams have runs (SURVEY.md E3). Decoder
edge semantics mirrored from the reference tests
(/root/reference/src/encoding/hybrid_rle/mod.rs:238-263):
``num_bits == 0`` → all zeros; an empty or exhausted buffer → implicit
zeros for the remaining values.

Vectorization strategy: run boundaries are found with ``np.diff``; only
runs of at least ``MIN_RLE_RUN`` values become RLE runs, so the Python
loop iterates over *long runs* (≤ n / MIN_RLE_RUN of them), never over
values. Everything between long runs is emitted as a single bit-packed
run (bit-packed runs mid-stream must cover an exact multiple of 8
values, so we steal leading values from the following RLE run to pad —
they equal the run value, so semantics are unchanged).
"""

from __future__ import annotations

import numpy as np

from . import bitpack
from .uleb import uleb_decode, uleb_encode

__all__ = ["encode", "decode", "MIN_RLE_RUN"]

# A run must be at least this long (after alignment stealing) to be worth
# an RLE header; 8 is the parquet-writer convention.
MIN_RLE_RUN = 8


def _ceil8(v: int) -> int:
    # /root/reference/src/encoding/mod.rs:17-20
    return (v + 7) // 8


def _emit_bitpacked(out: bytearray, span: np.ndarray, num_bits: int) -> None:
    """Emit one bit-packed run covering len(span) values (padded to *8)."""
    n = len(span)
    if n == 0:
        return
    groups = _ceil8(n)
    out += uleb_encode((groups << 1) | 1)
    if n % 8:
        span = np.concatenate([span, np.zeros(groups * 8 - n, dtype=span.dtype)])
    out += bitpack.pack(span, num_bits)


def _emit_rle(out: bytearray, value: int, run_len: int, num_bits: int) -> None:
    out += uleb_encode(run_len << 1)
    nbytes = _ceil8(num_bits)
    out += int(value).to_bytes(nbytes, "little")


def encode(values: np.ndarray, num_bits: int) -> bytes:
    """Encode unsigned ints as hybrid RLE/bit-packed."""
    n = len(values)
    out = bytearray()
    if n == 0:
        return b""
    v = np.asarray(values).astype(np.uint64, copy=False)
    if num_bits == 0:
        # all values are zero by definition; decoder emits zeros for an
        # empty buffer (reference mod.rs:238-249)
        return b""
    # run segmentation
    change = np.flatnonzero(np.diff(v) != 0) + 1
    run_starts = np.concatenate([[0], change])
    run_lengths = np.diff(np.concatenate([run_starts, [n]]))
    long_mask = run_lengths >= 2 * MIN_RLE_RUN  # only clearly-profitable runs
    if not long_mask.any():
        _emit_bitpacked(out, v, num_bits)
        return bytes(out)
    pos = 0
    for start, length in zip(run_starts[long_mask], run_lengths[long_mask]):
        start, length = int(start), int(length)
        if start < pos:  # run partially consumed by previous alignment steal
            length -= pos - start
            start = pos
            if length < MIN_RLE_RUN:
                continue  # remainder joins the next bit-packed span
        gap = start - pos
        steal = (-gap) % 8  # pad the bit-packed span to a multiple of 8
        if length - steal < MIN_RLE_RUN:
            continue  # not worth RLE once aligned; fold into next span
        _emit_bitpacked(out, v[pos : start + steal], num_bits)
        _emit_rle(out, int(v[start]), length - steal, num_bits)
        pos = start + length
    if pos < n:
        _emit_bitpacked(out, v[pos:], num_bits)
    return bytes(out)


def decode(data: bytes | np.ndarray, num_bits: int, num_values: int) -> np.ndarray:
    """Decode hybrid RLE/bit-packed into a uint64 array of num_values."""
    if num_values == 0:
        return np.empty(0, dtype=np.uint64)
    if num_bits == 0:
        return np.zeros(num_values, dtype=np.uint64)
    buf = bytes(data) if not isinstance(data, bytes) else data
    out = np.zeros(num_values, dtype=np.uint64)  # implicit trailing zeros
    pos = 0
    filled = 0
    nbytes_rle = _ceil8(num_bits)
    size = len(buf)
    while filled < num_values and pos < size:
        header, pos = uleb_decode(buf, pos)
        if header & 1:  # bit-packed run
            groups = header >> 1
            total = groups * 8
            byte_len = _ceil8(total * num_bits)
            chunk = buf[pos : pos + byte_len]
            pos += byte_len
            take = min(total, num_values - filled)
            vals = bitpack.unpack(chunk, num_bits, take)
            out[filled : filled + take] = vals
            filled += take
        else:  # RLE run
            run_len = header >> 1
            value = int.from_bytes(buf[pos : pos + nbytes_rle], "little")
            pos += nbytes_rle
            take = min(run_len, num_values - filled)
            out[filled : filled + take] = value
            filled += take
    return out
