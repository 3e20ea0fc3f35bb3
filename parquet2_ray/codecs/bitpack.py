"""Bit-packing kernels (LSB-first), vectorized with NumPy.

Semantics follow the reference's bitpacked encoding
(/root/reference/src/encoding/bitpacked/encode.rs:11-36 and
decode.rs:9-86): values are packed little-endian, least-significant bit
first, into a continuous bit stream; values wider than ``num_bits`` are
truncated to their low ``num_bits`` bits; ``num_bits == 0`` encodes to an
empty buffer and decodes to zeros; decoding validates that the packed
buffer holds at least ``length * num_bits`` bits.

Unlike the reference's per-block (8/16/32/64 values) unrolled Rust
kernels, we vectorize over the whole array with a loop over *bit
positions* (≤ 64 iterations, each a full-array shift/mask) — the NumPy
idiom for the same layout.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pack", "unpack", "bits_needed"]


def bits_needed(max_value: int) -> int:
    """Minimum bit width to represent ``max_value`` (≥0). 0 → 0 bits."""
    if max_value < 0:
        raise ValueError("bits_needed requires a non-negative value")
    return int(max_value).bit_length()


def pack(values: np.ndarray, num_bits: int) -> bytes:
    """Pack unsigned integers into an LSB-first continuous bit stream.

    The output is padded with zero bits to a whole number of bytes.
    """
    if not 0 <= num_bits <= 64:
        raise ValueError(f"num_bits must be in [0, 64], got {num_bits}")
    n = len(values)
    if n == 0 or num_bits == 0:
        return b""
    v = np.asarray(values).astype(np.uint64, copy=False)
    if num_bits < 64:
        v = v & np.uint64((1 << num_bits) - 1)
    # bits[i, j] = bit j of value i (LSB-first)
    bits = np.empty((n, num_bits), dtype=np.uint8)
    for j in range(num_bits):
        bits[:, j] = (v >> np.uint64(j)) & np.uint64(1)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack(packed: bytes | np.ndarray, num_bits: int, length: int) -> np.ndarray:
    """Inverse of :func:`pack`; returns a uint64 array of ``length`` values.

    Error semantics mirror the reference decoder
    (/root/reference/src/encoding/bitpacked/decode.rs:22-40): an empty
    input with ``length == 0`` is fine; a buffer with fewer than
    ``length * num_bits`` bits or ``num_bits == 0`` with ``length > 0``
    is an error.
    """
    if not 0 < num_bits <= 64:
        if length == 0:
            return np.empty(0, dtype=np.uint64)
        raise ValueError(f"num_bits must be in [1, 64] to unpack, got {num_bits}")
    buf = np.frombuffer(packed, dtype=np.uint8) if isinstance(packed, (bytes, bytearray, memoryview)) else np.asarray(packed, dtype=np.uint8)
    if length == 0:
        return np.empty(0, dtype=np.uint64)
    if buf.size * 8 < length * num_bits:
        raise ValueError(
            f"packed buffer has {buf.size * 8} bits; need {length * num_bits}"
        )
    bits = np.unpackbits(buf, bitorder="little", count=length * num_bits)
    bits = bits.reshape(length, num_bits)
    out = np.zeros(length, dtype=np.uint64)
    for j in range(num_bits):
        out |= bits[:, j].astype(np.uint64) << np.uint64(j)
    return out
