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


def _container(num_bits: int) -> np.dtype:
    if num_bits <= 8:
        return np.dtype("<u1")
    if num_bits <= 16:
        return np.dtype("<u2")
    if num_bits <= 32:
        return np.dtype("<u4")
    return np.dtype("<u8")


def pack(values: np.ndarray, num_bits: int) -> bytes:
    """Pack unsigned integers into an LSB-first continuous bit stream.

    The output is padded with zero bits to a whole number of bytes.
    Fully vectorized: values are viewed as little-endian bytes, expanded
    to a bit matrix with one C call (np.unpackbits), the low ``num_bits``
    columns are kept (which IS the truncation of wider values), and the
    flattened bit stream re-packed with one C call (np.packbits).
    """
    if not 0 <= num_bits <= 64:
        raise ValueError(f"num_bits must be in [0, 64], got {num_bits}")
    n = len(values)
    if n == 0 or num_bits == 0:
        return b""
    ct = _container(num_bits)
    v = np.ascontiguousarray(np.asarray(values).astype(ct, copy=False))
    vb = v.view(np.uint8).reshape(n, ct.itemsize)
    bits = np.unpackbits(vb, axis=1, bitorder="little")
    return np.packbits(bits[:, :num_bits].ravel(), bitorder="little").tobytes()


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
    ct = _container(num_bits)
    width = ct.itemsize * 8
    if num_bits == width:
        full = bits
    else:
        full = np.zeros((length, width), dtype=np.uint8)
        full[:, :num_bits] = bits
    out = np.packbits(full, axis=1, bitorder="little").view(ct).ravel()
    return out.astype(np.uint64, copy=False)
