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

import math

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
    Word-level vectorization: values are processed in repeating groups of
    ``g = 8/gcd(w,8) ≤ 8`` lane positions whose bit offsets recur every
    ``lcm(w,8)`` bits, so the whole array packs with ≤ 8 × (w/8+2)
    full-column shift/OR ops — ~8× less memory traffic than the
    bit-matrix (unpackbits) formulation, which matters because encode is
    memory-bandwidth-bound at high task concurrency.
    """
    if not 0 <= num_bits <= 64:
        raise ValueError(f"num_bits must be in [0, 64], got {num_bits}")
    n = len(values)
    if n == 0 or num_bits == 0:
        return b""
    w = num_bits
    # smallest container ≥ w: every chunk op is a right-shift or a
    # low-byte mask, so high bits lost to container wraparound are never
    # needed — and a u32/u16 container halves/quarters memory traffic vs
    # u64 (encode is bandwidth-bound at high task concurrency)
    ct = _container(w)
    cw = ct.itemsize * 8
    v = np.asarray(values)
    if v.dtype != ct:
        v = v.astype(ct, copy=False)  # wraps = the truncation semantics
    if w % 8 == 0:
        # byte-multiple widths: the LSB-first stream IS the values'
        # little-endian low w/8 bytes back-to-back (g = 1, every lane
        # byte-aligned) — one memcpy instead of w/8 shift/OR passes.
        # The flagship tokens column (max id 50256) packs at exactly 16.
        nb = w // 8
        if nb == ct.itemsize:
            return np.ascontiguousarray(v).tobytes()
        return np.ascontiguousarray(v).view(np.uint8).reshape(
            n, ct.itemsize)[:, :nb].tobytes()
    if w < cw:
        v = v & ct.type((1 << w) - 1)  # truncate values wider than w
    g = 8 // math.gcd(w, 8)             # values per repeating group
    nbytes_group = g * w // 8           # whole bytes per group
    ngroups = -(-n // g)
    if ngroups * g != n:
        v = np.concatenate([v, np.zeros(ngroups * g - n, dtype=ct)])
    lanes = v.reshape(ngroups, g)
    out = np.zeros((ngroups, nbytes_group), dtype=np.uint8)
    ff = ct.type(0xFF)
    for j in range(g):
        bit0 = j * w
        b0, s = bit0 >> 3, bit0 & 7
        col = lanes[:, j]
        # value j contributes to bytes b0 .. b0 + ceil((s+w)/8) - 1
        nb = (s + w + 7) >> 3
        for i in range(nb):
            if i == 0:
                chunk = (col << ct.type(s)) & ff
            else:
                # 8i−s ≤ w−1 < cw for every byte a value touches
                chunk = (col >> ct.type(8 * i - s)) & ff
            out[:, b0 + i] |= chunk.astype(np.uint8)
    total = (n * w + 7) // 8
    return out.reshape(-1)[:total].tobytes()


def unpack(packed: bytes | np.ndarray, num_bits: int, length: int,
           dtype=None) -> np.ndarray:
    """Inverse of :func:`pack`; returns an array of ``length`` values.

    ``dtype``: output dtype (default uint64 for backward compatibility).
    Pass the container dtype (e.g. uint32 for num_bits ≤ 32) to skip the
    final widening copy — internally all lane ops already run in the
    smallest container ≥ num_bits.  At byte-multiple widths with
    ``bytes`` input and container dtype the result is a READ-ONLY
    zero-copy view of the input; copy before mutating.

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
    w = num_bits
    ct = _container(w)
    cw = ct.itemsize * 8
    if w % 8 == 0:
        # byte-multiple inverse of the pack fast path: values are their
        # own little-endian bytes — reinterpret (w == container width:
        # zero-copy frombuffer) or widen by byte-scatter (w = 24/40/...)
        nb = w // 8
        want = np.dtype(dtype) if dtype is not None else np.dtype(np.uint64)
        if nb == ct.itemsize:
            # zero-copy reinterpret, but ONLY off immutable bytes input
            # (the result is then read-only and cannot alias a caller's
            # reusable read buffer); bytearray/ndarray inputs copy so
            # the historical fresh-array contract holds for them.  An
            # unaligned slice can't view a wider dtype — copy there too.
            sl = buf[: length * nb]
            if isinstance(packed, bytes):
                try:
                    flat = sl.view(ct)
                except ValueError:  # misaligned slice can't widen
                    flat = sl.copy().view(ct)
            else:
                flat = sl.copy().view(ct)  # fresh + writable + aligned
        else:
            wide = np.zeros((length, ct.itemsize), dtype=np.uint8)
            wide[:, :nb] = buf[: length * nb].reshape(length, nb)
            flat = wide.view(ct).reshape(-1)
        return flat if flat.dtype == want else flat.astype(want)
    g = 8 // math.gcd(w, 8)
    nbytes_group = g * w // 8
    ngroups = -(-length // g)
    need = ngroups * nbytes_group
    if buf.size < need:
        buf = np.concatenate([buf, np.zeros(need - buf.size, dtype=np.uint8)])
    arr = buf[:need].reshape(ngroups, nbytes_group)
    out = np.empty((ngroups, g), dtype=ct)
    mask = ct.type((1 << w) - 1) if w < cw else ct.type(2**cw - 1)
    for j in range(g):
        bit0 = j * w
        b0, s = bit0 >> 3, bit0 & 7
        nb = (s + w + 7) >> 3
        # accumulate pre-shifted by s so no shift ever reaches cw; bits a
        # byte carries for NEIGHBOR values wrap out of the container or
        # are cleared by the mask
        acc = arr[:, b0].astype(ct) >> ct.type(s)
        for i in range(1, nb):
            acc |= arr[:, b0 + i].astype(ct) << ct.type(8 * i - s)
        out[:, j] = acc & mask
    flat = out.reshape(-1)[:length]
    want = np.dtype(dtype) if dtype is not None else np.dtype(np.uint64)
    return flat if flat.dtype == want else flat.astype(want)
