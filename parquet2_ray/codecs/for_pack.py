"""Frame-of-reference + bit-packing for integer arrays.

Not a parquet encoding per se — it is the lightweight-compression
primitive the north rule asks for on the int32 token arrays: subtract
the frame minimum, bit-pack the residuals at
``ceil(log2(max - min + 1))`` bits. The bit layout reuses the
reference-compatible LSB-first packer (SURVEY.md E1/E2).

Wire format: zigzag_uleb(reference) uleb(num_bits) uleb(count) packed.
"""

from __future__ import annotations

import numpy as np

from . import bitpack
from .uleb import uleb_decode, uleb_encode, zz_uleb_decode, zz_uleb_encode

__all__ = ["encode", "decode"]


def encode(values: np.ndarray) -> bytes:
    v = np.asarray(values)
    n = len(v)
    if n == 0:
        return zz_uleb_encode(0) + uleb_encode(0) + uleb_encode(0)
    ref = int(v.min())
    rng = int(v.max()) - ref
    # stay in the input's (narrow) dtype when the residual range fits —
    # int32 token arrays never touch an int64 temporary this way
    if v.dtype.itemsize <= 4 and rng < 2**31:
        residual = (v - v.dtype.type(ref)).view(
            np.dtype(f"<u{v.dtype.itemsize}")
        ) if np.issubdtype(v.dtype, np.signedinteger) else (
            v - v.dtype.type(ref)
        )
    else:
        residual = (v.astype(np.int64) - ref).astype(np.uint64)
    num_bits = bitpack.bits_needed(rng)
    out = bytearray()
    out += zz_uleb_encode(ref)
    out += uleb_encode(num_bits)
    out += uleb_encode(n)
    out += bitpack.pack(residual, num_bits)
    return bytes(out)


def decode(buf: bytes) -> np.ndarray:
    ref, pos = zz_uleb_decode(buf, 0)
    num_bits, pos = uleb_decode(buf, pos)
    n, pos = uleb_decode(buf, pos)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if num_bits == 0:
        return np.full(n, ref, dtype=np.int64)
    residual = bitpack.unpack(buf[pos:], num_bits, n)
    return residual.view(np.int64) + ref
