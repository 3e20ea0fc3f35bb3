"""ULEB128 and zigzag varint helpers.

Mirrors /root/reference/src/encoding/uleb128.rs:3-46 (unsigned LEB128,
≤10 bytes for u64) and /root/reference/src/encoding/zigzag_leb128.rs:5-15
(zigzag mapping ``(v << 1) ^ (v >> 63)``). These are tiny header helpers
used by the hybrid-RLE and delta-binary-packed codecs; counts are small
so plain-Python loops are fine here.
"""

from __future__ import annotations

__all__ = [
    "uleb_encode",
    "uleb_decode",
    "zigzag_encode",
    "zigzag_decode",
    "zz_uleb_encode",
    "zz_uleb_decode",
]

_U64_MASK = (1 << 64) - 1


def uleb_encode(value: int) -> bytes:
    if value < 0:
        raise ValueError("uleb_encode requires a non-negative value")
    out = bytearray()
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def uleb_decode(buf, offset: int = 0) -> tuple[int, int]:
    """Return (value, next_offset)."""
    result = 0
    shift = 0
    while True:
        byte = buf[offset]
        offset += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result, offset
        shift += 7
        if shift > 70:
            raise ValueError("uleb128 varint too long")


def zigzag_encode(v: int) -> int:
    """Map a signed 64-bit int to unsigned: 0,-1,1,-2,… → 0,1,2,3,…"""
    return ((v << 1) ^ (v >> 63)) & _U64_MASK if v < 0 else (v << 1) & _U64_MASK


def zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def zz_uleb_encode(v: int) -> bytes:
    return uleb_encode(zigzag_encode(v))


def zz_uleb_decode(buf, offset: int = 0) -> tuple[int, int]:
    u, offset = uleb_decode(buf, offset)
    return zigzag_decode(u), offset
