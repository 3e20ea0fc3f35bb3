"""DELTA_BINARY_PACKED codec for signed 64-bit integers.

Wire format matches the reference encoder
(/root/reference/src/encoding/delta_bitpacked/encoder.rs:11-78):

    header  = uleb(block_size=128) uleb(miniblocks_per_block=1)
              uleb(total_count) zigzag_uleb(first_value)
    block   = zigzag_uleb(min_delta) [bitwidth u8 × miniblocks]
              bitpacked(deltas - min_delta, bitwidth)   # 128 values/block

The reference golden vector (1..=5 → [128,1,1,5,2,2,0]) is covered in
tests. Decode (/root/reference/src/encoding/delta_bitpacked/decoder.rs)
is vectorized here as: parse blocks → unpack → single np.cumsum.

``decode`` returns ``(values, consumed_bytes)`` so byte-array codecs can
locate the data region that follows the lengths — the same contract as
the reference decoder's ``consumed_bytes``
(/root/reference/src/encoding/delta_bitpacked/decoder.rs:125-244).
"""

from __future__ import annotations

import numpy as np

from . import bitpack
from .uleb import uleb_decode, uleb_encode, zz_uleb_decode, zz_uleb_encode

__all__ = ["encode", "decode"]

BLOCK_SIZE = 128
MINIBLOCKS = 1


def encode(
    values: np.ndarray, block_size: int = BLOCK_SIZE, miniblocks: int = MINIBLOCKS
) -> bytes:
    """Encode an int array (any int dtype) as DELTA_BINARY_PACKED.

    Defaults (128-value blocks, 1 miniblock) match the reference encoder;
    ``miniblocks=4`` gives pyarrow-style 32-value bitwidth adaptation —
    the column layer uses that for tighter output. Both layouts are read
    by :func:`decode`.
    """
    v = np.asarray(values).astype(np.int64, copy=False)
    vpm = block_size // miniblocks
    n = len(v)
    out = bytearray()
    out += uleb_encode(block_size)
    out += uleb_encode(miniblocks)
    out += uleb_encode(n)
    if n == 0:
        out += zz_uleb_encode(0)
        return bytes(out)
    out += zz_uleb_encode(int(v[0]))
    if n == 1:
        return bytes(out)
    # wrapping i64 subtraction (parquet deltas are defined mod 2^64)
    with np.errstate(over="ignore"):
        deltas = v[1:].astype(np.uint64) - v[:-1].astype(np.uint64)
    deltas = deltas.view(np.int64)
    for off in range(0, len(deltas), block_size):
        block = deltas[off : off + block_size]
        min_delta = int(block.min())
        adjusted = block.astype(np.uint64) - np.uint64(min_delta & ((1 << 64) - 1))
        out += zz_uleb_encode(min_delta)
        # bitwidth list always has `miniblocks` entries (zeros for empty
        # trailing miniblocks); only their payload bytes are omitted
        widths = bytearray(miniblocks)
        payloads = []
        for m in range(min(miniblocks, -(-len(block) // vpm))):
            mb = adjusted[m * vpm : (m + 1) * vpm]
            bw = bitpack.bits_needed(int(mb.max())) if mb.size else 0
            widths[m] = bw
            if bw:
                if len(mb) < vpm:
                    mb = np.concatenate([mb, np.zeros(vpm - len(mb), dtype=np.uint64)])
                payloads.append(bitpack.pack(mb, bw))
        out += widths
        for p in payloads:
            out += p
    return bytes(out)


def decode(buf: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    """Decode DELTA_BINARY_PACKED → (int64 array, bytes consumed)."""
    block_size, pos = uleb_decode(buf, offset)
    miniblocks, pos = uleb_decode(buf, pos)
    if miniblocks == 0 or block_size % (8 * miniblocks):
        raise ValueError("invalid delta-binary-packed header")
    values_per_mini = block_size // miniblocks
    count, pos = uleb_decode(buf, pos)
    first, pos = zz_uleb_decode(buf, pos)
    if count == 0:
        return np.empty(0, dtype=np.int64), pos - offset
    if count == 1:
        return np.array([first], dtype=np.int64), pos - offset
    n_deltas = count - 1
    deltas = np.empty(n_deltas, dtype=np.uint64)
    filled = 0
    while filled < n_deltas:
        min_delta, pos = zz_uleb_decode(buf, pos)
        widths = bytearray(buf[pos : pos + miniblocks])
        pos += miniblocks
        for bw in widths:
            if filled >= n_deltas:
                break  # trailing miniblocks of the last block may be absent
            take = min(values_per_mini, n_deltas - filled)
            if bw == 0:
                vals = np.zeros(take, dtype=np.uint64)
            else:
                nbytes = (values_per_mini * bw + 7) // 8
                vals = bitpack.unpack(buf[pos : pos + nbytes], bw, take)
                pos += nbytes
            deltas[filled : filled + take] = vals + np.uint64(
                min_delta & ((1 << 64) - 1)
            )
            filled += take
    out = np.empty(count, dtype=np.uint64)
    out[0] = np.uint64(first & ((1 << 64) - 1))
    out[1:] = deltas
    return np.cumsum(out, dtype=np.uint64).view(np.int64), pos - offset
