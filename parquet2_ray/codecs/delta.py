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

    # Vectorized across blocks: pad the tail with int64.max so it cannot
    # win the per-block min, compute all mins / adjusted values / miniblock
    # bitwidths with whole-array ops, then bit-pack every miniblock of a
    # given width in ONE pack() call (miniblock payloads are byte-aligned
    # because vpm % 8 == 0, so concatenated packing == per-mini packing).
    nd = len(deltas)
    nblocks = -(-nd // block_size)
    pad = nblocks * block_size - nd
    if pad:
        padded = np.concatenate(
            [deltas, np.full(pad, np.iinfo(np.int64).max, dtype=np.int64)]
        )
    else:
        padded = deltas
    blocks = padded.reshape(nblocks, block_size)
    mins = blocks.min(axis=1)
    adj = blocks.view(np.uint64) - mins.view(np.uint64)[:, None]
    if pad:
        adj.reshape(-1)[nd:] = 0  # absent positions encode as zero bits
    minis = adj.reshape(nblocks * miniblocks, vpm)
    mx = minis.max(axis=1)
    # exact bit_length per miniblock max (no float log2 rounding)
    mx_bits = np.unpackbits(
        mx.astype("<u8").view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )[:, ::-1]
    nonzero = mx_bits.any(axis=1)
    bw_flat = np.where(nonzero, 64 - np.argmax(mx_bits, axis=1), 0).astype(np.uint8)
    bw = bw_flat.reshape(nblocks, miniblocks)

    sizes = bw_flat.astype(np.int64) * (vpm // 8)
    offs = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offs[1:])
    payload_all = np.zeros(int(offs[-1]), dtype=np.uint8)
    for w in np.unique(bw_flat):
        if w == 0:
            continue
        sel = np.nonzero(bw_flat == w)[0]
        packed = np.frombuffer(
            bitpack.pack(minis[sel].reshape(-1), int(w)), dtype=np.uint8
        ).reshape(len(sel), vpm * int(w) // 8)
        idx = offs[sel][:, None] + np.arange(packed.shape[1])[None, :]
        payload_all[idx.ravel()] = packed.ravel()

    mv = memoryview(payload_all)
    pieces: list = [bytes(out)]
    widths_rows = bw.tobytes()
    for b in range(nblocks):
        pieces.append(zz_uleb_encode(int(mins[b])))
        pieces.append(widths_rows[b * miniblocks : (b + 1) * miniblocks])
        pieces.append(mv[offs[b * miniblocks] : offs[(b + 1) * miniblocks]])
    return b"".join(pieces)


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
