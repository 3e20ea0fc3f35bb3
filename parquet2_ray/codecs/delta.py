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

    # Fully vectorized stream assembly (a Python loop over blocks costs
    # more than the packing itself at 32k+ blocks): zigzag-varint all the
    # per-block min_deltas at once, compute every block's byte offset,
    # then scatter headers / width lists / payloads with whole-array ops.
    hdr, hlen = _zz_uleb_many(mins)
    psize = np.add.reduceat(sizes, np.arange(0, len(sizes), miniblocks))
    block_bytes = hlen + miniblocks + psize
    block_off = np.zeros(nblocks + 1, dtype=np.int64)
    np.cumsum(block_bytes, out=block_off[1:])
    head = bytes(out)
    buf = np.zeros(len(head) + int(block_off[-1]), dtype=np.uint8)
    buf[: len(head)] = np.frombuffer(head, dtype=np.uint8)
    base = len(head) + block_off[:-1]
    for i in range(hdr.shape[1]):          # ≤10 varint byte positions
        m = hlen > i
        if not m.any():
            break
        buf[base[m] + i] = hdr[m, i]
    wpos = base + hlen
    for m_i in range(miniblocks):
        buf[wpos + m_i] = bw[:, m_i]
    if len(payload_all):
        dst_start = wpos + miniblocks
        seg = psize
        starts0 = np.zeros(nblocks, dtype=np.int64)
        np.cumsum(seg, out=starts0)
        starts0 = np.concatenate([[0], starts0[:-1]])
        rep_start = np.repeat(dst_start, seg)
        rep_base = np.repeat(starts0, seg)
        dest = rep_start + (np.arange(len(payload_all)) - rep_base)
        buf[dest] = payload_all
    return buf.tobytes()


def _zz_uleb_many(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized zigzag + ULEB128 of an int64 array.

    Returns ``(byte_matrix (n,10), lengths (n,))`` — byte i carries the
    continuation bit iff more bytes follow (same wire bytes as
    :func:`..uleb.zz_uleb_encode`, reference zigzag semantics
    /root/reference/src/encoding/zigzag_leb128.rs:5-15)."""
    v = np.asarray(vals, dtype=np.int64)
    zz = ((v.astype(np.uint64) << np.uint64(1)) ^
          (v >> np.int64(63)).astype(np.uint64))
    n = len(v)
    out = np.zeros((n, 10), dtype=np.uint8)
    lens = np.ones(n, dtype=np.int64)
    cur = zz.copy()
    for i in range(10):
        out[:, i] = (cur & np.uint64(0x7F)).astype(np.uint8)
        cur >>= np.uint64(7)
        more = cur != 0
        if not more.any():
            break
        out[more, i] |= 0x80
        lens[more] = i + 2
    return out, lens


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
