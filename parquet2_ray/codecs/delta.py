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
    # wrapping i64 subtraction (parquet deltas are defined mod 2^64) —
    # direct int64 subtract wraps like C, no uint64 astype copies
    with np.errstate(over="ignore"):
        deltas = np.subtract(v[1:], v[:-1])

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
    with np.errstate(over="ignore"):
        adj = blocks - mins[:, None]       # int64 wrap == uint64 residual
    if pad:
        adj.reshape(-1)[nd:] = 0  # absent positions encode as zero bits
    minis = adj.view(np.uint64).reshape(nblocks * miniblocks, vpm)
    mx = minis.max(axis=1)
    # bit_length via frexp exponents: exact below 2^53; above, float
    # rounding can only round UP across a power of two (2^k is exactly
    # representable), so the width may overshoot by one bit — still a
    # valid encoding, never an under-allocation.  ~50× cheaper than the
    # exact unpackbits scan this replaces.
    bw_flat = np.minimum(np.frexp(mx.astype(np.float64))[1], 64).astype(np.uint8)
    bw = bw_flat.reshape(nblocks, miniblocks)

    sizes = bw_flat.astype(np.int64) * (vpm // 8)
    offs = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offs[1:])
    uniq_w = np.unique(bw_flat)
    if len(uniq_w) == 1:
        w = int(uniq_w[0])
        payload_all = (
            np.frombuffer(bitpack.pack(minis.reshape(-1), w), dtype=np.uint8)
            if w else np.empty(0, dtype=np.uint8))
    else:
        payload_all = np.zeros(int(offs[-1]), dtype=np.uint8)
        for w in uniq_w:
            if w == 0:
                continue
            sel = np.nonzero(bw_flat == w)[0]
            packed = np.frombuffer(
                bitpack.pack(minis[sel].reshape(-1), int(w)), dtype=np.uint8
            ).reshape(len(sel), vpm * int(w) // 8)
            idx = (offs[sel][:, None].astype(np.int64)
                   + np.arange(packed.shape[1], dtype=np.int64)[None, :])
            payload_all[idx.reshape(-1)] = packed.reshape(-1)

    # Stream assembly: per-block header bytes (zigzag-varint min_delta +
    # miniblock width list) are INSERTED into the contiguous payload in
    # one C pass (np.insert), instead of scattering the payload through
    # O(payload) int64 index arrays — this step was 3.1 s/4M values as a
    # scatter, ~0.05 s as an insert.
    hdr, hlen = _zz_uleb_many(mins)
    hb = hdr.shape[1]
    M = np.zeros((nblocks, hb + miniblocks), dtype=np.uint8)
    M[:, :hb] = hdr
    M[np.arange(nblocks)[:, None],
      hlen[:, None] + np.arange(miniblocks)[None, :]] = bw
    keep = np.arange(hb + miniblocks)[None, :] < (hlen + miniblocks)[:, None]
    header_values = M[keep]  # ragged extract, row order preserved
    psize = np.add.reduceat(sizes, np.arange(0, len(sizes), miniblocks))
    starts0 = np.zeros(nblocks, dtype=np.int64)
    np.cumsum(psize[:-1], out=starts0[1:])
    positions = np.repeat(starts0, hlen + miniblocks)
    body = np.insert(payload_all, positions, header_values)
    return bytes(out) + body.tobytes()


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
    vpm = values_per_mini
    # Phase 1 — sequential header walk (unavoidable: each block's varint
    # min_delta has data-dependent length), but only O(blocks) cheap
    # Python steps: record per-present-miniblock (slot, width, byte pos).
    mins: list[int] = []
    mini_slot: list[int] = []
    mini_w: list[int] = []
    mini_pos: list[int] = []
    filled = 0
    slot = 0
    required_end = 0
    while filled < n_deltas:
        min_delta, pos = zz_uleb_decode(buf, pos)
        widths = buf[pos : pos + miniblocks]
        pos += miniblocks
        mins.append(min_delta)
        for bw in widths:
            if filled >= n_deltas:
                break  # trailing miniblocks of the last block may be absent
            take = min(vpm, n_deltas - filled)
            if bw:
                mini_slot.append(slot)
                mini_w.append(bw)
                mini_pos.append(pos)
                # bytes that must exist: the VALID deltas of this mini
                # (a legitimately short final miniblock may omit its
                # padding bytes; anything less is corruption)
                required_end = pos + (bw * take + 7) // 8
                pos += (vpm * bw + 7) // 8
            filled += take
            slot += 1
    # Phase 2 — vectorized unpack, grouped by width (vpm % 8 == 0 ⇒
    # concatenated unpack == per-miniblock unpack, same trick as encode)
    n_slots = len(mins) * miniblocks
    dmat = np.zeros((n_slots, vpm), dtype=np.uint64)
    if required_end > len(buf):
        raise ValueError(
            f"delta payload truncated: need {required_end} bytes, "
            f"have {len(buf)}")
    if mini_w:
        src = np.frombuffer(buf, dtype=np.uint8)
        # zero-pad so a final short miniblock gathers zeros, not garbage
        pad_len = max(0, max(p + (vpm * w + 7) // 8
                             for p, w in zip(mini_pos, mini_w)) - len(src))
        if pad_len:
            src = np.concatenate([src, np.zeros(pad_len, dtype=np.uint8)])
        wa = np.asarray(mini_w)
        pa_ = np.asarray(mini_pos)
        sa = np.asarray(mini_slot)
        for w in np.unique(wa):
            selm = wa == w
            L = vpm * int(w) // 8
            idx = pa_[selm][:, None] + np.arange(L, dtype=np.int64)[None, :]
            packed = src[idx.reshape(-1)]
            vals = bitpack.unpack(packed.tobytes(), int(w),
                                  int(selm.sum()) * vpm)
            dmat[sa[selm]] = vals.reshape(-1, vpm)
    # add per-block min_delta (wrap mod 2^64) and prefix-sum
    bs_rows = dmat.reshape(len(mins), miniblocks * vpm)
    with np.errstate(over="ignore"):
        bs_rows += np.asarray(mins, dtype=np.int64).view(np.uint64)[:, None]
    out = np.empty(count, dtype=np.uint64)
    out[0] = np.uint64(first & ((1 << 64) - 1))
    out[1:] = bs_rows.reshape(-1)[:n_deltas]
    return np.cumsum(out, dtype=np.uint64).view(np.int64), pos - offset
