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


def encode(values: np.ndarray, num_bits: int) -> bytes:
    """Encode unsigned ints as hybrid RLE/bit-packed.

    Run-heavy inputs (e.g. code-token streams) produce tens of thousands
    of alternating segments; every bit-packed span is therefore packed in
    ONE ``bitpack.pack`` call over the padded concatenation (a span
    padded to a multiple of 8 values occupies exactly len/8*num_bits
    whole bytes, so byte-slicing the joint stream reproduces per-span
    packing) and the Python loop only assembles headers and slices.
    """
    n = len(values)
    if n == 0:
        return b""
    v = np.asarray(values)
    if np.issubdtype(v.dtype, np.signedinteger):
        # values are non-negative by contract; same-width unsigned view
        # avoids an upcast copy (int32 token streams stay 4-byte)
        v = v.view(np.dtype(f"<u{v.dtype.itemsize}"))
    if num_bits == 0:
        # all values are zero by definition; decoder emits zeros for an
        # empty buffer (reference mod.rs:238-249)
        return b""
    # Run segmentation.  Only runs of >= 2*MIN_RLE_RUN matter, so we
    # enumerate the SPARSE side of the neighbor-equality mask instead of
    # always materializing every run boundary: token streams are nearly
    # run-free (measured 11.2M runs in a 12.5M-value partition), where
    # flatnonzero over change points built ~270 MB of int64 temps to
    # find zero long runs; level/padding columns are the mirror image.
    # A single count picks the cheap side.  (Direct neighbor compare,
    # not np.diff(v) != 0 — diff materializes a full-width temp where
    # the compare emits only the 1-byte bool mask.)
    eq = v[1:] == v[:-1]
    n_repeats = int(np.count_nonzero(eq))
    if n_repeats < 2 * MIN_RLE_RUN - 1:
        long_starts = np.empty(0, dtype=np.int64)
        long_lengths = long_starts
    elif n_repeats <= (n - 1) - n_repeats:
        # repeats are sparse: runs = maximal consecutive blocks in the
        # (small) repeat-position list; a block rep[i..j] of contiguous
        # indices means v[rep[i] .. rep[j]+1] are all equal
        rep = np.flatnonzero(eq)
        brk = np.flatnonzero(rep[1:] != rep[:-1] + 1) + 1
        bstart = np.concatenate([[0], brk])
        bend = np.concatenate([brk, [rep.size]]) - 1
        long_starts = rep[bstart]
        long_lengths = rep[bend] - rep[bstart] + 2
        keep = long_lengths >= 2 * MIN_RLE_RUN
        long_starts, long_lengths = long_starts[keep], long_lengths[keep]
    else:
        # change points are the sparse side (run-heavy data)
        change = np.flatnonzero(~eq) + 1
        run_starts = np.concatenate([[0], change])
        run_lengths = np.diff(np.concatenate([run_starts, [n]]))
        long_mask = run_lengths >= 2 * MIN_RLE_RUN
        long_starts = run_starts[long_mask]
        long_lengths = run_lengths[long_mask]

    # segments: (is_rle, start, length); bit-packed lengths padded to ×8
    segs: list[tuple[bool, int, int]] = []
    pos = 0
    if long_starts.size:
        for start, length in zip(long_starts, long_lengths):
            start, length = int(start), int(length)
            if start < pos:  # run partially consumed by alignment steal
                length -= pos - start
                start = pos
                if length < MIN_RLE_RUN:
                    continue  # remainder joins the next bit-packed span
            gap = start - pos
            steal = (-gap) % 8  # pad the bit-packed span to a multiple of 8
            if length - steal < MIN_RLE_RUN:
                continue  # not worth RLE once aligned; fold into next span
            if gap + steal:
                segs.append((False, pos, gap + steal))
            segs.append((True, start, length - steal))
            pos = start + length
    if pos < n:
        segs.append((False, pos, n - pos))

    # pack ALL bit-packed spans in one call
    bp_spans = [
        (start, length) for is_rle, start, length in segs if not is_rle
    ]
    packed = b""
    byte_offs = [0]
    if bp_spans:
        pieces = []
        for start, length in bp_spans:
            span = v[start : start + length]
            pad = (-length) % 8
            if pad:
                span = np.concatenate([span, np.zeros(pad, dtype=span.dtype)])
            pieces.append(span)
            byte_offs.append(byte_offs[-1] + (len(span) // 8) * num_bits)
        packed = bitpack.pack(
            pieces[0] if len(pieces) == 1 else np.concatenate(pieces), num_bits
        )

    out = bytearray()
    nbytes_rle = _ceil8(num_bits)
    bp_i = 0
    mv = memoryview(packed)
    for is_rle, start, length in segs:
        if is_rle:
            out += uleb_encode(length << 1)
            out += int(v[start]).to_bytes(nbytes_rle, "little")
        else:
            groups = _ceil8(length)
            out += uleb_encode((groups << 1) | 1)
            out += mv[byte_offs[bp_i] : byte_offs[bp_i + 1]]
            bp_i += 1
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
    # parse headers first, then unpack ALL bit-packed spans in one call
    # (each span is byte-aligned — groups*8 values × num_bits is a whole
    # number of bytes — so unpacking the joint stream is equivalent)
    bp_chunks: list[bytes] = []
    bp_meta: list[tuple[int, int, int]] = []  # (out_start, take, span_total)
    while filled < num_values and pos < size:
        header, pos = uleb_decode(buf, pos)
        if header & 1:  # bit-packed run
            groups = header >> 1
            total = groups * 8
            byte_len = _ceil8(total * num_bits)
            bp_chunks.append(buf[pos : pos + byte_len])
            pos += byte_len
            take = min(total, num_values - filled)
            bp_meta.append((filled, take, total))
            filled += take
        else:  # RLE run
            run_len = header >> 1
            value = int.from_bytes(buf[pos : pos + nbytes_rle], "little")
            pos += nbytes_rle
            take = min(run_len, num_values - filled)
            out[filled : filled + take] = value
            filled += take
    if bp_chunks:
        total_vals = sum(m[2] for m in bp_meta)
        vals = bitpack.unpack(
            bp_chunks[0] if len(bp_chunks) == 1 else b"".join(bp_chunks),
            num_bits, total_vals,
        )
        off = 0
        for start, take, span_total in bp_meta:
            out[start : start + take] = vals[off : off + take]
            off += span_total
    return out
