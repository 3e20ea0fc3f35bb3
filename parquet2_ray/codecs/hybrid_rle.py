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


def _uleb_blob(hv: np.ndarray) -> tuple[memoryview, np.ndarray]:
    """Vectorized ULEB128 of an array of header values (< 2^35 by the
    int32 row-count contract): returns (contiguous byte blob, per-value
    end offsets with a leading 0) — value i's bytes are
    ``blob[off[i]:off[i+1]]``.  One masked scatter per septet position
    replaces a Python ``uleb_encode`` call per header (~60 ms on the
    flagship tokens column's ~52k headers)."""
    nseg = hv.size
    hl = np.ones(nseg, np.int64)
    for k in range(1, 5):
        hl[hv >= (1 << (7 * k))] = k + 1
    off = np.zeros(nseg + 1, np.int64)
    np.cumsum(hl, out=off[1:])
    blob = np.empty(int(off[-1]), np.uint8)
    for k in range(5):
        m = hl > k
        if not m.any():
            break
        sep = ((hv[m] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        blob[off[:-1][m] + k] = sep | ((hl[m] - 1 > k).astype(np.uint8) << 7)
    return memoryview(blob.tobytes()), off


def _encode_many_runs(v: np.ndarray, n: int, num_bits: int,
                      rstarts: np.ndarray, rlens: np.ndarray) -> bytes:
    """Array path for run-heavy encodes (byte-identical to the segment
    loop).  Key fact making this branch-free: kept runs are ≥
    2*MIN_RLE_RUN = 16 values and the alignment steal is ≤ 7, so no
    run is ever dropped or partially consumed — the sequential
    ``pos``/drop logic of the generic loop degenerates to pure
    per-run arithmetic."""
    prev_end = np.empty_like(rstarts)
    prev_end[0] = 0
    np.add(rstarts[:-1], rlens[:-1], out=prev_end[1:])
    gap = rstarts - prev_end
    steal = (-gap) % 8
    bp_start = prev_end
    bp_len = gap + steal                 # multiple of 8 (may be 0)
    rle_len = rlens - steal              # ≥ 9 > MIN_RLE_RUN always
    pos_end = int(rstarts[-1] + rlens[-1])
    trail = n - pos_end

    # joint pack of every bit-packed span (all ×8-aligned except the
    # optional padded trail), in segment order
    pieces = [v[s: s + L] for s, L in
              zip(bp_start.tolist(), bp_len.tolist()) if L]
    if trail:
        pad = (-trail) % 8
        tr = v[pos_end:n]
        if pad:
            tr = np.concatenate([tr, np.zeros(pad, dtype=v.dtype)])
        pieces.append(tr)
    if not pieces:  # runs cover the whole column, no trail
        packed = b""
    else:
        packed = bitpack.pack(
            np.concatenate(pieces) if len(pieces) > 1 else pieces[0],
            num_bits)
    pmv = memoryview(packed)
    bp_bytes = ((bp_len >> 3) * num_bits).tolist()

    # headers, interleaved [bp_i, rle_i]* [trail] (unused bp slots for
    # zero-length spans are built but skipped at emission)
    k = rstarts.size
    nseg = 2 * k + (1 if trail else 0)
    hv = np.empty(nseg, np.uint64)
    hv[0: 2 * k: 2] = (((bp_len >> 3) << 1) | 1).astype(np.uint64)
    hv[1: 2 * k: 2] = (rle_len << 1).astype(np.uint64)
    if trail:
        hv[-1] = (_ceil8(trail) << 1) | 1
    hmv, hoff = _uleb_blob(hv)
    ho = hoff.tolist()

    # RLE value little-endian bytes, one row per run
    W = _ceil8(num_bits)
    vals = v[rstarts].astype(np.uint64)
    rmat = np.empty((k, W), np.uint8)
    for j in range(W):
        rmat[:, j] = ((vals >> np.uint64(8 * j)) & np.uint64(0xFF)
                      ).astype(np.uint8)
    rmv = memoryview(rmat.tobytes())

    out: list = []
    po = 0
    has_bp = (bp_len > 0).tolist()
    seg = 0
    for i in range(k):
        if has_bp[i]:
            out.append(hmv[ho[seg]: ho[seg + 1]])
            nb = bp_bytes[i]
            out.append(pmv[po: po + nb])
            po += nb
        seg += 1
        out.append(hmv[ho[seg]: ho[seg + 1]])
        out.append(rmv[i * W: (i + 1) * W])
        seg += 1
    if trail:
        out.append(hmv[ho[seg]: ho[seg + 1]])
        out.append(pmv[po:])
    return b"".join(out)


def encode(values: np.ndarray, num_bits: int) -> bytes:
    """Encode unsigned ints as hybrid RLE/bit-packed.

    Few-span inputs (the run-free common case: one span = the whole
    column) pack zero-copy views per span; run-heavy inputs (tens of
    thousands of alternating segments) pack ONE padded concatenation so
    the Python loop only assembles headers and slices — see the two
    branches at the pack site.
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
        # Repeats are sparse.  A profitable run (≥ 2*MIN_RLE_RUN = 16
        # values ⇒ ≥ 15 consecutive trues in ``eq``) must contain an
        # ALIGNED all-true 8-byte word of the bool mask (any 2k-1
        # consecutive positions cover an aligned k-block), so one
        # uint64-view compare finds candidate words without
        # enumerating repeat positions — the tokens column has ~1.3M
        # scattered repeats and zero profitable runs, and the old
        # flatnonzero(eq) built a 10 MB index list to discover that.
        ne = n - 1
        m = ne >> 3
        cand = np.flatnonzero(
            eq[: m * 8].view(np.uint64) == np.uint64(0x0101010101010101))
        if cand.size == 0:
            long_starts = np.empty(0, dtype=np.int64)
            long_lengths = long_starts
        elif cand.size > max(1024, n >> 6):
            # pathologically many short all-true words: fall back to
            # full repeat enumeration (same output, bounded temps)
            rep = np.flatnonzero(eq)
            brk = np.flatnonzero(rep[1:] != rep[:-1] + 1) + 1
            bstart = np.concatenate([[0], brk])
            bend = np.concatenate([brk, [rep.size]]) - 1
            long_starts = rep[bstart]
            long_lengths = rep[bend] - rep[bstart] + 2
            keep = long_lengths >= 2 * MIN_RLE_RUN
            long_starts, long_lengths = long_starts[keep], long_lengths[keep]
        else:
            # merge consecutive candidate words into one interval per
            # run (a run's interior words are all full, so distinct
            # intervals are distinct runs), then extend ≤7 positions
            # per side — a longer extension would mean another full
            # word adjacent to the interval, contradicting maximality.
            # Extension is vectorized: 7 masked probes per side over
            # the (small) interval arrays, not a Python loop per run.
            brk = np.flatnonzero(cand[1:] != cand[:-1] + 1) + 1
            ws = cand[np.concatenate([[0], brk])]
            we = cand[np.concatenate([brk, [cand.size]]) - 1]
            lo = ws * 8
            act = np.ones(lo.size, dtype=bool)
            for _ in range(7):
                idx = lo - 1
                act &= (idx >= 0)
                if not act.any():
                    break
                act[act] = eq[idx[act]]
                lo[act] -= 1
            hi = we * 8 + 8  # one past the last known-true eq index
            act = np.ones(hi.size, dtype=bool)
            for _ in range(7):
                act &= (hi < ne)
                if not act.any():
                    break
                act[act] = eq[hi[act]]
                hi[act] += 1
            long_starts = lo
            long_lengths = hi - lo + 1  # eq [lo, hi) ⇒ values [lo, hi+1)
            keep = long_lengths >= 2 * MIN_RLE_RUN
            if not keep.all():
                long_starts = long_starts[keep]
                long_lengths = long_lengths[keep]
    else:
        # change points are the sparse side (run-heavy data)
        change = np.flatnonzero(~eq) + 1
        run_starts = np.concatenate([[0], change])
        run_lengths = np.diff(np.concatenate([run_starts, [n]]))
        long_mask = run_lengths >= 2 * MIN_RLE_RUN
        long_starts = run_starts[long_mask]
        long_lengths = run_lengths[long_mask]

    if long_starts.size > 24:
        # run-heavy: the array path (byte-identical; kept runs are ≥16
        # values so the generic loop's drop/steal-consumption branches
        # are provably dead — see _encode_many_runs)
        return _encode_many_runs(v, n, num_bits,
                                 long_starts.astype(np.int64),
                                 long_lengths.astype(np.int64))

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

    # pack the bit-packed spans
    bp_spans = [
        (start, length) for is_rle, start, length in segs if not is_rle
    ]
    few = len(bp_spans) <= 8
    if few:
        # few (usually huge) spans — the run-free common case is ONE
        # span covering the whole column.  Pack the 8-aligned prefix
        # straight off a zero-copy view and only materialize an 8-value
        # padded tail: concatenating a zeros-pad onto a 12.5M-value
        # span copied ~50 MB per tokens column just to add ≤7 values.
        # The chunks flow into the single final join untouched — no
        # intermediate byte concatenation of the ~25 MB packed stream.
        span_chunks: list[list[bytes]] = []
        for start, length in bp_spans:
            aligned = length & ~7
            chunks = []
            if aligned:
                chunks.append(bitpack.pack(v[start : start + aligned],
                                           num_bits))
            if length > aligned:
                tail = np.zeros(8, dtype=v.dtype)
                tail[: length - aligned] = v[start + aligned : start + length]
                chunks.append(bitpack.pack(tail, num_bits))
            span_chunks.append(chunks)
    elif bp_spans:
        # many (short) spans — run-heavy data: one joint pack call over
        # the padded concatenation (a span padded to ×8 values occupies
        # exactly len/8*num_bits whole bytes, so byte-slicing the joint
        # stream reproduces per-span packing) instead of thousands of
        # tiny pack calls
        byte_offs = [0]
        pieces = []
        for start, length in bp_spans:
            span = v[start : start + length]
            pad = (-length) % 8
            if pad:
                span = np.concatenate([span, np.zeros(pad, dtype=span.dtype)])
            pieces.append(span)
            byte_offs.append(byte_offs[-1] + (len(span) // 8) * num_bits)
        mv = memoryview(bitpack.pack(np.concatenate(pieces), num_bits))

    nbytes_rle = _ceil8(num_bits)
    out: list[bytes] = []
    bp_i = 0
    for is_rle, start, length in segs:
        if is_rle:
            out.append(uleb_encode(length << 1))
            out.append(int(v[start]).to_bytes(nbytes_rle, "little"))
        else:
            out.append(uleb_encode((_ceil8(length) << 1) | 1))
            if few:
                out.extend(span_chunks[bp_i])
            else:
                out.append(mv[byte_offs[bp_i] : byte_offs[bp_i + 1]])
            bp_i += 1
    return b"".join(out)


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
