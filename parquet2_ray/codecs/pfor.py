"""Patched frame-of-reference (PFOR) for integer arrays.

Plain FOR+bitpack (``for_pack.py``) pays the FULL width of the rarest
value for every value: a Zipf-distributed token stream whose 99% mass
sits below 2^6 still packs at 14-16 bits because a handful of rare ids
reach the vocab ceiling.  Patched coding (the PFOR idea of Zukowski,
Heman, Nes & Boncz, "Super-Scalar RAM-CPU Cache Compression", ICDE
2006 — public) splits the stream instead:

* every residual stores its LOW ``w`` bits in the main bitpacked lane,
* residuals that do not fit ``w`` bits ("exceptions") additionally
  store their HIGH bits out-of-line, addressed either by a validity-
  style bitmap or a bitpacked position list (whichever is smaller),
* the exception high-bits stream — itself skewed for Zipf inputs — is
  encoded RECURSIVELY with the same codec (depth-capped cascade),
  which is worth another ~1 bit/token on web-corpus shapes.

``w`` is chosen by exact cost minimization over the residual bit-width
histogram (one vectorized pass; widths come from the float64 exponent
field, no per-value log).  Everything is NumPy-vectorized: the hot ops
are one subtract, one AND, one compare, ``packbits``/``flatnonzero``
and the shared LSB-first ``bitpack`` kernels (SURVEY.md E1/E2).

Not a reference encoding: the reference's closest analogs are
bitpacked (src/encoding/bitpacked/encode.rs:11-36) and
DELTA_BINARY_PACKED's per-miniblock widths
(src/encoding/delta_bitpacked/encoder.rs:11-64); PFOR is the
north-rule "frame-of-reference + bit-packing" primitive extended to
skewed token-id distributions.

Wire format (all integers ULEB128, reference uleb128.rs semantics)::

    zz_uleb(ref) uleb(n) uleb(w) uleb(n_exc)
    pack(low_bits, w)                         # ceil8(n*w) bytes
    if n_exc:
        u8 posmode                            # 0 bitmap / 1 positions
        posmode==0: bitmap                    # ceil8(n) bytes, LSB-first
        posmode==1: uleb(pw) pack(idx, pw)    # ceil8(n_exc*pw) bytes
        uleb(len) <recursive pfor of high bits>
"""

from __future__ import annotations

import numpy as np

from . import bitpack
from .uleb import uleb_decode, uleb_encode, zz_uleb_decode, zz_uleb_encode

__all__ = ["encode", "decode"]

# cascade depth: measured on Zipf token streams, depth 2 is worth ~1
# bit/token over depth 1 and depth 3 another ~0.3; deeper levels shrink
# geometrically and stop paying for their headers
_MAX_DEPTH = 3
# below this many exceptions the recursive call's headers dominate —
# plain-pack the high bits instead (the recursion bottoms out here too)
_MIN_RECURSE = 64


def _residuals(v: np.ndarray) -> tuple[np.ndarray, int]:
    """(unsigned residuals v - min, ref) without widening when avoidable
    (same dtype discipline as for_pack.encode: int32 token arrays never
    touch an int64 temporary)."""
    ref = int(v.min())
    rng = int(v.max()) - ref
    if v.dtype.itemsize <= 4 and rng < 2**31:
        if np.issubdtype(v.dtype, np.signedinteger):
            r = (v - v.dtype.type(ref)).view(np.dtype(f"<u{v.dtype.itemsize}"))
        else:
            r = v - v.dtype.type(ref)
    else:
        r = (v.astype(np.int64) - ref).astype(np.uint64)
    return r, ref


def _width_hist(r: np.ndarray, maxw: int) -> np.ndarray:
    """cum[w] = how many residuals fit in w bits, for w in 0..maxw.

    Narrow residuals (the token-array case) take a single ``bincount``
    over the VALUES — one 2-byte-read pass — and read each cum[w] off
    the value histogram's cumsum at 2^w - 1.  Wide residuals fall back
    to per-value widths via the float64 exponent field, using
    width(x) = floor(log2(2x+1)) (exact, no zero-mask: 2x+1 ≥ 1 and
    never crosses the next power of two while x < 2^52; above that,
    float rounding can only inflate a width by 1, which merely makes
    the cost model conservative — classification itself uses exact
    integer compares)."""
    if maxw <= 22 and r.dtype.itemsize <= 4:
        cs = np.cumsum(np.bincount(r, minlength=1 << maxw), dtype=np.int64)
        return cs[(1 << np.arange(maxw + 1)) - 1]
    f = r.astype(np.float64) * 2.0 + 1.0
    widths = ((f.view(np.uint64) >> np.uint64(52)) & np.uint64(0x7FF)
              ).astype(np.int64) - 1023
    hist = np.bincount(widths, minlength=maxw + 1)
    return np.cumsum(hist)


def _pos_bits(n: int, n_exc: int) -> int:
    """Cheaper of bitmap / bitpacked-positions, in bits (+header byte)."""
    if n_exc == 0:
        return 0
    pw = bits_needed_pos(n)
    return 8 + min(_ceil8b(n), 16 + _ceil8b(n_exc * pw))


def bits_needed_pos(n: int) -> int:
    return bitpack.bits_needed(max(n - 1, 0))


def _ceil8b(bits: int) -> int:
    return ((bits + 7) // 8) * 8


def encode(values: np.ndarray, _depth: int = _MAX_DEPTH) -> bytes:
    v = np.asarray(values)
    n = len(v)
    if n == 0:
        return zz_uleb_encode(0) + uleb_encode(0) + uleb_encode(0) + uleb_encode(0)
    r, ref = _residuals(v)
    maxw = bitpack.bits_needed(int(r.max()))
    w, n_exc = maxw, 0
    if maxw > 1 and _depth > 0:
        # the width histogram only drives the CHOICE of w — a strided
        # sample is accurate enough (mis-choosing w by one costs <2%)
        # and caps the scan at 128k values; headers below use exact
        # counts computed after the choice
        rs = r[:: max(1, n >> 17)] if n > (1 << 18) else r
        cum = _width_hist(rs, maxw)
        ns = len(rs)
        # exact 1-level cost in bits; recursion gains only shrink the
        # high-bits term, so the greedy w is a near-optimal cascade w
        best = ns * maxw
        for cand in range(maxw):
            e = int(ns - cum[cand])
            cost = ns * cand + _pos_bits(ns, e) + e * (maxw - cand) + (64 if e else 0)
            if cost < best:
                best, w, n_exc = cost, cand, e
    exc_mask = None
    if w < maxw:
        lim = r.dtype.type(1) << r.dtype.type(w) if w else r.dtype.type(1)
        exc_mask = r >= lim if w else r != 0
        n_exc = int(np.count_nonzero(exc_mask))
        if n_exc == 0:
            exc_mask = None  # sample over-estimated: plain arm at w
    out = bytearray()
    out += zz_uleb_encode(ref)
    out += uleb_encode(n)
    out += uleb_encode(w)
    out += uleb_encode(n_exc if exc_mask is not None else 0)
    if exc_mask is None:
        out += bitpack.pack(r, w)
        return bytes(out)
    # low bits of EVERY value ride the main lane (pack truncates wide
    # values to their low w bits by contract)
    out += bitpack.pack(r, w)
    idx = np.flatnonzero(exc_mask)
    pw = bits_needed_pos(n)
    bitmap_bytes = (n + 7) // 8
    pos_bytes = (len(idx) * pw + 7) // 8
    if bitmap_bytes <= pos_bytes + 2:
        out += b"\x00"
        out += np.packbits(exc_mask, bitorder="little").tobytes()
    else:
        out += b"\x01"
        out += uleb_encode(pw)
        out += bitpack.pack(idx.astype(np.uint64), pw)
    high = r[idx] >> r.dtype.type(w)
    if _depth > 1 and n_exc >= _MIN_RECURSE:
        payload = encode(high, _depth - 1)
    else:
        payload = encode(high, 0)
    out += uleb_encode(len(payload))
    out += payload
    return bytes(out)


def decode(buf: bytes | memoryview) -> np.ndarray:
    ref, pos = zz_uleb_decode(buf, 0)
    n, pos = uleb_decode(buf, pos)
    w, pos = uleb_decode(buf, pos)
    n_exc, pos = uleb_decode(buf, pos)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if w == 0:
        main = np.zeros(n, dtype=np.uint64)
    else:
        nb = (n * w + 7) // 8
        # dtype=uint64 guarantees a fresh writable array on every width
        # the exception path can reach (w ≤ 63 ⇒ container < want)
        main = bitpack.unpack(buf[pos : pos + nb], w, n, dtype=np.uint64)
        pos += nb
    if n_exc:
        posmode = int(buf[pos])
        pos += 1
        if posmode == 0:
            nb = (n + 7) // 8
            bm = np.frombuffer(buf[pos : pos + nb], dtype=np.uint8)
            idx = np.flatnonzero(np.unpackbits(bm, count=n, bitorder="little"))
            pos += nb
        else:
            pw, pos = uleb_decode(buf, pos)
            nb = (n_exc * pw + 7) // 8
            idx = bitpack.unpack(buf[pos : pos + nb], pw, n_exc,
                                 dtype=np.int64)
            pos += nb
        hlen, pos = uleb_decode(buf, pos)
        high = decode(buf[pos : pos + hlen])
        main[idx] |= high.astype(np.uint64) << np.uint64(w)
    return main.view(np.int64) + ref
