"""ALP: adaptive lossless floating-point compression.

Two schemes, registered as separate codecs so the standard sample-price
selector (functions/selector.py) competes them against PLAIN and
BYTE_STREAM_SPLIT on every partition:

* ``alp`` (classic): most real-world doubles are decimals — a 2-digit
  price ``147.25`` is exactly ``14725 * 10^-2``.  Scale by a sampled
  power of ten, round to int64, verify each value reconstructs
  BIT-IDENTICALLY, and hand the integers to the existing PFOR cascade
  (codecs/pfor.py) — frame-of-reference + patching + recursion for
  free.  Values that don't survive the round trip (true reals, NaN,
  ±inf, -0.0, |scaled| ≥ 2^53) are stored raw as positioned exceptions,
  exactly the patching idea PFOR itself uses.

* ``alp_rd`` ("real doubles"): when classic fails (high-entropy
  mantissas — embeddings), the IEEE bit pattern still has a skewed
  LEFT part (sign + exponent + top mantissa bits span few distinct
  values) over an incompressible RIGHT part.  Cut at a sampled
  position, dictionary-code the left parts, bit-pack the right parts
  raw; left values outside the dictionary are positioned exceptions.

Both are from the public technique of Afroozeh & Boncz, "ALP: Adaptive
Lossless floating-Point Compression", SIGMOD 2023.  Not a reference
encoding: parquet2's only float paths are PLAIN
(src/encoding/plain_byte_array.rs is for binaries; floats ship as
native bytes) and the declared-but-unimplemented BYTE_STREAM_SPLIT —
this is the north-rule "lightweight compression" surface extended to
the float columns (prices, balances, embedding children) the reference
stores uncompressed.

Losslessness is enforced by construction: the encoder verifies every
value's reconstruction BITWISE (uint64/uint32 view compare, so -0.0
and NaN payloads can never silently change) and patches the rest.

Wire formats (integers ULEB128, reference uleb128.rs semantics)::

  alp:    u8 dtype(0=f64,1=f32)  zz_uleb(k)  uleb(n)  uleb(n_exc)
          uleb(len) <pfor of int64 digits>
          if n_exc: uleb(pw) pack(positions, pw) raw values (8/4 B each)
          # decode: value = digits * 10.0**-k  (same expr the encoder
          # verified, so reconstruction is deterministic-identical)

  alp_rd: u8 dtype  u8 right_width  uleb(n)  uleb(dict_len)  uleb(n_exc)
          dict entries (u16 little-endian left parts)
          pack(codes, bits_needed(dict_len-1))
          pack(right_parts, right_width)
          if n_exc: uleb(pw) pack(positions, pw) raw u16 left parts
"""

from __future__ import annotations

import numpy as np

from . import bitpack, pfor
from .uleb import uleb_decode, uleb_encode, zz_uleb_decode, zz_uleb_encode

__all__ = ["encode", "decode", "encode_rd", "decode_rd"]

# decimal-scale search range: 10^18 is the last power of ten below
# 2^63; negative k folds trailing zeros (4.5e6 -> 45 at k=-5)
_K_RANGE = range(-16, 19)
_SAMPLE = 4096
# |rounded| must stay below 2^53 or float64 can't represent the
# integer exactly and the verify-compare itself would be meaningless
_MAX_EXACT = float(1 << 53)


def _bits_of(v: np.ndarray) -> np.ndarray:
    """Bitwise view for exact comparison (f64->u64, f32->u32)."""
    return v.view(np.uint64 if v.dtype == np.float64 else np.uint32)


def _digits_and_ok(v64: np.ndarray, k: int, out_dtype) -> tuple[np.ndarray, np.ndarray]:
    """Scaled-int candidates + per-value exact-roundtrip mask.

    The reconstruction expression here — ``digits.astype(f64) *
    10.0**-k`` (cast to f32 for float columns) — is the LITERAL decode
    expression, so "ok" certifies the actual wire round trip.
    """
    with np.errstate(over="ignore", invalid="ignore"):
        scaled = v64 * (10.0 ** k)
        finite = np.isfinite(scaled)
        # rint, not round: same ties-to-even result for decimals=0 but
        # without round's scale/unscale detour (~40x faster), and any
        # disagreement would be caught by the bitwise verify anyway
        rounded = np.rint(scaled)
    ok = finite & (np.abs(rounded) < _MAX_EXACT)
    digits = np.where(ok, rounded, 0.0).astype(np.int64)
    recon = digits.astype(np.float64) * (10.0 ** -k)
    if out_dtype == np.float32:
        recon = recon.astype(np.float32)
    else:
        recon = recon  # already float64
    ok &= _bits_of(recon) == _bits_of(
        v64.astype(out_dtype, copy=False) if out_dtype == np.float32 else v64)
    return digits, ok


def _pick_k(v64: np.ndarray, out_dtype, itemsize: int) -> int:
    """Choose the decimal scale on a contiguous head+middle sample by
    exact cost accounting: packed width of the digit span plus the raw
    cost of every exception."""
    n = len(v64)
    if n > _SAMPLE:
        h = _SAMPLE // 2
        s = np.concatenate([v64[:h], v64[n // 2 : n // 2 + h]])
    else:
        s = v64
    best_k, best_cost = 0, float("inf")
    for k in _K_RANGE:
        digits, ok = _digits_and_ok(s, k, out_dtype)
        n_exc = int((~ok).sum())
        if n_exc == len(s):
            continue
        good = digits[ok]
        span = int(good.max()) - int(good.min())
        w = bitpack.bits_needed(span)
        cost = len(s) * w / 8 + n_exc * (itemsize + 2.5)
        if cost < best_cost:
            best_k, best_cost = k, cost
    return best_k


def encode(values: np.ndarray) -> bytes:
    """ALP classic: decimal-scale to int64, PFOR the digits, patch the
    rest.  Accepts float32/float64; raises TypeError otherwise."""
    if values.dtype == np.float64:
        dt_flag, out_dtype, itemsize = 0, np.float64, 8
        v64 = values
    elif values.dtype == np.float32:
        dt_flag, out_dtype, itemsize = 1, np.float32, 4
        v64 = values.astype(np.float64)
    else:
        raise TypeError(f"alp encodes float32/float64, got {values.dtype}")
    n = len(values)
    if n == 0:
        return bytes([dt_flag]) + zz_uleb_encode(0) + uleb_encode(0) + uleb_encode(0) + uleb_encode(0)
    k = _pick_k(v64, out_dtype, itemsize)
    digits, ok = _digits_and_ok(v64, k, out_dtype)
    exc_pos = np.flatnonzero(~ok)
    n_exc = len(exc_pos)
    if n_exc:
        # park exceptions on an in-range digit so they never widen the
        # PFOR frame (0 could sit far outside the real span)
        fill = digits[ok][0] if n_exc < n else np.int64(0)
        digits[exc_pos] = fill
    body = pfor.encode(digits)
    out = bytearray([dt_flag])
    out += zz_uleb_encode(k)
    out += uleb_encode(n)
    out += uleb_encode(n_exc)
    out += uleb_encode(len(body))
    out += body
    if n_exc:
        pw = bitpack.bits_needed(n - 1)
        out += uleb_encode(pw)
        out += bitpack.pack(exc_pos.astype(np.uint64), pw)
        out += values[exc_pos].tobytes()
    return bytes(out)


def decode(buf: bytes | memoryview) -> np.ndarray:
    buf = memoryview(buf)
    dt_flag = buf[0]
    out_dtype = np.float64 if dt_flag == 0 else np.float32
    itemsize = 8 if dt_flag == 0 else 4
    k, pos = zz_uleb_decode(buf, 1)
    n, pos = uleb_decode(buf, pos)
    n_exc, pos = uleb_decode(buf, pos)
    blen, pos = uleb_decode(buf, pos)
    if n == 0:
        return np.empty(0, dtype=out_dtype)
    digits = pfor.decode(buf[pos : pos + blen])
    pos += blen
    v = digits.astype(np.float64) * (10.0 ** -k)
    if dt_flag:
        v = v.astype(np.float32)
    if n_exc:
        pw, pos = uleb_decode(buf, pos)
        pb = (n_exc * pw + 7) // 8
        exc_pos = (bitpack.unpack(bytes(buf[pos : pos + pb]), pw, n_exc).astype(np.int64)
                   if pw else np.zeros(n_exc, dtype=np.int64))
        pos += pb
        raw = np.frombuffer(bytes(buf[pos : pos + n_exc * itemsize]), dtype=out_dtype)
        v[exc_pos] = raw
    return v


# --- ALP-RD -----------------------------------------------------------

# left part is at most 16 bits (fits a u16 dictionary entry); the cut
# search walks every legal split and prices it exactly on the sample
_RD_MAX_LEFT = 16
_RD_MAX_DICT = 1 << 10  # beyond this the dict itself stops paying


def _rd_plan(u: np.ndarray, total_bits: int) -> tuple[int, np.ndarray]:
    """Pick the right-part width on a sample: for each cut, cost =
    n*(right + code_width)/8 + dict + exceptions."""
    n = len(u)
    s = u if n <= _SAMPLE else np.concatenate(
        [u[: _SAMPLE // 2], u[n // 2 : n // 2 + _SAMPLE // 2]])
    best = None
    for left_w in range(1, _RD_MAX_LEFT + 1):
        r = total_bits - left_w
        left = (s >> np.uint64(r)).astype(np.uint64)
        uniq, counts = np.unique(left, return_counts=True)
        if len(uniq) > _RD_MAX_DICT:
            d_keep = _RD_MAX_DICT
        else:
            d_keep = len(uniq)
        # keep the most frequent lefts in the dict; the rest except
        order = np.argsort(counts)[::-1]
        n_exc = int(counts[order[d_keep:]].sum())
        dw = bitpack.bits_needed(max(d_keep - 1, 0))
        cost = len(s) * (r + dw) / 8 + d_keep * 2 + n_exc * 4.5
        if best is None or cost < best[0]:
            best = (cost, left_w)
    return best[1], s


def encode_rd(values: np.ndarray) -> bytes:
    """ALP-RD: cut the IEEE bit pattern, dictionary-code the skewed
    left parts, raw-pack the right parts."""
    if values.dtype == np.float64:
        dt_flag, total_bits, udt = 0, 64, np.uint64
    elif values.dtype == np.float32:
        dt_flag, total_bits, udt = 1, 32, np.uint32
    else:
        raise TypeError(f"alp_rd encodes float32/float64, got {values.dtype}")
    n = len(values)
    if n == 0:
        return bytes([dt_flag, 0]) + uleb_encode(0) + uleb_encode(0) + uleb_encode(0)
    u = values.view(udt).astype(np.uint64)
    left_w, _ = _rd_plan(u, total_bits)
    r = total_bits - left_w
    left = u >> np.uint64(r)
    right = u & np.uint64((1 << r) - 1)
    # left parts fit 16 bits: a direct 2^left_w LUT replaces the
    # sort-based unique+searchsorted dict match (O(n) gathers instead
    # of two O(n log n) sorts — measured ~2x on the encode wall)
    counts = np.bincount(left.astype(np.int64), minlength=1 << left_w)
    nz = np.flatnonzero(counts)
    order = nz[np.argsort(counts[nz])[::-1][:_RD_MAX_DICT]]
    dict_vals = order.astype(np.uint64)
    lut = np.zeros(1 << left_w, dtype=np.uint64)
    lut[order] = np.arange(len(order), dtype=np.uint64)
    in_dict = np.zeros(1 << left_w, dtype=bool)
    in_dict[order] = True
    left_i = left.astype(np.int64)
    # codes: index into dict_vals; missing -> exception (code 0 parked)
    codes = lut[left_i]
    hit = in_dict[left_i]
    exc_pos = np.flatnonzero(~hit)
    n_exc = len(exc_pos)
    dw = bitpack.bits_needed(max(len(dict_vals) - 1, 0))
    out = bytearray([dt_flag, r])
    out += uleb_encode(n)
    out += uleb_encode(len(dict_vals))
    out += uleb_encode(n_exc)
    out += dict_vals.astype("<u2").tobytes()
    out += bitpack.pack(codes, dw)
    out += bitpack.pack(right, r)
    if n_exc:
        pw = bitpack.bits_needed(n - 1)
        out += uleb_encode(pw)
        out += bitpack.pack(exc_pos.astype(np.uint64), pw)
        out += left[exc_pos].astype("<u2").tobytes()
    return bytes(out)


def decode_rd(buf: bytes | memoryview) -> np.ndarray:
    buf = memoryview(buf)
    dt_flag, r = buf[0], buf[1]
    udt = np.uint64 if dt_flag == 0 else np.uint32
    fdt = np.float64 if dt_flag == 0 else np.float32
    n, pos = uleb_decode(buf, 2)
    d, pos = uleb_decode(buf, pos)
    n_exc, pos = uleb_decode(buf, pos)
    if n == 0:
        return np.empty(0, dtype=fdt)
    dict_vals = np.frombuffer(bytes(buf[pos : pos + 2 * d]), dtype="<u2").astype(np.uint64)
    pos += 2 * d
    dw = bitpack.bits_needed(max(d - 1, 0))
    cb = (n * dw + 7) // 8
    codes = (bitpack.unpack(bytes(buf[pos : pos + cb]), dw, n)
             if dw else np.zeros(n, dtype=np.uint64))
    pos += cb
    rb = (n * r + 7) // 8
    right = bitpack.unpack(bytes(buf[pos : pos + rb]), r, n)
    pos += rb
    left = dict_vals[codes.astype(np.int64)] if d else np.zeros(n, dtype=np.uint64)
    if n_exc:
        pw, pos = uleb_decode(buf, pos)
        pb = (n_exc * pw + 7) // 8
        exc_pos = (bitpack.unpack(bytes(buf[pos : pos + pb]), pw, n_exc).astype(np.int64)
                   if pw else np.zeros(n_exc, dtype=np.int64))
        pos += pb
        exc_left = np.frombuffer(bytes(buf[pos : pos + 2 * n_exc]), dtype="<u2").astype(np.uint64)
        left[exc_pos] = exc_left
    u = (left << np.uint64(r)) | right
    return u.astype(udt).view(fdt)
