"""FSST-style symbol-table string compression, fully vectorized.

FSST (Boncz, Neumann, Leis — "FSST: Fast Random Access String
Compression", VLDB 2020) replaces frequent 1-8 byte substrings with
1-byte codes; code 255 is an escape prefix for one literal byte. The
reference (parquet2) does not implement FSST — the north rule adds it
for string columns (SURVEY.md E17). Reimplemented from the paper's
public description only.

Wire format (unchanged from round 1):

    uleb(n_symbols) [uleb(len) bytes]*   # symbol table
    uleb(payload_len) payload            # code stream

Vectorization strategy (the round-1 encoder was a per-byte Python loop
at ~0.15 MB/s — VERDICT.md "What's wrong" #1):

- *Match table*: symbols are packed little-endian into uint64 values
  grouped by length; for every input position one 8-byte window word is
  gathered from an overlapping u64 view, then probed per length against
  a PERFECT HASH table (multiply-shift, retried odd multiplier until
  collision-free at build time) — one gather + one compare per probe.
  Round 4 measured the previous ``searchsorted`` probes at ~60% of
  encode wall; the hash probe lifted the kernel 22 → 38 MB/s/core on
  the documents column, tokens bit-identical.
- *Parse*: greedy longest-match has a sequential dependency (the match
  at position i determines position i+1), but ANY parse whose symbol
  concatenation reproduces the input is a valid FSST stream. We force
  parse boundaries every ``CHUNK`` bytes and walk all chunks in
  lockstep: each Python-level step advances every active chunk by one
  token with whole-array gathers. Python iterations = max tokens in one
  chunk (~CHUNK/avg_len), independent of input size.
- *Decode*: which code bytes are escapes follows from runs of 0xFF —
  inside a run the escapes sit at alternating offsets, and the phase of
  each run is the running parity of previous run lengths (a cumsum).
  Everything else is repeat/cumsum gathers.
"""

from __future__ import annotations

import numpy as np

from .uleb import uleb_decode, uleb_encode

__all__ = ["train", "encode", "decode", "SymbolTable"]

ESCAPE = 0xFF
MAX_SYMBOLS = 255
MAX_SYMBOL_LEN = 8
CHUNK = 512  # forced parse boundary; bounds the lockstep step count

_SHIFTS = np.arange(8, dtype=np.uint64) * np.uint64(8)
_COL8 = np.arange(8, dtype=np.int64)[None, :]  # decode keep-mask columns
_LEN_MASKS = np.array(
    [0] + [(1 << (8 * L)) - 1 for L in range(1, 8)] + [np.iinfo(np.uint64).max],
    dtype=np.uint64,
)


def _pack_le(sym: bytes) -> int:
    """Little-endian packing of ≤8 bytes into an int (low byte first)."""
    return int.from_bytes(sym.ljust(8, b"\x00"), "little")


def _build_perfect_hash(vals: np.ndarray, codes: np.ndarray) -> tuple:
    """Collision-free multiply-shift hash table for ≤255 uint64 keys.

    Deterministic (fixed seed): retries odd multipliers, escalating the
    table size, until every key lands in its own slot — ≤255 keys in
    ≥2× slots succeeds within a few tries in practice.  Empty slots are
    filled with vals[0], a REAL key: a probe that lands on an empty
    slot can then never false-match, because any window equal to that
    key hashes to the key's own (occupied) slot, not the empty one —
    so ``slot_vals[h(w)] == w`` is exact with no sentinel compare.

    Two cost rules (training rebuilds these tables every iteration, so
    build time showed up at ~12% of partition-encode wall):

    - keys below 2^16 (all 1- and 2-byte symbols packed LE) take an
      IDENTITY table — ``mult = 1 << (64-bits)`` makes ``h(v) = v``,
      collision-free by construction, zero retries;
    - otherwise the initial table is birthday-sized (``≥ n²`` slots,
      ~e^(-1/2) no-collision odds per try) instead of 2n, where the
      collision probability is ≈1 and the old loop burned dozens of
      failed multipliers escalating one bit at a time (measured 7.2 ms
      → <0.5 ms per 255-key build)."""
    n = max(int(vals.size), 1)
    if vals.size and int(vals.max()) < (1 << 16):
        bits = 8 if int(vals.max()) < (1 << 8) else 16
        shift = np.uint64(64 - bits)
        mult = np.uint64(1) << shift
        h = vals.astype(np.int64)
        slot_vals = np.full(1 << bits, vals[0], dtype=np.uint64)
        slot_codes = np.full(1 << bits, codes[0], dtype=np.uint8)
        slot_vals[h] = vals
        slot_codes[h] = codes
        return mult, shift, slot_vals, slot_codes
    # birthday-sized start, clamped so the escalation loop always runs
    # (symbol tables cap at 255 keys/length → bits ≤ 16 in practice)
    bits = min(max(int(np.ceil(2 * np.log2(n))) if n > 1 else 2, 2), 20)
    rng = np.random.RandomState(0x5F5F)
    while bits <= 20:
        size = 1 << bits
        shift = np.uint64(64 - bits)
        for _ in range(64):
            mult = np.uint64(int(rng.randint(1, 1 << 62)) * 2 + 1)
            h = ((vals * mult) >> shift).astype(np.int64)
            if np.unique(h).size == vals.size:
                slot_vals = np.full(size, vals[0], dtype=np.uint64)
                slot_codes = np.full(size, codes[0], dtype=np.uint8)
                slot_vals[h] = vals
                slot_codes[h] = codes
                return mult, shift, slot_vals, slot_codes
        bits += 1
    raise RuntimeError("no perfect hash found")  # unreachable for ≤255 keys


class SymbolTable:
    """Immutable trained symbol table with vectorized match tables."""

    def __init__(self, symbols: list[bytes]):
        if len(symbols) > MAX_SYMBOLS:
            raise ValueError("too many symbols")
        self.symbols = symbols
        # decode table: 256×8 byte matrix + per-code lengths
        self.sym_matrix = np.zeros((256, MAX_SYMBOL_LEN), dtype=np.uint8)
        self.sym_lens = np.ones(256, dtype=np.int64)  # escape/unused rows: 1
        for i, s in enumerate(symbols):
            b = np.frombuffer(s, dtype=np.uint8)
            self.sym_matrix[i, : len(s)] = b
            self.sym_lens[i] = len(s)
        # encode tables: per length L, sorted packed values + their codes
        self._by_len_vals: list[np.ndarray] = []
        self._by_len_codes: list[np.ndarray] = []
        for L in range(MAX_SYMBOL_LEN + 1):
            vals = [(_pack_le(s), i) for i, s in enumerate(symbols) if len(s) == L]
            vals.sort()
            self._by_len_vals.append(np.array([v for v, _ in vals], dtype=np.uint64))
            self._by_len_codes.append(np.array([c for _, c in vals], dtype=np.uint8))
        # perfect-hash probe tables: (mult, shift, slot_vals, slot_codes)
        # per length — one multiply-shift gather + one compare replaces
        # the binary search on every tokenizer probe
        self._ph: dict[int, tuple] = {}
        for L in range(1, MAX_SYMBOL_LEN + 1):
            if self._by_len_vals[L].size:
                self._ph[L] = _build_perfect_hash(
                    self._by_len_vals[L], self._by_len_codes[L])

    def serialize(self) -> bytes:
        out = bytearray(uleb_encode(len(self.symbols)))
        for s in self.symbols:
            out += uleb_encode(len(s))
            out += s
        return bytes(out)

    @classmethod
    def deserialize(cls, buf: bytes, pos: int = 0) -> tuple["SymbolTable", int]:
        n, pos = uleb_decode(buf, pos)
        symbols = []
        for _ in range(n):
            ln, pos = uleb_decode(buf, pos)
            symbols.append(bytes(buf[pos : pos + ln]))
            pos += ln
        return cls(symbols), pos


# Below this size the pointer-doubling strategy wins: the frontier
# walk's numpy-dispatch count (~tokens-per-chunk iterations × ~30 calls)
# dwarfs its tiny per-lane arrays.  Above it, probing ONLY the walk's
# visited positions beats the doubling path's probe-every-byte phase 1
# (~3× the searchsorted volume).  Both emit bit-identical token streams
# (equality-tested against a scalar greedy reference and each other).
_DOUBLING_MAX = 120 << 10


def _tokenize(
    table: SymbolTable, d: np.ndarray, chunk: int = CHUNK
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse ``d`` into tokens; returns (code, is_escape, literal) per
    token in stream order. Escape tokens emit (0xFF, literal).

    Matches may not cross a chunk boundary or the end of the buffer, so
    the concatenated per-chunk token streams decode to exactly ``d``.
    Greedy longest-match at every step; two equivalent vectorized
    strategies, picked by buffer size (see ``_DOUBLING_MAX``).
    """
    n = d.size
    empty = np.empty(0, dtype=np.uint8)
    if n == 0:
        return empty, np.empty(0, dtype=bool), empty
    if n <= _DOUBLING_MAX:
        return _tokenize_doubling(table, d, chunk)
    return _tokenize_walk(table, d, chunk)


def _tokenize_walk(
    table: SymbolTable, d: np.ndarray, chunk: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Lockstep frontier walk: one lane per chunk; each iteration
    advances every still-active lane by one token.  Matches are probed
    lazily at the positions the walk actually visits (~n / avg_symbol_len
    of them), never at every byte — the cheaper strategy for big
    buffers, where probe volume dominates dispatch count."""
    n = d.size
    padded = np.zeros(n + 8, dtype=np.uint8)
    padded[:n] = d
    # overlapping little-endian u64 view: the window word at position p
    # becomes ONE gather (vs 8 shifted byte gathers)
    win64 = np.ndarray(buffer=padded.data, dtype="<u8",
                       shape=(n,), strides=(1,))
    lengths_desc = sorted(table._ph, reverse=True)

    n_chunks = (n + chunk - 1) // chunk
    pos = np.arange(n_chunks, dtype=np.int64) * chunk
    ends = np.minimum(pos + chunk, n)
    active = np.arange(n_chunks, dtype=np.int64)
    rows_parts: list[np.ndarray] = []
    code_parts: list[np.ndarray] = []
    esc_parts: list[np.ndarray] = []
    lit_parts: list[np.ndarray] = []
    while active.size:
        p = pos[active]
        w = win64[p]
        room = ends[active] - p  # bytes left before the parse boundary
        L_here = np.zeros(p.size, dtype=np.int64)
        code_here = np.full(p.size, ESCAPE, dtype=np.uint8)
        for L in lengths_desc:  # first (longest) hit wins
            cand = np.flatnonzero((L_here == 0) & (room >= L))
            if cand.size == 0:
                continue
            mult, shift, slot_vals, slot_codes = table._ph[L]
            wL = w[cand] & _LEN_MASKS[L]
            # no errstate: uint64 ARRAY multiplies wrap silently (only
            # numpy scalars warn on overflow), and this is the hot loop
            h = ((wL * mult) >> shift).astype(np.int64)
            hit = slot_vals[h] == wL
            if hit.any():
                hit_pos = cand[hit]
                L_here[hit_pos] = L
                code_here[hit_pos] = slot_codes[h[hit]]
        esc = L_here == 0
        rows_parts.append(active)
        code_parts.append(code_here)
        esc_parts.append(esc)
        lit_parts.append(d[p])
        pos[active] = p + np.maximum(L_here, 1)
        active = active[pos[active] < ends[active]]
    # (step, chunk) → (chunk, step) stream order WITHOUT a sort: the
    # active set only ever shrinks, so the token appended for chunk c
    # at iteration k is exactly c's k-th token — its destination is
    # start-of-chunk-c + k, a direct O(tokens) scatter (the stable
    # argsort this replaces was ~40% of encode wall)
    rows = np.concatenate(rows_parts)
    counts = np.bincount(rows, minlength=n_chunks)
    starts = np.zeros(n_chunks + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    dest = np.concatenate([starts[a] + k for k, a in enumerate(rows_parts)])
    code = np.empty(rows.size, dtype=np.uint8)
    esc = np.empty(rows.size, dtype=bool)
    lit = np.empty(rows.size, dtype=np.uint8)
    code[dest] = np.concatenate(code_parts)
    esc[dest] = np.concatenate(esc_parts)
    lit[dest] = np.concatenate(lit_parts)
    return code, esc, lit


def _tokenize_doubling(
    table: SymbolTable, d: np.ndarray, chunk: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Small-buffer strategy, two vectorized phases:

    1. longest-match PRECOMPUTE at every byte position — the length
       cascade runs ONCE over the whole buffer (8 shrinking passes),
       not once per walk step;
    2. parse-chain extraction by pointer doubling: ``next[i] = i +
       len(i)``; marking reachable-from-chunk-start doubles the known
       prefix of every chunk's chain each round, so ``log2(chunk)``
       rounds replace ~tokens-per-chunk frontier steps.  Ascending
       visited positions ARE stream order."""
    n = d.size
    padded = np.zeros(n + 8, dtype=np.uint8)
    padded[:n] = d
    win64 = np.ndarray(buffer=padded.data, dtype="<u8",
                       shape=(n,), strides=(1,))
    idx = np.arange(n, dtype=np.int64)
    # bytes until the next parse boundary (chunk edge or buffer end)
    room = np.minimum(chunk - (idx % chunk), n - idx)

    # phase 1 — longest match at EVERY position (cascade, longest first)
    L = np.zeros(n, dtype=np.int64)
    code = np.full(n, ESCAPE, dtype=np.uint8)
    unmatched = np.ones(n, dtype=bool)
    for Lq in sorted(table._ph, reverse=True):
        cand = np.flatnonzero(unmatched & (room >= Lq))
        if not cand.size:
            continue
        mult, shift, slot_vals, slot_codes = table._ph[Lq]
        wL = win64[cand] & _LEN_MASKS[Lq]
        at = ((wL * mult) >> shift).astype(np.int64)  # array op: silent wrap
        hit = slot_vals[at] == wL
        if hit.any():
            hp = cand[hit]
            L[hp] = Lq
            code[hp] = slot_codes[at[hit]]
            unmatched[hp] = False

    # phase 2 — mark the greedy parse chain of every chunk
    jump = np.empty(n + 1, dtype=np.int64)
    np.minimum(idx + np.maximum(L, 1), n, out=jump[:n])
    jump[n] = n  # fixpoint sentinel
    visited = np.zeros(n + 1, dtype=bool)
    visited[0:n:chunk] = True  # chunk starts
    seen = int(visited.sum())
    while True:
        vi = np.flatnonzero(visited[:n])
        visited[jump[vi]] = True
        visited[n] = False
        now = int(visited.sum())
        if now == seen:  # every chain fully marked
            break
        seen = now
        jump[:n] = jump[jump[:n]]  # path doubling
    tok = np.flatnonzero(visited[:n])
    return code[tok], L[tok] == 0, d[tok]


def _encode_payload(table: SymbolTable, d: np.ndarray, chunk: int = CHUNK) -> np.ndarray:
    code, esc, lit = _tokenize(table, d, chunk)
    nbytes = 1 + esc.astype(np.int64)
    starts = np.zeros(code.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=starts[1:])
    out = np.empty(starts[-1], dtype=np.uint8)
    out[starts[:-1]] = code
    out[starts[:-1][esc] + 1] = lit[esc]
    return out


def encode(table: SymbolTable, data: bytes) -> bytes:
    """Encode a byte buffer: table + uleb(len) + code stream."""
    d = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    payload = _encode_payload(table, d)
    out = bytearray(table.serialize())
    out += uleb_encode(payload.size)
    out += payload.tobytes()
    return bytes(out)


def decode(buf: bytes) -> bytes:
    table, pos = SymbolTable.deserialize(buf, 0)
    n, pos = uleb_decode(buf, pos)
    codes = np.frombuffer(buf, dtype=np.uint8, count=n, offset=pos)
    if n == 0:
        return b""
    # --- classify positions: escape marker / literal / symbol code ----
    is_ff = codes == ESCAPE
    is_escape = np.zeros(n, dtype=bool)
    if is_ff.any():
        # runs of consecutive 0xFF bytes
        padded = np.concatenate([[False], is_ff, [False]])
        d = np.diff(padded.astype(np.int8))
        run_starts = np.flatnonzero(d == 1)
        run_ends = np.flatnonzero(d == -1)
        run_lens = run_ends - run_starts
        # a maximal 0xFF run always begins at a token start (a literal's
        # escape byte sits immediately before it, i.e. inside the run),
        # so escapes sit at offsets 0, 2, 4, … of every run; an odd run
        # makes the following non-FF byte a literal (handled below).
        n_esc = (run_lens + 1) // 2
        tok = np.repeat(np.arange(run_lens.size), n_esc)
        local = (
            np.arange(int(n_esc.sum()), dtype=np.int64)
            - np.repeat(np.concatenate([[0], np.cumsum(n_esc)])[:-1], n_esc)
        )
        esc_pos = run_starts[tok] + 2 * local
        is_escape[esc_pos] = True
    is_literal = np.zeros(n, dtype=bool)
    esc_idx = np.flatnonzero(is_escape)
    is_literal[np.minimum(esc_idx + 1, n - 1)] = True  # well-formed streams never truncate
    # --- emit: literals (1 byte) + symbol codes (sym_lens bytes) -------
    # Per token, gather its full 8-byte symbol row, then keep the first
    # ``len`` bytes via one boolean compress (C-order = stream order).
    # This is 3 passes over ntok×8 uint8 — no O(output) int64 repeat/
    # arange index machinery (the old emit was ~5× slower on the same
    # stream and pathological on this VM's first-touch page faults).
    tok_pos = np.flatnonzero(~is_escape)
    tok_codes = codes[tok_pos]
    tok_lit = is_literal[tok_pos]
    lens = np.where(tok_lit, 1, table.sym_lens[tok_codes])
    tok8 = table.sym_matrix[tok_codes]              # (ntok, 8)
    if tok_lit.any():
        tok8[tok_lit, 0] = tok_codes[tok_lit]       # literal byte, len 1
    mask = _COL8 < lens[:, None]                    # (ntok, 8) keep-mask
    return tok8[mask].tobytes()


# ------------------------------------------------------------------ training


def _count_pairs(
    vals: np.ndarray, lens: np.ndarray, same_chunk: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Merged (val, len, count) of adjacent token pairs ≤ 8 bytes."""
    if vals.size < 2:
        e = np.empty(0, dtype=np.uint64)
        return e, np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    mlen = lens[:-1] + lens[1:]
    ok = (mlen <= MAX_SYMBOL_LEN) & same_chunk
    mval = vals[:-1] | (vals[1:] << (np.uint64(8) * lens[:-1].astype(np.uint64)))
    mval, mlen = mval[ok], mlen[ok]
    order = np.lexsort((mlen, mval))
    mval, mlen = mval[order], mlen[order]
    bound = np.flatnonzero((np.diff(mval) != 0) | (np.diff(mlen) != 0)) + 1
    starts = np.concatenate([[0], bound])
    counts = np.diff(np.concatenate([starts, [mval.size]]))
    return mval[starts], mlen[starts], counts


def train(sample: bytes, iterations: int = 3, chunk: int = 64) -> SymbolTable:
    """Train a symbol table on a sample buffer (deterministic).

    BPE-style: start from single-byte frequencies, then repeatedly
    tokenize the sample with the current table, count adjacent-pair
    merges, and keep the MAX_SYMBOLS highest-gain symbols
    (gain = bytes saved vs escaped literals).

    ``chunk=64`` (vs the encode-path 512): training samples are small,
    so a tighter parse boundary gives the lockstep walk ~8× more
    parallel rows and ~4× fewer Python iterations at an unchanged
    (measured marginally better) compression ratio."""
    d = np.frombuffer(sample, dtype=np.uint8) if not isinstance(sample, np.ndarray) else sample
    if d.size == 0:
        return SymbolTable([])
    counts = np.bincount(d, minlength=256)
    order = np.lexsort((np.arange(256), -counts))
    order = order[counts[order] > 0][:MAX_SYMBOLS]
    table = SymbolTable([bytes([b]) for b in order])
    for _ in range(iterations):
        code, esc, lit = _tokenize(table, d, chunk)
        tok_vals = np.where(esc, lit.astype(np.uint64), 0)
        tok_lens = np.ones(code.size, dtype=np.int64)
        if not esc.all():
            ne = ~esc
            tok_vals[ne] = _pack_symbol_vals(table)[code[ne]]
            tok_lens[ne] = table.sym_lens[code[ne]]
        # chunk of each token: cumsum of lengths → byte position → chunk id
        tok_ends = np.cumsum(tok_lens)
        tok_chunk = (tok_ends - 1) // chunk
        same_chunk = tok_chunk[:-1] == tok_chunk[1:]
        pv, pl, pc = _count_pairs(tok_vals, tok_lens, same_chunk)
        # single-token counts
        so = np.lexsort((tok_lens, tok_vals))
        sv, sl = tok_vals[so], tok_lens[so]
        sb = np.flatnonzero((np.diff(sv) != 0) | (np.diff(sl) != 0)) + 1
        ss = np.concatenate([[0], sb])
        sc = np.diff(np.concatenate([ss, [sv.size]]))
        sv, sl = sv[ss], sl[ss]
        # gains: singles save len·count vs escapes; merges save (len−1)·count
        g_vals = np.concatenate([sv, pv])
        g_lens = np.concatenate([sl, pl])
        g_gain = np.concatenate([sl * sc, (pl - 1) * pc])
        # aggregate duplicates (a pair may equal an existing single)
        order = np.lexsort((g_lens, g_vals))
        g_vals, g_lens, g_gain = g_vals[order], g_lens[order], g_gain[order]
        bound = np.flatnonzero((np.diff(g_vals) != 0) | (np.diff(g_lens) != 0)) + 1
        starts = np.concatenate([[0], bound])
        gain = np.add.reduceat(g_gain, starts)
        g_vals, g_lens = g_vals[starts], g_lens[starts]
        # deterministic top-MAX_SYMBOLS: (-gain, len, val)
        top = np.lexsort((g_vals, g_lens, -gain))[:MAX_SYMBOLS]
        symbols = [
            int(g_vals[i]).to_bytes(8, "little")[: g_lens[i]] for i in top
        ]
        table = SymbolTable(symbols)
    return table


def _pack_symbol_vals(table: SymbolTable) -> np.ndarray:
    vals = np.zeros(256, dtype=np.uint64)
    for i, s in enumerate(table.symbols):
        vals[i] = _pack_le(s)
    return vals
