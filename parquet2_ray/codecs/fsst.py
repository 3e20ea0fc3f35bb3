"""FSST-style symbol-table string compression (simplified).

FSST (Boncz, Neumann, Leis — "FSST: Fast Random Access String
Compression", VLDB 2020) replaces frequent 1-8 byte substrings with
1-byte codes; code 255 is an escape prefix for literal bytes. The
reference (parquet2) does not implement FSST — the north rule adds it
for string columns (SURVEY.md E17).

This is a simplified, deterministic reimplementation of the published
idea, built from the paper's public description only:

- ``train`` runs BPE-style iterations on a sample: encode the sample
  with the current table, count adjacent symbol-pair frequencies, keep
  the 255 highest-gain symbols (gain = (len-1) × freq), repeat.
- ``encode`` greedily matches the longest symbol at each position
  (symbols indexed by their first byte).
- Escape: 0xFF followed by the literal byte.

Wire format:

    uleb(n_symbols) [uleb(len) bytes]*   # symbol table
    uleb(payload_len) payload            # code stream

The encoder walks the byte stream in Python — acceptable because the
auto-selector only picks FSST when a sampled gain estimate beats the
vectorized alternatives, and string columns are small next to the token
payload. The symbol table is trained once per partition / actor
(SURVEY.md ST5), never per batch.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from .uleb import uleb_decode, uleb_encode

__all__ = ["train", "encode", "decode", "SymbolTable"]

ESCAPE = 0xFF
MAX_SYMBOLS = 255
MAX_SYMBOL_LEN = 8


class SymbolTable:
    """Immutable trained symbol table with a first-byte index."""

    def __init__(self, symbols: list[bytes]):
        if len(symbols) > MAX_SYMBOLS:
            raise ValueError("too many symbols")
        self.symbols = symbols
        self.code_of = {s: i for i, s in enumerate(symbols)}
        # first byte → symbols sorted by length desc (greedy longest match)
        self.by_first: dict[int, list[tuple[bytes, int]]] = {}
        for s, i in self.code_of.items():
            self.by_first.setdefault(s[0], []).append((s, i))
        for lst in self.by_first.values():
            lst.sort(key=lambda t: -len(t[0]))

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


def _encode_with(table: SymbolTable, data: bytes) -> bytearray:
    out = bytearray()
    by_first = table.by_first
    pos = 0
    n = len(data)
    while pos < n:
        cands = by_first.get(data[pos])
        if cands:
            for sym, code in cands:
                if data.startswith(sym, pos):
                    out.append(code)
                    pos += len(sym)
                    break
            else:
                out.append(ESCAPE)
                out.append(data[pos])
                pos += 1
        else:
            out.append(ESCAPE)
            out.append(data[pos])
            pos += 1
    return out


def train(sample: bytes, iterations: int = 3) -> SymbolTable:
    """Train a symbol table on a sample buffer (deterministic)."""
    if not sample:
        return SymbolTable([])
    # iteration 0: single bytes by frequency
    counts = Counter(sample)
    symbols = [bytes([b]) for b, _ in counts.most_common(MAX_SYMBOLS)]
    table = SymbolTable(symbols)
    for _ in range(iterations):
        codes = _encode_with(table, sample)
        # decode stream into symbol sequence to count adjacent pairs
        seq: list[bytes] = []
        i = 0
        while i < len(codes):
            c = codes[i]
            if c == ESCAPE:
                seq.append(bytes([codes[i + 1]]))
                i += 2
            else:
                seq.append(table.symbols[c])
                i += 1
        pair_counts: Counter[bytes] = Counter()
        for a, b in zip(seq, seq[1:]):
            merged = a + b
            if len(merged) <= MAX_SYMBOL_LEN:
                pair_counts[merged] += 1
        single_counts = Counter(seq)
        gains: Counter[bytes] = Counter()
        for s, c in single_counts.items():
            gains[s] += (len(s) - 1) * c + c  # saving vs escaped literals
        for s, c in pair_counts.items():
            gains[s] += (len(s) - 1) * c
        # deterministic: sort by (-gain, symbol)
        best = sorted(gains.items(), key=lambda kv: (-kv[1], kv[0]))[:MAX_SYMBOLS]
        table = SymbolTable([s for s, _ in best])
    return table


def encode(table: SymbolTable, data: bytes) -> bytes:
    """Encode a byte buffer: table + uleb(len) + code stream."""
    payload = _encode_with(table, data)
    out = bytearray(table.serialize())
    out += uleb_encode(len(payload))
    out += payload
    return bytes(out)


def decode(buf: bytes) -> bytes:
    table, pos = SymbolTable.deserialize(buf, 0)
    n, pos = uleb_decode(buf, pos)
    codes = np.frombuffer(buf, dtype=np.uint8, count=n, offset=pos)
    out_parts: list[bytes] = []
    i = 0
    symbols = table.symbols
    while i < len(codes):
        c = codes[i]
        if c == ESCAPE:
            out_parts.append(bytes([codes[i + 1]]))
            i += 2
        else:
            out_parts.append(symbols[c])
            i += 1
    return b"".join(out_parts)
