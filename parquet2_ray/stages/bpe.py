"""Byte-pair-encoding subword tokenizer: corpus-level TRAIN + an
actor-pool APPLY stage.

The missing middle of the text family: the repo counts whitespace and
GPT-2-regex pre-tokens (``stages/text.py``) and packs pre-tokenized
sequences (``stages/packing.py``), but nothing LEARNED a subword
vocabulary from the corpus.  This is the classic Sennrich et al. 2016
algorithm (arXiv 1508.07909), shaped for Ray:

- **train** — word frequencies come from a DISTRIBUTED count (per-batch
  ``value_counts`` partials → one ``groupby(word)`` of O(distinct
  words), truncated to the ``max_words`` most frequent — the standard
  bounded-dictionary approximation); the merge loop itself runs on the
  driver over that bounded word-frequency table (merges are inherently
  sequential — each depends on the previous — so there is nothing to
  distribute; cost is O(merges × unique-word symbols), independent of
  corpus size).
- **apply** — :class:`BpeApply` is a callable-class ``map_batches``
  stage: the merge ranks are built into a dict ONCE per actor in
  ``__init__``; each batch segments on the same word pre-tokenizer,
  encodes each UNIQUE word once (LRU-style per-actor cache — Zipf means
  the hit rate is enormous), and scatters the subword ids back.  The
  learned vocabulary ships by value in the actor constructor args (a
  few hundred KB), not per batch.

Word pre-tokenization is ``\\S+`` with a trailing end-of-word marker —
deliberately simple and exactly reproducible, so tests can pin golden
merges (the Sennrich "low/lower/newest/widest" example) and the
driver-vs-distributed equivalence bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

__all__ = ["train_bpe", "BpeApply", "encode_word", "bpe_vocab"]

EOW = "</w>"


def _word_counts(ds: rd.Dataset, text_col: str,
                 max_words: int) -> pd.DataFrame:
    """(word, n) for the ``max_words`` most frequent whitespace words —
    per-batch partial counts are the combiner, ONE groupby carries only
    the distinct-word table, and the head is taken by a sort on the
    aggregated counts (a tiny table by then)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        s = b[text_col].to_pandas().fillna("").str.split()
        flat = pd.Series([w for ws in s for w in ws], dtype=object)
        if flat.empty:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = flat.value_counts()
        return pa.table({"word": pa.array(vc.index, pa.string()),
                         "n": pa.array(vc.to_numpy(), pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("word").aggregate(Sum("n", alias_name="n")))
    df = counts.to_pandas()
    # deterministic head: by count desc, word asc
    df = df.sort_values(["n", "word"], ascending=[False, True],
                        kind="stable").head(max_words)
    return df.reset_index(drop=True)


def train_bpe(
    ds: rd.Dataset,
    n_merges: int = 1000,
    text_col: str = "text",
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns the
    ordered merge list [(left, right), ...] — rank = list position.
    Deterministic: pair-count ties break on the lexicographically
    smallest (left, right).  Stops early when no pair repeats."""
    wc = _word_counts(ds, text_col, max_words)
    words = [tuple(w) + (EOW,) for w in wc["word"]]
    freqs = wc["n"].to_numpy()

    # pair -> total count, and pair -> set of word indexes containing it
    from collections import defaultdict

    pair_count: dict[tuple, int] = defaultdict(int)
    pair_words: dict[tuple, set] = defaultdict(set)
    for i, w in enumerate(words):
        f = int(freqs[i])
        for a, b in zip(w, w[1:]):
            pair_count[(a, b)] += f
            pair_words[(a, b)].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_count:
            break
        top_n = max(pair_count.values())
        if top_n < 2:
            break
        # ties: lexicographically smallest pair — stable across runs
        pair = min(p for p, n in pair_count.items() if n == top_n)
        merges.append(pair)
        merged = pair[0] + pair[1]
        # rewrite only the words that contain the pair, updating the
        # inverted pair index incrementally (classic trainer shape)
        for i in list(pair_words.get(pair, ())):
            w = words[i]
            f = int(freqs[i])
            for a, b in zip(w, w[1:]):
                pair_count[(a, b)] -= f
                if pair_count[(a, b)] <= 0:
                    pair_count.pop((a, b), None)
                pair_words[(a, b)].discard(i)
            new = []
            j = 0
            while j < len(w):
                if j + 1 < len(w) and (w[j], w[j + 1]) == pair:
                    new.append(merged)
                    j += 2
                else:
                    new.append(w[j])
                    j += 1
            words[i] = tuple(new)
            for a, b in zip(words[i], words[i][1:]):
                pair_count[(a, b)] += f
                pair_words[(a, b)].add(i)
    return merges


def encode_word(word: str, ranks: dict[tuple, int]) -> list[str]:
    """Apply merges (by rank) to one word → subword symbols."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_vocab(merges: list[tuple[str, str]]) -> dict[str, int]:
    """symbol → id.  Ids 0..255 are reserved for single characters by
    codepoint (chr order for the Latin-1 range; other base characters
    append after the merges, discovered at apply time) — stable across
    processes because the merge list fully determines the learned
    symbols."""
    vocab: dict[str, int] = {EOW: 256}
    next_id = 257
    for a, b in merges:
        s = a + b
        if s not in vocab:
            vocab[s] = next_id
            next_id += 1
    return vocab


class BpeApply:
    """Actor-pool ``map_batches`` stage: text → subword id sequences.

    ``__init__`` (once per actor) builds the rank dict and vocabulary;
    ``__call__`` (per batch) encodes each UNIQUE word once through a
    per-actor cache and scatters ids back per document.  Output:
    (id_col, bpe_ids list<int64>, n_bpe int64).  Unknown base
    characters fall back to per-character ids above the learned range
    (deterministic: by codepoint)."""

    def __init__(self, merges: list[tuple[str, str]],
                 text_col: str = "text", id_col: str = "doc_id"):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.vocab = bpe_vocab([tuple(p) for p in merges])
        self.text_col, self.id_col = text_col, id_col
        self.cache: dict[str, list[int]] = {}

    def _sym_id(self, s: str) -> int:
        v = self.vocab.get(s)
        if v is None:
            # single base character outside the learned symbols:
            # Latin-1 maps to its codepoint (below the EOW/merge id
            # range); higher codepoints map to 2_000_000 + codepoint so
            # they can never collide with learned merge ids
            if len(s) != 1:
                raise KeyError(f"unknown multi-char symbol {s!r}")
            v = ord(s) if ord(s) < 256 else 2_000_000 + ord(s)
            self.vocab[s] = v
        return v

    def _encode(self, word: str) -> list[int]:
        hit = self.cache.get(word)
        if hit is None:
            hit = [self._sym_id(s) for s in
                   encode_word(word, self.ranks)]
            if len(self.cache) < 1_000_000:
                self.cache[word] = hit
        return hit

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids_out, n_out = [], []
        for text in batch[self.text_col].fillna(""):
            ids: list[int] = []
            for w in text.split():
                ids.extend(self._encode(w))
            ids_out.append(ids)
            n_out.append(len(ids))
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "bpe_ids": ids_out,
            "n_bpe": np.asarray(n_out, dtype=np.int64),
        })
