"""Text-analysis stages for training-data pipelines.

Each is a vectorized ``map_batches`` body (or actor-pool class where
there is per-worker state to amortize) over the ``documents`` table
shape (doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash_strings, md5_hex

__all__ = [
    "token_count_batch",
    "char_stats_batch",
    "md5_batch",
    "LangId",
    "quality_score_batch",
    "BpeTokenCount",
    "bpe_token_count_batch",
    "text_metrics_batch",
    "text_quality_batch",
    "BPE_PATTERN",
    "token_count_partials",
    "top_tokens",
    "scrub_text_batch",
    "chunk_documents_batch",
    "repetition_signals_batch",
    "vocab_coverage",
]


def token_count_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Whitespace token count — python-split semantics (runs of
    whitespace, no empty tokens), matching
    ``length(list_filter(string_split_regex(text,'\\s+'), x -> x <> ''))``."""
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_ws_tok": batch["text"].str.split().str.len().fillna(0).astype("int64"),
        }
    )


# GPT-2-style pre-tokenizer pattern, restricted to constructs Python re
# and DuckDB's RE2 interpret IDENTICALLY (no \p classes, no lookahead,
# explicit ASCII whitespace class so unicode \s semantics can't diverge):
# contractions | space?+letters | space?+digits | space?+other | whitespace
BPE_PATTERN = (r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
               r"| ?[^A-Za-z0-9 \t\n\r\f\v]+|[ \t\n\r\f\v]+")


class BpeTokenCount:
    """BPE-ish token count — actor-pool stage: the pattern is compiled
    ONCE per actor here in ``__init__`` (map_batches(BpeTokenCount,
    concurrency=N)), the per-batch body is one vectorized
    ``str.count`` pass.  Oracle:
    ``length(regexp_extract_all(text, BPE_PATTERN))`` in DuckDB.

    For state this cheap (a regex compile is ~ms) prefer the task-pool
    twin ``bpe_token_count_batch`` — identical output without the
    actor-pool spin-up; this class stays as the actor-shape reference
    for genuinely heavy per-worker state (models, symbol tables)."""

    def __init__(self, pattern: str = BPE_PATTERN):
        import re

        self.pat = re.compile(pattern)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_bpe_tok": batch["text"].str.count(self.pat)
            .fillna(0).astype("int64"),
        })


_BPE_COMPILED: dict = {}


def bpe_token_count_batch(
    batch: pd.DataFrame, pattern: str = BPE_PATTERN
) -> pd.DataFrame:
    """Task-pool twin of ``BpeTokenCount``: the pattern is compiled
    lazily ONCE PER WORKER PROCESS (module-level cache — Ray reuses
    worker processes across tasks), so plain ``map_batches(fn)``
    gets per-worker-compiled state without paying actor-pool startup.
    Identical output to the actor variant."""
    pat = _BPE_COMPILED.get(pattern)
    if pat is None:
        import re

        pat = _BPE_COMPILED[pattern] = re.compile(pattern)
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_bpe_tok": batch["text"].str.count(pat).fillna(0).astype("int64"),
    })


def text_metrics_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Both tokenizer counts (whitespace + BPE-ish regex) in one pass —
    the driver-facing merge of ``token_count_batch`` and
    ``bpe_token_count_batch`` so one scan of the corpus feeds both."""
    ws = token_count_batch(batch)
    bpe = bpe_token_count_batch(batch)
    ws["n_bpe_tok"] = bpe["n_bpe_tok"]
    return ws


def text_quality_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Char stats + quality signals + md5 fingerprint in one pass —
    the driver-facing merge of ``char_stats_batch``,
    ``quality_score_batch`` and ``md5_batch`` (one corpus scan)."""
    cs = char_stats_batch(batch)
    q = quality_score_batch(batch)
    cs["alpha_ratio"] = q["alpha_ratio"]
    cs["mean_word_len"] = q["mean_word_len"]
    cs["fp"] = md5_hex(batch["text"])
    return cs


def char_stats_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Exact-integer quality stats (lengths and separator counts)."""
    text = batch["text"]
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_chars2": text.str.len().astype("int64"),
            "n_spaces": text.str.count(" ").astype("int64"),
            "n_lines": text.str.count("\n").astype("int64"),
        }
    )


def md5_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Document fingerprint = md5 hexdigest (DuckDB-comparable)."""
    return pd.DataFrame({"doc_id": batch["doc_id"], "fp": md5_hex(batch["text"])})


class LangId:
    """Heuristic language ID — actor-pool stage: stopword tables and
    the tokenizer regex are built once per actor (``__init__``), batches
    are scored vectorized in ``__call__`` (SURVEY.md actor-pool rule)."""

    STOPWORDS = {
        "en": {"the", "a", "of", "and", "to", "in", "is", "that", "it", "for"},
        "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit"},
        "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans"},
        "es": {"el", "la", "los", "y", "es", "un", "una", "para", "en"},
    }

    def __init__(self):
        # one compiled alternation per language (built once per actor):
        # a stopword counts as a hit when delimited by whitespace or the
        # string boundary — identical token semantics to str.split()
        import re

        self.langs = sorted(self.STOPWORDS)
        self.patterns = [
            re.compile(
                r"(?<!\S)(?:" + "|".join(sorted(self.STOPWORDS[l])) + r")(?!\S)"
            )
            for l in self.langs
        ]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        lower = batch["text"].str.lower()
        # (n_docs, n_langs) stopword-hit counts — one vectorized
        # str.count pass per language, no per-row Python
        scores = np.column_stack(
            [lower.str.count(p).fillna(0).to_numpy(dtype=np.int64)
             for p in self.patterns]
        )
        # argmax with ties broken toward the lexicographically LAST
        # language (matching max(key=(score, lang)) semantics)
        rev = scores[:, ::-1]
        best = scores.shape[1] - 1 - np.argmax(rev, axis=1)
        preds = np.where(scores.max(axis=1) > 0,
                         np.asarray(self.langs, dtype=object)[best], "und")
        return pd.DataFrame({"doc_id": batch["doc_id"], "lang_pred": preds})


def quality_score_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Composite quality signals: mean word length, alpha ratio,
    content hash (for grouping identical docs)."""
    text = batch["text"]
    n_chars = text.str.len().astype("int64")
    n_alpha = text.str.count(r"[A-Za-z]").astype("int64")
    n_tok = text.str.split().str.len().fillna(0).astype("int64")
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_chars2": n_chars,
            "alpha_ratio": (n_alpha / n_chars.clip(lower=1)).astype("float64"),
            "mean_word_len": (
                (n_chars - n_tok + 1).clip(lower=0) / n_tok.clip(lower=1)
            ).astype("float64"),
            "content_hash": hash_strings(batch["text"].to_numpy(dtype=object)).astype(
                "uint64"
            ),
        }
    )


def token_count_partials(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch partial token counts — the combiner half of the global
    top-k heavy-hitters pipeline.  One vectorized split + value_counts
    per batch, so only O(distinct tokens in batch) rows reach the
    groupby exchange, never one row per token occurrence (the classic
    pre-aggregate-before-shuffle rule for a 100 TB corpus)."""
    import pyarrow.compute as pc

    toks = pc.list_flatten(pc.split_pattern(batch[text_col], pattern=" "))
    toks = toks.filter(pc.not_equal(toks, ""))
    vc = toks.value_counts()
    if isinstance(vc, pa.ChunkedArray):
        vc = vc.combine_chunks()
    return pa.table({"token": vc.field("values"),
                     "n": vc.field("counts").cast(pa.int64())})


def top_tokens(ds, k: int = 50, text_col: str = "text"):
    """EXACT global top-k tokens by frequency: per-batch partial counts
    → ``groupby(token).sum`` (vocab-sized, not corpus-sized) → total-
    order sort (count desc, token asc — ties can't make the cut
    nondeterministic) → limit k.  The post-agg sort touches only
    O(vocab) rows; no per-batch top-M pruning because a token can be
    sub-threshold in every batch yet top-k globally."""
    from ray.data.aggregate import Sum

    return (ds.select_columns([text_col])
              .map_batches(lambda b: token_count_partials(b, text_col),
                           batch_format="pyarrow")
              .groupby("token")
              .aggregate(Sum("n", alias_name="n"))
              .sort(["n", "token"], descending=[True, False])
              .limit(k))


# --------------------------------------------------------------------------
# round-3 additions: scrubbing, chunking, repetition quality signals


_SCRUB_PATTERNS: dict = {}

# conservative, RE2-compatible patterns (no lookbehind): the point is
# the distributed plumbing + determinism, not NLP-grade recall
SCRUB_DEFAULTS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{7,}[0-9]", "<PHONE>"),
)


def scrub_text_batch(batch: pd.DataFrame,
                     rules: tuple = SCRUB_DEFAULTS) -> pd.DataFrame:
    """PII scrub: replace email/url/phone spans with typed placeholders.

    Task-pool stage; patterns compile lazily ONCE PER WORKER (module
    cache, same discipline as ``bpe_token_count_batch``) and each rule
    is one vectorized ``str.replace`` pass.  Emits per-rule hit counts
    so a pipeline can audit how much was redacted."""
    # cache keyed by CONTENT (rules tuples are hashable): id()-keyed
    # caching would serve stale patterns when a freed tuple's address
    # is reused, and grow unboundedly for per-call tuples
    compiled = _SCRUB_PATTERNS.get(rules)
    if compiled is None:
        import re

        compiled = _SCRUB_PATTERNS[rules] = [
            (name, re.compile(pat), repl) for name, pat, repl in rules]
    # carry every input column through (provenance like ``source`` must
    # survive the scrub); only ``text`` is rewritten, counters appended
    out = batch.copy()
    text = batch["text"]
    for name, pat, repl in compiled:
        out[f"n_{name}"] = text.str.count(pat).fillna(0).astype("int64")
        text = text.str.replace(pat, repl, regex=True)
    out["text"] = text
    return out


def chunk_documents_batch(batch: pd.DataFrame, chunk_chars: int = 1000,
                          overlap: int = 100) -> pd.DataFrame:
    """Split documents into overlapping character windows (context-
    window chunking for retrieval / training).  One output row per
    chunk: (doc_id, chunk_idx, char_start, chunk_text).  Vectorized
    bookkeeping: per-doc chunk counts via integer math, one np.repeat
    for the doc ids; the slicing itself is a bounded comprehension over
    CHUNKS (not chars, not tokens)."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap
    text = batch["text"].fillna("")
    lens = text.str.len().to_numpy(dtype=np.int64)
    n_chunks = np.maximum((lens - overlap + step - 1) // step, 1)
    n_chunks[lens == 0] = 0
    rep = np.repeat(np.arange(len(batch)), n_chunks)
    idx = np.concatenate([np.arange(k) for k in n_chunks]) if len(rep) else \
        np.empty(0, np.int64)
    starts = idx * step
    texts = text.to_numpy(dtype=object)
    chunks = [texts[r][s:s + chunk_chars] for r, s in zip(rep, starts)]
    return pd.DataFrame({
        "doc_id": batch["doc_id"].to_numpy()[rep],
        "chunk_idx": idx.astype("int64"),
        "char_start": starts.astype("int64"),
        "chunk_text": chunks,
    })


def repetition_signals_batch(batch: pd.DataFrame,
                             ngram: int = 2) -> pd.DataFrame:
    """Gopher-style repetition quality signals, vectorized per doc:

    - ``dup_line_frac``: fraction of lines that are exact duplicates of
      an earlier line (whitespace-stripped, empties excluded),
    - ``top_ngram_frac``: fraction of the word stream covered by the
      single most frequent word n-gram.

    High values flag boilerplate/spam for a downstream filter.  Work is
    O(words) numpy per doc — no Python inner loops over tokens."""
    dup_fracs = np.zeros(len(batch), np.float64)
    top_fracs = np.zeros(len(batch), np.float64)
    for i, t in enumerate(batch["text"].fillna("")):
        lines = [l for l in (s.strip() for s in t.split("\n")) if l]
        if lines:
            arr = np.asarray(lines, dtype=object)
            _, first = np.unique(arr, return_index=True)
            dup_fracs[i] = 1.0 - first.size / arr.size
        words = t.split()
        if len(words) >= ngram:
            h = hash_strings(np.asarray(words, dtype=object))
            # rolling n-gram key over the word-hash stream (uint64 ring)
            key = h[: len(h) - ngram + 1].copy()
            with np.errstate(over="ignore"):
                for j in range(1, ngram):
                    key = key * np.uint64(1099511628211) + h[j: len(h) - ngram + 1 + j]
            _, counts = np.unique(key, return_counts=True)
            top_fracs[i] = counts.max() * ngram / len(words)
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "dup_line_frac": dup_fracs,
        "top_ngram_frac": np.minimum(top_fracs, 1.0),
    })


def vocab_coverage(ds, vocab_ids, tokens_col: str = "tokens"):
    """Per-sequence out-of-vocabulary stats against a reference vocab.

    The tokenizer-mismatch diagnostic a training-data pipeline runs
    before committing a corpus: every sequence gets ``n_oov`` (token
    ids not in ``vocab_ids``) and ``oov_frac``.  The vocab (≤ a few
    million int32 ids — small by definition) is sorted and broadcast
    ONCE via ``ray.put``; the corpus side is a map-only vectorized
    membership pass over the flattened list<int32> values buffer —
    searchsorted + one per-row ``add.reduceat``, no shuffle.
    """
    import ray

    vs = np.unique(np.asarray(list(vocab_ids), dtype=np.int64))
    ref = ray.put(vs)

    def tag(batch: pa.Table) -> pa.Table:
        vocab = ray.get(ref)
        col = batch[tokens_col].combine_chunks()
        la = col.cast(pa.large_list(col.type.value_type))
        offs = np.frombuffer(la.buffers()[1], dtype=np.int64)[
            la.offset : la.offset + len(la) + 1]
        vals = la.values[offs[0] : offs[-1]].to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        n = len(la)
        n_oov = np.zeros(n, dtype=np.int64)
        if vals.size and vocab.size:
            at = np.minimum(np.searchsorted(vocab, vals), vocab.size - 1)
            oov = (vocab[at] != vals).astype(np.int64)
            # zero sentinel + clip to oov.size: a trailing empty row
            # must not steal the preceding row's last token
            starts = np.clip(offs[:-1], 0, oov.size)
            n_oov = np.add.reduceat(np.append(oov, 0), starts)
            n_oov[offs[1:] == offs[:-1]] = 0  # reduceat quirk: empty rows
        elif vals.size:
            lens = np.diff(offs)
            n_oov = lens.copy()  # empty vocab: everything is OOV
        lens = np.diff(offs)
        frac = np.divide(n_oov, lens, out=np.zeros(n, dtype=np.float64),
                         where=lens > 0)
        return batch.append_column(
            "n_oov", pa.array(n_oov, type=pa.int64())
        ).append_column("oov_frac", pa.array(frac, type=pa.float64()))

    return ds.map_batches(tag, batch_format="pyarrow")
