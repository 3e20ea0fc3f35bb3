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
