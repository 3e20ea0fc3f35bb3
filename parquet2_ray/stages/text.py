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
        # invert: word → set of languages (built once per actor)
        self.word_langs: dict[str, list[str]] = {}
        for lang, words in self.STOPWORDS.items():
            for w in words:
                self.word_langs.setdefault(w, []).append(lang)
        self.langs = sorted(self.STOPWORDS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for words in batch["text"].str.lower().str.split():
            scores = dict.fromkeys(self.langs, 0)
            for w in words or ():
                for lang in self.word_langs.get(w, ()):
                    scores[lang] += 1
            best = max(self.langs, key=lambda l: (scores[l], l))
            preds.append(best if scores[best] > 0 else "und")
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
