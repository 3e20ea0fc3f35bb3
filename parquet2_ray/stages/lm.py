"""Count-based n-gram LM quality scoring (CCNet-style).

CCNet (Wenzek et al., 2020) scores web documents with a language model
trained on a trusted reference corpus (Wikipedia) and keeps the
low-perplexity tail; this module is that operator on Ray Data, with a
bigram stupid-backoff model (Brants et al., 2007 — the count-based
scheme built for exactly this "LM over terabytes" setting: no
discounting to fit, just counts and a fixed backoff multiplier).

Scale shape:

- **training is bounded by design** — the reference corpus is small
  (CCNet's is one Wikipedia dump), so counts are built in one
  vectorized pass and the model is plain sorted numpy arrays;
- **scoring is the 100 TB side**: the model is broadcast ONCE via
  ``ray.put`` and every batch scores map-only — word hashes, two
  ``searchsorted`` lookups, one ``add.reduceat`` per doc.  No shuffle.

Scores are mean log10 probability per token (higher = more like the
reference).  Downstream keeps a threshold or quantile band, exactly
like the quality-gate stage in pipelines/prepare_pipeline.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.hashing import hash_strings

__all__ = ["train_ngram_lm", "lm_score"]

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
BACKOFF = 0.4  # stupid-backoff multiplier (Brants et al., 2007)


def _doc_word_hashes(texts: pa.Array):
    """(word_hashes uint64, doc_offsets int64) — lowercased whitespace
    words of every doc, flattened; empty tokens removed."""
    lowered = pc.utf8_lower(texts.cast(pa.string()))
    # TRUE whitespace split (newlines/tabs too — web text is full of
    # them; a single-space split would glue 'mat.\nThe' into one token)
    lists = pc.utf8_split_whitespace(lowered)
    la = lists.cast(pa.large_list(pa.string())) if not isinstance(
        lists.type, pa.LargeListType) else lists
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    offs = np.frombuffer(la.buffers()[1], dtype=np.int64)[
        la.offset : la.offset + len(la) + 1]
    flat = la.values[offs[0] : offs[-1]]
    offs = offs - offs[0]
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    # re-derive per-doc offsets after dropping empty tokens (zero
    # sentinel + clip to len(flat): trailing empty docs must not steal
    # the preceding doc's last word)
    counts = np.add.reduceat(np.append(nonempty.astype(np.int64), 0),
                             np.clip(offs[:-1], 0, len(flat))
                             ) if len(flat) else np.zeros(len(la), np.int64)
    if len(flat):
        counts[offs[1:] == offs[:-1]] = 0  # reduceat quirk: empty docs
    new_offs = np.zeros(len(la) + 1, dtype=np.int64)
    np.cumsum(counts, out=new_offs[1:])
    words = flat.filter(pa.array(nonempty)) if len(flat) else flat
    h = (hash_strings(words.to_numpy(zero_copy_only=False)).astype(np.uint64)
         if len(words) else np.empty(0, np.uint64))
    return h, new_offs


def _bigram_hashes(h: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Hashes of adjacent word pairs WITHIN docs (boundary pairs
    excluded)."""
    if h.size < 2:
        return np.empty(0, np.uint64)
    with np.errstate(over="ignore"):
        bh = (h[:-1] * _GOLDEN) ^ h[1:]
    # a pair (i, i+1) is valid unless i+1 is a doc start
    starts = offs[1:-1]  # doc boundaries inside the flat array
    valid = np.ones(bh.size, dtype=bool)
    inside = starts[(starts > 0) & (starts <= bh.size)]
    valid[inside - 1] = False
    return bh[valid]


def train_ngram_lm(ref, text_col: str = "text", min_count: int = 1) -> dict:
    """Build the model from a REFERENCE corpus (bounded by design —
    CCNet trains on one Wikipedia dump).  Accepts a pyarrow Table,
    pandas DataFrame, or a small Ray Dataset (materialized here).

    Returns sorted-array model: {"uni_h","uni_c","bi_h","bi_c","total"}.
    ``min_count`` prunes rare bigrams (Zipf tail) to bound model size.
    """
    if isinstance(ref, rd.Dataset):
        batches = list(ref.select_columns([text_col]).iter_batches(
            batch_format="pyarrow"))
        ref = (pa.concat_tables(batches) if batches
               else pa.table({text_col: pa.array([], pa.string())}))
    if not isinstance(ref, pa.Table):
        import pandas as pd

        if isinstance(ref, pd.DataFrame):
            ref = pa.Table.from_pandas(ref)
        else:
            raise TypeError(f"unsupported reference type {type(ref)}")
    texts = ref[text_col].combine_chunks()
    h, offs = _doc_word_hashes(texts)
    uni_h, uni_c = (np.unique(h, return_counts=True) if h.size
                    else (np.empty(0, np.uint64), np.empty(0, np.int64)))
    bh = _bigram_hashes(h, offs)
    bi_h, bi_c = (np.unique(bh, return_counts=True) if bh.size
                  else (np.empty(0, np.uint64), np.empty(0, np.int64)))
    if min_count > 1 and bi_c.size:
        keep = bi_c >= min_count
        bi_h, bi_c = bi_h[keep], bi_c[keep]
    return {"uni_h": uni_h, "uni_c": uni_c.astype(np.int64),
            "bi_h": bi_h, "bi_c": bi_c.astype(np.int64),
            "total": int(h.size)}


def _lookup(sorted_h: np.ndarray, counts: np.ndarray,
            q: np.ndarray) -> np.ndarray:
    """count per query hash (0 when absent)."""
    out = np.zeros(q.size, dtype=np.int64)
    if sorted_h.size and q.size:
        at = np.minimum(np.searchsorted(sorted_h, q), sorted_h.size - 1)
        hit = sorted_h[at] == q
        out[hit] = counts[at[hit]]
    return out


def score_batch(batch: pa.Table, model: dict,
                text_col: str = "text") -> pa.Table:
    """Append ``lm_logprob`` (mean log10 token probability under the
    stupid-backoff bigram model) and ``lm_oov_frac``."""
    h, offs = _doc_word_hashes(batch[text_col].combine_chunks())
    n = len(batch)
    total = max(model["total"], 1)
    floor = 1.0 / (10.0 * total)  # unseen-unigram floor
    logprob = np.full(n, np.nan)
    oov = np.zeros(n, dtype=np.float64)
    if h.size:
        c_uni = _lookup(model["uni_h"], model["uni_c"], h)
        p_uni = np.where(c_uni > 0, c_uni / total, floor)
        # token probability: bigram if its context pair was seen, else
        # backoff * unigram; the FIRST token of each doc has no context
        with np.errstate(over="ignore"):
            bh = (h[:-1] * _GOLDEN) ^ h[1:] if h.size > 1 else \
                np.empty(0, np.uint64)
        c_bi = _lookup(model["bi_h"], model["bi_c"], bh)
        c_prev = c_uni[:-1] if h.size > 1 else np.empty(0, np.int64)
        p = p_uni.copy()
        if bh.size:
            use_bi = (c_bi > 0) & (c_prev > 0)
            p_tail = np.where(use_bi, c_bi / np.maximum(c_prev, 1),
                              BACKOFF * p_uni[1:])
            # doc-start tokens keep their unigram probability
            starts = offs[:-1][np.diff(offs) > 0]
            is_start = np.zeros(h.size, dtype=bool)
            is_start[starts] = True
            p[1:] = np.where(is_start[1:], p[1:], p_tail)
        lp = np.log10(np.maximum(p, floor))
        # zero sentinel + clip to h.size: trailing empty docs must not
        # steal the preceding doc's last-token logprob
        st = np.clip(offs[:-1], 0, h.size)
        sums = np.add.reduceat(np.append(lp, 0.0), st)
        oov_sums = np.add.reduceat(
            np.append((c_uni == 0).astype(np.float64), 0.0), st)
        lens = np.diff(offs)
        empty = lens == 0
        sums[empty] = np.nan
        oov_sums[empty] = 0.0
        logprob = np.divide(sums, lens, out=np.full(n, np.nan),
                            where=lens > 0)
        oov = np.divide(oov_sums, lens, out=np.zeros(n, dtype=np.float64),
                        where=lens > 0)
    return batch.append_column(
        "lm_logprob", pa.array(logprob, type=pa.float64(), from_pandas=True)
    ).append_column("lm_oov_frac", pa.array(oov, type=pa.float64()))


def lm_score(ds: rd.Dataset, model: dict,
             text_col: str = "text") -> rd.Dataset:
    """Score every document against the reference LM.  Map-only; the
    model arrays are broadcast ONCE via ``ray.put``."""
    import ray

    ref = ray.put(model)

    def tag(batch: pa.Table) -> pa.Table:
        return score_batch(batch, ray.get(ref), text_col)

    return ds.map_batches(tag, batch_format="pyarrow")
