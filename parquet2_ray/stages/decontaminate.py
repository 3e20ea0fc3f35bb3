"""Benchmark decontamination — drop training docs that overlap an
evaluation set.

A standard LLM training-data step (GPT-3 appendix C / Dolma both
n-gram-match eval sets against the corpus): any document sharing an
n-gram window with a benchmark text is flagged (and usually dropped)
so downstream evals aren't contaminated.  The reference (parquet2) has
no such operator; this follows the repo's training-pipeline charter
(SURVEY.md §2.10).

Scale shape (the only one that works at 100 TB):

- the BENCHMARK side is small by definition (eval sets are MBs) — its
  window-hash set is built once on the driver, de-duplicated, and
  broadcast via ``ray.put`` (read zero-copy by every task, never
  re-shipped per batch);
- the CORPUS side is a map-only pass: one vectorized rolling-hash
  sweep per batch over the concatenated utf8 buffer (the same kernel
  and doc-boundary masking as MinHash, stages/dedup.py), membership
  via ``searchsorted`` into the sorted broadcast array.  No shuffle,
  no materialization — the flagged dataset streams.

Char-window hashes (k bytes, default 50 ≈ a 10-13 word n-gram) rather
than word tokens: windows are what the repo's shingle kernels already
vectorize, and char windows are strictly more conservative (a word
13-gram match implies char-window matches inside it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions.hashing import rolling_window_hashes

__all__ = ["benchmark_fingerprints", "flag_contaminated", "decontaminate"]

DEFAULT_K = 50  # window bytes; ≈ a 10-13 word n-gram


def benchmark_fingerprints(texts, k: int = DEFAULT_K) -> np.ndarray:
    """Sorted unique uint64 hashes of every k-byte window of every
    benchmark text.  Driver-side by design: eval sets are small."""
    hs = []
    for t in texts:
        if t is None:
            continue
        d = np.frombuffer(str(t).encode(), dtype=np.uint8)
        w = rolling_window_hashes(d, k)
        if w.size:
            hs.append(w)
    if not hs:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(hs))


def _tag_batch(batch: pa.Table, fp: np.ndarray, text_col: str,
               k: int, min_hits: int) -> pa.Table:
    arr = batch[text_col].combine_chunks().cast(pa.large_binary())
    bufs = arr.buffers()
    n = len(arr)
    counts = np.zeros(n, dtype=np.int64)
    if bufs[2] is not None and fp.size:
        offsets = np.frombuffer(bufs[1], dtype=np.int64)[
            arr.offset : arr.offset + n + 1]
        data = np.frombuffer(bufs[2], dtype=np.uint8)[offsets[0] : offsets[-1]]
        offsets = offsets - offsets[0]
        win = rolling_window_hashes(data, k)
        nonempty = (offsets[1:] - offsets[:-1]) >= k
        if win.size and nonempty.any():
            at = np.minimum(np.searchsorted(fp, win), fp.size - 1)
            hit = fp[at] == win
            # windows crossing document boundaries must not contribute
            # (same boundary-interval mask as minhash_signatures_batch)
            delta = np.zeros(win.size + 1, dtype=np.int32)
            lo = np.clip(offsets[1:] - (k - 1), 0, win.size)
            hi = np.clip(offsets[1:], 0, win.size)
            np.add.at(delta, lo, 1)
            np.add.at(delta, hi, -1)
            hit &= ~(np.cumsum(delta[:-1]) > 0)
            # zero sentinel + clip to win.size: a trailing empty doc
            # must not steal the preceding doc's final window hit
            starts = np.clip(offsets[:-1], 0, win.size)
            counts = np.add.reduceat(
                np.append(hit.astype(np.int64), 0), starts)
            counts[~nonempty] = 0  # reduceat quirk on collapsed ranges
    return batch.append_column(
        "n_contam_windows", pa.array(counts, type=pa.int64())
    ).append_column(
        "contaminated", pa.array(counts >= min_hits))


def flag_contaminated(
    ds: rd.Dataset,
    fingerprints: np.ndarray,
    text_col: str = "text",
    k: int = DEFAULT_K,
    min_hits: int = 1,
) -> rd.Dataset:
    """Append ``n_contam_windows`` + ``contaminated`` columns.

    Map-only; ``fingerprints`` (sorted uint64, from
    :func:`benchmark_fingerprints`) is broadcast ONCE via ``ray.put``
    and read zero-copy inside every task."""
    ref = ray.put(np.ascontiguousarray(fingerprints, dtype=np.uint64))

    def tag(batch: pa.Table) -> pa.Table:
        return _tag_batch(batch, ray.get(ref), text_col, k, min_hits)

    return ds.map_batches(tag, batch_format="pyarrow")


def decontaminate(
    ds: rd.Dataset,
    benchmark_texts,
    text_col: str = "text",
    k: int = DEFAULT_K,
    min_hits: int = 1,
    keep_flags: bool = False,
) -> rd.Dataset:
    """Remove documents sharing ≥ ``min_hits`` k-byte windows with any
    benchmark text.  Streaming, shuffle-free; the result keeps the
    input schema unless ``keep_flags``."""
    fp = benchmark_fingerprints(benchmark_texts, k)
    flagged = flag_contaminated(ds, fp, text_col=text_col, k=k,
                                min_hits=min_hits)
    drop = [] if keep_flags else ["n_contam_windows", "contaminated"]

    def keep_clean(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.invert(batch["contaminated"]))
        return out.drop_columns(drop) if drop else out

    return flagged.map_batches(keep_clean, batch_format="pyarrow")
