"""Deterministic synthetic tokens table (the BASELINE.json input_hint shape).

Schema: ``doc_id:string, tokens:list<int32>, n_tok:int32, source:string``.
Generation follows FIXTURES.md F1: per-source token-value mixtures so the
codec auto-selector has real decisions to make (uniform / zipf-with-runs
/ narrow-range), lognormal skewed lengths, and deterministically injected
edge-case rows (empty list, single token, all-equal run, max vocab id).

Everything is seeded — the same (num_rows, seed) always produces the
same table, which is what makes encode-task retries and resume
fingerprints stable.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["make_tokens_table", "write_tokens_dataset", "VOCAB"]

VOCAB = 50_257
SOURCES = ["web", "code", "books", "wiki", "forums", "news", "papers", "synth"]
_ZIPF_W = np.array([0.30, 0.20, 0.14, 0.11, 0.09, 0.07, 0.05, 0.04])


def _values_for_source(rng: np.random.Generator, source: str, n: int) -> np.ndarray:
    if source == "web":  # uniform over the full vocab → bitpack/plain wins
        return rng.integers(0, VOCAB, n, dtype=np.int32)
    if source == "synth":  # narrow range → frame-of-reference, few bits
        return rng.integers(100, 357, n, dtype=np.int32)
    if source == "code":  # zipf over 2k symbols with long indentation runs
        v = np.minimum(rng.zipf(1.3, n) - 1, 1999).astype(np.int32)
        run_starts = rng.integers(0, max(n - 32, 1), max(n // 64, 1))
        for s in run_starts:  # few, long runs — loop count is n/64
            v[s : s + 24] = 17  # "indentation" token
        return v
    if source == "books":  # zipf over 30k — dictionary borderline
        return np.minimum(rng.zipf(1.2, n) - 1, 29_999).astype(np.int32)
    # remaining sources interpolate: zipf over 10k
    return np.minimum(rng.zipf(1.25, n) - 1, 9_999).astype(np.int32)


def make_tokens_table(num_rows: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    src_idx = rng.choice(len(SOURCES), num_rows, p=_ZIPF_W / _ZIPF_W.sum())
    n_tok = np.clip(
        rng.lognormal(5.5, 1.0, num_rows).astype(np.int64), 8, 8192
    ).astype(np.int32)
    # deterministic edge rows
    if num_rows >= 8:
        n_tok[0] = 0      # empty token list
        n_tok[1] = 1      # single token
        n_tok[2] = 64     # all-equal run (filled below)
        n_tok[3] = 8192   # clip bound
    doc_id = []
    values_parts = []
    source_col = []
    for i in range(num_rows):
        s = SOURCES[src_idx[i]]
        source_col.append(s)
        doc_id.append(f"{s}/{i >> 10:04d}/doc-{i:08d}")
        v = _values_for_source(rng, s, int(n_tok[i]))
        if i == 2 and num_rows >= 8:
            v[:] = 1234  # pure RLE run row
        if i == 4 and num_rows >= 8 and len(v):
            v[0] = VOCAB - 1  # max vocab id present
        values_parts.append(v)
    values = (
        np.concatenate(values_parts) if values_parts else np.empty(0, np.int32)
    )
    offsets = np.zeros(num_rows + 1, dtype=np.int32)
    np.cumsum(n_tok, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(values, type=pa.int32())
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_id, type=pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(n_tok, type=pa.int32()),
            "source": pa.array(source_col, type=pa.string()),
        }
    )


def _write_tokens_file(path: str, file_idx: int, n: int, seed: int) -> str:
    # derive a per-file seed so files are independent and reproducible
    tbl = make_tokens_table(n, seed=seed + 1000 * file_idx)
    # small row groups so ray.data.read_parquet can split each file
    # into many blocks (parallel read + downstream parallelism)
    out = os.path.join(path, f"part-{file_idx:05d}.parquet")
    pq.write_table(tbl, out, row_group_size=8192)
    return out


def write_tokens_dataset(
    path: str, num_rows: int, seed: int = 42, rows_per_file: int = 50_000
) -> str:
    """Write the synthetic table as a multi-file parquet dataset (cached:
    if the directory already exists with a _DONE marker, reuse it).

    Generation is row-at-a-time Python (deterministic), so files are
    produced in parallel with Ray tasks when a Ray runtime is up.
    """
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    jobs = []
    file_idx = 0
    for start in range(0, num_rows, rows_per_file):
        jobs.append((file_idx, min(rows_per_file, num_rows - start)))
        file_idx += 1
    try:
        import ray
        use_ray = ray.is_initialized()
    except ImportError:  # pragma: no cover
        use_ray = False
    if use_ray and len(jobs) > 1:
        task = ray.remote(_write_tokens_file)
        ray.get([task.remote(path, i, n, seed) for i, n in jobs])
    else:
        for i, n in jobs:
            _write_tokens_file(path, i, n, seed)
    with open(done, "w") as f:
        f.write(f"rows={num_rows} seed={seed}\n")
    return path
