"""Readers / derived sources over the driver testdata.

``tokens_from_documents`` derives a tokens-shaped table
(doc_id:string, tokens:list<int32>, n_tok:int32, source:string — the
BASELINE.json input_hint shape) deterministically from the ``documents``
table: whitespace words hashed into a 50k vocab.  The vocab hash is the
first 15 hex digits of md5(word) mod VOCAB — chosen because DuckDB can
reproduce it exactly (``('0x'||substr(md5(w),1,15))::BIGINT``), which
gives the flagship pipeline a full SQL oracle.  Used by the flagship
``entry()`` pipeline so it runs on real driver testdata.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

__all__ = ["tokens_from_documents", "read_table"]

VOCAB = 50_257


def _word_token_ids(flat: list[str]) -> np.ndarray:
    """md5-based vocab ids (documents tables are small — ≤5k docs — so
    the per-word hashlib loop is off the hot path by construction; the
    bench corpus uses the synthetic generator, not this)."""
    return np.fromiter(
        (int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % VOCAB for w in flat),
        dtype=np.int32, count=len(flat),
    )


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def _tokenize_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pandas()
    words = texts.str.split()
    lens = words.str.len().fillna(0).astype(np.int32).to_numpy()
    flat = [w for ws in words for w in (ws or ())]
    ids = _word_token_ids(flat) if flat else np.empty(0, dtype=np.int32)
    offsets = np.zeros(len(batch) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(ids, type=pa.int32())
    )
    doc_id = pa.compute.binary_join_element_wise(
        batch["source"].cast(pa.string()),
        pa.compute.cast(batch["doc_id"], pa.string()),
        "/doc-",
    )
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": pa.array(lens, type=pa.int32()),
            "source": batch["source"],
        }
    )


def tokens_from_documents(sf_dir: str) -> rd.Dataset:
    return read_table(sf_dir, "documents", columns=["doc_id", "text", "source"]).map_batches(
        _tokenize_batch, batch_format="pyarrow"
    )
