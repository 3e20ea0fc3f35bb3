"""Sharded within-bucket pair generation for LSH-style stages.

``groupby("bkey").map_groups(fn)`` calls the Python UDF once per
bucket.  An LSH sketch table has ~rows × bands buckets and nearly all
of them are singletons, so at any real scale the per-group call
overhead (a Python frame + an Arrow slice + an empty-table return per
bucket) dwarfs the actual pairing math.

This module keeps the same one-shuffle dataflow but groups by a SHARD
key (``bkey % nshards`` — uniform by construction, bkey is already a
hash) so the shuffle produces a bounded number of group tasks.  Inside
each shard task the rows are sorted by (bkey, id) once; buckets are
then contiguous runs, singleton buckets are skipped wholesale, and the
caller's ``score_fn`` scores each multi-member bucket on a CONTIGUOUS
slice — which keeps the inner kernels cache-friendly (e.g. a per-bucket
BLAS gemm for cosine is ~100× faster than gathering per-pair rows;
measured on the sf0.1 embeddings: 0.06 s vs 6.1 s for 2.1 M pairs).

Scale notes (100 TB):
- shuffle volume is unchanged — only sketch rows move, never payloads
  the caller didn't put in the exploded table;
- ``nshards`` bounds group-task count AND sets per-task input size
  (~total_sketch_rows / nshards): at 10^12-row scale raise it so a
  shard fits a worker heap (e.g. total_rows × bands / 1e6);
- ``max_bucket`` truncates degenerate buckets (heavy-duplicate
  corpora) to their smallest ids, bounding the quadratic term;
- shard skew cannot happen: the shard key is a modulus of a hash.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

import ray.data as rd

__all__ = ["bucket_runs", "sharded_bucket_pairs"]


def bucket_runs(
    sorted_keys: np.ndarray, max_bucket: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """(starts, counts) of multi-member buckets — runs of equal values
    in ``sorted_keys`` with ≥2 rows.  Counts are clipped to
    ``max_bucket``; callers sort by (bkey, id) beforehand so clipping
    keeps each bucket's smallest ids (deterministic truncation)."""
    n = sorted_keys.size
    if n < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    np.not_equal(sorted_keys[1:], sorted_keys[:-1], out=boundary[1:])
    starts = np.flatnonzero(boundary)
    counts = np.diff(np.append(starts, n))
    if max_bucket:
        counts = np.minimum(counts, max_bucket)
    sel = counts >= 2
    return starts[sel], counts[sel]


def sharded_bucket_pairs(
    exploded: rd.Dataset,
    score_fn: Callable[[pa.Table, np.ndarray, np.ndarray], pa.Table],
    empty: pa.Table,
    id_col: str = "doc_id",
    nshards: int = 1024,
    max_bucket: int | None = None,
) -> rd.Dataset:
    """One ``groupby(shard)`` shuffle over an exploded sketch table with
    a uint64 ``bkey`` column → ``score_fn(shard_table, starts, counts)``
    per shard, where ``shard_table`` is sorted by (bkey, id) and
    (starts, counts) are the contiguous runs of its ≥2-member buckets
    (clipped to ``max_bucket``).  ``score_fn`` returns kept pairs as a
    table matching ``empty``'s schema.
    """

    def add_shard(batch: pa.Table) -> pa.Table:
        bk = batch["bkey"].to_numpy(zero_copy_only=False)
        shard = (bk % np.uint64(nshards)).astype(np.int32)
        return batch.append_column("shard", pa.array(shard))

    def pair_shard(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return empty
        bk = group["bkey"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bk))
        starts, counts = bucket_runs(bk[order], max_bucket)
        if starts.size == 0:
            return empty
        st = group.take(pa.array(order))
        return score_fn(st, starts, counts)

    sharded = exploded.map_batches(add_shard, batch_format="pyarrow")
    return sharded.groupby("shard").map_groups(pair_shard, batch_format="pyarrow")
