"""End-to-end corpus deduplication: exact → near-dup → filtered corpus.

The pipeline a training-data user actually runs ("give me the corpus
with duplicates removed"), composed from the stage library:

1. **Exact removals** — content-hash per batch, ONE ``groupby`` shuffle
   of (hash, id, shard) rows (16 B/row — texts never move), duplicate
   runs found vectorized inside shard tasks (same shard-grouping as
   ``stages/bucket_pairs``: per-group ``map_groups`` would die of
   singleton-group Python dispatch), every member but the smallest id
   marked for removal.
2. **Near-dup removals** — MinHash+LSH candidates verified by exact
   k-gram Jaccard (``stages.dedup.verified_neardup_pairs``); the
   larger id of every verified pair is removed (greedy min-id keeper;
   deterministic and SQL-expressible, unlike transitive closure).
3. **Filter** — the removal id set (O(duplicates), small by
   construction) is broadcast once via ``ray.put``; the corpus streams
   through a ``map_batches`` anti-filter.  Nothing else materializes.

Scale note (100 TB): the broadcast holds while removals fit a worker
heap (~10^9 ids).  For duplicate-heavier corpora, hash-partition the
removal ids into B sorted buckets and have each filter task fetch only
the buckets its id-range needs — or, when the corpus is already
hash-partitioned by id (our encode container), turn the filter into a
per-partition sorted-merge anti-join.  ``Dataset.join`` (Ray ≥2.46)
is the last-resort generic path; it shuffles the full corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

__all__ = ["hash_ids", "removals_from_hashes", "exact_removal_ids",
           "dedup_corpus"]


def hash_ids(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    nshards: int = 1024,
) -> rd.Dataset:
    """Narrow (h, id, shard) projection of the corpus — ~20 B/row.

    Split out of :func:`exact_removal_ids` so a composite pipeline can
    ``materialize()`` THIS (bounded) dataset once, count it for free,
    and feed the shard groupby — instead of materializing the corpus
    itself or re-running the upstream scrub lineage per consumer."""
    from ..functions.hashing import hash_strings

    def add_h(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas().fillna("").to_numpy(dtype=object)
        h = hash_strings(texts).astype(np.uint64)
        return pa.table({
            "h": pa.array(h),
            id_col: batch[id_col],
            "shard": pa.array((h % np.uint64(nshards)).astype(np.int32)),
        })

    return ds.map_batches(add_h, batch_format="pyarrow")


def removals_from_hashes(
    hashed: rd.Dataset,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Duplicate ids from a :func:`hash_ids` dataset — every member of
    a hash run except the smallest id, via ONE shard groupby."""
    from ..stages.bucket_pairs import bucket_runs

    def rm(group: pa.Table) -> pa.Table:
        empty = group.select([id_col]).slice(0, 0)
        if group.num_rows < 2:
            return empty
        h = group["h"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        starts, counts = bucket_runs(h[order])  # full runs — never clipped
        if starts.size == 0:
            return empty
        idx = np.concatenate(
            [np.arange(s + 1, s + c) for s, c in zip(starts.tolist(), counts.tolist())]
        )
        keep = group.select([id_col]).take(pa.array(order[idx]))
        return keep

    return hashed.groupby("shard").map_groups(rm, batch_format="pyarrow")


def exact_removal_ids(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    nshards: int = 1024,
) -> rd.Dataset:
    """Ids of every row whose text equals an earlier (smaller-id) row's
    text — one (id) row per removal.  Distinct texts colliding under
    the 64-bit content hash would merge groups (~2^-64; the same
    equivalence q_dedup_exact's oracle accepts)."""
    return removals_from_hashes(
        hash_ids(ds, text_col, id_col, nshards), id_col)


def dedup_corpus(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    near: bool = True,
    k: int = 5,
    candidate_threshold: float = 0.5,
    exact_threshold: float = 0.5,
    hasher: str = "fast",
    max_bucket: int | None = 1024,
    nshards: int = 1024,
    cluster_exact: bool = False,
    cc_max_rounds: int = 16,
    cc_nshards: int = 64,
) -> rd.Dataset:
    """The surviving corpus (all input columns), streaming.

    ``near=True`` additionally removes near-duplicates found by
    verified MinHash pairs.  Two removal policies:

    - default (``cluster_exact=False``): the larger id of every
      verified pair is removed — greedy, deterministic and
      SQL-expressible (the oracle configuration);
    - ``cluster_exact=True``: pairs feed distributed connected
      components (``stages/components.py``) and exactly the MINIMUM id
      of every duplicate CLUSTER survives — the transitive-closure
      semantics (a–b, b–c chains collapse to {a} even when (a,c) was
      never a candidate pair).

    ``hasher="md5"`` + ``max_bucket=None`` is the SQL-oracle
    configuration (DuckDB reproduces the full pipeline: window-function
    exact keepers + the verified-pair anti-join).
    """
    import pyarrow.compute as pc

    from ..stages.dedup import gather_small, verified_neardup_pairs

    schema = ds.schema()  # metadata-only for parquet inputs
    idx = list(schema.names).index(id_col)
    t = schema.types[idx]
    # pandas-block datasets report numpy dtypes, not Arrow types
    id_type = t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(t)
    empty_ids = pa.table({id_col: pa.array([], type=id_type)})
    removal = gather_small(
        exact_removal_ids(ds, text_col, id_col, nshards), empty_ids
    )[id_col].combine_chunks()
    if near:
        pairs = verified_neardup_pairs(
            ds, text_col=text_col, id_col=id_col, k=k,
            candidate_threshold=candidate_threshold,
            exact_threshold=exact_threshold,
            hasher=hasher, max_bucket=max_bucket,
        )
        if cluster_exact and pairs.num_rows:
            from ..stages.components import cluster_dedup_keepers

            rm_ds = cluster_dedup_keepers(
                rd.from_arrow(pairs.select(["id_a", "id_b"])),
                max_rounds=cc_max_rounds, nshards=cc_nshards)
            near_removals = gather_small(
                rm_ds, pa.table({"remove_id": pa.array([], pa.int64())})
            )["remove_id"].combine_chunks()
        else:
            near_removals = pairs["id_b"].combine_chunks()
        removal = pa.concat_arrays([removal, near_removals.cast(id_type)])
    removal = pc.unique(removal)
    rm_ref = ray.put(removal)  # broadcast once, read per task

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[id_col], value_set=ray.get(rm_ref))
        return batch.filter(pc.invert(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
