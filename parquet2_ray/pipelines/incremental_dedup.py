"""Incremental dedup: new documents against a persisted corpus hash
index (P38).

The daily-ingest shape: a 100 TB historical corpus is already deduped
and encoded; each new crawl increment must drop (a) docs whose text
already exists in the historical corpus and (b) exact duplicates inside
the increment itself — WITHOUT re-reading the historical corpus.

Design (one shuffle of the increment's 20 B/row hash projection; the
historical side is touched only through its hash index):

- ``write_hash_index(ds, index_dir)`` — one-time (or per-ingest,
  appending): the corpus's ``hash_ids`` projection lands as parquet,
  hash-partitioned into ``nshards`` shard files of SORTED uint64
  hashes.  Size: 8 B per historical document (80 GB at 10^10 docs —
  distributed on storage, never on one machine).
- ``incremental_removal_ids(new_ds, index_dir)`` — hash the increment,
  ONE ``groupby(shard)`` exchange, and each shard task reads ONLY its
  own sorted shard file (column-projected parquet) and runs a
  ``searchsorted`` membership probe + in-increment min-id keeper.
  Exchange mass: O(new docs); historical bytes read: only the shards
  the increment actually hashes into — for a small increment against a
  huge corpus that is the whole point.
- ``append_hash_index(new_kept_ds, index_dir)`` — fold the kept
  increment's hashes into the index (per-shard sorted merge, atomic
  per-shard rewrite) so tomorrow's increment sees today's docs.

The same 64-bit content-hash equivalence as ``exact_removal_ids``
(distinct texts colliding ≈ 2^-64).  The reference has no dedup at all
— this extends SURVEY §2.10's P1/P3 family with the incremental shape
(GPT-3/Dolma-style ingest hygiene).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..state import fsio
from .dedup_pipeline import hash_ids

__all__ = [
    "write_hash_index",
    "incremental_removal_ids",
    "append_hash_index",
    "incremental_dedup",
]

_INDEX_SHARDS = 64


def _shard_path(index_dir: str, shard: int) -> str:
    return index_dir.rstrip("/") + f"/hashes-{shard:05d}.parquet"


def _write_shard_file(path: str, h: np.ndarray) -> None:
    # fs-generic atomic commit (state/fsio.py): local = tmp+rename,
    # object stores = one atomic PUT — same contract as the container
    sink = pa.BufferOutputStream()
    pq.write_table(pa.table({"h": pa.array(h, pa.uint64())}), sink)
    fsio.atomic_write(path, sink.getvalue().to_pybytes(), fsync=False)


def _read_shard_file(path: str) -> np.ndarray:
    if not fsio.exists(path):
        return np.empty(0, dtype=np.uint64)
    return pq.read_table(
        pa.BufferReader(fsio.read_bytes(path)))["h"].to_numpy()


def write_hash_index(
    ds: rd.Dataset,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    nshards: int = _INDEX_SHARDS,
) -> int:
    """Build the hash index of a corpus: ``nshards`` parquet files of
    sorted, DISTINCT uint64 content hashes.  Returns total distinct
    hashes.  One groupby(shard) exchange of the 20 B/row projection."""
    fsio.ensure_dir(index_dir)
    hashed = hash_ids(ds, text_col, id_col, nshards)

    def write_shard(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64())})
        shard = int(group["shard"][0].as_py())
        h = np.unique(group["h"].combine_chunks().to_numpy())  # sorted
        _write_shard_file(_shard_path(index_dir, shard), h)
        return pa.table({"shard": pa.array([shard], pa.int32()),
                         "n": pa.array([h.size], pa.int64())})

    written = (hashed.groupby("shard")
               .map_groups(write_shard, batch_format="pyarrow"))
    counts = {int(r["shard"]): int(r["n"]) for r in written.take_all()}
    # overwrite EVERY shard slot: a reused index_dir may hold shards
    # from a previous corpus, and a shard this corpus never hashed
    # into would silently keep the stale hashes (false removals)
    for s in range(nshards):
        if s not in counts:
            _write_shard_file(_shard_path(index_dir, s),
                              np.empty(0, dtype=np.uint64))
            counts[s] = 0
    total = sum(counts.values())
    _write_meta(index_dir, nshards, counts)
    return total


def _write_meta(index_dir: str, nshards: int, counts: dict) -> None:
    fsio.atomic_write(
        index_dir.rstrip("/") + "/_meta.json",
        json.dumps({"nshards": nshards,
                    "total": sum(counts.values()),
                    "shard_counts": {str(k): v for k, v in
                                     sorted(counts.items())}}).encode(),
        fsync=False)


def _index_meta(index_dir: str) -> dict:
    return json.loads(fsio.read_bytes(index_dir.rstrip("/") + "/_meta.json"))


def incremental_removal_ids(
    new_ds: rd.Dataset,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Ids of increment docs to drop: text already in the index, or an
    exact duplicate of an earlier (smaller-id) increment doc."""
    nshards = int(_index_meta(index_dir)["nshards"])
    hashed = hash_ids(new_ds, text_col, id_col, nshards)

    def probe(group: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], group[id_col].type)})
        if group.num_rows == 0:
            return empty
        shard = int(group["shard"][0].as_py())
        h = group["h"].combine_chunks().to_numpy()
        ids = group[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        seen = _read_shard_file(_shard_path(index_dir, shard))
        pos = np.searchsorted(seen, h)
        in_index = (pos < seen.size) & (
            seen[np.minimum(pos, max(seen.size - 1, 0))] == h) \
            if seen.size else np.zeros(h.size, dtype=bool)
        # in-increment dedupe: keep the smallest id per hash — run
        # segmentation shared with the batch dedup path (bucket_runs
        # returns multi-member runs of the (h, id)-sorted keys; every
        # member after a run's first is a duplicate)
        from ..stages.bucket_pairs import bucket_runs

        order = np.lexsort((ids, h))
        starts, cnts = bucket_runs(h[order])
        dup_tail = np.zeros(h.size + 1, dtype=np.int8)
        dup_tail[starts + 1] += 1
        np.subtract.at(dup_tail, starts + cnts, 1)
        not_keeper = np.zeros(h.size, dtype=bool)
        not_keeper[order] = np.cumsum(dup_tail[:-1]) > 0
        drop = in_index | not_keeper
        if not drop.any():
            return empty
        return pa.table({id_col: group[id_col].filter(pa.array(drop))})

    return (hashed.groupby("shard")
            .map_groups(probe, batch_format="pyarrow"))


def append_hash_index(
    kept_ds: rd.Dataset,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Fold a (deduped) increment's hashes into the index: per-shard
    sorted-unique merge, atomic rewrite.  Returns new total."""
    meta = _index_meta(index_dir)
    nshards = int(meta["nshards"])
    hashed = hash_ids(kept_ds, text_col, id_col, nshards)

    def merge_shard(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64())})
        shard = int(group["shard"][0].as_py())
        path = _shard_path(index_dir, shard)
        h = np.unique(np.concatenate(
            [_read_shard_file(path),
             group["h"].combine_chunks().to_numpy()]))
        _write_shard_file(path, h)
        return pa.table({"shard": pa.array([shard], pa.int32()),
                         "n": pa.array([h.size], pa.int64())})

    merged = (hashed.groupby("shard")
              .map_groups(merge_shard, batch_format="pyarrow"))
    # untouched shards keep their prior meta counts — the append stays
    # O(touched shards), never a full-index scan
    counts = {int(k): int(v) for k, v in
              meta.get("shard_counts", {}).items()}
    for r in merged.take_all():
        counts[int(r["shard"])] = int(r["n"])
    _write_meta(index_dir, nshards, counts)
    return sum(counts.values())


def incremental_dedup(
    new_ds: rd.Dataset,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    update_index: bool = True,
) -> rd.Dataset:
    """The composed ingest step: filter the increment against the index
    (+ itself), optionally fold the survivors' hashes back in.  The
    removal set is O(increment duplicates) — broadcast once."""
    import pyarrow.compute as pc

    from ..stages.dedup import gather_small

    sch = new_ds.schema()
    id_type = sch.types[list(sch.names).index(id_col)]
    removals = incremental_removal_ids(new_ds, index_dir, text_col, id_col)
    rm_tbl = gather_small(
        removals, pa.table({id_col: pa.array([], id_type)}))
    rm_ref = ray.put(rm_tbl[id_col].combine_chunks())

    def keep_only(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b[id_col], value_set=ray.get(rm_ref))
        return b.filter(pc.invert(mask))

    kept = new_ds.map_batches(keep_only, batch_format="pyarrow")
    if update_index:
        kept = kept.materialize()  # consumed twice: filter out + index fold
        append_hash_index(kept, index_dir, text_col, id_col)
    return kept
