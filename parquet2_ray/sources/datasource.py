"""Ray Data ``Datasource`` for the P2R1 container.

``decode_dataset`` (pipelines/encode_pipeline.py) streams containers
through ``from_items + map_batches``; this module exposes the SAME
read path through Ray Data's native datasource API, so a container
plugs into ``ray.data.read_datasource`` like any built-in format:

    import ray.data as rd
    from parquet2_ray.sources.datasource import P2RDatasource

    ds = rd.read_datasource(P2RDatasource(
        "/data/tokens_enc",            # or any pyarrow.fs URI
        columns=["doc_id", "n_tok"],   # projection pushdown
        key_range=("doc_id", "a", "m"),  # bloom/min-max + page-index
    ))

What the datasource pushes down (all reusing the manifest machinery):

- **partition pruning** on the driver: ``key_values`` probes each
  partition's SBBF bloom; ``key_range`` checks recorded min/max — both
  prune BEFORE any read task is launched, so the scheduler never sees
  skipped partitions.  Both are EXACT at row level too: surviving
  partitions are filtered to the requested values/range in the task;
- **block metadata**: every read task carries the manifest's exact row
  count and raw byte size, so Ray's streaming executor plans memory
  and progress from real numbers instead of guesses;
- **projection + sub-partition ranges** inside each task: only the
  named column chunks (and, for paged containers, only the row-blocks
  whose page index overlaps the range) are read from storage.

One read task per partition by default — the container's commit/retry
unit.  When the requested parallelism exceeds the partition count,
PAGED partitions fan out further: their footer's row-block list splits
into contiguous block-range read tasks (each reading only its own byte
sub-ranges), so one huge partition no longer serializes the scan.
Single-block partitions stay atomic (Ray coalesces below it).
"""

from __future__ import annotations

from typing import Iterable, List, Optional

import pyarrow as pa
import pyarrow.compute as pc

from ray.data.block import BlockMetadata
from ray.data.datasource import Datasource, ReadTask

from ..state import manifest as mf

__all__ = ["P2RDatasource"]


def _read_one(path: str, key_range, key_filter, columns,
              block_range=None, pad=None) -> pa.Table:
    """Decode one partition (or one block-range slice of a paged
    partition) with projection + exact predicate semantics (range, or
    key-membership for ``key_values`` — partition pruning alone would
    return every row of a bloom-surviving partition).  ``pad``: union
    fields of a schema-evolved container — partitions predating a
    column are harmonized (nulls) instead of failing."""
    from ..pipelines.encode_pipeline import _pad_to_union
    from ..stages.encode import decode_partition_path

    if key_range is None and key_filter is None:
        t = decode_partition_path(path, columns=columns,
                                  block_range=block_range,
                                  missing_ok=pad is not None)
        return t if pad is None else _pad_to_union(t, pad)
    if key_range is not None:
        kcol, lo, hi = key_range
    else:
        kcol, values = key_filter
        lo = hi = None
    read_cols = columns
    if columns is not None and kcol not in columns:
        read_cols = list(columns) + [kcol]
    t = decode_partition_path(path, kcol, lo, hi, columns=read_cols,
                              block_range=block_range,
                              missing_ok=pad is not None)
    if pad is not None:
        t = _pad_to_union(t, pad)
    m = None
    if key_filter is not None:
        m = pc.is_in(t[kcol], value_set=pa.array(list(key_filter[1])))
    if lo is not None:
        m = pc.greater_equal(t[kcol], lo)
    if hi is not None:
        m2 = pc.less_equal(t[kcol], hi)
        m = m2 if m is None else pc.and_(m, m2)
    if m is not None:
        t = t.filter(m)
    if columns is not None and kcol not in columns:
        t = t.drop_columns([kcol])
    return t


class P2RDatasource(Datasource):
    """Read a P2R1 container through ``ray.data.read_datasource``."""

    def __init__(
        self,
        container_dir: str,
        columns: Optional[List[str]] = None,
        key_values: Optional[Iterable] = None,
        key_range: Optional[tuple] = None,
        as_of: "Optional[int | str]" = None,
    ):
        if key_values is not None and key_range is not None:
            raise ValueError("pass key_values OR key_range, not both")
        # materialize once up front: key_values is consumed twice below
        # (partition pruning, then the exact row filter) — a generator
        # input would be empty on the second pass and silently drop
        # every row of the surviving partitions
        if key_values is not None:
            key_values = list(key_values)
        from ..pipelines.encode_pipeline import (
            prune_partitions,
            prune_partitions_by_range,
        )

        # as_of: time-travel read of a past snapshot (txn or tag; see
        # manifest.load_manifest) — pruning below reuses THIS record
        # set so the snapshot's own partitions are what gets pruned
        if isinstance(as_of, str):
            from ..pipelines.history_pipeline import resolve_as_of

            as_of = resolve_as_of(container_dir, as_of)
        records = mf.load_manifest(container_dir, as_of=as_of)
        if not records:
            raise FileNotFoundError(
                f"no committed partitions under {container_dir}")
        self._key_filter = None
        if key_values is not None:
            keep = set(prune_partitions(container_dir, key_values,
                                        records=records))
            # exact row semantics need the bloomed key column: rows of
            # bloom-surviving partitions are filtered to the value set
            kcols = {r.get("bloom_key") for r in records.values()
                     if r.get("bloom_key")}
            if len(kcols) != 1:
                raise ValueError(
                    "key_values needs exactly one manifest bloom_key; "
                    f"container has {sorted(kcols) or 'none'}")
            self._key_filter = (kcols.pop(), list(key_values))
        elif key_range is not None:
            keep = set(prune_partitions_by_range(container_dir, *key_range,
                                                 records=records))
        else:
            keep = {r["path"] for r in records.values()}
        self._parts = [r for r in sorted(records.values(),
                                         key=lambda r: r["part_id"])
                       if r["path"] in keep]
        self._columns = columns
        self._key_range = key_range
        self._exact_rows = key_range is None and self._key_filter is None
        # schema-evolved containers (P48): read tasks harmonize each
        # partition to the union (None = homogeneous, zero cost)
        from ..pipelines.encode_pipeline import _union_fields

        union = _union_fields(self._parts)
        if union is None:
            self._pad = None
        elif columns is None:
            self._pad = union
        else:
            need = set(columns)
            if key_range is not None:
                need.add(key_range[0])
            if self._key_filter is not None:
                need.add(self._key_filter[0])
            self._pad = [f for f in union if f[0] in need]

    def get_name(self) -> str:
        return "P2R1Container"

    def estimate_inmemory_data_size(self) -> Optional[int]:
        return sum(int(r.get("raw_bytes") or 0) for r in self._parts) or None

    def get_read_tasks(self, parallelism: int) -> List[ReadTask]:
        key_range, columns = self._key_range, self._columns
        key_filter = self._key_filter
        tasks: List[ReadTask] = []
        # requested parallelism above the partition count fans paged
        # partitions out into contiguous block-range read tasks (one
        # footer read per partition on the driver — same O(partitions)
        # metadata pass the pruning already makes); single-block
        # partitions stay atomic
        per = (-(-parallelism // len(self._parts))
               if parallelism > len(self._parts) > 0 else 1)
        for r in self._parts:
            path = r["path"]
            n_rows = int(r["n_rows"])
            raw_bytes = int(r.get("raw_bytes") or 0)
            blocks = None
            # deletion-vector records (P62) stay one task: a block-range
            # slice of the base decodes correctly under the mask, but the
            # per-slice row counts below would be base counts, and the
            # record's n_rows is the only exact masked count we have
            if per > 1 and not r.get("dv_base"):
                footer = mf.read_partition_footer(path)
                if footer.get("paged") and len(footer["blocks"]) > 1:
                    blocks = footer["blocks"]
            if blocks is None:
                meta = BlockMetadata(
                    # exact from the lineage manifest when nothing
                    # filters rows; unknown (None) under a predicate
                    num_rows=n_rows if self._exact_rows else None,
                    size_bytes=raw_bytes or None,
                    exec_stats=None,
                    input_files=[path],
                )

                def fn(path=path, pad=self._pad):
                    return [_read_one(path, key_range, key_filter, columns,
                                      pad=pad)]

                tasks.append(ReadTask(fn, meta))
                continue
            nb = len(blocks)
            nt = min(per, nb)
            bounds = [round(i * nb / nt) for i in range(nt + 1)]
            for s, e in zip(bounds[:-1], bounds[1:]):
                rows = sum(int(b["num_rows"]) for b in blocks[s:e])
                meta = BlockMetadata(
                    num_rows=rows if self._exact_rows else None,
                    # raw bytes prorated by the slice's row share
                    size_bytes=(raw_bytes * rows // n_rows
                                if raw_bytes and n_rows else None),
                    exec_stats=None,
                    input_files=[path],
                )

                def fn(path=path, s=s, e=e, pad=self._pad):
                    return [_read_one(path, key_range, key_filter,
                                      columns, block_range=(s, e),
                                      pad=pad)]

                tasks.append(ReadTask(fn, meta))
        return tasks
