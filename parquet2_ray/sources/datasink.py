"""Ray Data ``Datasink`` for the P2R1 container.

The planned writer (``encode_dataset``) stays the production path —
it balances token weight across partitions with one explicit exchange
and gives fingerprint-keyed resume.  This sink is the EXCHANGE-FREE
complement for data that is already partitioned the way the caller
wants (or for ad-hoc exports from any Ray Data pipeline):

    ds.write_datasink(P2RDatasink(out_dir, sort_key="doc_id"))

Each write task encodes its incoming blocks as container partitions
AS-IS (codec auto-selection, stats, blooms, lineage record — the full
per-partition contract from stages/encode.py), so the write streams
with backpressure and never materializes the dataset.  Partition ids
come from ``(write-task index, block index)``; Ray retries a failed
write task wholesale, and the atomic commit makes that safe — but
because block→task assignment is Ray's, a RE-RUN of a different
pipeline instance does not resume (use ``encode_dataset`` when you
need cross-run resume).
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa

from ray.data import Datasink
from ray.data.datasource import WriteResult

from ..state import fsio
from ..state import manifest as mf

__all__ = ["P2RDatasink"]

_BLOCKS_PER_TASK = 100_000  # part-id stride: task_idx * stride + block_idx


class P2RDatasink(Datasink):
    """``ds.write_datasink(P2RDatasink(out_dir))`` → P2R1 container."""

    def __init__(
        self,
        out_dir: str,
        sort_key: str | list[str] | None = None,
        weight_col: str | None = None,
        compression: str | None = None,
        fsync: bool = True,
    ):
        self._out_dir = out_dir
        self._sort_key = sort_key
        self._weight_col = weight_col
        self._compression = compression
        self._fsync = fsync

    def get_name(self) -> str:
        return "P2R1Container"

    @property
    def supports_distributed_writes(self) -> bool:
        return True

    def on_write_start(self) -> None:
        fsio.ensure_dir(self._out_dir)

    def write(self, blocks: Iterable, ctx) -> list:
        from ..stages.encode import PART_COL, encode_partition_table

        recs = []
        for i, b in enumerate(blocks):
            if not isinstance(b, pa.Table):
                b = pa.Table.from_pandas(b)
            if b.num_rows == 0:
                continue
            pid = ctx.task_idx * _BLOCKS_PER_TASK + i
            b = b.append_column(
                PART_COL, pa.array([pid] * b.num_rows, type=pa.int64()))
            rec = encode_partition_table(
                b, self._out_dir,
                sort_key=self._sort_key,
                weight_col=self._weight_col,
                compression=self._compression,
                fsync=self._fsync,
            )
            r = rec.to_pylist()[0]
            recs.append({"part_id": r["part_id"], "n_rows": r["n_rows"],
                         "raw_bytes": r["raw_bytes"],
                         "encoded_bytes": r["encoded_bytes"]})
        return recs

    def on_write_complete(self, write_result: "WriteResult") -> None:
        rows = [r for task in (write_result.write_returns or [])
                for r in task]
        mf.write_global_manifest(self._out_dir, {
            "n_partitions": len(rows),
            "n_rows": sum(r["n_rows"] for r in rows),
            "raw_bytes": sum(r["raw_bytes"] for r in rows),
            "encoded_bytes": sum(r["encoded_bytes"] for r in rows),
            "writer": "P2RDatasink",
        })
