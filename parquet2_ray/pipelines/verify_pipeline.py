"""Decode-verify pipeline: prove bit-identity per partition, at scale.

Two verification modes:

- ``verify_manifest``: per-partition, distributed — decode each
  committed container, recompute the canonical fingerprint, compare to
  the fingerprint the encode task recorded. Because the fingerprint is
  computed over the sort_key-canonicalized content, equality proves
  BIT-IDENTITY of every row without a join — this is the scalable path
  (no all-to-all; one task per partition).

- ``verify_against_source``: test-sized — decode everything, sort both
  sides by a key, compare tables exactly (the per-row "token-array
  equality vs the reference" check, done the way the reference's own
  pyarrow integration tests compare values — SURVEY.md §5).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..stages.encode import decode_partition_path
from ..state import manifest as mf

__all__ = ["verify_manifest", "verify_against_source"]


def verify_manifest(out_dir: str) -> dict:
    records = mf.load_manifest(out_dir)
    if not records:
        raise FileNotFoundError(f"no manifest under {out_dir}")
    items = [
        {"part_id": r["part_id"], "path": r["path"], "expected": r["fingerprint"]}
        for r in records.values()
    ]

    def _check(batch: pa.Table) -> pa.Table:
        oks, pids = [], []
        for pid, path, expected in zip(
            batch["part_id"], batch["path"], batch["expected"]
        ):
            tbl = decode_partition_path(path.as_py())
            fp = mf.canonical_fingerprint(tbl)  # rows are already canonical order
            oks.append(fp == expected.as_py())
            pids.append(pid.as_py())
        return pa.table({"part_id": pids, "ok": oks})

    out = rd.from_items(items).map_batches(_check, batch_format="pyarrow")
    rows = out.take_all()
    bad = [r["part_id"] for r in rows if not r["ok"]]
    return {"n_partitions": len(rows), "n_bad": len(bad), "bad": bad[:20]}


def verify_against_source(
    source: pa.Table, out_dir: str, key: str
) -> bool:
    """Exact equality (order-insensitive via key sort). Test-sized only."""
    decoded = pa.concat_tables(_iter_tables(out_dir)).combine_chunks()
    src = source.select(decoded.column_names).combine_chunks()
    a = src.take(pc.sort_indices(src[key])).combine_chunks()
    b = decoded.take(pc.sort_indices(decoded[key])).combine_chunks()
    return a.equals(b)


def _iter_tables(out_dir: str):
    for r in mf.load_manifest(out_dir).values():
        yield decode_partition_path(r["path"])
