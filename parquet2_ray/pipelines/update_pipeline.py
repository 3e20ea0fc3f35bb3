"""Predicate UPDATE over an encoded container (``update_rows``) — the
third leg of the DML family (DELETE = delete_pipeline, MERGE-by-key =
upsert_pipeline): ``UPDATE t SET col = v, ... WHERE pred`` expressed in
the container's commit algebra.

Shares the delete machinery end to end: the WHERE predicate is the same
``(column, lo, hi)`` range / value-list shape, partitions whose
recorded min/max + bloom cannot contain a match are PROVEN untouched
(no read, no write), each touched partition decodes → assigns →
re-encodes under a fresh id whose record ``replaces`` the old one (the
same single-commit visibility flip), and the whole pass shares ONE txn
stamp so time travel / CDC see it as one transaction.  A touched
partition with zero actual matches (bloom/range false positive)
commits nothing.

Assignments are copy-on-write by nature (a changed row has new bytes —
a deletion vector cannot express it), applied positionally with
``pc.if_else`` so row order inside the partition is preserved and every
unmatched row's bytes re-encode bit-identically.  ``SET`` values are
scalars (cast to the column's type up front — a type error refuses
before any partition is touched) or callables ``fn(tbl) -> Array`` for
computed updates (``value * 2``); assigning list/struct/map columns is
refused (no positional kernel), as is assigning the predicate column a
callable of itself (the scalar form is fine — the mask is computed
first).

No reference analog: parquet2 is a file codec library; this is the
Delta/Iceberg ``UPDATE`` shape on the lineage layer.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..state import manifest as mf
from .append_pipeline import _load_sessions
from .compact_pipeline import _raw_record_ids
from .delete_pipeline import predicate_mask, prune_touch_set, union_tmap

__all__ = ["update_rows"]


@ray.remote
def _update_partition(out_dir: str, new_id: int, member: dict,
                      column: str, lo, hi, values, assignments: dict,
                      fsync: bool, txn: int) -> dict:
    from ..stages.encode import decode_partition_path, encode_partition_table

    tbl = decode_partition_path(member["path"])
    if column not in tbl.column_names:
        # evolved partition predating the predicate column: all-null
        # there, and null rows never match (SQL semantics)
        return {"new": None, "old": member["part_id"], "updated": 0}
    mask = predicate_mask(tbl, column, lo, hi, values)
    if isinstance(mask, pa.ChunkedArray):
        mask = mask.combine_chunks()
    n_match = int(pc.sum(mask).as_py() or 0)
    if n_match == 0:
        return {"new": None, "old": member["part_id"], "updated": 0}
    for name, val in assignments.items():
        cand = None
        if callable(val):
            cand = val(tbl)
            if isinstance(cand, pa.ChunkedArray):
                cand = cand.combine_chunks()
            if not isinstance(cand, pa.Array):
                cand = pa.array(cand)
            if len(cand) != tbl.num_rows:
                raise ValueError(
                    f"SET {name}: callable returned {len(cand)} values "
                    f"for {tbl.num_rows} rows")
        if name not in tbl.column_names:
            # evolved partition predating the SET column: its rows are
            # null in that column; assignment materializes it
            ctype = cand.type if cand is not None else pa.scalar(val).type
            tbl = tbl.append_column(name, pa.nulls(tbl.num_rows, ctype))
        arr = tbl[name].combine_chunks()
        cand = (cand.cast(arr.type) if cand is not None
                else pa.scalar(val, arr.type))
        new_arr = pc.if_else(mask, cand, arr)
        tbl = tbl.set_column(tbl.column_names.index(name), name, new_arr)
    eo = member.get("encoding_opts") or {}
    rec = encode_partition_table(
        tbl, out_dir,
        sort_key=member.get("sort_key") or None,
        weight_col=member.get("weight_col"),
        forced_codecs=eo.get("forced_codecs") or {},
        resume=True,
        compression=eo.get("compression"),
        fsync=fsync,
        rows_per_block=eo.get("rows_per_block"),
        extra_record={"replaces": sorted(
            {member["part_id"]} | set(member.get("replaces") or ())),
            "txn": txn, "op": "update"},
        part_id=f"p{new_id:06d}",
    )
    r = rec.to_pylist()[0]
    return {"new": r["part_id"], "old": member["part_id"],
            "updated": n_match}


def update_rows(
    out_dir: str,
    column: str,
    set: dict,
    lo=None,
    hi=None,
    values=None,
    fsync: bool = True,
) -> dict:
    """UPDATE ... SET ``set`` WHERE ``column`` ∈ [lo, hi] (closed,
    either bound open) or ``column`` ∈ ``values``.  ``set`` maps column
    names to scalar values or ``fn(tbl) -> Array`` callables.  Returns
    a summary with per-partition update counts; untouched partitions
    are proven untouched by the manifest stats, not by reading them."""
    if (lo is None and hi is None) == (values is None):
        raise ValueError("pass lo/hi OR values")
    if not set:
        raise ValueError("SET is empty: nothing to update")
    records = mf.load_manifest(out_dir)
    if not records:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    # generated columns (P74): the positional kernel cannot recompute a
    # derived column, so SET of a generated name (direct corruption) or
    # of a generated column's SOURCE (would leave the derived value
    # stale) is refused — route such changes through upsert, whose
    # ingest hook re-derives
    from .generated_pipeline import get_generated

    gspecs = get_generated(out_dir)
    if gspecs:
        sources = {s[1]: n for n, s in gspecs.items()}
        for name in set:
            if name in gspecs:
                raise ValueError(
                    f"SET {name}: generated column — its value is "
                    "derived; update the source column via upsert")
            if name in sources:
                raise ValueError(
                    f"SET {name}: source of generated column "
                    f"{sources[name]!r} — a positional update would "
                    "leave the derived value stale; use upsert")
    tmap = union_tmap(records, column, op_name="update")
    from ..codecs.column import str_to_type

    for name, val in set.items():
        ts = tmap.get(name)
        if ts is None:
            continue          # evolution-style new column: materialized
        if ts.startswith(("list<", "large_list<", "struct<", "map<")):
            raise ValueError(
                f"SET {name}: {ts} columns have no positional update "
                "kernel — rewrite via compact/recluster instead")
        if not callable(val):
            # refuse a miscast scalar BEFORE any partition is touched
            try:
                pa.scalar(val, str_to_type(ts))
            except (pa.ArrowInvalid, pa.ArrowTypeError,
                    OverflowError) as e:
                raise ValueError(
                    f"SET {name}: value {val!r} does not cast to the "
                    f"column type {ts}: {e}") from e
    # declared CHECK constraints (P65): scalar SET values are checked
    # against the constraints on their columns BEFORE any partition is
    # touched (deterministic — the assigned value either satisfies the
    # predicate or not).  Callable SETs are data-dependent and are NOT
    # constraint-checked (documented limitation, mirrors engines that
    # restrict CHECK enforcement to literal updates)
    from .constraints_pipeline import (
        ConstraintViolation,
        check_table,
        get_constraints,
    )

    scalar_sets = {k: v for k, v in set.items() if not callable(v)}
    cs = [c for c in get_constraints(out_dir)
          if c["column"] in scalar_sets and c["op"] != "unique"]
    if cs:
        probe = pa.table({k: pa.array([v])
                          for k, v in scalar_sets.items()})
        bad = {k: v for k, v in check_table(probe, cs).items() if v}
        if bad:
            raise ConstraintViolation(
                f"UPDATE SET values violate container constraints: "
                f"{bad}", bad)
    sessions = _load_sessions(out_dir)
    pending = next((s for s in sessions if s.get("n_parts") is None), None)
    if pending is not None:
        raise RuntimeError(
            f"container has an unfinished append "
            f"{pending['append_id']!r}: resume it before updating")
    touch_paths = prune_touch_set(out_dir, records, column, lo, hi,
                                  values, op_name="update")
    touched = [r for r in records.values()
               if r["path"] in touch_paths and r["n_rows"] > 0]
    if not touched:
        return {"n_touched": 0, "n_updated": 0,
                "n_partitions": len(records), "out_dir": out_dir}

    committed_max = max(_raw_record_ids(out_dir), default=-1)
    reserved_max = max(
        (int(s["base"]) + int(s["n_parts"]) - 1 for s in sessions),
        default=-1)
    base = max(committed_max, reserved_max) + 1

    from .append_pipeline import next_txn_all, refold_global

    txn = next_txn_all(out_dir)   # one snapshot stamp per update pass
    results = ray.get([
        _update_partition.remote(out_dir, base + i, m, column,
                                 lo, hi, values, set, fsync, txn)
        for i, m in enumerate(
            sorted(touched, key=lambda r: int(r["part_id"][1:])))
    ])
    combined = refold_global(out_dir)
    return {
        "n_touched": sum(1 for r in results if r["new"] is not None),
        "n_updated": int(sum(r["updated"] for r in results)),
        "n_partitions": combined["n_partitions"],
        "n_rows": combined["n_rows"],
        "out_dir": out_dir,
    }
