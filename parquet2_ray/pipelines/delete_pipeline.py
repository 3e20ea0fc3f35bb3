"""Row deletes over an encoded container (`delete_rows`) — the
retention / right-to-be-forgotten op a long-lived 100 TB corpus needs.

Reuses the compaction machinery end to end:

- **pruning first**: partitions whose recorded min/max cannot overlap
  the predicate are untouched (no read, no write) — a targeted delete
  touches O(matching partitions), never the container;
- **atomic flip**: each touched partition is decoded, filtered, and
  re-encoded under a NEW id whose record carries
  ``replaces=[old id]`` — the same single-commit visibility flip
  compaction uses (``manifest.load_manifest`` hides the old id the
  instant the new record lands, so a crash leaves either the old rows
  or the new rows visible, never both/neither);
- a partition whose rows are ALL deleted re-encodes as an EMPTY
  partition (a tombstone record with ``n_rows=0`` — readers decode it
  to zero rows; the next ``compact_container`` GC folds it away).

Predicates: ``(column, lo, hi)`` closed-interval range (either bound
open) or an explicit value list — the two shapes the manifest's
min/max + bloom stats can prune.  Single writer per container, same as
append/compact.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..state import manifest as mf
from .append_pipeline import _load_sessions
from .compact_pipeline import _raw_record_ids

__all__ = ["delete_rows"]


@ray.remote
def _rewrite_partition(out_dir: str, new_id: int, member: dict,
                       column: str, lo, hi, values, fsync: bool,
                       txn: int, mode: str = "rewrite") -> dict:
    from ..stages.encode import decode_partition_path, encode_partition_table

    tbl = decode_partition_path(member["path"])
    if column not in tbl.column_names:
        # schema-evolved container: this partition predates (or omitted)
        # the predicate column — its rows are all null there and null
        # rows never match a delete predicate (SQL semantics), so it is
        # PROVEN untouched; commit nothing and leave the old id active
        return {"new": None, "old": member["part_id"],
                "deleted": 0, "remaining": tbl.num_rows}
    keep = pc.invert(predicate_mask(tbl, column, lo, hi, values))
    kept = tbl.filter(keep)
    if mode == "dv" and 0 < kept.num_rows < tbl.num_rows:
        return _commit_dv(out_dir, new_id, member, keep, kept, fsync, txn)
    if mode == "dv" and kept.num_rows == tbl.num_rows:
        # stats-touched but zero actual matches: merge-on-read commits
        # nothing (the rewrite mode keeps its historical re-encode
        # semantics; here a no-op sidecar would only add read cost)
        return {"new": None, "old": member["part_id"],
                "deleted": 0, "remaining": tbl.num_rows}
    # mode == "rewrite", or a dv full-delete (an all-zero mask would
    # pin the whole base file to serve 0 rows — an empty re-encode
    # tombstone is strictly better)
    eo = member.get("encoding_opts") or {}
    rec = encode_partition_table(
        kept, out_dir,
        sort_key=member.get("sort_key") or None,
        weight_col=member.get("weight_col"),
        forced_codecs=eo.get("forced_codecs") or {},
        resume=True,
        compression=eo.get("compression"),
        fsync=fsync,
        rows_per_block=eo.get("rows_per_block"),
        extra_record={"replaces": sorted(
            {member["part_id"]} | set(member.get("replaces") or ())),
            "txn": txn, "op": "delete"},
        part_id=f"p{new_id:06d}",
    )
    r = rec.to_pylist()[0]
    return {"new": r["part_id"], "old": member["part_id"],
            "deleted": tbl.num_rows - kept.num_rows,
            "remaining": kept.num_rows}


def _commit_dv(out_dir: str, new_id: int, member: dict,
               keep: pa.BooleanArray, kept: pa.Table,
               fsync: bool, txn: int, extra: dict | None = None) -> dict:
    """Merge-on-read delete of one partition: write a deletion-vector
    sidecar over the (ultimate) base file + commit a manifest record
    whose stats/fingerprint describe the MASKED view.  A member that is
    already a DV record composes masks at write time, so readers only
    ever resolve ONE level (decode stays a single extra pread).

    ``extra``: fields merged into the record in the same atomic commit
    (an upsert's ``family`` staging + ``op`` stamp ride here)."""
    import time

    import numpy as np

    from ..functions.stats import column_profile

    t0 = time.time()
    keep_np = keep.combine_chunks().to_numpy(zero_copy_only=False)
    base_path, base_mask = member["path"], keep_np
    raw_footer = mf.read_partition_footer(member["path"], resolve_dv=False)
    if "dv_base" in raw_footer:
        _, old = mf.read_dv_mask(member["path"])
        composed = old.copy()
        composed[np.flatnonzero(old)] = keep_np
        base_mask = composed
        base_path = mf.resolve_dv_base(member["path"], raw_footer)
    pid = f"p{new_id:06d}"
    fp = mf.canonical_fingerprint(kept)   # base order is canonical;
    # a masked subset of a sorted partition stays sorted
    dv_path = os.path.join(out_dir, f"part-{pid}.bin")
    nbytes = mf.write_dv_file(
        dv_path, base_path, base_mask,
        extra={"part_id": pid, "fingerprint": fp}, fsync=fsync)
    n_weight = 0
    wcol = member.get("weight_col")
    if wcol and wcol in kept.column_names:
        n_weight = int(pc.sum(kept[wcol]).as_py() or 0)
    bloom_b64 = bloom_type = None
    sk = member.get("sort_key") or []
    bloom_col = member.get("bloom_key") or (sk[0] if sk else None)
    if bloom_col and bloom_col in kept.column_names and kept.num_rows:
        import base64

        from ..functions import bloom

        key_arr = kept[bloom_col].combine_chunks()
        h = bloom.hash_arrow(key_arr)
        bits = bloom.build(h, bloom.num_blocks_for(kept.num_rows))
        bloom_b64 = base64.b64encode(bits).decode()
        from ..codecs import column as col_mod

        bloom_type = col_mod.type_to_str(key_arr.type)
    rec = {
        "part_id": pid,
        "path": dv_path,
        "fingerprint": fp,
        "n_rows": kept.num_rows,
        "n_weight": n_weight,
        "raw_bytes": kept.nbytes,
        "encoded_bytes": nbytes,      # NEW bytes this commit wrote;
        "base_encoded_bytes": member["encoded_bytes"],  # serve cost
        "codecs": member.get("codecs") or {},
        "profiles": [column_profile(n, kept[n].combine_chunks())
                     for n in kept.column_names],
        "sort_key": sk,
        "boundary_order": member.get("boundary_order", "unordered"),
        "dict_is_sorted": member.get("dict_is_sorted") or {},
        "weight_col": wcol,
        "bloom_key": bloom_col if bloom_b64 else None,
        "bloom": bloom_b64,
        "bloom_type": bloom_type,
        "encoding_opts": member.get("encoding_opts") or {},
        "dv_base": base_path,
        "base_rows": int(base_mask.size),
        "replaces": sorted(
            {member["part_id"]} | set(member.get("replaces") or ())),
        "txn": txn,
        "op": "delete",
        "wall_s": time.time() - t0,
        "skipped": False,
    }
    if extra:
        rec.update(extra)
    mf.commit_manifest_record(out_dir, rec, fsync=fsync)
    return {"new": pid, "old": member["part_id"],
            "deleted": int(keep_np.size - kept.num_rows),
            "remaining": kept.num_rows}


def union_tmap(records: dict, column: str, op_name: str) -> dict:
    """Validate a scalar predicate column against the container's
    UNION schema up front — a missing or non-comparable (list/struct/
    map) column would otherwise fail deep inside a rewrite task after
    partitions were already touched.  On an evolved container the
    column may postdate the oldest partition (still a valid predicate
    — partitions without it are proven untouched).  Returns the
    name→arrow_type map (shared with update_rows)."""
    from .encode_pipeline import _union_fields

    union = _union_fields(list(records.values()))
    if union is None:
        first = min(records, key=lambda p: int(p[1:]))   # numeric, not str
        footer = mf.read_partition_footer(records[first]["path"])
        cols = (footer["blocks"][0]["columns"] if footer.get("paged")
                else footer["columns"])
        union = [(m["name"], m["arrow_type"]) for m in cols]
    tmap = dict(union)
    if column not in tmap:
        raise ValueError(
            f"column {column!r} not in container schema "
            f"({sorted(tmap)})")
    ts = tmap[column]
    if ts.startswith(("list<", "large_list<", "struct<", "map<")):
        raise ValueError(
            f"column {column!r} is {ts}: {op_name} predicates need a "
            "comparable scalar column")
    return tmap


def prune_touch_set(out_dir: str, records: dict, column: str,
                    lo, hi, values, op_name: str) -> set:
    """Manifest-stats pruning of a scalar predicate's touch set —
    range prune over [min,max] (of the value set for IN-predicates),
    bloom-refined only where a record's bloom indexes THIS column
    (probing another column's bloom would false-prune and silently
    miss matching rows).  Shared by delete_rows and update_rows."""
    from .encode_pipeline import prune_partitions_by_range

    if values is not None:
        vals = [v for v in values]
        if not vals:
            raise ValueError(f"values is empty: nothing to {op_name}")
        if any(v is None for v in vals):
            raise ValueError(
                f"values contains None: null rows never match a "
                f"{op_name} predicate (SQL semantics) — drop the None")
        touch_paths = set(prune_partitions_by_range(
            out_dir, column, lo=min(vals), hi=max(vals)))

        import base64

        from ..functions import bloom as _bloom

        hashes_by_type: dict = {}
        for r in records.values():
            if r["path"] not in touch_paths:
                continue
            if r.get("bloom_key") == column and r.get("bloom") \
                    and r.get("bloom_type"):
                ts = r["bloom_type"]
                if ts not in hashes_by_type:
                    hashes_by_type[ts] = _bloom.hash_values(vals, ts)
                if not _bloom.might_contain(
                        base64.b64decode(r["bloom"]),
                        hashes_by_type[ts]).any():
                    touch_paths.discard(r["path"])
        return touch_paths
    return set(prune_partitions_by_range(out_dir, column, lo=lo, hi=hi))


def predicate_mask(tbl: pa.Table, column: str, lo, hi, values):
    """Boolean match mask of the scalar predicate over one decoded
    partition (nulls never match).  Shared by delete/update."""
    col = tbl[column]
    if values is not None:
        m = pc.is_in(col, value_set=pa.array(values, col.type))
    else:
        m = None
        if lo is not None:
            m = pc.greater_equal(col, lo)
        if hi is not None:
            m2 = pc.less_equal(col, hi)
            m = m2 if m is None else pc.and_(m, m2)
    return pc.fill_null(m, False)


def delete_rows(
    out_dir: str,
    column: str,
    lo=None,
    hi=None,
    values=None,
    fsync: bool = True,
    mode: str = "rewrite",
) -> dict:
    """Delete rows where ``column`` ∈ [lo, hi] (closed; either bound
    may be None) or ``column`` ∈ ``values``.  Returns a summary with
    per-partition delete counts; untouched partitions are proven
    untouched by the manifest stats, not by reading them.

    ``mode="rewrite"`` (default): copy-on-write — each touched
    partition re-encodes without the matching rows.  ``mode="dv"``:
    merge-on-read — each touched partition commits a tiny
    DELETION-VECTOR sidecar (keep-bitmap over the base file) instead
    of a rewrite; readers apply the mask at decode.  At 100 TB the dv
    mode turns a 0.1%-row retention delete from a terabyte rewrite
    into O(touched partitions) KB-sized sidecars; the next
    ``compact_container`` folds masks into real rewrites and the sweep
    then reclaims the bases.  Repeated dv deletes COMPOSE at write
    time (readers always resolve exactly one level); a dv delete that
    empties a partition falls back to an empty rewrite tombstone."""
    if (lo is None and hi is None) == (values is None):
        raise ValueError("pass lo/hi OR values")
    if mode not in ("rewrite", "dv"):
        raise ValueError(f"mode must be 'rewrite' or 'dv', got {mode!r}")
    records = mf.load_manifest(out_dir)
    if not records:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    union_tmap(records, column, op_name="delete")
    sessions = _load_sessions(out_dir)
    pending = next((s for s in sessions if s.get("n_parts") is None), None)
    if pending is not None:
        raise RuntimeError(
            f"container has an unfinished append "
            f"{pending['append_id']!r}: resume it before deleting")
    touch_paths = prune_touch_set(out_dir, records, column, lo, hi,
                                  values, op_name="delete")
    # 0-row tombstones always survive pruning (no stats) but cannot
    # match anything — skipping them avoids churning a fresh id and
    # rewrite task per tombstone on every delete
    touched = [r for r in records.values()
               if r["path"] in touch_paths and r["n_rows"] > 0]
    if not touched:
        return {"n_touched": 0, "n_deleted": 0,
                "n_partitions": len(records), "out_dir": out_dir}

    committed_max = max(_raw_record_ids(out_dir), default=-1)
    reserved_max = max(
        (int(s["base"]) + int(s["n_parts"]) - 1 for s in sessions),
        default=-1)
    base = max(committed_max, reserved_max) + 1

    from .append_pipeline import next_txn_all

    txn = next_txn_all(out_dir)   # one snapshot stamp per delete pass
    results = ray.get([
        _rewrite_partition.remote(out_dir, base + i, m, column,
                                  lo, hi, values, fsync, txn, mode)
        for i, m in enumerate(
            sorted(touched, key=lambda r: int(r["part_id"][1:])))
    ])
    from .append_pipeline import refold_global

    combined = refold_global(out_dir)   # keep the sidecar fresh
    return {
        "n_touched": sum(1 for r in results if r["new"] is not None),
        "n_deleted": int(sum(r["deleted"] for r in results)),
        "tombstones": [r["new"] for r in results
                       if r["remaining"] == 0 and r["new"] is not None],
        "n_partitions": combined["n_partitions"],
        "n_rows": combined["n_rows"],
        "out_dir": out_dir,
    }
