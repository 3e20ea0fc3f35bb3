"""Upsert (MERGE-style last-write-wins by key) over an encoded
container — the lakehouse op that completes the maintenance family:
rows in the increment REPLACE all container rows sharing their key,
the rest insert as new partitions.

Why it needs the family-atomic commit: an upsert is a rewrite (touched
partitions drop their matched rows) PLUS an insert (the increment's
partitions), and the two must become visible TOGETHER — flip the
rewrites first and the matched rows vanish before their replacements
arrive (a reader sees neither version); flip the inserts first and both
versions coexist (a reader sees duplicates).  So every record — the
rewritten partitions and the new-row partitions alike — stages
invisible under one deterministic family id, and ONE atomic
``family-<fid>.json`` write flips the whole upsert (the same primitive
incremental recluster introduced; state/manifest.py:load_manifest).

Scale shape: partitions whose recorded min/max + bloom cannot contain
any increment key are PROVEN untouched (no read, no write — the same
pruning discipline as delete_rows); touched partitions decode → filter
→ re-encode, one Ray task each; the increment encodes through the
standard planned exchange.  The increment's key set is broadcast once
(``ray.put``) — an upsert increment is bounded (a day's corrections,
not the corpus), the same contract as ``ingest_increment``.

Crash safety mirrors the other family ops: a crash before the marker
leaves the container bit-identical (staged state is invisible and the
standard GC reclaims it); a re-run under the same ``upsert_id`` resumes
into the pinned id range by fingerprint and commits the SAME family; a
re-run after the marker is an idempotent no-op.  Single writer per
container.  No reference analog (parquet2 is a file codec library);
this is Delta/Iceberg ``MERGE`` expressed in the container's commit
algebra.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..state import manifest as mf
from .encode_pipeline import EncodeOptions

__all__ = ["upsert_rows"]


@ray.remote
def _drop_matched(out_dir: str, new_id: int, member: dict, key_col: str,
                  keys, replaces: list, fid: str, txn: int,
                  fsync: bool, mode: str = "rewrite") -> dict:
    """Rewrite one touched partition without its matched-key rows,
    STAGED under the upsert family (invisible until the marker).
    ``keys`` arrives as the broadcast ObjectRef's VALUE (Ray resolves
    ref args) — one shared object-store copy across all tasks.

    ``mode="dv"`` (P62): commit a deletion-vector sidecar instead of a
    re-encode — the merge-on-read MERGE: matched rows mask out, the
    base file stays bit-untouched, the sidecar stages under the SAME
    family so the upsert still flips atomically."""
    from ..stages.encode import decode_partition_path, encode_partition_table

    tbl = decode_partition_path(member["path"])
    if key_col in tbl.column_names:
        drop = pc.is_in(tbl[key_col], value_set=keys)
        keep = pc.invert(pc.fill_null(drop, False))
        kept = tbl.filter(keep)
    else:
        keep = None
        kept = tbl   # evolved partition predating the key column:
        #              null keys never match (SQL semantics)
    if mode == "dv" and keep is not None:
        if kept.num_rows == tbl.num_rows:
            # bloom/range false positive, zero actual matches: commit
            # nothing, the member stays active untouched
            return {"new": None, "old": member["part_id"], "dropped": 0}
        if kept.num_rows > 0:
            from .delete_pipeline import _commit_dv

            r = _commit_dv(out_dir, new_id, member, keep, kept, fsync,
                           txn, extra={"family": fid, "op": "upsert"})
            return {"new": r["new"], "old": member["part_id"],
                    "dropped": r["deleted"]}
        # every row matched: an all-zero mask would pin the base file
        # to serve 0 rows — fall through to the empty rewrite tombstone
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
        extra_record={"replaces": replaces, "family": fid,
                      "txn": txn, "op": "upsert"},
        part_id=f"p{new_id:06d}",
    )
    r = rec.to_pylist()[0]
    return {"new": r["part_id"], "old": member["part_id"],
            "dropped": tbl.num_rows - kept.num_rows}


def upsert_rows(
    out_dir: str,
    new_input: str | list[str] | rd.Dataset,
    key_col: str,
    opts: EncodeOptions | None = None,
    upsert_id: str | None = None,
    gc: bool = True,
    filesystem=None,
    mode: str = "rewrite",
) -> dict:
    """Last-write-wins merge of ``new_input`` into the container on
    ``key_col``.  The increment must be UNIQUE on the key (validated —
    two versions of one key in a single upsert has no defined winner).
    ``upsert_id`` identifies the increment for crash resume (REQUIRED
    for Dataset inputs; path inputs derive a content hash).

    ``mode="dv"``: the rewrite side commits deletion-vector sidecars
    (P62) instead of re-encoding touched partitions — at 100 TB a
    correction batch masks its matched rows in KBs per touched
    partition while the inserts encode normally; both sides still
    stage under ONE family and flip in one marker write."""
    from dataclasses import replace as _replace

    from .append_pipeline import _load_sessions
    from .compact_pipeline import _raw_record_ids, sweep_invisible
    from .encode_pipeline import (
        encode_dataset,
        prune_partitions,
        prune_partitions_by_range,
    )
    from .recluster_pipeline import _family_member_ids

    base_opts = opts or EncodeOptions()
    if mode not in ("rewrite", "dv"):
        raise ValueError(f"mode must be 'rewrite' or 'dv', got {mode!r}")
    if isinstance(new_input, rd.Dataset):
        if upsert_id is None:
            raise ValueError(
                "upsert_rows with a Dataset input needs an explicit "
                "upsert_id (stable across retries) for crash-safe "
                "resume; path inputs derive one from file contents")
        new_ds = new_input
    else:
        from .append_pipeline import _input_append_id

        if upsert_id is None:
            upsert_id = _input_append_id(new_input, filesystem)
        new_ds = rd.read_parquet(new_input, filesystem=filesystem)

    # generated columns (P74): derive/overwrite on the increment so
    # upserted rows carry the same derived values appends would
    from .generated_pipeline import apply_generated, get_generated

    gspecs = get_generated(out_dir)
    if gspecs:
        new_ds = new_ds.map_batches(
            lambda b: apply_generated(b, gspecs),
            batch_format="pyarrow")

    records = mf.load_manifest(out_dir)
    if not records:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    sessions = _load_sessions(out_dir)
    pending = next((s for s in sessions if s.get("n_parts") is None), None)
    if pending is not None:
        raise RuntimeError(
            f"container has an unfinished append "
            f"{pending['append_id']!r}: resume it before upserting")
    # declared CHECK constraints (P65): STATIC constraints validate the
    # increment before anything stages.  `unique` is skipped here by
    # design — an upsert's keys intentionally exist in the container
    # (the replace side preserves uniqueness-by-key), so the append-
    # style container probe would false-flag every update
    from .constraints_pipeline import check_increment, get_constraints

    cs = [c for c in get_constraints(out_dir) if c["op"] != "unique"]
    if cs:
        check_increment(out_dir, new_ds, cs)

    fid = "u" + hashlib.blake2b(
        (f"{upsert_id}|{key_col}|{base_opts.target_weight}"
         f"|{base_opts.target_rows}|{base_opts.weight_col}"
         f"|{base_opts.compression}|{base_opts.rows_per_block}"
         # mode shapes the staged records: a resume must not mix a
         # rewrite-planned family with dv-planned members ("rewrite"
         # spells the legacy hash so old resumes stay idempotent)
         + ("" if mode == "rewrite" else f"|{mode}")
         ).encode(), digest_size=8).hexdigest()
    if mf.family_committed(out_dir, fid):
        # the marker landed on a previous run: idempotent no-op
        return {"upsert_id": upsert_id, "family": fid, "noop": True,
                "out_dir": out_dir}

    # the increment's key column, gathered + broadcast once (bounded:
    # an upsert increment is a correction batch, not the corpus)
    key_tbl = pa.concat_tables(
        [b for b in new_ds.select_columns([key_col]).iter_batches(
            batch_format="pyarrow")])
    keys = key_tbl[key_col].combine_chunks()
    if keys.null_count:
        raise ValueError(f"{key_col} contains nulls: a null key never "
                         "matches and cannot be upserted")
    n_unique = len(pc.unique(keys))
    if n_unique != len(keys):
        raise ValueError(
            f"increment is not unique on {key_col!r} "
            f"({len(keys)} rows, {n_unique} distinct): two versions of "
            "one key in a single upsert has no defined winner")
    if len(keys) == 0:
        return {"upsert_id": upsert_id, "family": fid, "noop": True,
                "matched": 0, "inserted": 0, "out_dir": out_dir}
    keys_ref = ray.put(keys)

    # prune: range over [min,max] of the key set for every partition,
    # bloom refine only where the bloom indexes THIS column
    kmin, kmax = pc.min(keys).as_py(), pc.max(keys).as_py()
    touch_paths = set(prune_partitions_by_range(
        out_dir, key_col, lo=kmin, hi=kmax, records=records))
    bloomable = {r["path"] for r in records.values()
                 if r.get("bloom_key") == key_col and r.get("bloom")}
    if bloomable & touch_paths:
        refined = set(prune_partitions(
            out_dir, keys.to_pylist(),
            records={pid: r for pid, r in records.items()
                     if r["path"] in (touch_paths & bloomable)},
            column=key_col))
        touch_paths = (touch_paths - bloomable) | refined
    touched = sorted(
        (r for r in records.values()
         if r["path"] in touch_paths and r["n_rows"] > 0),
        key=lambda r: int(r["part_id"][1:]))

    # id allocation: resume pins into the crashed run's staged range
    staged_ids = _family_member_ids(out_dir, fid)
    raw, _fams = mf.load_raw_records(out_dir)
    if staged_ids:
        base = min(staged_ids)
        txn = max(mf.record_txn(r) for r in raw.values()
                  if r.get("family") == fid)
    else:
        base = max(max(_raw_record_ids(out_dir), default=-1),
                   max((int(s["base"]) + int(s["n_parts"]) - 1
                        for s in sessions), default=-1)) + 1
        from .append_pipeline import next_txn_all

        txn = max(mf.next_txn(out_dir, raw), next_txn_all(out_dir))

    # stage 1: rewrite every touched partition without its matched rows
    results = ray.get([
        _drop_matched.remote(
            out_dir, base + i, m, key_col, keys_ref,
            sorted({m["part_id"]} | set(m.get("replaces") or ())),
            fid, txn, base_opts.fsync, mode)
        for i, m in enumerate(touched)])
    matched = int(sum(r["dropped"] for r in results))

    # stage 2: the increment encodes as new partitions, staged under
    # the SAME family — one plan, ids directly after the rewrites
    ins_base = base + len(touched)
    ropts = _replace(base_opts, id_offset=ins_base,
                     record_extra={"family": fid, "txn": txn,
                                   "op": "upsert"})
    summary = encode_dataset(new_ds, out_dir, ropts)
    n_new = int(summary["n_partitions"])

    # pre-commit guard (same as incremental recluster): the marker
    # activates EVERY record carrying this fid — refuse strays from a
    # differently-planned attempt
    stray = [i for i in _family_member_ids(out_dir, fid)
             if not (base <= i < ins_base + n_new)]
    if stray:
        raise RuntimeError(
            f"staged upsert family {fid} has members outside this "
            f"run's id range {base}..{ins_base + n_new - 1}: "
            f"{sorted(stray)} — refusing to commit; run GC "
            "(sweep_invisible) and retry")
    mf.commit_family(out_dir, fid, fsync=base_opts.fsync)
    swept = sweep_invisible(out_dir) if gc else 0

    from .append_pipeline import refold_global

    combined = refold_global(out_dir)
    return {
        "upsert_id": upsert_id,
        "family": fid,
        "txn": txn,
        "matched": matched,
        "inserted": int(summary["n_rows"]),
        "n_touched": len(touched),
        "n_new_partitions": n_new,
        "gc_swept": swept,
        "n_partitions": combined["n_partitions"],
        "n_rows": combined["n_rows"],
        "out_dir": out_dir,
    }
