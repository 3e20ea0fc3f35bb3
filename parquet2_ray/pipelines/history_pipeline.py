"""Snapshot lineage over a container: history, time travel, rollback,
and incremental (changes-since) reads — the table-maintenance half the
``replaces``/``family`` commit algebra already implies but never
exposed.

Model: every maintenance op (append / compact / delete / incremental
recluster) stamps a monotonically-allocated ``txn`` into each record it
commits, in the SAME atomic write as the record itself (the base
encode's records read as txn 0).  A snapshot is then pure resolution:
``manifest.load_manifest(out_dir, as_of=n)`` includes only records
stamped ≤ n and applies only THEIR ``replaces`` — the pre-rewrite
partitions resurface exactly as committed, no data movement, no copies.
The same one-scan resolution drives everything here.

No reference analog: parquet2 is a file codec library (its metadata is
per-file, /root/reference/src/metadata/file_metadata.rs); this is the
dataset-level lineage layer built on the manifest the engine added on
top — the Iceberg-snapshot / Delta-time-travel shape, expressed in the
container's own single-writer commit terms.

Interaction with GC: ``sweep_invisible`` reclaims everything outside
the snapshots it is told to retain (default: only the current one) —
after a sweep, ``as_of`` older than the retained horizon and
``rollback_container`` past it refuse loudly rather than answer with
partial data.  Scale note: every function here is O(raw manifest
records) driver-side JSON reads plus O(1) per-record deletes — no data
files are read, and the restored partitions are never rewritten.
"""

from __future__ import annotations

import os

from ..state import fsio
from ..state import manifest as mf

__all__ = ["container_history", "rollback_container", "changes_since",
           "row_changes",
           "tag_snapshot", "list_tags", "delete_tag", "resolve_as_of"]


def _tags_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest", "tags.json")


def list_tags(out_dir: str) -> dict[str, int]:
    p = _tags_path(out_dir)
    if not fsio.exists(p):
        return {}
    import json

    return json.loads(fsio.read_bytes(p))


def tag_snapshot(out_dir: str, name: str, txn: int | None = None) -> dict:
    """Name a snapshot (``txn`` defaults to the latest transaction) —
    the ref a consumer pins a training run or an audit to.  Tags are
    first-class retention roots: ``sweep_invisible(..., retain
    tags)`` keeps every tagged snapshot restorable, and ``as_of``
    accepts the tag name anywhere a txn is accepted.  One atomic write;
    re-tagging an existing name moves it."""
    if name.lstrip("-").isdigit():
        raise ValueError(f"tag name {name!r} would shadow txn numbers")
    raw, _fams = mf.load_raw_records(out_dir)
    if not raw:
        raise FileNotFoundError(f"no manifest records under {out_dir}")
    ftxn = mf.family_txns(raw)
    max_txn = max((ftxn[r["family"]] if r.get("family")
                   else mf.record_txn(r)) for r in raw.values())
    txn = max_txn if txn is None else int(txn)
    if txn > max_txn:
        raise ValueError(f"txn {txn} is beyond the latest transaction "
                         f"{max_txn}")
    import json

    tags = list_tags(out_dir)
    tags[name] = txn
    fsio.atomic_write(_tags_path(out_dir),
                      json.dumps(tags, indent=1).encode(), fsync=False)
    return {"tag": name, "txn": txn, "out_dir": out_dir}


def delete_tag(out_dir: str, name: str) -> dict:
    import json

    tags = list_tags(out_dir)
    if name not in tags:
        raise KeyError(f"no tag {name!r}; have {sorted(tags)}")
    txn = tags.pop(name)
    fsio.atomic_write(_tags_path(out_dir),
                      json.dumps(tags, indent=1).encode(), fsync=False)
    return {"deleted": name, "txn": txn}


def _retention_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest", "retention.json")


def load_retention(out_dir: str) -> dict | None:
    """The sweep's retention ledger: which snapshots are still FULLY
    intact (``intact`` list) as of the last sweep, and the max stamp at
    that moment (every later stamp is intact by construction — nothing
    had swept it yet).  ``None`` = no sweep ever ran: everything the
    manifest ever committed is still there."""
    p = _retention_path(out_dir)
    if not fsio.exists(p):
        return None
    import json

    return json.loads(fsio.read_bytes(p))


def save_retention(out_dir: str, ledger: dict) -> None:
    import json

    fsio.atomic_write(_retention_path(out_dir),
                      json.dumps(ledger).encode(), fsync=False)


def snapshot_intact(out_dir: str, txn: int) -> bool:
    led = load_retention(out_dir)
    return (led is None or txn in led["intact"]
            or txn > led["max_at_sweep"])


def resolve_as_of(out_dir: str, as_of: int | str | None) -> int | None:
    """Accept a txn number OR a tag name wherever ``as_of`` appears."""
    if as_of is None or isinstance(as_of, int):
        return as_of
    tags = list_tags(out_dir)
    if as_of in tags:
        return int(tags[as_of])
    if str(as_of).lstrip("-").isdigit():
        return int(as_of)
    raise KeyError(f"unknown snapshot tag {as_of!r}; have {sorted(tags)}")


def container_history(out_dir: str) -> list[dict]:
    """Per-transaction summary of a container's commit history, oldest
    first: which op ran, how many records/rows it committed, and how
    many prior partitions it replaced.  Reads only the manifest.

    Entries describe RAW records (replaced ones included — that is the
    point: history), so a swept container's history collapses to what
    the sweep retained.  Staged families without a committed marker are
    reported with ``committed: False`` (an in-flight or abandoned
    incremental recluster)."""
    raw, committed_families = mf.load_raw_records(out_dir)
    if not raw:
        raise FileNotFoundError(f"no manifest records under {out_dir}")
    ftxn = mf.family_txns(raw)
    by_txn: dict[tuple, dict] = {}
    for r in raw.values():
        fid = r.get("family")
        txn = ftxn[fid] if fid else mf.record_txn(r)
        op = r.get("op") or ("encode" if txn == 0 else "unknown")
        key = (txn, op, fid or "")
        e = by_txn.setdefault(key, {
            "txn": txn, "op": op, "n_records": 0, "n_rows": 0,
            "n_replaced": 0, "part_ids": []})
        e["n_records"] += 1
        e["n_rows"] += int(r["n_rows"])
        e["n_replaced"] += len(r.get("replaces") or ())
        e["part_ids"].append(r["part_id"])
        if fid:
            e["family"] = fid
            e["committed"] = fid in committed_families
    out = sorted(by_txn.values(), key=lambda e: (e["txn"], e["op"]))
    for e in out:
        e["part_ids"] = sorted(e["part_ids"], key=lambda p: int(p[1:]))
    return out


def _check_restorable(out_dir: str, raw: dict, committed_families: set,
                      to_txn: int) -> dict:
    """The snapshot at ``to_txn`` must be fully materializable: every
    record it activates needs its data file on disk, and the snapshot
    itself must not have been hollowed out by GC.  The sweep's
    retention ledger answers the second part exactly: a target it
    marks intact resolved to kept-records-only at sweep time, so any
    replaced ids missing from the raw pile are provably just swept
    INTERMEDIATES of later rewrites, never lost target records.  For
    targets the ledger cannot vouch for (no ledger entry), fall back to
    the conservative missing-replaced-id check."""
    target = mf.resolve_active(raw, committed_families, as_of=to_txn)
    ftxn = mf.family_txns(raw)

    def _txn(r: dict) -> int:
        fid = r.get("family")
        return ftxn[fid] if fid else mf.record_txn(r)

    # visibility is constant between stamps: the target's snapshot IS
    # the one at the largest stamp ≤ to_txn (the ledger records stamps)
    stamps = {_txn(r) for r in raw.values()}
    eff = max((t for t in stamps if t <= to_txn), default=0)
    led = load_retention(out_dir)
    if led is not None and not snapshot_intact(out_dir, eff):
        raise RuntimeError(
            f"rollback to txn {to_txn} impossible: the sweep's "
            f"retention ledger records snapshot {eff} as hollowed out "
            "by GC (retain or tag snapshots at sweep time to keep "
            "them restorable)")
    if led is None:
        # pre-ledger containers: the conservative heuristic — ids
        # already hidden AT the target are exempt (their absence does
        # not impair restoring it), any other missing replaced id means
        # collapsed history
        hidden_at_target: set = set()
        for r in raw.values():
            if _txn(r) <= to_txn:
                hidden_at_target.update(r.get("replaces") or ())
        for r in raw.values():
            if _txn(r) <= to_txn:
                continue
            missing = [pid for pid in (r.get("replaces") or ())
                       if pid not in raw and pid not in hidden_at_target]
            if missing:
                raise RuntimeError(
                    f"rollback to txn {to_txn} impossible: record "
                    f"{r['part_id']} replaced {missing} whose manifest "
                    "records were GC'd (sweep_invisible collapses "
                    "history — retain or tag snapshots at sweep time "
                    "to keep them restorable)")
    gone = [r["part_id"] for r in target.values()
            if not fsio.exists(r["path"])]
    if gone:
        raise RuntimeError(
            f"rollback to txn {to_txn} impossible: data files of "
            f"{gone} were GC'd")
    return target


def rollback_container(out_dir: str, to_txn: int | str,
                       sweep: bool = True) -> dict:
    """Restore the container to its snapshot at ``to_txn`` by REMOVING
    every later transaction's records (and their files) — the
    destructive rollback: later history is discarded, the restored
    partitions are the original files untouched.

    Crash safety = unwinding in reverse txn order, one atomic step at a
    time: a family's marker is deleted FIRST (one unlink un-commits the
    whole family — its replaces stop applying and every pre-recluster
    partition is active again in the same instant), then its member
    records; plain records' deletion each atomically re-activates
    exactly the ids that record was hiding.  A crash mid-rollback
    leaves a consistent intermediate snapshot; re-running the same
    rollback completes it (idempotent).

    The append ledger is left intact on purpose: its id reservations
    keep rolled-back ids from ever being reused, and re-appending the
    same increment (same ``append_id``) resumes into its reserved range
    and re-encodes cleanly.  Refuses if the target snapshot was GC'd.
    Tags pointing past the restore point are dropped (their snapshots
    no longer exist); ``to_txn`` may itself be a tag name.
    Single writer per container, like every maintenance op."""
    to_txn = resolve_as_of(out_dir, to_txn)
    raw, committed_families = mf.load_raw_records(out_dir)
    if not raw:
        raise FileNotFoundError(f"no manifest records under {out_dir}")
    ftxn = mf.family_txns(raw)

    def _txn(r: dict) -> int:
        fid = r.get("family")
        return ftxn[fid] if fid else mf.record_txn(r)

    doomed = [r for r in raw.values() if _txn(r) > to_txn]
    if not doomed:
        cur = mf.resolve_active(raw, committed_families)
        return {"rolled_back": 0, "noop": True, "to_txn": to_txn,
                "n_partitions": len(cur), "out_dir": out_dir}
    _check_restorable(out_dir, raw, committed_families, to_txn)
    mdir = os.path.join(out_dir, "_manifest")
    # unwind newest-first, family markers before member records
    for txn in sorted({_txn(r) for r in doomed}, reverse=True):
        step = [r for r in doomed if _txn(r) == txn]
        for fid in sorted({r["family"] for r in step if r.get("family")}):
            marker = os.path.join(mdir, f"family-{fid}.json")
            if fsio.exists(marker):
                fsio.delete(marker)
        for r in step:
            fsio.delete(os.path.join(mdir, f"part-{r['part_id']}.json"))
            # clone records (P57) never own their files — see
            # clone_pipeline.py; unwinding one must not touch the source
            if not r.get("external") and fsio.exists(r["path"]):
                fsio.delete(r["path"])
    # tags pointing past the restore point reference discarded history
    for name, t in list(list_tags(out_dir).items()):
        if t > to_txn:
            delete_tag(out_dir, name)
    from .compact_pipeline import sweep_invisible

    # retain_from_txn=0: the post-rollback sweep reclaims only state
    # visible in NO snapshot (abandoned staged families, recordless
    # orphan files) — rollback restores history, it must not GC the
    # still-answerable snapshots BEFORE the restore point (an explicit
    # `sweep` collapses them when the user wants that)
    swept = sweep_invisible(out_dir, retain_from_txn=0) if sweep else 0

    from .append_pipeline import refold_global

    combined = refold_global(out_dir)
    return {
        "rolled_back": len(doomed),
        "to_txn": to_txn,
        "gc_swept": swept,
        "n_partitions": combined["n_partitions"],
        "n_rows": combined["n_rows"],
        "out_dir": out_dir,
    }


def changes_since(out_dir: str, since_txn: int | str,
                  columns: list[str] | None = None):
    """Incremental read: a Ray Dataset of exactly the rows ADDED after
    ``since_txn`` — the consume-only-new-appends primitive an
    incremental training-data pipeline runs per cycle (dedup the new
    increment, score it, append the survivors, advance the cursor).

    Contract (the Iceberg-incremental-scan shape): the window must be
    append-only IN EFFECT — an active post-cursor record that replaces
    any pre-cursor record (a compaction / delete / recluster that
    touched old rows) makes "rows added since" unanswerable from
    lineage alone, and this raises rather than double- or under-counts.
    A post-cursor rewrite of post-cursor records is fine (those rows
    are all new); tombstones and same-window compactions pass.

    Streams through ``decode_dataset`` (projection and all) — nothing
    is materialized driver-side beyond the id list.  ``since_txn`` may
    be a tag name (tag the cursor, advance it per cycle)."""
    since_txn = resolve_as_of(out_dir, since_txn)
    raw, committed_families = mf.load_raw_records(out_dir)
    if not raw:
        raise FileNotFoundError(f"no manifest records under {out_dir}")
    ftxn = mf.family_txns(raw)
    max_txn = max((ftxn[r["family"]] if r.get("family")
                   else mf.record_txn(r)) for r in raw.values())
    if since_txn > max_txn:
        raise ValueError(
            f"since_txn {since_txn} is beyond the container's latest "
            f"transaction {max_txn}")
    active = mf.resolve_active(raw, committed_families)
    new = {pid: r for pid, r in active.items()
           if (ftxn[r["family"]] if r.get("family")
               else mf.record_txn(r)) > since_txn}
    # ids already hidden AT the cursor: a post-cursor record carrying
    # one in ``replaces`` inherited it transitively (the resurrection
    # guard) — it was not a data source, so it neither breaks the
    # append-only contract nor needs its record retained
    hidden_at_cursor: set = set()
    for r in raw.values():
        if (ftxn[r["family"]] if r.get("family")
                else mf.record_txn(r)) <= since_txn:
            hidden_at_cursor.update(r.get("replaces") or ())
    for r in new.values():
        for pid in (r.get("replaces") or ()):
            if pid in hidden_at_cursor:
                continue
            old = raw.get(pid)
            if old is None:
                raise RuntimeError(
                    f"changes_since({since_txn}): record {r['part_id']} "
                    f"replaced {pid} whose manifest record was GC'd — "
                    "the window's lineage is gone; advance the cursor "
                    "or retain history at sweep time")
            old_txn = (ftxn[old["family"]] if old.get("family")
                       else mf.record_txn(old))
            if old_txn <= since_txn:
                raise RuntimeError(
                    f"changes_since({since_txn}): {r['part_id']} "
                    f"(op {r.get('op')!r}, txn > {since_txn}) rewrote "
                    f"pre-cursor partition {pid} — the window is not "
                    "append-only, so added-rows cannot be derived from "
                    "lineage; read a full snapshot instead")
    if not new:
        # empty increment: an empty Dataset with the container's schema
        import pyarrow as pa
        import ray.data as rd

        from ..codecs.column import str_to_type
        from .encode_pipeline import _union_fields

        union = _union_fields(list(active.values()))
        if union is None:
            first = min(active.values(),
                        key=lambda r: int(r["part_id"][1:]))
            footer = mf.read_partition_footer(first["path"])
            cols = (footer["blocks"][0]["columns"] if footer.get("paged")
                    else footer["columns"])
            union = [(m["name"], m["arrow_type"]) for m in cols]
        if columns is not None:
            union = [f for f in union if f[0] in set(columns)]
        schema = pa.schema([(n, str_to_type(t)) for n, t in union])
        return rd.from_arrow(schema.empty_table())
    from .encode_pipeline import decode_dataset

    return decode_dataset(out_dir, columns=columns, part_ids=set(new))


def _union_schema_table(records: list[dict], columns=None):
    """Empty Arrow table with the union schema of ``records`` (the
    changes_since empty-increment shape, shared with row_changes)."""
    import pyarrow as pa

    from ..codecs.column import str_to_type
    from .encode_pipeline import _union_fields

    union = _union_fields(records)
    if union is None:
        first = min(records, key=lambda r: int(r["part_id"][1:]))
        footer = mf.read_partition_footer(first["path"])
        cols = (footer["blocks"][0]["columns"] if footer.get("paged")
                else footer["columns"])
        union = [(m["name"], m["arrow_type"]) for m in cols]
    if columns is not None:
        keep = set(columns)
        union = [f for f in union if f[0] in keep]
    return pa.schema([(n, str_to_type(t)) for n, t in union]).empty_table()


def row_changes(out_dir: str, since_txn: int | str, key: str,
                to_txn: int | str | None = None,
                columns: list[str] | None = None,
                nshards: int = 64):
    """P56 row-level change-data-feed: a Ray Dataset of the NET row
    changes between two snapshots, each row tagged ``_change_type`` in
    {'insert', 'delete', 'update_pre', 'update_post'} — the Delta-CDF /
    debezium-snapshot-diff shape, derived from the container's own
    lineage with no change journal.

    Semantics (snapshot diff, not an event log): rows are compared
    between the ``since_txn`` snapshot and the ``to_txn`` snapshot
    (default: current).  A row present in both with identical content
    is NOT a change even if rewrites moved it between partitions; a
    key present on both sides with different content emits an
    update_pre/update_post pair; otherwise delete / insert.  Unlike
    ``changes_since`` (append-only windows, rows ADDED), this answers
    arbitrary windows — delete / upsert / compact / recluster included.

    ``key``: the pairing column for update detection.  Duplicate keys
    are handled as multisets (leftovers pair off in decode order);
    null keys never pair (SQL semantics, matching merge_join/upsert) —
    a changed null-key row surfaces as delete + insert.

    Scale contract: partitions active in BOTH snapshots are skipped
    without reading a byte (files are immutable, so shared partitions
    are proven row-identical); only the churned partitions decode, and
    exactly one hash exchange of those rows runs (shard = key hash %
    ``nshards``).  Unchanged-row cancellation uses the deterministic
    uint64 content fingerprint (``functions.hashing.row_fingerprints``),
    so a compaction-only window exchanges the compacted rows but emits
    zero changes.  With ``columns`` set, comparison (and therefore
    update detection) is relative to the PROJECTION — ``key`` must be
    included.
    """
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ..functions.hashing import column_hashes, row_fingerprints
    from .encode_pipeline import decode_dataset

    since = resolve_as_of(out_dir, since_txn)
    to = resolve_as_of(out_dir, to_txn)
    raw, committed_families = mf.load_raw_records(out_dir)
    if not raw:
        raise FileNotFoundError(f"no manifest records under {out_dir}")
    ftxn = mf.family_txns(raw)
    max_txn = max((ftxn[r["family"]] if r.get("family")
                   else mf.record_txn(r)) for r in raw.values())
    if since > max_txn:
        raise ValueError(f"since_txn {since} is beyond the container's "
                         f"latest transaction {max_txn}")
    if to is not None:
        if to > max_txn:
            raise ValueError(f"to_txn {to} is beyond the container's "
                             f"latest transaction {max_txn}")
        if to < since:
            raise ValueError(f"window reversed: since_txn {since} > to_txn {to}")
    # intactness is a property of the EFFECTIVE snapshot (visibility is
    # constant between stamps): probe the largest stamp ≤ the cursor,
    # not the cursor literally — and check BOTH window ends (a swept-out
    # `to` snapshot would otherwise diff against partial data silently)
    stamps = {ftxn[r["family"]] if r.get("family") else mf.record_txn(r)
              for r in raw.values()}
    for label, t in (("since_txn", since),) + (
            (("to_txn", to),) if to is not None else ()):
        eff = max((s for s in stamps if s <= t), default=0)
        if not snapshot_intact(out_dir, eff):
            raise RuntimeError(
                f"row_changes: the {label}={t} snapshot (stamp {eff}) "
                "was hollowed by a retention sweep — its partitions are "
                "gone; advance the cursor")
    recs_a = mf.load_manifest(out_dir, as_of=since)
    recs_b = mf.load_manifest(out_dir, as_of=to)
    removed = set(recs_a) - set(recs_b)
    added = set(recs_b) - set(recs_a)
    # key/projection validation against the union of both snapshots
    all_records = list({**recs_a, **recs_b}.values())
    schema_probe = _union_schema_table(all_records)
    known = set(schema_probe.column_names)
    if key not in known:
        raise KeyError(f"container has no column {key!r}; "
                       f"available: {sorted(known)}")
    if columns is not None and key not in columns:
        raise ValueError(f"columns projection must include the key "
                         f"column {key!r}")
    ct_field = pa.field("_change_type", pa.string())
    if not removed and not added:
        empty = _union_schema_table(all_records, columns)
        return rd.from_arrow(empty.append_column(
            ct_field, pa.array([], pa.string())))

    def _tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            rh = row_fingerprints(b)
            kh = column_hashes(b[key])
            kv = b[key].combine_chunks() if isinstance(b[key], pa.ChunkedArray) else b[key]
            null_key = np.zeros(n, dtype=bool)
            if kv.null_count:
                import pyarrow.compute as pc
                null_key = pc.is_null(kv).to_numpy(zero_copy_only=False)
            # null keys must never pair as updates: give each a pairing
            # id derived from its CONTENT hash, so identical rows still
            # cancel in pass 1 but differing null-key rows can't pair
            kh = np.where(null_key, rh ^ np.uint64(0xD1B54A32D192ED03), kh)
            shard = ((kh * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) \
                % np.uint64(nshards)
            return (b.append_column("_rh", pa.array(rh))
                     .append_column("_kh", pa.array(kh))
                     .append_column("_side", pa.array(
                         np.full(n, side, dtype=np.int8)))
                     .append_column("_shard", pa.array(
                         shard.astype(np.int64))))
        return f

    parts = []
    if removed:
        parts.append(decode_dataset(out_dir, columns=columns, as_of=since,
                                    part_ids=removed)
                     .map_batches(_tag(0), batch_format="pyarrow"))
    if added:
        parts.append(decode_dataset(out_dir, columns=columns, as_of=to,
                                    part_ids=added)
                     .map_batches(_tag(1), batch_format="pyarrow"))
    u = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

    def _diff(g: pa.Table) -> pa.Table:
        import pandas as pd

        n = g.num_rows
        df = pd.DataFrame({
            "rh": g["_rh"].to_numpy(zero_copy_only=False),
            "kh": g["_kh"].to_numpy(zero_copy_only=False),
            "side": g["_side"].to_numpy(zero_copy_only=False),
        })
        # pass 1 — cancel unchanged rows: identical (rh) multisets
        # across sides pair off by rank
        rank = df.groupby(["rh", "side"]).cumcount()
        cnt = df.groupby(["rh", "side"]).size().unstack(fill_value=0)
        for s in (0, 1):
            if s not in cnt.columns:
                cnt[s] = 0
        cancelled = np.minimum(cnt[0], cnt[1])
        keep = (rank.to_numpy() >= df["rh"].map(cancelled).to_numpy())
        if not keep.any():
            return (g.slice(0, 0)
                    .drop_columns(["_rh", "_kh", "_side", "_shard"])
                    .append_column(ct_field, pa.array([], pa.string())))
        s = df[keep]
        # pass 2 — pair updates by key among survivors
        r2 = s.groupby(["kh", "side"]).cumcount().to_numpy()
        c2 = s.groupby(["kh", "side"]).size().unstack(fill_value=0)
        for c in (0, 1):
            if c not in c2.columns:
                c2[c] = 0
        pairs = np.minimum(c2[0], c2[1])
        p = s["kh"].map(pairs).to_numpy()
        side = s["side"].to_numpy()
        change = np.where(
            r2 < p,
            np.where(side == 0, "update_pre", "update_post"),
            np.where(side == 0, "delete", "insert"))
        sel = np.flatnonzero(keep)
        return (g.take(sel)
                .drop_columns(["_rh", "_kh", "_side", "_shard"])
                .append_column(ct_field, pa.array(change, pa.string())))

    return u.groupby("_shard").map_groups(_diff, batch_format="pyarrow")
