"""Container compaction: merge runs of small partitions into full-size
ones — the small-file antidote for incremental ingest (P40
``append_dataset`` adds a self-contained partition family per
increment, so a year of daily appends leaves thousands of sub-target
partitions whose per-partition overhead — footer reads, task
scheduling, bloom probes — grows O(partitions), not O(bytes)).

Crash safety is ONE atomic commit per group: the merged partition's
manifest record carries ``replaces=[old ids...]``, and
``manifest.load_manifest`` drops every id named by any record's
``replaces`` — so the instant the new record lands, the olds are
invisible to every reader (decode, Datasource, pruning, verify,
tools), and until it lands they are all still active.  There is no
window where both or neither are visible.  Replaced records carry
their rows' history forward transitively: a group member that itself
replaced others (an earlier compaction not yet GC'd) contributes its
``replaces`` to the new record, so GC order can never resurrect a
hidden partition.

Old files/records are garbage-collected after all groups commit; GC is
idempotent and a crash mid-GC leaves only invisible leftovers for the
next run.  New ids allocate past every committed record id (including
replaced ones) AND every range reserved in the append ledger.  Single
writer per container, same as appends.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray

from ..state import fsio
from ..state import manifest as mf
from .append_pipeline import _load_sessions

__all__ = ["compact_container"]


def _raw_record_ids(out_dir: str) -> list[int]:
    """ALL committed record ids, replaced included — the id allocator
    must not reuse an id whose record still exists."""
    d = os.path.join(out_dir, "_manifest")
    out = []
    for name in fsio.listdir(d):
        if name.startswith("part-p") and name.endswith(".json"):
            out.append(int(name[len("part-p"):-len(".json")]))
    return out


@ray.remote
def _compact_group(out_dir: str, new_id: int, members: list[dict],
                   fsync: bool, txn: int) -> dict:
    import numpy as np

    from ..stages.encode import (
        PART_COL,
        decode_partition_path,
        encode_partition_table,
    )

    tables = [decode_partition_path(m["path"]) for m in members]
    schemas = {tuple(t.column_names) for t in tables if t.num_rows}
    if len(schemas) > 1:
        # schema-evolved container (P48): pad members to the group's
        # union so the merge carries every column (missing → nulls)
        from .encode_pipeline import _pad_to_union

        from ..codecs.column import type_to_str

        fields: dict[str, str] = {}
        for t in tables:
            for f in t.schema:
                fields.setdefault(f.name, type_to_str(f.type))
        union = list(fields.items())
        tables = [_pad_to_union(t, union) for t in tables]
    full = pa.concat_tables(tables)
    full = full.append_column(PART_COL, pa.array(
        np.full(full.num_rows, new_id, dtype=np.int32)))
    first = members[0]
    eo = first.get("encoding_opts") or {}
    sk = first.get("sort_key") or None
    # transitive replaces: members that were themselves compactions
    # keep their hidden ids hidden through the NEW record, so GC'ing an
    # intermediate record cannot resurrect a partition it was hiding
    replaces = sorted({m["part_id"] for m in members}
                      | {pid for m in members
                         for pid in (m.get("replaces") or ())})
    rec = encode_partition_table(
        full, out_dir,
        sort_key=sk,
        weight_col=first.get("weight_col"),
        forced_codecs=eo.get("forced_codecs") or {},
        resume=True,
        compression=eo.get("compression"),
        fsync=fsync,
        rows_per_block=eo.get("rows_per_block"),
        extra_record={"replaces": replaces, "txn": txn, "op": "compact"},
        # explicit: an all-tombstone group builds an EMPTY table, and
        # the PART_COL row-0 fallback would commit it as "p0" — which
        # hides ids above the active max and makes the id allocator
        # hand future appends already-hidden ids (silent data loss)
        part_id=f"p{new_id:06d}",
    )
    return rec.to_pylist()[0]


def sweep_invisible(out_dir: str, retain_from_txn: int | None = None) -> int:
    """GC: a general invisible-state sweep, not tied to any one run —
    records hidden by an ACTIVE record's ``replaces`` (including a
    previous gc=False pass), records staged under a never-committed
    family (an abandoned incremental recluster), data files without a
    record (a crashed run's write-then-commit window, an abandoned
    append), and family markers with no remaining raw member.
    Everything swept is invisible to every reader; idempotent — a
    crash mid-sweep leaves only more invisible leftovers.

    ``retain_from_txn``: snapshot retention — ALSO keep every record
    (and file) visible in some snapshot at txn ≥ the horizon, so
    ``load_manifest(as_of=...)`` time travel, ``rollback_container``
    and ``changes_since`` stay answerable back to it.  Default None
    collapses history to the current snapshot (the plain-VACUUM
    contract).  Abandoned staged families are never visible in ANY
    snapshot and are reclaimed either way.

    TAGGED snapshots (``tag_snapshot``) are retention roots: they stay
    restorable through every sweep regardless of ``retain_from_txn``
    (delete the tag to release them).

    Single-writer contract: like every maintenance op, never run
    concurrently with an in-progress encode/append/recluster on the
    same container (the sweep would reclaim its staged state)."""
    from .history_pipeline import (
        list_tags,
        load_retention,
        save_retention,
    )

    swept = 0
    mdir = os.path.join(out_dir, "_manifest")
    raw, committed_families = mf.load_raw_records(out_dir)
    keep = set(mf.resolve_active(raw, committed_families))
    tagged = set(list_tags(out_dir).values())
    ftxn = mf.family_txns(raw)
    stamps = {ftxn[r["family"]] if r.get("family")
              else mf.record_txn(r) for r in raw.values()}
    cur = max(stamps, default=0)
    # union of the active sets at every retained stamp: the current one,
    # every stamp ≥ the horizon, and every TAGGED stamp (a tag needs
    # exactly resolve_active(as_of=tag_txn) — stamps below it that the
    # tag's snapshot hides stay sweepable).  Visibility is constant
    # between stamps, so this covers every as_of the horizon promises
    # (O(txns) driver-side resolutions over the one raw scan — no file
    # IO).
    per_stamp = {t: set(mf.resolve_active(raw, committed_families,
                                          as_of=t)) for t in stamps}
    for t in stamps:
        if t == cur or t in tagged or (
                retain_from_txn is not None and t >= retain_from_txn):
            keep |= per_stamp[t]
    # retention ledger: which snapshots remain FULLY intact after this
    # sweep — rollback consults it to accept targets whose missing
    # replaced-ids are provably just swept intermediates, not lost
    # target records.  Exact, not heuristic: a snapshot survives iff it
    # was intact before and every record it resolves to is kept now.
    prior = load_retention(out_dir)
    intact = {t for t in stamps
              if (prior is None or t in prior["intact"]
                  or t > prior["max_at_sweep"])
              and per_stamp[t] <= keep}
    save_retention(out_dir, {"intact": sorted(intact),
                             "max_at_sweep": cur})
    families_in_use = {raw[pid]["family"] for pid in keep
                       if raw[pid].get("family")}
    # deletion-vector records (P62) serve rows out of a BASE file whose
    # own record may be swept (it was replaced by the DV commit) — any
    # base a KEPT record references must survive both delete loops.
    # Basenames suffice: every in-container base lives in out_dir
    # (clone-side DVs over a foreign base are marked external and never
    # reach the delete below).
    dv_referenced = {os.path.basename(raw[pid]["dv_base"])
                     for pid in keep if raw[pid].get("dv_base")}
    for pid, r in raw.items():
        if pid in keep:
            continue
        fsio.delete(os.path.join(mdir, f"part-{pid}.json"))
        # shallow-clone records (P57) reference files the SOURCE
        # container owns — reclaim the record, never the shared bytes
        if not r.get("external") and \
                os.path.basename(r["path"]) not in dv_referenced:
            fsio.delete(r["path"])
        swept += 1
    for name in fsio.listdir(out_dir):
        if name.startswith("part-p") and name.endswith(".bin") \
                and name not in dv_referenced:
            pid = name[len("part-"):-len(".bin")]
            if not fsio.exists(os.path.join(mdir, f"part-{pid}.json")):
                fsio.delete(os.path.join(out_dir, name))
                swept += 1
    for name in fsio.listdir(mdir):
        if name.startswith("family-") and name.endswith(".json"):
            fid = name[len("family-"):-len(".json")]
            if fid not in families_in_use:
                fsio.delete(os.path.join(mdir, name))
                swept += 1
    # consolidate settled append/publish claims into the one-file
    # archive (P59 follow-up): the _manifest listing stays
    # O(partitions + crashed appends) instead of O(all appends ever).
    # Uses the PRE-sweep raw ids on purpose: a claim whose records were
    # later swept/rolled back stays archived — its ids remain reserved
    from .append_pipeline import archive_settled_claims

    archive_settled_claims(out_dir, {int(pid[1:]) for pid in raw})
    # a standalone sweep (CLI) has no refold_global tail — drop the
    # swept records out of any P58 checkpoint here
    mf.refresh_checkpoint(out_dir, fsync=False)
    return swept


def compact_container(
    out_dir: str,
    target_weight: int = 4_000_000,
    small_frac: float = 0.5,
    weight_col: str | None = None,
    fsync: bool = True,
    gc: bool = True,
) -> dict:
    """Merge consecutive (by part id) sub-target partitions.

    A partition is small when its mass (``n_weight`` when recorded,
    else ``n_rows``) is under ``small_frac × target_weight``; runs of
    ≥2 consecutive smalls merge greedily up to ``target_weight``.
    Only the touched partitions are decoded/re-encoded — O(small
    bytes), never a container rewrite.  ``weight_col`` overrides the
    recomputed weight column for containers written before records
    carried one (defaults to the members' recorded ``weight_col``).
    Returns a summary; with ``gc=False`` replaced records/files are
    left for a later ``compact_container`` / manual sweep (they are
    invisible either way)."""
    records = mf.load_manifest(out_dir)
    if not records:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    sessions = _load_sessions(out_dir)
    pending = next((s for s in sessions
                    if s.get("n_parts") is None), None)
    if pending is not None:
        # unconditional (not only when groups form): GC's recordless-
        # file sweep would delete a concurrently-resuming append's
        # just-written-not-yet-committed partition files, and an
        # unfinished append's id extent is unknown to the allocator
        raise RuntimeError(
            f"container has an unfinished append "
            f"{pending['append_id']!r} (base {pending['base']}): "
            "resume it before compacting")
    thresh = max(1, int(small_frac * target_weight))

    def mass(r: dict) -> int:
        return int(r.get("n_weight") or 0) or int(r["n_rows"])

    # numeric id order: string sort misorders once the 6-digit padding
    # overflows (p1000000 sorts before p999999), which would break the
    # consecutive-run grouping on a long-lived container
    ordered = sorted(records.values(),
                     key=lambda r: int(r["part_id"][1:]))
    groups: list[list[dict]] = []
    cur: list[dict] = []
    cur_mass = 0
    for r in ordered:
        if mass(r) < thresh:
            if cur and cur_mass + mass(r) > target_weight:
                groups.append(cur)
                cur, cur_mass = [], 0
            cur.append(r)
            cur_mass += mass(r)
        else:
            if cur:
                groups.append(cur)
                cur, cur_mass = [], 0
    if cur:
        groups.append(cur)
    groups = [g for g in groups if len(g) >= 2]
    recs: list[dict] = []
    if groups:
        # allocate ids past every committed record (replaced included)
        # and every append-ledger reservation
        committed_max = max(_raw_record_ids(out_dir), default=-1)
        reserved_max = max(
            (int(s["base"]) + int(s["n_parts"]) - 1 for s in sessions),
            default=-1)
        base = max(committed_max, reserved_max) + 1

        if weight_col is not None:
            groups = [[dict(m, weight_col=weight_col) for m in g]
                      for g in groups]
        # one txn stamp for the whole pass (a crashed pass's re-run
        # allocates a fresh stamp for its remaining groups: each group
        # flip is independently consistent, so the history just reads
        # as two sequential compactions)
        from .append_pipeline import next_txn_all

        txn = next_txn_all(out_dir)
        recs = ray.get([
            _compact_group.remote(out_dir, base + i, g, fsync, txn)
            for i, g in enumerate(groups)
        ])

    swept = sweep_invisible(out_dir) if gc else 0

    from .append_pipeline import refold_global

    combined = refold_global(out_dir)   # keep the sidecar fresh
    summary = {
        "n_groups": len(groups),
        "n_compacted": sum(len(g) for g in groups),
        "new_ids": [r["part_id"] for r in recs],
        "gc_swept": swept,
        "n_partitions": combined["n_partitions"],
        "n_rows": combined["n_rows"],
        "encoded_bytes": combined["encoded_bytes"],
        "out_dir": out_dir,
    }
    return summary
