"""P57 shallow clone: branch a container in O(metadata).

``clone_container(src, dst)`` creates a NEW container whose manifest
records point at the SOURCE's data files — zero bytes of data copied,
O(partitions) driver-side JSON writes.  The clone then lives its own
life: append / delete / upsert / compact / recluster / snapshot
history all work unchanged (rewrites land as ordinary internal
partitions inside the clone; untouched partitions keep reading the
shared source files).  The Delta-Lake ``SHALLOW CLONE`` shape — a
cheap branch for experiments ("scrub this corpus variant, compare
eval metrics") over a 100 TB container that would be insane to copy.

Mechanics: cloned records carry ``external: true`` and an absolute
(or URI) path.  The ONLY code that ever deletes a data file by record
path — ``sweep_invisible`` and ``rollback_container`` — skips external
records' files (their manifest JSON is still reclaimed), so no
maintenance op in the clone can ever touch the source's bytes.  Id
allocation, txn stamping, verify, pruning, time travel inherit with
zero special cases because the clone's records ARE ordinary records.

Contract (same as Delta's): the clone references, it does not own —
a retention sweep or rollback IN THE SOURCE that removes files the
clone still references breaks those clone partitions.  Clone from a
tagged snapshot and keep the tag, or sweep the source with a horizon,
to hold the shared files.

No reference analog: parquet2 has no dataset state; this is the
lineage layer compounding (P49 snapshots give `as_of` clones for
free).
"""

from __future__ import annotations

import json
import os

from ..state import fsio
from ..state import manifest as mf

__all__ = ["clone_container", "publish_clone"]


def clone_container(src_dir: str, dst_dir: str,
                    as_of: int | str | None = None,
                    fsync: bool = True) -> dict:
    """Shallow-clone ``src_dir``'s snapshot at ``as_of`` (txn or tag;
    default current) into ``dst_dir`` — metadata only.

    The clone starts a FRESH history: every cloned record is stamped
    txn 0 / op "clone" with its ``replaces``/``family`` lineage
    resolved away (the snapshot is already resolved), so the clone's
    own maintenance ops stack txns 1, 2, … exactly like a new encode.
    """
    if isinstance(as_of, str):
        from .history_pipeline import resolve_as_of

        as_of = resolve_as_of(src_dir, as_of)
    if os.path.realpath(src_dir) == os.path.realpath(dst_dir):
        raise ValueError("clone target must differ from the source")
    records = mf.load_manifest(src_dir, as_of=as_of)
    if not records:
        raise FileNotFoundError(f"no committed partitions under {src_dir}")
    if fsio.exists(mf.manifest_dir(dst_dir)) and any(
            n.startswith("part-") for n in fsio.listdir(
                mf.manifest_dir(dst_dir))):
        raise FileExistsError(
            f"{dst_dir} already holds a container; clone refuses to "
            "merge into existing history")
    os.makedirs(mf.manifest_dir(dst_dir), exist_ok=True)
    for pid, r in sorted(records.items()):
        nr = dict(r)
        p = r["path"]
        if "://" not in p and not os.path.isabs(p):
            p = os.path.abspath(p)
        nr["path"] = p
        nr["external"] = True
        nr["txn"] = 0
        nr["op"] = "clone"
        nr.pop("replaces", None)
        nr.pop("family", None)
        mf.commit_manifest_record(dst_dir, nr, fsync=fsync)
    # provenance marker (tooling/debug only — never consulted by reads)
    prov = {"src": os.path.abspath(src_dir) if "://" not in src_dir
            else src_dir,
            "as_of": as_of, "n_partitions": len(records)}
    mf._atomic_write(os.path.join(mf.manifest_dir(dst_dir), "clone.json"),
                     json.dumps(prov, separators=(",", ":")).encode(),
                     fsync=fsync)
    from .append_pipeline import refold_global

    combined = refold_global(dst_dir)
    return {"src": src_dir, "as_of": as_of, "out_dir": dst_dir,
            "n_partitions": combined["n_partitions"],
            "n_rows": combined["n_rows"]}


def publish_clone(clone_dir: str, fsync: bool = True,
                  link: bool = False) -> dict:
    """P60: merge a diverged clone's ADDITIONS back into its source —
    the other half of the branch workflow ("clone, run the experiment,
    publish the rows it produced").

    Semantics are ADDITIVE and conflict-checked, not a general
    three-way merge: every partition the clone ADDED since the branch
    point (append / ingest / upsert-inserts / its own compactions of
    those) is committed into the source as one family-atomic merge
    txn; the source may have advanced independently (its own appends,
    compactions, rewrites of the shared files — additions don't care).
    If the clone REWROTE or DELETED shared branch-point data (any
    ``op="clone"`` record no longer active — a delete/upsert/compact/
    recluster touched it), publish REFUSES with the exact partition
    ids: an additions-only merge would silently drop those changes.

    Mechanics: additions are the clone's active records with
    ``op != "clone"``.  A deterministic merge id (hash of the
    additions' content fingerprints) routes through the P59 claim
    protocol for the id range + txn — idempotent re-publish, crash
    resume into the same range, and safe alongside concurrent appends
    to the source.  Data bytes are COPIED (the source must own what it
    serves; ``link=True`` opts into zero-copy external records with
    the same reference-not-own contract as the clone itself).  Records
    stage under a merge family and flip visible in ONE marker write —
    a crash mid-publish leaves the source bit-identical.

    Schema evolution composes: the merged column set is validated
    against the union of source + additions (type conflicts refuse up
    front), and readers harmonize as with any evolved append."""
    import hashlib

    from .append_pipeline import _claim_range, refold_global

    prov_path = os.path.join(clone_dir, "_manifest", "clone.json")
    if not fsio.exists(prov_path):
        raise FileNotFoundError(
            f"{clone_dir} has no clone provenance (_manifest/clone.json) "
            "— publish_clone only merges containers created by "
            "clone_container")
    src_dir = json.loads(fsio.read_bytes(prov_path))["src"]
    raw, committed_families = mf.load_raw_records(clone_dir)
    active = mf.resolve_active(raw, committed_families)
    hidden_shared = sorted(
        pid for pid, r in raw.items()
        if r.get("op") == "clone" and pid not in active)
    if hidden_shared:
        raise RuntimeError(
            f"clone rewrote or deleted shared branch-point partitions "
            f"{hidden_shared} — an additions-only publish would drop "
            "those changes; apply them to the source directly (or "
            "re-clone and keep the branch additive)")
    additions = sorted(
        (r for r in active.values() if r.get("op") != "clone"),
        key=lambda r: int(r["part_id"][1:]))
    if not additions:
        return {"src": src_dir, "clone": clone_dir, "merged": 0,
                "noop": True}

    # schema-evolution validation against the union of both sides
    from .encode_pipeline import _union_fields

    src_records = mf.load_manifest(src_dir)
    _union_fields(list(src_records.values()) + additions)  # raises on clash

    h = hashlib.sha256()
    for r in additions:
        h.update(str(r.get("fingerprint", r["part_id"])).encode())
        h.update(b"\0")
    merge_id = h.hexdigest()[:32]
    claim = _claim_range(src_dir, f"publish:{merge_id}",
                         len(additions), fsync)
    base, txn = int(claim["base"]), int(claim["txn"])
    fid = f"merge-{merge_id[:16]}"
    if mf.family_committed(src_dir, fid):
        combined = refold_global(src_dir)
        return {"src": src_dir, "clone": clone_dir, "noop": True,
                "merged": len(additions), "txn": txn, "family": fid,
                "n_partitions": combined["n_partitions"],
                "n_rows": combined["n_rows"]}

    for i, r in enumerate(additions):
        new_id = base + i
        nr = dict(r)
        nr["part_id"] = f"p{new_id:06d}"
        nr.pop("replaces", None)
        nr["family"] = fid
        nr["txn"] = txn
        nr["op"] = "merge"
        src = r["path"]
        if r.get("dv_base") and not link:
            # deletion-vector addition (P62): a byte-copied sidecar
            # would resolve its base against the SOURCE directory — a
            # missing file, or worse a colliding same-named source
            # partition serving wrong rows.  Fold the mask instead:
            # decode the masked view (identical fingerprint — base
            # order is canonical) and commit a REAL partition the
            # source owns.  link=True needs no fold: the linked
            # absolute sidecar path resolves its base against the
            # CLONE's own directory.
            from ..stages.encode import (
                decode_partition_path,
                encode_partition_table,
            )

            eo = r.get("encoding_opts") or {}
            sk = r.get("sort_key") or None
            encode_partition_table(
                decode_partition_path(src), src_dir,
                sort_key=sk,
                weight_col=r.get("weight_col"),
                forced_codecs=eo.get("forced_codecs") or {},
                resume=True,
                compression=eo.get("compression"),
                fsync=fsync,
                rows_per_block=eo.get("rows_per_block"),
                extra_record={"family": fid, "txn": txn, "op": "merge"},
                part_id=f"p{new_id:06d}",
            )
            continue
        if link:
            p = src
            if "://" not in p and not os.path.isabs(p):
                p = os.path.abspath(p)
            nr["path"] = p
            nr["external"] = True
        else:
            dst = os.path.join(src_dir, f"part-p{new_id:06d}.bin")
            # content-identical copy: the record's fingerprint (a
            # content hash) stays valid for verify
            if not fsio.exists(dst) or fsio.getsize(dst) != \
                    fsio.getsize(src):
                fsio.atomic_write(dst, fsio.read_bytes(src), fsync=fsync)
            nr["path"] = dst
            nr.pop("external", None)
        mf.commit_manifest_record(src_dir, nr, fsync=fsync)
    mf.commit_family(src_dir, fid, fsync=fsync)
    combined = refold_global(src_dir)
    return {"src": src_dir, "clone": clone_dir, "merged": len(additions),
            "txn": txn, "family": fid, "id_offset": base, "link": link,
            "n_partitions": combined["n_partitions"],
            "n_rows": combined["n_rows"]}
