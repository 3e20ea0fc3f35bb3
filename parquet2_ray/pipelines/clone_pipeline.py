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

__all__ = ["clone_container"]


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
