"""Container maintenance composition (`maintain_container`, CLI
``maintain``) — the OPTIMIZE verb: one call that (1) folds
deletion-vector partitions back into real files, (2) compacts
small-partition runs, (3) sweeps invisible state under a retention
horizon, and (4) writes/refreshes the manifest checkpoint over the
settled record set (maintain is the operator's opt-in point for P58).  Each step is
the existing crash-safe primitive; the composition just sequences them
in the order that makes each cheaper (folding before compaction lets a
fold result join a compaction run; sweeping last reclaims everything
the first two steps replaced).

``fold_deletion_vectors`` exists because compaction alone cannot
retire every mask: compact merges RUNS OF SMALL partitions, so a
full-size partition carrying a dv sidecar never qualifies — its mask
(one extra pread + bitmap AND per read, plus a pinned base file
holding deleted bytes) would persist forever.  The fold rewrites any
dv record whose deleted fraction ≥ ``min_waste`` into a real
partition under the standard ``replaces`` flip (op="fold", one txn
per pass); the sweep then reclaims both sidecar and base.
"""

from __future__ import annotations

import ray

from ..state import manifest as mf
from .append_pipeline import _load_sessions
from .compact_pipeline import _raw_record_ids

__all__ = ["fold_deletion_vectors", "maintain_container"]


@ray.remote
def _fold_one(out_dir: str, new_id: int, member: dict, fsync: bool,
              txn: int) -> dict:
    from ..stages.encode import decode_partition_path, encode_partition_table

    tbl = decode_partition_path(member["path"])   # masked view
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
            "txn": txn, "op": "fold"},
        part_id=f"p{new_id:06d}",
    )
    r = rec.to_pylist()[0]
    return {"new": r["part_id"], "old": member["part_id"],
            "rows": r["n_rows"]}


def fold_deletion_vectors(out_dir: str, min_waste: float = 0.0,
                          fsync: bool = True) -> dict:
    """Rewrite deletion-vector partitions (P62) whose deleted fraction
    ≥ ``min_waste`` into real partitions.  The fingerprint is already
    the masked view's, so verify stays green across the fold; the
    replaced sidecar + base are reclaimed by the next sweep."""
    records = mf.load_manifest(out_dir)
    if not records:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    sessions = _load_sessions(out_dir)
    pending = next((s for s in sessions if s.get("n_parts") is None), None)
    if pending is not None:
        raise RuntimeError(
            f"container has an unfinished append "
            f"{pending['append_id']!r}: resume it before maintaining")
    targets = [
        r for r in records.values()
        if r.get("dv_base")
        and (r["base_rows"] - r["n_rows"]) >= min_waste * r["base_rows"]
    ]
    if not targets:
        return {"n_folded": 0, "n_partitions": len(records),
                "out_dir": out_dir}
    base = max(max(_raw_record_ids(out_dir), default=-1),
               max((int(s["base"]) + int(s["n_parts"]) - 1
                    for s in sessions), default=-1)) + 1
    from .append_pipeline import next_txn_all, refold_global

    txn = next_txn_all(out_dir)
    results = ray.get([
        _fold_one.remote(out_dir, base + i, m, fsync, txn)
        for i, m in enumerate(
            sorted(targets, key=lambda r: int(r["part_id"][1:])))
    ])
    combined = refold_global(out_dir)
    return {"n_folded": len(results),
            "n_rows_rewritten": int(sum(r["rows"] for r in results)),
            "n_partitions": combined["n_partitions"],
            "out_dir": out_dir}


def maintain_container(out_dir: str,
                       target_weight: int = 4_000_000,
                       small_frac: float = 0.5,
                       fold_min_waste: float = 0.0,
                       retain_from_txn: int | None = None,
                       refresh_sidecars: bool = True,
                       fsync: bool = True) -> dict:
    """OPTIMIZE: fold dv masks → compact small runs → refresh the
    registered sidecars (P72: indexes + materialized views converge
    while the pre-maintenance snapshots are STILL intact, so each
    consumes its pending window as a cheap diff and advances its
    cursor past the rewrite-only transactions) → sweep invisible
    state (retaining snapshots from ``retain_from_txn`` onward plus
    every tagged snapshot) → refresh the manifest checkpoint.
    Idempotent; a crash between steps leaves a consistent container
    the next run finishes."""
    from .compact_pipeline import compact_container, sweep_invisible

    folded = fold_deletion_vectors(out_dir, min_waste=fold_min_waste,
                                   fsync=fsync)
    compacted = compact_container(out_dir, target_weight=target_weight,
                                  small_frac=small_frac, fsync=fsync,
                                  gc=False)
    sidecars = {}
    if refresh_sidecars:
        from .sidecar_registry import refresh_sidecars as _refresh

        sidecars = _refresh(out_dir)
    swept = sweep_invisible(out_dir, retain_from_txn=retain_from_txn)
    # CREATE (not just refresh) the checkpoint after the sweep settled
    # the record set — maintain is the operator's opt-in point for P58
    mf.write_manifest_checkpoint(out_dir, fsync=False)
    from .append_pipeline import refold_global

    combined = refold_global(out_dir)
    return {
        "n_folded": folded["n_folded"],
        "n_compacted_groups": compacted.get("n_groups", 0),
        "sidecars": sidecars,
        "gc_swept": swept,
        "n_partitions": combined["n_partitions"],
        "n_rows": combined["n_rows"],
        "encoded_bytes": combined["encoded_bytes"],
        "out_dir": out_dir,
    }
