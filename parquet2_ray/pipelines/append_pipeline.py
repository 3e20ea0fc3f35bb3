"""Incremental container ingest: append an increment's partitions to an
EXISTING encoded container without touching (or re-reading) the
committed ones — the encode-side completion of the incremental family
(P38 ``incremental_dedup``, P39 ``incremental_neardup``: dedup the
increment against history, then ``append_dataset`` the survivors).

Semantics: each append is a self-contained partition family.  The
increment is planned over ITSELF (its own source/weight quantiles) and
its partitions commit under global ids starting past every id any
previous run — committed or in-flight-crashed — could have used.
Readers need no special handling: ``decode_dataset``, the Datasource,
and bloom/range pruning all iterate manifest records per partition.

Crash-safe id allocation: ``base = max(committed id, reserved id) + 1``
alone would SHIFT ids on a resumed append (a crash mid-append commits
some partitions, raising the max), so a re-run could re-encode the same
rows under fresh ids — duplicating data.  Instead each append first
PLANS its increment (``plan_encode`` — read-only, so the extent
``n_parts`` is known up front), then reserves a FIXED id range + txn
stamp in an atomically-created claim file
(``_manifest/claim-<base>.json``, keyed by a deterministic
``append_id`` = hash of the resolved input files + sizes).  A re-run
of the same increment finds its claim, reuses its base/txn, and the
per-partition fingerprint resume skips what already committed.

CONCURRENT appends (P59): claim creation is a create-exclusive
test-and-set (``fsio.atomic_create``) on the claim's base id.  Two
appenders computing from the same visible manifest state derive the
SAME ``(base, txn)`` — base and txn are both max+1 counters over one
listing — so they collide on the claim name and the loser re-reads
and re-claims past the winner; appenders with different visible
states already derive disjoint ranges.  Fixed extents mean an
in-flight (or crashed) append never blocks another: its claim is just
a consumed range; abandoned claims burn ids/txns, which are cheap and
sparse-safe.  On LOCAL filesystems the test-and-set is exact
(``os.link``); on object stores pyarrow.fs has no conditional PUT, so
``fsio.atomic_create`` adds a READ-BACK VERIFY with a settle window:
same-instant racers (PUTs within the window) resolve to exactly one
winner — the loser sees its claim body overwritten, gets the same
``FileExistsError`` as a name collision, and re-claims a disjoint
range.  The residual is a writer stalling longer than the settle
between its existence check and its PUT; deployments needing
exactness under that failure mode should fence externally or use a
conditional-put backend.  Maintenance
ops stay single-writer and must not run concurrently with appends
(same contract as before); their txn allocation consults claims
(``next_txn_all``) so a reserved-but-uncommitted append txn is never
reused.

Legacy ``_appends.json`` session ledgers remain readable: their
sessions count toward id/txn allocation, resume into them works
(including finalizing a crashed legacy session's extent), and an
unfinished legacy session of a DIFFERENT increment still refuses new
appends exactly as before (its extent is unknown, so nothing can
allocate past it).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import replace

import ray.data as rd

from ..state import fsio
from ..state import manifest as mf
from .encode_pipeline import EncodeOptions, encode_dataset, plan_encode

__all__ = ["append_dataset", "next_txn_all"]


def _ledger_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_appends.json")


def _legacy_sessions(out_dir: str) -> list[dict]:
    """Pre-claim-era session ledger (one shared JSON list, single-
    appender).  Still honored: allocation counts its ranges, resume
    finalizes its pending entries."""
    p = _ledger_path(out_dir)
    if not fsio.exists(p):
        return []
    return json.loads(fsio.read_bytes(p))


def _claim_path(out_dir: str, base: int) -> str:
    return os.path.join(out_dir, "_manifest", f"claim-{base}.json")


def _claim_archive_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest", "claims.json")


def _load_claims(out_dir: str) -> list[dict]:
    """All claims: the consolidated archive (settled claims folded in
    by the GC sweep, one file regardless of append count) plus live
    claim files (same shape as legacy sessions: append_id, base,
    n_parts, txn).  Dedup by base — the archive write and the claim-
    file delete are two steps, so a crash between them leaves both
    copies (identical content).  Unparseable files are skipped — on
    object stores a claim PUT is atomic, and locally the link-commit
    publishes full content, so a torn claim can only be foreign
    garbage."""
    d = os.path.join(out_dir, "_manifest")
    by_base: dict[int, dict] = {}
    ap = _claim_archive_path(out_dir)
    if fsio.exists(ap):
        try:
            for c in json.loads(fsio.read_bytes(ap)):
                by_base[int(c["base"])] = c
        except (ValueError, OSError):
            pass
    for name in fsio.listdir(d):
        if name.startswith("claim-") and name.endswith(".json"):
            try:
                c = json.loads(fsio.read_bytes(os.path.join(d, name)))
                by_base[int(c["base"])] = c
            except (ValueError, OSError):
                continue
    return [by_base[b] for b in sorted(by_base)]


def archive_settled_claims(out_dir: str, raw_ids: set[int],
                           fsync: bool = True) -> int:
    """Fold SETTLED claims into the one-file archive so the
    ``_manifest`` listing stays O(partitions + crashed appends), not
    O(all appends ever).  A claim is settled when every id in its
    range exists as a raw record — its append completed; the claim is
    then needed only for id/txn accounting and resume identity, both
    of which the archive serves.  Unsettled (crashed/in-flight) claims
    stay as live files.  Called from the GC sweep, which holds the
    single-writer maintenance window, so the archive's read-modify-
    write cannot race a concurrent appender's claim creation.  Crash
    ordering: archive first (atomic), then delete the folded files —
    a crash between leaves duplicates that _load_claims dedups."""
    live = []
    d = os.path.join(out_dir, "_manifest")
    for name in fsio.listdir(d):
        if name.startswith("claim-") and name.endswith(".json"):
            try:
                live.append((name, json.loads(
                    fsio.read_bytes(os.path.join(d, name)))))
            except (ValueError, OSError):
                continue
    settled = [(n, c) for n, c in live
               if all(i in raw_ids for i in
                      range(int(c["base"]),
                            int(c["base"]) + int(c["n_parts"])))]
    if not settled:
        return 0
    merged: dict[int, dict] = {}
    ap = _claim_archive_path(out_dir)
    if fsio.exists(ap):
        try:
            for c in json.loads(fsio.read_bytes(ap)):
                merged[int(c["base"])] = c
        except (ValueError, OSError):
            pass
    for _, c in settled:
        merged[int(c["base"])] = c
    fsio.atomic_write(ap, json.dumps(
        [merged[b] for b in sorted(merged)], indent=1).encode(),
        fsync=fsync)
    for name, _ in settled:
        fsio.delete(os.path.join(d, name))
    return len(settled)


def _load_sessions(out_dir: str) -> list[dict]:
    """Every reservation that consumes id/txn space: legacy ledger
    sessions + claim files.  Consumers (compact/delete/upsert/recluster
    reserved_max, ingest txn lookup, the global-manifest appends field)
    see one merged view."""
    return _legacy_sessions(out_dir) + _load_claims(out_dir)


def next_txn_all(out_dir: str) -> int:
    """Next transaction stamp over committed records AND reservations.
    ``mf.next_txn`` alone sees only raw records, so a maintenance op
    running after a claimed-but-uncommitted (crashed or in-flight)
    append would reuse the claim's reserved stamp — and the resumed
    append would then share a txn with the maintenance op's commit.
    Every txn allocation outside append's own claim goes through
    here."""
    reserved = max((int(s["txn"]) for s in _load_sessions(out_dir)
                    if s.get("txn") is not None), default=0)
    return max(mf.next_txn(out_dir), reserved + 1)


def _claim_range(out_dir: str, append_id: str, n_parts: int,
                 fsync: bool) -> dict:
    """Reserve (or find) this append's fixed ``[base, base+n_parts)``
    id range and txn stamp.  Lock-free: the claim file's atomic
    create-exclusive write is the only synchronization (see module
    docstring for why same-state writers always collide on the name).
    """
    from .compact_pipeline import _raw_record_ids

    while True:
        claims = _load_claims(out_dir)
        mine = next((c for c in claims
                     if c["append_id"] == append_id), None)
        if mine is None:
            legacy = _legacy_sessions(out_dir)
            mine = next((s for s in legacy
                         if s["append_id"] == append_id), None)
            if mine is not None:
                if mine.get("n_parts") is None:
                    return mine        # legacy pending: we ARE its resume
            else:
                pending = next((s for s in legacy
                                if s.get("n_parts") is None), None)
                if pending is not None:
                    raise RuntimeError(
                        f"container has an unfinished append "
                        f"{pending['append_id']!r} (base "
                        f"{pending['base']}, legacy ledger): its extent "
                        "is unknown, so nothing can allocate past it — "
                        "resume it (same input / append_id) before "
                        "appending a different increment")
        if mine is not None:
            if int(mine["n_parts"]) != n_parts:
                raise RuntimeError(
                    f"append {append_id!r} re-ran with a different plan "
                    f"({n_parts} partitions, reserved "
                    f"{mine['n_parts']}): the increment's content "
                    "changed under a reused append_id — give the "
                    "changed input a new id")
            return mine

        # fresh claim: both counters from one pass over visible state
        raw, _fams = mf.load_raw_records(out_dir)
        committed_id_max = max(_raw_record_ids(out_dir), default=-1)
        sessions = _legacy_sessions(out_dir) + claims
        reserved_id_max = max(
            (int(s["base"]) + int(s["n_parts"]) - 1 for s in sessions
             if s.get("n_parts") is not None), default=-1)
        base = max(committed_id_max, reserved_id_max) + 1
        txn = max(
            max((mf.record_txn(r) for r in raw.values()), default=0),
            max((int(s["txn"]) for s in sessions
                 if s.get("txn") is not None), default=0),
        ) + 1
        claim = {"append_id": append_id, "base": base,
                 "n_parts": n_parts, "txn": txn, "op": "append"}
        try:
            fsio.atomic_create(
                _claim_path(out_dir, base),
                json.dumps(claim, indent=1).encode(), fsync=fsync)
            return claim
        except FileExistsError:
            continue                   # lost the race: re-read, re-claim


def refold_global(out_dir: str) -> dict:
    """Recompute the `_MANIFEST.json` sidecar from ALL active partition
    records — O(partitions) driver reads, no data touched.  Every
    maintenance op (append, compact, delete) calls this so the sidecar
    never goes stale relative to the per-partition manifest.

    Also the one shared hook where a P58 manifest checkpoint (if the
    operator created one) is refreshed after each op's commits —
    O(this op's changes) reads, and the checkpoint stays near a 100%
    hit ratio without manual re-checkpoints.  fsync=False: the
    checkpoint is a cache; losing it on a crash only costs reads.

    Both artifacts are CACHES, so the P59 concurrent-append race is
    benign here: two appenders refolding at once can leave the sidecar
    (or checkpoint) one commit stale — the next op refolds it fresh,
    and the checkpoint loader stat-reconciles regardless.  The
    manifest records themselves are never written here."""
    mf.refresh_checkpoint(out_dir, fsync=False)
    records = mf.load_manifest(out_dir)
    combined = {
        "n_partitions": len(records),
        "n_rows": int(sum(r["n_rows"] for r in records.values())),
        "n_weight": int(sum(r.get("n_weight", 0) for r in records.values())),
        "raw_bytes": int(sum(r["raw_bytes"] for r in records.values())),
        "encoded_bytes": int(sum(r["encoded_bytes"]
                                 for r in records.values())),
        "appends": _load_sessions(out_dir),
        "out_dir": out_dir,
    }
    mf.write_global_manifest(out_dir, combined)
    return combined


def _input_append_id(input_path, filesystem) -> str:
    """Deterministic identity of a path increment: sha256 over the
    resolved (path, size) list — the same files re-run hash the same,
    so a crashed append resumes its reserved id range."""
    from ..sources.readers import resolve_input_files

    fs, files = resolve_input_files(input_path, filesystem)
    h = hashlib.sha256()
    for f, info in zip(files, fs.get_file_info(files)):
        h.update(f.encode())
        h.update(b"\0")
        h.update(str(info.size or 0).encode())
        h.update(b"\0")
    return h.hexdigest()[:32]


def _check_schema_compatible(input_path, out_dir: str, columns,
                             filesystem, evolve: bool = False) -> None:
    """An increment whose columns differ from the container's would
    silently create a mixed-schema container that breaks decode — the
    per-run heterogeneity check inside encode_dataset cannot see ACROSS
    runs, so appends validate against a committed partition footer.

    ``evolve=True`` (P48 schema evolution) relaxes exact equality to
    ADD/OMIT semantics: the increment may introduce new columns (null
    for historical rows) or omit committed ones (null for its own
    rows); SHARED column names must keep identical types.  Readers
    harmonize to the union via decode_dataset's ``_union_fields``."""
    records = mf.load_manifest(out_dir)
    if not records:
        return                       # creating the container: any schema
    from ..codecs.column import type_to_str

    if evolve:
        # evolution must validate against the UNION of every committed
        # column set — checking one footer would let a type conflict on
        # an evolution-ADDED column commit and render the container
        # unreadable (the union derivation itself raises on existing
        # conflicts, so corruption can't compound)
        from .encode_pipeline import _union_fields

        union = _union_fields(list(records.values()))
        if union is None:
            first = min(records, key=lambda p: int(p[1:]))
            footer = mf.read_partition_footer(records[first]["path"])
            cols = (footer["blocks"][0]["columns"] if footer.get("paged")
                    else footer["columns"])
            have = [(m["name"], m["arrow_type"]) for m in cols]
        else:
            have = union
    else:
        first = min(records, key=lambda p: int(p[1:]))   # numeric, not str
        footer = mf.read_partition_footer(records[first]["path"])
        cols = (footer["blocks"][0]["columns"] if footer.get("paged")
                else footer["columns"])
        have = [(m["name"], m["arrow_type"]) for m in cols]
    if isinstance(input_path, rd.Dataset):
        sch = input_path.schema()
        new = [(n, type_to_str(t)) for n, t in zip(sch.names, sch.types)]
    else:
        import pyarrow.parquet as pq

        from ..sources.readers import resolve_input_files

        fs, files = resolve_input_files(input_path, filesystem)
        psch = pq.read_schema(files[0], filesystem=fs)
        new = [(f.name, type_to_str(f.type)) for f in psch]
    if columns is not None:
        new = [(n, t) for n, t in new if n in columns]
    if evolve:
        have_d, new_d = dict(have), dict(new)
        clash = [n for n in have_d.keys() & new_d.keys()
                 if have_d[n] != new_d[n]]
        if clash:
            raise ValueError(
                f"append schema evolution cannot CHANGE column types: "
                f"{[(n, have_d[n], new_d[n]) for n in clash]} — "
                "evolution only adds or omits whole columns")
        return
    if new != have:
        raise ValueError(
            f"append schema mismatch: container has {have}, increment "
            f"has {new} — appends must match the committed schema "
            "(names AND types) exactly; project/cast the increment, "
            "pass evolve_schema=True to add/omit columns, or start a "
            "new container")


def append_dataset(
    input_path: str | list[str] | rd.Dataset,
    out_dir: str,
    opts: EncodeOptions | None = None,
    columns: list[str] | None = None,
    filesystem=None,
    append_id: str | None = None,
    evolve_schema: bool = False,
) -> dict:
    """Append an increment to an existing container (or create it).

    ``append_id`` identifies the increment for resume: defaults to a
    content hash of the resolved input files for path inputs; REQUIRED
    for Dataset inputs (a Dataset has no stable identity to hash — an
    append without one cannot resume into its reserved id range).
    ``evolve_schema=True`` lets the increment ADD new columns (null for
    historical rows) or OMIT committed ones (null for its rows); shared
    columns must keep their types, and every reader harmonizes decoded
    partitions to the union schema.
    Returns the increment's encode summary plus combined container
    totals under ``"container"``.
    """
    opts = opts or EncodeOptions()
    if isinstance(input_path, rd.Dataset):
        if append_id is None:
            raise ValueError(
                "append_dataset with a Dataset input needs an explicit "
                "append_id (stable across retries) for crash-safe id "
                "allocation; path inputs derive one from file contents")
    elif append_id is None:
        append_id = _input_append_id(input_path, filesystem)

    fsio.ensure_dir(out_dir)
    mf.manifest_dir(out_dir)             # claims live here
    # generated columns (P74): derive/overwrite them on the increment
    # BEFORE schema checks, validation and planning, so every ingest
    # path stores the identical derived values
    from .generated_pipeline import apply_generated, get_generated

    gspecs = get_generated(out_dir)
    if gspecs:
        gds = (input_path if isinstance(input_path, rd.Dataset)
               else rd.read_parquet(input_path, filesystem=filesystem))
        if columns is not None:
            gds = gds.select_columns(columns)
            columns = None
        input_path = gds.map_batches(
            lambda b: apply_generated(b, gspecs),
            batch_format="pyarrow")
    _check_schema_compatible(input_path, out_dir, columns, filesystem,
                             evolve=evolve_schema)
    # declared CHECK constraints (P65) validate the increment BEFORE
    # anything is planned, claimed or staged — a violating increment
    # reserves nothing
    from .constraints_pipeline import check_increment, get_constraints

    cs = get_constraints(out_dir)
    if cs:
        val_ds = (input_path if isinstance(input_path, rd.Dataset)
                  else rd.read_parquet(input_path, filesystem=filesystem))
        if columns is not None:
            val_ds = val_ds.select_columns(columns)
        check_increment(out_dir, val_ds, cs)
    # plan FIRST (read-only): knowing the extent up front is what makes
    # the reservation a fixed range other appends can allocate past —
    # legacy reserved extents were unknown until after the encode, so
    # one pending append serialized the whole container
    ctx = plan_encode(input_path, opts, columns=columns,
                      filesystem=filesystem)
    mine = _claim_range(out_dir, append_id, ctx["plan"].n_parts,
                        opts.fsync)
    base = int(mine["base"])
    # reuse the reserved txn stamp, so a resumed append's late
    # partitions land in the SAME snapshot as its crashed-run ones
    # (pre-txn-era legacy ledgers lack the key: allocate fresh)
    txn = int(mine["txn"]) if mine.get("txn") is not None \
        else next_txn_all(out_dir)
    # a reservation with a known extent pins the plan size:
    # encode_dataset re-validates it before any task launches (claims
    # are checked in _claim_range already; this also covers finalized
    # legacy sessions)
    expected = (int(mine["n_parts"])
                if mine.get("n_parts") is not None else None)
    run_opts = replace(
        opts, id_offset=base, expected_n_parts=expected,
        # snapshot lineage: every record of this increment carries the
        # append's reserved txn stamp (time travel / history / rollback
        # resolve on it — state/manifest.py resolve_active)
        record_extra={**(opts.record_extra or {}),
                      "txn": txn, "op": "append"})
    try:
        summary = encode_dataset(input_path, out_dir, run_opts,
                                 columns=columns, filesystem=filesystem,
                                 _plan_ctx=ctx)
    except RuntimeError as e:
        if "resumed reservation" in str(e):
            raise RuntimeError(
                f"append {append_id!r} re-ran with a different plan "
                f"(reserved {mine['n_parts']} partitions): the "
                "increment's content changed under a reused append_id "
                "— give the changed input a new id") from e
        raise

    n_parts = int(summary["plan"]["n_parts"])
    if mine.get("n_parts") is None:
        # finalize a resumed LEGACY pending session with the realized
        # extent (new-style claims are born finalized); single-appender
        # RMW is safe here — a legacy-pending container refuses other
        # appends until this completes
        sessions = _legacy_sessions(out_dir)
        for s in sessions:
            if s["append_id"] == append_id:
                s["n_parts"] = n_parts
                if s.get("txn") is None:
                    s["txn"] = txn
        fsio.atomic_write(_ledger_path(out_dir),
                          json.dumps(sessions, indent=1).encode(),
                          fsync=opts.fsync)

    # the global manifest written by encode_dataset covers only this
    # increment; refold it over ALL committed partitions
    combined = refold_global(out_dir)
    return dict(summary, container=combined, append_id=append_id,
                id_offset=base, txn=txn)
