"""Container re-clustering: rewrite a committed container RANGE-
partitioned (and sorted) on a chosen key, so min/max pruning on that
key becomes maximally selective — the lakehouse ``OPTIMIZE ... ZORDER/
CLUSTER BY`` shape, built from the engine's own decode → range-plan →
exchange → encode stages.

Why it matters at 100 TB: a container written in ingest order answers
``key BETWEEN lo AND hi`` by decoding EVERY partition whose accidental
[min,max] overlaps — for a uniformly shuffled key that is all of them.
After re-clustering, partition ids ascend with the key and neighboring
partitions' key ranges are disjoint (up to duplicate edge values), so
``prune_partitions_by_range`` / ``decode_dataset(key_range=...)`` /
``P2RDatasource(key_range=...)`` touch O(selectivity) partitions and
the per-partition page index (rows_per_block) localizes further inside
each.  Combined with ``sort_key=key`` the output is globally sorted.

Mechanics: one light sampling pass over the decoded source computes
weighted key-quantile edges (EncodeOptions.range_key — equal token
MASS per range, so skewed corpora still balance), then the standard
two-stage push exchange routes rows to their key range and each range
encodes, auto-selects codecs, and commits atomically with lineage —
resumable mid-rewrite like any encode (ST3).  The output is a NEW
container directory; cutover is a catalog pointer swap (object stores
have no atomic directory rename), the same contract as compaction
tools everywhere.  The source is never mutated.

No reference analog: parquet2 is a file codec library (closest is the
sorting-column metadata it can DECLARE per row group,
/root/reference/src/metadata/row_metadata.rs — it cannot re-cluster
data).  This is the engine-level operation built on that declaration's
purpose.
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np
import pyarrow as pa

from ..state import manifest as mf
from .encode_pipeline import (
    EncodeOptions,
    _rkey_norm,
    decode_dataset,
    encode_dataset,
)

__all__ = ["recluster_container", "incremental_recluster",
           "clustering_quality", "ZVAL_COL"]

# the Z-order helper column materialized into the rewritten container
# (int64, delta/PFOR-friendly).  Kept on purpose: it is the partition
# key the layout is defined by, and readers project it away for free
# (decode_dataset(columns=...)).
ZVAL_COL = "__zcluster"


def recluster_container(
    src_dir: str,
    out_dir: str,
    key: str | list[str],
    opts: EncodeOptions | None = None,
    zorder_bits: int = 10,
) -> dict:
    """Rewrite the container at ``src_dir`` into ``out_dir`` clustered
    on ``key``.  Returns the new container's encode summary plus
    clustering quality metrics.

    One key → RANGE clustering (globally sorted on the key).  A LIST of
    2+ keys → Z-ORDER clustering: each key column is quantized to
    ``zorder_bits`` bits by sampled quantile grids, the cells' bits are
    interleaved into a ``__zcluster`` int64, and the container is
    range-partitioned + sorted on that — so every partition's [min,max]
    profile is locally tight on EVERY keyed column at once, and range
    probes on any of them prune (the multi-dimensional locality Z-order
    gives Delta/Iceberg OPTIMIZE ZORDER BY — public technique; no
    reference analog, parquet2 cannot re-layout data).

    ``opts`` seeds every other knob (target_weight, compression, fsync,
    resume, ...); its partitioning fields are overridden: group_col →
    None, range_key/sort_key → the cluster key.  weight_col is kept
    when the source schema has it (token-mass-balanced ranges), else
    dropped to row balancing.
    """
    records = mf.load_manifest(src_dir)
    if not records:
        raise FileNotFoundError(f"no committed partitions under {src_dir}")
    ds = decode_dataset(src_dir)
    names = ds.schema().names
    keys = [key] if isinstance(key, str) else list(key)
    if not keys:
        raise ValueError("recluster_container needs at least one key")
    if len(set(keys)) != len(keys):
        raise ValueError(f"duplicate cluster keys: {keys}")
    for k in keys:
        if k not in names:
            raise ValueError(f"key {k!r} not in container schema {names}")
    base = opts or EncodeOptions()
    weight_col = base.weight_col if base.weight_col in names else None
    if len(keys) == 1:
        rkey = keys[0]
    else:
        # int64 interleave budget: k × bits must fit 63 bits — shifts
        # past 63 are silently undefined in numpy and would produce a
        # meaningless (but plausible-looking) clustering
        if len(keys) * zorder_bits > 63:
            raise ValueError(
                f"{len(keys)} keys × {zorder_bits} bits = "
                f"{len(keys) * zorder_bits} interleaved bits > 63; "
                f"lower zorder_bits to ≤ {63 // len(keys)}")
        grids = _sample_quantile_grids(ds, keys, zorder_bits)
        ds = ds.map_batches(
            lambda b, g=grids, ks=keys, nb=zorder_bits:
                b.append_column(ZVAL_COL, pa.array(
                    _zvalues(b, ks, g, nb), type=pa.int64())),
            batch_format="pyarrow")
        rkey = ZVAL_COL
    ropts = replace(base, group_col=None, weight_col=weight_col,
                    range_key=rkey, sort_key=rkey)
    summary = encode_dataset(ds, out_dir, ropts)
    new_records = mf.load_manifest(out_dir)
    summary["clustering"] = (
        {k: clustering_quality(out_dir, k, records=new_records)
         for k in keys} if len(keys) > 1
        else clustering_quality(out_dir, rkey, records=new_records))
    return summary


def incremental_recluster(
    out_dir: str,
    key: str,
    opts: EncodeOptions | None = None,
    gc: bool = True,
) -> dict:
    """IN-PLACE clustering maintenance: rewrite only the partitions
    whose ``key`` ranges overlap each other (the messy tail appends
    accrue on a clustered container), leaving the disjoint core
    untouched — the incremental ``OPTIMIZE`` between full reclusters.

    Mechanics: partitions are split by their manifest [min,max]
    profiles into a pairwise-DISJOINT core and a messy set (any span
    overlapping another, plus spans without stats).  The messy rows are
    decoded, range-planned on ``key`` among THEMSELVES (level-style
    clustering: the new partitions are disjoint from each other, and
    each overlaps only O(1) core partitions), and re-encoded into the
    same container.

    Atomicity: one old partition's rows scatter across several new
    ones, so no single record's ``replaces`` could flip visibility
    safely.  Every new record is committed STAGED under a deterministic
    family id (invisible to all readers), each carrying the full messy
    ``replaces`` set; ``manifest.commit_family`` then activates them
    all in ONE atomic write.  A crash before the marker leaves the
    container exactly as it was (staged state is invisible; re-running
    resumes by fingerprint into the same family).  Single writer per
    container, like every maintenance op.
    """
    import hashlib

    import ray.data as rd

    from ..stages.encode import decode_partition_path
    from .append_pipeline import (
        _load_sessions,
        next_txn_all,
        refold_global,
    )
    from .compact_pipeline import _raw_record_ids, sweep_invisible

    records = mf.load_manifest(out_dir)
    if not records:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    sessions = _load_sessions(out_dir)
    pending = next((s for s in sessions if s.get("n_parts") is None), None)
    if pending is not None:
        raise RuntimeError(
            f"container has an unfinished append "
            f"{pending['append_id']!r}: resume it before reclustering")
    base_opts = opts or EncodeOptions()

    # core = a MAXIMUM pairwise-disjoint subset of the key spans
    # (greedy earliest-endpoint interval selection — optimal); messy =
    # everything else, plus statless partitions.  A mutual-overlap
    # count would be wrong here: one month-wide appended partition
    # overlaps EVERY core partition and would drag the whole container
    # into the rewrite.
    spans: dict[str, tuple] = {}
    statless: list[str] = []
    from ..functions.stats import key_span

    for pid, r in records.items():
        span = key_span(r, key)
        if span is None:
            statless.append(pid)
        else:
            spans[pid] = span
    kept_hi = None
    core: set[str] = set()
    for pid, (lo, hi) in sorted(spans.items(), key=lambda kv: kv[1][1]):
        if kept_hi is None or lo > kept_hi:
            core.add(pid)
            kept_hi = hi
    messy = statless + [pid for pid in spans if pid not in core]
    # a SINGLE messy partition is still worth rewriting — one wide
    # appended partition overlaps every core span and poisons every
    # range probe until split into range-fitting pieces
    if not messy:
        return {"n_messy": 0, "n_new": 0, "noop": True,
                "n_partitions": len(records), "out_dir": out_dir}

    messy_recs = [records[pid] for pid in sorted(messy)]
    # deterministic family id: a crashed run re-derives it and resumes.
    # EVERY plan-affecting option participates — a re-run with changed
    # options must get a fresh family (and fresh ids), or leftover
    # staged members of the old attempt beyond the new plan's range
    # would activate with it and duplicate rows
    fid = hashlib.blake2b(
        ("|".join(sorted(messy)) +
         f"|{key}|{base_opts.target_weight}|{base_opts.target_rows}"
         f"|{base_opts.weight_col}|{base_opts.compression}"
         f"|{base_opts.rows_per_block}"
         ).encode(), digest_size=8).hexdigest()
    # replaces carries the messy ids AND their own replaces forward
    # transitively (compaction's resurrection guard)
    replaces = sorted(
        set(messy) | {x for r in messy_recs for x in (r.get("replaces") or ())})

    paths = [r["path"] for r in messy_recs]
    # schema-evolved containers (P48): harmonize the messy set to ITS
    # union so the exchange/encode see one schema (None = homogeneous)
    from .encode_pipeline import _pad_to_union, _union_fields

    pad = _union_fields(messy_recs)

    def _decode(batch: pa.Table):
        for p in batch["path"]:
            t = decode_partition_path(p.as_py())
            yield t if pad is None else _pad_to_union(t, pad)

    ds = rd.from_items([{"path": p} for p in paths]).map_batches(
        _decode, batch_format="pyarrow", batch_size=1)
    schema_names = ([n for n, _ in pad] if pad is not None
                    else ds.schema().names)
    weight_col = (base_opts.weight_col
                  if base_opts.weight_col in schema_names else None)
    # id allocation: a crashed run's staged records (same fid) pin the
    # range — the re-run MUST resume into it, or both generations of
    # staged partitions would activate together under the one family
    # marker (duplicate rows).  The plan is deterministic (same messy
    # content + same options → same edges → same ids), so
    # fingerprint-resume skips already-encoded members.
    staged_ids = _family_member_ids(out_dir, fid)
    raw, _fams = mf.load_raw_records(out_dir)
    if staged_ids:
        base = min(staged_ids)
        # resume into the crashed attempt's txn stamp so the family's
        # members stay one snapshot unit (resolve_active takes the max
        # member stamp either way — reusing it keeps history readable)
        txn = max(mf.record_txn(r) for r in raw.values()
                  if r.get("family") == fid)
    else:
        base = max((_raw_record_ids(out_dir) or [-1])) + 1
        base = max(base, max((int(s["base"]) + int(s["n_parts"])
                              for s in sessions), default=0))
        txn = max(mf.next_txn(out_dir, raw),
                  next_txn_all(out_dir))
    ropts = replace(base_opts, group_col=None, weight_col=weight_col,
                    range_key=key, sort_key=key, id_offset=base,
                    record_extra={"family": fid, "replaces": replaces,
                                  "txn": txn, "op": "recluster"})
    summary = encode_dataset(ds, out_dir, ropts)
    # pre-commit guard: the marker activates EVERY raw record carrying
    # this fid — refuse if any sits outside this run's id range (a
    # leftover from a differently-planned attempt would duplicate rows)
    stray = [i for i in _family_member_ids(out_dir, fid)
             if not (base <= i < base + summary["n_partitions"])]
    if stray:
        raise RuntimeError(
            f"staged family {fid} has members outside this run's id "
            f"range {base}..{base + summary['n_partitions'] - 1}: "
            f"{sorted(stray)} — refusing to commit; run GC "
            "(sweep_invisible) and retry")
    mf.commit_family(out_dir, fid, fsync=base_opts.fsync)
    swept = sweep_invisible(out_dir) if gc else 0
    combined = refold_global(out_dir)
    return {
        "n_messy": len(messy),
        "n_new": summary["n_partitions"],
        "family": fid,
        "gc_swept": swept,
        "n_partitions": combined["n_partitions"],
        "n_rows": combined["n_rows"],
        "clustering": clustering_quality(out_dir, key),
        "out_dir": out_dir,
    }


def _family_member_ids(out_dir: str, fid: str) -> list[int]:
    """Numeric ids of every RAW record staged under ``fid`` (committed
    or not) — O(partitions) driver-side manifest reads."""
    import json as _json
    import os as _os

    out = []
    mdir = _os.path.join(out_dir, "_manifest")
    for name in mf.fsio.listdir(mdir):
        if name.startswith("part-") and name.endswith(".json"):
            r = _json.loads(mf.fsio.read_bytes(_os.path.join(mdir, name)))
            if r.get("family") == fid:
                out.append(int(r["part_id"][1:]))
    return out


def _sample_quantile_grids(ds, keys: list[str], bits: int) -> dict:
    """Per-key quantile grid (2^bits - 1 edges) from one strided-sample
    pass over the Dataset — deterministic, O(batches × keys × 512)
    driver bytes.  cell(v) = searchsorted(grid, v, "right") ∈
    [0, 2^bits - 1]; grids of low-cardinality columns come out shorter
    (duplicate quantiles dedup), which only wastes code space."""
    def _sample(batch: pa.Table) -> pa.Table:
        cols = {}
        for k in keys:
            vals, kind, nulls = _rkey_norm(batch[k].combine_chunks())
            if nulls is not None:
                vals = vals[~nulls]
            stride = max(1, vals.size // 512)
            s = vals[::stride][:512]
            cols[k] = pa.array([[str(v) for v in s] if kind == "s"
                                else s.tolist()],
                               type=pa.list_(pa.string() if kind == "s"
                                             else pa.float64()))
            cols[k + "##kind"] = pa.array([kind])
        return pa.table(cols)

    rows = ds.select_columns(keys).map_batches(
        _sample, batch_format="pyarrow").take_all()
    grids: dict = {}
    for k in keys:
        kinds = {r[k + "##kind"] for r in rows}
        if len(kinds) != 1:
            raise ValueError(f"key {k!r} sampled as mixed kinds {kinds}")
        kind = kinds.pop()
        pooled = np.concatenate([
            np.asarray(r[k], dtype=np.str_ if kind == "s" else np.float64)
            for r in rows])
        pooled.sort(kind="stable")
        q = (1 << bits) - 1
        idx = np.minimum((np.arange(1, q + 1) * pooled.size) // (q + 1),
                         pooled.size - 1)
        grid = np.unique(pooled[idx])
        grids[k] = (kind, grid)
    return grids


def _zvalues(batch: pa.Table, keys: list[str], grids: dict,
             bits: int) -> np.ndarray:
    """Vectorized Z-value: quantize each key against its grid, then
    interleave cell bits (bit b of key i lands at position
    b*len(keys)+i).  Null keys take cell 0."""
    k = len(keys)
    z = np.zeros(batch.num_rows, dtype=np.int64)
    for i, name in enumerate(keys):
        kind, grid = grids[name]
        vals, vkind, nulls = _rkey_norm(batch[name].combine_chunks())
        if "s" in (kind, vkind) and kind != vkind:
            # an all-null batch of a numeric column degenerates to "i"
            # zeros — harmless (all cells masked to 0); a true
            # string/numeric flip between sampling and assignment is not
            if nulls is None or not nulls.all():
                raise TypeError(f"key {name!r} kind changed between "
                                f"plan ({kind}) and batch ({vkind})")
            continue  # all-null: every cell is 0, no bits to set
        if kind != "s":
            vals = vals.astype(np.float64, copy=False)
        cells = np.searchsorted(grid, vals, side="right").astype(np.int64)
        if nulls is not None:
            cells[nulls] = 0
        for b in range(bits):
            z |= ((cells >> b) & 1) << (b * k + i)
    return z


def clustering_quality(out_dir: str, key: str,
                       records: dict | None = None) -> dict:
    """Measure how well a container is clustered on ``key`` from its
    manifest profiles alone (no data read): the average number of
    partitions a random point/range probe on the key must touch.

    overlap_factor = mean over partitions of how many OTHER partitions'
    [min,max] intervals overlap its own, +1.  A perfectly clustered
    container scores ~1.0 (duplicated edge values allow slightly more);
    an unclustered one scores ≈ n_partitions.  ``records``: optional
    preloaded manifest (multi-column callers avoid one manifest read
    per column)."""
    from ..functions.stats import key_span

    if records is None:
        records = mf.load_manifest(out_dir)
    spans = [s for r in records.values()
             if (s := key_span(r, key)) is not None]
    if not spans:
        return {"n_partitions": len(records), "overlap_factor": None}
    # interval stabbing count, O(n log n) even when everything overlaps:
    # spans overlapping [lo,hi] = (# with lo2 ≤ hi) − (# with hi2 < lo)
    import bisect

    los = sorted(lo for lo, _ in spans)
    his = sorted(hi for _, hi in spans)
    total = 0
    for lo, hi in spans:
        total += bisect.bisect_right(los, hi) - bisect.bisect_left(his, lo)
    return {
        "n_partitions": len(records),
        "profiled_partitions": len(spans),
        "overlap_factor": round(total / len(spans), 3),
    }
