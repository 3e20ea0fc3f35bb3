"""The flagship pipeline: read → plan → shuffle → encode → manifest.

Lifecycle (SURVEY.md §3 "Ray lifecycle equivalent"):

    plan: light stats tasks over (group_col, weight_col) only  # prune at the read
      → fused read+split map tasks (path inputs read their own
        row-group slices; Dataset inputs stream block refs)    # broadcast plan, no shuffle
      → one encode task per partition (reassemble + encode)    # THE one all-to-all
      → small per-partition records → global manifest fold     # driver-side, tiny

The exchange ships PRE-SERIALIZED SHARDS: each input block is split by
part id (one vectorized argsort + zero-copy slices) and every shard is
written as ONE Arrow-IPC binary row ``(part_id, shard_bytes)``.  The
groupby therefore moves O(blocks × parts-touched) fat rows instead of
O(rows) thin ones — Ray 2.49's hash-shuffle partitioner hashes rows in
a Python loop, so shrinking the row count by ~3 orders of magnitude is
what makes the all-to-all scale (measured on 200k rows / 80M tokens:
row-level shuffle 46 s → shard-level 9 s on 32 CPUs).  Hash-shuffle
with ``num_partitions = n_parts`` lands exactly one block per
partition, so encode parallelism == n_parts.

Skew handling is explicit (north rule): partitions are keyed by
(source, n_tok-range) where ranges are token-MASS quantiles from the
light pass — each partition carries ≈ equal token mass despite the
lognormal length skew, so no encode task is a straggler. The plan is a
small dict broadcast once via ``ray.put`` and read inside the assign
stage (never re-shipped per batch).

Scale notes (100 TB / 256 nodes):
- the light pass reads two narrow columns → a few % of input bytes;
- partial per-batch aggregation keeps the driver fold at
  O(batches × sources) rows;
- the only full-data exchange is the single groupby; everything else
  streams with backpressure;
- resume skips committed partitions inside the encode task (O(1) ledger
  probe), so a rerun after failure re-encodes only missing partitions.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..stages.encode import PART_COL, decode_partition_path, encode_partition_table
from ..state import manifest as mf

__all__ = ["EncodeOptions", "plan_partitions", "plan_encode",
           "encode_dataset", "decode_dataset", "prune_partitions",
           "lookup_rows"]


@dataclass
class EncodeOptions:
    """EncodeOptions ≈ the reference's WriteOptions
    (/root/reference/src/write/mod.rs:30-43) plus partitioning knobs."""

    group_col: str | None = "source"      # low-cardinality shuffle key
    weight_col: str | None = "n_tok"      # token-mass column for skew balance
    sort_key: str | list[str] | None = "doc_id"  # canonical row order per partition
    target_weight: int = 4_000_000        # tokens per partition (≈16 MB int32)
    target_rows: int = 500_000            # fallback when weight_col is absent
    forced_codecs: dict[str, str] = field(default_factory=dict)
    resume: bool = True
    max_partitions: int = 100_000
    # global partition-id offset: plan-local ids 0..n_parts-1 commit as
    # id_offset..id_offset+n_parts-1.  Used by append_dataset to add an
    # increment's partitions after an existing container's without
    # touching (or re-reading) the committed ones.
    id_offset: int = 0
    # fail-fast plan validation: when set, the realized plan must have
    # exactly this many partitions, checked BEFORE any task launches.
    # append_dataset sets it on a resumed reservation so changed input
    # under a reused append_id aborts before overwriting a neighboring
    # append's committed partitions.
    expected_n_parts: int | None = None
    # parallelism override for path inputs; None → auto.  On the default
    # fused path this is the target number of fused read+split tasks
    # (auto: ≈2/CPU bounded by row-group count); on the Dataset path
    # (fuse_read_split=False) it is Ray's override_num_blocks, whose
    # blocks are then coalesced blocks_per_split per split task.
    read_num_blocks: int | None = None
    # how many read blocks one split task coalesces before splitting.
    # Read parallelism and shard granularity pull opposite ways: many
    # small read blocks keep the (CPU-heavy) parquet read parallel, but
    # shards per partition == split-task count, and per-shard object
    # overhead in the encode task dominates past ~10 shards/partition
    # (measured: 32 shards/part tripled encode core-seconds vs 8).
    blocks_per_split: int = 4
    # optional block compression of encoded payloads (zstd/lz4/...)
    compression: str | None = None
    # crash-durability of partition commits; disable only when the output
    # store has its own durability (see state/manifest._atomic_write)
    fsync: bool = True
    # row-block size for the sub-partition page index (None = one block
    # per partition).  Paged partitions record per-block per-column
    # min/max so point/range reads decode only overlapping blocks
    # (reference intervals.rs:62-138 / indexed_reader.rs:25-209).
    rows_per_block: int | None = None
    # two-level exchange: when n_parts exceeds the threshold, each split
    # task emits one coarse shard per GROUP of ``hier_fan`` consecutive
    # partitions instead of one per partition, and a level-2 task per
    # group reassembles and encodes its partitions sequentially.  Shard
    # objects drop from O(blocks × n_parts) to O(blocks × n_parts/fan),
    # at the cost of fan× coarser encode parallelism — size hier_fan so
    # n_parts/fan still exceeds cluster cores.
    hier_parts_threshold: int = 4096
    hier_fan: int = 16
    # fused read+split for path inputs: exchange map tasks read their own
    # row-group slices straight from parquet (no Dataset machinery, no
    # intermediate block materialization in the object store).  Disable
    # to force the Dataset-read → split-task path.  On the fused path,
    # read_num_blocks (above) means the target NUMBER OF FUSED TASKS.
    fuse_read_split: bool = True
    # cap on one fused task's input mass (parquet on-disk bytes of its
    # row groups) — bounds worker memory the way the Dataset path's
    # ~128 MB target blocks × blocks_per_split did, independent of how
    # few CPUs the cluster has relative to the input size.
    max_split_task_bytes: int = 256 << 20
    # GLOBAL RANGE partitioning on this column (mutually exclusive with
    # group_col): the plan samples (key, weight) pairs and cuts the key
    # domain into equal-MASS ranges, so partition ids ascend with the
    # key and each partition's manifest [min,max] profile on the key is
    # disjoint from its neighbors' — prune_partitions_by_range /
    # decode(key_range=...) then touch O(1) partitions instead of all.
    # Combined with sort_key=range_key the container is globally sorted.
    # This is the clustering mode recluster_container uses (P43).
    range_key: str | None = None
    # extra fields merged into EVERY partition's manifest record in the
    # same atomic commit (incremental recluster rides its family id +
    # replaces list here, mirroring compaction's extra_record).  Must be
    # identical across partitions and deterministic for resume.
    record_extra: dict | None = None


def _light_stats(batch: pa.Table, group_col: str | None, weight_col: str | None,
                 sample_per_batch: int = 256) -> pa.Table:
    """Per-batch partial aggregate: (source, rows, weight_sum, weight sample)."""
    n = batch.num_rows
    gcol = batch[group_col].combine_chunks() if group_col is not None else None
    if gcol is None or pa.types.is_null(gcol.type) or gcol.null_count == n:
        groups = np.zeros(n, dtype=np.int64)
        keys = [""]
        codes = groups
    else:
        enc = pc.dictionary_encode(gcol)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        keys = [str(v) for v in enc.dictionary.to_pylist()]
    w = (
        batch[weight_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        if weight_col
        else np.ones(n, dtype=np.int64)
    )
    out_src, out_rows, out_wsum, out_sample = [], [], [], []
    for k_idx, key in enumerate(keys):
        m = codes == k_idx
        wk = w[m]
        if wk.size == 0:
            continue
        stride = max(1, wk.size // sample_per_batch)
        out_src.append(key)
        out_rows.append(int(wk.size))
        out_wsum.append(int(wk.sum()))
        out_sample.append(wk[::stride][:sample_per_batch].tolist())
    return pa.table(
        {
            "g": pa.array(out_src, type=pa.string()),
            "rows": pa.array(out_rows, type=pa.int64()),
            "wsum": pa.array(out_wsum, type=pa.int64()),
            "sample": pa.array(out_sample, type=pa.list_(pa.int64())),
        }
    )


def _weighted_edges(sample: np.ndarray, k: int) -> list[int]:
    """Split the weight distribution into k buckets of ≈ equal MASS:
    edges are weighted quantiles of the sampled weights."""
    if k <= 1 or sample.size == 0:
        return []
    s = np.sort(sample)
    cum = np.cumsum(s, dtype=np.float64)
    targets = cum[-1] * np.arange(1, k) / k
    idx = np.searchsorted(cum, targets)
    edges = sorted(set(int(s[min(i, s.size - 1)]) for i in idx))
    return edges


def _rkey_norm(arr: pa.Array) -> tuple[np.ndarray, str, np.ndarray | None]:
    """Normalize a range-key column for order comparison: returns
    ``(values, kind, null_mask_or_None)``.  One shared function so the
    plan's sampling pass and every split task's assignment pass land in
    the SAME comparison domain: integers and temporals → int64 ("i"),
    floats → float64 ("f"), string/binary → numpy unicode ("s", numpy
    compares code points exactly like Python ``str`` ordering).  Null
    slots are filled with an arbitrary in-domain value and reported via
    the mask — callers route them to partition 0."""
    t = arr.type
    nulls = None
    if arr.null_count:
        nulls = arr.is_null().to_numpy(zero_copy_only=False)
        if arr.null_count == len(arr):
            if pa.types.is_string(t) or pa.types.is_large_string(t) \
                    or pa.types.is_binary(t) or pa.types.is_large_binary(t) \
                    or pa.types.is_fixed_size_binary(t):
                return np.zeros(len(arr), dtype="<U1"), "s", nulls
            return np.zeros(len(arr),
                            dtype=np.float64 if pa.types.is_floating(t)
                            else np.int64), \
                "f" if pa.types.is_floating(t) else "i", nulls
        arr = arr.fill_null(arr.drop_null()[0].as_py())
    if pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_time(t) \
            or pa.types.is_duration(t):
        vals = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return vals, "i", nulls
    if pa.types.is_integer(t):
        return arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False), \
            "i", nulls
    if pa.types.is_floating(t):
        return arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False), \
            "f", nulls
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        # fixed-width unicode: searchsorted compares in C, not per-row
        # Python — the <U width is the batch's longest value, edges of a
        # different width compare correctly (numpy pads conceptually)
        return np.asarray(arr.to_pylist(), dtype=np.str_), "s", nulls
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) \
            or pa.types.is_fixed_size_binary(t):
        return np.asarray([v.hex() for v in arr.to_pylist()],
                          dtype=np.str_), "s", nulls
    raise TypeError(f"range_key column type {t} is not orderable here "
                    "(supported: integer, float, temporal, string, binary)")


def _light_stats_range(batch: pa.Table, range_key: str,
                       weight_col: str | None,
                       sample_per_batch: int = 256) -> pa.Table:
    """Per-batch partial for range mode: exact (rows, weight sum) plus a
    strided sample of (key, weight) pairs — the fold cuts the key domain
    into equal-mass ranges from these."""
    n = batch.num_rows
    vals, kind, nulls = _rkey_norm(batch[range_key].combine_chunks())
    w = (batch[weight_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
         if weight_col else np.ones(n, dtype=np.int64))
    if nulls is not None:
        vals, wv = vals[~nulls], w[~nulls]
    else:
        wv = w
    stride = max(1, vals.size // sample_per_batch)
    ks = vals[::stride][:sample_per_batch]
    ws = wv[::stride][:sample_per_batch]
    keys = (pa.array([str(v) for v in ks], type=pa.string()) if kind == "s"
            else pa.array(ks.tolist(),
                          type=pa.int64() if kind == "i" else pa.float64()))
    return pa.table({
        "n": pa.array([n], type=pa.int64()),
        "wsum": pa.array([int(w.sum())], type=pa.int64()),
        "kind": pa.array([kind], type=pa.string()),
        "keys": pa.array([keys.to_pylist()], type=pa.list_(keys.type)),
        "kw": pa.array([ws.tolist()], type=pa.list_(pa.int64())),
    })


def _fold_plan_range(partials: list[dict], opts: EncodeOptions) -> PartitionPlan:
    """Fold range-mode partials into a PartitionPlan: k = total mass /
    target, edges = weighted key quantiles of the pooled sample (exact
    mass from the partials, quantiles from the sample — identical shape
    to the weight-bucket fold above).  Deterministic: strided samples,
    stable sort, so task retries and resume re-derive the same plan."""
    rows = sum(p["n"] for p in partials)
    wsum = sum(p["wsum"] for p in partials)
    kinds = {p["kind"] for p in partials if p["keys"]}
    keys_l: list = []
    kw_l: list = []
    for p in partials:
        keys_l.extend(p["keys"])
        kw_l.extend(p["kw"])
    if opts.weight_col:
        k = max(1, min((wsum + opts.target_weight - 1) // opts.target_weight,
                       opts.max_partitions))
    else:
        k = max(1, min((rows + opts.target_rows - 1) // opts.target_rows,
                       opts.max_partitions))
    if not keys_l or k == 1:
        return PartitionPlan(base={"": 0}, edges={"": []}, n_parts=1,
                             rkey=opts.range_key,
                             rkey_kind=next(iter(kinds), "i"), rkey_edges=[])
    kind = kinds.pop()
    if kinds:
        raise ValueError(f"range_key sampled as mixed kinds: {kind}, {kinds}")
    keys = np.asarray(keys_l, dtype={"i": np.int64, "f": np.float64,
                                     "s": np.str_}[kind])
    kw = np.asarray(kw_l, dtype=np.float64)
    order = np.argsort(keys, kind="stable")
    ks, ws = keys[order], kw[order]
    cum = np.cumsum(ws)
    targets = cum[-1] * np.arange(1, int(k)) / int(k)
    idx = np.minimum(np.searchsorted(cum, targets), ks.size - 1)
    edges = sorted(set(ks[idx].tolist()))
    return PartitionPlan(base={"": 0}, edges={"": []},
                         n_parts=len(edges) + 1, rkey=opts.range_key,
                         rkey_kind=kind, rkey_edges=edges)


@dataclass
class PartitionPlan:
    """(group value, weight-range) → contiguous partition ids; or, in
    range mode (``rkey`` set), key-range → partition id."""

    base: dict[str, int]          # group → first part id
    edges: dict[str, list[int]]   # group → weight bucket edges (upper-exclusive)
    n_parts: int
    # range mode (EncodeOptions.range_key): partition id of a row is
    # searchsorted(rkey_edges, key, side="right") — ids ascend with the
    # key.  rkey_kind pins the comparison domain ("i" int64 [integers +
    # temporals], "f" float64, "s" unicode) so plan and assignment
    # normalize identically.  Null keys route to partition 0, mirroring
    # the null-group convention above.
    rkey: str | None = None
    rkey_kind: str | None = None
    rkey_edges: list | None = None

    def to_json(self) -> str:
        return json.dumps({"base": self.base, "edges": self.edges,
                           "n": self.n_parts, "rkey": self.rkey,
                           "rkey_kind": self.rkey_kind,
                           "rkey_edges": self.rkey_edges})


def _fold_plan(partials: list[dict], opts: EncodeOptions) -> PartitionPlan:
    """Fold light-stats partial rows into the final PartitionPlan."""
    per_group: dict[str, dict] = {}
    for row in partials:
        g = per_group.setdefault(row["g"], {"rows": 0, "wsum": 0, "sample": []})
        g["rows"] += row["rows"]
        g["wsum"] += row["wsum"]
        g["sample"].extend(row["sample"])
    base, edges = {}, {}
    next_id = 0
    for key in sorted(per_group):
        g = per_group[key]
        if opts.weight_col:
            k = max(1, min((g["wsum"] + opts.target_weight - 1) // opts.target_weight,
                           opts.max_partitions))
        else:
            k = max(1, (g["rows"] + opts.target_rows - 1) // opts.target_rows)
        e = _weighted_edges(np.array(g["sample"], dtype=np.int64), int(k))
        base[key] = next_id
        edges[key] = e
        next_id += len(e) + 1
    # rows whose group value is NULL are invisible to the light pass and
    # route to partition 0 in _part_ids — the plan must always have ≥1
    # partition or an all-null group column would drop every row
    return PartitionPlan(base=base, edges=edges, n_parts=max(1, next_id))


@ray.remote
def _plan_stats_task(files: list, group_col, weight_col, fs=None,
                     range_key=None) -> tuple:
    """Plan fast path map side: light stats over a slice of parquet files
    — projection pushed to the parquet read, O(files) tasks, no Dataset
    machinery (its fixed per-pipeline startup is ~1 s, which at bench
    scale was 40% of the whole encode wall; at 10^12-sequence scale this
    task count is O(input files), same as any distributed pass).

    Also returns per-file row-group row counts (footer metadata, free —
    the footer is already read for the column fetch) so the fused
    read+split stage can assign row-group slices without another
    metadata pass."""
    import pyarrow.parquet as _pq

    cols = list(dict.fromkeys(
        c for c in (group_col, weight_col, range_key) if c))
    out: list = []
    meta: list = []
    for f in files:
        # fs threads through from resolve_input_files so the plan pass
        # reads object storage (s3/gs/...) exactly like local disk
        pf = _pq.ParquetFile(f, filesystem=fs)
        md = pf.metadata
        rgs = [md.row_group(i) for i in range(md.num_row_groups)]
        meta.append({
            "path": f,
            "rg_rows": [g.num_rows for g in rgs],
            "rg_bytes": [g.total_byte_size for g in rgs],
            "names": list(pf.schema_arrow.names),
        })
        t = pf.read(columns=[c for c in cols if c in pf.schema_arrow.names])
        # one batch per FILE here vs ~dozens per file in the Dataset path:
        # widen the per-batch sample so the quantile-edge quality matches
        if range_key is not None:
            out.extend(_light_stats_range(
                t, range_key,
                weight_col if weight_col in t.column_names else None,
                sample_per_batch=4096).to_pylist())
        else:
            out.extend(_light_stats(
                t, group_col if group_col in t.column_names else None,
                weight_col if weight_col in t.column_names else None,
                sample_per_batch=4096).to_pylist())
    return out, meta


def plan_partitions_from_files(files: list, opts: EncodeOptions,
                               files_per_task: int = 4,
                               filesystem=None) -> tuple:
    """Raw-task planner for path inputs (one task per files_per_task
    parquet files; driver folds O(tasks × groups) tiny rows).  Returns
    ``(plan, file_meta)`` where file_meta is ``[(path, [rg_rows...])]``
    for the fused read+split stage."""
    chunks = [files[i:i + files_per_task]
              for i in range(0, len(files), files_per_task)]
    refs = [_plan_stats_task.remote(c, opts.group_col, opts.weight_col,
                                    filesystem, opts.range_key)
            for c in chunks]
    parts = ray.get(refs)
    meta = [fm for _, m in parts for fm in m]
    partials = [row for rows, _ in parts for row in rows]
    if opts.range_key:
        return _fold_plan_range(partials, opts), meta
    if not [c for c in (opts.group_col, opts.weight_col) if c]:
        return PartitionPlan(base={"": 0}, edges={"": []}, n_parts=1), meta
    return _fold_plan(partials, opts), meta


def plan_partitions(input_ds: rd.Dataset, opts: EncodeOptions) -> PartitionPlan:
    if opts.range_key:
        rk, wc = opts.range_key, opts.weight_col
        # dedupe: clustering on the weight column itself is legal
        cols = [rk] if wc in (None, rk) else [rk, wc]
        light = input_ds.select_columns(cols).map_batches(
            lambda b: _light_stats_range(b, rk, wc),
            batch_format="pyarrow",
        )
        return _fold_plan_range(light.take_all(), opts)
    cols = [c for c in (opts.group_col, opts.weight_col) if c]
    if not cols:
        return PartitionPlan(base={"": 0}, edges={"": []}, n_parts=1)
    light = input_ds.select_columns(cols).map_batches(
        lambda b: _light_stats(b, opts.group_col, opts.weight_col),
        batch_format="pyarrow",
    )
    partials = light.take_all()  # O(batches × sources) tiny rows
    return _fold_plan(partials, opts)


def _part_ids(batch: pa.Table, plan: PartitionPlan, group_col: str | None,
              weight_col: str | None) -> np.ndarray:
    """Vectorized (source, weight-range) → partition id per row; range
    mode: searchsorted over the plan's global key edges."""
    n = batch.num_rows
    part = np.zeros(n, dtype=np.int32)
    if plan.rkey_edges is not None and plan.rkey is not None:
        if not plan.rkey_edges:
            return part
        vals, kind, nulls = _rkey_norm(batch[plan.rkey].combine_chunks())
        if kind != plan.rkey_kind:
            # only reachable for an all-null batch of a numeric column
            # (norm degenerates to "i"/"f" zeros) — every row is null
            return part
        edges = np.asarray(plan.rkey_edges,
                           dtype={"i": np.int64, "f": np.float64,
                                  "s": np.str_}[kind])
        part = np.searchsorted(edges, vals, side="right").astype(np.int32)
        if nulls is not None:
            part[nulls] = 0
        return part
    col = batch[group_col].combine_chunks() if group_col is not None else None
    if col is not None and not pa.types.is_null(col.type) and col.null_count < n:
        enc = pc.dictionary_encode(col)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        keys = [str(v) for v in enc.dictionary.to_pylist()]
    else:
        # no group column, or it is entirely null (null rows default to
        # partition 0 — they are invisible to the plan's light pass)
        codes = np.zeros(n, dtype=np.int64)
        keys = [""]
    w = (
        batch[weight_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        if weight_col
        else None
    )
    for k_idx, key in enumerate(keys):
        m = codes == k_idx
        b = plan.base.get(key, 0)
        e = plan.edges.get(key, [])
        if w is not None and e:
            part[m] = b + np.searchsorted(np.array(e, dtype=np.int64), w[m], side="right")
        else:
            part[m] = b
    return part


def _assign_parts(batch: pa.Table, plan_ref, group_col: str | None,
                  weight_col: str | None) -> pa.Table:
    plan: PartitionPlan = ray.get(plan_ref) if not isinstance(plan_ref, PartitionPlan) else plan_ref
    part = _part_ids(batch, plan, group_col, weight_col)
    return batch.append_column(PART_COL, pa.array(part, type=pa.int32()))


_IPC_COMPRESSION = os.environ.get("P2R_IPC_COMPRESSION") or None

# Wire narrowing: exchange shards ship integer columns at the smallest
# width their values fit (tokens are int32 on disk but < 2^16 in every
# real vocab → uint16 halves the exchange's dominant column).  The
# original type rides as field metadata and the reduce side widens
# back before encoding, so partition bytes/fingerprints are unchanged.
# Narrowing is per split task — shards of one partition may arrive at
# different widths; widening restores one common schema before concat.
# At 100 TB the exchange is the scarcest resource (NIC bytes on a real
# cluster, DRAM bandwidth on this box) — this is the classic
# shuffle-compression trade at zero decompression cost.
_WIRE_KEY = b"p2r_wire"
_NARROW_OFF = os.environ.get("P2R_WIRE_NARROW", "1") == "0"


def _narrow_for_wire(tbl: pa.Table) -> pa.Table:
    if _NARROW_OFF or tbl.num_rows == 0:
        return tbl
    changed = False
    cols, fields = [], []
    for f in tbl.schema:
        col = tbl[f.name]
        t = f.type
        inner = None
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            inner = t.value_type
        target = None
        check = inner if inner is not None else t
        if check in (pa.int32(), pa.int64()):
            mm = pc.min_max(
                pc.list_flatten(col) if inner is not None else col)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            if lo is not None and lo >= 0:
                if hi < 1 << 8:
                    target = pa.uint8()
                elif hi < 1 << 16:
                    target = pa.uint16()
                elif check == pa.int64() and hi < 1 << 32:
                    target = pa.uint32()
            elif lo is not None and check == pa.int64() and \
                    -(1 << 31) <= lo and hi < 1 << 31:
                target = pa.int32()
        if target is None:
            cols.append(col)
            fields.append(f)
            continue
        if inner is not None:
            new_t = (pa.list_(target) if pa.types.is_list(t)
                     else pa.large_list(target))
        else:
            new_t = target
        cols.append(col.cast(new_t))
        # keep nullability AND any prior field metadata: the widened
        # field must equal the original exactly, or shards narrowed in
        # some blocks but not others fail the reduce-side concat
        # (nullable vs non-nullable int32 is a schema mismatch)
        meta = dict(f.metadata or {})
        meta[_WIRE_KEY] = str(check).encode()
        fields.append(pa.field(f.name, new_t, nullable=f.nullable,
                               metadata=meta))
        changed = True
    if not changed:
        return tbl
    return pa.table(cols, schema=pa.schema(fields))


def _widen_from_wire(tbl: pa.Table) -> pa.Table:
    changed = False
    cols, fields = [], []
    for f in tbl.schema:
        meta = f.metadata or {}
        orig = meta.get(_WIRE_KEY)
        if orig is None:
            cols.append(tbl[f.name])
            fields.append(f)
            continue
        vt = {"int32": pa.int32(), "int64": pa.int64()}[orig.decode()]
        if pa.types.is_list(f.type):
            new_t = pa.list_(vt)
        elif pa.types.is_large_list(f.type):
            new_t = pa.large_list(vt)
        else:
            new_t = vt
        cols.append(tbl[f.name].cast(new_t))
        rest = {k: v for k, v in meta.items() if k != _WIRE_KEY}
        fields.append(pa.field(f.name, new_t, nullable=f.nullable,
                               metadata=rest or None))
        changed = True
    if not changed:
        return tbl
    return pa.table(cols, schema=pa.schema(fields))


def _ipc_bytes(tbl: pa.Table) -> bytes:
    """Arrow-IPC serialize (IPC truncates sliced buffers — a pickled slice
    would ship the whole parent block, ~100× amplification).  Optional
    buffer compression (P2R_IPC_COMPRESSION=lz4|zstd) trades abundant
    CPU for exchange bandwidth; readers sniff it from the IPC metadata,
    no read-side change.  Measured OFF by default on this box
    (interleaved A/B, 160 MTok / 16 CPUs, 3 trials each: off
    2.52-2.99 s vs lz4 3.03-3.26 s): the encode stage re-reads each
    shard exactly once from shared memory, so the decompress cost
    outweighs the bandwidth saved here; on a real cluster whose
    exchange crosses NICs the knob flips the other way, hence env
    rather than removal."""
    sink = pa.BufferOutputStream()
    opts = (pa.ipc.IpcWriteOptions(compression=_IPC_COMPRESSION)
            if _IPC_COMPRESSION else None)
    with pa.ipc.new_stream(sink, tbl.schema, options=opts) as w:
        w.write_table(tbl)
    return sink.getvalue().to_pybytes()


def _split_core(block: pa.Table, plan: PartitionPlan, group_col, weight_col,
                n_parts: int) -> list:
    """Split one coalesced block by part id into n_parts IPC shard
    payloads (None where there are no rows)."""
    out: list = [None] * n_parts
    part = _part_ids(block, plan, group_col, weight_col)
    order = np.argsort(part, kind="stable")
    tbl = _narrow_for_wire(block.take(pa.array(order)))
    sorted_part = part[order]
    uniq, starts = np.unique(sorted_part, return_index=True)
    bounds = np.append(starts, len(sorted_part))
    for i, p in enumerate(uniq):
        sl = tbl.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        out[int(p)] = _ipc_bytes(sl)
    return out


def _split_core_coarse(block: pa.Table, plan: PartitionPlan, group_col,
                       weight_col, n_groups: int, fan: int) -> list:
    """Split one coalesced block into one coarse IPC shard per group of
    ``fan`` consecutive partitions.  The fine part id rides along as
    PART_COL so level 2 never recomputes the plan."""
    out: list = [None] * n_groups
    part = _part_ids(block, plan, group_col, weight_col)
    tblp = block.append_column(PART_COL, pa.array(part, type=pa.int32()))
    grp = part // fan
    order = np.argsort(grp, kind="stable")
    tbl = _narrow_for_wire(tblp.take(pa.array(order)))
    sg = grp[order]
    uniq, starts = np.unique(sg, return_index=True)
    bounds = np.append(starts, len(sg))
    for i, g in enumerate(uniq):
        sl = tbl.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        out[int(g)] = _ipc_bytes(sl)
    return out


@ray.remote
def _split_block(plan: PartitionPlan, group_col, weight_col,
                 n_parts: int, *blocks: pa.Table):
    """Exchange map side: coalesce the given read blocks and split by
    part id into n_parts IPC shards (None where there are no rows)."""
    blocks = [b for b in blocks if b.num_rows]
    out: list = [None] * n_parts
    if blocks:
        block = blocks[0] if len(blocks) == 1 else pa.concat_tables(blocks)
        out = _split_core(block, plan, group_col, weight_col, n_parts)
    return tuple(out) if n_parts > 1 else out[0]


@ray.remote
def _split_block_coarse(plan: PartitionPlan, group_col, weight_col,
                        n_groups: int, fan: int, *blocks: pa.Table):
    """Level-1 map of the hierarchical exchange over read blocks."""
    blocks = [b for b in blocks if b.num_rows]
    out: list = [None] * n_groups
    if blocks:
        block = blocks[0] if len(blocks) == 1 else pa.concat_tables(blocks)
        out = _split_core_coarse(block, plan, group_col, weight_col,
                                 n_groups, fan)
    return tuple(out) if n_groups > 1 else out[0]


@ray.remote
def _read_split_task(plan: PartitionPlan, group_col, weight_col,
                     n_out: int, fan, columns, items: list, fs=None):
    """Fused exchange map for path inputs: read the assigned row-group
    slices straight from parquet and split them — the classic shuffle-map
    shape where the map task reads its own input split.  Versus the
    Dataset read feeding ``_split_block``, this removes one full
    materialization of the input in the object store and the Dataset
    pipeline's fixed startup (~1 s, 40%+ of bench wall).  ``items`` is
    ``[(path, [rg_idx...])]``; ``fan=None`` → flat exchange, else the
    coarse level-1 shards of the hierarchical exchange."""
    import pyarrow.parquet as _pq

    tables = []
    for path, rgs in items:
        pf = _pq.ParquetFile(path, filesystem=fs)
        t = pf.read_row_groups(list(rgs), columns=columns)
        if t.num_rows:
            tables.append(t)
    out: list = [None] * n_out
    if tables:
        block = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
        if fan is None:
            out = _split_core(block, plan, group_col, weight_col, n_out)
        else:
            out = _split_core_coarse(block, plan, group_col, weight_col,
                                     n_out, fan)
    return tuple(out) if n_out > 1 else out[0]


def _pack_rg_items(file_meta: list, target_tasks: int,
                   max_task_mass: int | None = None) -> list:
    """Pack per-file row groups into ≈target_tasks contiguous work items
    of ≈equal mass (``file_meta`` is ``[(path, [mass per rg...])]`` —
    mass is bytes when the caller has them, rows otherwise).
    ``max_task_mass`` caps any one task's mass regardless of task count,
    so a huge input cannot concentrate into few oversized in-memory
    reads; a single row group larger than the cap still forms its own
    task (row groups are the read atom).
    Returns ``[[(path, [rg...]), ...], ...]``."""
    units = [(path, rg, n) for path, masses in file_meta
             for rg, n in enumerate(masses)]
    total = sum(n for _, _, n in units)
    if not units or total == 0:
        return [[(path, list(range(len(masses))))]
                for path, masses in file_meta] or []
    per_task = max(1, -(-total // max(1, target_tasks)))
    if max_task_mass:
        per_task = min(per_task, max_task_mass)
    tasks: list = []
    cur: list = []
    cur_mass = 0
    for path, rg, n in units:
        if cur and cur_mass + n > per_task:
            tasks.append(cur)
            cur, cur_mass = [], 0
        if cur and cur[-1][0] == path:
            cur[-1][1].append(rg)
        else:
            cur.append((path, [rg]))
        cur_mass += n
        if cur_mass >= per_task:
            tasks.append(cur)
            cur, cur_mass = [], 0
    if cur:
        tasks.append(cur)
    return tasks


@ray.remote
def _encode_group(out_dir: str, sort_key, weight_col,
                  forced_codecs, resume, compression, fsync,
                  rows_per_block, id_offset, record_extra, *shards) -> list:
    """Level-2 reduce of the hierarchical exchange: reassemble one group
    of partitions from its coarse shards and encode each partition.
    Each partition keeps the flat path's contract — deterministic
    canonical order, atomic commit, per-partition resume — so retry
    granularity is unchanged; only shard granularity is coarser."""
    tables = [
        _widen_from_wire(pa.ipc.open_stream(s).read_all())
        for s in shards if s is not None
    ]
    if not tables:
        return []
    # stay chunked through the group-order take (one gather instead of
    # combine + take = two full copies of the group)
    full = pa.concat_tables(tables)
    part = full[PART_COL].combine_chunks().to_numpy()
    order = np.argsort(part, kind="stable")
    tbl = full.take(pa.array(order))
    sp = part[order]
    if id_offset:
        # shards carry plan-LOCAL ids; commit under the global ids
        sp = sp + np.int32(id_offset)
        tbl = tbl.set_column(tbl.column_names.index(PART_COL), PART_COL,
                             pa.array(sp.astype(np.int32)))
    uniq, starts = np.unique(sp, return_index=True)
    bounds = np.append(starts, len(sp))
    recs = []
    for i in range(len(uniq)):
        # zero-copy slice: encode_partition_table combine_chunks()es
        # internally, so copying here would double-materialize every
        # partition in the group
        sl = tbl.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        rec = encode_partition_table(
            sl,
            out_dir,
            sort_key=sort_key,
            weight_col=weight_col,
            forced_codecs=forced_codecs,
            resume=resume,
            compression=compression,
            fsync=fsync,
            rows_per_block=rows_per_block,
            extra_record=record_extra,
        )
        recs.append(rec.to_pylist()[0])
    return recs


@ray.remote
def _encode_part(part_id: int, out_dir: str, sort_key, weight_col,
                 forced_codecs, resume, compression, fsync,
                 rows_per_block, record_extra, *shards) -> dict:
    """Exchange reduce side: reassemble one partition from its shards and
    encode/commit it. Deterministic + atomic commit ⇒ safe under retry."""
    tables = [
        _widen_from_wire(pa.ipc.open_stream(s).read_all())
        for s in shards if s is not None
    ]
    if not tables:
        return {}
    # stay chunked: encode_partition_table combine_chunks()es after its
    # canonical sort anyway — combining here double-materializes the
    # whole partition
    full = pa.concat_tables(tables)
    full = full.append_column(
        PART_COL, pa.array(np.full(full.num_rows, part_id, dtype=np.int32))
    )
    rec = encode_partition_table(
        full,
        out_dir,
        sort_key=sort_key,
        weight_col=weight_col,
        forced_codecs=forced_codecs,
        resume=resume,
        compression=compression,
        fsync=fsync,
        rows_per_block=rows_per_block,
        extra_record=record_extra,
    )
    return rec.to_pylist()[0]


def plan_encode(
    input_path: str | list[str] | rd.Dataset,
    opts: EncodeOptions | None = None,
    columns: list[str] | None = None,
    filesystem=None,
) -> dict:
    """Resolve the input and compute the partition plan WITHOUT writing
    anything — the read-only first phase of ``encode_dataset``, also
    called by ``append_dataset`` to learn the plan's exact extent
    (``n_parts``) BEFORE claiming an id/txn range, which is what lets
    concurrent appends reserve fixed, non-overlapping ranges.  Returns
    a context dict to pass back via ``encode_dataset(_plan_ctx=...)``
    so the plan phase never runs twice.  The ctx is valid only for the
    same (input, planning options) it was built from."""
    import time

    from ..sources.readers import resolve_input_files

    opts = opts or EncodeOptions()
    t0 = time.time()
    plan_files: list | None = None
    input_fs = None
    ds: rd.Dataset | None = None
    if isinstance(input_path, rd.Dataset):
        ds = input_path
        schema_names = ds.schema().names
    else:
        input_fs, plan_files = resolve_input_files(input_path, filesystem)
        import pyarrow.parquet as _pq

        schema_names = _pq.read_schema(plan_files[0],
                                       filesystem=input_fs).names
        if columns is not None:
            schema_names = [c for c in schema_names if c in columns]
        if not opts.fuse_read_split:
            if opts.read_num_blocks:
                ds = rd.read_parquet(plan_files, columns=columns,
                                     filesystem=input_fs,
                                     override_num_blocks=opts.read_num_blocks)
            else:
                ds = rd.read_parquet(plan_files, columns=columns,
                                     filesystem=input_fs)
    if opts.range_key is not None:
        if opts.group_col is not None:
            raise ValueError(
                "range_key and group_col are mutually exclusive "
                "partitioning modes — pass group_col=None for range "
                "clustering")
        if opts.range_key not in schema_names:
            raise ValueError(
                f"range_key column {opts.range_key!r} not in input "
                f"schema {schema_names}")
    group_col = opts.group_col if opts.group_col in schema_names else None
    weight_col = opts.weight_col if opts.weight_col in schema_names else None
    sort_key: str | list[str] | None = opts.sort_key
    if isinstance(sort_key, str):
        sort_key = sort_key if sort_key in schema_names else None
    elif isinstance(sort_key, list):
        sort_key = [k for k in sort_key if k in schema_names] or None

    plan_opts = EncodeOptions(**{**opts.__dict__, "group_col": group_col,
                                 "weight_col": weight_col})
    file_meta: list = []
    if plan_files is not None:
        plan, file_meta = plan_partitions_from_files(plan_files, plan_opts,
                                                     filesystem=input_fs)
        # heterogeneous schemas would otherwise fail deep inside a read
        # task (or silently skew the plan) — reject them up front, like
        # the Dataset read's unification error but with the file named
        ref_names = file_meta[0]["names"]
        for m in file_meta[1:]:
            if m["names"] != ref_names:
                raise ValueError(
                    f"schema mismatch across input files: {m['path']!r} has "
                    f"columns {m['names']}, expected {ref_names} "
                    f"(from {file_meta[0]['path']!r})")
    else:
        plan = plan_partitions(ds, plan_opts)
    return {"plan": plan, "file_meta": file_meta, "ds": ds,
            "plan_files": plan_files, "input_fs": input_fs,
            "group_col": group_col, "weight_col": weight_col,
            "sort_key": sort_key, "plan_s": time.time() - t0}


def encode_dataset(
    input_path: str | list[str] | rd.Dataset,
    out_dir: str,
    opts: EncodeOptions | None = None,
    columns: list[str] | None = None,
    filesystem=None,
    _plan_ctx: dict | None = None,
) -> dict:
    """Run the full encode pipeline; returns the global manifest summary.

    ``input_path`` may be a Dataset, or any mix of local paths,
    directories, globs and object-store URIs (``s3://...``,
    ``gs://...``) — resolved through ``pyarrow.fs`` and threaded into
    the plan and read-split tasks, so every path route works against
    object storage.  ``filesystem`` overrides resolution (tests inject
    a ``SubTreeFileSystem``/mock here).  ``_plan_ctx``: a context from
    ``plan_encode`` over the SAME input/options — skips replanning
    (append_dataset plans, claims its id range, then encodes)."""
    import os
    import time

    opts = opts or EncodeOptions()
    t0 = time.time()
    from ..state import fsio as _fsio
    _fsio.ensure_dir(out_dir)
    # generated columns (P74) declared BEFORE the first encode: derive
    # them here so container creation enforces the same invariant the
    # append/upsert hooks do.  Path inputs route through a Dataset read
    # (losing the fused read+split fast path) only when specs exist —
    # the flagship encode with no declared specs pays one file-exists
    # check.  append_dataset applies specs itself (pre-planning), so
    # its _plan_ctx arrives already derived.
    if _plan_ctx is None:
        from .generated_pipeline import apply_generated, get_generated

        _gspecs = get_generated(out_dir)
        if _gspecs:
            _gds = (input_path if isinstance(input_path, rd.Dataset)
                    else rd.read_parquet(input_path,
                                         filesystem=filesystem))
            if columns is not None:
                _gds = _gds.select_columns(columns)
                columns = None
            input_path = _gds.map_batches(
                lambda b: apply_generated(b, _gspecs),
                batch_format="pyarrow")
    ctx = _plan_ctx or plan_encode(input_path, opts, columns, filesystem)
    plan = ctx["plan"]
    file_meta = ctx["file_meta"]
    ds = ctx["ds"]
    plan_files = ctx["plan_files"]
    input_fs = ctx["input_fs"]
    group_col = ctx["group_col"]
    weight_col = ctx["weight_col"]
    sort_key = ctx["sort_key"]
    plan_s = ctx["plan_s"]
    if opts.expected_n_parts is not None \
            and plan.n_parts != opts.expected_n_parts:
        raise RuntimeError(
            f"plan has {plan.n_parts} partitions, expected "
            f"{opts.expected_n_parts}: the input changed under a "
            "resumed reservation — aborting before any write")
    plan_ref = ray.put(plan)  # broadcast once; tasks read it zero-copy

    # The all-to-all exchange is a direct two-stage push shuffle on raw
    # Ray tasks (the documented last-resort case: Ray Data 2.49's generic
    # exchanges were all measured inadequate here — row-level hash-shuffle
    # hashes per row in Python (46 s), shard-level hash-shuffle pays a 1 s
    # ray.wait poll per map task (60 s), sort-shuffle's reduce goes
    # superlinear in block count (40–65 s) — vs ~10 s for this exchange on
    # the same 80 MTok input).  Split tasks fan each read block into
    # n_parts compact IPC shards (num_returns=n_parts, so each shard is
    # its own object and moves point-to-point); one encode task per
    # partition consumes exactly its shards and starts as soon as they
    # exist.  Blocks stream in from the Dataset iterator with
    # backpressure; the object store spills if shards outrun encoders.
    # The flat exchange's shard-object count is O(blocks × n_parts); past
    # hier_parts_threshold partitions it switches to the two-level
    # exchange (coarse shards of hier_fan partitions each, level-2 group
    # encoders), dropping that to O(blocks × n_parts/fan).
    n_parts = plan.n_parts
    hier = n_parts > max(1, opts.hier_parts_threshold)
    fan = max(2, opts.hier_fan)
    n_out = -(-n_parts // fan) if hier else n_parts
    if hier:
        split_opts = (_split_block_coarse.options(num_returns=n_out)
                      if n_out > 1 else _split_block_coarse)
    else:
        split_opts = (_split_block.options(num_returns=n_out)
                      if n_out > 1 else _split_block)
    shard_refs: list = []  # one entry per split task: list of n_out refs
    t_iter = time.time()
    if ds is None:
        # fused read+split over row-group slices (path inputs): shards/
        # partition == task count, and per-shard overhead in the encode
        # task grows with it, so target ≈2 tasks per CPU bounded by the
        # row-group count (read_num_blocks overrides the task count);
        # max_split_task_bytes bounds any one task's read regardless.
        cpus = int(ray.cluster_resources().get("CPU", 8))
        n_rgs = sum(len(m["rg_rows"]) for m in file_meta)
        target_tasks = opts.read_num_blocks or min(max(1, n_rgs), 2 * cpus)
        pack_meta = [(m["path"], m["rg_bytes"]) for m in file_meta]
        rst = (_read_split_task.options(num_returns=n_out)
               if n_out > 1 else _read_split_task)
        for items in _pack_rg_items(pack_meta, target_tasks,
                                    max_task_mass=opts.max_split_task_bytes):
            refs = rst.remote(plan_ref, group_col, weight_col, n_out,
                              fan if hier else None, columns, items,
                              input_fs)
            shard_refs.append([refs] if n_out == 1 else list(refs))
    else:
        pending: list = []

        def _flush():
            if not pending:
                return
            if hier:
                refs = split_opts.remote(plan_ref, group_col, weight_col,
                                         n_out, fan, *pending)
            else:
                refs = split_opts.remote(plan_ref, group_col, weight_col,
                                         n_out, *pending)
            shard_refs.append([refs] if n_out == 1 else list(refs))
            pending.clear()

        # iter_internal_ref_bundles is Ray-2.49 private API (streams block
        # refs with backpressure, no driver materialization).  Guarded: on
        # a Ray without it, fall back to the public to_arrow_refs() — same
        # object-store residency, but the full block list is produced
        # before splitting starts (acceptable degraded mode, documented).
        if hasattr(ds, "iter_internal_ref_bundles"):
            block_iter = (br for bundle in ds.iter_internal_ref_bundles()
                          for br in bundle.block_refs)
        else:  # pragma: no cover — exercised only on other Ray versions
            block_iter = iter(ds.to_arrow_refs())
        for block_ref in block_iter:
            pending.append(block_ref)
            if len(pending) >= max(1, opts.blocks_per_split):
                _flush()
        _flush()
    t_launch = time.time()
    # barrier: every encode task consumes shards from EVERY split task, so
    # no encode can start before the last split finishes — waiting here is
    # free, and it keeps half a thousand tasks with unready args out of
    # the scheduler (submitting them early measured 2.5× slower end-to-end)
    flat = [r for m in shard_refs for r in m]
    ray.wait(flat, num_returns=len(flat), fetch_local=False)
    t_split_done = time.time()
    if hier:
        rec_refs = [
            _encode_group.remote(
                out_dir, sort_key, weight_col, opts.forced_codecs,
                opts.resume, opts.compression, opts.fsync,
                opts.rows_per_block, opts.id_offset, opts.record_extra,
                *[m[g] for m in shard_refs],
            )
            for g in range(n_out)
        ]
        t_submit = time.time()
        recs = [r for lst in ray.get(rec_refs) for r in lst if r]
    else:
        rec_refs = [
            _encode_part.remote(
                opts.id_offset + p, out_dir, sort_key, weight_col,
                opts.forced_codecs, opts.resume, opts.compression,
                opts.fsync, opts.rows_per_block, opts.record_extra,
                *[m[p] for m in shard_refs],
            )
            for p in range(n_parts)
        ]
        t_submit = time.time()
        recs = [r for r in ray.get(rec_refs) if r]  # one small record per partition
    t_done = time.time()
    wall = t_done - t0
    phases = {
        "plan_s": round(plan_s, 3),
        "read_launch_s": round(t_launch - t_iter, 3),
        "split_s": round(t_split_done - t_launch, 3),
        "submit_s": round(t_submit - t_split_done, 3),
        "encode_s": round(t_done - t_submit, 3),
    }
    summary = {
        "n_partitions": len(recs),
        "n_rows": int(sum(r["n_rows"] for r in recs)),
        "n_weight": int(sum(r["n_weight"] for r in recs)),
        "raw_bytes": int(sum(r["raw_bytes"] for r in recs)),
        "encoded_bytes": int(sum(r["encoded_bytes"] for r in recs)),
        "skipped_partitions": int(sum(bool(r["skipped"]) for r in recs)),
        "wall_s": wall,
        "plan_s": plan_s,
        "phases": phases,
        "plan": {"n_parts": plan.n_parts, "hierarchical": hier,
                 "hier_fan": fan if hier else None,
                 "range_key": plan.rkey},
        "out_dir": out_dir,
    }
    mf.write_global_manifest(out_dir, summary)
    return summary


def prune_partitions(out_dir: str, key_values,
                     records: dict | None = None,
                     column: str | None = None) -> list[str]:
    """Manifest-level partition pruning: keep only partitions whose bloom
    sketch might contain ANY of ``key_values`` (partitions without a
    sketch are kept).  The analog of the reference's PageFilter predicate
    pushdown (/root/reference/src/read/page/reader.rs:61) driven by the
    A6 membership sketch — a driver-side O(partitions) probe, no data
    read.

    ``column``: the column the values target.  When set, only records
    whose ``bloom_key`` IS that column are probed; the rest are kept —
    probing another column's bloom would false-prune and silently drop
    matching rows (the same rule delete_rows applies to its refine).
    When None (legacy callers), values are understood to target each
    record's own bloom key."""
    import base64

    from ..functions import bloom

    if records is None:
        records = mf.load_manifest(out_dir)
    key_values = list(key_values)
    hashes_by_type: dict = {}  # writer-recorded bloom_type → probe hashes
    keep = []
    for r in records.values():
        b64 = r.get("bloom")
        if not b64 or (column is not None
                       and r.get("bloom_key") != column):
            keep.append(r["path"])
            continue
        ts = r.get("bloom_type")
        if ts is None:
            # record predates the bloom_type field: its sketch was built
            # by an unknown hasher — keep unpruned rather than probing
            # with today's hashes and false-pruning ~99% of the time
            keep.append(r["path"])
            continue
        if ts not in hashes_by_type:
            hashes_by_type[ts] = bloom.hash_values(key_values, ts)
        if bloom.might_contain(base64.b64decode(b64), hashes_by_type[ts]).any():
            keep.append(r["path"])
    return keep


def prune_partitions_by_range(out_dir: str, column: str,
                              lo=None, hi=None,
                              records: dict | None = None) -> list[str]:
    """Range predicate pushdown against the recorded per-partition
    min/max statistics — the page-index pruning analog
    (/root/reference/src/indexes/intervals.rs:62-84 `compute_rows` /
    /root/reference/src/read/page/indexed_reader.rs:25-60).  Keeps a
    partition when [min,max] of ``column`` overlaps [lo,hi]; partitions
    with no recorded stats for the column are kept."""
    from ..functions.stats import bound_in_profile_domain, key_span

    if records is None:
        records = mf.load_manifest(out_dir)
    keep = []
    for r in records.values():
        span = key_span(r, column)
        if span is None:
            keep.append(r["path"])
            continue
        # temporal bounds compare in the profiles' isoformat domain
        plo = bound_in_profile_domain(lo, span[0])
        phi = bound_in_profile_domain(hi, span[0])
        if (plo is not None and span[1] < plo) or \
           (phi is not None and span[0] > phi):
            continue
        keep.append(r["path"])
    return keep


def lookup_rows(out_dir: str, key_column: str, key_values,
                columns: list[str] | None = None) -> rd.Dataset:
    """Point lookup over a container dataset — the composition of every
    pruning layer for the "fetch these ids out of 100 TB" shape:

    1. partition pruning by the manifest BLOOM sketch (driver-side
       O(partitions) probe, no data read),
    2. row-block pruning by the per-block page index using the keys'
       [min, max] envelope (paged containers decode only overlapping
       blocks),
    3. column projection (only ``columns`` ∪ key chunks are pread), and
    4. an exact vectorized ``is_in`` row filter.

    Returns a streamed Dataset of exactly the matching rows."""
    keys = list(key_values)
    if not keys:
        raise ValueError("lookup_rows needs at least one key value")
    records = mf.load_manifest(out_dir)
    paths = prune_partitions(out_dir, keys, records=records,
                             column=key_column)
    if not paths:
        return rd.from_arrow(pa.table({}))
    lo, hi = min(keys), max(keys)
    read_cols = columns
    if columns is not None and key_column not in columns:
        read_cols = list(columns) + [key_column]
    key_set = pa.array(keys)
    # schema-evolved containers: pad each partition to the union so a
    # partition predating the key or a projected column contributes its
    # null-keyed (zero-match) rows instead of a KeyError
    union = _union_fields(list(records.values()))
    pad = (None if union is None else
           [f for f in union
            if read_cols is None or f[0] in set(read_cols)])

    def _decode_lookup(batch: pa.Table):
        from ..stages.encode import decode_partition_path

        for p in batch["path"]:
            t = decode_partition_path(p.as_py(), key_column, lo, hi,
                                      columns=read_cols,
                                      missing_ok=pad is not None)
            if pad is not None:
                t = _pad_to_union(t, pad)
            t = t.filter(pc.is_in(t[key_column], value_set=key_set))
            if columns is not None and key_column not in columns:
                t = t.drop_columns([key_column])
            yield t

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        _decode_lookup, batch_format="pyarrow", batch_size=1)


def _union_fields(records: list[dict]) -> list[tuple[str, str]] | None:
    """Column-set union across partitions as ``[(name, arrow_type)]``,
    or ``None`` when every partition shares one column set — the
    homogeneous fast path, which pays nothing.

    Schema-evolved containers (``append_dataset(evolve_schema=True)``,
    P48) hold partitions with different column sets; readers harmonize
    each decoded partition to the union (missing columns → nulls).
    Column NAMES come free from each record's ``codecs`` dict; types
    are read from ONE footer per DISTINCT name-set (2-3 preads on a
    real evolved container, not O(partitions)).  Name-sets are keyed
    ORDER-SENSITIVE (codecs dict keys preserve footer column order):
    two partitions with the same columns in different orders are
    heterogeneous too — readers must normalize the order or block
    concatenation fails downstream."""
    name_sets: dict[tuple, str] = {}
    for r in records:
        names = tuple(r.get("codecs") or ())
        if names:  # 0-row tombstones carry no codecs — no schema info
            name_sets.setdefault(names, r["path"])
    if len(name_sets) <= 1:
        return None
    fields: dict[str, str] = {}
    order: list[str] = []
    for path in name_sets.values():
        footer = mf.read_partition_footer(path)
        meta = (footer["blocks"][0]["columns"] if footer.get("paged")
                else footer["columns"])
        for m in meta:
            if m["name"] not in fields:
                fields[m["name"]] = m["arrow_type"]
                order.append(m["name"])
            elif fields[m["name"]] != m["arrow_type"]:
                raise ValueError(
                    f"column {m['name']!r} has conflicting types across "
                    f"partitions: {fields[m['name']]} vs "
                    f"{m['arrow_type']} — evolution only ADDS columns")
    return [(n, fields[n]) for n in order]


def _pad_to_union(t: pa.Table, fields: list[tuple[str, str]]) -> pa.Table:
    """Harmonize one decoded partition to the union schema: missing
    columns become typed nulls; column order follows the union."""
    from ..codecs.column import str_to_type

    cols = {}
    for n, ts in fields:
        cols[n] = (t[n] if n in t.column_names
                   else pa.nulls(t.num_rows, str_to_type(ts)))
    return pa.table(cols)


def decode_dataset(out_dir: str, key_values=None,
                   key_range: tuple | None = None,
                   columns: list[str] | None = None,
                   as_of: int | str | None = None,
                   part_ids: set | None = None,
                   key_ranges: list[tuple] | None = None) -> rd.Dataset:
    """Stream decoded partitions back as a Ray Dataset.

    ``key_values``: optional iterable of key-column values — partitions
    whose bloom sketch rules out every requested key are skipped at the
    manifest, before any data is read.

    ``key_range``: optional ``(column, lo, hi)`` — partitions are pruned
    by their recorded min/max, and inside each surviving PAGED partition
    only the row-blocks whose page index overlaps [lo,hi] are read and
    decoded (rows are then exactly filtered to the range).  Either bound
    may be None (open interval).

    ``key_ranges``: a CONJUNCTION of such triples (AND semantics) —
    partition pruning intersects the per-column min/max probes, the
    page index keeps only blocks overlapping EVERY predicate, and the
    exact row filter ANDs them.  On a Z-ordered container (P44) each
    keyed column's predicate prunes independently, so a conjunctive
    probe touches the intersection — the layout's whole point.

    ``columns``: optional projection — only the named column chunks are
    read from disk and decoded (reference S7 / ColumnIterator,
    src/read/column/mod.rs:22-205).  At 100 TB a 2-column consumer of a
    20-column table must not pay for 18 columns of IO + decode.

    ``as_of``: time travel — decode the snapshot at that transaction
    (or tag name; see ``manifest.load_manifest`` / ``tag_snapshot``);
    valid until the superseded files are GC'd.  ``part_ids``: restrict
    to those partition ids (the changes-since incremental read routes
    here)."""
    if isinstance(as_of, str):
        from .history_pipeline import resolve_as_of

        as_of = resolve_as_of(out_dir, as_of)
    if key_range is not None and key_ranges is not None:
        raise ValueError("pass key_range OR key_ranges, not both")
    preds = (list(key_ranges) if key_ranges is not None
             else ([key_range] if key_range is not None else None))
    # one manifest read serves pruning AND ordering
    records = mf.load_manifest(out_dir, as_of=as_of)
    if part_ids is not None:
        records = {pid: r for pid, r in records.items() if pid in part_ids}
    if key_values is not None:
        paths = prune_partitions(out_dir, key_values, records=records)
    elif preds is not None:
        # conjunctive pruning: intersect the per-column min/max probes
        pruned = records
        for col, lo, hi in preds:
            kept = set(prune_partitions_by_range(out_dir, col, lo, hi,
                                                 records=pruned))
            pruned = {pid: r for pid, r in pruned.items()
                      if r["path"] in kept}
        paths = [r["path"] for r in pruned.values()]
    else:
        paths = None
    # deterministic ascending part-id order (listdir order is not a
    # contract).  Ray Datasets preserve block order, so a range-
    # clustered container (P43: ids ascend with the key, rows sorted
    # within) streams back GLOBALLY key-ordered — merge-join/export
    # consumers get sorted input for free.
    def _pid_num(r: dict) -> int:
        s = str(r["part_id"])
        return int(s[1:]) if s[:1] == "p" else int(s)

    by_id = sorted(records.values(), key=_pid_num)
    if paths is None:
        paths = [r["path"] for r in by_id]
    else:
        keep = set(paths)
        paths = [r["path"] for r in by_id if r["path"] in keep]
    if not paths:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    # schema-evolved containers: harmonize every partition to the union
    # (None for homogeneous containers — zero cost on the common path)
    union = _union_fields(by_id)
    if union is not None and columns is not None:
        # typo safety moves up here: the per-partition decode must
        # tolerate missing columns, so validate against the UNION
        known = {n for n, _ in union}
        bad = [c for c in columns if c not in known]
        if bad:
            raise KeyError(f"container has no column(s) {bad}; "
                           f"available: {sorted(known)}")

    if preds is not None:
        # the exact row filter needs every predicate column decoded even
        # when the projection omits it — decode the union, drop after
        pcols = [c for c, _, _ in preds]
        read_cols = columns
        extra = ([c for c in dict.fromkeys(pcols)
                  if c not in columns] if columns is not None else [])
        if extra:
            read_cols = list(columns) + extra
        pad = (None if union is None else
               [f for f in union
                if read_cols is None or f[0] in set(read_cols)])

        def _decode_range(batch: pa.Table):
            for p in batch["path"]:
                t = decode_partition_path(p.as_py(), preds=preds,
                                          columns=read_cols,
                                          missing_ok=pad is not None)
                if pad is not None:
                    # pad BEFORE the filter: a partition predating a
                    # predicate column holds only null keys → no matches
                    t = _pad_to_union(t, pad)
                # exact conjunctive filter on top of block pruning
                m = None
                for kcol, lo, hi in preds:
                    if lo is not None:
                        m2 = pc.greater_equal(t[kcol], lo)
                        m = m2 if m is None else pc.and_(m, m2)
                    if hi is not None:
                        m2 = pc.less_equal(t[kcol], hi)
                        m = m2 if m is None else pc.and_(m, m2)
                if m is not None:
                    t = t.filter(m)
                if extra:
                    t = t.drop_columns(extra)
                yield t

        return rd.from_items([{"path": p} for p in paths]).map_batches(
            _decode_range, batch_format="pyarrow", batch_size=1
        )

    pad = (None if union is None else
           [f for f in union if columns is None or f[0] in set(columns)])

    def _decode_gen(batch: pa.Table):
        for p in batch["path"]:
            t = decode_partition_path(p.as_py(), columns=columns,
                                      missing_ok=pad is not None)
            yield t if pad is None else _pad_to_union(t, pad)

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        _decode_gen, batch_format="pyarrow", batch_size=1
    )
