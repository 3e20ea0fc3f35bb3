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

__all__ = ["recluster_container", "clustering_quality", "ZVAL_COL"]

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
    summary["clustering"] = {k: clustering_quality(out_dir, k)
                             for k in keys} if len(keys) > 1 \
        else clustering_quality(out_dir, rkey)
    return summary


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


def clustering_quality(out_dir: str, key: str) -> dict:
    """Measure how well a container is clustered on ``key`` from its
    manifest profiles alone (no data read): the average number of
    partitions a random point/range probe on the key must touch.

    overlap_factor = mean over partitions of how many OTHER partitions'
    [min,max] intervals overlap its own, +1.  A perfectly clustered
    container scores ~1.0 (duplicated edge values allow slightly more);
    an unclustered one scores ≈ n_partitions."""
    records = mf.load_manifest(out_dir)
    spans = []
    for r in records.values():
        prof = next((p for p in r.get("profiles", [])
                     if p.get("column") == key), None)
        if prof is None or prof.get("min") is None:
            continue
        spans.append((prof["min"], prof["max"]))
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
