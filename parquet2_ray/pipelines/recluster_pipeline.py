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

from ..state import manifest as mf
from .encode_pipeline import EncodeOptions, decode_dataset, encode_dataset

__all__ = ["recluster_container"]


def recluster_container(
    src_dir: str,
    out_dir: str,
    key: str,
    opts: EncodeOptions | None = None,
) -> dict:
    """Rewrite the container at ``src_dir`` into ``out_dir``, range-
    partitioned and sorted by ``key``.  Returns the new container's
    encode summary plus clustering quality metrics.

    ``opts`` seeds every other knob (target_weight, compression, fsync,
    resume, ...); its partitioning fields are overridden: group_col →
    None, range_key/sort_key → ``key``.  weight_col is kept when the
    source schema has it (token-mass-balanced ranges), else dropped to
    row balancing.
    """
    records = mf.load_manifest(src_dir)
    if not records:
        raise FileNotFoundError(f"no committed partitions under {src_dir}")
    ds = decode_dataset(src_dir)
    names = ds.schema().names
    if key not in names:
        raise ValueError(f"key {key!r} not in container schema {names}")
    base = opts or EncodeOptions()
    weight_col = base.weight_col if base.weight_col in names else None
    ropts = replace(base, group_col=None, weight_col=weight_col,
                    range_key=key, sort_key=key)
    summary = encode_dataset(ds, out_dir, ropts)
    summary["clustering"] = clustering_quality(out_dir, key)
    return summary


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
