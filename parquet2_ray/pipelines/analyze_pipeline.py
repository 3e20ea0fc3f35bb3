"""ANALYZE: persisted per-column statistics for a container (P68).

The lakehouse ``ANALYZE TABLE`` shape: a planner (human or code)
needs column NDV, null fractions, value distributions and average
widths WITHOUT scanning 100 TB per question.  Two layers:

- **metadata fold** (always exact, O(partitions) driver-side, zero
  data reads): row counts, per-column null counts and min/max are
  already restated in every manifest record's profiles (A1/A2 — and,
  under deletion vectors, restated over the MASKED view), so folding
  them is pure metadata.
- **data pass** (one streamed read of the container, NO exchange of
  data rows): each task decodes a batch of partitions and folds every
  column into (a) an HLL register bank (``functions/hll`` — mergeable
  by elementwise max, fixed 2^p bytes regardless of cardinality) for
  NDV, and (b) for numeric columns a centroid digest
  (``stages/window._compress_centroids`` — the P24 equi-depth sketch,
  mergeable by concat+recompress) for quantiles/selectivity.  One
  ~KB partial per (task, column) reaches a ``groupby(column)`` of
  O(columns) groups; the driver receives O(columns) rows.

The stats document persists under ``_manifest/analyze.json`` WITH its
sketches (zstd'd register banks + digests), which makes ANALYZE
**incremental**: after an append, only partitions absent from the
covered set are folded into the stored banks.  Compaction rewrites
(same rows, new part ids) re-fold harmlessly into the HLL (a set
sketch — re-adding values is idempotent) and only re-weight the digest
with the same distribution; exact counts/min/max always come from the
CURRENT records, so they are immune.  ``analyze(incremental=False)``
rebuilds from scratch.

Consumers: ``estimate_distinct`` / ``estimate_range_rows`` (digest
interpolation) and ``explain_read`` — the EXPLAIN-style planning
helper that reports, for a range predicate, how many partitions the
manifest min/max would prune and how many rows the digest expects the
surviving read to yield, without touching data.

No reference analog beyond per-chunk min/max (statistics.rs) — the
reference drops distinct_count exactly because it is not mergeable
(/root/reference/src/write/statistics.rs:28-79); the HLL bank is the
mergeable formulation.
"""

from __future__ import annotations

import base64
import json

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..functions.hashing import column_hashes
from ..functions.hll import hll_estimate, hll_init, hll_merge
from ..state import fsio
from ..state import manifest as mf

__all__ = [
    "analyze_container",
    "load_stats",
    "estimate_distinct",
    "estimate_range_rows",
    "explain_read",
]

_PCTS = (0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)


def _stats_path(out_dir: str) -> str:
    return mf.manifest_dir(out_dir).rstrip("/") + "/analyze.json"


def _is_digestible(t: pa.DataType) -> bool:
    return (pa.types.is_integer(t) or pa.types.is_floating(t)
            or pa.types.is_timestamp(t) or pa.types.is_date(t)
            or pa.types.is_time(t))


def _to_float(arr: pa.Array) -> np.ndarray:
    t = arr.type
    if pa.types.is_timestamp(t) or pa.types.is_date(t) or \
            pa.types.is_time(t):
        arr = arr.cast(pa.int64())
    return arr.to_numpy(zero_copy_only=False).astype(np.float64)


def _b64(reg: np.ndarray) -> str:
    raw = reg.astype("<f8").tobytes() if reg.dtype != np.uint8 \
        else reg.tobytes()
    return base64.b64encode(
        pa.compress(raw, codec="zstd", asbytes=True)).decode()


def _unb64(s: str, nbytes: int, dtype) -> np.ndarray:
    raw = pa.decompress(base64.b64decode(s), nbytes, codec="zstd",
                        asbytes=True)
    return np.frombuffer(raw, dtype=dtype)


def _hll_fold(arr: pa.Array, p: int) -> np.ndarray:
    from ..functions.hll import hll_add

    reg = hll_init(p)
    if len(arr):
        hll_add(reg, column_hashes(arr))
    return reg


def _fold_partials(paths: list[str], columns, p: int,
                   compression: int) -> dict:
    """Per-column sketches over a batch of partition files; partials
    merge IN the task so one row per column leaves it."""
    from ..stages.encode import decode_partition_path
    from ..stages.window import _compress_centroids

    acc: dict[str, dict] = {}
    for path in paths:
        t = decode_partition_path(
            path, columns=list(columns) if columns else None,
            missing_ok=columns is not None)  # schema-evolved partitions
        names = [c for c in t.column_names
                 if columns is None or c in columns]
        for c in names:
            arr = t[c].combine_chunks().drop_null()
            a = acc.setdefault(c, {
                "reg": hll_init(p), "nbytes": 0, "n": 0,
                "m": np.empty(0, np.float64),
                "w": np.empty(0, np.float64),
                "lo": np.inf, "hi": -np.inf,
                "digestible": _is_digestible(arr.type)})
            a["reg"] = hll_merge(a["reg"], _hll_fold(arr, p))
            a["nbytes"] += arr.nbytes
            a["n"] += len(arr)
            if a["digestible"] and len(arr):
                vals = _to_float(arr)
                m, w = _compress_centroids(
                    np.concatenate([a["m"], vals]),
                    np.concatenate([a["w"], np.ones(vals.size)]),
                    compression)
                a["m"], a["w"] = m, w
                a["lo"] = min(a["lo"], float(vals.min()))
                a["hi"] = max(a["hi"], float(vals.max()))
    return acc


def _partials_to_table(acc: dict) -> pa.Table:
    cols = sorted(acc)
    return pa.table({
        "column": pa.array(cols, pa.string()),
        "reg": pa.array([acc[c]["reg"].tobytes() for c in cols],
                        pa.large_binary()),
        "nbytes": pa.array([acc[c]["nbytes"] for c in cols], pa.int64()),
        "n": pa.array([acc[c]["n"] for c in cols], pa.int64()),
        "m": pa.array([acc[c]["m"].astype("<f8").tobytes()
                       for c in cols], pa.large_binary()),
        "w": pa.array([acc[c]["w"].astype("<f8").tobytes()
                       for c in cols], pa.large_binary()),
        "lo": pa.array([acc[c]["lo"] for c in cols], pa.float64()),
        "hi": pa.array([acc[c]["hi"] for c in cols], pa.float64()),
        "digestible": pa.array([acc[c]["digestible"] for c in cols],
                               pa.bool_()),
    })


def analyze_container(
    out_dir: str,
    columns: list[str] | None = None,
    p: int = 12,
    compression: int = 256,
    incremental: bool = False,
) -> dict:
    """Compute (or incrementally refresh) the container's column
    statistics; persists ``_manifest/analyze.json`` and returns the
    stats document.  See module docstring for the two-layer design."""
    records = mf.load_manifest(out_dir)
    prev = None
    if incremental and fsio.exists(_stats_path(out_dir)):
        prev = load_stats(out_dir)
        if columns is None:
            columns = prev.get("requested_columns")
        # sketches only merge like-for-like: adopt the stored params
        p = int(prev["p"])
        compression = int(prev["compression"])
        # a column absent from the stored sketches would fold over only
        # the UNCOVERED partitions yet read as container-wide — refuse
        # instead of silently truncating (run a full analyze for it)
        if columns is not None:
            missing = [c for c in columns if c not in prev["sketches"]]
            if missing:
                raise ValueError(
                    f"columns {missing} were not in the previous "
                    "analyze document — run analyze_container("
                    "incremental=False) to add columns")
        covered = set(prev["covered"])
        todo = {pid: r for pid, r in records.items()
                if pid not in covered}
    else:
        todo = records

    # ---- data pass: sketches over uncovered partitions -------------
    merged: dict[str, dict] = {}
    if todo:
        paths = [r["path"] for r in todo.values()]

        def task(batch: pa.Table) -> pa.Table:
            return _partials_to_table(_fold_partials(
                [x.as_py() for x in batch["path"]], columns, p,
                compression))

        def final(group: pa.Table) -> pa.Table:
            from ..stages.window import _compress_centroids

            reg = hll_init(p)
            for b in group["reg"]:
                reg = hll_merge(reg, np.frombuffer(b.as_py(), np.uint8))
            ms = np.concatenate([np.frombuffer(b.as_py(), "<f8")
                                 for b in group["m"]])
            ws = np.concatenate([np.frombuffer(b.as_py(), "<f8")
                                 for b in group["w"]])
            if ms.size:
                ms, ws = _compress_centroids(ms, ws, compression)
            return pa.table({
                "column": group["column"].slice(0, 1),
                "reg": pa.array([reg.tobytes()], pa.large_binary()),
                "nbytes": pa.array(
                    [int(group["nbytes"].to_numpy().sum())]),
                "n": pa.array([int(group["n"].to_numpy().sum())]),
                "m": pa.array([ms.astype("<f8").tobytes()],
                              pa.large_binary()),
                "w": pa.array([ws.astype("<f8").tobytes()],
                              pa.large_binary()),
                "lo": pa.array([float(np.min(group["lo"].to_numpy()))]),
                "hi": pa.array([float(np.max(group["hi"].to_numpy()))]),
                "digestible": group["digestible"].slice(0, 1),
            })

        rows = (rd.from_items([{"path": x} for x in paths])
                .map_batches(task, batch_format="pyarrow", batch_size=8)
                .groupby("column")
                .map_groups(final, batch_format="pyarrow")
                .take_all())
        for r in rows:
            merged[r["column"]] = {
                "reg": np.frombuffer(r["reg"], np.uint8).copy(),
                "nbytes": int(r["nbytes"]), "n": int(r["n"]),
                "m": np.frombuffer(r["m"], "<f8").copy(),
                "w": np.frombuffer(r["w"], "<f8").copy(),
                "lo": float(r["lo"]), "hi": float(r["hi"]),
                "digestible": bool(r["digestible"]),
            }

    # fold stored sketches from the previous document (incremental)
    if prev is not None:
        from ..stages.window import _compress_centroids

        for c, sk in prev["sketches"].items():
            m_prev = _unb64(sk["m"], sk["m_len"] * 8, "<f8")
            w_prev = _unb64(sk["w"], sk["m_len"] * 8, "<f8")
            reg_prev = _unb64(sk["reg"], 1 << prev["p"], np.uint8)
            cur = merged.setdefault(c, {
                "reg": hll_init(p), "nbytes": 0, "n": 0,
                "m": np.empty(0, np.float64),
                "w": np.empty(0, np.float64),
                "lo": np.inf, "hi": -np.inf,
                "digestible": bool(sk["digestible"])})
            cur["reg"] = hll_merge(cur["reg"], reg_prev)
            cur["nbytes"] += sk["nbytes"]
            cur["n"] += sk["n"]
            if m_prev.size or cur["m"].size:
                ms, ws = _compress_centroids(
                    np.concatenate([cur["m"], m_prev]),
                    np.concatenate([cur["w"], w_prev]), compression)
                cur["m"], cur["w"] = ms, ws
            cur["lo"] = min(cur["lo"], sk.get("lo", np.inf))
            cur["hi"] = max(cur["hi"], sk.get("hi", -np.inf))

    # ---- metadata fold: exact, from the CURRENT records ------------
    col_meta: dict[str, dict] = {}
    total_rows = 0
    for r in records.values():
        total_rows += int(r["n_rows"])
        for prof in r.get("profiles", []):
            c = prof["column"]
            if columns is not None and c not in columns:
                continue
            m = col_meta.setdefault(
                c, {"nulls": 0, "min": None, "max": None})
            m["nulls"] += int(prof.get("null_count", 0))
            for k, cmpf in (("min", lambda a, b: a < b),
                            ("max", lambda a, b: a > b)):
                v = prof.get(k)
                if v is None:
                    continue
                if m[k] is None or cmpf(v, m[k]):
                    m[k] = v

    doc = {
        "txn": max((mf.record_txn(r) for r in records.values()),
                   default=0),
        "covered": sorted(records),
        "requested_columns": columns,
        "p": p,
        "compression": compression,
        "rows": total_rows,
        "columns": {},
        "sketches": {},
    }
    for c in sorted(set(col_meta) | set(merged)):
        meta = col_meta.get(c, {"nulls": 0, "min": None, "max": None})
        sk = merged.get(c)
        ndv = float(hll_estimate(sk["reg"])) if sk else None
        quantiles = None
        if sk and sk["digestible"] and sk["m"].size:
            cum = np.cumsum(sk["w"])
            mid = (cum - sk["w"] / 2.0) / cum[-1]
            xp = np.concatenate([[0.0], mid, [1.0]])
            fp = np.concatenate([[sk["lo"]], sk["m"], [sk["hi"]]])
            quantiles = {str(q): float(np.interp(q, xp, fp))
                         for q in _PCTS}
        doc["columns"][c] = {
            "rows": total_rows,
            "null_count": meta["nulls"],
            "min": meta["min"],
            "max": meta["max"],
            "ndv": None if ndv is None else round(ndv, 1),
            "avg_width": (round(sk["nbytes"] / sk["n"], 2)
                          if sk and sk["n"] else None),
            "quantiles": quantiles,
        }
        if sk:
            doc["sketches"][c] = {
                "reg": _b64(sk["reg"]),
                "m": _b64(sk["m"]), "w": _b64(sk["w"]),
                "m_len": int(sk["m"].size),
                "lo": (None if not np.isfinite(sk["lo"])
                       else sk["lo"]),
                "hi": (None if not np.isfinite(sk["hi"])
                       else sk["hi"]),
                "nbytes": sk["nbytes"], "n": sk["n"],
                "digestible": sk["digestible"],
            }
    # JSON round-trip of sketch lo/hi: None ↔ ±inf
    fsio.atomic_write(_stats_path(out_dir),
                      json.dumps(doc, default=str).encode(),
                      fsync=False)
    return doc


def load_stats(out_dir: str) -> dict:
    doc = json.loads(fsio.read_bytes(_stats_path(out_dir)))
    for sk in doc["sketches"].values():
        if sk["lo"] is None:
            sk["lo"], sk["hi"] = np.inf, -np.inf
        else:
            sk["lo"], sk["hi"] = float(sk["lo"]), float(sk["hi"])
    return doc


def estimate_distinct(stats: dict, column: str) -> float:
    """NDV estimate for ``column`` (HLL, std err ≈ 1.04/sqrt(2^p))."""
    v = stats["columns"][column].get("ndv")
    if v is None:
        raise ValueError(f"no NDV sketch for column {column!r}")
    return float(v)


def _cdf(stats: dict, column: str):
    sk = stats["sketches"].get(column)
    if sk is None or not sk.get("digestible") or sk["m_len"] == 0:
        raise ValueError(f"no digest for column {column!r} "
                         "(non-numeric or not analyzed)")
    m = _unb64(sk["m"], sk["m_len"] * 8, "<f8")
    w = _unb64(sk["w"], sk["m_len"] * 8, "<f8")
    cum = np.cumsum(w)
    mid = (cum - w / 2.0) / cum[-1]
    xs = np.concatenate([[sk["lo"]], m, [sk["hi"]]])
    fs = np.concatenate([[0.0], mid, [1.0]])
    # scale by the EXACT non-null row count from the current records
    # (doc["columns"]), NOT the sketch's fold count: incremental
    # refreshes re-fold compaction-rewritten partitions, which
    # double-WEIGHTS the digest (harmless — same distribution) but
    # would inflate a count-based estimate ~2× per maintenance cycle
    cs = stats["columns"][column]
    n = int(cs["rows"]) - int(cs["null_count"])
    return xs, fs, n


def estimate_range_rows(stats: dict, column: str, lo=None, hi=None) -> float:
    """Expected non-null rows with ``lo <= column <= hi`` (either bound
    open), interpolated on the persisted digest — rank error
    ≈ 2/compression of the total."""
    xs, fs, n = _cdf(stats, column)
    f_lo = 0.0 if lo is None else float(np.interp(float(lo), xs, fs))
    f_hi = 1.0 if hi is None else float(np.interp(float(hi), xs, fs))
    return max(0.0, (f_hi - f_lo)) * n


def explain_read(out_dir: str, column: str, lo=None, hi=None) -> dict:
    """EXPLAIN for a range read: partitions the manifest would prune,
    rows the digest expects — no data is read.  The planning surface
    for choosing ``decode_dataset(key_range=...)`` vs a full scan."""
    from .encode_pipeline import prune_partitions_by_range

    records = mf.load_manifest(out_dir)
    surviving = prune_partitions_by_range(out_dir, column, lo, hi,
                                          records=records)
    stats = load_stats(out_dir)
    try:
        est = estimate_range_rows(stats, column, lo, hi)
    except ValueError:
        est = None
    total_rows = sum(int(r["n_rows"]) for r in records.values())
    return {
        "column": column, "lo": lo, "hi": hi,
        "partitions_total": len(records),
        "partitions_read": len(surviving),
        "rows_total": total_rows,
        "rows_estimated": None if est is None else round(est, 1),
        "selectivity": (None if est is None or not total_rows
                        else round(est / total_rows, 6)),
    }
