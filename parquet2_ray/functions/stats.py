"""Per-column statistics: batch-level build + partial→final reduce.

The reference builds min/max/null_count per page and folds them across
pages into chunk statistics with ``reduce``
(/root/reference/src/write/statistics.rs:28-79): min of mins, max of
maxs, sum of null_counts, and distinct_count dropped because it is not
mergeable. ``fold_profiles`` reproduces exactly those semantics; string
min/max compare bytewise-unsigned like the reference's ``ord_binary``
(/root/reference/src/types.rs:116-132) — which is what
``pyarrow.compute.min_max`` does on binary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["column_profile", "fold_profiles", "int_shape_stats",
           "bound_in_profile_domain", "key_span", "profile_value_to_typed"]


def key_span(record: dict, column: str):
    """One partition record's recorded (min, max) for ``column``, or
    ``None`` when the column has no usable stats — the single span
    extraction every pruning/clustering decision shares."""
    prof = next((p for p in record.get("profiles", [])
                 if p.get("column") == column), None)
    if prof is None or prof.get("min") is None:
        return None
    return prof["min"], prof["max"]


def profile_value_to_typed(v, arrow_type):
    """Inverse of ``_scalar`` for comparison against real data: profiles
    JSON-serialize temporal scalars as isoformat strings and binary as
    utf-8/surrogateescape strings; an Arrow compute filter against the
    actual column needs the typed value back.  Non-string profile
    values and string columns pass through."""
    if v is None or not isinstance(v, str):
        return v
    if (pa.types.is_timestamp(arrow_type) or pa.types.is_date(arrow_type)
            or pa.types.is_time(arrow_type)
            or pa.types.is_duration(arrow_type)):
        # Arrow's string→temporal cast parses isoformat
        return pa.scalar(v, type=pa.string()).cast(arrow_type)
    if pa.types.is_binary(arrow_type) or pa.types.is_large_binary(arrow_type) \
            or pa.types.is_fixed_size_binary(arrow_type):
        return v.encode("utf-8", "surrogateescape")
    return v


def bound_in_profile_domain(bound, profile_value):
    """Normalize a caller's range bound into the domain its stored
    profile min/max live in.

    Profiles JSON-serialize temporal scalars via ``isoformat()``
    (``_scalar`` below), so a partition's recorded ``["min"]``/["max"]``
    for a timestamp/date/time column is a STRING.  A caller probing
    with a native ``datetime``/``date``/``np.datetime64`` bound must be
    compared in that same domain — isoformat strings order exactly like
    their native values (fixed-width zero-padded fields; a
    microseconds-free form is a prefix of the extended form and orders
    correctly), so converting the bound preserves semantics.  Bounds
    already in the profile's type, and non-temporal bounds, pass
    through untouched."""
    if bound is None or isinstance(bound, str) \
            or not isinstance(profile_value, str):
        return bound
    if isinstance(bound, pa.Scalar):
        bound = bound.as_py()
    if isinstance(bound, np.datetime64):
        bound = bound.astype("datetime64[us]").item()
    if hasattr(bound, "isoformat"):
        import datetime as _dt

        # granularity: a datetime bound against a DATE-shaped profile
        # ('YYYY-MM-DD', no time part) must truncate to the date, or
        # 'YYYY-MM-DDT00:00:00' sorts after the profile's own value and
        # falsely prunes partitions containing that very date.
        # Truncation is conservative in both directions (pruning keeps
        # at most extra partitions; the exact row filter stays typed).
        if (isinstance(bound, _dt.datetime)
                and len(profile_value) == 10 and "T" not in profile_value):
            return bound.date().isoformat()
        return bound.isoformat()
    return bound


def _scalar(v):
    if v is None:
        return None
    v = v.as_py() if isinstance(v, pa.Scalar) else v
    if isinstance(v, bytes):
        return v.decode("utf-8", "surrogateescape")
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, float):
        return v
    if isinstance(v, (int, str, bool)):
        return v
    return str(v)


def column_profile(name: str, arr: pa.Array | pa.ChunkedArray) -> dict:
    """min / max / null_count / n for one column (one batch or partition)."""
    n = len(arr)
    null_count = arr.null_count
    prof = {"column": name, "n_values": n, "null_count": null_count,
            "min": None, "max": None}
    t = arr.type
    if n - null_count > 0 and not (pa.types.is_list(t) or pa.types.is_large_list(t)
                                   or pa.types.is_struct(t)
                                   or pa.types.is_map(t)):
        mm = pc.min_max(arr)
        prof["min"] = _scalar(mm["min"])
        prof["max"] = _scalar(mm["max"])
    return prof


def fold_profiles(profiles: list[dict]) -> dict:
    """Partial→final reduce (statistics.rs:28-79 semantics)."""
    if not profiles:
        return {}
    out = dict(profiles[0])
    for p in profiles[1:]:
        if p["column"] != out["column"]:
            raise ValueError("fold_profiles: mixed columns")
        out["n_values"] += p["n_values"]
        out["null_count"] += p["null_count"]
        for key, op in (("min", min), ("max", max)):
            a, b = out[key], p[key]
            out[key] = b if a is None else a if b is None else op(a, b)
    return out


def int_shape_stats(v: np.ndarray) -> dict:
    """Distribution-shape probe for the codec selector (north rule:
    cardinality, run-length histogram, value range). Vectorized."""
    n = len(v)
    if n == 0:
        return {"n": 0, "min": 0, "max": 0, "range_bits": 0,
                "n_runs": 0, "mean_run": 0.0, "sorted_frac": 1.0,
                "distinct": 0}
    v64 = v.astype(np.int64, copy=False)
    vmin, vmax = int(v64.min()), int(v64.max())
    d = np.diff(v64)
    n_runs = 1 + int(np.count_nonzero(d))
    return {
        "n": n,
        "min": vmin,
        "max": vmax,
        "range_bits": int(vmax - vmin).bit_length(),
        "n_runs": n_runs,
        "mean_run": n / n_runs,
        "sorted_frac": float(np.mean(d >= 0)) if len(d) else 1.0,
        "distinct": int(len(np.unique(v64))),
    }
