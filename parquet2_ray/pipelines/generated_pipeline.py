"""Generated (computed) columns for a container (P74).

The Delta "generated columns" shape: a column whose value is DERIVED
from other columns by a declared, engine-enforced expression — the
classic use being an event-time window bucket (``win_start =
floor_time(ts, 86400)``) that the container can cluster on, constraints
can check, and a P70 materialized view can GROUP BY.  With a generated
bucket column, the event-time windowed-aggregate view falls out of the
existing machinery: ``create_agg_view(key="win_start")`` + CDC refresh
IS the streaming windowed aggregate, late arrivals included (a late
append touches its window's group, and the refresh re-aggregates
exactly that group).

The expression language is a tiny JSON-serializable spec — not Python
callables, so every ingest path (local or a different driver) computes
the identical value and a DuckDB twin exists for oracles:

    ["floor_div",  src, n]   — (src // n) * n          (int bucket)
    ["floor_time", src, s]   — (epoch_secs(src)//s)*s  (time bucket)
    ["mod",        src, n]   — src % n                 (int shard)
    ["lower",      src]      — lowercase utf8
    ["length",     src]      — utf8 length

Specs persist in ``_manifest/generated.json``.  Every ingest path
(``append_dataset``, ``upsert_rows``) applies them to the increment
BEFORE planning — the generated value always OVERWRITES any
caller-supplied column of the same name (derived truth, no drift).
Retro-declaring on a populated container is allowed only when the
column already exists and a distributed validation pass proves every
stored value matches the spec; otherwise it refuses (re-encode to
backfill).

Nulls propagate (a null source yields a null generated value — SQL
semantics).  ``floor_div``/``floor_time`` floor toward −∞ (numpy ``//``),
matching DuckDB's integer division for the non-negative domain and
its ``time_bucket`` for epochs ≥ 0.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state import fsio
from ..state import manifest as mf

__all__ = [
    "set_generated",
    "get_generated",
    "apply_generated",
    "generated_sql",
]

_OPS = ("floor_div", "floor_time", "mod", "lower", "length")


def _path(out_dir: str) -> str:
    return mf.manifest_dir(out_dir).rstrip("/") + "/generated.json"


def _check_spec(name: str, spec) -> list:
    spec = list(spec)
    if not spec or spec[0] not in _OPS:
        raise ValueError(f"generated column {name!r}: unknown op "
                         f"{spec[:1]}; one of {_OPS}")
    op = spec[0]
    if op in ("floor_div", "floor_time", "mod"):
        if len(spec) != 3 or int(spec[2]) <= 0:
            raise ValueError(
                f"generated column {name!r}: {op} needs "
                "[op, src, positive_int]")
        spec[2] = int(spec[2])
    elif len(spec) != 2:
        raise ValueError(f"generated column {name!r}: {op} needs "
                         "[op, src]")
    return spec


def _compute(spec: list, col: pa.ChunkedArray | pa.Array) -> pa.Array:
    op, src = spec[0], spec[1]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if op == "lower":
        return pc.utf8_lower(col)
    if op == "length":
        return pc.utf8_length(col).cast(pa.int64())
    n = np.int64(spec[2])
    unit_div = np.int64(1)
    if op == "floor_time":
        # sub-second timestamps floor via integer division in the
        # column's NATIVE unit (a safe cast to timestamp[s] would
        # raise on any non-whole-second value); // floors toward -inf,
        # matching DuckDB's floor(epoch(ts))
        t = col.type
        if pa.types.is_timestamp(t):
            unit_div = np.int64(
                {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[t.unit])
        col = col.cast(pa.int64())
    else:
        # floor_div/mod are integer ops; a float source would hit
        # numpy-truncation-vs-SQL-rounding divergence from the
        # generated_sql oracle, so reject it loudly (ADVICE r4)
        if not (pa.types.is_integer(col.type)
                or pa.types.is_timestamp(col.type)):
            raise TypeError(
                f"generated column op {op!r} needs an integer or "
                f"timestamp source, got {col.type}")
        col = col.cast(pa.int64())
    vals = col.to_numpy(zero_copy_only=False)
    mask = col.is_null().to_numpy(zero_copy_only=False) \
        if col.null_count else None
    # nulls surface as NaN in the numpy view (masked out below)
    safe = np.where(np.isnan(vals), 0, vals) if vals.dtype.kind == "f" \
        else vals
    safe = safe.astype(np.int64)
    if unit_div > 1:
        safe = safe // unit_div
    if op == "mod":
        out = safe % n
    else:
        out = (safe // n) * n
    return pa.array(out, pa.int64(), mask=mask)


def apply_generated(batch: pa.Table, specs: dict[str, list]) -> pa.Table:
    """Compute every generated column over one batch; a generated name
    already present is OVERWRITTEN (derived truth)."""
    for name, spec in specs.items():
        src = spec[1]
        if src not in batch.column_names:
            raise KeyError(
                f"generated column {name!r} needs source column "
                f"{src!r}; batch has {batch.column_names}")
        arr = _compute(spec, batch[src])
        if name in batch.column_names:
            batch = batch.set_column(
                batch.column_names.index(name), name, arr)
        else:
            batch = batch.append_column(name, arr)
    return batch


def get_generated(out_dir: str) -> dict[str, list]:
    p = _path(out_dir)
    if not fsio.exists(p):
        return {}
    return json.loads(fsio.read_bytes(p))


def set_generated(out_dir: str, generated: dict[str, list],
                  validate: bool = True) -> dict:
    """Declare the container's generated columns.  On a container that
    already holds data, every declared column must already exist and
    match its spec (validated distributed) — declare before the first
    append to avoid the backfill question entirely."""
    specs = {name: _check_spec(name, s) for name, s in
             generated.items()}
    fsio.ensure_dir(out_dir)
    mf.manifest_dir(out_dir)
    records = mf.load_manifest(out_dir)
    if records and validate and specs:
        from .encode_pipeline import decode_dataset

        known = {c for r in records.values()
                 for c in r.get("codecs", {})}
        absent = sorted(n for n in specs if n not in known)
        if absent:
            raise ValueError(
                f"generated column(s) {absent} missing from existing "
                "rows — re-encode to backfill, or declare before the "
                "first append")
        cols = sorted({s[1] for s in specs.values()} | set(specs))
        ds = decode_dataset(out_dir, columns=cols)

        def check(b: pa.Table) -> pa.Table:
            bad = 0
            for name, spec in specs.items():
                if name not in b.column_names:
                    raise ValueError(
                        f"generated column {name!r} missing from "
                        "existing rows — re-encode to backfill")
                have = b[name].combine_chunks()
                want = _compute(spec, b[spec[1]])
                # null == null is a MATCH here (nulls propagate by
                # design, so a stored null against a derived null is
                # exactly what apply_generated wrote)
                eq = pc.equal(have.cast(want.type), want)
                both_null = pc.and_(pc.is_null(have),
                                    pc.is_null(want))
                ok = pc.or_(pc.fill_null(eq, False), both_null)
                bad += int(pc.sum(pc.if_else(ok, 0, 1)).as_py() or 0)
            return pa.table({"bad": pa.array([bad], pa.int64())})

        total_bad = sum(r["bad"] for r in
                        ds.map_batches(check, batch_format="pyarrow")
                        .take_all())
        if total_bad:
            raise ValueError(
                f"{total_bad} existing rows violate the declared "
                "generated-column specs — fix the data or the spec")
    fsio.atomic_write(_path(out_dir),
                      json.dumps(specs).encode(), fsync=False)
    return {"generated": sorted(specs)}


def generated_sql(name: str, spec: list) -> str:
    """DuckDB expression equivalent to the spec (for oracles)."""
    op, src = spec[0], spec[1]
    if op == "lower":
        return f"lower({src}) AS {name}"
    if op == "length":
        return f"CAST(length({src}) AS BIGINT) AS {name}"
    n = int(spec[2])
    if op == "floor_time":
        base = f"CAST(floor(epoch({src})) AS BIGINT)"
    else:
        base = f"CAST({src} AS BIGINT)"
    if op == "mod":
        return f"{base} % {n} AS {name}"
    return f"({base} // {n}) * {n} AS {name}"
