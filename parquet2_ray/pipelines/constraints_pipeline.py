"""Container CHECK constraints / expectations (P65): declared once,
persisted in the container's own metadata, enforced on every ingest
path — the Delta ``ALTER TABLE ADD CONSTRAINT`` / DLT "expectations"
shape.

Constraint shapes (JSON-serializable, validated at declaration):

* ``{"column": c, "op": "not_null"}``
* ``{"column": c, "op": ">" | ">=" | "<" | "<=" | "==" | "!=",
   "value": v}`` — scalar comparison; null rows FAIL a comparison
  constraint only under an explicit ``"null_ok": false`` (default
  true: SQL CHECK semantics — NULL checks pass, use not_null to
  refuse nulls)
* ``{"column": c, "op": "in", "values": [...]}``
* ``{"column": c, "op": "unique"}`` — increment-internal uniqueness
  plus an exact anti-check against the container (bloom/range-pruned
  ``lookup_rows`` probe, so the container side costs O(increment)
  reads, never a scan)

Enforcement points: ``append_dataset`` and ``upsert_rows`` validate
the increment (vectorized, per batch, streamed — violations abort
BEFORE the claim/stage step, so nothing is reserved or staged);
``update_rows`` validates its scalar SET values driver-side (a
callable SET is checked per partition after assignment).  Declaration
validates the existing container retroactively by default
(``validate=False`` skips — the Delta ``NOT ENFORCED`` escape).

Scale: validation is a pure map over the increment's batches
(pyarrow.compute kernels, no exchange); ``unique`` adds one pruned
point-lookup per increment.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

from ..state import fsio
from ..state import manifest as mf

__all__ = ["set_constraints", "get_constraints", "drop_constraints",
           "check_table", "check_increment", "ConstraintViolation"]

_OPS = {">": pc.greater, ">=": pc.greater_equal, "<": pc.less,
        "<=": pc.less_equal, "==": pc.equal, "!=": pc.not_equal}


class ConstraintViolation(ValueError):
    """An increment (or the container itself) violates a declared
    constraint; carries the per-constraint violation counts."""

    def __init__(self, msg: str, counts: dict):
        super().__init__(msg)
        self.counts = counts


def _path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest", "constraints.json")


def _validate_shape(c: dict) -> dict:
    if not isinstance(c, dict) or "column" not in c or "op" not in c:
        raise ValueError(f"constraint needs column+op: {c!r}")
    op = c["op"]
    if op in _OPS:
        if "value" not in c:
            raise ValueError(f"comparison constraint needs value: {c!r}")
    elif op == "in":
        if not c.get("values"):
            raise ValueError(f"in-constraint needs non-empty values: {c!r}")
    elif op not in ("not_null", "unique"):
        raise ValueError(f"unknown constraint op {op!r}")
    return c


def _label(c: dict) -> str:
    op = c["op"]
    if op in _OPS:
        return f"{c['column']} {op} {c['value']!r}"
    if op == "in":
        return f"{c['column']} in {c['values']!r}"
    return f"{c['column']} {op}"


def get_constraints(out_dir: str) -> list[dict]:
    p = _path(out_dir)
    if not fsio.exists(p):
        return []
    return json.loads(fsio.read_bytes(p))


def set_constraints(out_dir: str, constraints: list[dict],
                    validate: bool = True, fsync: bool = True) -> dict:
    """Declare (replace) the container's constraint set.  With
    ``validate`` (default) the EXISTING rows are checked first —
    declaring a constraint the history already violates would make
    every future append fail for the past's sins."""
    cs = [_validate_shape(dict(c)) for c in constraints]
    if validate and cs:
        records = mf.load_manifest(out_dir)
        if records:
            from .encode_pipeline import decode_dataset

            static = [c for c in cs if c["op"] != "unique"]
            counts: dict[str, int] = {}
            for b in decode_dataset(out_dir).iter_batches(
                    batch_format="pyarrow"):
                for k, v in check_table(b, static).items():
                    counts[k] = counts.get(k, 0) + v
            # container-wide unique: total rows vs distinct groups —
            # one distributed groupby, no driver-side value set
            for c in cs:
                if c["op"] == "unique":
                    ds = decode_dataset(out_dir, columns=[c["column"]])
                    total = ds.count()
                    distinct = ds.groupby(c["column"]).count().count()
                    if total != distinct:
                        counts[_label(c)] = total - distinct
            bad = {k: v for k, v in counts.items() if v}
            if bad:
                raise ConstraintViolation(
                    f"existing rows violate {bad} — fix the data or "
                    "declare with validate=False", bad)
    mf._atomic_write(_path(out_dir),
                     json.dumps(cs, indent=1).encode(), fsync=fsync)
    return {"n_constraints": len(cs), "out_dir": out_dir}


def drop_constraints(out_dir: str) -> dict:
    p = _path(out_dir)
    existed = fsio.exists(p)
    if existed:
        fsio.delete(p)
    return {"dropped": existed, "out_dir": out_dir}


def check_table(tbl: pa.Table, constraints: list[dict]) -> dict:
    """Violation count per constraint label over one batch/table
    (static constraints only — ``unique`` needs increment + container
    context, see check_increment).  A constraint on a column the batch
    lacks counts every row as null-valued (evolution semantics)."""
    counts: dict[str, int] = {}
    for c in constraints:
        col = c["column"]
        lbl = _label(c)
        if col not in tbl.column_names:
            arr = pa.nulls(tbl.num_rows)
        else:
            arr = tbl[col]
        if c["op"] == "not_null":
            bad = arr.null_count if col in tbl.column_names \
                else tbl.num_rows
        elif c["op"] == "in":
            vals = pa.array(c["values"],
                            arr.type if col in tbl.column_names else None)
            ok = pc.is_in(arr, value_set=vals)
            # is_in yields FALSE (not null) for null inputs, so the SQL
            # nulls-pass semantic needs an explicit OR with is_null
            if c.get("null_ok", True):
                ok = pc.or_(ok, pc.is_null(arr))
            bad = int(pc.sum(pc.invert(ok)).as_py() or 0)
        else:
            ok = _OPS[c["op"]](arr, c["value"])
            bad = int(pc.sum(pc.invert(pc.fill_null(ok, c.get(
                "null_ok", True)))).as_py() or 0)
        counts[lbl] = counts.get(lbl, 0) + int(bad)
    return counts


def check_increment(out_dir: str, ds, constraints: list[dict] | None
                    = None) -> None:
    """Enforce the container's constraints on an increment Dataset
    BEFORE anything is reserved or staged.  Static constraints stream
    per batch; ``unique`` checks increment-internal duplicates and
    probes the container exactly (pruned lookup) for collisions.
    Raises ConstraintViolation with per-constraint counts."""
    cs = constraints if constraints is not None else get_constraints(out_dir)
    if not cs:
        return
    static = [c for c in cs if c["op"] != "unique"]
    uniq_cols = [c["column"] for c in cs if c["op"] == "unique"]
    counts: dict[str, int] = {}
    uniq_vals: dict[str, list] = {c: [] for c in uniq_cols}
    for b in ds.iter_batches(batch_format="pyarrow"):
        if static:
            for k, v in check_table(b, static).items():
                counts[k] = counts.get(k, 0) + v
        for c in uniq_cols:
            if c in b.column_names:
                uniq_vals[c].extend(b[c].to_pylist())
    for c in uniq_cols:
        vals = uniq_vals[c]
        lbl = f"{c} unique"
        internal_dup = len(vals) - len(set(vals))
        if internal_dup:
            counts[lbl] = counts.get(lbl, 0) + internal_dup
        if vals and mf.load_manifest(out_dir):
            from .encode_pipeline import lookup_rows

            hits = lookup_rows(out_dir, c, list(set(vals)),
                               columns=[c]).count()
            if hits:
                counts[lbl] = counts.get(lbl, 0) + int(hits)
    bad = {k: v for k, v in counts.items() if v}
    if bad:
        raise ConstraintViolation(
            f"increment violates container constraints: {bad}", bad)
