"""Temporal joins Ray Data doesn't ship: as-of join and range join.

The reference is a single-file codec library with no joins (SURVEY.md
§2.7); these are the event-pipeline operators, built on ONE co-
partitioning exchange each:

* ``asof_join``: both sides are tagged, schema-harmonized and unioned,
  then a single ``groupby(hash(key) % nshards)`` co-locates each key's
  rows from BOTH sides on one task; inside the shard, ``pd.merge_asof``
  (C kernel, ``by=key``) runs over ROW-INDEX frames only, and the
  output columns are built with Arrow ``take`` — values never pass
  through pandas, so 64-bit ids survive bit-exact (pandas would coerce
  null-bearing int64 to float64 and corrupt ids above 2^53) and every
  shard emits the same Arrow schema, matched or not.

* ``range_join``: each left row expands to the (≤2) time buckets its
  window [ts+lo, ts+hi) can reach (bucket width = hi−lo); right rows
  carry their own bucket.  One groupby on ``hash(key, bucket)`` co-
  locates candidates; an in-shard index merge + exact interval filter
  emits matches via Arrow ``take``.  Every (left, right) pair appears
  exactly once: the right row has ONE bucket and the left row
  references that bucket at most once.

NULL semantics follow SQL: rows whose join key (``by`` or ``on``) is
NULL never match (inner drops them; as-of ``how='left'`` keeps the left
row with a null right side).  Keys must be integers (the shard hash is
integer mixing); payload columns may be anything Arrow can ``take``.

Partitioning assumption (documented per the custom-operator contract):
one shard must fit a worker heap — shards hold ~(rows_left + rows_right)
/ nshards rows; raise ``nshards`` with corpus size.  Hot keys salt
naturally for ``range_join`` (bucket is part of the shuffle key); for
``asof_join`` a single pathological key still lands on one shard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.hashing import shard_of

__all__ = ["asof_join", "range_join"]


def _ts_us_np(col) -> np.ndarray:
    """int64-microsecond view of a (null-free) timestamp/int column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_timestamp(t):
        if t.unit != "us":
            col = col.cast(pa.timestamp("us"))
        col = col.view(pa.int64())
    return col.to_numpy(zero_copy_only=False)


def _np_key(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def _valid_keys(t: pa.Table, by: str, on: str) -> pa.ChunkedArray:
    return pc.and_(pc.is_valid(t[by]), pc.is_valid(t[on]))


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str = "ts",
    by: str = "user_id",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    how: str = "inner",
    nshards: int = 64,
) -> rd.Dataset:
    """For each left row, the single right row of the same ``by`` key
    with the greatest ``on`` ≤ left's ``on`` (backward as-of, exact
    matches allowed — DuckDB ``ASOF JOIN`` semantics).  ``how='left'``
    keeps unmatched left rows with nulls.  Right value columns are
    suffixed; the matched right timestamp is emitted as ``{on}{suffix}``.

    When two right rows share an exact (by, on) pair the winner is
    unspecified (same as SQL engines) — dedupe upstream if a
    deterministic winner matters (e.g. keep max id per (by, on)).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    lcols = left_cols or list(left.columns())
    if by not in lcols or on not in lcols:
        raise ValueError(f"left_cols must include {by!r} and {on!r}")
    rvals = [c for c in (right_cols or right.columns()) if c not in (by, on)]
    out_rcols = [f"{on}{suffix}"] + [f"{c}{suffix}" for c in rvals]
    out_cols = lcols + out_rcols

    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    # the unioned exchange needs ONE schema: lcols + out_rcols, the
    # missing side's columns carried as typed nulls
    rtype = {f"{on}{suffix}": rschema.field(on).type,
             **{f"{c}{suffix}": rschema.field(c).type for c in rvals}}
    ltype = {c: lschema.field(c).type for c in lcols}
    out_type = {**ltype, **rtype}

    def _empty() -> pa.Table:
        return pa.table({c: pa.nulls(0, out_type[c]) for c in out_cols})

    def _finish(t: pa.Table, side: int) -> pa.Table:
        t = t.select(out_cols)
        # null keys can't hash — fill IN ARROW (a numpy fill would
        # coerce the whole column to float64 and reshard large ids);
        # shard 0 rows are key-filtered again at merge
        keys = pc.fill_null(t[by], 0).combine_chunks().to_numpy(
            zero_copy_only=False)
        return (t.append_column("_side", pa.array(
                    np.full(t.num_rows, side, dtype=np.int8)))
                 .append_column("_shard", pa.array(shard_of(keys, nshards))))

    def prep_left(b: pa.Table) -> pa.Table:
        b = b.select(lcols)
        for name in out_rcols:
            b = b.append_column(name, pa.nulls(b.num_rows, rtype[name]))
        return _finish(b, 0)

    def prep_right(b: pa.Table) -> pa.Table:
        out = {by: b[by], on: b[on], f"{on}{suffix}": b[on]}
        for c in rvals:
            out[f"{c}{suffix}"] = b[c]
        t = pa.table(out)
        for c in lcols:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(t.num_rows, ltype[c]))
        return _finish(t, 1)

    def merge(group: pa.Table) -> pa.Table:
        lmask = pc.equal(group["_side"], 0)
        lt = group.filter(lmask).select(out_cols)
        rt = group.filter(pc.invert(lmask)).select([by, on, *out_rcols])
        if lt.num_rows == 0:
            return _empty()
        # SQL NULL-key semantics: null by/on never matches
        lvalid = _valid_keys(lt, by, on)
        rt = rt.filter(_valid_keys(rt, by, on))
        lt_v = lt.filter(lvalid)
        lt_null = lt.filter(pc.invert(lvalid))

        pieces = []
        if lt_v.num_rows:
            li = np.arange(lt_v.num_rows, dtype=np.int64)
            if rt.num_rows:
                lf = pd.DataFrame({by: _np_key(lt_v[by]),
                                   on: _ts_us_np(lt_v[on]), "_li": li})
                rf = pd.DataFrame({by: _np_key(rt[by]),
                                   on: _ts_us_np(rt[on]),
                                   "_ri": np.arange(rt.num_rows,
                                                    dtype=np.int64)})
                m = pd.merge_asof(lf.sort_values(on), rf.sort_values(on),
                                  on=on, by=by, direction="backward")
                li = m["_li"].to_numpy()
                ri = m["_ri"].to_numpy()          # float64, NaN = no match
                matched = ~np.isnan(ri)
            else:
                ri = np.full(lt_v.num_rows, np.nan)
                matched = np.zeros(lt_v.num_rows, dtype=bool)
            if how == "inner":
                li, ri, matched = li[matched], ri[matched], None
            take_l = pa.array(li.astype(np.int64))
            if matched is None:
                take_r = pa.array(ri.astype(np.int64))
            else:  # null index → null output row (typed, not NaN)
                take_r = pa.array(
                    np.where(matched, ri, 0).astype(np.int64),
                    mask=~matched)
            cols = {c: pc.take(lt_v[c], take_l) for c in lcols}
            rsel = rt.select(out_rcols)
            cols.update({c: pc.take(rsel[c], take_r) for c in out_rcols})
            pieces.append(pa.table(cols))
        if how == "left" and lt_null.num_rows:
            t = lt_null.select(lcols)
            for c in out_rcols:
                t = t.append_column(c, pa.nulls(t.num_rows, rtype[c]))
            pieces.append(t)
        if not pieces:
            return _empty()
        return pa.concat_tables(pieces) if len(pieces) > 1 else pieces[0]

    u = (left.map_batches(prep_left, batch_format="pyarrow")
             .union(right.map_batches(prep_right, batch_format="pyarrow")))
    return u.groupby("_shard").map_groups(merge, batch_format="pyarrow")


def range_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str = "ts",
    by: str = "user_id",
    lo_s: int = -86_400,
    hi_s: int = 0,
    left_id: str = "event_id",
    right_id: str = "event_id",
    nshards: int = 64,
) -> rd.Dataset:
    """All (left, right) pairs of the same ``by`` key with
    ``left.on + lo_s <= right.on < left.on + hi_s`` (seconds, half-open).
    Output: (by, ``l_id``, ``r_id``, ``l_ts_us``, ``r_ts_us``).

    Bucket width = window span, so each left row lands in ≤2 buckets
    and each right row in exactly 1 — the exchange carries O(2·|L|+|R|)
    rows; the quadratic pair set only ever exists inside a shard task,
    already filtered to candidates sharing (key, bucket).  Rows with a
    NULL key or timestamp never match (SQL inner-join semantics); id
    payloads may be null and pass through Arrow-typed.
    """
    if hi_s <= lo_s:
        raise ValueError("hi_s must be > lo_s")
    lo_us = np.int64(lo_s) * 1_000_000
    hi_us = np.int64(hi_s) * 1_000_000
    w = hi_us - lo_us

    def _shard2(keys, buckets):
        h = (keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ (
            buckets.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
        return (((h >> np.uint64(29)) * np.uint64(0x9E3779B97F4A7C15)
                 >> np.uint64(33)) % np.uint64(nshards)).astype(np.int64)

    def _prep(b: pa.Table, id_col: str, side: int) -> pa.Table:
        b = b.filter(_valid_keys(b, by, on))  # NULL keys never match
        ts = _ts_us_np(b[on])
        keys = _np_key(b[by])
        ids = b[id_col].combine_chunks() if isinstance(
            b[id_col], pa.ChunkedArray) else b[id_col]
        if side == 0:
            b0 = (ts + lo_us) // w
            b1 = (ts + hi_us - 1) // w      # hi exclusive
            n2 = b1 != b0
            idx = np.r_[np.arange(len(ts)), np.flatnonzero(n2)]
            kk = keys[idx]
            tt = ts[idx]
            ii = pc.take(ids, pa.array(idx))
            bb = np.r_[b0, b1[n2]]
        else:
            kk, tt, ii, bb = keys, ts, ids, ts // w
        return pa.table({
            by: pa.array(kk), "_id": ii,
            "_ts": pa.array(tt, type=pa.int64()),
            "_bkt": pa.array(bb, type=pa.int64()),
            "_side": pa.array(np.full(len(kk), side, dtype=np.int8)),
            "_shard": pa.array(_shard2(kk, bb)),
        })

    def merge(group: pa.Table) -> pa.Table:
        lmask = pc.equal(group["_side"], 0)
        lt = group.filter(lmask)
        rt = group.filter(pc.invert(lmask))
        empty = pa.table({
            by: pa.nulls(0, group[by].type),
            "l_id": pa.nulls(0, group["_id"].type),
            "r_id": pa.nulls(0, group["_id"].type),
            "l_ts_us": pa.nulls(0, pa.int64()),
            "r_ts_us": pa.nulls(0, pa.int64()),
        })
        if lt.num_rows == 0 or rt.num_rows == 0:
            return empty
        lf = pd.DataFrame({by: _np_key(lt[by]),
                           "_bkt": _np_key(lt["_bkt"]),
                           "_li": np.arange(lt.num_rows, dtype=np.int64)})
        rf = pd.DataFrame({by: _np_key(rt[by]),
                           "_bkt": _np_key(rt["_bkt"]),
                           "_ri": np.arange(rt.num_rows, dtype=np.int64)})
        m = lf.merge(rf, on=[by, "_bkt"])
        if not len(m):
            return empty
        li = m["_li"].to_numpy()
        ri = m["_ri"].to_numpy()
        lts = _np_key(lt["_ts"])[li]
        rts = _np_key(rt["_ts"])[ri]
        d = rts - lts
        keep = (d >= lo_us) & (d < hi_us)
        li, ri = li[keep], ri[keep]
        tl, tr = pa.array(li), pa.array(ri)
        return pa.table({
            by: pc.take(lt[by], tl),
            "l_id": pc.take(lt["_id"], tl),
            "r_id": pc.take(rt["_id"], tr),
            "l_ts_us": pc.take(lt["_ts"], tl),
            "r_ts_us": pc.take(rt["_ts"], tr),
        })

    u = (left.map_batches(lambda b: _prep(b, left_id, 0),
                          batch_format="pyarrow")
             .union(right.map_batches(lambda b: _prep(b, right_id, 1),
                                      batch_format="pyarrow")))
    return u.groupby("_shard").map_groups(merge, batch_format="pyarrow")
