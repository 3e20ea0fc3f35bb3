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
``asof_join`` pass ``salt_buckets=n`` to time-bucket pathological keys
(see the docstring) — otherwise a single hot key lands on one shard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.hashing import shard_of

__all__ = ["asof_join", "range_join"]


def _ts_us_np(col, fill: int | None = None) -> np.ndarray:
    """int64-microsecond view of a timestamp/int column.  Null-free
    input unless ``fill`` is given (applied AFTER the int64 view, so
    the fill value is always interpreted as microseconds)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_timestamp(t):
        if t.unit != "us":
            col = col.cast(pa.timestamp("us"))
        col = col.view(pa.int64())
    if fill is not None:
        col = pc.fill_null(col, fill)
    return col.to_numpy(zero_copy_only=False)


def _np_key(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def _valid_keys(t: pa.Table, by: str, on: str) -> pa.ChunkedArray:
    return pc.and_(pc.is_valid(t[by]), pc.is_valid(t[on]))


_GOLD = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _mix2_shard(keys: np.ndarray, buckets: np.ndarray,
                nshards: int) -> np.ndarray:
    """Shard hash over a (key, bucket) pair — the salted twin of
    ``shard_of``; every operator that co-locates on (key, bucket)
    agrees on this one definition."""
    h = (keys.astype(np.uint64) * _GOLD) ^ (
        buckets.astype(np.uint64) * _MIX2)
    return (((h >> np.uint64(29)) * _GOLD >> np.uint64(33))
            % np.uint64(nshards)).astype(np.int64)


def _scalar_us(v) -> int:
    """int64-microsecond value of an aggregate result (int or
    timestamp-like)."""
    if isinstance(v, (int, np.integer)):
        return int(v)
    return pa.scalar(v).cast(pa.timestamp("us")).cast(pa.int64()).as_py()


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
    salt_buckets: int | None = None,
    hot_threshold: int | None = None,
) -> rd.Dataset:
    """For each left row, the single right row of the same ``by`` key
    with the greatest ``on`` ≤ left's ``on`` (backward as-of, exact
    matches allowed — DuckDB ``ASOF JOIN`` semantics).  ``how='left'``
    keeps unmatched left rows with nulls.  Right value columns are
    suffixed; the matched right timestamp is emitted as ``{on}{suffix}``.

    When two right rows share an exact (by, on) pair the winner is
    unspecified (same as SQL engines) — dedupe upstream if a
    deterministic winner matters (e.g. keep max id per (by, on)).

    Hot-key salting (``salt_buckets=n``): a pathological key (one user
    = half the corpus) otherwise lands every one of its rows on a
    single shard.  With salting enabled the operator first counts rows
    per key (map-combined groupby — the hot key shrinks to one row per
    block) and gathers only keys above ``hot_threshold`` (default
    ``total_rows // nshards``; by pigeonhole at most ``~2·nshards``
    keys can exceed it, so the driver set is provably tiny).  Hot-key
    rows are then routed by ``(key, time_bucket)`` — the ``on`` range
    of the LEFT side split into ``n`` equal buckets — while every
    other key keeps the plain ``shard_of`` route in the SAME exchange.
    Backward as-of stays exact because each hot key's latest right row
    *before* each bucket is replicated into that bucket as a carry
    (O(n) rows per hot key); a left row's true match is either in its
    own bucket or is exactly that carry.  Cost: two extra column-
    projected scans (key counts; left min/max of ``on``).
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

    # ---- hot-key salting setup (eager, BEFORE any map_batches closure
    # is built, so the captured tmin/width/hot set are final values) ----
    nsalt = int(salt_buckets) if salt_buckets else 1
    hot_sorted = None
    tmin = width = 0
    if nsalt > 1:
        # materialize the tiny distinct-key table ONCE: both the total
        # (threshold denominator) and the hot filter read it, and the
        # alternative — left.count() + right.count() — re-executes both
        # full input lineages just for a scalar
        keyed = (left.select_columns([by])
                     .union(right.select_columns([by]))
                     .groupby(by).count()
                     .materialize())
        cname = next(c for c in keyed.columns() if c != by)
        if hot_threshold is not None:
            thresh = int(hot_threshold)
        else:
            thresh = max(int(keyed.sum(cname) or 0) // nshards, 1)

        def _hot_only(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater(t[cname], thresh)).select([by])

        hot_rows = keyed.map_batches(
            _hot_only, batch_format="pyarrow").take_all()
        # null keys hash as 0 in _finish — fold a hot null group into
        # key 0 (sorted() over a None-bearing list would raise)
        hot = np.unique(np.array(
            [0 if r[by] is None else r[by] for r in hot_rows],
            dtype=np.int64))
        if hot.size:
            from ray.data.aggregate import Max, Min
            mm = left.select_columns([on]).aggregate(Min(on), Max(on))
            # Dataset.aggregate returns None for an EMPTY dataset —
            # guard before subscripting
            lo = mm[f"min({on})"] if mm else None
            hi = mm[f"max({on})"] if mm else None
            if lo is None or hi is None:
                hot = hot[:0]           # empty left: salting is moot
            else:
                tmin = _scalar_us(lo)
                width = max((_scalar_us(hi) - tmin) // nsalt + 1, 1)
        if hot.size:
            hot_sorted = hot
        else:
            nsalt = 1

    def _is_hot(keys: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(hot_sorted, keys)
        return (pos < hot_sorted.size) & (
            hot_sorted[np.minimum(pos, hot_sorted.size - 1)] == keys)

    def _bucket_us(col) -> np.ndarray:
        # reuse the shared timestamp→int64-us conversion; null times
        # (key-filtered again at merge) land in bucket 0 via the fill
        ts = _ts_us_np(col, fill=tmin)
        return np.clip((ts.astype(np.int64) - tmin) // width, 0, nsalt - 1)

    def _finish(t: pa.Table, side: int) -> pa.Table:
        t = t.select(out_cols)
        # null keys can't hash — fill IN ARROW (a numpy fill would
        # coerce the whole column to float64 and reshard large ids);
        # shard 0 rows are key-filtered again at merge
        keys = pc.fill_null(t[by], 0).combine_chunks().to_numpy(
            zero_copy_only=False)
        sh = shard_of(keys, nshards)
        if nsalt > 1:
            ishot = _is_hot(keys)
            if ishot.any():
                bkt = _bucket_us(t[on])
                sh = np.where(ishot, _mix2_shard(keys, bkt, nshards), sh)
        return (t.append_column("_side", pa.array(
                    np.full(t.num_rows, side, dtype=np.int8)))
                 .append_column("_shard", pa.array(sh)))

    def prep_left(b: pa.Table) -> pa.Table:
        b = b.select(lcols)
        for name in out_rcols:
            b = b.append_column(name, pa.nulls(b.num_rows, rtype[name]))
        return _finish(b, 0)

    def _harmonize_right(b: pa.Table) -> pa.Table:
        out = {by: b[by], on: b[on], f"{on}{suffix}": b[on]}
        for c in rvals:
            out[f"{c}{suffix}"] = b[c]
        t = pa.table(out)
        for c in lcols:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(t.num_rows, ltype[c]))
        return t

    def prep_right(b: pa.Table) -> pa.Table:
        return _finish(_harmonize_right(b), 1)

    def cand_right(b: pa.Table) -> pa.Table:
        # per-batch partial: each hot (key, bucket)'s max-`on` right
        # row survives — carries are built from these winners only, so
        # the carry groupby exchanges O(hot_keys × nsalt) rows per block
        t = _harmonize_right(b).select(out_cols)
        t = t.filter(_valid_keys(t, by, on))
        if t.num_rows:
            t = t.filter(pa.array(_is_hot(_np_key(t[by]))))
        if t.num_rows == 0:
            return t.append_column("_bkt", pa.nulls(0, pa.int64()))
        keys = _np_key(t[by])
        ts = _ts_us_np(t[on])
        bkt = _bucket_us(t[on])
        order = np.lexsort((ts, bkt, keys))
        k_s, b_s = keys[order], bkt[order]
        last = np.r_[(k_s[1:] != k_s[:-1]) | (b_s[1:] != b_s[:-1]), True]
        win = order[last]
        return (t.take(pa.array(win))
                 .append_column("_bkt", pa.array(bkt[win], type=pa.int64())))

    def expand_carries(g: pa.Table) -> pa.Table:
        # one hot key's per-block bucket winners: emit, for every later
        # bucket b, the latest winner strictly before b — the right row
        # a left row in b falls back to when its own bucket has no
        # earlier-or-equal right row.  ≤ nsalt-1 rows per hot key out.
        keys = _np_key(g[by])
        ts = _ts_us_np(g[on])
        bkt = _np_key(g["_bkt"])
        order = np.lexsort((ts, bkt, keys))
        k_s = keys[order]
        segs = np.r_[0, np.flatnonzero(k_s[1:] != k_s[:-1]) + 1, k_s.size]
        idx_parts, bkt_parts = [], []
        for s, e in zip(segs[:-1], segs[1:]):
            seg = order[s:e]
            sb, st = bkt[seg], ts[seg]
            lastb = np.r_[sb[1:] != sb[:-1], True]
            ub = sb[lastb]               # unique buckets, ascending
            best = seg[lastb]            # each bucket's max-ts row
            targets = np.arange(ub[0] + 1, nsalt, dtype=np.int64)
            if targets.size == 0:
                continue
            # bucket(ts) is monotone in ts, so the running best is the
            # latest bucket's winner; running argmax kept for clip edges
            bt = st[lastb]
            newmax = bt >= np.maximum.accumulate(bt)
            fidx = np.maximum.accumulate(
                np.where(newmax, np.arange(bt.size), -1))
            runbest = best[fidx]
            j = np.searchsorted(ub, targets, side="left") - 1
            idx_parts.append(runbest[j])
            bkt_parts.append(targets)
        take = (np.concatenate(idx_parts) if idx_parts
                else np.empty(0, dtype=np.int64))
        bk2 = (np.concatenate(bkt_parts) if bkt_parts
               else np.empty(0, dtype=np.int64))
        out = g.select(out_cols).take(pa.array(take, type=pa.int64()))
        sh = _mix2_shard(keys[take], bk2, nshards)
        return (out.append_column("_side", pa.array(
                    np.ones(take.size, dtype=np.int8)))
                   .append_column("_shard", pa.array(sh)))

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
    if nsalt > 1:
        carries = (right.map_batches(cand_right, batch_format="pyarrow")
                        .groupby(by)
                        .map_groups(expand_carries, batch_format="pyarrow"))
        u = u.union(carries)
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
            "_shard": pa.array(_mix2_shard(kk, bb, nshards)),
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
