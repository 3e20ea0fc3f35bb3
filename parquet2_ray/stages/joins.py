"""Temporal joins Ray Data doesn't ship: as-of join and range join.

The reference is a single-file codec library with no joins (SURVEY.md
§2.7); these are the event-pipeline operators, built on ONE co-
partitioning exchange each:

* ``asof_join``: both sides are tagged, schema-harmonized and unioned,
  then a single ``groupby(hash(key) % nshards)`` co-locates each key's
  rows from BOTH sides on one task; inside the shard a single
  ``pd.merge_asof`` (C kernel, ``by=key``) matches every left row to
  the latest right row with ``right.ts <= left.ts``.  Only the two
  projected sides cross the exchange — never a pair blow-up.

* ``range_join``: each left row expands to the (≤2) time buckets its
  window [ts+lo, ts+hi) can reach (bucket width = hi−lo); right rows
  carry their own bucket.  One groupby on ``hash(key, bucket)`` co-
  locates candidates, an in-shard sorted merge emits exact matches.
  Every (left, right) pair appears exactly once: the right row has ONE
  bucket and the left row references that bucket at most once.

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
import ray.data as rd

__all__ = ["asof_join", "range_join"]

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _shard_of(keys: np.ndarray, nshards: int) -> np.ndarray:
    h = keys.astype(np.uint64) * _GOLDEN
    return ((h >> np.uint64(33)) % np.uint64(nshards)).astype(np.int64)


def _ts_us_np(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_timestamp(t):
        if t.unit != "us":
            col = col.cast(pa.timestamp("us"))
        col = col.view(pa.int64())
    return col.to_numpy(zero_copy_only=False)


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
    unspecified (same as SQL engines) — dedupe upstream if that matters.
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

    def _finish(t: pa.Table, side: int) -> pa.Table:
        t = t.select(out_cols)
        return (t.append_column("_side", pa.array(
                    np.full(t.num_rows, side, dtype=np.int8)))
                 .append_column("_shard", pa.array(_shard_of(
                    t[by].combine_chunks().to_numpy(zero_copy_only=False),
                    nshards))))

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

    def merge(group: pa.Table) -> pd.DataFrame:
        df = group.drop_columns(["_shard"]).to_pandas()
        l = df[df["_side"] == 0].drop(columns=["_side", *out_rcols])
        r = df[df["_side"] == 1][[by, on, *out_rcols]]
        if not len(l):
            return df.iloc[0:0][out_cols]
        if not len(r):
            m = l.reindex(columns=out_cols)
            return m if how == "left" else m.iloc[0:0]
        m = pd.merge_asof(l.sort_values(on), r.sort_values(on),
                          on=on, by=by, direction="backward")
        if how == "inner":
            m = m[m[f"{on}{suffix}"].notna()]
        return m[out_cols]

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
    already filtered to candidates sharing (key, bucket).
    """
    if hi_s <= lo_s:
        raise ValueError("hi_s must be > lo_s")
    lo_us = np.int64(lo_s) * 1_000_000
    hi_us = np.int64(hi_s) * 1_000_000
    w = hi_us - lo_us

    def _shard2(keys, buckets):
        h = (keys.astype(np.uint64) * _GOLDEN) ^ (
            buckets.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
        return (((h >> np.uint64(29)) * _GOLDEN >> np.uint64(33))
                % np.uint64(nshards)).astype(np.int64)

    def prep_left(b: pa.Table) -> pa.Table:
        ts = _ts_us_np(b[on])
        keys = b[by].combine_chunks().to_numpy(zero_copy_only=False)
        ids = b[left_id].combine_chunks().to_numpy(zero_copy_only=False)
        b0 = (ts + lo_us) // w
        b1 = (ts + hi_us - 1) // w          # hi exclusive
        n2 = b1 != b0
        kk = np.r_[keys, keys[n2]]
        tt = np.r_[ts, ts[n2]]
        ii = np.r_[ids, ids[n2]]
        bb = np.r_[b0, b1[n2]]
        return pa.table({
            by: pa.array(kk), "_id": pa.array(ii),
            "_ts": pa.array(tt, type=pa.int64()),
            "_bkt": pa.array(bb, type=pa.int64()),
            "_side": pa.array(np.zeros(len(kk), dtype=np.int8)),
            "_shard": pa.array(_shard2(kk, bb)),
        })

    def prep_right(b: pa.Table) -> pa.Table:
        ts = _ts_us_np(b[on])
        keys = b[by].combine_chunks().to_numpy(zero_copy_only=False)
        ids = b[right_id].combine_chunks().to_numpy(zero_copy_only=False)
        bb = ts // w
        return pa.table({
            by: pa.array(keys), "_id": pa.array(ids),
            "_ts": pa.array(ts, type=pa.int64()),
            "_bkt": pa.array(bb, type=pa.int64()),
            "_side": pa.array(np.ones(len(keys), dtype=np.int8)),
            "_shard": pa.array(_shard2(keys, bb)),
        })

    def merge(group: pa.Table) -> pa.Table:
        side = group["_side"].combine_chunks().to_numpy(zero_copy_only=False)
        keys = group[by].combine_chunks().to_numpy(zero_copy_only=False)
        ids = group["_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = group["_ts"].combine_chunks().to_numpy(zero_copy_only=False)
        bkt = group["_bkt"].combine_chunks().to_numpy(zero_copy_only=False)
        lm, rm = side == 0, side == 1
        empty = pa.table({
            by: pa.nulls(0, group[by].type),
            "l_id": pa.nulls(0, group["_id"].type),
            "r_id": pa.nulls(0, group["_id"].type),
            "l_ts_us": pa.nulls(0, pa.int64()),
            "r_ts_us": pa.nulls(0, pa.int64()),
        })
        if not lm.any() or not rm.any():
            return empty
        ldf = pd.DataFrame({by: keys[lm], "_bkt": bkt[lm],
                            "l_id": ids[lm], "l_ts_us": ts[lm]})
        rdf = pd.DataFrame({by: keys[rm], "_bkt": bkt[rm],
                            "r_id": ids[rm], "r_ts_us": ts[rm]})
        m = ldf.merge(rdf, on=[by, "_bkt"])
        if not len(m):
            return empty
        d = m["r_ts_us"].to_numpy() - m["l_ts_us"].to_numpy()
        m = m[(d >= lo_us) & (d < hi_us)]
        return pa.table({
            by: pa.array(m[by].to_numpy()),
            "l_id": pa.array(m["l_id"].to_numpy()),
            "r_id": pa.array(m["r_id"].to_numpy()),
            "l_ts_us": pa.array(m["l_ts_us"].to_numpy(), type=pa.int64()),
            "r_ts_us": pa.array(m["r_ts_us"].to_numpy(), type=pa.int64()),
        })

    u = (left.map_batches(prep_left, batch_format="pyarrow")
             .union(right.map_batches(prep_right, batch_format="pyarrow")))
    return u.groupby("_shard").map_groups(merge, batch_format="pyarrow")
