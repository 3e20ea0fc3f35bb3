"""Incrementally-maintained aggregate materialized view (P70).

The Delta Live Tables / materialized-view shape: a grouped aggregate
of a 100 TB source container, stored as its OWN key-clustered
container, kept current by consuming the source's row-level CDC feed
(P56) instead of recomputing the world:

- ``create_agg_view`` — one full ``aggregate_clustered`` pass (P47:
  shuffle-free on a clustered source), result landed as a container
  sorted + range-bucketed by the group key so later upserts prune by
  min/max, and a view descriptor (source path, key, agg spec, source
  txn cursor) committed beside the manifest.
- ``refresh_agg_view`` — ``row_changes(source, since=cursor)`` names
  the AFFECTED group keys (O(net changes), shared partitions skipped
  unread); the affected groups are re-aggregated straight from the
  source through ``aggregate_clustered(key_values=...)`` — bloom/
  min-max pruned + exactly filtered, O(affected rows) never a scan —
  then applied with one key-atomic ``upsert_rows`` (changed/new
  groups) and one ``delete_rows`` (groups whose last row left the
  source).  The cursor advances only after both commits, so a crash
  anywhere re-runs the same window into the same end state (upsert
  and delete are idempotent) — the same convergence contract as
  ``replicate_container``.

Re-aggregating affected groups from the source (rather than folding
±deltas into the stored values) is deliberate: it is correct for ALL
supported aggregates including min/max (a delta fold cannot retire a
deleted minimum without consulting the source anyway), and its cost is
already O(affected), which is the bound that matters.

Contract notes: the view excludes the NULL group (``create`` drops it,
documented SQL-index-style; null keys never pair in the CDC feed so a
null-group view could not be maintained exactly).  ``_vbucket`` is the
view's encode-clustering helper column (same precedent as P43's
materialized ``__zcluster``); readers who want only the aggregate
project it away.  The reference has no engine layer at all — this is
the §2.10 maintenance family (P55 upsert + P56 CDC + P47 clustered
aggregate) closed into a composition.
"""

from __future__ import annotations

import json
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..state import fsio
from ..state import manifest as mf

__all__ = ["create_agg_view", "refresh_agg_view", "view_status"]

_BUCKET = "_vbucket"
_VKEY = "_vkey"
_SEP = "\x1f"


def _keylist(key) -> list:
    return [key] if isinstance(key, str) else list(key)


def _with_vkey(tbl: pa.Table, keys: list) -> pa.Table:
    """Composite upsert key for multi-key views: the keys' string
    forms joined on an unprintable separator (values containing
    \x1f are out of contract, documented)."""
    parts = [pc.cast(tbl[k].combine_chunks(), pa.string())
             for k in keys]
    vk = parts[0] if len(parts) == 1 else         pc.binary_join_element_wise(*parts, _SEP)
    if _VKEY in tbl.column_names:
        return tbl.set_column(tbl.column_names.index(_VKEY),
                              _VKEY, vk)
    return tbl.append_column(_VKEY, vk)


def _drop_null_keys(tbl: pa.Table, keys: list) -> pa.Table:
    for k in keys:
        if tbl.num_rows and tbl[k].null_count:
            tbl = tbl.filter(pc.is_valid(tbl[k]))
    return tbl


def _view_meta_path(view_dir: str) -> str:
    return mf.manifest_dir(view_dir).rstrip("/") + "/view.json"


def _source_txn(source_dir: str) -> int:
    records = mf.load_manifest(source_dir)
    return max((mf.record_txn(r) for r in records.values()), default=0)


def _view_opts(keys: list, target_rows: int):
    """EncodeOptions for everything written INTO the view container:
    bucket-grouped, sorted by the keys, bloom on the primary — so
    refresh-inserted partitions prune exactly like create-time ones
    (a default-opts upsert would store bloomless partitions and starve
    later pruned reads)."""
    from .encode_pipeline import EncodeOptions

    return EncodeOptions(group_col=_BUCKET, weight_col=None,
                         sort_key=keys, target_rows=target_rows)


def _bucketed(tbl: pa.Table, key, target_rows: int,
              label: str | None = None) -> pa.Table:
    """Sort by the key(s) and attach the encode-clustering bucket
    column."""
    tbl = tbl.sort_by([(k, "ascending") for k in _keylist(key)])
    n = tbl.num_rows
    if label is not None:
        buckets = pa.array([label] * n, pa.string())
    else:
        nparts = max(1, math.ceil(n / target_rows))
        buckets = pa.array(
            [f"b{b:06d}" for b in (np.arange(n) * nparts) // max(n, 1)],
            pa.string())
    return tbl.append_column(_BUCKET, buckets)


def create_agg_view(
    source_dir: str,
    view_dir: str,
    key,
    aggs: dict[str, list[str]],
    target_rows: int = 500_000,
) -> dict:
    """Materialize ``GROUP BY key`` aggregates of the source container
    into ``view_dir``; ``key`` may be one column or a LIST (multi-key
    GROUP BY, P76) — multi-key views add a ``_vkey`` composite helper
    column (string forms joined on \x1f) that serves as the upsert
    key.  Returns ``{"groups": n, "cursor": txn}``."""
    from .container_agg import aggregate_clustered
    from .encode_pipeline import EncodeOptions, encode_dataset

    keys = _keylist(key)
    # cursor BEFORE the aggregate: anything committed between the two
    # reads lands inside the first refresh window instead of being
    # silently skipped (refresh is idempotent, so overlap is safe)
    cursor = _source_txn(source_dir)
    tbl = aggregate_clustered(source_dir, keys, aggs)
    if tbl.num_rows:
        tbl = _drop_null_keys(tbl, keys)  # view excludes null groups
    if tbl.num_rows == 0:
        raise ValueError(f"{source_dir}: aggregate over {key!r} is "
                         "empty — nothing to materialize")
    if len(keys) > 1:
        tbl = _with_vkey(tbl, keys)
    encode_dataset(
        rd.from_arrow(_bucketed(tbl, key, target_rows)), view_dir,
        _view_opts(keys, target_rows))
    meta = {"source": source_dir, "key": key, "aggs": aggs,
            "cursor": cursor, "target_rows": target_rows}
    fsio.atomic_write(_view_meta_path(view_dir),
                      json.dumps(meta).encode(), fsync=False)
    from .sidecar_registry import register_sidecar

    register_sidecar(source_dir, "agg_view", view_dir)
    return {"groups": tbl.num_rows, "cursor": cursor}


def view_status(view_dir: str) -> dict:
    """Descriptor + staleness: transactions the source has committed
    past the view's cursor (0 = current)."""
    meta = json.loads(fsio.read_bytes(_view_meta_path(view_dir)))
    now = _source_txn(meta["source"])
    return {**meta, "source_txn": now,
            "behind_txns": max(0, now - int(meta["cursor"]))}


def _full_resync(view_dir: str, meta: dict, now: int) -> dict:
    """In-place rebuild when no incremental window exists (the cursor
    snapshot was swept): recompute every group from the source, upsert
    all, delete view groups the source no longer has.  Idempotent; the
    view container (and its history) is preserved."""
    from ..stages.dedup import gather_small
    from .container_agg import aggregate_clustered
    from .delete_pipeline import delete_rows
    from .encode_pipeline import decode_dataset
    from .upsert_pipeline import upsert_rows

    source, key = meta["source"], meta["key"]
    keys = _keylist(key)
    multi = len(keys) > 1
    ukey = _VKEY if multi else keys[0]
    full = aggregate_clustered(source, keys, meta["aggs"], as_of=now)
    if full.num_rows:
        full = _drop_null_keys(full, keys)
    if multi and full.num_rows:
        full = _with_vkey(full, keys)
    present = (set(full[ukey].to_pylist()) if full.num_rows
               else set())
    vrows = gather_small(
        decode_dataset(view_dir, columns=[ukey]),
        pa.table({ukey: pa.array([], pa.string() if multi
                                 else pa.int64())}))
    have = (set(vrows[ukey].to_pylist()) if vrows.num_rows
            else set())
    gone = [v for v in have if v not in present]
    upserted = 0
    if full.num_rows:
        inc = _bucketed(full, key,
                        int(meta.get("target_rows", 500_000)),
                        label=f"r{now:06d}")
        upsert_rows(view_dir, rd.from_arrow(inc), ukey,
                    opts=_view_opts(keys,
                                    int(meta.get("target_rows",
                                                 500_000))),
                    upsert_id=f"view-resync-{now}")
        upserted = full.num_rows
    if gone:
        delete_rows(view_dir, ukey, values=gone)
    meta["cursor"] = now
    fsio.atomic_write(_view_meta_path(view_dir),
                      json.dumps(meta).encode(), fsync=False)
    return {"refreshed": True, "cursor": now, "resync": True,
            "affected": upserted, "upserted_groups": upserted,
            "deleted_groups": len(gone)}


def refresh_agg_view(
    view_dir: str,
    max_affected: int = 2_000_000,
    to_txn: int | None = None,
) -> dict:
    """Converge the view to the source's snapshot at ``to_txn``
    (default: the latest transaction, PINNED once at entry — a
    concurrent append committing mid-refresh lands in the NEXT window
    instead of leaking into this one) by re-aggregating only the
    groups the CDC window touched.  Idempotent and crash-safe: the
    cursor file advances last."""
    from ..stages.dedup import gather_small
    from .container_agg import aggregate_clustered
    from .delete_pipeline import delete_rows
    from .history_pipeline import row_changes
    from .upsert_pipeline import upsert_rows

    meta = json.loads(fsio.read_bytes(_view_meta_path(view_dir)))
    source, key = meta["source"], meta["key"]
    keys = _keylist(key)
    multi = len(keys) > 1
    primary = keys[0]
    ukey = _VKEY if multi else primary
    cursor = int(meta["cursor"])
    now = int(to_txn) if to_txn is not None else _source_txn(source)
    if now <= cursor:
        return {"refreshed": False, "cursor": cursor, "affected": 0}

    # the CDC diff cancels rows whose PROJECTED content is unchanged —
    # projecting only the key would hide UPDATEs (key identical, value
    # changed), so the aggregated value columns (and every key) ride
    # along; pairing runs on the PRIMARY key.  The window is PINNED to
    # [cursor, now]: both the diff and the recompute below read the
    # `now` snapshot, so the refresh is atomic w.r.t. concurrent DML
    try:
        feed = row_changes(
            source, since_txn=cursor, key=primary, to_txn=now,
            columns=list(dict.fromkeys(keys + list(meta["aggs"]))))
    except RuntimeError:
        # the cursor snapshot was hollowed by a retention sweep — no
        # diff is possible; fall back to an in-place full resync
        # (O(groups), the same cost the max_affected guard points at)
        return _full_resync(view_dir, meta, now)

    def distinct_keys(b: pa.Table) -> pa.Table:
        return pa.table({primary: b[primary].combine_chunks().unique()})

    kt = gather_small(
        feed.map_batches(distinct_keys, batch_format="pyarrow"),
        pa.table({primary: pa.array([], pa.int64())}))
    affected = kt[primary].combine_chunks().unique()
    # null keys never pair in the feed and the view excludes the null
    # group by contract — drop them
    affected = affected.drop_null()
    if len(affected) == 0:
        # rewrites/compactions emit no net row changes: just advance
        meta["cursor"] = now
        fsio.atomic_write(_view_meta_path(view_dir),
                          json.dumps(meta).encode(), fsync=False)
        return {"refreshed": True, "cursor": now, "affected": 0,
                "deleted_groups": 0}
    if len(affected) > max_affected:
        raise ValueError(
            f"{len(affected)} affected groups exceeds max_affected="
            f"{max_affected}; a full create_agg_view rebuild is the "
            "cheaper path for a window this wide")

    vals = affected.to_pylist()
    new_agg = aggregate_clustered(source, keys, meta["aggs"],
                                  key_values=vals, as_of=now)
    if new_agg.num_rows:
        new_agg = _drop_null_keys(new_agg, keys)
    if multi and new_agg.num_rows:
        new_agg = _with_vkey(new_agg, keys)
    present = (set(new_agg[ukey].to_pylist()) if new_agg.num_rows
               else set())
    if multi:
        # gone groups: the view's current groups whose PRIMARY is in
        # the affected set minus the recomputed ones.  The read prunes
        # by the primary's min/max envelope (which EVERY partition
        # records — no bloom-key dependency) and exact-filters in-task
        # to the affected set, projecting the STORED _vkey, so the
        # gather stays O(affected groups)
        from .encode_pipeline import decode_dataset

        vset = pa.array(vals)

        def cur_groups(b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_in(
                b[primary],
                value_set=vset.cast(b.schema.field(primary).type)))
            return b.select([_VKEY])

        cur = gather_small(
            decode_dataset(view_dir,
                           key_range=(primary, min(vals), max(vals)),
                           columns=[primary, _VKEY])
            .map_batches(cur_groups, batch_format="pyarrow"),
            pa.table({_VKEY: pa.array([], pa.string())}))
        have = set(cur[_VKEY].to_pylist())
        gone = [v for v in have if v not in present]
    else:
        gone = [v for v in vals if v not in present]

    upserted = 0
    if new_agg.num_rows:
        inc = _bucketed(new_agg, key, int(meta.get("target_rows",
                                                   500_000)),
                        label=f"r{now:06d}")
        upsert_rows(view_dir, rd.from_arrow(inc), ukey,
                    opts=_view_opts(keys,
                                    int(meta.get("target_rows",
                                                 500_000))),
                    upsert_id=f"view-{cursor}-{now}")
        upserted = new_agg.num_rows
    if gone:
        delete_rows(view_dir, ukey, values=gone)
    meta["cursor"] = now
    fsio.atomic_write(_view_meta_path(view_dir),
                      json.dumps(meta).encode(), fsync=False)
    return {"refreshed": True, "cursor": now, "affected": len(vals),
            "upserted_groups": upserted, "deleted_groups": len(gone)}
