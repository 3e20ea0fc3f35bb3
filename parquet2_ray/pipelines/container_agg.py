"""Shuffle-free group-by over an encoded container.

A generic distributed group-by pays one all-to-all exchange of O(rows)
(or, with partial combiners, O(groups × partitions)).  Over a
key-CLUSTERED container (P43) neither is needed: a key whose value is
contained in exactly ONE partition's recorded [min,max] span lives
entirely in that partition, so its aggregate is final the moment the
partition-local group-by finishes.  Only keys inside span
intersections — the duplicate-edge boundary values, a handful per
partition on a clustered layout — need a second combine, and that
combine is over PARTIAL rows (one per key × touching partition), not
data rows.

Per-task finality is decided vectorized: the driver ships the global
span table (sorted lo/his of every partition), and a group key's stab
count — #spans containing it — is two ``searchsorted`` calls; count==1
means final.  On an unclustered container every span overlaps every
other, stab > 1 everywhere, and the operator degrades gracefully into
an ordinary two-phase aggregate (partials + a groups-sized combine) —
same exchange mass as the classic combiner pattern, never worse.

Supported aggregates are the decomposable ones: sum, count, min, max,
mean (sum/count pair re-derived after the combine).

No reference analog: parquet2 is a codec library; this is the
aggregate-pushdown its column statistics make possible at engine level.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..state import manifest as mf

__all__ = ["aggregate_clustered"]

_MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def aggregate_clustered(
    container_dir: str,
    key: "str | list[str]",
    aggs: dict[str, list[str]],
    key_values=None,
    as_of: int | None = None,
) -> pa.Table:
    """Group-by ``key`` (one column or a list — multi-key GROUP BY)
    with per-column aggregates over a container; returns the complete
    result as one Table (output is O(distinct keys) — already reduced;
    stream-size results belong to the window stages, not a group-by).

    Multi-key finality is decided by the FIRST key's partition spans:
    a (k1, k2, ...) group whose k1 is contained in exactly one
    partition has ALL its rows there, so its aggregate is final — a
    conservative but correct stab test; extra keys only force more
    partial combines, never wrong answers.  Cluster on the first key
    (P43) for the shuffle-free path.

    ``aggs``: ``{column: ["sum", "mean", ...]}``.  Output columns are
    named ``{column}_{fn}`` plus the key column(s).

    ``as_of``: aggregate the snapshot at that transaction (time
    travel / pinned-snapshot refresh) instead of the current state.

    ``key_values``: restrict the aggregate to these key values — the
    incremental-refresh shape (P70 materialized views): partitions are
    bloom/min-max PRUNED to the requested keys and each decoded table
    is exactly ``is_in``-filtered, so the cost is O(affected keys'
    rows), never a container scan.  Null is never a member of
    ``key_values`` (SQL ``IN`` semantics).
    """
    keys = [key] if isinstance(key, str) else list(key)
    primary = keys[0]
    for col, fns in aggs.items():
        for fn in fns:
            if fn not in ("sum", "count", "min", "max", "mean"):
                raise ValueError(f"unsupported aggregate {fn!r} on {col!r}")
    records = mf.load_manifest(container_dir, as_of=as_of)
    if not records:
        raise FileNotFoundError(
            f"no committed partitions under {container_dir}")
    key_set = None
    if key_values is not None:
        key_values = [v for v in key_values if v is not None]
        if not key_values:
            return pa.table({})
        from .encode_pipeline import prune_partitions

        keep_paths = set(prune_partitions(
            container_dir, key_values, records=records,
            column=primary))
        records = {pid: r for pid, r in records.items()
                   if r["path"] in keep_paths}
        if not records:
            return pa.table({})
        key_set = pa.array(key_values)
    # global span table for the stab test (profiles are already in the
    # comparison domain readers use — numbers, or isoformat strings)
    spans = []
    spanless = False
    from ..functions.stats import key_span

    for r in records.values():
        span = key_span(r, primary)
        if span is None:
            spanless = True
        else:
            spans.append(span)
    los = sorted(lo for lo, _ in spans)
    his = sorted(hi for _, hi in spans)
    # a partition without a span could hold ANY key → nothing is final
    force_combine = spanless
    # schema-evolved containers (P48): partitions missing the key or an
    # aggregate column pad with nulls (null keys → the null group; null
    # values contribute nothing, SQL semantics)
    from ..functions.stats import key_span as _ks  # noqa: F401 (doc)
    from .encode_pipeline import _pad_to_union, _union_fields

    union = _union_fields(list(records.values()))
    wanted = list(dict.fromkeys(keys + list(aggs)))
    if union is not None:
        known = {n for n, _ in union}
        missing_cols = [c for c in wanted if c not in known]
        if missing_cols:
            raise KeyError(f"container has no column(s) {missing_cols}; "
                           f"available: {sorted(known)}")
        pad = [f for f in union if f[0] in set(wanted)]
    else:
        pad = None

    # physical aggregation plan: mean → (sum, count); every requested
    # fn maps onto decomposable partials
    phys: list[tuple[str, str]] = []
    for col, fns in aggs.items():
        need = set(fns)
        if "mean" in need:
            need.discard("mean")
            need.update(("sum", "count"))
        for fn in sorted(need):
            phys.append((col, fn))
    phys = sorted(set(phys))

    def _partial(batch: pa.Table):
        import pyarrow.compute as pc  # noqa: F401  (grouped kernels)

        from ..stages.encode import decode_partition_path

        cols = list(dict.fromkeys(keys + [c for c, _ in phys]))
        for p in batch["path"]:
            t = decode_partition_path(p.as_py(), columns=cols,
                                      missing_ok=pad is not None)
            if pad is not None:
                t = _pad_to_union(t, pad)
            if key_set is not None and t.num_rows:
                t = t.filter(pc.is_in(
                    t[primary],
                    value_set=key_set.cast(
                        t.schema.field(primary).type)))
            if t.num_rows == 0:
                continue
            g = pa.TableGroupBy(t, keys).aggregate(phys)
            # stab count per group key: #partition spans containing it
            if force_combine or not los:
                final = np.zeros(g.num_rows, dtype=bool)
            else:
                from ..functions.stats import bound_in_profile_domain

                kv = g[primary].combine_chunks()
                nulls = (kv.is_null().to_numpy(zero_copy_only=False)
                         if kv.null_count else None)

                def _dom(v):
                    # probe values must land in the PROFILES' domain —
                    # isoformat for temporal (str(datetime) uses ' '
                    # where profiles use 'T' and would mis-order),
                    # surrogateescape text for binary
                    if v is None:
                        return los[0]
                    v2 = bound_in_profile_domain(v, los[0])
                    if isinstance(los[0], str) and not isinstance(v2, str):
                        return (v2.decode("utf-8", "surrogateescape")
                                if isinstance(v2, bytes) else str(v2))
                    return v2

                arr = np.asarray([_dom(v) for v in kv.to_pylist()])
                lo_arr = np.asarray(los)
                hi_arr = np.asarray(his)
                stab = (np.searchsorted(lo_arr, arr, side="right")
                        - np.searchsorted(hi_arr, arr, side="left"))
                final = stab <= 1
                if nulls is not None:
                    # null keys are invisible to spans: always combine
                    final &= ~nulls
            yield g.append_column("__final", pa.array(final))

    items = [{"path": r["path"]} for r in
             sorted(records.values(), key=lambda r: r["part_id"])]
    partials = rd.from_items(items).map_batches(
        _partial, batch_format="pyarrow", batch_size=1).materialize()
    import ray

    tabs = [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({})
    allp = pa.concat_tables(tabs, promote_options="default")
    mask = allp["__final"].combine_chunks()
    final_rows = allp.filter(mask).drop_columns(["__final"])
    rest = allp.filter(pa.compute.invert(mask)).drop_columns(["__final"])
    if rest.num_rows:
        merge = [(f"{c}_{fn}", _MERGE[fn]) for c, fn in phys]
        combined = pa.TableGroupBy(rest, keys).aggregate(merge)
        # aggregate() names merged cols "{col}_{fn}_{mergefn}" — restore
        combined = _restore_names(combined, keys, phys)
        out = pa.concat_tables(
            [final_rows.select(combined.column_names), combined])
    else:
        out = final_rows
    return _derive(out, keys, aggs)


def _restore_names(t: pa.Table, keys: list, phys: list) -> pa.Table:
    names = []
    it = iter([f"{c}_{fn}" for c, fn in phys])
    for n in t.column_names:
        names.append(n if n in keys else next(it))
    return t.rename_columns(names)


def _derive(t: pa.Table, keys: list, aggs: dict) -> pa.Table:
    """Project the physical partial columns onto the requested ones
    (mean = sum/count; drop helpers the user didn't ask for)."""
    import pyarrow.compute as pc

    cols: dict[str, pa.Array] = {k: t[k].combine_chunks()
                                 for k in keys}
    for col, fns in aggs.items():
        for fn in fns:
            if fn == "mean":
                s = t[f"{col}_sum"].combine_chunks()
                c = t[f"{col}_count"].combine_chunks()
                cols[f"{col}_mean"] = pc.divide(
                    pc.cast(s, pa.float64()), pc.cast(c, pa.float64()))
            else:
                cols[f"{col}_{fn}"] = t[f"{col}_{fn}"].combine_chunks()
    return pa.table(cols).sort_by([(k, "ascending") for k in keys])
