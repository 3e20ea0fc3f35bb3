"""Windowed aggregates over event streams — tumbling windows and
session windows (gap-based sessionization).

The reference is a codec library and has no notion of time (SURVEY.md
§2.7: "no windows/watermarks exist in the reference"); these are the
training-data-pipeline operators a 100 TB event log needs, built
Ray-Data-first:

* ``tumbling_window``: the window id is a pure per-row function of the
  timestamp, so it's ONE ``map_batches`` (vectorized bucket arithmetic)
  followed by Ray Data's native ``groupby().aggregate`` — partial
  aggregation happens inside each block before the exchange, so only
  O(windows × keys) rows cross the shuffle, never events.

* ``sessionize``: sessions need every event of a user on one task.  We
  shuffle ONCE on ``hash(user) % nshards`` (not per-user ``map_groups``
  — a web-scale log has 10^9 users and per-group Python calls die of
  overhead; same shard-grouping pattern as ``bucket_pairs``).  Inside a
  shard task, a single lexsort over (user, ts) + ``np.diff`` boundary
  scan sessionizes every user in the shard vectorized.  Per-shard
  memory is O(events/nshards) — raise ``nshards`` with corpus size.

Timestamps are compared as int64 microseconds (Arrow's physical
representation — zero-copy view, no datetime objects in the hot path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

__all__ = ["tumbling_window", "hopping_window", "sessionize",
           "distinct_count", "approx_distinct_count",
           "grouped_quantiles", "approx_quantiles",
           "grouped_quantiles_auto", "rolling_mean"]


def _ts_us(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Zero-copy int64 view of a timestamp column in microseconds."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_timestamp(t):
        if t.unit != "us":
            col = col.cast(pa.timestamp("us"))
        return col.view(pa.int64())
    return col.cast(pa.int64())


def tumbling_window(
    ds: rd.Dataset,
    ts_col: str = "ts",
    every_s: int = 86_400,
    keys: tuple[str, ...] = (),
    value_col: str | None = None,
) -> rd.Dataset:
    """Fixed-size (tumbling) window aggregate.

    Emits one row per (window_start, *keys) with ``n_events`` and, when
    ``value_col`` is given, ``sum_value``/``min_value``/``max_value``.
    ``window_start`` is the bucket's start as int64 epoch SECONDS
    (floor-aligned to the epoch), so results are engine-portable —
    no timezone or timestamp-unit ambiguity crosses the API.
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    every_us = np.int64(every_s) * 1_000_000
    cols = [ts_col, *keys] + ([value_col] if value_col else [])

    def bucket(b: pa.Table) -> pa.Table:
        # NULL timestamps are dropped (a window needs a time) — same
        # policy as sessionize/rolling_mean, matching SQL's behavior of
        # a NULL bucket expression falling out of any equality group.
        import pyarrow.compute as pc
        b = b.filter(pc.is_valid(b[ts_col]))
        us = _ts_us(b[ts_col]).to_numpy(zero_copy_only=False)
        # numpy // floors toward -inf: pre-1970 timestamps bucket left
        ws = (us // every_us) * np.int64(every_s)
        out = {"window_start": pa.array(ws, type=pa.int64())}
        for k in keys:
            out[k] = b[k]
        if value_col:
            out[value_col] = b[value_col]
        return pa.table(out)

    aggs = [Count(alias_name="n_events")]
    if value_col:
        aggs += [Sum(value_col, alias_name="sum_value"),
                 Min(value_col, alias_name="min_value"),
                 Max(value_col, alias_name="max_value")]
    proj = ds.select_columns(cols) if set(cols) != set(ds.columns()) else ds
    return (proj.map_batches(bucket, batch_format="pyarrow")
                .groupby(["window_start", *keys])
                .aggregate(*aggs))


_NULL_USER = np.int64(np.iinfo(np.int64).min)


class _SessionizeShard:
    """Sessionize every user inside one shard, fully vectorized.

    NULL users are one group (SQL ``PARTITION BY`` semantics — NaN-vs-
    NaN comparisons would instead split every null row into its own
    session and coerce the key column to float64), carried through as
    the INT64_MIN sentinel and emitted back as null.  KNOWN LIMIT: a
    legitimate user_id equal to INT64_MIN would merge with the NULL
    group — acceptable for surrogate-key id spaces; use an explicit
    _isnull bit column if your id domain spans the full int64 range.
    Rows with a NULL timestamp are dropped upstream (a session window
    needs a time)."""

    def __init__(self, ts_col, user_col, gap_us):
        self.ts_col, self.user_col, self.gap_us = ts_col, user_col, gap_us

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            # derive the key type from the group schema so empty shards
            # emit the same schema as non-empty ones (Ray unions blocks)
            utype = group.schema.field(self.user_col).type
            return pa.table({
                self.user_col: pa.nulls(0, utype),
                "session_id": pa.nulls(0, pa.int64()),
                "session_start_s": pa.nulls(0, pa.int64()),
                "session_end_s": pa.nulls(0, pa.int64()),
                "n_events": pa.nulls(0, pa.int64()),
            })
        import pyarrow.compute as pc

        ucol = group[self.user_col].combine_chunks()
        users = pc.fill_null(ucol, _NULL_USER).to_numpy(zero_copy_only=False)
        ts = _ts_us(group[self.ts_col]).to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, users))
        u, t = users[order], ts[order]
        # new session at: first row of a user, or gap exceeded
        new_user = np.empty(len(u), dtype=bool)
        new_user[0] = True
        np.not_equal(u[1:], u[:-1], out=new_user[1:])
        gap = np.empty(len(u), dtype=bool)
        gap[0] = True
        np.greater(t[1:] - t[:-1], self.gap_us, out=gap[1:])
        new_sess = new_user | gap
        starts = np.flatnonzero(new_sess)
        ends = np.r_[starts[1:], len(u)]               # exclusive
        # per-user session_id restarts at 0: subtract from each
        # session's global index the index of its user's first session
        sess_idx = np.arange(len(starts))
        user_first = new_user[starts]                  # session starts a user
        user_of_sess = np.cumsum(user_first) - 1
        session_id = sess_idx - sess_idx[user_first][user_of_sess]
        out_u = u[starts]
        return pa.table({
            self.user_col: pa.array(out_u, mask=(out_u == _NULL_USER)),
            "session_id": pa.array(session_id, type=pa.int64()),
            "session_start_s": pa.array(t[starts] // 1_000_000, type=pa.int64()),
            "session_end_s": pa.array(t[ends - 1] // 1_000_000, type=pa.int64()),
            "n_events": pa.array(ends - starts, type=pa.int64()),
        })


def sessionize(
    ds: rd.Dataset,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_s: int = 1_800,
    nshards: int = 256,
) -> rd.Dataset:
    """Session windows: consecutive events of a user belong to one
    session while the inter-event gap is ≤ ``gap_s`` seconds.

    One groupby shuffle on ``user % nshards`` co-locates each user's
    events; the shard task sessionizes all its users in one lexsort
    (ties in ts are session-order-insensitive: a zero gap never splits).
    Output: (user_id, session_id, session_start_s, session_end_s,
    n_events), session_id dense per user starting at 0.

    NULL users form ONE group (SQL PARTITION BY semantics), emitted
    with null user_id; rows with NULL timestamps are dropped.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import shard_of

    gap_us = np.int64(gap_s) * 1_000_000

    def shard(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[ts_col]))  # a session needs a time
        uid = pc.fill_null(b[user_col].combine_chunks(),
                           _NULL_USER).to_numpy(zero_copy_only=False)
        return b.append_column("_shard", pa.array(shard_of(uid, nshards)))

    fn = _SessionizeShard(ts_col, user_col, gap_us)

    def run(group: pa.Table) -> pa.Table:
        return fn(group.drop_columns(["_shard"]))

    return (ds.select_columns([ts_col, user_col])
              .map_batches(shard, batch_format="pyarrow")
              .groupby("_shard")
              .map_groups(run, batch_format="pyarrow"))


def hopping_window(
    ds: rd.Dataset,
    ts_col: str = "ts",
    every_s: int = 86_400,
    hop_s: int = 43_200,
    keys: tuple[str, ...] = (),
    value_col: str | None = None,
) -> rd.Dataset:
    """Hopping (sliding) window aggregate: windows of ``every_s``
    seconds starting every ``hop_s`` seconds (``hop_s <= every_s``;
    equal = tumbling).  An event at t belongs to ceil(every/hop)
    windows, so the bucket map emits that many rows per event via one
    ``np.repeat`` — the ONLY blow-up is the window overlap factor, and
    it happens inside the map task, pre-aggregated per block before the
    groupby exchange like tumbling_window.
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    if every_s % hop_s:
        raise ValueError("every_s must be a multiple of hop_s")
    k = every_s // hop_s
    hop_us = np.int64(hop_s) * 1_000_000
    cols = [ts_col, *keys] + ([value_col] if value_col else [])

    def bucket(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = b.filter(pc.is_valid(b[ts_col]))  # NULL ts rows are dropped
        us = _ts_us(b[ts_col]).to_numpy(zero_copy_only=False)
        base = (us // hop_us) * np.int64(hop_s)      # hop-aligned, seconds
        # windows containing t: base - i*hop for i in [0, k)
        offs = np.arange(k, dtype=np.int64) * np.int64(hop_s)
        ws = (np.repeat(base, k).reshape(-1, k) - offs).ravel()
        idx = np.repeat(np.arange(len(us), dtype=np.int64), k)
        out = {"window_start": pa.array(ws, type=pa.int64())}
        take = pa.array(idx)
        for c in keys:
            out[c] = pa.compute.take(b[c], take)
        if value_col:
            out[value_col] = pa.compute.take(b[value_col], take)
        return pa.table(out)

    aggs = [Count(alias_name="n_events")]
    if value_col:
        aggs += [Sum(value_col, alias_name="sum_value"),
                 Min(value_col, alias_name="min_value"),
                 Max(value_col, alias_name="max_value")]
    proj = ds.select_columns(cols) if set(cols) != set(ds.columns()) else ds
    return (proj.map_batches(bucket, batch_format="pyarrow")
                .groupby(["window_start", *keys])
                .aggregate(*aggs))


def distinct_count(
    ds: rd.Dataset,
    group_col: str = "event_type",
    value_col: str = "user_id",
    out_col: str = "n_distinct",
) -> rd.Dataset:
    """EXACT count(DISTINCT value) per group.

    Per-batch (group, value) dedupe is the combiner — duplicate pairs
    collapse before the exchange, so at most |distinct pairs in batch|
    rows shuffle; the group task counts uniques vectorized.  NULL
    values are excluded (SQL ``COUNT(DISTINCT v)`` semantics); NULL
    group keys still form one group.  For a 100 TB corpus where even
    the distinct pair set is huge, swap the final stage for a sketch
    (HLL) — this operator is the exact path.
    """
    import pyarrow.compute as pc

    def dedupe(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[value_col]))   # COUNT(DISTINCT) skips NULL
        return b.select([group_col, value_col]).group_by(
            [group_col, value_col]).aggregate([])

    def count(group: pa.Table) -> pa.Table:
        vals = group[value_col].combine_chunks()
        n = pc.count_distinct(vals, mode="only_valid").as_py()
        return pa.table({group_col: group[group_col].slice(0, 1),
                         out_col: pa.array([n], type=pa.int64())})

    return (ds.map_batches(dedupe, batch_format="pyarrow")
              .groupby(group_col)
              .map_groups(count, batch_format="pyarrow"))


def approx_distinct_count(
    ds: rd.Dataset,
    group_col: str = "event_type",
    value_col: str = "user_id",
    out_col: str = "n_approx",
    p: int = 12,
) -> rd.Dataset:
    """Approximate count(DISTINCT value) per group via HyperLogLog.

    The scale path for ``distinct_count``: each batch folds its values
    into ONE 2^p-byte register bank per group present (vectorized
    scatter-max over a combined group×register index), so the exchange
    carries a fixed 2^p bytes per (batch, group) no matter how many
    distinct values exist; the group task merges banks by elementwise
    max and estimates.  Std err ≈ 1.04/sqrt(2^p) (p=12 → ~1.6%).
    """
    import pyarrow.compute as pc

    from ..functions.bloom import hash_arrow
    from ..functions.hll import _floor_log2, hll_estimate, hll_merge

    m = 1 << p

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[group_col]),
                             pc.is_valid(b[value_col])))
        if b.num_rows == 0:
            return pa.table({group_col: pa.nulls(0, b[group_col].type),
                             "_reg": pa.nulls(0, pa.binary())})
        enc = b[group_col].combine_chunks().dictionary_encode()
        g = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        h = hash_arrow(b[value_col])            # aligned: no nulls remain
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        w = h << np.uint64(p)
        rank = np.where(w == 0, 64 - p + 1,
                        (63 - _floor_log2(np.maximum(w, 1))) + 1)
        ngroups = len(enc.dictionary)
        flat = np.zeros(ngroups * m, dtype=np.uint8)
        np.maximum.at(flat, g * m + idx, rank.astype(np.uint8))
        return pa.table({
            group_col: enc.dictionary,
            "_reg": pa.array([flat[i * m:(i + 1) * m].tobytes()
                              for i in range(ngroups)], type=pa.binary()),
        })

    def final(group: pa.Table) -> pa.Table:
        banks = np.stack([np.frombuffer(v.as_py(), dtype=np.uint8)
                          for v in group["_reg"]])
        reg = banks[0]
        for b_ in banks[1:]:
            reg = hll_merge(reg, b_)
        return pa.table({
            group_col: group[group_col].slice(0, 1),
            out_col: pa.array([int(round(hll_estimate(reg)))],
                              type=pa.int64()),
        })

    return (ds.select_columns([group_col, value_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby(group_col)
              .map_groups(final, batch_format="pyarrow"))


def grouped_quantiles(
    ds: rd.Dataset,
    group_col: str = "event_type",
    value_col: str = "value",
    qs: tuple[float, ...] = (0.5,),
    nshards: int = 64,
) -> rd.Dataset:
    """EXACT per-group quantiles (linear interpolation — the same
    definition as SQL ``quantile_cont`` and ``np.quantile``).

    Exact quantiles need each group's full value set on one task: ONE
    groupby shuffle on the group key (value column only crosses — prune
    everything else), then a single np.sort + vectorized interpolation
    per group.  NULL values are excluded (SQL aggregate semantics).
    For groups too large for one worker's heap, pre-aggregate to a
    fixed-size histogram/t-digest instead — this operator is the exact
    path for group-sized data (per-key event streams, per-source
    document stats).
    """
    import pyarrow.compute as pc

    q_arr = np.asarray(qs, dtype=np.float64)
    qcols = [f"q{str(q).replace('.', '_')}" for q in qs]

    def quant(group: pa.Table) -> pa.Table:
        vals = group[value_col].combine_chunks().drop_null()
        out = {group_col: group[group_col].slice(0, 1)}
        if len(vals) == 0:
            for c in qcols:
                out[c] = pa.nulls(1, pa.float64())
            return pa.table(out)
        v = np.sort(vals.to_numpy(zero_copy_only=False).astype(np.float64))
        res = np.quantile(v, q_arr)  # 'linear' == SQL quantile_cont
        for c, r in zip(qcols, res):
            out[c] = pa.array([float(r)], type=pa.float64())
        return pa.table(out)

    return (ds.select_columns([group_col, value_col])
              .groupby(group_col)
              .map_groups(quant, batch_format="pyarrow"))


def grouped_quantiles_auto(
    ds: rd.Dataset,
    group_col: str = "event_type",
    value_col: str = "value",
    qs: tuple[float, ...] = (0.5,),
    max_exact_group: int = 5_000_000,
    compression: int = 512,
    total_rows: int | None = None,
) -> rd.Dataset:
    """Scale-safe per-group quantiles (VERDICT r4 #5): EXACT for every
    group that fits one task's heap, the mergeable P24 digest for
    groups above ``max_exact_group`` rows — same output schema either
    way, so callers see one operator.

    ``total_rows``: callers that know the input's row count (a parquet
    footer read) pass it to skip the counting pass entirely when no
    group can possibly exceed the threshold — the common small-to-mid
    case then pays zero overhead over :func:`grouped_quantiles`.

    Plan: a combiner-style partial count (per-batch ``value_counts`` →
    one tiny groupby of O(distinct groups) rows) finds oversized
    groups; the projection is then split by an ``is_in`` filter against
    the broadcast big-group set and each side runs its native path.
    The projected input executes twice (count pass + quantile pass) —
    two 2-column scans, still far cheaper than shuffling a 10^7-row
    group's values to a single ``map_groups`` task and sorting them in
    one heap, which is how the exact path dies at scale.  Rank error on
    the digest side ≈ 2/compression (see :func:`approx_quantiles`);
    groups under the threshold are bit-identical to
    :func:`grouped_quantiles`."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    if total_rows is not None and total_rows <= max_exact_group:
        return grouped_quantiles(ds, group_col, value_col, qs)
    pruned = ds.select_columns([group_col, value_col])

    def pcount(b: pa.Table) -> pa.Table:
        gtype = b.schema.field(group_col).type
        b = b.filter(pc.and_(pc.is_valid(b[group_col]),
                             pc.is_valid(b[value_col])))
        if b.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             "_n": pa.array([], pa.int64())})
        vc = pc.value_counts(b[group_col].combine_chunks())
        return pa.table({group_col: vc.field("values"),
                         "_n": vc.field("counts")})

    counts = (pruned.map_batches(pcount, batch_format="pyarrow")
              .groupby(group_col)
              .aggregate(Sum("_n", alias_name="_n")).take_all())
    big = sorted(r[group_col] for r in counts
                 if int(r["_n"]) > max_exact_group)
    if not big:
        return grouped_quantiles(ds, group_col, value_col, qs)
    big_arr = pa.array(big)

    def small_side(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(pc.is_in(
            b[group_col], value_set=big_arr)))

    def big_side(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b[group_col], value_set=big_arr))

    exact = grouped_quantiles(
        pruned.map_batches(small_side, batch_format="pyarrow"),
        group_col, value_col, qs)
    approx = approx_quantiles(
        pruned.map_batches(big_side, batch_format="pyarrow"),
        group_col, value_col, qs, compression=compression)
    return exact.union(approx)


def rolling_mean(
    ds: rd.Dataset,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    k: int = 3,
    nshards: int = 256,
) -> rd.Dataset:
    """Per-key rolling mean over the last ``k`` events (current row
    included) in timestamp order — the SQL window function
    ``AVG(v) OVER (PARTITION BY key ORDER BY ts ROWS BETWEEN k-1
    PRECEDING AND CURRENT ROW)``.

    Same shard-grouped plan as ``sessionize``: ONE shuffle on
    ``hash(user)%nshards``, then inside the shard a lexsort over
    (user, ts, id) and a cumulative-sum difference computes every
    user's rolling means at once — the window never re-sums.  The id
    column is the deterministic tie-breaker AND the join-back key, so
    results are a pure function of the data.  Rows with NULL key/ts
    are dropped (window frames need an order).
    """
    import pyarrow.compute as pc

    from ..functions.hashing import shard_of

    def shard(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[user_col]),
                             pc.is_valid(b[ts_col])))
        uid = b[user_col].combine_chunks().to_numpy(zero_copy_only=False)
        return b.append_column("_shard", pa.array(shard_of(uid, nshards)))

    def roll(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({id_col: pa.nulls(0,
                                group.schema.field(id_col).type),
                             "rolling_mean": pa.nulls(0, pa.float64())})
        u = group[user_col].combine_chunks().to_numpy(zero_copy_only=False)
        t = _ts_us(group[ts_col]).to_numpy(zero_copy_only=False)
        i = group[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        v = (group[value_col].combine_chunks()
             .to_numpy(zero_copy_only=False).astype(np.float64))
        order = np.lexsort((i, t, u))
        u, t, i, v = u[order], t[order], i[order], v[order]
        csum = np.concatenate(([0.0], np.cumsum(v)))
        n = len(v)
        pos = np.arange(n)
        # first row of each user's run, broadcast to every row of the run
        new_u = np.empty(n, dtype=bool)
        new_u[0] = True
        np.not_equal(u[1:], u[:-1], out=new_u[1:])
        run_start = pos[new_u][np.cumsum(new_u) - 1]
        lo = np.maximum(pos - (k - 1), run_start)   # window start per row
        means = (csum[pos + 1] - csum[lo]) / (pos + 1 - lo)
        return pa.table({id_col: pa.array(i),
                         "rolling_mean": pa.array(means, type=pa.float64())})

    return (ds.select_columns([ts_col, user_col, value_col, id_col])
              .map_batches(shard, batch_format="pyarrow")
              .groupby("_shard")
              .map_groups(roll, batch_format="pyarrow"))


def _compress_centroids(means: np.ndarray, weights: np.ndarray,
                        c: int) -> tuple[np.ndarray, np.ndarray]:
    """Compress weighted centroids to ≤``c`` clusters by equi-depth
    rank bucketing (a uniform-scale t-digest: each output cluster owns
    ~total/c of the weight, so the rank error of any quantile estimate
    is bounded by ~1/c per compression pass).  Fully vectorized:
    sort + cumsum + reduceat."""
    order = np.argsort(means, kind="stable")
    m, w = means[order], weights[order]
    cum = np.cumsum(w)
    total = cum[-1]
    mid = cum - w / 2.0
    b = np.minimum((c * mid / total).astype(np.int64), c - 1)
    starts = np.concatenate([[0], np.flatnonzero(np.diff(b)) + 1])
    ws = np.add.reduceat(w, starts)
    ms = np.add.reduceat(m * w, starts) / ws
    return ms, ws


def approx_quantiles(
    ds: rd.Dataset,
    group_col: str = "event_type",
    value_col: str = "value",
    qs: tuple[float, ...] = (0.5,),
    compression: int = 512,
) -> rd.Dataset:
    """Approximate per-group quantiles via a mergeable centroid digest —
    the 100 TB scale swap for :func:`grouped_quantiles` (same output
    schema, so it's a drop-in): instead of shuffling every value to its
    group task, each batch folds its values into ≤``compression``
    weighted centroids per group (equi-depth rank buckets — a
    uniform-scale t-digest), so the exchange carries a FIXED
    O(compression) floats per (batch, group).  The group task merges
    digests by concatenation + one recompression and interpolates on
    cumulative weights; exact per-group min/max ride along so extreme
    quantiles stay sharp.  Rank error ≈ 1/compression per pass (two
    passes end-to-end → ~2/compression ≈ 0.4% at the default).
    NULL values are excluded (SQL aggregate semantics)."""
    import pyarrow.compute as pc

    q_arr = np.asarray(qs, dtype=np.float64)
    qcols = [f"q{str(q).replace('.', '_')}" for q in qs]

    def partial(b: pa.Table) -> pa.Table:
        gtype = b.schema.field(group_col).type  # keep type on empty blocks
        b = b.filter(pc.and_(pc.is_valid(b[group_col]),
                             pc.is_valid(b[value_col])))
        out = {group_col: [], "_m": [], "_w": [], "_lo": [], "_hi": []}
        if b.num_rows:
            enc = b[group_col].combine_chunks().dictionary_encode()
            g = enc.indices.to_numpy(zero_copy_only=False)
            v = (b[value_col].combine_chunks()
                 .to_numpy(zero_copy_only=False).astype(np.float64))
            order = np.argsort(g, kind="stable")
            g, v = g[order], v[order]
            starts = np.concatenate(
                [[0], np.flatnonzero(np.diff(g)) + 1, [len(g)]])
            for i in range(len(starts) - 1):
                vals = v[starts[i]:starts[i + 1]]
                m, w = _compress_centroids(
                    vals, np.ones(vals.size), compression)
                out[group_col].append(enc.dictionary[int(g[starts[i]])].as_py())
                out["_m"].append(m.astype("<f8").tobytes())
                out["_w"].append(w.astype("<f8").tobytes())
                out["_lo"].append(float(vals.min()))
                out["_hi"].append(float(vals.max()))
        return pa.table({
            group_col: pa.array(out[group_col], type=gtype),
            "_m": pa.array(out["_m"], pa.large_binary()),
            "_w": pa.array(out["_w"], pa.large_binary()),
            "_lo": pa.array(out["_lo"], pa.float64()),
            "_hi": pa.array(out["_hi"], pa.float64()),
        })

    def final(group: pa.Table) -> pa.Table:
        parts_m = [np.frombuffer(x.as_py(), dtype="<f8")
                   for x in group["_m"] if x.is_valid]
        if not parts_m:  # defensive: a group with no surviving digest
            out = {group_col: group[group_col].slice(0, 1)}
            for cname in qcols:
                out[cname] = pa.nulls(1, pa.float64())
            return pa.table(out)
        ms = np.concatenate(parts_m)
        ws = np.concatenate([np.frombuffer(x.as_py(), dtype="<f8")
                             for x in group["_w"] if x.is_valid])
        m, w = _compress_centroids(ms, ws, compression)
        lo = float(pc.min(group["_lo"]).as_py())
        hi = float(pc.max(group["_hi"]).as_py())
        # interpolate at centroid midpoints, clamped by exact extremes
        cum = np.cumsum(w)
        total = cum[-1]
        mid = (cum - w / 2.0) / total
        xp = np.concatenate([[0.0], mid, [1.0]])
        fp = np.concatenate([[lo], m, [hi]])
        est = np.interp(q_arr, xp, fp)
        out = {group_col: group[group_col].slice(0, 1)}
        for cname, e in zip(qcols, est):
            out[cname] = pa.array([float(e)], pa.float64())
        return pa.table(out)

    return (ds.select_columns([group_col, value_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby(group_col)
              .map_groups(final, batch_format="pyarrow"))
