"""Zero-shuffle equality join between two encoded containers.

The classic co-partitioned join: one Ray task per LEFT partition joins
its rows against only the RIGHT partitions whose recorded key [min,max]
overlaps its own span — partition pruning, the page index, and column
projection all apply to the right-side read, so when BOTH containers
are key-clustered (P43 ``recluster_container``) each task reads O(1)
right partitions and NO all-to-all exchange ever happens.  At 100 TB
the exchange is the scarcest resource; a clustered-layout join moves
zero rows between workers.

Correctness does not depend on clustering: left partitions are
row-DISJOINT by construction (every row lives in exactly one
partition), so the pair (a, b) is produced exactly once — by the task
that owns ``a`` — even when left spans share boundary values or
overlap outright.  An unclustered left side merely prunes worse (each
task range-reads a wider right slice); an unclustered right side
degrades toward a broadcast-style scan per task.  ``tools layout``
tells you which you have.

The per-task join is pyarrow's vectorized hash join (Acero).  SQL
semantics on null keys: nulls never match (inner drops them; left
outer keeps the left row with nulls on the right).

No reference analog: parquet2 is a file codec library.  This is the
engine-level operation its statistics (S4/T6 min/max) exist to serve.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..functions.stats import key_span
from ..state import manifest as mf

__all__ = ["merge_join_containers"]

_JOIN_TYPES = {
    "inner": "inner",
    "left outer": "left outer",
    "left semi": "left semi",
    "left anti": "left anti",
}


def merge_join_containers(
    left_dir: str,
    right_dir: str,
    key: str,
    left_columns: list[str] | None = None,
    right_columns: list[str] | None = None,
    how: str = "inner",
    right_suffix: str = "_r",
) -> rd.Dataset:
    """Join two containers on ``key`` without a shuffle; returns a
    streamed Dataset of joined rows (one output block per left
    partition).

    ``left_columns`` / ``right_columns``: optional projections (the
    key is read regardless; right-side non-key name collisions get
    ``right_suffix``).  ``how``: inner | left outer | left semi |
    left anti.
    """
    if how not in _JOIN_TYPES:
        raise ValueError(f"how={how!r}; pick one of {sorted(_JOIN_TYPES)}")
    left_recs = mf.load_manifest(left_dir)
    if not left_recs:
        raise FileNotFoundError(f"no committed partitions under {left_dir}")
    right_recs = mf.load_manifest(right_dir)
    if not right_recs:
        raise FileNotFoundError(f"no committed partitions under {right_dir}")
    # right schema resolved ONCE on the driver: a left-outer task whose
    # key span matches nothing on the right must still emit the full
    # joined schema (right columns all-null), or blocks would disagree
    from ..codecs.column import str_to_type
    from .encode_pipeline import _pad_to_union, _union_fields

    # schema-evolved containers (P48) on either side: pad each decoded
    # partition to the union (missing key → null keys → no matches)
    l_union = _union_fields(list(left_recs.values()))
    r_union = _union_fields(list(right_recs.values()))
    if r_union is None:
        r_footer = mf.read_partition_footer(
            next(iter(right_recs.values()))["path"])
        r_meta = (r_footer["blocks"][0]["columns"] if r_footer.get("paged")
                  else r_footer["columns"])
        r_union = [(m["name"], m["arrow_type"]) for m in r_meta]
        r_pad = None
    else:
        r_pad = r_union
    r_fields = [(n, str_to_type(ts)) for n, ts in r_union]
    if right_columns is not None:
        want = set(right_columns) | {key}
        r_fields = [f for f in r_fields if f[0] in want]
        if r_pad is not None:
            r_pad = [f for f in r_pad if f[0] in want]
    if key not in {n for n, _ in r_fields}:
        raise ValueError(f"key {key!r} not in right container schema")
    l_pad = None
    if l_union is not None:
        if left_columns is None:
            l_pad = l_union
        else:
            lw = set(left_columns) | {key}
            l_pad = [f for f in l_union if f[0] in lw]
        if key not in {n for n, _ in l_union}:
            raise ValueError(f"key {key!r} not in left container schema")
    empty_right = pa.table({n: pa.nulls(0, t) for n, t in r_fields})
    # right span table resolved ONCE on the driver and shipped in the
    # task closure — per-task manifest reloads would cost O(left ×
    # right) partition-record reads at scale.  Spans sorted by min for
    # bisect pruning; statless right partitions are always candidates.
    r_spans = []      # (min, max, path), min-sorted
    r_always = []     # paths with no recorded span for the key
    for r in right_recs.values():
        span = key_span(r, key)
        if span is None:
            r_always.append(r["path"])
        else:
            r_spans.append((span[0], span[1], r["path"]))
    r_spans.sort(key=lambda s: (s[0], s[1]))
    r_mins = [s[0] for s in r_spans]

    items = []
    for r in sorted(left_recs.values(), key=lambda r: r["part_id"]):
        # temporal profile min/max are isoformat strings — they feed
        # the span pruning and decode, which compare in that same
        # domain, so passing them straight through is exact
        span = key_span(r, key)
        items.append({"path": r["path"],
                      "lo": span[0] if span else None,
                      "hi": span[1] if span else None})

    jt = _JOIN_TYPES[how]

    def _prune_right(lo, hi) -> list[str]:
        """Right paths whose span overlaps [lo, hi] — bisect over the
        min-sorted span table (no manifest IO in tasks)."""
        import bisect

        from ..functions.stats import bound_in_profile_domain

        if not r_spans:
            return list(r_always)
        plo = bound_in_profile_domain(lo, r_spans[0][0])
        phi = bound_in_profile_domain(hi, r_spans[0][0])
        stop = (len(r_spans) if phi is None
                else bisect.bisect_right(r_mins, phi))
        out = [p for mn, mx, p in r_spans[:stop]
               if plo is None or mx >= plo]
        return out + list(r_always)

    def _join_task(batch: pa.Table):
        import pyarrow.compute as pc

        from ..stages.encode import decode_partition_path

        for i in range(batch.num_rows):
            path = batch["path"][i].as_py()
            lo = batch["lo"][i].as_py()
            hi = batch["hi"][i].as_py()
            a_cols = (list(dict.fromkeys(list(left_columns) + [key]))
                      if left_columns is not None else None)
            t_a = decode_partition_path(path, columns=a_cols,
                                        missing_ok=l_pad is not None)
            if l_pad is not None:
                t_a = _pad_to_union(t_a, l_pad)
            if t_a.num_rows == 0:
                continue
            if lo is None and t_a[key].null_count < t_a.num_rows:
                # no recorded span (pre-stats container): exact bounds
                # from the decoded rows keep the right read pruned
                mm = pc.min_max(t_a[key])
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
            b_cols = (list(dict.fromkeys(list(right_columns) + [key]))
                      if right_columns is not None else None)
            b_paths = _prune_right(lo, hi)
            b_parts = []
            for bp in b_paths:
                t_b = decode_partition_path(bp, key, lo, hi,
                                            columns=b_cols,
                                            missing_ok=r_pad is not None)
                if r_pad is not None:
                    t_b = _pad_to_union(t_b, r_pad)
                # profile-derived bounds are isoformat/surrogateescape
                # STRINGS for temporal/binary keys — the Arrow compute
                # filter needs the typed values back
                from ..functions.stats import profile_value_to_typed

                kt = t_b.schema.field(key).type
                tlo = profile_value_to_typed(lo, kt)
                thi = profile_value_to_typed(hi, kt)
                m = None
                if tlo is not None:
                    m = pc.greater_equal(t_b[key], tlo)
                if thi is not None:
                    m2 = pc.less_equal(t_b[key], thi)
                    m = m2 if m is None else pc.and_(m, m2)
                if m is not None:
                    t_b = t_b.filter(m)
                if t_b.num_rows:
                    b_parts.append(t_b)
            if b_parts:
                t_b = (pa.concat_tables(b_parts) if len(b_parts) > 1
                       else b_parts[0])
            else:
                t_b = None
            if t_b is None or t_b.num_rows == 0:
                if jt == "inner" or jt == "left semi":
                    continue
                if jt == "left anti":
                    yield t_a
                    continue
                # left outer with an empty right side: full right
                # schema, zero rows — the join appends all-null columns
                t_b = empty_right
            out = t_a.join(t_b, keys=key, join_type=jt,
                           right_suffix=right_suffix)
            if out.num_rows:
                yield out

    return rd.from_items(items).map_batches(
        _join_task, batch_format="pyarrow", batch_size=1)
