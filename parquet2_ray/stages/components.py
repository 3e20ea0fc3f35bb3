"""Distributed connected components — duplicate-CLUSTER formation.

Near-dup pairs (MinHash/LSH verified, `stages/dedup.py`) are edges of
an undirected graph; corpus dedup should keep ONE document per
connected component (pairwise id_b-removal under-specifies once chains
appear: a–b, b–c must collapse to {a}, which requires the transitive
closure).  The reference has no graph ops (codec library); this is the
training-pipeline operator that turns verified pairs into clusters.

Algorithm: min-label propagation (the classic BSP/Pregel formulation,
e.g. Kang et al., HCC in PEGASUS, ICDM'09 — public literature):

    label(v) ← min(label(v), min over neighbors u of label(u))

iterated to fixpoint.  Ray-Data-first shape — per round exactly TWO
shard-grouped exchanges over O(V+E) rows (the repo-wide rule: shuffle
on ``hash(key) % nshards`` and process every key of a shard in ONE
vectorized numpy pass; never per-node ``map_groups``):

  1. join shard: labels and out-edges co-partition on src; a sorted
     searchsorted gather stamps each edge with its src's label →
     messages (dst, lbl).
  2. combine shard: messages ∪ current labels co-partition on node;
     one lexsort + ``np.minimum.reduceat`` computes the new label of
     every node in the shard.

Convergence is detected by the monotone global label sum (labels only
ever decrease; the sum is strictly smaller until fixpoint) — one tiny
aggregate per round.  Rounds ≤ graph diameter; duplicate clusters are
near-cliques (diameter ≤ 3 in practice).  ``max_rounds`` bounds
pathological chains — pre-contract with large-star/small-star if the
diameter is genuinely large.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

__all__ = ["connected_components", "cluster_dedup_keepers"]


def _min_by_key(keys: np.ndarray, vals: np.ndarray):
    """Vectorized per-key minimum → (unique_keys, min_vals)."""
    order = np.lexsort((vals, keys))
    k, v = keys[order], vals[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(k)) + 1])
    return k[starts], np.minimum.reduceat(v, starts)


def connected_components(
    pairs: rd.Dataset,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 16,
    nshards: int = 64,
    allow_partial: bool = False,
) -> rd.Dataset:
    """(node, component) for every node appearing in ``pairs``;
    ``component`` is the component's MINIMUM node id (deterministic,
    engine-portable — the same convention SQL recursive CTEs yield).

    Raises ``RuntimeError`` if the fixpoint is NOT reached within
    ``max_rounds`` (labels were still changing): silently returning
    partial labels would under-deduplicate downstream.  Pass
    ``allow_partial=True`` to accept a bounded-rounds approximation."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import shard_of

    def sym(b: pa.Table) -> pa.Table:
        a = b[id_a].combine_chunks().cast(pa.int64())
        bb = b[id_b].combine_chunks().cast(pa.int64())
        src = pa.concat_arrays([a, bb])
        dst = pa.concat_arrays([bb, a])
        sh = shard_of(src.to_numpy(zero_copy_only=False), nshards)
        return pa.table({"_shard": pa.array(sh.astype(np.int64)),
                         "src": src, "dst": dst,
                         "lbl": pa.nulls(len(src), pa.int64())})

    # block-count discipline: every union adds its inputs' block lists
    # and groupby emits ~input-many blocks, so an iterative loop doubles
    # blocks per round (measured: 3→7→15→…→127 blocks in 6 rounds, wall
    # ×2/round from per-block scheduling alone).  Repartitioning the
    # label frontier to a FIXED nshards blocks each round keeps the
    # per-round cost constant.
    edges = (pairs.map_batches(sym, batch_format="pyarrow")
             .repartition(nshards).materialize())

    # initial labels: one (node, node) row per distinct node, built with
    # the same shard-grouped vectorized pass the rounds use
    def init_shard(group: pa.Table) -> pa.Table:
        u = pc.unique(group["src"]).to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(u), "lbl": pa.array(u)})

    labels = (edges.groupby("_shard")
              .map_groups(init_shard, batch_format="pyarrow")
              .materialize())

    def lbl_sum(ds: rd.Dataset) -> int:
        v = ds.aggregate(Sum("lbl"))["sum(lbl)"]
        return 0 if v is None else int(v)  # None ⇔ empty dataset

    if lbl_sum(labels) == 0 and labels.count() == 0:
        # no edges at all: legitimate no-duplicates case, empty result
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "component": pa.array([], pa.int64())}))

    def lbl_as_join_rows(b: pa.Table) -> pa.Table:
        n = b["node"].combine_chunks()
        sh = shard_of(n.to_numpy(zero_copy_only=False), nshards)
        return pa.table({"_shard": pa.array(sh.astype(np.int64)),
                         "src": n, "dst": pa.nulls(b.num_rows, pa.int64()),
                         "lbl": b["lbl"]})

    def join_shard(group: pa.Table) -> pa.Table:
        """Stamp each edge with its src's current label → (node=dst, lbl)."""
        is_lbl = pc.is_valid(group["lbl"])
        lbls = group.filter(is_lbl)
        egs = group.filter(pc.invert(is_lbl))
        if lbls.num_rows == 0 or egs.num_rows == 0:
            return pa.table({"node": pa.nulls(0, pa.int64()),
                             "lbl": pa.nulls(0, pa.int64())})
        ln = lbls["src"].combine_chunks().to_numpy(zero_copy_only=False)
        lv = lbls["lbl"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ln)
        ln, lv = ln[order], lv[order]
        es = egs["src"].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ln, es)
        # every edge src has a label row by construction (same shards)
        return pa.table({"node": egs["dst"],
                         "lbl": pa.array(lv[idx])})

    def lbl_as_combine_rows(b: pa.Table) -> pa.Table:
        n = b["node"].combine_chunks()
        sh = shard_of(n.to_numpy(zero_copy_only=False), nshards)
        return b.append_column("_shard", pa.array(sh.astype(np.int64)))

    def combine_shard(group: pa.Table) -> pa.Table:
        n = group["node"].combine_chunks().to_numpy(zero_copy_only=False)
        v = group["lbl"].combine_chunks().to_numpy(zero_copy_only=False)
        k, mv = _min_by_key(n, v)
        return pa.table({"node": pa.array(k), "lbl": pa.array(mv)})

    prev_sum = lbl_sum(labels)
    converged = False
    for _ in range(max_rounds):
        msgs = (labels.map_batches(lbl_as_join_rows, batch_format="pyarrow")
                .union(edges)
                .groupby("_shard")
                .map_groups(join_shard, batch_format="pyarrow"))
        labels = (labels.union(msgs)
                  .map_batches(lbl_as_combine_rows, batch_format="pyarrow")
                  .groupby("_shard")
                  .map_groups(combine_shard, batch_format="pyarrow")
                  .repartition(nshards)
                  .materialize())
        cur = lbl_sum(labels)
        if cur == prev_sum:          # monotone fixpoint reached
            converged = True
            break
        prev_sum = cur
    if not converged and not allow_partial:
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} "
            "rounds (labels still decreasing) — the graph's diameter "
            "exceeds max_rounds; raise max_rounds or pass "
            "allow_partial=True for a bounded approximation")

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "component": b["lbl"]})

    return labels.map_batches(rename, batch_format="pyarrow")


def cluster_dedup_keepers(
    pairs: rd.Dataset,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 16,
    nshards: int = 64,
    allow_partial: bool = False,
) -> rd.Dataset:
    """From verified near-dup pairs, compute the ids to REMOVE so that
    exactly the minimum id of every duplicate CLUSTER (transitive
    closure) survives: one (remove_id) row per non-minimum member."""
    comps = connected_components(pairs, id_a, id_b,
                                 max_rounds=max_rounds, nshards=nshards,
                                 allow_partial=allow_partial)

    def removals(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["node"], b["component"])
        return pa.table({"remove_id": b.filter(pc.invert(keep))["node"]})

    return comps.map_batches(removals, batch_format="pyarrow")
