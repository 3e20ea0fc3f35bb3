"""Distributed connected components vs a union-find reference."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from parquet2_ray.stages.components import (
    cluster_dedup_keepers,
    connected_components,
)


def _uf_reference(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    comp = {}
    for v in list(parent):
        r = find(v)
        comp.setdefault(r, []).append(v)
    out = {}
    for members in comp.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def _pairs_ds(edges):
    a = pa.array([e[0] for e in edges], pa.int64())
    b = pa.array([e[1] for e in edges], pa.int64())
    return rd.from_arrow(pa.table({"id_a": a, "id_b": b}))


def test_components_chain_and_clique(ray_session):
    # chain 1-2-3-4 (diameter 3) + clique {10,11,12} + isolated pair
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (7, 20)]
    got = (connected_components(_pairs_ds(edges), nshards=4).to_pandas()
           .set_index("node")["component"].to_dict())
    assert got == _uf_reference(edges)


def test_components_random_graph_matches_union_find(ray_session):
    # dense-ish random graph: duplicate clusters are near-cliques, so
    # the realistic diameter (and the per-round Ray fixed cost × rounds)
    # stays small; the chain test above covers long-path propagation
    rng = np.random.default_rng(3)
    nodes = rng.choice(200, size=60, replace=False)
    edges = [(int(a), int(b)) for a, b in
             zip(rng.choice(nodes, 80), rng.choice(nodes, 80))
             if a != b]
    got = (connected_components(_pairs_ds(edges), max_rounds=24, nshards=4)
           .to_pandas().set_index("node")["component"].to_dict())
    assert got == _uf_reference(edges)


def test_cluster_dedup_keepers_transitive(ray_session):
    # chain a-b, b-c: pairwise id_b-removal keeps {a}; cluster dedup
    # must agree — exactly the component minimum survives
    edges = [(5, 9), (9, 2)]  # component {2, 5, 9}, min = 2
    rm = sorted(cluster_dedup_keepers(_pairs_ds(edges), nshards=4)
                .to_pandas()["remove_id"].tolist())
    assert rm == [5, 9]


def test_dedup_corpus_cluster_exact_chain(ray_session):
    """A near-dup CHAIN (a~b, b~c, a!~c at candidate level) must
    collapse to the cluster minimum under cluster_exact=True."""
    import pandas as pd

    from parquet2_ray.pipelines.dedup_pipeline import dedup_corpus

    base = "the quick brown fox jumps over the lazy dog " * 4
    texts = {
        1: base + "alpha beta gamma delta",
        2: base + "alpha beta gamma EPSILON",   # near 1
        3: base + "alpha beta ZETA EPSILON",    # near 2, farther from 1
        9: "a completely different document with its own words " * 3,
    }
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}))
    out = dedup_corpus(ds, candidate_threshold=0.4, exact_threshold=0.4,
                       nshards=8, cluster_exact=True).to_pandas()
    kept = sorted(out["doc_id"].tolist())
    # whatever the verified pair set is, transitive closure keeps only
    # the minimum of the {1,2,3} cluster plus the unrelated doc
    assert kept == [1, 9]


def test_components_nonconvergence_raises(ray_session):
    # 8-node chain with max_rounds=2: labels cannot reach the far end
    edges = [(i, i + 1) for i in range(8)]
    import pytest as _pt
    with _pt.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs_ds(edges), max_rounds=2,
                             nshards=2).to_pandas()
    # allow_partial accepts the bounded approximation
    out = connected_components(_pairs_ds(edges), max_rounds=2, nshards=2,
                               allow_partial=True).to_pandas()
    assert len(out) == 9


def test_components_empty_pairs(ray_session):
    import pyarrow as pa

    empty = rd.from_arrow(pa.table({"id_a": pa.array([], pa.int64()),
                                    "id_b": pa.array([], pa.int64())}))
    out = connected_components(empty, nshards=2).to_pandas()
    assert len(out) == 0
    rm = cluster_dedup_keepers(empty, nshards=2).to_pandas()
    assert len(rm) == 0
