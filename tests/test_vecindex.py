"""P69 persisted IVF-Flat vector index: build / search / append."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    encode_dataset,
)
from parquet2_ray.pipelines.vecindex_pipeline import (
    ann_search_index,
    append_vector_index,
    build_vector_index,
)
from parquet2_ray.stages.similarity import ann_topk

N, DIM = 400, 16


def _emb_table() -> pa.Table:
    rng = np.random.default_rng(23)
    m = rng.normal(size=(N, DIM))
    return pa.table({
        "vec_id": pa.array(np.arange(N, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in m],
                              pa.list_(pa.float32())),
        "label": pa.array((np.arange(N) // 100).astype(np.int32)),
    })


def _queries():
    t = _emb_table()
    q = np.stack([np.asarray(v, np.float64)
                  for v in t["embedding"][:6].to_pylist()])
    return q, [900 + i for i in range(6)]


@pytest.fixture()
def container(tmp_path, ray_session):
    out = str(tmp_path / "cont")
    encode_dataset(rd.from_arrow(_emb_table()), out, EncodeOptions(
        group_col="label", weight_col=None, sort_key="vec_id"))
    return out


def test_nprobe_all_equals_exact(container, tmp_path, ray_session):
    idx = str(tmp_path / "idx")
    stats = build_vector_index(container, idx, n_centroids=8,
                               subshards=2)
    assert stats["vectors"] == N
    q, qids = _queries()
    exact = ann_topk(rd.from_arrow(_emb_table()), q, qids, k=7)
    got = ann_search_index(idx, q, qids, k=7, nprobe=8)
    assert got.equals(exact)


def test_low_nprobe_recall(container, tmp_path, ray_session):
    idx = str(tmp_path / "idx")
    build_vector_index(container, idx, n_centroids=8)
    q, qids = _queries()
    exact = ann_topk(rd.from_arrow(_emb_table()), q, qids, k=5)
    part = ann_search_index(idx, q, qids, k=5, nprobe=3)
    ex = set(zip(exact["query_id"].to_pylist(),
                 exact["vec_id"].to_pylist()))
    pr = set(zip(part["query_id"].to_pylist(),
                 part["vec_id"].to_pylist()))
    recall = len(ex & pr) / len(ex)
    assert recall >= 0.5   # approximate, but must beat random (~3/8)
    # every query still returns a full k (probed cells are non-empty
    # here), and ranks are 1..k per query
    assert part.num_rows == len(qids) * 5


def test_append_converges_to_full(container, tmp_path, ray_session):
    t = _emb_table()
    half = str(tmp_path / "half")
    encode_dataset(rd.from_arrow(t.slice(0, N // 2)), half,
                   EncodeOptions(group_col="label", weight_col=None,
                                 sort_key="vec_id"))
    idx = str(tmp_path / "idx")
    build_vector_index(half, idx, n_centroids=8, subshards=2, seed=17)
    r = append_vector_index(
        rd.from_arrow(t.slice(N // 2).select(["vec_id", "embedding"])),
        idx)
    assert r["added_vectors"] == N - N // 2
    q, qids = _queries()
    exact = ann_topk(rd.from_arrow(t), q, qids, k=5)
    assert ann_search_index(idx, q, qids, k=5, nprobe=8).equals(exact)


def test_append_idempotent_by_id(container, tmp_path, ray_session):
    idx = str(tmp_path / "idx")
    build_vector_index(container, idx, n_centroids=4)
    t = _emb_table()
    r = append_vector_index(
        rd.from_arrow(t.slice(0, 50).select(["vec_id", "embedding"])),
        idx)
    assert r["added_vectors"] == 0   # same ids, replaced in place
    q, qids = _queries()
    exact = ann_topk(rd.from_arrow(t), q, qids, k=5)
    assert ann_search_index(idx, q, qids, k=5, nprobe=4).equals(exact)


def test_rebuild_clears_stale_cells(container, tmp_path, ray_session):
    idx = str(tmp_path / "idx")
    build_vector_index(container, idx, n_centroids=8, subshards=2)
    # rebuild with fewer centroids: old high-numbered cell files must
    # not survive to pollute searches
    build_vector_index(container, idx, n_centroids=2, subshards=1)
    q, qids = _queries()
    exact = ann_topk(rd.from_arrow(_emb_table()), q, qids, k=5)
    assert ann_search_index(idx, q, qids, k=5, nprobe=2).equals(exact)


def test_empty_container_raises(tmp_path, ray_session):
    out = str(tmp_path / "c0")
    t = _emb_table().slice(0, 3)
    encode_dataset(rd.from_arrow(t), out, EncodeOptions(
        group_col="label", weight_col=None, sort_key="vec_id"))
    idx = str(tmp_path / "i0")
    # tiny container still builds (k clamps to sample size)
    stats = build_vector_index(out, idx, n_centroids=8)
    assert stats["vectors"] == 3


def test_append_moved_embedding_purges_old_cell(container, tmp_path,
                                                ray_session):
    """Code-review regression: a re-appended id whose new embedding
    maps to a DIFFERENT centroid must not leave a stale copy in the
    old cell (append's replace is cell-global)."""
    idx = str(tmp_path / "idx")
    build_vector_index(container, idx, n_centroids=8, subshards=2)
    t = _emb_table()
    moved = pa.table({
        "vec_id": pa.array([20], pa.int64()),
        "embedding": pa.array(
            [[-float(x) for x in t["embedding"][20].as_py()]],
            pa.list_(pa.float32()))})
    r = append_vector_index(rd.from_arrow(moved), idx)
    assert r["added_vectors"] == 0   # replaced, net zero
    # exact reference over the table with row 20 replaced
    import pandas as pd

    df = t.to_pandas()
    df.at[20, "embedding"] = moved["embedding"][0].as_py()
    q, qids = _queries()
    ref = ann_topk(rd.from_arrow(pa.Table.from_pandas(
        df[["vec_id", "embedding"]]).set_column(
            1, "embedding", pa.array(df["embedding"].tolist(),
                                     pa.list_(pa.float32())))),
        q, qids, k=7)
    got = ann_search_index(idx, q, qids, k=7, nprobe=8)
    assert got.equals(ref)
    # and id 20 appears exactly once across all cell files
    import pyarrow.parquet as pq
    from parquet2_ray.state import fsio

    hits = 0
    for name in fsio.listdir(idx):
        if name.startswith("cell-"):
            tt = pq.read_table(f"{idx}/{name}")
            hits += int((tt["vec_id"].to_numpy() == 20).sum())
    assert hits == 1


def test_vec_index_on_object_store_uri(container, tmp_path,
                                       ray_session):
    """Index files commit through fsio: a file:// URI exercises the
    pyarrow-fs write/read/list path (the object-store route)."""
    idx = "file://" + str(tmp_path / "fsvidx")
    build_vector_index(container, idx, n_centroids=4, subshards=2)
    q, qids = _queries()
    exact = ann_topk(rd.from_arrow(_emb_table()), q, qids, k=5)
    assert ann_search_index(idx, q, qids, k=5, nprobe=4).equals(exact)
