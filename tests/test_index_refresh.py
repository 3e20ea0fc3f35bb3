"""P71 CDC-driven index maintenance: text + vector indexes converge
to the container's current snapshot via row_changes, like replicas
(P66) and materialized views (P70)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    encode_dataset,
)

# ------------------------- text index -------------------------------

TEXTS = [
    "alpha beta gamma", "beta delta", "gamma epsilon", "alpha zeta",
    "delta epsilon zeta", "alpha beta",
]


def _docs_table():
    return pa.table({
        "doc_id": pa.array(range(1, len(TEXTS) + 1), pa.int64()),
        "text": pa.array(TEXTS),
        "grp": pa.array(["a"] * 3 + ["b"] * 3),
    })


@pytest.fixture()
def text_setup(tmp_path, ray_session):
    src = str(tmp_path / "src")
    encode_dataset(rd.from_arrow(_docs_table()), src, EncodeOptions(
        group_col="grp", weight_col=None, sort_key="doc_id"))
    idx = str(tmp_path / "idx")
    from parquet2_ray.pipelines.textindex_pipeline import (
        index_container_text,
    )

    index_container_text(src, idx, nshards=8)
    return src, idx


def _probe_all(idx, terms):
    from parquet2_ray.pipelines.textindex_pipeline import (
        probe_text_index,
    )

    return {t: list(probe_text_index(idx, [t])) for t in terms}


def _rebuilt_reference(src, tmp_path, name):
    from parquet2_ray.pipelines.textindex_pipeline import (
        index_container_text,
    )

    ref = str(tmp_path / name)
    index_container_text(src, ref, nshards=8)
    return ref


TERMS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "nu"]


def test_text_refresh_tracks_dml(text_setup, tmp_path, ray_session):
    from parquet2_ray.pipelines.append_pipeline import append_dataset
    from parquet2_ray.pipelines.delete_pipeline import delete_rows
    from parquet2_ray.pipelines.textindex_pipeline import (
        refresh_text_index,
    )
    from parquet2_ray.pipelines.update_pipeline import update_rows

    src, idx = text_setup
    inc = pa.table({"doc_id": pa.array([7, 8], pa.int64()),
                    "text": pa.array(["nu alpha", "nu beta"]),
                    "grp": pa.array(["c", "c"])})
    append_dataset(rd.from_arrow(inc), src, append_id="ti-r1")
    delete_rows(src, "doc_id", values=[2], mode="dv")
    update_rows(src, "doc_id", {"text": "zeta only"}, values=[1])
    r = refresh_text_index(idx)
    assert r["refreshed"] and r["purged_docs"] == 2  # doc 2 + doc 1
    ref = _rebuilt_reference(src, tmp_path, "ref")
    assert _probe_all(idx, TERMS) == _probe_all(ref, TERMS)
    # second refresh is a no-op
    assert refresh_text_index(idx)["refreshed"] is False


def test_text_refresh_idempotent_after_crash(text_setup, tmp_path,
                                             ray_session):
    import json

    from parquet2_ray.pipelines.delete_pipeline import delete_rows
    from parquet2_ray.pipelines.textindex_pipeline import (
        _meta_path,
        refresh_text_index,
    )
    from parquet2_ray.state import fsio

    src, idx = text_setup
    delete_rows(src, "doc_id", values=[3, 4])
    refresh_text_index(idx)
    want = _probe_all(idx, TERMS)
    meta = json.loads(fsio.read_bytes(_meta_path(idx)))
    meta["cursor"] = 0           # crash before the cursor write
    fsio.atomic_write(_meta_path(idx), json.dumps(meta).encode(),
                      fsync=False)
    assert refresh_text_index(idx)["refreshed"]
    assert _probe_all(idx, TERMS) == want


def test_text_refresh_swept_window_rebuilds(text_setup, tmp_path,
                                            ray_session):
    from parquet2_ray.pipelines.compact_pipeline import (
        compact_container,
    )
    from parquet2_ray.pipelines.delete_pipeline import delete_rows
    from parquet2_ray.pipelines.textindex_pipeline import (
        refresh_text_index,
    )

    src, idx = text_setup
    delete_rows(src, "doc_id", values=[5])
    compact_container(src, target_weight=10**9)   # sweeps history
    r = refresh_text_index(idx)
    assert r["refreshed"] and r.get("rebuild")
    ref = _rebuilt_reference(src, tmp_path, "ref")
    assert _probe_all(idx, TERMS) == _probe_all(ref, TERMS)


def test_text_refresh_requires_binding(tmp_path, ray_session):
    from parquet2_ray.pipelines.textindex_pipeline import (
        build_text_index,
        refresh_text_index,
    )

    idx = str(tmp_path / "unbound")
    build_text_index(rd.from_arrow(_docs_table()), idx, nshards=4)
    with pytest.raises(ValueError, match="not bound"):
        refresh_text_index(idx)


# ------------------------ vector index ------------------------------

NV, DIM = 240, 8


def _vec_table(seed=11):
    rng = np.random.default_rng(seed)
    return pa.table({
        "vec_id": pa.array(np.arange(NV, dtype=np.int64)),
        "embedding": pa.array(
            [list(map(float, r)) for r in rng.normal(size=(NV, DIM))],
            pa.list_(pa.float32())),
        "grp": pa.array((np.arange(NV) // 60).astype(str)),
    })


@pytest.fixture()
def vec_setup(tmp_path, ray_session):
    src = str(tmp_path / "vsrc")
    encode_dataset(rd.from_arrow(_vec_table()), src, EncodeOptions(
        group_col="grp", weight_col=None, sort_key="vec_id"))
    idx = str(tmp_path / "vidx")
    from parquet2_ray.pipelines.vecindex_pipeline import (
        build_vector_index,
    )

    build_vector_index(src, idx, n_centroids=6, subshards=2)
    return src, idx


def _exact_topk(src_dir, q, qids, k):
    from parquet2_ray.pipelines.encode_pipeline import decode_dataset
    from parquet2_ray.stages.similarity import ann_topk

    return ann_topk(decode_dataset(
        src_dir, columns=["vec_id", "embedding"]), q, qids, k=k)


def test_vector_refresh_tracks_dml(vec_setup, ray_session):
    from parquet2_ray.pipelines.append_pipeline import append_dataset
    from parquet2_ray.pipelines.delete_pipeline import delete_rows
    from parquet2_ray.pipelines.upsert_pipeline import upsert_rows
    from parquet2_ray.pipelines.vecindex_pipeline import (
        ann_search_index,
        refresh_vector_index,
    )

    src, idx = vec_setup
    t = _vec_table()
    q = np.stack([np.asarray(v, np.float64)
                  for v in t["embedding"][:4].to_pylist()])
    qids = [1, 2, 3, 4]
    # append new vectors, delete some, move one vector to a new cell
    # (via upsert: list columns have no positional UPDATE kernel)
    rng = np.random.default_rng(99)
    inc = pa.table({
        "vec_id": pa.array([1000, 1001], pa.int64()),
        "embedding": pa.array(
            [list(map(float, r)) for r in rng.normal(size=(2, DIM))],
            pa.list_(pa.float32())),
        "grp": pa.array(["z", "z"])})
    append_dataset(rd.from_arrow(inc), src, append_id="vi-r1")
    delete_rows(src, "vec_id", lo=0, hi=9, mode="dv")
    new_emb = [float(x) for x in -np.asarray(
        t["embedding"][20].as_py(), np.float64)]
    moved = pa.table({
        "vec_id": pa.array([20], pa.int64()),
        "embedding": pa.array([new_emb], pa.list_(pa.float32())),
        "grp": pa.array(["0"])})
    upsert_rows(src, rd.from_arrow(moved), "vec_id",
                upsert_id="vi-move-20")
    r = refresh_vector_index(idx)
    assert r["refreshed"]
    got = ann_search_index(idx, q, qids, k=6, nprobe=6)
    assert got.equals(_exact_topk(src, q, qids, 6))


def test_vector_search_after_delete_without_refresh(vec_setup,
                                                    ray_session):
    """VERDICT r4 #7: between a delete and the next sidecar refresh the
    index still holds the deleted vectors — the read-time delete mask
    must keep them out of every result, and the merge must still
    return k LIVE ids (the mask runs before the local top-k)."""
    from parquet2_ray.pipelines.delete_pipeline import delete_rows
    from parquet2_ray.pipelines.vecindex_pipeline import (
        ann_search_index,
        refresh_vector_index,
    )

    src, idx = vec_setup
    t = _vec_table()
    # query AT a soon-deleted vector: its self-match would be rank 1
    q = np.stack([np.asarray(t["embedding"][7].as_py(), np.float64)])
    qids = [900]
    before = ann_search_index(idx, q, qids, k=5, nprobe=6)
    assert before["vec_id"][0].as_py() == 7  # self is rank 1

    delete_rows(src, "vec_id", lo=0, hi=9, mode="dv")
    # NO refresh: the cell files still hold ids 0..9
    got = ann_search_index(idx, q, qids, k=5, nprobe=6)
    live = set(got["vec_id"].to_pylist())
    assert not (live & set(range(10)))
    assert len(live) == 5            # k live ids despite the mask
    # matches the post-delete exact answer
    want = _exact_topk(src, q, qids, k=5)
    assert got.equals(want)
    # check_deletes=False reproduces the stale (pre-refresh) behavior
    stale = ann_search_index(idx, q, qids, k=5, nprobe=6,
                             check_deletes=False)
    assert stale["vec_id"][0].as_py() == 7
    # after refresh the mask is a no-op and results are unchanged
    refresh_vector_index(idx)
    after = ann_search_index(idx, q, qids, k=5, nprobe=6)
    assert after.equals(want)


def test_vector_refresh_noop_and_idempotent(vec_setup, ray_session):
    import json

    from parquet2_ray.pipelines.delete_pipeline import delete_rows
    from parquet2_ray.pipelines.vecindex_pipeline import (
        _meta_path,
        ann_search_index,
        refresh_vector_index,
    )
    from parquet2_ray.state import fsio

    src, idx = vec_setup
    assert refresh_vector_index(idx)["refreshed"] is False
    delete_rows(src, "vec_id", lo=100, hi=150)
    refresh_vector_index(idx)
    t = _vec_table()
    q = np.stack([np.asarray(v, np.float64)
                  for v in t["embedding"][:3].to_pylist()])
    want = ann_search_index(idx, q, [1, 2, 3], k=5, nprobe=6)
    meta = json.loads(fsio.read_bytes(_meta_path(idx)))
    meta["cursor"] = 0
    fsio.atomic_write(_meta_path(idx), json.dumps(meta).encode(),
                      fsync=False)
    assert refresh_vector_index(idx)["refreshed"]
    got = ann_search_index(idx, q, [1, 2, 3], k=5, nprobe=6)
    assert got.equals(want)
    assert got.equals(_exact_topk(src, q, [1, 2, 3], 5))


def test_vector_refresh_swept_window_rebuilds(vec_setup, ray_session):
    from parquet2_ray.pipelines.compact_pipeline import (
        compact_container,
    )
    from parquet2_ray.pipelines.delete_pipeline import delete_rows
    from parquet2_ray.pipelines.vecindex_pipeline import (
        ann_search_index,
        refresh_vector_index,
    )

    src, idx = vec_setup
    delete_rows(src, "vec_id", lo=0, hi=29)
    compact_container(src, target_weight=10**9)
    r = refresh_vector_index(idx)
    assert r["refreshed"] and r.get("rebuild")
    t = _vec_table()
    q = np.stack([np.asarray(v, np.float64)
                  for v in t["embedding"][40:43].to_pylist()])
    got = ann_search_index(idx, q, [1, 2, 3], k=5, nprobe=6)
    assert got.equals(_exact_topk(src, q, [1, 2, 3], 5))
