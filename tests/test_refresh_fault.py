"""Mid-stream crash injection for CDC index refreshes: a refresh that
dies AFTER shard/cell files were rewritten but BEFORE the meta/cursor
write must converge on re-run — updated files re-apply idempotently
(pair-merge max-tf, id purges, absolute meta folds).

Injection points are driver-reachable: the purge task handle is
swapped for a bomber that does the real work THEN raises (the raise
logic ships to the worker inside the test-defined remote), and the
vector path intercepts the driver-side meta write."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    encode_dataset,
)

DOCS = pd.DataFrame({
    "doc_id": list(range(1, 13)),
    "text": [f"w{i % 4} common w{i % 3}" for i in range(12)],
    "grp": ["a"] * 6 + ["b"] * 6,
})


class _Boom(RuntimeError):
    pass


def test_text_refresh_crash_after_purges_converges(tmp_path,
                                                   ray_session,
                                                   monkeypatch):
    """Delete-only window: every shard updates via the purge sweep;
    the bomber applies each purge FOR REAL then raises, so the crash
    leaves all files updated but the meta/cursor stale — exactly the
    state that skews delta-folded counters (ours are absolute)."""
    from parquet2_ray.pipelines import textindex_pipeline as tip
    from parquet2_ray.pipelines.delete_pipeline import delete_rows
    from parquet2_ray.pipelines.textindex_pipeline import (
        _index_meta,
        index_container_text,
        probe_text_index,
        ranked_search_index,
        refresh_text_index,
    )

    src = str(tmp_path / "src")
    encode_dataset(rd.from_arrow(pa.Table.from_pandas(DOCS)), src,
                   EncodeOptions(group_col="grp", weight_col=None,
                                 sort_key="doc_id"))
    idx = str(tmp_path / "idx")
    index_container_text(src, idx, nshards=4)
    delete_rows(src, "doc_id", values=[2, 5, 9])

    @ray.remote
    def bomber(index_dir, shard, purge_pair):
        purge, purge_h = purge_pair
        e64 = np.empty(0, dtype=np.uint64)
        ei = np.empty(0, dtype=np.int64)
        tip._apply_shard(index_dir, shard, purge, purge_h,
                         e64, ei, ei, e64, ei, pa.int64())
        raise _Boom("injected crash after the purge write")

    monkeypatch.setattr(tip, "_purge_shard_task", bomber)
    with pytest.raises(Exception):
        refresh_text_index(idx)
    monkeypatch.undo()
    assert int(_index_meta(idx)["cursor"]) == 0   # cursor held back

    # re-run converges to the rebuilt reference, counters included
    assert refresh_text_index(idx)["refreshed"]
    ref = str(tmp_path / "ref")
    index_container_text(src, ref, nshards=4)
    for w in ("w0", "w1", "common"):
        assert list(probe_text_index(idx, [w])) == \
            list(probe_text_index(ref, [w]))
    got = ranked_search_index(idx, ["common"], k=12)
    want = ranked_search_index(ref, ["common"], k=12)
    assert got.equals(want)
    assert _index_meta(idx)["ndocs"] == _index_meta(ref)["ndocs"]
    assert _index_meta(idx)["total_tokens"] == \
        _index_meta(ref)["total_tokens"]


def test_vec_refresh_crash_before_meta_converges(tmp_path, ray_session,
                                                 monkeypatch):
    """Cell files rewritten, then the driver dies on the meta write;
    the re-run must converge (search reads populated cells from the
    FILESYSTEM, and count folds re-derive from file state)."""
    from parquet2_ray.pipelines import vecindex_pipeline as vip
    from parquet2_ray.pipelines.delete_pipeline import delete_rows
    from parquet2_ray.pipelines.encode_pipeline import decode_dataset
    from parquet2_ray.pipelines.vecindex_pipeline import (
        ann_search_index,
        build_vector_index,
        refresh_vector_index,
    )
    from parquet2_ray.stages.similarity import ann_topk

    rng = np.random.default_rng(77)
    n = 120
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(
            [list(map(float, r)) for r in rng.normal(size=(n, 6))],
            pa.list_(pa.float32())),
        "grp": pa.array((np.arange(n) // 30).astype(str)),
    })
    src = str(tmp_path / "vsrc")
    encode_dataset(rd.from_arrow(t), src, EncodeOptions(
        group_col="grp", weight_col=None, sort_key="vec_id"))
    idx = str(tmp_path / "vidx")
    build_vector_index(src, idx, n_centroids=4, subshards=2)
    delete_rows(src, "vec_id", lo=0, hi=39)

    meta_path = vip._meta_path(idx)
    real_write = vip.fsio.atomic_write

    def bomb(path, data, fsync=True):
        if path == meta_path:
            raise _Boom("injected crash on the meta write")
        return real_write(path, data, fsync=fsync)

    monkeypatch.setattr(vip.fsio, "atomic_write", bomb)
    with pytest.raises(_Boom):
        refresh_vector_index(idx)
    monkeypatch.undo()

    assert refresh_vector_index(idx)["refreshed"]
    q = np.stack([np.asarray(v, np.float64)
                  for v in t["embedding"][50:53].to_pylist()])
    exact = ann_topk(decode_dataset(
        src, columns=["vec_id", "embedding"]), q, [1, 2, 3], k=5)
    got = ann_search_index(idx, q, [1, 2, 3], k=5, nprobe=4)
    assert got.equals(exact)
