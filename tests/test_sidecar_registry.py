"""P72 sidecar registry: builders self-register; maintain_container
converges every sidecar in one verb, diff-cheap (no rebuild fallback)
because refresh runs before the retention sweep."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    decode_dataset,
    encode_dataset,
)
from parquet2_ray.pipelines.sidecar_registry import (
    list_sidecars,
    refresh_sidecars,
    register_sidecar,
    unregister_sidecar,
)

N = 300


def _table():
    rng = np.random.default_rng(31)
    return pa.table({
        "doc_id": pa.array(np.arange(N, dtype=np.int64)),
        "text": pa.array([f"word{i % 17} common tok{i % 5}"
                          for i in range(N)]),
        "embedding": pa.array(
            [list(map(float, r)) for r in rng.normal(size=(N, 8))],
            pa.list_(pa.float32())),
        "v": pa.array(rng.normal(5, 2, N)),
        "grp": pa.array((np.arange(N) // 75).astype(str)),
    })


@pytest.fixture()
def bound(tmp_path, ray_session):
    """Container with one sidecar of each kind, all registered."""
    from parquet2_ray.pipelines.matview_pipeline import create_agg_view
    from parquet2_ray.pipelines.textindex_pipeline import (
        index_container_text,
    )
    from parquet2_ray.pipelines.vecindex_pipeline import (
        build_vector_index,
    )

    src = str(tmp_path / "src")
    encode_dataset(rd.from_arrow(_table()), src, EncodeOptions(
        group_col="grp", weight_col=None, sort_key="doc_id"))
    tidx = str(tmp_path / "tidx")
    vidx = str(tmp_path / "vidx")
    view = str(tmp_path / "view")
    index_container_text(src, tidx, nshards=8)
    build_vector_index(src, vidx, id_col="doc_id", n_centroids=4)
    create_agg_view(src, view, "grp", {"v": ["sum", "count"]})
    return src, tidx, vidx, view


def test_builders_self_register(bound, ray_session):
    src, tidx, vidx, view = bound
    got = {(e["kind"], e["path"]) for e in list_sidecars(src)}
    assert got == {("text_index", tidx), ("vector_index", vidx),
                   ("agg_view", view)}
    # idempotent re-registration
    register_sidecar(src, "text_index", tidx)
    assert len(list_sidecars(src)) == 3
    unregister_sidecar(src, vidx)
    assert len(list_sidecars(src)) == 2
    register_sidecar(src, "vector_index", vidx)
    with pytest.raises(ValueError, match="unknown sidecar kind"):
        register_sidecar(src, "bloom_cache", "/tmp/x")


def test_maintain_refreshes_all_sidecars_diff_cheap(bound, tmp_path,
                                                    ray_session):
    """DML → maintain: every sidecar converges via its CDC diff (no
    rebuild fallback), because refresh runs before the sweep."""
    from parquet2_ray.pipelines.delete_pipeline import delete_rows
    from parquet2_ray.pipelines.maintain_pipeline import (
        maintain_container,
    )
    from parquet2_ray.pipelines.matview_pipeline import view_status
    from parquet2_ray.pipelines.textindex_pipeline import (
        index_container_text,
        probe_text_index,
    )

    src, tidx, vidx, view = bound
    delete_rows(src, "doc_id", lo=0, hi=49, mode="dv")
    r = maintain_container(src)
    assert set(r["sidecars"]) == {tidx, vidx, view}
    for path, res in r["sidecars"].items():
        assert res.get("refreshed"), (path, res)
        assert not res.get("rebuild") and not res.get("resync"), \
            (path, res)   # diff path, not the fallback
    # text index equals a from-scratch rebuild
    ref = str(tmp_path / "ref")
    index_container_text(src, ref, nshards=8)
    for t in ["word3", "common", "tok1"]:
        assert list(probe_text_index(tidx, [t])) == \
            list(probe_text_index(ref, [t]))
    # view equals the current full aggregate
    from parquet2_ray.pipelines.container_agg import aggregate_clustered

    full = (aggregate_clustered(src, "grp", {"v": ["sum", "count"]})
            .to_pandas().sort_values("grp").reset_index(drop=True))
    vdf = (pd.DataFrame(decode_dataset(view).take_all())
           .drop(columns=["_vbucket"]).sort_values("grp")
           .reset_index(drop=True)[full.columns.tolist()])
    pd.testing.assert_frame_equal(vdf, full)
    assert view_status(view)["behind_txns"] == 0


def test_refresh_reports_broken_sidecar_without_aborting(bound,
                                                         ray_session):
    import shutil

    src, tidx, vidx, view = bound
    shutil.rmtree(tidx)   # simulate a lost index
    res = refresh_sidecars(src)
    assert "error" in res[tidx]
    assert res[view].get("refreshed") is not None  # others still ran


def test_pinned_refresh_is_snapshot_consistent(bound, tmp_path,
                                               ray_session):
    """refresh_sidecars pins ONE source transaction: DML committed
    after the pin must not leak into this refresh — every sidecar
    lands on the pinned snapshot, then a later unpinned refresh
    catches up."""
    from parquet2_ray.pipelines.append_pipeline import append_dataset
    from parquet2_ray.pipelines.container_agg import aggregate_clustered
    from parquet2_ray.pipelines.matview_pipeline import view_status
    from parquet2_ray.pipelines.textindex_pipeline import (
        probe_text_index,
    )
    from parquet2_ray.state import manifest as mf

    src, tidx, vidx, view = bound
    t1_rows = _table().slice(0, 5)
    inc1 = pa.table({
        "doc_id": pa.array([900], pa.int64()),
        "text": pa.array(["pinme common"]),
        "embedding": t1_rows["embedding"].slice(0, 1),
        "v": pa.array([1.0]),
        "grp": pa.array(["a"])})
    append_dataset(rd.from_arrow(inc1), src, append_id="pin-1")
    pin = max(mf.record_txn(r)
              for r in mf.load_manifest(src).values())
    # a second append commits AFTER the pin
    inc2 = pa.table({
        "doc_id": pa.array([901], pa.int64()),
        "text": pa.array(["latecomer common"]),
        "embedding": t1_rows["embedding"].slice(1, 1),
        "v": pa.array([50.0]),
        "grp": pa.array(["a"])})
    append_dataset(rd.from_arrow(inc2), src, append_id="pin-2")

    res = refresh_sidecars(src, to_txn=pin)
    for path, r in res.items():
        assert r.get("refreshed"), (path, r)
        assert r["cursor"] == pin
    # text index: doc 900 searchable, 901 NOT yet
    assert 900 in list(probe_text_index(tidx, ["pinme"]))
    assert 901 not in list(probe_text_index(tidx, ["common"]))
    # view: equals the aggregate AS OF the pin (doc 901's v=50 absent)
    full_pin = (aggregate_clustered(src, "grp",
                                    {"v": ["sum", "count"]},
                                    as_of=pin)
                .to_pandas().sort_values("grp")
                .reset_index(drop=True))
    vdf = (pd.DataFrame(decode_dataset(view).take_all())
           .drop(columns=["_vbucket"]).sort_values("grp")
           .reset_index(drop=True)[full_pin.columns.tolist()])
    pd.testing.assert_frame_equal(vdf, full_pin)
    assert view_status(view)["behind_txns"] > 0   # knows it's behind

    # unpinned refresh catches up to current
    res2 = refresh_sidecars(src)
    for path, r in res2.items():
        assert r.get("refreshed"), (path, r)
    assert 901 in list(probe_text_index(tidx, ["common"]))
    assert view_status(view)["behind_txns"] == 0
