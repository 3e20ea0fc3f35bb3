"""P70 incrementally-maintained aggregate materialized view."""

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from parquet2_ray.pipelines.container_agg import aggregate_clustered
from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    decode_dataset,
    encode_dataset,
)
from parquet2_ray.pipelines.matview_pipeline import (
    create_agg_view,
    refresh_agg_view,
    view_status,
)

AGGS = {"v": ["sum", "count", "mean", "min"]}


def _source_table(n=3000, seed=5):
    rng = np.random.default_rng(seed)
    return pa.table({
        "uid": pa.array(rng.integers(0, 120, n)),
        "v": pa.array(rng.normal(10, 3, n)),
        "grp": pa.array((np.arange(n) // 750).astype(str)),
    })


@pytest.fixture()
def src(tmp_path, ray_session):
    d = str(tmp_path / "src")
    encode_dataset(rd.from_arrow(_source_table()), d, EncodeOptions(
        group_col="grp", weight_col=None, sort_key="uid"))
    return d


def _full(src):
    return (aggregate_clustered(src, "uid", AGGS).to_pandas()
            .sort_values("uid").reset_index(drop=True))


def _view_df(view):
    df = pd.DataFrame(decode_dataset(view).take_all())
    return (df.drop(columns=["_vbucket"]).sort_values("uid")
            .reset_index(drop=True)[_full_cols()])


def _full_cols():
    return ["uid", "v_sum", "v_count", "v_mean", "v_min"]


def test_create_matches_full_aggregate(src, tmp_path, ray_session):
    view = str(tmp_path / "view")
    r = create_agg_view(src, view, "uid", AGGS, target_rows=40)
    assert r["groups"] == _full(src).shape[0]
    pd.testing.assert_frame_equal(_view_df(view), _full(src))


def test_refresh_tracks_mixed_dml(src, tmp_path, ray_session):
    from parquet2_ray.pipelines.append_pipeline import append_dataset
    from parquet2_ray.pipelines.delete_pipeline import delete_rows
    from parquet2_ray.pipelines.update_pipeline import update_rows

    view = str(tmp_path / "view")
    create_agg_view(src, view, "uid", AGGS, target_rows=40)
    # append: brand-new groups + additions to existing groups
    inc = pa.table({"uid": pa.array([500, 501, 3, 7]),
                    "v": pa.array([1.0, 2.0, 3.0, 4.0]),
                    "grp": pa.array(["z"] * 4)})
    append_dataset(rd.from_arrow(inc), src, append_id="mv-t1")
    # delete: groups 50..55 vanish entirely (dv mode)
    delete_rows(src, "uid", lo=50, hi=55, mode="dv")
    # update: shift every v in groups 10..12
    update_rows(src, "uid", {"v": 99.0}, lo=10, hi=12)
    r = refresh_agg_view(view)
    assert r["refreshed"] and r["deleted_groups"] >= 1
    pd.testing.assert_frame_equal(_view_df(view), _full(src))
    # second refresh is a no-op
    assert refresh_agg_view(view)["refreshed"] is False
    assert view_status(view)["behind_txns"] == 0


def test_refresh_is_idempotent_after_crash(src, tmp_path, ray_session):
    """A crash between the upsert/delete commits and the cursor write
    re-runs the same window; the view converges to the same state."""
    from parquet2_ray.pipelines.append_pipeline import append_dataset
    from parquet2_ray.pipelines.matview_pipeline import _view_meta_path
    from parquet2_ray.state import fsio

    view = str(tmp_path / "view")
    create_agg_view(src, view, "uid", AGGS, target_rows=40)
    inc = pa.table({"uid": pa.array([7, 900]),
                    "v": pa.array([5.0, 6.0]),
                    "grp": pa.array(["z", "z"])})
    append_dataset(rd.from_arrow(inc), src, append_id="mv-t2")
    refresh_agg_view(view)
    want = _view_df(view)
    # simulate the crash: rewind the cursor as if it never committed
    meta = json.loads(fsio.read_bytes(_view_meta_path(view)))
    meta["cursor"] = 0
    fsio.atomic_write(_view_meta_path(view),
                      json.dumps(meta).encode(), fsync=False)
    r = refresh_agg_view(view)   # re-runs the whole window
    assert r["refreshed"]
    pd.testing.assert_frame_equal(_view_df(view), want)
    pd.testing.assert_frame_equal(_view_df(view), _full(src))


def test_rewrite_only_window_advances_cursor(src, tmp_path, ray_session):
    """Compaction commits transactions but no net row changes — the
    refresh advances the cursor without touching the view."""
    from parquet2_ray.pipelines.compact_pipeline import compact_container

    view = str(tmp_path / "view")
    create_agg_view(src, view, "uid", AGGS, target_rows=40)
    before = _view_df(view)
    # gc=False keeps the cursor snapshot intact → a diff-able window
    compact_container(src, target_weight=10**9, gc=False)
    r = refresh_agg_view(view)
    assert r["refreshed"] and r["affected"] == 0
    assert view_status(view)["behind_txns"] == 0
    pd.testing.assert_frame_equal(_view_df(view), before)


def test_swept_cursor_falls_back_to_resync(src, tmp_path, ray_session):
    """A retention sweep hollowing the cursor snapshot removes the
    diff window; refresh must full-resync instead of failing."""
    from parquet2_ray.pipelines.append_pipeline import append_dataset
    from parquet2_ray.pipelines.compact_pipeline import compact_container

    view = str(tmp_path / "view")
    create_agg_view(src, view, "uid", AGGS, target_rows=40)
    inc = pa.table({"uid": pa.array([700, 3]),
                    "v": pa.array([1.5, 2.5]),
                    "grp": pa.array(["z", "z"])})
    append_dataset(rd.from_arrow(inc), src, append_id="mv-t3")
    compact_container(src, target_weight=10**9)   # gc sweeps history
    r = refresh_agg_view(view)
    assert r["refreshed"] and r.get("resync")
    pd.testing.assert_frame_equal(_view_df(view), _full(src))
    assert view_status(view)["behind_txns"] == 0


def test_max_affected_guard(src, tmp_path, ray_session):
    from parquet2_ray.pipelines.delete_pipeline import delete_rows

    view = str(tmp_path / "view")
    create_agg_view(src, view, "uid", AGGS, target_rows=40)
    delete_rows(src, "uid", lo=0, hi=60)   # touches ~half the groups
    with pytest.raises(ValueError, match="max_affected"):
        refresh_agg_view(view, max_affected=3)


def test_null_keys_excluded(tmp_path, ray_session):
    t = pa.table({
        "uid": pa.array([1, 1, None, 2], pa.int64()),
        "v": pa.array([1.0, 2.0, 3.0, 4.0]),
        "grp": pa.array(["a"] * 4),
    })
    src = str(tmp_path / "srcn")
    encode_dataset(rd.from_arrow(t), src, EncodeOptions(
        group_col="grp", weight_col=None, sort_key=None))
    view = str(tmp_path / "viewn")
    r = create_agg_view(src, view, "uid", {"v": ["sum"]})
    assert r["groups"] == 2   # null group dropped by contract
    df = pd.DataFrame(decode_dataset(view).take_all())
    assert sorted(df["uid"].tolist()) == [1, 2]


def test_agg_key_values_restriction(src, ray_session):
    """aggregate_clustered(key_values=...) equals the full aggregate
    filtered to those keys — the refresh path's core contract."""
    full = _full(src)
    some = [3, 7, 11, 999]   # 999 absent from the source
    got = (aggregate_clustered(src, "uid", AGGS, key_values=some)
           .to_pandas().sort_values("uid").reset_index(drop=True))
    want = (full[full.uid.isin(some)].reset_index(drop=True))
    pd.testing.assert_frame_equal(got[_full_cols()], want[_full_cols()])


# ------------------------- P76 multi-key views ----------------------

def _mk_source_table(n=2500, seed=19):
    rng = np.random.default_rng(seed)
    return pa.table({
        "uid": pa.array(rng.integers(0, 50, n)),
        "cat": pa.array(np.array(["x", "y", "z"])[rng.integers(0, 3, n)]),
        "v": pa.array(rng.normal(4, 2, n)),
        "grp": pa.array((np.arange(n) // 700).astype(str)),
    })


def _mk_full(src):
    from parquet2_ray.pipelines.container_agg import aggregate_clustered

    return (aggregate_clustered(src, ["uid", "cat"],
                                {"v": ["sum", "count", "min"]})
            .to_pandas().sort_values(["uid", "cat"])
            .reset_index(drop=True))


def _mk_view_df(view):
    df = pd.DataFrame(decode_dataset(view).take_all())
    df = df.drop(columns=["_vbucket", "_vkey"])
    return (df.sort_values(["uid", "cat"]).reset_index(drop=True)
            [["uid", "cat", "v_sum", "v_count", "v_min"]])


def test_multikey_view_create_and_refresh(tmp_path, ray_session):
    from parquet2_ray.pipelines.append_pipeline import append_dataset
    from parquet2_ray.pipelines.delete_pipeline import delete_rows

    src = str(tmp_path / "mks")
    encode_dataset(rd.from_arrow(_mk_source_table()), src,
                   EncodeOptions(group_col="grp", weight_col=None,
                                 sort_key="uid"))
    view = str(tmp_path / "mkv")
    r = create_agg_view(src, view, ["uid", "cat"],
                        {"v": ["sum", "count", "min"]},
                        target_rows=40)
    assert r["groups"] == len(_mk_full(src))
    pd.testing.assert_frame_equal(_mk_view_df(view), _mk_full(src))
    # DML: new (uid, cat) pairs + a uid that vanishes entirely
    inc = pa.table({"uid": pa.array([500, 3]),
                    "cat": pa.array(["q", "x"]),
                    "v": pa.array([1.0, 2.0]),
                    "grp": pa.array(["z", "z"])})
    append_dataset(rd.from_arrow(inc), src, append_id="mk-a1")
    delete_rows(src, "uid", values=[7], mode="dv")
    rr = refresh_agg_view(view)
    assert rr["refreshed"] and rr["deleted_groups"] >= 1
    pd.testing.assert_frame_equal(_mk_view_df(view), _mk_full(src))
    # idempotent no-op
    assert refresh_agg_view(view)["refreshed"] is False


def test_multikey_group_vanishes_but_primary_survives(tmp_path,
                                                      ray_session):
    """Deleting every row of ONE (uid, cat) group while the uid keeps
    other cats must delete exactly that composite group."""
    from parquet2_ray.pipelines.delete_pipeline import delete_rows

    src = str(tmp_path / "mps")
    t = pa.table({
        "uid": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "cat": pa.array(["x", "x", "y", "x", "y"]),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
        "eid": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "grp": pa.array(["a"] * 5),
    })
    encode_dataset(rd.from_arrow(t), src, EncodeOptions(
        group_col="grp", weight_col=None, sort_key="uid"))
    view = str(tmp_path / "mpv")
    create_agg_view(src, view, ["uid", "cat"], {"v": ["sum"]})
    # remove BOTH (1, x) rows; (1, y) survives
    delete_rows(src, "eid", values=[10, 11])
    rr = refresh_agg_view(view)
    assert rr["deleted_groups"] == 1
    df = _mk_view_df_cols(view)
    assert sorted(map(tuple, df[["uid", "cat"]].values.tolist())) == \
        [(1, "y"), (2, "x"), (2, "y")]


def _mk_view_df_cols(view):
    df = pd.DataFrame(decode_dataset(view).take_all())
    return df.drop(columns=["_vbucket", "_vkey"])


def test_multikey_view_survives_full_turnover(tmp_path, ray_session):
    """Code-review regression: after a refresh touches EVERY group
    (all view rows migrate into refresh-written partitions), the NEXT
    multi-key refresh must still work — gone-detection reads prune by
    the primary's min/max envelope, never by a bloom key that
    refresh-written partitions might lack."""
    from parquet2_ray.pipelines.delete_pipeline import delete_rows
    from parquet2_ray.pipelines.update_pipeline import update_rows

    src = str(tmp_path / "tos")
    t = pa.table({
        "uid": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "cat": pa.array(["x", "y", "x", "y", "x"]),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
        "eid": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "grp": pa.array(["a"] * 5),
    })
    encode_dataset(rd.from_arrow(t), src, EncodeOptions(
        group_col="grp", weight_col=None, sort_key="uid"))
    view = str(tmp_path / "tov")
    create_agg_view(src, view, ["uid", "cat"], {"v": ["sum"]})
    # wide refresh: every group's value changes → full turnover
    update_rows(src, "eid", {"v": 100.0}, lo=10, hi=14)
    assert refresh_agg_view(view)["refreshed"]
    # second data-bearing refresh incl. a vanished composite group
    delete_rows(src, "eid", values=[14])   # (3, x) vanishes
    rr = refresh_agg_view(view)
    assert rr["refreshed"] and rr["deleted_groups"] == 1
    df = _mk_view_df_cols(view)
    assert sorted(map(tuple, df[["uid", "cat"]].values.tolist())) == \
        [(1, "x"), (1, "y"), (2, "x"), (2, "y")]
    assert df["v_sum"].tolist() == [100.0] * 4
