"""P47 aggregate_clustered: shuffle-free group-by over a clustered
container (SURVEY.md §2.10)."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet2_ray.pipelines.container_agg import aggregate_clustered
from parquet2_ray.pipelines.encode_pipeline import EncodeOptions, encode_dataset


def _table(n, seed):
    rng = np.random.default_rng(seed)
    return pa.table({
        "uid": pa.array(
            [None if x < 40 else int(x) for x in
             rng.integers(0, 800, n)], type=pa.int64()),
        "v": pa.array(rng.random(n)),
        "w": pa.array(rng.integers(0, 100, n), type=pa.int64()),
    })


def _oracle(t: pa.Table) -> pa.Table:
    con = duckdb.connect()
    con.register("t", t)
    return con.execute("""
        SELECT uid, sum(v) AS v_sum, avg(v) AS v_mean,
               min(w) AS w_min, max(w) AS w_max, count(w) AS w_count
        FROM t GROUP BY uid ORDER BY uid
    """).arrow()


AGGS = {"v": ["sum", "mean"], "w": ["min", "max", "count"]}


def _check(got: pa.Table, want: pa.Table):
    got = got.select(want.column_names)
    assert got.num_rows == want.num_rows
    for c in want.column_names:
        g = got[c].to_pylist()
        w = want[c].to_pylist()
        for a, b in zip(g, w):
            if isinstance(a, float) and b is not None:
                assert a == pytest.approx(b, rel=1e-12), c
            else:
                assert a == b, c


def test_clustered_aggregate_matches_duckdb(ray_session, tmp_path):
    t = _table(8000, 21)
    src = str(tmp_path / "t.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "c")
    encode_dataset(src, out, EncodeOptions(
        group_col=None, weight_col=None, sort_key="uid", range_key="uid",
        target_rows=1500, fsync=False))
    got = aggregate_clustered(out, "uid", AGGS)
    _check(got, _oracle(t))


def test_unclustered_aggregate_degrades_gracefully(ray_session, tmp_path):
    """Overlapping spans force the combine everywhere — exact results
    either way (the classic two-phase aggregate shape)."""
    t = _table(8000, 22)
    src = str(tmp_path / "t.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "c")
    encode_dataset(src, out, EncodeOptions(
        group_col=None, weight_col="w", sort_key="uid",
        target_weight=60_000, fsync=False))
    got = aggregate_clustered(out, "uid", AGGS)
    _check(got, _oracle(t))


def test_aggregate_validation(ray_session, tmp_path):
    t = _table(100, 23)
    src = str(tmp_path / "t.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "c")
    encode_dataset(src, out, EncodeOptions(
        group_col=None, weight_col=None, sort_key="uid",
        target_rows=1000, fsync=False))
    with pytest.raises(ValueError, match="unsupported aggregate"):
        aggregate_clustered(out, "uid", {"v": ["median"]})


def test_temporal_key_aggregate_with_boundary_duplicates(ray_session,
                                                         tmp_path):
    """Timestamp group keys stab-test in the profiles' ISOFORMAT domain
    (str(datetime) uses a space and mis-orders — regression: boundary
    keys double-counted as final in two partitions).  Only 40 distinct
    timestamps over 6000 rows force every partition edge onto a
    duplicated key."""
    rng = np.random.default_rng(33)
    base = np.datetime64("2024-03-01T00:00:00", "us")
    distinct = base + np.sort(rng.integers(0, 10**9, 40)) \
        .astype("timedelta64[us]")
    ts = distinct[rng.integers(0, 40, 6000)]
    t = pa.table({
        "ts": pa.array(ts),
        "v": pa.array(rng.random(6000)),
    })
    src = str(tmp_path / "t.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "c")
    encode_dataset(src, out, EncodeOptions(
        group_col=None, weight_col=None, sort_key="ts", range_key="ts",
        target_rows=800, fsync=False))
    got = aggregate_clustered(out, "ts", {"v": ["sum", "mean"]})
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
        SELECT ts, sum(v) AS v_sum, avg(v) AS v_mean
        FROM t GROUP BY ts ORDER BY ts""").arrow()
    assert got.num_rows == want.num_rows == 40
    for c in ("v_sum", "v_mean"):
        for a, b in zip(got[c].to_pylist(), want[c].to_pylist()):
            assert a == pytest.approx(b, rel=1e-12)


def test_multi_key_group_by(tmp_path, ray_session):
    """P75: GROUP BY (k1, k2) over a container — finality by the first
    key's spans, verified against DuckDB."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd2
    from parquet2_ray.pipelines.container_agg import aggregate_clustered
    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions,
        encode_dataset,
    )

    rng = np.random.default_rng(41)
    n = 3000
    t = pa.table({
        "k1": pa.array(rng.integers(0, 40, n)),
        "k2": pa.array(np.array(["x", "y", "z"])[rng.integers(0, 3, n)]),
        "v": pa.array(rng.normal(7, 2, n)),
        "grp": pa.array((np.arange(n) // 750).astype(str)),
    })
    out = str(tmp_path / "mk")
    encode_dataset(rd2.from_arrow(t), out, EncodeOptions(
        group_col="grp", weight_col=None, sort_key="k1"))
    got = aggregate_clustered(
        out, ["k1", "k2"],
        {"v": ["sum", "count", "mean", "min"]}).to_pandas()
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute(
        "SELECT k1, k2, SUM(v) AS v_sum, COUNT(v) AS v_count, "
        "AVG(v) AS v_mean, MIN(v) AS v_min FROM t "
        "GROUP BY k1, k2 ORDER BY k1, k2").df()
    got = got[want.columns.tolist()].reset_index(drop=True)
    assert got["k1"].tolist() == want["k1"].tolist()
    assert got["k2"].tolist() == want["k2"].tolist()
    np.testing.assert_allclose(got["v_sum"], want["v_sum"], rtol=1e-12)
    assert got["v_count"].tolist() == want["v_count"].tolist()
    np.testing.assert_allclose(got["v_min"], want["v_min"], rtol=0)
    np.testing.assert_allclose(got["v_mean"], want["v_mean"],
                               rtol=1e-12)
    # key_values restriction works on the PRIMARY key in multi-key mode
    some = aggregate_clustered(out, ["k1", "k2"], {"v": ["count"]},
                               key_values=[3, 7]).to_pandas()
    assert set(some["k1"]) <= {3, 7}
    w2 = want[want.k1.isin([3, 7])]
    assert len(some) == len(w2)
