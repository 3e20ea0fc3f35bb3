"""Windowed aggregates: tumbling windows + gap sessionization.

The reference has no time semantics (SURVEY.md §2.7); these operators
are the training-pipeline additions, so the tests are golden-vector
style: tiny hand-computed inputs plus a polars cross-check on a larger
random stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from parquet2_ray.stages.window import _SessionizeShard, sessionize, tumbling_window


def _ts(*seconds):
    return pa.array(np.array(seconds, dtype=np.int64) * 1_000_000,
                    type=pa.int64()).cast(pa.timestamp("us"))


def test_sessionize_shard_golden():
    # user 7: events at t=0, 10, 2000 (gap 1000 → two sessions)
    # user 9: single event
    tbl = pa.table({
        "user_id": pa.array([7, 7, 7, 9], type=pa.int64()),
        "ts": _ts(0, 10, 2000, 5),
    })
    out = _SessionizeShard("ts", "user_id", 1000 * 1_000_000)(tbl)
    got = out.sort_by([("user_id", "ascending"), ("session_id", "ascending")])
    assert got["user_id"].to_pylist() == [7, 7, 9]
    assert got["session_id"].to_pylist() == [0, 1, 0]
    assert got["session_start_s"].to_pylist() == [0, 2000, 5]
    assert got["session_end_s"].to_pylist() == [10, 2000, 5]
    assert got["n_events"].to_pylist() == [3 - 1, 1, 1]


def test_sessionize_gap_boundary_inclusive():
    # diff == gap stays in the SAME session (strictly-greater splits)
    tbl = pa.table({
        "user_id": pa.array([1, 1], type=pa.int64()),
        "ts": _ts(0, 100),
    })
    out = _SessionizeShard("ts", "user_id", 100 * 1_000_000)(tbl)
    assert out.num_rows == 1
    assert out["n_events"][0].as_py() == 2


def test_sessionize_unsorted_input_and_ties():
    tbl = pa.table({
        "user_id": pa.array([2, 1, 2, 1], type=pa.int64()),
        "ts": _ts(50, 0, 50, 1),  # user 2 has tied timestamps
    })
    out = _SessionizeShard("ts", "user_id", 10 * 1_000_000)(tbl)
    got = out.sort_by("user_id")
    assert got["user_id"].to_pylist() == [1, 2]
    assert got["n_events"].to_pylist() == [2, 2]


def test_sessionize_empty_group_keeps_schema():
    tbl = pa.table({"user_id": pa.nulls(0, pa.int64()),
                    "ts": pa.nulls(0, pa.timestamp("us"))})
    out = _SessionizeShard("ts", "user_id", 1)(tbl)
    assert out.num_rows == 0
    assert out.column_names == ["user_id", "session_id", "session_start_s",
                                "session_end_s", "n_events"]


def test_sessionize_dataset_matches_polars(ray_session):
    import polars as pl

    rng = np.random.default_rng(11)
    n, users, gap_s = 4000, 37, 600
    uid = rng.integers(0, users, n).astype(np.int64)
    ts_s = rng.integers(0, 3_000_000, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"user_id": pa.array(uid),
                                 "ts": _ts(*ts_s.tolist())}))
    got = (sessionize(ds, gap_s=gap_s, nshards=16).to_pandas()
           .sort_values(["user_id", "session_id"]).reset_index(drop=True))

    # polars reference: sort, diff per user, cumsum of gap breaks
    df = pl.DataFrame({"user_id": uid, "ts": ts_s}).sort(["user_id", "ts"])
    df = df.with_columns(
        ((pl.col("ts").diff().over("user_id") > gap_s)
         .fill_null(False).cum_sum().over("user_id")).alias("session_id"))
    ref = (df.group_by(["user_id", "session_id"])
             .agg(pl.col("ts").min().alias("session_start_s"),
                  pl.col("ts").max().alias("session_end_s"),
                  pl.len().alias("n_events"))
             .sort(["user_id", "session_id"]).to_pandas())
    assert len(got) == len(ref)
    for c in ["user_id", "session_id", "session_start_s",
              "session_end_s", "n_events"]:
        assert (got[c].to_numpy() == ref[c].to_numpy()).all(), c


def test_tumbling_window_golden(ray_session):
    tbl = pa.table({
        "ts": _ts(10, 3599, 3600, 7200),
        "k": ["a", "a", "a", "b"],
        "v": pa.array([1.0, 2.0, 4.0, 8.0]),
    })
    out = (tumbling_window(rd.from_arrow(tbl), ts_col="ts", every_s=3600,
                           keys=("k",), value_col="v")
           .to_pandas().sort_values("window_start").reset_index(drop=True))
    assert out["window_start"].tolist() == [0, 3600, 7200]
    assert out["n_events"].tolist() == [2, 1, 1]
    assert out["sum_value"].tolist() == [3.0, 4.0, 8.0]
    assert out["min_value"].tolist() == [1.0, 4.0, 8.0]
    assert out["max_value"].tolist() == [2.0, 4.0, 8.0]


def test_tumbling_window_pre_epoch_floors_left(ray_session):
    tbl = pa.table({"ts": _ts(-1, 0), "v": pa.array([1.0, 1.0])})
    out = (tumbling_window(rd.from_arrow(tbl), every_s=60, value_col="v")
           .to_pandas().sort_values("window_start"))
    assert out["window_start"].tolist() == [-60, 0]


def test_tumbling_window_count_only(ray_session):
    tbl = pa.table({"ts": _ts(0, 1, 61)})
    out = tumbling_window(rd.from_arrow(tbl), every_s=60).to_pandas()
    assert sorted(out["n_events"].tolist()) == [1, 2]
    assert set(out.columns) == {"window_start", "n_events"}


def test_top_tokens_exact(ray_session):
    from parquet2_ray.stages.text import top_tokens

    tbl = pa.table({"text": ["a b b", "b  c", "a", ""]})
    out = top_tokens(rd.from_arrow(tbl), k=2).to_pandas()
    # b:3, a:2 (double space yields an empty token, filtered)
    assert out["token"].tolist() == ["b", "a"]
    assert out["n"].tolist() == [3, 2]


def test_top_tokens_tie_break_is_total_order(ray_session):
    from parquet2_ray.stages.text import top_tokens

    tbl = pa.table({"text": ["z y x", "x y z"]})
    out = top_tokens(rd.from_arrow(tbl), k=2).to_pandas()
    assert out["token"].tolist() == ["x", "y"]  # all n=2, token asc


def test_sessionize_null_users_are_one_group(ray_session):
    # SQL PARTITION BY: all NULL users form one partition
    tbl = pa.table({
        "user_id": pa.array([None, None, 3], type=pa.int64()),
        "ts": _ts(0, 10, 5),
    })
    out = (sessionize(rd.from_arrow(tbl), gap_s=100, nshards=4)
           .to_pandas())
    nulls = out[out["user_id"].isna()]
    assert len(nulls) == 1 and nulls["n_events"].tolist() == [2]
    real = out[out["user_id"].notna()]
    assert real["user_id"].tolist() == [3]


def test_sessionize_null_ts_dropped(ray_session):
    tbl = pa.table({
        "user_id": pa.array([1, 1], type=pa.int64()),
        "ts": pa.array([5_000_000, None], type=pa.int64()).cast(pa.timestamp("us")),
    })
    out = sessionize(rd.from_arrow(tbl), gap_s=100, nshards=2).to_pandas()
    assert out["n_events"].tolist() == [1]


def test_hopping_window_golden(ray_session):
    from parquet2_ray.stages.window import hopping_window

    # 100s windows hopping every 50s; event at t=120 → windows 100, 50
    tbl = pa.table({"ts": _ts(120, 10)})
    out = (hopping_window(rd.from_arrow(tbl), every_s=100, hop_s=50)
           .to_pandas().sort_values("window_start").reset_index(drop=True))
    assert out["window_start"].tolist() == [-50, 0, 50, 100]
    assert out["n_events"].tolist() == [1, 1, 1, 1]


def test_hopping_equals_tumbling_when_hop_is_span(ray_session):
    from parquet2_ray.stages.window import hopping_window, tumbling_window

    tbl = pa.table({"ts": _ts(10, 70, 130), "v": pa.array([1.0, 2.0, 4.0])})
    h = (hopping_window(rd.from_arrow(tbl), every_s=60, hop_s=60,
                        value_col="v").to_pandas()
         .sort_values("window_start").reset_index(drop=True))
    t = (tumbling_window(rd.from_arrow(tbl), every_s=60, value_col="v")
         .to_pandas().sort_values("window_start").reset_index(drop=True))
    assert h.equals(t)


def test_hopping_window_matches_duckdb(ray_session):
    import duckdb

    from parquet2_ray.stages.window import hopping_window

    rng = np.random.default_rng(13)
    secs = rng.integers(0, 50_000, 2000)
    tbl = pa.table({"ts": _ts(*secs.tolist())})
    out = (hopping_window(rd.from_arrow(tbl), every_s=3600, hop_s=900)
           .to_pandas().sort_values("window_start").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", tbl.to_pandas())
    o = con.execute("""
        SELECT CAST(floor(epoch(ts)/900)*900 - i*900 AS BIGINT) AS window_start,
               count(*) AS n_events
        FROM t CROSS JOIN (SELECT unnest([0,1,2,3]) AS i) s
        GROUP BY 1 ORDER BY 1""").fetchdf()
    assert out["window_start"].tolist() == o["window_start"].tolist()
    assert out["n_events"].tolist() == o["n_events"].tolist()


def test_distinct_count_exact(ray_session):
    from parquet2_ray.stages.window import distinct_count

    tbl = pa.table({
        "g": ["a", "a", "a", "b", "b"],
        "v": pa.array([1, 1, 2, 7, 7], type=pa.int64()),
    })
    out = (distinct_count(rd.from_arrow(tbl), group_col="g", value_col="v")
           .to_pandas().sort_values("g").reset_index(drop=True))
    assert out["g"].tolist() == ["a", "b"]
    assert out["n_distinct"].tolist() == [2, 1]


def test_distinct_count_dedupes_across_batches(ray_session):
    from parquet2_ray.stages.window import distinct_count

    # same (g, v) pair in every block — cross-block dupes must collapse
    tbl = pa.table({"g": ["x"] * 1000, "v": pa.array([42] * 1000,
                                                     type=pa.int64())})
    ds = rd.from_arrow(tbl).repartition(8)
    out = distinct_count(ds, group_col="g", value_col="v").to_pandas()
    assert out["n_distinct"].tolist() == [1]


# ---- HyperLogLog sketch (functions/hll.py + approx_distinct_count) ----

def test_hll_accuracy_and_merge():
    from parquet2_ray.functions.hll import (hll_estimate, hll_merge, hll_of)

    rng = np.random.default_rng(2)
    for n in [100, 10_000, 200_000]:
        vals = pa.array(rng.choice(n * 10, n, replace=False).astype(np.int64))
        err = abs(hll_estimate(hll_of(vals)) - n) / n
        assert err < 0.05, (n, err)
    # union via merge == sketch of the union (registers are max-stable)
    a = pa.array(np.arange(0, 60_000, dtype=np.int64))
    b = pa.array(np.arange(40_000, 100_000, dtype=np.int64))
    u = hll_estimate(hll_merge(hll_of(a), hll_of(b)))
    assert abs(u - 100_000) / 100_000 < 0.05
    # duplicates never move the estimate
    from parquet2_ray.functions.hll import hll_add
    from parquet2_ray.functions.bloom import hash_arrow
    s1 = hll_of(a)
    s2 = hll_add(s1.copy(), hash_arrow(a))
    assert (s1 == s2).all()


def test_hll_string_elements():
    from parquet2_ray.functions.hll import hll_estimate, hll_of

    vals = pa.array([f"doc-{i}" for i in range(5000)])
    assert abs(hll_estimate(hll_of(vals)) - 5000) / 5000 < 0.05


def test_approx_distinct_count_vs_exact(ray_session):
    from parquet2_ray.stages.window import approx_distinct_count, distinct_count

    rng = np.random.default_rng(4)
    n = 50_000
    tbl = pa.table({
        "g": pa.array([f"g{int(v)}" for v in rng.integers(0, 3, n)]),
        "v": pa.array(rng.integers(0, 8000, n).astype(np.int64)),
    })
    ds = rd.from_arrow(tbl).repartition(8)
    approx = (approx_distinct_count(ds, group_col="g", value_col="v")
              .to_pandas().set_index("g")["n_approx"])
    exact = (distinct_count(rd.from_arrow(tbl), group_col="g", value_col="v")
             .to_pandas().set_index("g")["n_distinct"])
    for g in exact.index:
        err = abs(approx[g] - exact[g]) / exact[g]
        assert err < 0.05, (g, approx[g], exact[g])


def test_grouped_quantiles_exact(ray_session):
    from parquet2_ray.stages.window import grouped_quantiles

    tbl = pa.table({
        "g": ["a"] * 4 + ["b"] * 2,
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 10.0, 20.0]),
    })
    out = (grouped_quantiles(rd.from_arrow(tbl), group_col="g",
                             value_col="v", qs=(0.5,))
           .to_pandas().sort_values("g").reset_index(drop=True))
    assert out["q0_5"].tolist() == [2.5, 15.0]


def test_grouped_quantiles_nulls_excluded(ray_session):
    from parquet2_ray.stages.window import grouped_quantiles

    tbl = pa.table({
        "g": ["a", "a", "a"],
        "v": pa.array([1.0, None, 3.0]),
    })
    out = grouped_quantiles(rd.from_arrow(tbl), group_col="g",
                            value_col="v", qs=(0.5,)).to_pandas()
    assert out["q0_5"].tolist() == [2.0]  # null dropped, not zero-filled


def test_rolling_mean_golden(ray_session):
    from parquet2_ray.stages.window import rolling_mean

    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 10], type=pa.int64()),
        "ts": _ts(10, 20, 30, 40, 5),
        "user_id": pa.array([7, 7, 7, 7, 9], type=pa.int64()),
        "value": pa.array([1.0, 2.0, 6.0, 10.0, 5.0]),
    })
    out = (rolling_mean(rd.from_arrow(tbl), k=3, nshards=4)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    # user 7: [1], [1,2], [1,2,6], [2,6,10]; user 9: [5]
    assert out["rolling_mean"].tolist() == [1.0, 1.5, 3.0, 6.0, 5.0]


def test_rolling_mean_window_never_crosses_users(ray_session):
    from parquet2_ray.stages.window import rolling_mean

    tbl = pa.table({
        "event_id": pa.array([1, 2], type=pa.int64()),
        "ts": _ts(10, 20),
        "user_id": pa.array([1, 2], type=pa.int64()),
        "value": pa.array([100.0, 4.0]),
    })
    out = (rolling_mean(rd.from_arrow(tbl), k=5, nshards=2)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert out["rolling_mean"].tolist() == [100.0, 4.0]


def test_distinct_count_excludes_null_values(ray_session):
    from parquet2_ray.stages.window import distinct_count

    # SQL COUNT(DISTINCT v) never counts NULL as a value
    tbl = pa.table({
        "g": ["a", "a", "a", "b"],
        "v": pa.array([1, None, 2, None], type=pa.int64()),
    })
    out = (distinct_count(rd.from_arrow(tbl), group_col="g", value_col="v")
           .to_pandas().sort_values("g").reset_index(drop=True))
    # group b has only NULL values → no surviving pair (documented:
    # the group drops out entirely, like a WHERE v IS NOT NULL pre-filter)
    assert out["g"].tolist() == ["a"]
    assert out["n_distinct"].tolist() == [2]


def test_tumbling_window_null_ts_dropped(ray_session):
    ts = pa.array([10_000_000, None, 20_000_000],
                  type=pa.int64()).cast(pa.timestamp("us"))
    tbl = pa.table({"ts": ts, "value": pa.array([1.0, 2.0, 3.0])})
    out = tumbling_window(rd.from_arrow(tbl), every_s=100,
                          value_col="value").to_pandas()
    assert out["n_events"].tolist() == [2]
    assert out["sum_value"].tolist() == [4.0]


def test_hopping_window_null_ts_dropped(ray_session):
    from parquet2_ray.stages.window import hopping_window

    ts = pa.array([10_000_000, None], type=pa.int64()).cast(pa.timestamp("us"))
    tbl = pa.table({"ts": ts})
    out = hopping_window(rd.from_arrow(tbl), every_s=100, hop_s=50).to_pandas()
    assert out["n_events"].sum() == 2  # one event in 2 hopping windows


def test_sessionize_names_output_by_user_col(ray_session):
    tbl = pa.table({
        "t": _ts(0, 10),
        "uid": pa.array([5, 5], type=pa.int64()),
    })
    out = sessionize(rd.from_arrow(tbl), ts_col="t", user_col="uid",
                     gap_s=100, nshards=2).to_pandas()
    assert "uid" in out.columns
    assert out["uid"].tolist() == [5]


def test_approx_quantiles_rank_error_bound(ray_session):
    """The centroid digest's quantile estimates must land within the
    documented ~2/compression rank error of the exact quantiles."""
    from parquet2_ray.stages.window import approx_quantiles

    rng = np.random.default_rng(5)
    n = 40_000
    g = rng.choice(["a", "b"], n)
    # mixed distribution: heavy tail + point mass
    v = np.where(rng.random(n) < 0.1, 100.0, rng.lognormal(0, 1.0, n))
    tbl = pa.table({"g": g, "v": pa.array(v)})
    ds = rd.from_arrow(tbl).repartition(8)
    qs = (0.01, 0.25, 0.5, 0.9, 0.99)
    comp = 512
    out = (approx_quantiles(ds, group_col="g", value_col="v", qs=qs,
                            compression=comp)
           .to_pandas().set_index("g").sort_index())
    for grp in ("a", "b"):
        vals = np.sort(v[g == grp])
        for q in qs:
            est = out.loc[grp][f"q{str(q).replace('.', '_')}"]
            # a point mass owns an INTERVAL of ranks — measure the
            # distance from q to the estimate's [left, right] rank span
            lo = np.searchsorted(vals, est, side="left") / len(vals)
            hi = np.searchsorted(vals, est, side="right") / len(vals)
            dist = max(lo - q, q - hi, 0.0)
            assert dist <= 3.0 / comp + 0.002, (grp, q, lo, hi)


def test_grouped_quantiles_auto_routes_big_group(ray_session):
    """VERDICT r4 #5: a skewed oversized group must route through the
    digest (never reaching one task's heap as a full value set) with
    rank error <= the documented bound, while small groups stay EXACT
    and bit-identical to grouped_quantiles."""
    from parquet2_ray.stages.window import grouped_quantiles_auto

    rng = np.random.default_rng(8)
    n_big, n_small = 1_000_000, 2_000
    g = np.concatenate([np.repeat("hot", n_big),
                        np.repeat("cold", n_small)])
    v = np.concatenate([rng.lognormal(0, 1.0, n_big),
                        rng.normal(5, 2, n_small)])
    tbl = pa.table({"g": g, "v": pa.array(v)})
    ds = rd.from_arrow(tbl).repartition(16)
    qs = (0.25, 0.5, 0.95)
    comp = 512
    out = (grouped_quantiles_auto(
        ds, group_col="g", value_col="v", qs=qs,
        max_exact_group=100_000, compression=comp)
        .to_pandas().set_index("g").sort_index())
    assert sorted(out.index) == ["cold", "hot"]
    # cold (under threshold): EXACT
    cold = np.sort(v[g == "cold"])
    for q in qs:
        assert out.loc["cold"][f"q{str(q).replace('.', '_')}"] == \
            pytest.approx(np.quantile(cold, q), abs=0, rel=0)
    # hot (over threshold): digest, rank error bounded
    hot = np.sort(v[g == "hot"])
    for q in qs:
        est = out.loc["hot"][f"q{str(q).replace('.', '_')}"]
        lo = np.searchsorted(hot, est, side="left") / len(hot)
        hi = np.searchsorted(hot, est, side="right") / len(hot)
        dist = max(lo - q, q - hi, 0.0)
        assert dist <= 3.0 / comp + 0.002, (q, lo, hi)
        # and it is NOT the exact value (proves the digest route)
        # — with 10^6 lognormal draws an exact match is measure-zero
        assert est != np.quantile(hot, q)


def test_grouped_quantiles_auto_all_small_is_exact_path(ray_session):
    from parquet2_ray.stages.window import (
        grouped_quantiles,
        grouped_quantiles_auto,
    )

    rng = np.random.default_rng(9)
    tbl = pa.table({"g": rng.choice(["a", "b", "c"], 5000),
                    "v": pa.array(rng.normal(size=5000))})
    ds = rd.from_arrow(tbl).repartition(4)
    a = (grouped_quantiles_auto(ds, group_col="g", value_col="v",
                                qs=(0.5, 0.9))
         .to_pandas().sort_values("g").reset_index(drop=True))
    b = (grouped_quantiles(rd.from_arrow(tbl), group_col="g",
                           value_col="v", qs=(0.5, 0.9))
         .to_pandas().sort_values("g").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_approx_quantiles_matches_exact_schema_and_nulls(ray_session):
    from parquet2_ray.stages.window import approx_quantiles, grouped_quantiles

    tbl = pa.table({"g": ["x"] * 5, "v": pa.array([1.0, None, 2.0, 3.0, 4.0])})
    a = approx_quantiles(rd.from_arrow(tbl), group_col="g", value_col="v",
                         qs=(0.0, 0.5, 1.0)).to_pandas()
    e = grouped_quantiles(rd.from_arrow(tbl), group_col="g", value_col="v",
                          qs=(0.0, 0.5, 1.0)).to_pandas()
    assert list(a.columns) == list(e.columns)  # drop-in schema
    # exact extremes ride along; tiny group → digest is exact
    assert a["q0_0"].tolist() == [1.0] and a["q1_0"].tolist() == [4.0]
    assert a["q0_5"].tolist() == e["q0_5"].tolist()


def test_approx_quantiles_empty_blocks_keep_schema(ray_session):
    from parquet2_ray.stages.window import approx_quantiles

    tbl = pa.table({"g": pa.array(["a"] * 50 + ["b"] * 50),
                    "v": pa.array(np.arange(100.0))})
    # an upstream filter that empties some blocks must not flip the
    # partial schema to null-typed group columns
    ds = (rd.from_arrow(tbl).repartition(8)
          .filter(lambda r: r["v"] < 30))
    out = (approx_quantiles(ds, group_col="g", value_col="v", qs=(0.5,))
           .to_pandas().sort_values("g").reset_index(drop=True))
    assert out["g"].tolist() == ["a"]
    assert out["q0_5"].tolist() == [14.5]
