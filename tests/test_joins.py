"""As-of join and range join (stages/joins.py).

Golden-vector tests on hand-computed inputs plus DuckDB cross-checks
on random streams — the temporal-join operators the reference (a codec
library, no joins — SURVEY.md §2.7) never needed but an event pipeline
does.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas.testing as pt
import pyarrow as pa
import pytest
import ray.data as rd

from parquet2_ray.stages.joins import asof_join, range_join


def _ts(*seconds):
    return pa.array(np.array(seconds, dtype=np.int64) * 1_000_000,
                    type=pa.int64()).cast(pa.timestamp("us"))


def _events(ids, secs, users, vals=None):
    t = pa.table({
        "event_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "ts": _ts(*secs),
        "user_id": pa.array(np.asarray(users, dtype=np.int64)),
    })
    if vals is not None:
        t = t.append_column("value", pa.array(np.asarray(vals, dtype=np.float64)))
    return t


def test_asof_join_golden(ray_session):
    left = _events([1, 2, 3], [100, 200, 50], [7, 7, 7], [1.0, 2.0, 3.0])
    right = _events([10, 11], [90, 150], [7, 7], [9.0, 9.5])
    out = (asof_join(rd.from_arrow(left), rd.from_arrow(right),
                     left_cols=["event_id", "ts", "user_id", "value"],
                     right_cols=["user_id", "ts", "event_id", "value"],
                     nshards=4)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    # event 1 (t=100) → right 10 (t=90); event 2 (t=200) → right 11
    # (t=150); event 3 (t=50) has no prior right row → dropped (inner)
    assert out["event_id"].tolist() == [1, 2]
    assert out["event_id_r"].tolist() == [10, 11]
    assert out["value_r"].tolist() == [9.0, 9.5]


def test_asof_join_left_keeps_unmatched(ray_session):
    left = _events([1, 2], [100, 10], [7, 7], [1.0, 2.0])
    right = _events([10], [50], [7], [9.0])
    out = (asof_join(rd.from_arrow(left), rd.from_arrow(right),
                     left_cols=["event_id", "ts", "user_id", "value"],
                     right_cols=["user_id", "ts", "event_id", "value"],
                     how="left", nshards=2)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert len(out) == 2
    assert out.loc[0, "event_id_r"] == 10
    assert np.isnan(out.loc[1, "event_id_r"]) or out.loc[1, "event_id_r"] is None


def test_asof_join_exact_ts_matches(ray_session):
    left = _events([1], [100], [3], [1.0])
    right = _events([10], [100], [3], [9.0])
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    left_cols=["event_id", "ts", "user_id", "value"],
                    right_cols=["user_id", "ts", "event_id", "value"],
                    nshards=2).to_pandas()
    assert len(out) == 1 and out.loc[0, "event_id_r"] == 10


def test_asof_join_never_crosses_users(ray_session):
    left = _events([1], [100], [3], [1.0])
    right = _events([10], [50], [4], [9.0])  # other user, earlier ts
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    left_cols=["event_id", "ts", "user_id", "value"],
                    right_cols=["user_id", "ts", "event_id", "value"],
                    nshards=2).to_pandas()
    assert len(out) == 0


def test_range_join_golden(ray_session):
    # window [t-100, t): left at t=200 catches right at 100..199
    left = _events([1], [200], [7])
    right = _events([10, 11, 12, 13], [99, 100, 199, 200], [7, 7, 7, 7])
    out = (range_join(rd.from_arrow(left), rd.from_arrow(right),
                      lo_s=-100, hi_s=0, nshards=4)
           .to_pandas().sort_values("r_id").reset_index(drop=True))
    assert out["r_id"].tolist() == [11, 12]   # 99 below, 200 excluded


def test_range_join_bucket_straddle(ray_session):
    # right rows in two adjacent buckets both match one left window
    left = _events([1], [1000], [5])
    right = _events([10, 11], [905, 995], [5, 5])  # buckets differ at w=100
    out = range_join(rd.from_arrow(left), rd.from_arrow(right),
                     lo_s=-100, hi_s=0, nshards=8).to_pandas()
    assert sorted(out["r_id"].tolist()) == [10, 11]


@pytest.mark.parametrize("lo_s,hi_s", [(-3600, 0), (0, 3600), (-600, 600)])
def test_range_join_random_matches_duckdb(ray_session, lo_s, hi_s):
    rng = np.random.default_rng(5)
    n = 2000
    left = _events(np.arange(n), rng.integers(0, 100_000, n),
                   rng.integers(0, 20, n))
    right = _events(np.arange(n, 2 * n), rng.integers(0, 100_000, n),
                    rng.integers(0, 20, n))
    out = (range_join(rd.from_arrow(left), rd.from_arrow(right),
                      lo_s=lo_s, hi_s=hi_s, nshards=16).to_pandas())
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    o = con.execute(f"""
        SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
               CAST(epoch_us(l.ts) AS BIGINT) AS l_ts_us,
               CAST(epoch_us(r.ts) AS BIGINT) AS r_ts_us
        FROM l JOIN r ON l.user_id = r.user_id
        AND r.ts >= l.ts + to_seconds({lo_s})
        AND r.ts < l.ts + to_seconds({hi_s})""").fetchdf()
    cols = sorted(out.columns)
    assert cols == sorted(o.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = o[cols].sort_values(cols).reset_index(drop=True)
    pt.assert_frame_equal(a, b, check_dtype=False)


def test_asof_join_random_matches_duckdb(ray_session):
    rng = np.random.default_rng(6)
    n = 3000
    # unique (user, ts): sample distinct seconds then split
    secs = rng.choice(200_000, size=2 * n, replace=False)
    left = _events(np.arange(n), secs[:n], rng.integers(0, 25, n),
                   rng.normal(size=n))
    right = _events(np.arange(n, 2 * n), secs[n:], rng.integers(0, 25, n),
                    rng.normal(size=n))
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    left_cols=["event_id", "ts", "user_id", "value"],
                    right_cols=["user_id", "ts", "event_id", "value"],
                    nshards=16).to_pandas()
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    o = con.execute("""
        SELECT l.event_id, l.ts, l.user_id, l.value,
               r.ts AS ts_r, r.event_id AS event_id_r, r.value AS value_r
        FROM l ASOF JOIN r
        ON l.user_id = r.user_id AND l.ts >= r.ts""").fetchdf()
    cols = sorted(out.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = o[cols].sort_values(cols).reset_index(drop=True)
    pt.assert_frame_equal(a, b, check_dtype=False)


def _skewed_events(seed=7, n=3000, hot_user=7):
    """50% of rows on one user — the pathological-key shape; unique
    seconds across both sides so as-of winners are deterministic."""
    rng = np.random.default_rng(seed)
    secs = rng.choice(400_000, size=2 * n, replace=False)
    users = rng.integers(0, 25, n)
    users[rng.random(n) < 0.5] = hot_user
    left = _events(np.arange(n), secs[:n], users, rng.normal(size=n))
    rusers = rng.integers(0, 25, n)
    rusers[rng.random(n) < 0.5] = hot_user
    right = _events(np.arange(n, 2 * n), secs[n:], rusers,
                    rng.normal(size=n))
    return left, right


@pytest.mark.parametrize("how", ["inner", "left"])
def test_asof_join_salted_skewed_matches_duckdb(ray_session, how):
    left, right = _skewed_events()
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    left_cols=["event_id", "ts", "user_id", "value"],
                    right_cols=["user_id", "ts", "event_id", "value"],
                    how=how, nshards=16, salt_buckets=8).to_pandas()
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    jk = "ASOF JOIN" if how == "inner" else "ASOF LEFT JOIN"
    o = con.execute(f"""
        SELECT l.event_id, l.ts, l.user_id, l.value,
               r.ts AS ts_r, r.event_id AS event_id_r, r.value AS value_r
        FROM l {jk} r
        ON l.user_id = r.user_id AND l.ts >= r.ts""").fetchdf()
    cols = sorted(out.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = o[cols].sort_values(cols).reset_index(drop=True)
    pt.assert_frame_equal(a, b, check_dtype=False)


def test_asof_join_salted_carry_spans_many_buckets(ray_session):
    # the ONLY right row sits in bucket 0; every left row in every
    # later bucket must still find it via the replicated carry
    left = _events(np.arange(1, 9), [100, 200, 300, 400, 500, 600, 700,
                                     800], [7] * 8, np.arange(8.0))
    right = _events([99], [1], [7], [42.0])
    out = (asof_join(rd.from_arrow(left), rd.from_arrow(right),
                     left_cols=["event_id", "ts", "user_id", "value"],
                     right_cols=["user_id", "ts", "event_id", "value"],
                     nshards=8, salt_buckets=8, hot_threshold=0)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert out["event_id"].tolist() == list(range(1, 9))
    assert out["event_id_r"].tolist() == [99] * 8
    assert out["value_r"].tolist() == [42.0] * 8


def test_asof_join_salted_noop_without_hot_keys(ray_session):
    # uniform keys: auto threshold finds nothing hot, output identical
    rng = np.random.default_rng(11)
    n = 800
    secs = rng.choice(100_000, size=2 * n, replace=False)
    left = _events(np.arange(n), secs[:n], rng.integers(0, 200, n),
                   rng.normal(size=n))
    right = _events(np.arange(n, 2 * n), secs[n:],
                    rng.integers(0, 200, n), rng.normal(size=n))
    kw = dict(left_cols=["event_id", "ts", "user_id", "value"],
              right_cols=["user_id", "ts", "event_id", "value"],
              nshards=16)
    plain = (asof_join(rd.from_arrow(left), rd.from_arrow(right), **kw)
             .to_pandas().sort_values("event_id").reset_index(drop=True))
    salted = (asof_join(rd.from_arrow(left), rd.from_arrow(right),
                        salt_buckets=8, **kw)
              .to_pandas().sort_values("event_id").reset_index(drop=True))
    pt.assert_frame_equal(plain[sorted(plain.columns)],
                          salted[sorted(salted.columns)],
                          check_dtype=False)


def test_asof_join_salt_routing_balances_hot_key():
    # the exchange-routing math the operator uses: with one key holding
    # half the rows, plain shard_of lands them all on ONE shard wall;
    # the (key, bucket) route spreads them across ~salt_buckets shards
    from parquet2_ray.functions.hashing import shard_of
    from parquet2_ray.stages.joins import _mix2_shard
    rng = np.random.default_rng(3)
    n, nshards, nsalt = 20_000, 16, 8
    keys = rng.integers(0, 25, n)
    keys[rng.random(n) < 0.5] = 7
    ts = rng.integers(0, 1_000_000, n)
    width = 1_000_000 // nsalt + 1
    plain = np.bincount(shard_of(keys, nshards), minlength=nshards)
    bkt = np.clip(ts // width, 0, nsalt - 1)
    salted_sh = np.where(keys == 7, _mix2_shard(keys, bkt, nshards),
                         shard_of(keys, nshards))
    salted = np.bincount(salted_sh, minlength=nshards)
    assert plain.max() > 0.5 * n          # the pathology is real
    assert salted.max() < 0.5 * plain.max()


# ---- deterministic hash split (stages/sampling.py) ----

def test_split_thresholds():
    from parquet2_ray.stages.sampling import split_thresholds

    th = split_thresholds({"train": 0.9, "val": 0.1})
    assert th == [("train", "e6666666"), ("val", "g")]
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.5, "b": 0.4})


def test_split_by_hash_matches_duckdb(ray_session):
    from parquet2_ray.stages.sampling import split_by_hash

    ids = pa.table({"doc_id": pa.array(np.arange(1000, dtype=np.int64))})
    out = (split_by_hash(rd.from_arrow(ids), fractions={"train": 0.9, "val": 0.1})
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", ids.to_pandas())
    o = con.execute("""
        SELECT doc_id, CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,8)
            < 'e6666666' THEN 'train' ELSE 'val' END AS split
        FROM t ORDER BY doc_id""").fetchdf()
    assert out["split"].tolist() == o["split"].tolist()
    frac = (out["split"] == "train").mean()
    assert 0.85 < frac < 0.95  # uniform hash → near-requested fraction


def test_split_by_hash_three_way_covers_all(ray_session):
    from parquet2_ray.stages.sampling import split_by_hash

    ids = pa.table({"doc_id": pa.array(np.arange(500, dtype=np.int64))})
    out = split_by_hash(rd.from_arrow(ids),
                        fractions={"train": 0.8, "val": 0.1, "test": 0.1}
                        ).to_pandas()
    assert set(out["split"]) == {"train", "val", "test"}
    assert len(out) == 500  # no row orphaned by threshold rounding


# ---- review-finding regressions: type fidelity + SQL NULL semantics ----

def test_asof_join_preserves_large_int64_ids(ray_session):
    big = 9_007_199_254_740_993  # 2^53 + 1: dies in float64
    left = _events([big], [100], [7], [1.0])
    right = _events([big + 2], [50], [7], [9.0])
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    left_cols=["event_id", "ts", "user_id", "value"],
                    right_cols=["user_id", "ts", "event_id", "value"],
                    nshards=2).to_pandas()
    assert out["event_id"].dtype == np.int64
    assert out["event_id_r"].dtype == np.int64
    assert out.loc[0, "event_id"] == big
    assert out.loc[0, "event_id_r"] == big + 2


def test_asof_join_null_keys_never_match(ray_session):
    left = pa.table({
        "event_id": pa.array([1, 2], type=pa.int64()),
        "ts": pa.array([100_000_000, None], type=pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([None, 5], type=pa.int64()),
        "value": pa.array([1.0, 2.0]),
    })
    right = _events([10], [50], [5], [9.0])
    cols = ["event_id", "ts", "user_id", "value"]
    inner = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                      left_cols=cols, right_cols=["user_id", "ts",
                                                  "event_id", "value"],
                      nshards=2).to_pandas()
    assert len(inner) == 0  # null user / null ts: no match, no crash
    lj = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                   left_cols=cols, right_cols=["user_id", "ts",
                                               "event_id", "value"],
                   how="left", nshards=2).to_pandas()
    assert len(lj) == 2 and lj["event_id_r"].isna().all()


def test_asof_join_null_right_ts_skipped_not_crash(ray_session):
    left = _events([1], [100], [5], [1.0])
    right = pa.table({
        "event_id": pa.array([10, 11], type=pa.int64()),
        "ts": pa.array([None, 50_000_000], type=pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([5, 5], type=pa.int64()),
        "value": pa.array([8.0, 9.0]),
    })
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    left_cols=["event_id", "ts", "user_id", "value"],
                    right_cols=["user_id", "ts", "event_id", "value"],
                    nshards=2).to_pandas()
    assert out["event_id_r"].tolist() == [11]


def test_range_join_null_keys_never_match(ray_session):
    left = pa.table({
        "event_id": pa.array([1, 2], type=pa.int64()),
        "ts": _ts(100, 100),
        "user_id": pa.array([None, None], type=pa.int64()),
    })
    right = pa.table({
        "event_id": pa.array([10], type=pa.int64()),
        "ts": _ts(50),
        "user_id": pa.array([None], type=pa.int64()),
    })
    out = range_join(rd.from_arrow(left), rd.from_arrow(right),
                     lo_s=-100, hi_s=0, nshards=2).to_pandas()
    assert len(out) == 0  # SQL: NULL = NULL is not a match


def test_range_join_preserves_large_int64_ids(ray_session):
    big = 9_007_199_254_740_993
    left = _events([big], [100], [5])
    right = _events([big + 2], [50], [5])
    out = range_join(rd.from_arrow(left), rd.from_arrow(right),
                     lo_s=-100, hi_s=0, nshards=2).to_pandas()
    assert out["l_id"].tolist() == [big]
    assert out["r_id"].tolist() == [big + 2]


def test_stratified_sample_deterministic_and_exact(ray_session):
    from parquet2_ray.stages.sampling import stratified_sample

    rng = np.random.default_rng(9)
    n = 3000
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "source": pa.array([f"s{int(v)}" for v in rng.integers(0, 7, n)]),
    })
    runs = []
    for _ in range(2):
        got = (stratified_sample(rd.from_arrow(tbl), n_per_group=10)
               .to_pandas().sort_values(["source", "doc_id"])
               .reset_index(drop=True))
        runs.append(got)
    assert runs[0].equals(runs[1])  # pure function of the data
    assert (runs[0].groupby("source").size() == 10).all()
    con = duckdb.connect()
    con.register("t", tbl.to_pandas())
    o = con.execute("""
        SELECT doc_id, source FROM (
          SELECT doc_id, source, row_number() OVER (
            PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) rn
          FROM t) WHERE rn <= 10 ORDER BY source, doc_id""").fetchdf()
    assert runs[0][["doc_id", "source"]].equals(o[["doc_id", "source"]])


def test_stratified_sample_small_groups_kept_whole(ray_session):
    from parquet2_ray.stages.sampling import stratified_sample

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "source": ["a", "a", "b"],
    })
    got = stratified_sample(rd.from_arrow(tbl), n_per_group=10).to_pandas()
    assert len(got) == 3  # groups smaller than n are kept in full


def test_asof_join_salted_null_key_hot_group(ray_session):
    # a null-key group large enough to clear the hot threshold must not
    # crash hot-key detection (nulls hash as key 0 in the exchange);
    # null-key rows still never match
    n = 40
    left = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": _ts(*range(100, 100 + n)),
        "user_id": pa.array([None] * (n - 2) + [5, 5], type=pa.int64()),
        "value": pa.array(np.ones(n)),
    })
    right = _events([10, 11], [90, 101], [5, 5], [8.0, 9.0])
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    left_cols=["event_id", "ts", "user_id", "value"],
                    right_cols=["user_id", "ts", "event_id", "value"],
                    nshards=4, salt_buckets=4, hot_threshold=5).to_pandas()
    # only the two non-null user-5 rows match (events at t=138,139)
    assert sorted(out["event_id"].tolist()) == [n - 2, n - 1]


def test_asof_join_salted_empty_left_hot_right(ray_session):
    # empty left + a right-side key that clears the hot threshold:
    # the min/max aggregate over the empty left returns None — salting
    # must disable itself, not crash
    left = pa.table({
        "event_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "user_id": pa.array([], pa.int64()),
        "value": pa.array([], pa.float64()),
    })
    right = _events([10, 11, 12], [50, 60, 70], [5, 5, 5],
                    [1.0, 2.0, 3.0])
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    left_cols=["event_id", "ts", "user_id", "value"],
                    right_cols=["user_id", "ts", "event_id", "value"],
                    nshards=2, salt_buckets=4, hot_threshold=1).to_pandas()
    assert len(out) == 0
