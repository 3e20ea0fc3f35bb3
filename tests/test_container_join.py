"""P46 merge_join_containers: zero-shuffle co-partitioned container
join (SURVEY.md §2.10)."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet2_ray.pipelines.container_join import merge_join_containers
from parquet2_ray.pipelines.encode_pipeline import EncodeOptions, encode_dataset


def _gather(ds) -> pa.Table:
    import ray

    ts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(ts) if ts else pa.table({})


@pytest.fixture(scope="module")
def joined_containers(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("cjoin")
    rng = np.random.default_rng(17)
    n_a, n_b = 6000, 1500
    a = pa.table({
        "oid": pa.array([f"o{i:06d}" for i in range(n_a)]),
        "uid": pa.array(
            [None if x < 30 else int(x) for x in
             rng.integers(0, 2000, n_a)], type=pa.int64()),
        "v": pa.array(rng.random(n_a)),
    })
    b = pa.table({
        "uid": pa.array(
            [None if x < 30 else int(x) for x in
             rng.integers(0, 2000, n_b)], type=pa.int64()),
        "name": pa.array([f"u{i}" for i in range(n_b)]),
        "v": pa.array(rng.random(n_b)),
    })
    pq.write_table(a, str(d / "a.parquet"))
    pq.write_table(b, str(d / "b.parquet"))
    out_a, out_b = str(d / "ca"), str(d / "cb")
    # both sides key-clustered → the zero-shuffle fast path
    encode_dataset(str(d / "a.parquet"), out_a, EncodeOptions(
        group_col=None, weight_col=None, sort_key="uid", range_key="uid",
        target_rows=1000, fsync=False))
    encode_dataset(str(d / "b.parquet"), out_b, EncodeOptions(
        group_col=None, weight_col=None, sort_key="uid", range_key="uid",
        target_rows=400, fsync=False))
    return out_a, out_b, a, b


def _oracle(a: pa.Table, b: pa.Table, sql: str) -> pa.Table:
    con = duckdb.connect()
    con.register("a", a)
    con.register("b", b)
    return con.execute(sql).arrow()


def _norm(t: pa.Table) -> pa.Table:
    cols = sorted(t.column_names)
    return t.select(cols).sort_by([(c, "ascending") for c in cols])


def test_inner_join_matches_duckdb(joined_containers):
    out_a, out_b, a, b = joined_containers
    got = _gather(merge_join_containers(out_a, out_b, "uid"))
    want = _oracle(a, b, """
        SELECT a.oid, a.uid, a.v, b.name, b.v AS v_r
        FROM a JOIN b USING (uid)""")
    g, w = _norm(got), _norm(want)
    assert g.num_rows == w.num_rows
    assert g.equals(w.cast(g.schema))


def test_left_outer_and_semi_anti(joined_containers):
    out_a, out_b, a, b = joined_containers
    got = _gather(merge_join_containers(out_a, out_b, "uid",
                                        how="left outer"))
    want = _oracle(a, b, """
        SELECT a.oid, a.uid, a.v, b.name, b.v AS v_r
        FROM a LEFT JOIN b USING (uid)""")
    assert got.num_rows == want.num_rows
    g, w = _norm(got), _norm(want)
    assert g.equals(w.cast(g.schema))

    semi = _gather(merge_join_containers(out_a, out_b, "uid",
                                         how="left semi"))
    anti = _gather(merge_join_containers(out_a, out_b, "uid",
                                         how="left anti"))
    w_semi = _oracle(a, b, "SELECT * FROM a WHERE uid IN "
                           "(SELECT uid FROM b WHERE uid IS NOT NULL)")
    assert semi.num_rows == w_semi.num_rows
    # semi + anti partition the left side exactly
    assert semi.num_rows + anti.num_rows == a.num_rows
    # null keys never match: they all land in the anti side
    assert anti.filter(anti["uid"].combine_chunks().is_null()
                       ).num_rows == a["uid"].null_count


def test_projection_and_unclustered_left(ray_session, joined_containers,
                                         tmp_path):
    out_a, out_b, a, b = joined_containers
    got = _gather(merge_join_containers(
        out_a, out_b, "uid", left_columns=["oid"],
        right_columns=["name"]))
    assert set(got.column_names) == {"oid", "uid", "name"}
    want = _oracle(a, b, "SELECT a.oid, a.uid, b.name FROM a JOIN b "
                         "USING (uid)")
    assert _norm(got).equals(_norm(want).cast(_norm(got).schema))
    # an UNclustered left container joins identically (row-disjoint
    # partitions make pairs exactly-once regardless of layout)
    out_u = str(tmp_path / "ua")
    pq.write_table(a, str(tmp_path / "a.parquet"))
    encode_dataset(str(tmp_path / "a.parquet"), out_u, EncodeOptions(
        group_col=None, weight_col=None, sort_key="oid",
        target_rows=1000, fsync=False))
    got_u = _gather(merge_join_containers(
        out_u, out_b, "uid", left_columns=["oid"],
        right_columns=["name"]))
    assert _norm(got_u).equals(_norm(got))


def test_join_validation(joined_containers):
    out_a, out_b, *_ = joined_containers
    with pytest.raises(ValueError, match="how="):
        merge_join_containers(out_a, out_b, "uid", how="full outer")
    with pytest.raises(ValueError, match="right container schema"):
        merge_join_containers(out_a, out_b, "nope")


def test_temporal_key_join(ray_session, tmp_path):
    """Profile-derived bounds are isoformat STRINGS for timestamp keys;
    the task must re-type them before the Arrow filter (regression:
    ArrowNotImplementedError in every task)."""
    rng = np.random.default_rng(31)
    n_a, n_b = 3000, 900
    base = np.datetime64("2024-01-01T00:00:00", "us")
    a = pa.table({
        "eid": pa.array([f"e{i:05d}" for i in range(n_a)]),
        "ts": pa.array(base + rng.integers(0, 10**9, n_a)
                       .astype("timedelta64[us]")),
    })
    # right keys drawn FROM the left's values so matches exist
    pick = rng.integers(0, n_a, n_b)
    b = pa.table({
        "ts": a["ts"].take(pa.array(pick)),
        "label": pa.array([f"l{i}" for i in range(n_b)]),
    })
    pq.write_table(a, str(tmp_path / "a.parquet"))
    pq.write_table(b, str(tmp_path / "b.parquet"))
    ca, cb = str(tmp_path / "ca"), str(tmp_path / "cb")
    for src, dst, tr in (("a", ca, 600), ("b", cb, 300)):
        encode_dataset(str(tmp_path / f"{src}.parquet"), dst,
                       EncodeOptions(group_col=None, weight_col=None,
                                     sort_key="ts", range_key="ts",
                                     target_rows=tr, fsync=False))
    got = _gather(merge_join_containers(ca, cb, "ts"))
    want = _oracle(a, b, "SELECT a.eid, a.ts, b.label FROM a JOIN b "
                         "USING (ts)")
    g, w = _norm(got), _norm(want)
    assert g.num_rows == w.num_rows > 0
    assert g.equals(w.cast(g.schema))
