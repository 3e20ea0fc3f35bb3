"""P74 generated columns: spec language, ingest enforcement, and the
event-time windowed materialized view that falls out of them."""

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
from parquet2_ray.pipelines.generated_pipeline import (
    apply_generated,
    generated_sql,
    get_generated,
    set_generated,
)

DAY = 86_400


def _events(n=2000, seed=13) -> pa.Table:
    rng = np.random.default_rng(seed)
    ts = pa.array(
        (rng.integers(0, 30 * DAY, n)).astype("datetime64[s]"))
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": ts,
        "value": pa.array(rng.normal(3, 1, n)),
        "kind": pa.array(np.array(["a", "b"])[np.arange(n) % 2]),
    })


def test_spec_validation(tmp_path, ray_session):
    d = str(tmp_path / "v")
    with pytest.raises(ValueError, match="unknown op"):
        set_generated(d, {"x": ["cube", "ts"]})
    with pytest.raises(ValueError, match="positive_int"):
        set_generated(d, {"x": ["floor_div", "a", 0]})
    set_generated(d, {"x": ["floor_div", "a", 10]})
    assert get_generated(d) == {"x": ["floor_div", "a", 10]}


def test_apply_semantics(ray_session):
    b = pa.table({
        "a": pa.array([0, 7, 23, None, -5], pa.int64()),
        "s": pa.array(["Ab", None, "cD", "x", ""]),
        "ts": pa.array(np.array([0, DAY + 5, 2 * DAY - 1],
                                dtype="datetime64[s]").tolist() + [None, None],
                       pa.timestamp("s")),
    })
    out = apply_generated(b, {
        "bucket": ["floor_div", "a", 10],
        "shard": ["mod", "a", 4],
        "low": ["lower", "s"],
        "ln": ["length", "s"],
        "day": ["floor_time", "ts", DAY],
    })
    assert out["bucket"].to_pylist() == [0, 0, 20, None, -10]
    assert out["shard"].to_pylist() == [0, 3, 3, None, 3]  # numpy %
    assert out["low"].to_pylist() == ["ab", None, "cd", "x", ""]
    assert out["ln"].to_pylist() == [2, None, 2, 1, 0]
    assert out["day"].to_pylist() == [0, DAY, DAY, None, None]
    # derived truth: a caller-supplied column is overwritten
    b2 = b.append_column("bucket", pa.array([9, 9, 9, 9, 9],
                                            pa.int64()))
    out2 = apply_generated(b2, {"bucket": ["floor_div", "a", 10]})
    assert out2["bucket"].to_pylist() == [0, 0, 20, None, -10]


def test_float_source_rejected(ray_session):
    """ADVICE r4: floor_div/mod on a float source would diverge from
    the SQL oracle (truncation vs rounding) — reject loudly."""
    b = pa.table({"f": pa.array([1.5, 2.25], pa.float64())})
    with pytest.raises(TypeError, match="integer or timestamp"):
        apply_generated(b, {"bucket": ["floor_div", "f", 10]})
    with pytest.raises(TypeError, match="integer or timestamp"):
        apply_generated(b, {"shard": ["mod", "f", 4]})


def test_append_and_upsert_enforce(tmp_path, ray_session):
    from parquet2_ray.pipelines.append_pipeline import append_dataset
    from parquet2_ray.pipelines.upsert_pipeline import upsert_rows

    out = str(tmp_path / "cont")
    set_generated(out, {"day": ["floor_time", "ts", DAY]})
    t = _events()
    first = apply_generated(t.slice(0, 1000), get_generated(out))
    encode_dataset(rd.from_arrow(first), out, EncodeOptions(
        group_col="kind", weight_col=None, sort_key="event_id"))
    # append WITHOUT the generated column: the hook derives it
    append_dataset(rd.from_arrow(t.slice(1000)), out,
                   append_id="gen-a1")
    got = pa.Table.from_pylist(
        decode_dataset(out, columns=["event_id", "ts", "day"])
        .take_all()).sort_by("event_id")
    want = apply_generated(t, get_generated(out))
    assert got["day"].to_pylist() == want["day"].to_pylist()
    # upsert with a WRONG day value: overwritten with the derived one
    up = pa.table({
        "event_id": pa.array([5], pa.int64()),
        "ts": t["ts"].slice(5, 1),
        "value": pa.array([9.9]),
        "kind": pa.array(["a"]),
        "day": pa.array([123], pa.int64())})
    upsert_rows(out, rd.from_arrow(up), "event_id",
                upsert_id="gen-u1")
    row = [r for r in decode_dataset(
        out, key_values=[5], columns=["event_id", "day"]).take_all()
        if r["event_id"] == 5]
    assert row[0]["day"] == want["day"][5].as_py()


def test_retro_declare_validates(tmp_path, ray_session):
    out = str(tmp_path / "retro")
    t = _events(300)
    good = apply_generated(t, {"day": ["floor_time", "ts", DAY]})
    encode_dataset(rd.from_arrow(good), out, EncodeOptions(
        group_col="kind", weight_col=None, sort_key="event_id"))
    # matching retro-declare passes
    set_generated(out, {"day": ["floor_time", "ts", DAY]})
    # mismatching spec refuses
    with pytest.raises(ValueError, match="violate"):
        set_generated(out, {"day": ["floor_time", "ts", 3600]})
    # missing column refuses
    with pytest.raises(ValueError, match="missing"):
        set_generated(out, {"week": ["floor_time", "ts", 7 * DAY]})


def test_event_time_windowed_view(tmp_path, ray_session):
    """The payoff: generated bucket + P70 view = streaming windowed
    aggregate with late-arrival handling, oracled against DuckDB."""
    import duckdb

    from parquet2_ray.pipelines.append_pipeline import append_dataset
    from parquet2_ray.pipelines.matview_pipeline import (
        create_agg_view,
        refresh_agg_view,
    )

    out = str(tmp_path / "ev")
    view = str(tmp_path / "view")
    set_generated(out, {"win_start": ["floor_time", "ts", DAY]})
    t = _events()
    first = apply_generated(t.slice(0, 1500), get_generated(out))
    encode_dataset(rd.from_arrow(first), out, EncodeOptions(
        group_col="kind", weight_col=None, sort_key="event_id"))
    create_agg_view(out, view, "win_start",
                    {"value": ["sum", "count"]}, target_rows=100)
    # late arrivals land in old windows; refresh converges them
    append_dataset(rd.from_arrow(t.slice(1500)), out,
                   append_id="gen-late")
    r = refresh_agg_view(view)
    assert r["refreshed"] and r["affected"] > 0
    got = (pd.DataFrame(decode_dataset(
        view, columns=["win_start", "value_sum", "value_count"])
        .take_all()).sort_values("win_start").reset_index(drop=True))
    con = duckdb.connect()
    con.register("events_arrow", t.to_pandas())
    expr = generated_sql("win_start", ["floor_time", "ts", DAY])
    want = con.execute(
        f"SELECT {expr.replace(' AS win_start', '')} AS win_start, "
        "SUM(value) AS value_sum, COUNT(value) AS value_count "
        "FROM events_arrow GROUP BY 1 ORDER BY 1").df()
    assert got["win_start"].tolist() == want["win_start"].tolist()
    assert got["value_count"].tolist() == want["value_count"].tolist()
    np.testing.assert_allclose(got["value_sum"].to_numpy(),
                               want["value_sum"].to_numpy(),
                               rtol=1e-12)


def test_floor_time_subsecond_units(ray_session):
    """Code-review regression: ms/us/ns timestamps with non-whole
    seconds must floor (native-unit integer division), not raise."""
    for unit, mult in (("ms", 10**3), ("us", 10**6), ("ns", 10**9)):
        b = pa.table({"ts": pa.array(
            [1500 * mult // 1000, DAY * mult + 7, None],
            pa.timestamp(unit))})
        out = apply_generated(b, {"day": ["floor_time", "ts", DAY]})
        assert out["day"].to_pylist() == [0, DAY, None], unit


def test_retro_declare_accepts_null_sources(tmp_path, ray_session):
    """Code-review regression: stored null derived values (from null
    sources) must validate as matches, not violations."""
    out = str(tmp_path / "nulls")
    t = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([0, None, DAY], pa.timestamp("s")),
        "kind": pa.array(["a"] * 3),
    })
    good = apply_generated(t, {"day": ["floor_time", "ts", DAY]})
    encode_dataset(rd.from_arrow(good), out, EncodeOptions(
        group_col="kind", weight_col=None, sort_key="event_id"))
    set_generated(out, {"day": ["floor_time", "ts", DAY]})  # no raise


def test_encode_applies_declared_specs(tmp_path, ray_session):
    """Code-review regression: container CREATION derives declared
    specs too — no manual apply_generated needed, and a wrong
    caller-supplied column is overwritten."""
    out = str(tmp_path / "enc")
    set_generated(out, {"day": ["floor_time", "ts", DAY]})
    t = _events(200)
    wrong = t.append_column("day", pa.array([999] * 200, pa.int64()))
    encode_dataset(rd.from_arrow(wrong), out, EncodeOptions(
        group_col="kind", weight_col=None, sort_key="event_id"))
    got = pa.Table.from_pylist(decode_dataset(
        out, columns=["event_id", "day"]).take_all()).sort_by(
        "event_id")
    want = apply_generated(t, get_generated(out))
    assert got["day"].to_pylist() == want["day"].to_pylist()


def test_update_refuses_generated_and_source(tmp_path, ray_session):
    from parquet2_ray.pipelines.update_pipeline import update_rows

    out = str(tmp_path / "upd")
    set_generated(out, {"day": ["floor_time", "ts", DAY]})
    t = _events(100)
    encode_dataset(rd.from_arrow(t), out, EncodeOptions(
        group_col="kind", weight_col=None, sort_key="event_id"))
    with pytest.raises(ValueError, match="derived"):
        update_rows(out, "event_id", {"day": 0}, lo=0, hi=10)
    with pytest.raises(ValueError, match="stale"):
        update_rows(out, "event_id",
                    {"ts": pd.Timestamp("1970-01-02")}, lo=0, hi=10)
    # unrelated columns still update fine
    update_rows(out, "event_id", {"value": 1.0}, lo=0, hi=10)
