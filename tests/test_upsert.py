"""upsert_rows: MERGE-style last-write-wins by key, family-atomic
across the rewrite side and the insert side."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    decode_dataset,
    encode_dataset,
)
from parquet2_ray.pipelines.upsert_pipeline import upsert_rows
from parquet2_ray.state import manifest as mf

OPTS = EncodeOptions(group_col=None, weight_col=None, sort_key="k",
                     target_rows=40, fsync=False)


def _tbl(rows: dict) -> pa.Table:
    return pa.table({"k": pa.array(list(rows), pa.int64()),
                     "v": pa.array(list(rows.values()))})


def _state(out: str, **kw) -> dict:
    got = {}
    for b in decode_dataset(out, **kw).iter_batches(
            batch_format="pyarrow"):
        got.update(dict(zip(b["k"].to_pylist(), b["v"].to_pylist())))
    return got


@pytest.fixture()
def seeded(ray_session, tmp_path):
    """A key-clustered container over k=0..199 (range-partitioned, so
    pruning is observable)."""
    out = str(tmp_path / "cont")
    base = {k: f"old-{k}" for k in range(200)}
    pq.write_table(_tbl(base), tmp_path / "base.parquet")
    encode_dataset(str(tmp_path / "base.parquet"), out,
                   EncodeOptions(group_col=None, weight_col=None,
                                 sort_key="k", range_key="k",
                                 target_rows=40, fsync=False))
    return out, base, tmp_path


def test_upsert_updates_and_inserts(seeded):
    out, base, tmp = seeded
    inc = {5: "new-5", 42: "new-42", 500: "new-500", 501: "new-501"}
    pq.write_table(_tbl(inc), tmp / "inc.parquet")
    before = {pid: r["fingerprint"]
              for pid, r in mf.load_manifest(out).items()}
    s = upsert_rows(out, str(tmp / "inc.parquet"), "k", OPTS, gc=False)
    assert s["matched"] == 2 and s["inserted"] == 4
    want = {**base, **inc}
    assert _state(out) == want
    # pruning proof: keys 5 and 42 live in the first two 40-row ranges;
    # partitions beyond them are bit-untouched (same record, same file)
    after = mf.load_manifest(out)
    untouched = {pid: r["fingerprint"] for pid, r in after.items()
                 if pid in before}
    assert untouched  # some partitions survived as-is
    assert all(before[pid] == fp for pid, fp in untouched.items())
    assert s["n_touched"] <= 3   # 2 matched ranges (+ rare bloom fp)
    from parquet2_ray.pipelines.verify_pipeline import verify_manifest

    assert verify_manifest(out)["n_bad"] == 0
    # history + time travel across the upsert
    from parquet2_ray.pipelines.history_pipeline import container_history

    h = container_history(out)
    assert h[-1]["op"] == "upsert" and h[-1].get("committed", True)
    assert _state(out, as_of=h[-1]["txn"] - 1) == base


def test_upsert_is_family_atomic_under_crash(seeded, monkeypatch):
    out, base, tmp = seeded
    inc = {7: "new-7", 900: "new-900"}
    pq.write_table(_tbl(inc), tmp / "inc.parquet")
    real = mf.commit_family
    monkeypatch.setattr(
        "parquet2_ray.state.manifest.commit_family",
        lambda *a, **kw: (_ for _ in ()).throw(
            RuntimeError("injected crash before marker")))
    with pytest.raises(RuntimeError, match="injected"):
        upsert_rows(out, str(tmp / "inc.parquet"), "k", OPTS, gc=False)
    # container bit-identical: neither the update nor the insert leaked
    assert _state(out) == base
    monkeypatch.setattr("parquet2_ray.state.manifest.commit_family", real)
    s = upsert_rows(out, str(tmp / "inc.parquet"), "k", OPTS)
    assert s["matched"] == 1 and s["inserted"] == 2
    assert _state(out) == {**base, **inc}
    # and a re-run after the marker is an idempotent no-op
    assert upsert_rows(out, str(tmp / "inc.parquet"), "k",
                       OPTS).get("noop")
    assert _state(out) == {**base, **inc}
    from parquet2_ray.pipelines.verify_pipeline import verify_manifest

    assert verify_manifest(out)["n_bad"] == 0


def test_upsert_validation(seeded):
    out, base, tmp = seeded
    dup = pa.table({"k": pa.array([1, 1], pa.int64()),
                    "v": pa.array(["a", "b"])})
    with pytest.raises(ValueError, match="not unique"):
        upsert_rows(out, rd.from_arrow(dup), "k", OPTS, upsert_id="d")
    withnull = pa.table({"k": pa.array([1, None], pa.int64()),
                         "v": pa.array(["a", "b"])})
    with pytest.raises(ValueError, match="null"):
        upsert_rows(out, rd.from_arrow(withnull), "k", OPTS,
                    upsert_id="n")
    with pytest.raises(ValueError, match="upsert_id"):
        upsert_rows(out, rd.from_arrow(dup), "k", OPTS)
    assert _state(out) == base   # nothing leaked from refused upserts


def test_upsert_then_rollback(seeded):
    from parquet2_ray.pipelines.history_pipeline import (
        container_history,
        rollback_container,
    )

    out, base, tmp = seeded
    inc = {0: "new-0", 199: "new-199"}
    pq.write_table(_tbl(inc), tmp / "inc.parquet")
    s = upsert_rows(out, str(tmp / "inc.parquet"), "k", OPTS, gc=False)
    assert _state(out) == {**base, **inc}
    rollback_container(out, s["txn"] - 1)
    assert _state(out) == base
    assert all(e["op"] != "upsert" for e in container_history(out))
    from parquet2_ray.pipelines.verify_pipeline import verify_manifest

    assert verify_manifest(out)["n_bad"] == 0
