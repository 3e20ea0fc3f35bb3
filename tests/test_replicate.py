"""Incremental replication (P66, ``replicate_container``): init from a
snapshot, converge across a mixed DML window (append + dv-delete +
upsert + update), idempotence, crash-between-steps convergence, cursor
validation, CLI."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from parquet2_ray.pipelines.append_pipeline import append_dataset
from parquet2_ray.pipelines.delete_pipeline import delete_rows
from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    decode_dataset,
    encode_dataset,
)
from parquet2_ray.pipelines.replicate_pipeline import replicate_container
from parquet2_ray.pipelines.update_pipeline import update_rows
from parquet2_ray.pipelines.upsert_pipeline import upsert_rows
from parquet2_ray.sources.tokens import make_tokens_table
from parquet2_ray.state import manifest as mf

OPTS = EncodeOptions(target_weight=40_000, fsync=False)


def _rows(out: str) -> dict:
    """doc_id -> (n_tok, source) for order-insensitive compare."""
    got = {}
    for b in decode_dataset(out).iter_batches(batch_format="pyarrow"):
        for d, n, s in zip(b["doc_id"].to_pylist(),
                           b["n_tok"].to_pylist(),
                           b["source"].to_pylist()):
            got[d] = (n, s)
    return got


@pytest.fixture()
def pair(ray_session, tmp_path):
    t = make_tokens_table(500, seed=77)
    p = str(tmp_path / "s.parquet")
    pq.write_table(t, p)
    src = str(tmp_path / "src")
    encode_dataset(p, src, OPTS)
    dst = str(tmp_path / "dst")
    s = replicate_container(src, dst, "doc_id", OPTS, fsync=False)
    assert s["initialized"] and s["n_rows"] == 500
    return src, dst, t, tmp_path


def test_replicate_converges_mixed_window(pair):
    src, dst, t, tmp_path = pair
    assert _rows(dst) == _rows(src)
    # mutate the source: append + dv delete + upsert + update
    inc = make_tokens_table(60, seed=78).set_column(
        0, "doc_id", pa.array([f"inc-{i}" for i in range(60)]))
    p1 = str(tmp_path / "inc.parquet")
    pq.write_table(inc, p1)
    append_dataset(p1, src, OPTS)
    delete_rows(src, "doc_id",
                values=t["doc_id"].to_pylist()[:30], fsync=False,
                mode="dv")
    upd = make_tokens_table(10, seed=79).set_column(
        0, "doc_id", pa.array(t["doc_id"].to_pylist()[100:110]))
    p2 = str(tmp_path / "u.parquet")
    pq.write_table(upd, p2)
    upsert_rows(src, p2, "doc_id", OPTS, gc=False)
    update_rows(src, "doc_id", {"source": "edited"},
                values=t["doc_id"].to_pylist()[200:205], fsync=False)
    s = replicate_container(src, dst, "doc_id", OPTS, fsync=False)
    assert s["n_deleted"] == 30
    assert s["n_upserted"] >= 75   # 60 inserts + 10 upserts + 5 updates
    assert _rows(dst) == _rows(src)
    # idempotent: nothing changed upstream → noop, still equal
    s2 = replicate_container(src, dst, "doc_id", OPTS, fsync=False)
    assert s2.get("noop")
    assert _rows(dst) == _rows(src)


def test_replicate_crash_between_steps_converges(pair, monkeypatch):
    src, dst, t, tmp_path = pair
    delete_rows(src, "doc_id", values=t["doc_id"].to_pylist()[:5],
                fsync=False)
    upd = make_tokens_table(4, seed=80).set_column(
        0, "doc_id", pa.array(t["doc_id"].to_pylist()[10:14]))
    p2 = str(tmp_path / "u.parquet")
    pq.write_table(upd, p2)
    upsert_rows(src, p2, "doc_id", OPTS, gc=False)
    import parquet2_ray.pipelines.upsert_pipeline as up

    orig = up.upsert_rows
    calls = {"n": 0}

    def boom(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected-crash")
        return orig(*a, **kw)

    monkeypatch.setattr(up, "upsert_rows", boom)
    with pytest.raises(RuntimeError, match="injected-crash"):
        replicate_container(src, dst, "doc_id", OPTS, fsync=False)
    # cursor NOT advanced: the deletes applied but the window re-runs
    cursor = json.loads(open(os.path.join(
        dst, "_manifest", "replica.json")).read())
    s = replicate_container(src, dst, "doc_id", OPTS, fsync=False)
    assert not s.get("noop")
    assert _rows(dst) == _rows(src)
    cursor2 = json.loads(open(os.path.join(
        dst, "_manifest", "replica.json")).read())
    assert cursor2["txn"] > cursor["txn"]


def test_replicate_validation(pair, tmp_path):
    src, dst, t, _ = pair
    other = str(tmp_path / "other")
    p = str(tmp_path / "o.parquet")
    pq.write_table(make_tokens_table(10, seed=81), p)
    encode_dataset(p, other, OPTS)
    with pytest.raises(ValueError, match="one follower tracks one"):
        replicate_container(other, dst, "doc_id", OPTS, fsync=False)
    with pytest.raises(FileExistsError, match="foreign history"):
        replicate_container(src, other, "doc_id", OPTS, fsync=False)


def test_replicate_cli(pair, tmp_path):
    src, dst, t, _ = pair
    delete_rows(src, "doc_id", values=t["doc_id"].to_pylist()[:3],
                fsync=False)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "parquet2_ray.job", "replicate",
         "--src", src, "--dst", dst, "--key", "doc_id"],
        capture_output=True, text=True, cwd=repo)
    assert r.returncode == 0, r.stderr
    assert json.loads(r.stdout.splitlines()[-1])["n_deleted"] == 3
    assert _rows(dst) == _rows(src)
