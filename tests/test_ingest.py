"""ingest_increment: the dedup → append → index-fold daily-ingest
composite and its phase-ledger crash ordering."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    decode_dataset,
)
from parquet2_ray.pipelines.ingest_pipeline import ingest_increment

OPTS = EncodeOptions(group_col=None, weight_col=None, sort_key="doc_id",
                     target_rows=50, fsync=False)


def _docs(ids_texts: dict) -> pa.Table:
    return pa.table({"doc_id": pa.array(list(ids_texts), pa.string()),
                     "text": pa.array(list(ids_texts.values()))})


def _container_ids(out: str) -> set:
    got = set()
    for b in decode_dataset(out, columns=["doc_id"]).iter_batches(
            batch_format="pyarrow"):
        got.update(b["doc_id"].to_pylist())
    return got


@pytest.fixture()
def dirs(ray_session, tmp_path):
    return str(tmp_path / "cont"), str(tmp_path / "idx"), tmp_path


def test_two_cycles_dedup_against_history_and_self(dirs):
    cont, idx, tmp = dirs
    day1 = _docs({f"a{i}": f"text number {i}" for i in range(40)}
                 | {"a_dup": "text number 3"})          # internal dup
    day2 = _docs({f"b{i}": f"fresh text {i}" for i in range(20)}
                 | {"b_old": "text number 7",           # dup of day1
                    "b_dup1": "fresh text 5",           # dups of b5
                    "b_dup2": "fresh text 5"})
    pq.write_table(day1, str(tmp / "d1.parquet"))
    pq.write_table(day2, str(tmp / "d2.parquet"))

    r1 = ingest_increment(str(tmp / "d1.parquet"), cont, idx, OPTS)
    assert (r1["ingested"], r1["dropped"]) == (40, 1)
    r2 = ingest_increment(str(tmp / "d2.parquet"), cont, idx, OPTS)
    assert (r2["ingested"], r2["dropped"]) == (20, 3)
    assert r2["txn"] == r1["txn"] + 1
    want = {f"a{i}" for i in range(40)} | {f"b{i}" for i in range(20)}
    assert _container_ids(cont) == want
    # the increment that is ALL duplicates: nothing appended, no txn
    r3 = ingest_increment(rd.from_arrow(day1), cont, idx, OPTS,
                          ingest_id="day1-again")
    assert r3["ingested"] == 0 and r3["dropped"] == day1.num_rows
    assert r3["txn"] is None
    assert _container_ids(cont) == want
    # completed ingests are no-ops on re-run
    assert ingest_increment(str(tmp / "d1.parquet"), cont, idx,
                            OPTS).get("noop")
    from parquet2_ray.pipelines.history_pipeline import changes_since

    got2 = {r["doc_id"] for b in changes_since(
        cont, r1["txn"], columns=["doc_id"]).iter_batches(
        batch_format="pyarrow") for r in b.to_pylist()}
    assert got2 == {f"b{i}" for i in range(20)}


def test_crash_before_ledger_recomputes_cleanly(dirs, monkeypatch):
    """A crash before the 'appended' ledger write (the index is still
    unfolded) must re-run the filter identically and resume the
    append — no loss, no duplicates."""
    import parquet2_ray.pipelines.ingest_pipeline as ip

    cont, idx, tmp = dirs
    day = _docs({f"a{i}": f"text {i}" for i in range(30)})
    pq.write_table(day, str(tmp / "d.parquet"))
    real = ip._save_ledger
    calls = {"n": 0}

    def flaky(container_dir, ledger):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("injected crash before ledger write")
        real(container_dir, ledger)

    monkeypatch.setattr(ip, "_save_ledger", flaky)
    with pytest.raises(OSError, match="injected"):
        ingest_increment(str(tmp / "d.parquet"), cont, idx, OPTS)
    monkeypatch.setattr(ip, "_save_ledger", real)
    r = ingest_increment(str(tmp / "d.parquet"), cont, idx, OPTS)
    assert r["ingested"] == 30 and r["done"]
    assert _container_ids(cont) == {f"a{i}" for i in range(30)}
    # and the index is correct: a full re-send drops everything
    r2 = ingest_increment(rd.from_arrow(day), cont, idx, OPTS,
                          ingest_id="resend")
    assert r2["ingested"] == 0 and r2["dropped"] == 30


def test_crash_mid_fold_resumes_without_data_loss(dirs, monkeypatch):
    """THE ordering hazard: a crash after the append committed but with
    the index only PARTIALLY folded.  The re-run must skip the filter
    (recomputing removals against the half-folded index would drop the
    increment's own docs) and complete the fold idempotently."""
    cont, idx, tmp = dirs
    day1 = _docs({f"a{i}": f"text {i}" for i in range(25)})
    pq.write_table(day1, str(tmp / "d1.parquet"))
    ingest_increment(str(tmp / "d1.parquet"), cont, idx, OPTS)

    day2 = _docs({f"b{i}": f"other {i}" for i in range(25)})
    pq.write_table(day2, str(tmp / "d2.parquet"))
    import parquet2_ray.pipelines.incremental_dedup as inc

    real = inc.append_hash_index

    def flaky(kept_ds, index_dir, text_col="text", id_col="doc_id"):
        # fold PART of the increment's hashes, then die — the exact
        # half-mutated-index state the phase ledger exists for
        real(kept_ds.limit(10), index_dir, text_col, id_col)
        raise OSError("injected crash mid-fold")

    monkeypatch.setattr(inc, "append_hash_index", flaky)
    with pytest.raises(OSError, match="injected"):
        ingest_increment(str(tmp / "d2.parquet"), cont, idx, OPTS)
    monkeypatch.setattr(inc, "append_hash_index", real)
    # the rows ARE in the container already (append committed first)
    assert _container_ids(cont) >= {f"b{i}" for i in range(25)}
    r = ingest_increment(str(tmp / "d2.parquet"), cont, idx, OPTS)
    assert r["done"] and r["ingested"] == 25   # ledger-pinned, not 0
    assert _container_ids(cont) == (
        {f"a{i}" for i in range(25)} | {f"b{i}" for i in range(25)})
    # index correct after the resumed fold: full re-sends drop fully
    r2 = ingest_increment(rd.from_arrow(day2), cont, idx, OPTS,
                          ingest_id="resend2")
    assert r2["ingested"] == 0 and r2["dropped"] == 25


def test_dataset_input_requires_ingest_id(dirs):
    cont, idx, _ = dirs
    with pytest.raises(ValueError, match="ingest_id"):
        ingest_increment(rd.from_arrow(_docs({"x": "y"})), cont, idx)
