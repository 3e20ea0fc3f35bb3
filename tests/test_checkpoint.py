"""Manifest checkpointing (P58): one-file collapse of the per-partition
manifest scan, stat-validated against the directory listing so it is a
pure read-amplification cache — results always bit-identical to the
full scan, under appends, rollback/sweep unlinks, id-reuse rewrites,
and checkpoint corruption."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from parquet2_ray.pipelines.append_pipeline import append_dataset
from parquet2_ray.pipelines.compact_pipeline import sweep_invisible
from parquet2_ray.pipelines.delete_pipeline import delete_rows
from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    decode_dataset,
    encode_dataset,
)
from parquet2_ray.pipelines.history_pipeline import rollback_container
from parquet2_ray.sources.tokens import make_tokens_table
from parquet2_ray.state import fsio
from parquet2_ray.state import manifest as mf

OPTS = EncodeOptions(target_weight=50_000, fsync=False)


def _prefixed(n: int, seed: int, prefix: str) -> pa.Table:
    t = make_tokens_table(n, seed=seed)
    return t.set_column(
        t.column_names.index("doc_id"), "doc_id",
        pc.binary_join_element_wise(
            pa.array([prefix] * t.num_rows), t["doc_id"], ""))


def _write(tmp_path, name: str, table: pa.Table) -> str:
    p = str(tmp_path / name)
    pq.write_table(table, p)
    return p


def _scan_no_ckpt(out: str):
    """Ground truth: the full per-file scan with the checkpoint hidden."""
    ck = os.path.join(out, "_manifest", mf.CHECKPOINT_NAME)
    tmp = ck + ".hidden"
    had = os.path.exists(ck)
    if had:
        os.rename(ck, tmp)
    try:
        return mf.load_raw_records(out)
    finally:
        if had:
            os.rename(tmp, ck)


def _ids(out: str, **kw) -> set:
    ds = decode_dataset(out, columns=["doc_id"], **kw)
    got = set()
    for b in ds.iter_batches(batch_format="pyarrow"):
        got.update(b["doc_id"].to_pylist())
    return got


@pytest.fixture()
def container(ray_session, tmp_path):
    out = str(tmp_path / "cont")
    encode_dataset(_write(tmp_path, "base.parquet",
                          _prefixed(150, 1, "base/")), out, OPTS)
    append_dataset(_write(tmp_path, "inc.parquet",
                          _prefixed(130, 2, "inc/")), out, OPTS)
    return out


def test_checkpoint_scan_identical(container):
    before = mf.load_raw_records(container)
    summary = mf.write_manifest_checkpoint(container)
    assert summary["files"] == len(before[0])
    assert summary["bytes"] < summary["raw_bytes"]
    after = mf.load_raw_records(container)
    assert after == before
    assert mf.load_manifest(container) == mf.resolve_active(*before)


def test_tail_commits_after_checkpoint_visible(container, tmp_path):
    mf.write_manifest_checkpoint(container)
    append_dataset(_write(tmp_path, "inc2.parquet",
                          _prefixed(90, 3, "inc2/")), container, OPTS)
    d = delete_rows(container, "n_tok", lo=4000, hi=None)
    assert d["n_deleted"] > 0
    assert mf.load_raw_records(container) == _scan_no_ckpt(container)
    ids = _ids(container)
    assert any(i.startswith("inc2/") for i in ids)
    # time travel resolves through the checkpointed records too
    assert mf.load_manifest(container, as_of=0) == {
        k: v for k, v in _scan_no_ckpt(container)[0].items()
        if mf.record_txn(v) == 0 and not v.get("family")}


def test_unlinked_records_dropped(container, tmp_path):
    append_dataset(_write(tmp_path, "inc2.parquet",
                          _prefixed(90, 3, "inc2/")), container, OPTS)
    mf.write_manifest_checkpoint(container)
    rollback_container(container, to_txn=1)
    # rollback unlinked the txn-2 records; the checkpoint still carries
    # them but the listing is ground truth
    assert mf.load_raw_records(container) == _scan_no_ckpt(container)
    assert not any(i.startswith("inc2/") for i in _ids(container))


def test_sweep_after_checkpoint(container, tmp_path):
    append_dataset(_write(tmp_path, "inc2.parquet",
                          _prefixed(90, 3, "inc2/")), container, OPTS)
    delete_rows(container, "n_tok", lo=4000, hi=None)
    mf.write_manifest_checkpoint(container)
    sweep_invisible(container)
    assert mf.load_raw_records(container) == _scan_no_ckpt(container)


def test_stale_entry_reread(container):
    mf.write_manifest_checkpoint(container)
    raw, _ = mf.load_raw_records(container)
    pid = sorted(raw)[0]
    path = os.path.join(container, "_manifest", f"part-{pid}.json")
    rec = json.loads(fsio.read_bytes(path))
    # simulate id reuse after a sweep: same file name, different content
    # (and different size/mtime — what the loader validates against)
    rec["codec_choices"] = {**rec.get("codec_choices", {}),
                            "___rewritten": "marker"}
    fsio.atomic_write(path, json.dumps(rec).encode(), fsync=False)
    got, _ = mf.load_raw_records(container)
    assert got[pid].get("codec_choices", {}).get("___rewritten") == "marker"


def test_corrupt_or_garbage_checkpoint_degrades(container):
    truth = mf.load_raw_records(container)
    ck = os.path.join(container, "_manifest", mf.CHECKPOINT_NAME)
    for blob in (b"garbage", mf._CKPT_MAGIC + b"\x00" * 8 + b"notzstd"):
        fsio.atomic_write(ck, blob, fsync=False)
        assert mf.load_raw_records(container) == truth


def test_read_amplification_bound(container, monkeypatch):
    """The point of P58: after a checkpoint, a manifest load reads ZERO
    per-partition files; after K commits the checkpoint does not cover,
    it reads exactly those K files."""
    mf.write_manifest_checkpoint(container)
    real = fsio.read_bytes
    part_reads: list[str] = []

    def counting(path):
        if "_manifest" in path and os.path.basename(path).startswith("part-"):
            part_reads.append(path)
        return real(path)

    monkeypatch.setattr(fsio, "read_bytes", counting)
    mf.load_raw_records(container)
    assert part_reads == []

    # commit K records below the op layer (no auto-refresh fires)
    raw, _ = mf.load_raw_records(container)
    tmpl = next(iter(raw.values()))
    for i in (900, 901, 902):
        mf.commit_manifest_record(
            container, {**tmpl, "part_id": f"p{i:05d}", "txn": 5},
            fsync=False)
    part_reads.clear()
    got, _ = mf.load_raw_records(container)
    assert len(part_reads) == 3 and len(got) == len(raw) + 3


def test_auto_refresh_after_maintenance(container, tmp_path, monkeypatch):
    """Once an operator checkpoints a container, every maintenance op
    keeps the checkpoint fresh: a load AFTER an append/delete/rollback
    reads zero per-partition files.  Containers that never checkpointed
    never get one implicitly."""
    mf.write_manifest_checkpoint(container)
    append_dataset(_write(tmp_path, "inc2.parquet",
                          _prefixed(60, 4, "inc2/")), container, OPTS)
    d = delete_rows(container, "n_tok", lo=4000, hi=None)
    assert d["n_deleted"] > 0
    real = fsio.read_bytes
    part_reads: list[str] = []

    def counting(path):
        if "_manifest" in path and os.path.basename(path).startswith("part-"):
            part_reads.append(path)
        return real(path)

    monkeypatch.setattr(fsio, "read_bytes", counting)
    got = mf.load_raw_records(container)
    assert part_reads == []
    monkeypatch.undo()
    assert got == _scan_no_ckpt(container)


def test_no_implicit_checkpoint(container, tmp_path):
    append_dataset(_write(tmp_path, "inc2.parquet",
                          _prefixed(60, 4, "inc2/")), container, OPTS)
    sweep_invisible(container)
    assert not fsio.exists(os.path.join(container, "_manifest",
                                        mf.CHECKPOINT_NAME))


def test_checkpoint_cli(container, capsys):
    from parquet2_ray.job import main

    assert main(["checkpoint", "--container", container]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["files"] == len(mf.load_raw_records(container)[0])
    assert fsio.exists(os.path.join(container, "_manifest",
                                    mf.CHECKPOINT_NAME))
